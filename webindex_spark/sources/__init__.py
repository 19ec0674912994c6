"""Table sources/sinks: the snapshot-parquet checkpoint layer (local
stand-in implementing the Iceberg commit semantics the engine needs)."""
