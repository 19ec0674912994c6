"""Query plans: the reference's query surface (IndexClient) + the driver
correctness-gate query suite over /root/testdata parquet tables."""
