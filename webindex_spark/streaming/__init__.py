"""Structured Streaming variants of the incremental operators.

The engine's primary incremental mode is snapshot-to-snapshot batch
(operators/delta.py, operators/frontier.py) — it matches the north rule's
resumability contract directly.  This package holds the Structured
Streaming expressions of the same semantics for deployments that want a
continuously-running pipeline.
"""
