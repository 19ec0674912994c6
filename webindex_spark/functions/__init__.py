"""Scalar-function kernels (SURVEY.md §2.8, F1-F13).

All kernels are pure python/pandas/numpy and vectorized; they are wrapped
into pandas UDFs by the operator modules, never called per-row from Spark.
"""
