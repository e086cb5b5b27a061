"""ecg_feature_engineering_spark — a PySpark-native point-in-time feature-engineering engine.

A from-scratch, Spark-first re-expression of the query & data-processing
capabilities of the reference repo (hhc1997/ECG-Feature-Engineering, a serial
per-record CPython/numpy pipeline): as-of joins, lag/lead windows, backfill,
sessionization, rolling statistics, per-entity feature families, and
vectorized Arrow kernels over binary image payloads.

Everything here is built on public Apache Spark APIs (DataFrame/SQL, Window,
pandas UDFs) plus numpy/pandas/pyarrow. No code is copied from the reference;
file:line citations in docstrings point at the reference *semantics* being
re-expressed.
"""

from ecg_feature_engineering_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
