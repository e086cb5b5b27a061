from ecg_feature_engineering_spark.operators import (
    asof,
    dedup,
    similarity,
    skew,
    splits,
    stats,
    text,
    windows,
)

__all__ = ["asof", "dedup", "similarity", "skew", "splits", "stats", "text",
           "windows"]
