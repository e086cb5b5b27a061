from ecg_feature_engineering_spark.operators import (
    asof,
    dedup,
    joins,
    metrics,
    similarity,
    sketches,
    skew,
    splits,
    stats,
    text,
    windows,
)

__all__ = ["asof", "dedup", "joins", "metrics", "similarity", "sketches",
           "skew", "splits", "stats", "text", "windows"]
