from ecg_feature_engineering_spark.streaming import asof, dedup, sessions

__all__ = ["asof", "dedup", "sessions"]
