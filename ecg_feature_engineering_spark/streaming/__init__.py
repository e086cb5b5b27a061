from ecg_feature_engineering_spark.streaming import sessions

__all__ = ["sessions"]
