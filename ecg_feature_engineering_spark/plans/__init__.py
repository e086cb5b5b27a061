from ecg_feature_engineering_spark.plans import flagship

__all__ = ["flagship"]
