from ecg_feature_engineering_spark.functions import kernels

__all__ = ["kernels"]
