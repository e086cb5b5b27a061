from ecg_feature_engineering_spark.functions import kernels, media_kernels

__all__ = ["kernels", "media_kernels"]
