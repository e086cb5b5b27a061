from ecg_feature_engineering_spark.sources import io  # noqa: F401
