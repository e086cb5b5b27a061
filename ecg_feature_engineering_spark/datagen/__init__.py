from ecg_feature_engineering_spark.datagen import codecs, images

__all__ = ["codecs", "images"]
