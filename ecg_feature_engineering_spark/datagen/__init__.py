from ecg_feature_engineering_spark.datagen import audio, codecs, images, video

__all__ = ["audio", "codecs", "images", "video"]
