from nifi_dicom_spark.streaming.pipeline import CDCPipeline

__all__ = ["CDCPipeline"]
