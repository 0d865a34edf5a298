from nifi_dicom_spark.streaming.pipeline import CDCPipeline
from nifi_dicom_spark.streaming.replicate import (
    create_replica_table,
    replicate_stream,
)

__all__ = ["CDCPipeline", "create_replica_table", "replicate_stream"]
