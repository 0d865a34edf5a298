from nifi_dicom_spark.streaming.join_mv import (
    backfill_join_mv,
    create_join_mv,
    join_mv_stream,
)
from nifi_dicom_spark.streaming.pipeline import CDCPipeline
from nifi_dicom_spark.streaming.replicate import (
    create_replica_table,
    replicate_stream,
)

__all__ = [
    "CDCPipeline",
    "backfill_join_mv",
    "create_join_mv",
    "create_replica_table",
    "join_mv_stream",
    "replicate_stream",
]
