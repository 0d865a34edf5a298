from nifi_dicom_spark.sources.changelog import read_change_log, stream_change_log
from nifi_dicom_spark.sources.debezium import parse_debezium
from nifi_dicom_spark.sources.table_stream import SnapshotCDFDataSource

__all__ = [
    "read_change_log",
    "stream_change_log",
    "parse_debezium",
    "SnapshotCDFDataSource",
]
