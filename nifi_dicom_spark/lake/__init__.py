from nifi_dicom_spark.lake.snapshot_table import SnapshotTable, CommitConflict

__all__ = ["SnapshotTable", "CommitConflict"]
