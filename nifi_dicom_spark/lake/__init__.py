from nifi_dicom_spark.lake.commit import (
    CommitBackend,
    CommitConflict,
    ConditionalPutCommitBackend,
    InMemoryKVStore,
    KVStore,
    PosixCommitBackend,
    TableNotFoundError,
)
from nifi_dicom_spark.lake.snapshot_table import (
    CheckConstraintViolation,
    LedgerRegression,
    SnapshotTable,
    VersionVacuumedError,
)

__all__ = [
    "CheckConstraintViolation",
    "CommitBackend",
    "CommitConflict",
    "ConditionalPutCommitBackend",
    "InMemoryKVStore",
    "KVStore",
    "LedgerRegression",
    "PosixCommitBackend",
    "SnapshotTable",
    "TableNotFoundError",
    "VersionVacuumedError",
]
