"""Multi-way routing on validity (SURVEY §2.3 P2/P8).

Reference: parse-failure routing to ``failure``/``reject`` relationships
(``DeidentifyDICOM.java:183-191,220-234``; asserted 2-success/1-reject in
``DeidentifyDICOMTest.java:179-195``). Spark-first shape: ONE pass computes a
``route`` column with ``F.when`` chains (stays inside whole-stage codegen);
callers either filter per route or write partitioned-by-route in one job.
Two ``filter`` calls on the same cached/scan source are also fine — Catalyst
pushes each predicate to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nifi_dicom_spark.model import OPS

ROUTE_COL = "_route"
ROUTE_VALID = "valid"
ROUTE_QUARANTINE = "quarantine"


def validity_predicate() -> Column:
    """Is this change event well-formed? (the engine's 'is DICOM' predicate)

    Wrapped in ``coalesce(..., False)`` so the predicate is two-valued: a
    NULL in any tested column (e.g. null ``turn_idx``) must land the event in
    quarantine — with a raw three-valued predicate both ``filter(ok)`` and
    ``filter(~ok)`` would drop the row, silently losing it from BOTH routes.
    """
    raw = (
        F.col("conv_id").isNotNull()
        & (F.col("turn_idx") >= 0)
        & F.col("op").isin(*OPS)
        & F.col("op_seq").isNotNull()
    )
    return F.coalesce(raw, F.lit(False))


def with_route(events: DataFrame) -> DataFrame:
    return events.withColumn(
        ROUTE_COL,
        F.when(validity_predicate(), F.lit(ROUTE_VALID)).otherwise(
            F.lit(ROUTE_QUARANTINE)
        ),
    )


def route_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined). Both derive from the same scan; each filter is
    pushed down independently."""
    ok = validity_predicate()
    return events.filter(ok), events.filter(~ok)
