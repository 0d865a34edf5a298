"""Z-order (Morton-curve) clustering expression for ``OPTIMIZE ... ZORDER BY``.

Why a second clustering mode: a single-column sorted rewrite
(``optimize(sort_by=["ts"])``) leaves per-file [min, max] stats perfectly
disjoint on ``ts`` but arbitrarily wide on every other column, so a rectangle
query on (ts, turn_idx) prunes on ts only. Z-ordering interleaves the bits of
several columns' normalized bin indices so consecutive rows — and therefore
each written file — cover a small hyper-rectangle of the listed dimensions at
once, and the manifest's min/max stats prune on EVERY listed column (the
Delta ``OPTIMIZE ZORDER BY`` / space-filling-curve technique; reference
analog: the reference's single-column Derby indexes on the uid_map,
``DeidentificationController.java:64-70`` — this is the multi-dimensional
generalization a lake layout needs because it has files, not B-trees).

Spark-first shape: the z-value is pure built-in expressions —
``width_bucket`` per dimension plus a ``shiftleft``/``bitwiseOR`` interleave
chain, all whole-stage codegen; the only extra work is ONE min/max aggregate
over the rewrite set to normalize each dimension (no UDF, no extra shuffle —
the sort happens inside the same per-bucket ``sortWithinPartitions`` the
plain sorted rewrite already does). Equi-width binning is deliberate: it
costs one agg instead of per-column quantile passes. A heavily skewed
dimension degrades bin BALANCE, never correctness — stats pruning only ever
skips files whose [min, max] cannot intersect the query rectangle, so layout
quality affects IO, not results.

At 100 TB: the agg and the rewrite are one pass each over the buckets being
optimized (run it incrementally with ``buckets=...``); z-values are longs, so
the per-bucket sort is a cheap fixed-width radix-friendly key regardless of
how wide the payload is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ZORDER_COL", "zvalue_column"]

#: internal column name carrying the interleaved sort key (dropped at write)
ZORDER_COL = "_zorder"

#: per-dimension resolution cap — 16 bits = 65,536 bins per dimension is far
#: below file granularity at any realistic file count, and keeps the
#: interleaved value within a signed long for up to 3 dimensions at full
#: resolution (more dimensions shrink per-dimension bits instead).
_MAX_BITS = 16


def _numeric_expr(df: DataFrame, col: str):
    """Order-preserving numeric (double) view of a column for binning."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dt, T.TimestampNTZType):
        # wall time -> instant in the session zone: any fixed zone is
        # order-preserving, which is all binning needs
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if isinstance(dt, T.DateType):
        return F.unix_date(c).cast("double")
    if isinstance(dt, T.NumericType) or isinstance(dt, T.BooleanType):
        return c.cast("double")
    if isinstance(dt, T.StringType):
        # order-preserving numeric view of the first 8 BYTES: hex the
        # UTF-8 prefix, right-pad with zeros (missing bytes sort below any
        # byte, matching string order), parse base-16. The double cast
        # keeps ~6.6 bytes of exact prefix — ample for equi-width binning,
        # and bin boundaries only affect pruning EFFECTIVENESS, never
        # correctness. Still pure built-in expressions / codegen.
        return F.conv(
            F.rpad(F.hex(F.substring(F.encode(c, "UTF-8"), 1, 8)), 16, "0"),
            16,
            10,
        ).cast("double")
    raise ValueError(
        f"zorder_by column {col!r} has unsupported type {dt.simpleString()}; "
        "numeric, boolean, string, date and timestamp columns are z-orderable"
    )


def zvalue_column(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """Return ``df`` with an appended :data:`ZORDER_COL` long column — the
    Morton interleave of each listed column's equi-width bin index.

    Runs ONE min/max aggregate over ``df`` (a driver action) to fix each
    dimension's bin range; callers on the OPTIMIZE path accept that as the
    offline-maintenance cost it is. Null values and degenerate dimensions
    (all-null or constant) bin to 0, so they cluster at the curve's origin
    instead of poisoning the interleave.
    """
    n = len(cols)
    if not 2 <= n <= 6:
        raise ValueError(f"zorder_by needs 2..6 columns, got {n}")
    if len(set(cols)) != n:
        raise ValueError(f"zorder_by columns must be distinct: {cols}")
    bits = bits if bits is not None else min(_MAX_BITS, 62 // n)
    if not 1 <= bits * n <= 62:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed long")
    nbins = 1 << bits

    nums = [_numeric_expr(df, c) for c in cols]
    row = df.agg(
        *[F.min(e).alias(f"_lo{i}") for i, e in enumerate(nums)],
        *[F.max(e).alias(f"_hi{i}") for i, e in enumerate(nums)],
    ).first()

    bins = []
    for i, e in enumerate(nums):
        lo, hi = row[f"_lo{i}"], row[f"_hi{i}"]
        if lo is None or hi is None or lo == hi:
            bins.append(F.lit(0).cast("long"))
            continue
        # width_bucket yields 1..nbins inside [lo, hi] and nbins+1 at the
        # exact max; clamp into [0, nbins-1] and send nulls to bin 0
        wb = F.width_bucket(e, F.lit(float(lo)), F.lit(float(hi)), F.lit(nbins))
        bins.append(
            F.coalesce(
                F.least(F.greatest(wb - 1, F.lit(0)), F.lit(nbins - 1)),
                F.lit(0),
            ).cast("long")
        )

    # MSB-first interleave: bit b of dimension i lands at position
    # (b * n + (n-1-i)) — standard Morton ordering, pure codegen
    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for b in bins:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)).cast("long")
            )
    return df.withColumn(ZORDER_COL, z)
