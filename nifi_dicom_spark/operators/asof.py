"""As-of (temporal) join — match each left row to the nearest right row in
time within the same key (SURVEY §2.4 family; the temporal analog of J3's
hierarchy join).

Reference semantics: the reference resolves "which deidentification map /
attribute state was in force when this instance arrived" by querying the
latest matching record at-or-before the instance timestamp
(``DeidentificationController.java`` keeps one current row per key and every
lookup sees the latest committed state — an as-of lookup degenerated to
"latest"). Generalized here to the full point-in-time join a CDC/transcript
pipeline needs: enrich each turn with the most recent prior state of a
slowly-changing dimension (active tool version, user plan, model revision).

Spark-first shape (no built-in ASOF in Spark): the classic union-tag
algorithm —

1. tag right rows 0 and left rows 1, union them on (key, ts, tag);
2. ONE shuffle: ``Window.partitionBy(key).orderBy(ts, tag, seq)``;
3. ``last(right_payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each left row sees the
   latest right row at-or-before it (tag 0 sorts before tag 1 at equal ts,
   so the match is INCLUSIVE, same as DuckDB ``ASOF JOIN ... ON l.ts >=
   r.ts``);
4. keep left rows, unpack the payload struct.

This is a sort-merge pass, not an all-pairs join: cost is one exchange of
|L|+|R| rows on the key plus a per-key sort — the same plan shape Spark
picks for a window aggregate, and it scales linearly at 10^10 rows.

Scale notes: per-key ordering is required, so a single pathologically hot
key serializes into one task's sort (same failure mode as any window).
Mitigation at 100 TB: range-split hot keys by time with one boundary right
row replicated into each split (the split's "carry-in"), then run the same
operator — the carry-in makes splits independent. Not automated here;
``asof_join`` is deterministic and correct for the common key-cardinality ≫
cores case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    right_seq: str | None = None,
    prefix: str = "",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the single
    matching ``right`` row (nulls when none).

    ``direction='backward'`` matches the latest right row with
    ``right_ts <= left_ts`` (inclusive); ``'forward'`` the earliest with
    ``right_ts >= left_ts``. ``tolerance_s`` (seconds for timestamps, plain
    difference for numeric ts columns) voids matches farther than the
    tolerance. Right rows with a null ``right_ts`` never match; left rows
    with a null ``left_ts`` match nothing (null sorts first).

    Ties among right rows at the same (key, ts) are broken by ``right_seq``
    when given (largest wins, both directions) — otherwise by the payload
    struct itself, so the result is always deterministic.

    Output columns: all of ``left``, then one ``<prefix><c>`` per right
    payload column (right columns minus keys/ts), plus
    ``<prefix>matched_ts`` = the matched right timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    out_names = list(left.columns) + [f"{prefix}{c}" for c in payload_cols] + [
        f"{prefix}matched_ts"
    ]
    dups = sorted({n for n in out_names if out_names.count(n) > 1})
    if dups:
        raise ValueError(
            f"asof_join output would contain duplicate column(s) {dups}; "
            "pass a prefix (e.g. prefix='r_') to disambiguate right payload "
            "columns from left columns"
        )
    if right_seq is not None and right_seq not in payload_cols:
        raise ValueError(f"right_seq {right_seq!r} not a right payload column")

    pay = F.struct(
        F.col(right_ts).alias("_mts"),
        *[F.col(c) for c in payload_cols],
    )
    # the tiebreak column must be orderable and identical in both branches
    tie = F.col(right_seq) if right_seq else pay
    # SQL equi-join semantics: a null key never matches — drop such right
    # rows so null-keyed left rows (grouped under the null partition) see
    # an empty right side and come out unmatched
    r_nonnull = right.filter(F.col(right_ts).isNotNull())
    for k in keys:
        r_nonnull = r_nonnull.filter(F.col(k).isNotNull())
    r = r_nonnull.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        pay.alias("_rpay"),
        *[F.lit(None).cast(f.dataType).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    l = left.select(
        *[F.col(k).alias(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(f.name).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    u = r.unionByName(l)

    if direction == "backward":
        order = [F.asc_nulls_first("_ats"), F.asc("_side"), F.asc_nulls_first("_tie")]
    else:
        order = [F.desc_nulls_last("_ats"), F.asc("_side"), F.asc_nulls_first("_tie")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m",
        # a null left ts never matches: under desc ordering (forward) nulls
        # sort last and would otherwise see every right row
        F.when(
            F.col("_ats").isNotNull(), F.last("_rpay", ignorenulls=True).over(w)
        ),
    ).filter(F.col("_side") == 1)

    if tolerance_s is not None:
        lt, rt = F.col("_ats"), F.col("_m._mts")
        if isinstance(left.schema[left_ts].dataType, (T.TimestampType, T.TimestampNTZType)):
            gap = (F.unix_micros(lt) - F.unix_micros(rt)) / F.lit(1e6)
        else:
            gap = lt - rt
        if direction == "forward":
            gap = -gap
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_s)), F.col("_m"))
        )

    out_left = [F.col(f"_l_{f.name}").alias(f.name) for f in left.schema.fields]
    out_right = [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols]
    return matched.select(
        *out_left, *out_right, F.col("_m._mts").alias(f"{prefix}matched_ts")
    )


def _bin_expr(col: Column, dtype, bin_width_s: float) -> Column:
    """Integer bin id for a point: timestamps bin on epoch-microseconds,
    numerics on the raw value; both via floor division so negative values
    bin consistently."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        w = int(bin_width_s * 1_000_000)
        return F.floor(F.unix_micros(col.cast("timestamp_ltz")) / F.lit(w))
    return F.floor(col / F.lit(bin_width_s)).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    on: list[str] | str | None = None,
    *,
    bin_width_s: float = 3600.0,
    how: str = "inner",
    end_inclusive: bool = True,
    prefix: str = "",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Distributed range join: match point rows (``left_ts``) to interval
    rows (``[right_start, right_end]``), optionally within equality keys
    ``on`` — the BETWEEN-join a session/validity lookup needs
    (reference analog: the datetime-range C-FIND matching of
    ``operators/match.py`` P4, lifted from a predicate to a JOIN).

    Spark-first shape: a bare ``l.ts BETWEEN r.start AND r.end`` join has no
    equality key, so Catalyst plans a broadcast-nested-loop / cartesian
    product — O(|L|x|R|), a scale-killer. This operator makes it an
    EQUI-join on time bins: each interval explodes into the bins it covers
    (``sequence(floor(start/W), floor(end/W))``, pure codegen), each point
    carries its single bin, the join runs shuffle-hash/sort-merge on
    (bins, *on), and the exact BETWEEN predicate refines inside the join
    condition. A (point, interval) pair meets in EXACTLY one bin — the
    point's — so no post-join dedup is needed. Cost: |L| + sum(span/W)
    rows through one exchange; pick ``bin_width_s`` near the median
    interval span so most intervals explode into 1-2 bins. Oversized
    intervals (> ``max_bins_per_interval`` bins, e.g. a corrupt
    year-9999 end) fail loudly via ``assert_true`` rather than exploding
    the stage. Hot bins (everything in one hour) are plain join skew —
    AQE's skew-join splitting applies; keys in ``on`` usually dominate
    the distribution anyway.

    ``how``: 'inner' or 'left' (unmatched points survive with null right
    payload). Inverted (end < start) and null-bounded intervals never
    match. Output: all of ``left``, then ``<prefix><c>`` per right payload
    column, plus ``<prefix>matched_start`` / ``<prefix>matched_end``.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bin_width_s <= 0:
        raise ValueError("bin_width_s must be > 0")
    if bin_width_s < 1e-6 and isinstance(
        left.schema[left_ts].dataType, (T.TimestampType, T.TimestampNTZType)
    ):
        # the timestamp bin expression works in whole epoch-microseconds;
        # a sub-microsecond width would floor to w=0 and divide by zero,
        # yielding null bins (rows silently dropped) instead of an error
        raise ValueError(
            "bin_width_s must be >= 1e-6 (one microsecond) for timestamp "
            f"columns, got {bin_width_s}"
        )
    payload_cols = [
        c for c in right.columns if c not in (*keys, right_start, right_end)
    ]
    out_names = (
        list(left.columns)
        + [f"{prefix}{c}" for c in payload_cols]
        + [f"{prefix}matched_start", f"{prefix}matched_end"]
    )
    dups = sorted({n for n in out_names if out_names.count(n) > 1})
    if dups:
        raise ValueError(
            f"interval_join output would contain duplicate column(s) {dups}; "
            "pass a prefix (e.g. prefix='r_') to disambiguate"
        )
    reserved = {"_ij_bin", "_ij_s", "_ij_e"}
    clash = sorted(
        (set(left.columns) | set(right.columns)) & reserved
    )
    if clash:
        # a left '_ij_bin' would be silently OVERWRITTEN by the working
        # column; right-side clashes become ambiguous references — both
        # corrupt or confuse, so reject up front like the dup check above
        raise ValueError(
            f"interval_join reserves internal column name(s) {clash}; "
            "rename them before joining"
        )

    sdt = right.schema[right_start].dataType
    sbin = _bin_expr(F.col(right_start), sdt, bin_width_s)
    ebin = _bin_expr(F.col(right_end), right.schema[right_end].dataType, bin_width_s)
    r = (
        right.filter(
            F.col(right_start).isNotNull()
            & F.col(right_end).isNotNull()
            & (F.col(right_end) >= F.col(right_start))
        )
        # the guard is folded into sequence()'s end argument so it MUST
        # evaluate before the sequence is built — a free-standing
        # assert_true column can be reordered after the (exploding)
        # sequence by projection collapse, surfacing as an opaque
        # "array too big" task failure instead of this message
        .withColumn(
            "_ij_bin",
            F.explode(
                F.sequence(
                    sbin,
                    F.when(
                        ebin - sbin < F.lit(int(max_bins_per_interval)), ebin
                    ).otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    "interval_join: interval spans more than "
                                    f"{max_bins_per_interval} bins of "
                                    f"{bin_width_s}s ("
                                ),
                                F.col(right_start).cast("string"),
                                F.lit(" .. "),
                                F.col(right_end).cast("string"),
                                F.lit("); widen bin_width_s or clean the data"),
                            )
                        ).cast("long")
                    ),
                )
            ),
        )
        .select(
            "_ij_bin",
            *keys,
            F.col(right_start).alias("_ij_s"),
            F.col(right_end).alias("_ij_e"),
            *[F.col(c) for c in payload_cols],
        )
    )
    ldt = left.schema[left_ts].dataType
    l = left.withColumn("_ij_bin", _bin_expr(F.col(left_ts), ldt, bin_width_s))

    # qualify both sides: an unqualified left_ts is ambiguous whenever the
    # right payload carries a same-named column (legal with a prefix)
    refine = l[left_ts] >= r["_ij_s"]
    refine &= (
        l[left_ts] <= r["_ij_e"] if end_inclusive else l[left_ts] < r["_ij_e"]
    )
    cond = l["_ij_bin"] == r["_ij_bin"]
    for k in keys:
        cond &= l[k] == r[k]
    joined = l.join(r, cond & refine, "inner" if how == "inner" else "left")
    return joined.select(
        *[l[c] for c in left.columns],
        *[r[c].alias(f"{prefix}{c}") for c in payload_cols],
        r["_ij_s"].alias(f"{prefix}matched_start"),
        r["_ij_e"].alias(f"{prefix}matched_end"),
    )
