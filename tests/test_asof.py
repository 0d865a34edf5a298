"""asof_join edge cases: direction, tolerance, ties, null keys/timestamps."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from nifi_dicom_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:10:00"), 1),
            ("a", _ts("2024-01-01 01:00:00"), 2),
            ("a", _ts("2024-01-01 02:00:00"), 3),
            ("b", _ts("2024-01-01 00:00:00"), 4),  # before any right row
            (None, _ts("2024-01-01 01:00:00"), 5),  # null key
            ("a", None, 6),  # null left ts
        ],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 10, "r10"),
            ("a", _ts("2024-01-01 01:00:00"), 11, "r11"),  # tie with left @01:00
            ("a", _ts("2024-01-01 01:00:00"), 12, "r12"),  # dup ts: seq 12 wins
            ("b", _ts("2024-01-01 05:00:00"), 13, "r13"),
            (None, _ts("2024-01-01 00:00:00"), 14, "r14"),  # null right key
            ("a", None, 15, "r15"),  # null right ts: never matches
        ],
        "k string, ts timestamp, seq int, v string",
    )
    return left, right


def _by_lid(df):
    return {r["lid"]: r for r in df.collect()}


def test_backward_inclusive_and_ties(spark, frames):
    left, right = frames
    out = _by_lid(asof_join(left, right, on="k", right_seq="seq"))
    assert out[1]["v"] == "r10"  # 00:10 -> latest at/before = 00:00
    assert out[2]["v"] == "r12"  # tie at 01:00 inclusive; max seq wins
    assert out[3]["v"] == "r12"  # 02:00 -> 01:00
    assert out[4]["v"] is None  # 'b' has no right row at/before 00:00
    assert out[5]["v"] is None  # null key never matches
    assert out[6]["v"] is None  # null left ts never matches


def test_forward_direction(spark, frames):
    left, right = frames
    out = _by_lid(asof_join(left, right, on="k", direction="forward", right_seq="seq"))
    assert out[1]["v"] == "r12"  # 00:10 -> earliest at/after = 01:00, max seq
    assert out[2]["v"] == "r12"  # inclusive at equal ts
    assert out[3]["v"] is None  # nothing after 02:00 for 'a'
    assert out[4]["v"] == "r13"  # 'b' 00:00 -> 05:00
    assert out[5]["v"] is None and out[6]["v"] is None


def test_tolerance_voids_stale_matches(spark, frames):
    left, right = frames
    out = _by_lid(asof_join(left, right, on="k", tolerance_s=600, right_seq="seq"))
    assert out[1]["v"] == "r10"  # 10 min gap == tolerance, kept
    assert out[3]["v"] is None  # 60 min gap > 10 min tolerance, voided
    out2 = _by_lid(
        asof_join(
            left, right, on="k", direction="forward", tolerance_s=3600, right_seq="seq"
        )
    )
    assert out2[1]["v"] == "r12"  # 50 min ahead <= 60 min
    assert out2[4]["v"] is None  # 'b': 5 h ahead > 1 h, voided


def test_payload_struct_tiebreak_deterministic(spark, frames):
    left, right = frames
    # no right_seq: ties broken by the payload struct itself — the row with
    # the lexically-largest (ts, seq, v) wins, which is again seq=12
    out = _by_lid(asof_join(left, right, on="k"))
    assert out[2]["v"] == "r12"
    assert out[2]["seq"] == 12


def test_matched_ts_and_prefix(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", prefix="r_", right_seq="seq")
    assert {"r_seq", "r_v", "r_matched_ts"} <= set(out.columns)
    row = {r["lid"]: r for r in out.collect()}[3]
    assert row["r_matched_ts"] == _ts("2024-01-01 01:00:00")


def test_numeric_ts_and_tolerance(spark):
    left = spark.createDataFrame([(1, 100, 1), (1, 205, 2)], "k int, t long, lid int")
    right = spark.createDataFrame([(1, 90, "x"), (1, 200, "y")], "k int, t long, s string")
    out = _by_lid(asof_join(left, right, on="k", left_ts="t", tolerance_s=10))
    assert out[1]["s"] == "x" and out[2]["s"] == "y"
    out2 = _by_lid(asof_join(left, right, on="k", left_ts="t", tolerance_s=7))
    assert out2[1]["s"] is None and out2[2]["s"] == "y"


def test_single_exchange_plan(spark, frames):
    left, right = frames
    plan = asof_join(left, right, on="k", right_seq="seq")._jdf.queryExecution(
    ).executedPlan().toString()
    # one shuffle on the key for the window; the union must not add its own
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_rejects_colliding_output_columns(spark):
    left = spark.createDataFrame([("k", 1, 5)], "k string, ts long, value long")
    right = spark.createDataFrame([("k", 1, 9)], "k string, ts long, value long")
    from nifi_dicom_spark.operators.asof import asof_join

    import pytest

    with pytest.raises(ValueError, match="duplicate column"):
        asof_join(left, right, on="k", left_ts="ts")
    # a prefix disambiguates
    out = asof_join(left, right, on="k", left_ts="ts", prefix="r_")
    assert out.collect()[0]["r_value"] == 9


# --- interval (range) join ----------------------------------------------------


def _ij_frames(spark):
    import datetime as dt

    L = spark.createDataFrame(
        [(i, "c1" if i % 2 else "c2", dt.datetime(2024, 1, 1, 0, 0, i)) for i in range(20)]
        + [(99, "c1", None)],
        "id long, conv string, ts timestamp",
    )
    R = spark.createDataFrame(
        [
            ("c1", dt.datetime(2024, 1, 1, 0, 0, 3), dt.datetime(2024, 1, 1, 0, 0, 8), "s1"),
            ("c2", dt.datetime(2024, 1, 1, 0, 0, 5), dt.datetime(2024, 1, 1, 0, 0, 6), "s2"),
            ("c1", dt.datetime(2024, 1, 1, 0, 0, 15), dt.datetime(2024, 1, 1, 0, 0, 15), "s3"),
            ("c1", dt.datetime(2024, 1, 1, 0, 0, 9), dt.datetime(2024, 1, 1, 0, 0, 2), "inverted"),
            ("c2", None, dt.datetime(2024, 1, 1, 0, 0, 9), "nullstart"),
        ],
        "conv string, start timestamp, end timestamp, label string",
    )
    return L, R


def test_interval_join_semantics(spark):
    from nifi_dicom_spark.operators.asof import interval_join

    L, R = _ij_frames(spark)
    out = interval_join(L, R, "ts", "start", "end", on="conv", bin_width_s=4.0, prefix="r_")
    rows = sorted((r["id"], r["r_label"]) for r in out.collect())
    # inverted and null-bounded intervals never match; degenerate [15,15]
    # matches its single point; null left ts matches nothing
    assert rows == [(3, "s1"), (5, "s1"), (6, "s2"), (7, "s1"), (15, "s3")]
    # matched bounds surface
    m = {(r["id"], r["r_label"]): r["r_matched_start"] for r in out.collect()}
    assert m[(15, "s3")].second == 15


def test_interval_join_left_and_exclusive_end(spark):
    from nifi_dicom_spark.operators.asof import interval_join

    L, R = _ij_frames(spark)
    out = interval_join(
        L, R, "ts", "start", "end", on="conv", bin_width_s=4.0, prefix="r_", how="left"
    )
    assert out.count() == 21  # every left row exactly once here
    assert out.filter("r_label is not null").count() == 5
    out2 = interval_join(
        L, R, "ts", "start", "end", on="conv", bin_width_s=4.0,
        prefix="r_", end_inclusive=False,
    )
    s = {(r["id"], r["r_label"]) for r in out2.collect()}
    assert (3, "s1") in s and (15, "s3") not in s  # [15,15) is empty


def test_interval_join_numeric_no_keys_and_plan(spark):
    from nifi_dicom_spark.operators.asof import interval_join

    Ln = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, x double")
    Rn = spark.createDataFrame(
        [(2.0, 4.5, "a"), (8.0, 9.0, "b")], "s double, e double, lab string"
    )
    out = interval_join(Ln, Rn, "x", "s", "e", bin_width_s=2.0)
    got = sorted((r["id"], r["lab"]) for r in out.collect())
    assert got == [(2, "a"), (3, "a"), (4, "a"), (8, "b"), (9, "b")]
    # the whole point: an EQUI-join plan, never nested-loop/cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_oversize_guard_and_validation(spark):
    import pytest as _pytest

    from nifi_dicom_spark.operators.asof import interval_join

    Ln = spark.createDataFrame([(1, 0.5)], "id long, x double")
    Rbad = spark.createDataFrame([(0.0, 1e9, "huge")], "s double, e double, lab string")
    with _pytest.raises(Exception, match="spans more than"):
        interval_join(Ln, Rbad, "x", "s", "e", bin_width_s=1.0).collect()
    with _pytest.raises(ValueError, match="bin_width_s"):
        interval_join(Ln, Rbad, "x", "s", "e", bin_width_s=0)
    # sub-microsecond widths on timestamp columns would floor the
    # microsecond bin divisor to 0 (silent null bins) — rejected up front
    Lts = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1))], "id long, x timestamp"
    )
    Rts = spark.createDataFrame(
        [(dt.datetime(2026, 1, 1), dt.datetime(2026, 1, 2), "a")],
        "s timestamp, e timestamp, lab string",
    )
    with _pytest.raises(ValueError, match="microsecond"):
        interval_join(Lts, Rts, "x", "s", "e", bin_width_s=1e-9)
    with _pytest.raises(ValueError, match="how"):
        interval_join(Ln, Rbad, "x", "s", "e", how="full")
    Rdup = spark.createDataFrame([(0.0, 1.0, 7)], "s double, e double, id long")
    with _pytest.raises(ValueError, match="duplicate"):
        interval_join(Ln, Rdup, "x", "s", "e")


def test_interval_join_rejects_reserved_internal_names(spark):
    import pytest as _pytest

    from nifi_dicom_spark.operators.asof import interval_join

    L = spark.createDataFrame([(1, 0.5, 9)], "id long, x double, _ij_bin long")
    R = spark.createDataFrame([(0.0, 1.0, "a")], "s double, e double, lab string")
    with _pytest.raises(ValueError, match="reserves internal"):
        interval_join(L, R, "x", "s", "e")
    L2 = spark.createDataFrame([(1, 0.5)], "id long, x double")
    R2 = spark.createDataFrame([(0.0, 1.0, "a")], "s double, e double, _ij_s string")
    with _pytest.raises(ValueError, match="reserves internal"):
        interval_join(L2, R2, "x", "s", "e")


def test_interval_join_skewed_bin_aqe_split(spark):
    """Skew datapoint (VERDICT r4 #7): every point lands in ONE hour, so at
    bin_width_s=3600 the equi-join key has a single hot bin — the worst
    case for the bin-bucketed plan. With AQE skew-join enabled (and the
    detection thresholds scaled to test-sized data) the hot partition is
    split, the join stays a (skewed) sort-merge — never a nested loop —
    and results are IDENTICAL to a fine-binned run where the same rows
    spread over 60 bins. At scale the same conf defaults handle celebrity
    bins; the knee is documented in BENCH/R5.md: shrinking bin_width_s
    multiplies interval replication (sum(span/W)) but divides per-bin
    fan-in, so W ~ median interval span balances the two, and AQE covers
    the residual hot bins."""
    from nifi_dicom_spark.operators.asof import interval_join

    N = 50_000
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    L = spark.range(N).select(
        F.col("id"),
        (F.lit(base) + F.make_interval(secs=(F.col("id") % 3600))).alias("ts"),
    )
    R = spark.createDataFrame(
        [
            (base + dt.timedelta(seconds=180 * i), base + dt.timedelta(seconds=180 * i + 599), f"s{i}")
            for i in range(20)
        ],
        "start timestamp, end timestamp, label string",
    )
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        t0 = time.monotonic()
        hot = interval_join(
            L, R, "ts", "start", "end", bin_width_s=3600.0, prefix="r_"
        )
        n_hot = len(hot.collect())  # collect drives HOT's own query
        # execution, so executedPlan() below is the FINAL adaptive plan
        hot_secs = time.monotonic() - t0
        plan = hot._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "NestedLoop" not in plan
        # AQE marked + split the hot partition
        assert "skew=true" in plan, plan[:2000]
        fine = interval_join(
            L, R, "ts", "start", "end", bin_width_s=60.0, prefix="r_"
        )
        assert fine.count() == n_hot > 0
        # bounded: a nested-loop fallback at |L|x|R| or an unsplit hot
        # partition on one core takes far longer than this envelope
        assert hot_secs < 60, hot_secs
    finally:
        for k, v in saved.items():
            conf.set(k, v)
