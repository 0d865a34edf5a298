"""Custom stateful streaming operator: gap-timeout conversation completeness
(SURVEY §2.9 T2/T3).

Reference semantics: ``StudyReceiver`` processes a study only once it has
been quiescent — ``now − mostRecentInsertionTime > interval`` — polling a
flag table and resetting it when late/duplicate instances arrive
(``StudyReceiver.processStudyIfComplete:225-243``, reset ``:297-305``).

Spark-first shape: ``applyInPandasWithState`` over ``groupBy(conv_id)`` with
an **event-time timeout**: per-conversation state tracks (n_events, max_ts);
each batch of events for the key extends the timeout to ``max_ts + gap``;
when the watermark passes that point with no new events, the state times out
and ONE completion row is emitted.

Late events after completion: the emitted count is kept in a TOMBSTONE for
one further gap period — a late event landing inside that window increments
the CUMULATIVE count and the next timeout emits a superseding completion row
(full count, not a since-reopen count), which the LWW-merge downstream
absorbs exactly like T3's reprocess flag. A tombstone that sees no new
events for a whole further gap is removed (state stays bounded: one extra
gap of retention per completed conversation, never forever). A straggler
arriving after tombstone GC re-opens the conversation with a fresh count —
the bounded-state trade, taken deliberately and documented here.

Timezone: ``applyInPandasWithState`` delivers timestamps converted to
``spark.sql.session.timeZone`` as NAIVE pandas values, while
``setTimeoutTimestamp``/``getCurrentWatermarkMs`` are true UTC epoch
millis — the kernel therefore localizes batch maxima back through the
session zone before comparing, or a UTC±k session would shift every
deadline by k hours (premature/late completions).

All state logic is vectorized over Arrow batches (pandas inside the kernel);
state per key is O(1) — this scales to 10^8 live conversations bounded only
by the state store.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COMPLETION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("completed", T.BooleanType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("max_ts_us", T.LongType(), False),  # UTC epoch micros
        T.StructField("n_emitted", T.LongType(), False),
    ]
)


def _completeness_fn(gap_seconds: int, session_tz: str):
    def _to_utc_us(naive_ts: pd.Timestamp) -> int:
        # naive session-zone wall time → UTC epoch micros (DST-ambiguous
        # wall times resolve to the DST reading; deterministic)
        t = naive_ts.tz_localize(
            session_tz, ambiguous=True, nonexistent="shift_forward"
        )
        return int(t.tz_convert("UTC").value // 1_000)

    def _to_session_naive(utc_us: int) -> pd.Timestamp:
        return (
            pd.Timestamp(utc_us, unit="us", tz="UTC")
            .tz_convert(session_tz)
            .tz_localize(None)
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, max_ts_us, n_emitted = state.get
            if n == n_emitted:
                # tombstone drained: nothing new since the last completion
                # row — GC the state, emit nothing
                state.remove()
            else:
                yield pd.DataFrame(
                    {
                        "conv_id": [conv_id],
                        "n_events": [n],
                        "last_ts": [_to_session_naive(max_ts_us)],
                        "completed": [True],
                    }
                )
                # keep the cumulative count for one more gap so a late
                # event supersedes with the FULL count, then GC above
                state.update((n, max_ts_us, n))
                try:
                    wm = state.getCurrentWatermarkMs()
                except Exception:
                    wm = 0
                state.setTimeoutTimestamp(
                    max(max_ts_us // 1_000 + 2 * gap_seconds * 1_000, wm + 1)
                )
            return
        n, max_ts_us, n_emitted = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                batch_max = pdf["ts"].max()
                if pd.notna(batch_max):
                    max_ts_us = max(max_ts_us, _to_utc_us(batch_max))
        state.update((n, max_ts_us, n_emitted))
        # quiescence deadline: gap after the newest event seen for this key;
        # clamp above the current watermark (a late batch's deadline may
        # already be in the past — time out at the next opportunity)
        deadline_ms = max_ts_us // 1_000 + gap_seconds * 1_000
        try:
            wm = state.getCurrentWatermarkMs()
        except Exception:
            wm = 0
        state.setTimeoutTimestamp(max(deadline_ms, wm + 1))
        yield pd.DataFrame(
            columns=["conv_id", "n_events", "last_ts", "completed"]
        ).astype(
            {"n_events": "int64", "completed": "bool"}
        )

    return fn


def conversation_completeness(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming DF of completion rows: one per conversation once it has
    been quiet for ``gap_seconds`` of event time; a late event within one
    further gap yields a superseding row with the cumulative count.

    ``events`` must be a streaming DataFrame with ``conv_id`` and ``ts``.
    """
    session_tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _completeness_fn(gap_seconds, session_tz or "UTC"),
            outputStructType=COMPLETION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
