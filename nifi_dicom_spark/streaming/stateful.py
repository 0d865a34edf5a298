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
and ONE completion row is emitted. Late events for an already-completed
conversation simply re-open state and emit a superseding completion row —
the LWW-merge downstream absorbs it exactly like T3's reprocess flag, with
no reprocess bookkeeping.

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
        T.StructField("max_ts_us", T.LongType(), False),
    ]
)


def _completeness_fn(gap_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, max_ts_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_events": [n],
                    "last_ts": [pd.Timestamp(max_ts_us, unit="us")],
                    "completed": [True],
                }
            )
            return
        n, max_ts_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                batch_max = pdf["ts"].max()
                if pd.notna(batch_max):
                    max_ts_us = max(max_ts_us, int(batch_max.value // 1_000))
        state.update((n, max_ts_us))
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
    been quiet for ``gap_seconds`` of event time.

    ``events`` must be a streaming DataFrame with ``conv_id`` and ``ts``.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _completeness_fn(gap_seconds),
            outputStructType=COMPLETION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
