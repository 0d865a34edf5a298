"""Pure-pandas replay oracle — the independent ground truth.

Mirrors the reference's round-trip-oracle test style
(``DeidentifyEncryptDICOMTest.java:97-123``): an implementation-independent
computation of the expected final ``transcripts`` state after replaying the
full change log.

Semantics pinned in SURVEY.md §7.1:
* last-writer-wins per ``(conv_id, turn_idx)``, total order ``(op_seq, offset)``
  (offset tie-breaks duplicate op_seq — conflict policy);
* final op ``delete`` ⇒ row absent; ``insert``/``update`` ⇒ upsert (row takes
  that event's payload);
* malformed events (null conv_id, negative turn_idx, unknown op) are
  quarantined, never applied (reference: garbage → ``reject`` routing,
  ``DeidentifyDICOMTest.java:179-195``).
"""

from __future__ import annotations

import pandas as pd

FINAL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
VALID_OPS = ("insert", "update", "delete")


def split_malformed(events: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(valid, quarantined) — same predicate the engine uses (a null in any
    keyed/tested field is malformed: an unkeyable event cannot be applied)."""
    bad = (
        events["conv_id"].isna()
        | events["turn_idx"].isna()
        | (events["turn_idx"] < 0)
        | ~events["op"].isin(VALID_OPS)
        | events["op_seq"].isna()
    )
    return events[~bad], events[bad]


def replay_oracle(events: pd.DataFrame) -> pd.DataFrame:
    """Expected final transcripts state, sorted by (conv_id, turn_idx)."""
    df = events.copy()
    if "tool" not in df.columns:
        df["tool"] = None
    df, _ = split_malformed(df)
    df = df.sort_values(["op_seq", "offset"], kind="stable")
    last = df.groupby(["conv_id", "turn_idx"], as_index=False).tail(1)
    final = last[last["op"] != "delete"]
    return (
        final[FINAL_COLUMNS]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def assert_final_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Exact per-turn equality under stable (conv_id, turn_idx) ordering —
    the per-row invariant from BASELINE.json ``input_hint`` (``text`` must be
    byte-exact)."""
    a = actual[FINAL_COLUMNS].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = expected[FINAL_COLUMNS].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    a["ts"] = pd.to_datetime(a["ts"])
    e["ts"] = pd.to_datetime(e["ts"])
    # normalize missing values: engine may return None or NaN for absent tool
    for c in ("role", "text", "tool"):
        a[c] = a[c].where(a[c].notna(), None)
        e[c] = e[c].where(e[c].notna(), None)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
