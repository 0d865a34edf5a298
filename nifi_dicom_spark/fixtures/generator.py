"""Deterministic (seeded) change-event generator for the transcripts CDC log.

Mirrors the reference's fixture strategy (SURVEY.md §5): small deterministic
inputs with deliberately tricky cases — duplicate ``op_seq`` (conflict
policy), late events, hot keys (skew), mid-stream schema change (late-added
``tool`` column), and malformed events (garbage → quarantine routing,
reference precedent ``DeidentifyDICOMTest.java:179-195``).

Pure numpy/pandas — no Spark dependency — so the same generator feeds the
pure-pandas oracle and the Spark pipeline.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nifi_dicom_spark.model import ARROW_WIRE_FIELDS as _ARROW_FIELDS

_EPOCH0 = np.datetime64("2024-01-01T00:00:00", "us")

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "python", "browser", "calculator", "none"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream merge shuffle spark "
    "turn reply tool call plan answer question context token batch".split()
)


@dataclass
class GeneratorConfig:
    seed: int = 42
    n_conversations: int = 100
    max_turns: int = 20
    n_events: int = 5_000
    #: fraction of events that are updates / deletes (rest inserts)
    update_ratio: float = 0.25
    delete_ratio: float = 0.05
    #: fraction of events that duplicate an earlier event's (key, op_seq)
    duplicate_ratio: float = 0.05
    #: fraction of events delivered out of offset order (late arrivals)
    late_ratio: float = 0.10
    #: hot-key mode: this fraction of events hits `n_hot` conversations
    hot_fraction: float = 0.0
    n_hot: int = 3
    #: event index at which schema_ver flips 1 → 2 (tool column appears);
    #: 0 = all v2, None = all v1
    schema_change_at: int | None = 0
    #: fraction of malformed events (null conv_id / negative turn_idx)
    malformed_ratio: float = 0.0
    n_partitions: int = 4
    n_files: int = 8
    extra: dict = field(default_factory=dict)


def _texts(rng: np.random.Generator, n: int, widen: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-text; `widen` marks rows that get longer text
    (the widened-text schema-evolution case).

    Vectorized via a pre-built text pool (10k short + 2k wide variants) so
    multi-million-event logs generate in seconds."""
    pool_short = np.empty(10_000, dtype=object)
    for i in range(len(pool_short)):
        idx = rng.integers(0, len(_WORDS), size=rng.integers(3, 12))
        pool_short[i] = " ".join(_WORDS[idx])
    pool_wide = np.empty(2_000, dtype=object)
    for i in range(len(pool_wide)):
        idx = rng.integers(0, len(_WORDS), size=rng.integers(24, 96))
        pool_wide[i] = " ".join(_WORDS[idx])
    short = pool_short[rng.integers(0, len(pool_short), size=n)]
    wide = pool_wide[rng.integers(0, len(pool_wide), size=n)]
    return np.where(widen, wide, short)


def generate_change_events(cfg: GeneratorConfig) -> pd.DataFrame:
    """Generate the WAL/binlog-style event log as one pandas DataFrame,
    in offset (consumption) order, schema of FIXTURES.md §2."""
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events

    # --- key selection (with optional skew) -------------------------------
    conv = rng.integers(0, cfg.n_conversations, size=n)
    if cfg.hot_fraction > 0:
        hot_mask = rng.random(n) < cfg.hot_fraction
        conv[hot_mask] = rng.integers(0, cfg.n_hot, size=int(hot_mask.sum()))
    turn = rng.integers(0, cfg.max_turns, size=n).astype(np.int32)

    # --- ops ---------------------------------------------------------------
    r = rng.random(n)
    op = np.where(
        r < cfg.delete_ratio,
        "delete",
        np.where(r < cfg.delete_ratio + cfg.update_ratio, "update", "insert"),
    )

    # per-key monotone version counter; duplicates deliberately reuse one.
    # vectorized: rows are 'effective' (advance the counter) unless flagged
    # dup AND the key has been seen; dup rows draw a uniform existing seq.
    dup = rng.random(n) < cfg.duplicate_ratio
    key = conv.astype(np.int64) * (cfg.max_turns + 2) + turn
    s = pd.Series(np.arange(n))
    grp_all = s.groupby(key)
    first_occ = grp_all.cumcount().to_numpy() == 0
    eff = ~dup | first_occ
    inc = eff.astype(np.int64)
    cum_incl = pd.Series(inc).groupby(key).cumsum().to_numpy()
    op_seq = np.where(eff, cum_incl, 0)
    c_before = cum_incl - inc  # effective count before this row (≥1 on dups)
    dup_rows = ~eff
    u = rng.random(n)
    op_seq = np.where(
        dup_rows, 1 + np.floor(u * np.maximum(c_before, 1)).astype(np.int64), op_seq
    ).astype(np.int64)

    # --- payload -----------------------------------------------------------
    role = _ROLES[rng.integers(0, len(_ROLES), size=n)]
    widen = (op == "update") & (rng.random(n) < 0.5)
    text = _texts(rng, n, widen)
    tool = np.where(
        rng.random(n) < 0.3, _TOOLS[rng.integers(0, len(_TOOLS), size=n)], None
    )
    ts = _EPOCH0 + (np.cumsum(rng.integers(1, 1000, size=n))).astype("timedelta64[ms]")

    # deletes carry no payload
    is_del = op == "delete"
    role = np.where(is_del, None, role)
    text = np.where(is_del, None, text)
    tool = np.where(is_del, None, tool)

    # --- schema version ----------------------------------------------------
    if cfg.schema_change_at is None:
        schema_ver = np.ones(n, dtype=np.int32)
    else:
        schema_ver = np.where(np.arange(n) < cfg.schema_change_at, 1, 2).astype(np.int32)
    tool = np.where(schema_ver == 1, None, tool)  # v1 events have no tool column

    # --- malformed ---------------------------------------------------------
    conv_id = np.array([f"conv-{c:06d}" for c in conv], dtype=object)
    if cfg.malformed_ratio > 0:
        bad = rng.random(n) < cfg.malformed_ratio
        kind = rng.integers(0, 3, size=n)
        conv_id[bad & (kind == 0)] = None
        turn = np.where(bad & (kind == 1), -1, turn).astype(np.int32)
        op = np.where(bad & (kind == 2), "truncate", op)  # unknown op

    df = pd.DataFrame(
        {
            "offset": np.arange(n, dtype=np.int64),
            "partition_id": (conv % cfg.n_partitions).astype(np.int32),
            "op": op,
            "op_seq": op_seq,
            "conv_id": conv_id,
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "schema_ver": schema_ver,
        }
    )

    # late delivery: shuffle a fraction of rows a short distance while
    # keeping `offset` as the authoritative commit order
    if cfg.late_ratio > 0:
        order = np.arange(n, dtype=np.int64)
        late = rng.random(n) < cfg.late_ratio
        delay = rng.integers(1, 50, size=n)
        sort_key = order + np.where(late, delay, 0)
        df = df.iloc[np.argsort(sort_key, kind="stable")].reset_index(drop=True)

    return df


def write_event_files(
    df: pd.DataFrame,
    out_dir: str,
    n_files: int,
    drop_tool_for_v1: bool = True,
    codec: str = "snappy",
) -> list[str]:
    """Serialize the event log as N parquet files named in delivery order so a
    Spark file-source stream consumes them as ordered micro-batches
    (SURVEY §2.1 S1: offset-ordered micro-batches replace push callbacks).

    Files whose rows are all ``schema_ver==1`` are written *without* the
    ``tool`` column — physically exercising mid-stream schema evolution.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    chunks = np.array_split(np.arange(len(df)), n_files)
    for i, idx in enumerate(chunks):
        part = df.iloc[idx]
        if drop_tool_for_v1 and len(part) and (part["schema_ver"] == 1).all():
            part = part.drop(columns=["tool"])
        p = os.path.join(out_dir, f"events-{i:05d}.parquet")
        # explicit Arrow schema: an all-null string column must still be
        # physically string-typed, or readers see a null-typed column
        schema = pa.schema([(c, _ARROW_FIELDS[c]) for c in part.columns])
        pq.write_table(
            pa.Table.from_pandas(part, schema=schema, preserve_index=False),
            p,
            compression=codec,
        )
        paths.append(p)
    return paths
