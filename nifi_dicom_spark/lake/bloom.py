"""Per-file key Bloom filters for point-lookup pruning.

The Hudi bloom-index shape (bloom metadata travels WITH the immutable data
file, not inside the table manifest): each data file ``<rel>.parquet`` may
have a sidecar ``<rel>.parquet.bloom`` holding a Bloom filter over the
file's DISTINCT bucket-key values (``key_cols[0]``). A point lookup then
prunes in two stages — bucket (a key lives in exactly one murmur3 bucket)
and, within the bucket, any file whose bloom definitively excludes every
requested key. False positives cost an extra file read; false negatives
are impossible, so pruning never changes results.

Why sidecars and not manifest entries: at 0.01 fpp a 1M-distinct-key file
needs ~1.2 MB of filter — embedding that in the manifest JSON would grow
the one-GET metadata path by O(total files × MB). A sidecar is fetched
only for the ONE bucket a lookup touches (a handful of small GETs), and
because data files are immutable and uuid-named, a sidecar can never go
stale: it describes exactly the file it sits next to, forever. Files
without a sidecar simply aren't pruned (built lazily by
``SnapshotTable.build_blooms``; replaced files orphan their sidecar,
reaped by ``vacuum``).

Hash family: two independent 64-bit halves of ``md5(utf8(key))`` combined
by double hashing ``idx_i = (h1 + i*h2) mod m`` (Kirsch–Mitzenmacker).
md5 here is a deterministic mixer, not a security boundary — it is
stable across Python/numpy versions, which Spark's murmur3 seedless
Python ports are not guaranteed to be.

Reference analog: the reference answers per-key existence probes against
its index before fetching objects (``DatabaseInformationModel.java:787-794``
insertObject's select-then-insert; C-FIND unique-key gating,
``QueryRetrieveController``); this module is that probe re-expressed as
file-skipping metadata for a lake table.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os
from typing import Iterable

import numpy as np

# floor for tiny files: below this many bits the filter costs nothing and
# rounding noise would dominate the fpp math
_MIN_BITS = 64
_FORMAT = 1


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at false-positive rate
    ``fpp``: m = -n·ln p / ln²2, k = (m/n)·ln 2. m is rounded up to a
    whole byte."""
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(int(n_keys), 1)
    m = max(int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))), _MIN_BITS)
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _hash_pair(key: str) -> tuple[int, int]:
    d = hashlib.md5(str(key).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    # odd stride: full period over any m, no degenerate h2=0 collapse
    h2 = int.from_bytes(d[8:], "little") | 1
    return h1, h2


def build_bloom(keys: Iterable, m: int, k: int) -> bytes:
    """Bitmap (little-endian bit order within bytes) with every key's k
    double-hashed positions set. Keys are stringified exactly as
    :func:`might_contain` stringifies its probe."""
    bits = np.zeros(m // 8, dtype=np.uint8)
    ks = np.arange(k, dtype=np.uint64)
    for key in keys:
        h1, h2 = _hash_pair(key)
        idx = (np.uint64(h1) + ks * np.uint64(h2)) % np.uint64(m)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(1, (idx & np.uint64(7)).astype(np.uint8),
                                       dtype=np.uint8))
    return bits.tobytes()


def might_contain(blob: bytes, m: int, k: int, key) -> bool:
    bits = np.frombuffer(blob, dtype=np.uint8)
    h1, h2 = _hash_pair(key)
    for i in range(k):
        # the build side runs in uint64: wrap mod 2^64 BEFORE mod m, or a
        # probe of a key whose hash sum overflows lands on different bits
        idx = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m
        if not (int(bits[idx >> 3]) >> (idx & 7)) & 1:
            return False
    return True


def encode_sidecar(key_col: str, n_keys: int, m: int, k: int, blob: bytes) -> bytes:
    """Serialized sidecar payload (versioned JSON; corrupt/unknown payloads
    are treated as 'no filter', never an error)."""
    return json.dumps(
        {
            "format": _FORMAT,
            "key_col": key_col,
            "n": int(n_keys),
            "m": int(m),
            "k": int(k),
            "b64": base64.b64encode(blob).decode("ascii"),
        }
    ).encode("utf-8")


def load_sidecar(path: str, key_col: str) -> dict | None:
    """Parse a sidecar; None when absent, unreadable, a different format
    version, or built over a different key column (all mean: don't prune)."""
    try:
        with open(path, "rb") as f:
            doc = json.loads(f.read())
        if doc.get("format") != _FORMAT or doc.get("key_col") != key_col:
            return None
        doc["blob"] = base64.b64decode(doc["b64"])
        if len(doc["blob"]) * 8 != doc["m"] or doc["k"] < 1:
            return None
        return doc
    except (OSError, ValueError, KeyError, TypeError):
        return None


def sidecar_excludes(doc: dict | None, values: Iterable) -> bool:
    """True only when the filter PROVES no requested value is in the file.
    No filter (doc=None) → cannot exclude."""
    if doc is None:
        return False
    return not any(might_contain(doc["blob"], doc["m"], doc["k"], v) for v in values)
