"""Reversible payload encryption — the engine's opaque-bytes transform
exemplar (SURVEY §2.8 F9).

Reference: AES-256-CBC CMS envelope with PBKDF2 (PKCS5 v2, salt+iterations)
used to stash the original attributes inside the deidentified object for
later re-identification (``util/Encryption.java:44-78``; applied
``DeidentifyEncryptDICOM.java:425-443``, inverted
``DecryptReidentifyDICOM.java:147-152``).

Spark-first shape: **vectorized pandas UDFs over BinaryType** — Arrow moves
the byte payloads in columnar batches; the cipher runs inside the batch (the
"no per-row Python in the plan" rule means no row-at-a-time Python UDF
*boundary*; the kernel itself is necessarily per-value, like the reference's
per-object Java loop).

Determinism deviation, by design: the reference draws a random salt per
envelope; here the KDF salt is derived from the password alone (per-VALUE
uniqueness comes from the IV, which is derived from (password, plaintext)
via HMAC), so encryption is a pure function — replaying an epoch produces
byte-identical envelopes and the idempotent MERGE stays a no-op (the
engine-wide determinism rule, SURVEY §7.1.3) — and the deliberately-slow
PBKDF2 runs once per password, not once per row.

The envelope is authenticated: an HMAC-SHA256 tag (truncated to 16 bytes)
over iv‖ciphertext, keyed by the AES key, is appended. Decrypting with a
wrong password (or a corrupted envelope) fails the tag check and
deterministically returns null — without the tag, PKCS7 unpadding passes
with ~1/256 probability per value and silently returns garbage.

Envelope layout (format v2 — the magic was bumped when the HMAC tag was
added, so v1 ``NDS1`` envelopes are cleanly detected as foreign rather than
sliced wrongly and failing the tag check):
b"NDS2" ‖ salt(16) ‖ iv(16) ‖ AES-256-CBC(PKCS7(plaintext)) ‖ hmac_tag(16).
"""

from __future__ import annotations

import hashlib
import hmac

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"NDS2"  # v2: authenticated envelopes (v1 "NDS1" had no tag)
_ITERATIONS = 10_000  # reference default ballpark; PBKDF2 cost knob


from functools import lru_cache


@lru_cache(maxsize=64)
def _derive_key(password: str, salt: bytes) -> bytes:
    """PBKDF2 is deliberately slow (10k SHA-256 rounds); cached because the
    engine derives ONE key per (password, column-salt) — bulk-column
    practice (cf. parquet modular encryption) — with per-VALUE uniqueness
    coming from the IV, not the salt. A per-row salt would put one full
    PBKDF2 in every row's hot path (measured: 43 s for 5k rows)."""
    return hashlib.pbkdf2_hmac("sha256", password.encode(), salt, _ITERATIONS, 32)


def _column_salt(password: str) -> bytes:
    return hmac.new(password.encode(), b"nds1-column-salt", hashlib.sha256).digest()[
        :16
    ]


def _encrypt_one(password: str, plaintext: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    from cryptography.hazmat.primitives.padding import PKCS7

    salt = _column_salt(password)
    # deterministic per-value IV: same (password, plaintext) → same envelope,
    # so replayed epochs re-encrypt byte-identically (idempotent MERGE)
    iv = hmac.new(password.encode(), plaintext, hashlib.sha256).digest()[:16]
    key = _derive_key(password, salt)
    padder = PKCS7(128).padder()
    padded = padder.update(plaintext) + padder.finalize()
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    ct = enc.update(padded) + enc.finalize()
    tag = hmac.new(key, iv + ct, hashlib.sha256).digest()[:16]
    return MAGIC + salt + iv + ct + tag


def _decrypt_one(password: str, envelope: bytes) -> bytes | None:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    from cryptography.hazmat.primitives.padding import PKCS7

    if envelope is None or not envelope.startswith(MAGIC) or len(envelope) < 52:
        return None  # the reference's "detect" path: not an envelope
    salt, iv = envelope[4:20], envelope[20:36]
    ct, tag = envelope[36:-16], envelope[-16:]
    key = _derive_key(password, salt)
    want = hmac.new(key, iv + ct, hashlib.sha256).digest()[:16]
    if not hmac.compare_digest(tag, want):
        return None  # wrong key / corrupt envelope → deterministic null
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    try:
        padded = dec.update(ct) + dec.finalize()
        unpadder = PKCS7(128).unpadder()
        return unpadder.update(padded) + unpadder.finalize()
    except ValueError:
        return None  # unreachable post-tag-check; kept as defense in depth


def encrypt_payload(col: str | Column, password: str) -> Column:
    """BinaryType → BinaryType AES envelope (Arrow-batched)."""

    @F.pandas_udf(T.BinaryType())
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(lambda p: None if p is None else _encrypt_one(password, bytes(p)))

    return _enc(F.col(col) if isinstance(col, str) else col)


def decrypt_payload(col: str | Column, password: str) -> Column:
    """Inverse of :func:`encrypt_payload`; non-envelopes decrypt to null
    (detect-then-decrypt, ``DecryptReidentifyDICOM.java:147-152``)."""

    @F.pandas_udf(T.BinaryType())
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda p: None if p is None else _decrypt_one(password, bytes(p)))

    return _dec(F.col(col) if isinstance(col, str) else col)


def is_envelope(col: str | Column) -> Column:
    """Cheap JVM-side detect predicate (no Python): magic-prefix check."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 4) == F.lit(MAGIC)
