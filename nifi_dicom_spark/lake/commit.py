"""Commit backends — the pluggable atomic-publish protocol of SnapshotTable.

A :class:`~nifi_dicom_spark.lake.snapshot_table.SnapshotTable` commit is ONE
atomic operation: publish the immutable manifest of version N such that
exactly one writer per version wins (optimistic concurrency) and readers
never observe a partial commit. Everything filesystem-specific about how
that atomicity is achieved lives here, behind :class:`CommitBackend` — the
engine's merge/compaction/ledger logic is byte-identical across backends.

Why a backend interface: the POSIX protocol (``O_EXCL`` create + atomic
``CURRENT`` pointer rename) rests on semantics object stores do NOT provide
— S3 has no rename, and until conditional writes there was no
create-if-absent. At the 100-TB deployment target the table lives on an
object store, so the commit contract must be expressible as a
**conditional put** (S3 ``If-None-Match: *``, GCS
``x-goog-if-generation-match: 0``, ABFS ``If-None-Match``), which
:class:`ConditionalPutCommitBackend` encodes. The reference gets the same
property from embedded Derby's transactional store
(``DeidentificationController.java:93-99``); Iceberg gets it from its
catalog's atomic swap — this module is the from-scratch analog of that
catalog contract.

Two concrete backends:

* :class:`PosixCommitBackend` (default) — ``O_EXCL`` manifest create plus a
  ``CURRENT`` pointer flipped by atomic rename. Because the commit is TWO
  steps, a writer can die between them; the backend therefore owns the
  orphan-repair protocol (age-guarded deletion of manifests ahead of
  CURRENT) that un-wedges the table.
* :class:`ConditionalPutCommitBackend` — the object-store shape: the
  conditional put of ``v{N}.json`` IS the commit (single atomic operation).
  No CURRENT pointer (current = max listed version), therefore **no
  mid-flip window and no orphans by construction** — a writer that dies
  before the put has published nothing; after it, the commit is complete.
  The backend takes any key-value store implementing the four-method
  contract of :class:`KVStore`; :class:`InMemoryKVStore` is the in-process
  reference implementation used by the fault-injection tests.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid
from abc import ABC, abstractmethod

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic concurrency)."""


class TableNotFoundError(FileNotFoundError):
    """No committed version exists at this location."""


class CommitBackend(ABC):
    """Atomic manifest publication + small-metadata storage.

    Contract:

    * :meth:`try_commit` must be **atomic and exclusive per version**: for
      any version N, at most one call across all processes ever returns
      True; losers return False and MUST NOT have altered the committed
      state. After a True return, :meth:`current_version` reflects N (or a
      later committed version) and :meth:`load_manifest` serves the exact
      payload.
    * :meth:`load_manifest` raises ``FileNotFoundError`` for versions never
      committed (or physically removed).
    * Blobs are unconditional last-writer-wins metadata (e.g. the vacuum
      record) — small, rarely written, no atomicity guarantee beyond
      whole-value replacement.
    """

    @abstractmethod
    def initialize(self) -> None:
        """Prepare an EMPTY location for version 0; raise ``FileExistsError``
        if a table already exists here."""

    @abstractmethod
    def try_commit(self, version: int, payload: bytes) -> bool:
        """Atomically publish ``payload`` as version ``version``.
        True = this writer won; False = the version was already committed."""

    @abstractmethod
    def current_version(self) -> int:
        """Newest committed version (raises :class:`TableNotFoundError` if
        nothing was ever committed)."""

    @abstractmethod
    def load_manifest(self, version: int) -> bytes:
        """Payload of a committed version (``FileNotFoundError`` if absent)."""

    def repair(self) -> int:
        """Backend-owned recovery of partially-committed state (called at
        table load). Returns the number of artifacts repaired. Backends whose
        commit is a single atomic operation have nothing to repair."""
        return 0

    @abstractmethod
    def put_blob(self, name: str, payload: bytes) -> None:
        """Unconditional small-metadata write (last writer wins)."""

    @abstractmethod
    def get_blob(self, name: str) -> bytes | None:
        """Read small metadata, or None if never written."""


# --------------------------------------------------------------------- POSIX


class PosixCommitBackend(CommitBackend):
    """O_EXCL + rename protocol for POSIX filesystems (the local default).

    Commit = (1) ``open(v{N}.json, O_CREAT|O_EXCL)`` — the per-version
    exclusivity point — then (2) atomic rename onto ``CURRENT``. A writer
    dying between (1) and (2) leaves an orphan manifest that would make
    every future commit of version N lose its O_EXCL race forever; orphan
    repair (backend-owned) deletes manifests ahead of CURRENT, age-guarded
    by ``orphan_age_s`` so a live concurrent writer mid-flip does not lose
    its fresh manifest.
    """

    def __init__(self, meta_dir: str, orphan_age_s: float = 10.0):
        self.meta_dir = meta_dir
        self.orphan_age_s = orphan_age_s

    # -- protocol ----------------------------------------------------------

    def initialize(self) -> None:
        try:
            os.makedirs(self.meta_dir, exist_ok=False)
            return
        except FileExistsError:
            if os.path.exists(os.path.join(self.meta_dir, "CURRENT")):
                raise  # a committed table lives here
            # a writer that died DURING create (v0.json published, CURRENT
            # never flipped) leaves a meta dir with only orphans — the one
            # crash window "ahead of CURRENT" repair can't see because there
            # is no CURRENT. Age-guarded repair, then proceed if empty.
            self._repair_ahead_of(-1)
            if any(_MANIFEST_RE.match(fn) for fn in os.listdir(self.meta_dir)):
                raise  # fresh manifest: possibly a LIVE creator mid-flip

    def _publish(self, version: int, payload: bytes) -> None:
        """One O_EXCL create + CURRENT flip; FileExistsError if v exists."""
        mpath = os.path.join(self.meta_dir, f"v{version}.json")
        fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
        except Exception:
            os.unlink(mpath)
            raise
        tmp = os.path.join(self.meta_dir, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.meta_dir, "CURRENT"))

    def try_commit(self, version: int, payload: bytes) -> bool:
        try:
            self._publish(version, payload)
            return True
        except FileExistsError:
            # an orphan from a crashed writer (manifest written, CURRENT not
            # flipped) is repaired and the commit retried once; a real
            # concurrent commit will have advanced CURRENT and still lose.
            if self.repair():
                try:
                    self._publish(version, payload)
                    return True
                except FileExistsError:
                    pass
            return False

    def current_version(self) -> int:
        try:
            with open(os.path.join(self.meta_dir, "CURRENT")) as f:
                return int(f.read().strip())
        except FileNotFoundError as e:
            raise TableNotFoundError(str(e)) from e

    def load_manifest(self, version: int) -> bytes:
        with open(os.path.join(self.meta_dir, f"v{version}.json"), "rb") as f:
            return f.read()

    def repair(self) -> int:
        """Remove manifests ahead of CURRENT (known-dead writers), skipping
        any younger than ``orphan_age_s`` (possibly a live writer mid-flip).
        A table with manifests but NO CURRENT (writer died during create)
        treats every manifest as an orphan — never raises, so
        :meth:`try_commit`'s repair-and-retry keeps its returns-False
        contract even in that state."""
        try:
            cur = self.current_version()
        except TableNotFoundError:
            cur = -1
        return self._repair_ahead_of(cur)

    def _repair_ahead_of(self, cur: int) -> int:
        removed = 0
        now = time.time()
        for fn in os.listdir(self.meta_dir):
            m = _MANIFEST_RE.match(fn)
            if m and int(m.group(1)) > cur:
                p = os.path.join(self.meta_dir, fn)
                try:
                    if now - os.path.getmtime(p) < self.orphan_age_s:
                        continue
                    os.unlink(p)
                    removed += 1
                except FileNotFoundError:
                    pass
        return removed

    # -- blobs -------------------------------------------------------------

    def put_blob(self, name: str, payload: bytes) -> None:
        tmp = os.path.join(self.meta_dir, f".{name}.{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(self.meta_dir, name))

    def get_blob(self, name: str) -> bytes | None:
        try:
            with open(os.path.join(self.meta_dir, name), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None


# ------------------------------------------------------------ object store


class KVStore(ABC):
    """The four operations an object store must provide (all atomic per key).

    Mapping to real stores: ``put_if_absent`` = S3 PutObject with
    ``If-None-Match: *`` / GCS ``if-generation-match: 0`` / ABFS create with
    ``If-None-Match`` (returns False on the 412 precondition failure);
    ``get`` = GetObject (None on 404); ``put`` = unconditional PutObject;
    ``list_keys`` = ListObjectsV2 under a prefix. No rename, no mtime, no
    directory semantics are assumed anywhere.
    """

    @abstractmethod
    def put_if_absent(self, key: str, payload: bytes) -> bool:
        """Atomically create ``key``; False (and no write) if it exists."""

    @abstractmethod
    def put(self, key: str, payload: bytes) -> None: ...

    @abstractmethod
    def get(self, key: str) -> bytes | None: ...

    @abstractmethod
    def list_keys(self, prefix: str) -> list[str]: ...


class InMemoryKVStore(KVStore):
    """Process-local reference implementation of the conditional-put
    contract (thread-safe); stands in for an object store in tests."""

    def __init__(self) -> None:
        self._data: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, key: str, payload: bytes) -> bool:
        with self._lock:
            if key in self._data:
                return False
            self._data[key] = bytes(payload)
            return True

    def put(self, key: str, payload: bytes) -> None:
        with self._lock:
            self._data[key] = bytes(payload)

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._data.get(key)

    def list_keys(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._data if k.startswith(prefix))


class ConditionalPutCommitBackend(CommitBackend):
    """Object-store commit protocol: the conditional put IS the commit.

    Single-operation atomicity: ``put_if_absent(v{N}.json)`` either publishes
    the complete manifest or does nothing — there is no CURRENT pointer to
    flip (current = max listed version) and therefore no mid-flip crash
    window, no orphan state, and :meth:`repair` is a structural no-op. This
    is strictly stronger than the POSIX protocol: the fault-injection the
    POSIX backend needs repair logic for cannot occur here by construction.

    ``list_keys`` per ``current_version()`` is one LIST call under the
    table's meta prefix — O(versions) keys, bounded by vacuum/retention, and
    amortized by the caller (SnapshotTable reads the manifest once per
    merge, not per row).
    """

    def __init__(self, kv: KVStore, prefix: str = ""):
        self.kv = kv
        self.prefix = prefix

    def _key(self, version: int) -> str:
        return f"{self.prefix}v{version}.json"

    def initialize(self) -> None:
        if self.kv.list_keys(self.prefix):
            raise FileExistsError(f"table already exists at '{self.prefix}'")

    def try_commit(self, version: int, payload: bytes) -> bool:
        return self.kv.put_if_absent(self._key(version), payload)

    def current_version(self) -> int:
        versions = [
            int(m.group(1))
            for k in self.kv.list_keys(self.prefix)
            for m in [_MANIFEST_RE.match(k[len(self.prefix):])]
            if m
        ]
        if not versions:
            raise TableNotFoundError(f"no committed version under '{self.prefix}'")
        return max(versions)

    def load_manifest(self, version: int) -> bytes:
        payload = self.kv.get(self._key(version))
        if payload is None:
            raise FileNotFoundError(self._key(version))
        return payload

    def put_blob(self, name: str, payload: bytes) -> None:
        self.kv.put(f"{self.prefix}{name}", payload)

    def get_blob(self, name: str) -> bytes | None:
        return self.kv.get(f"{self.prefix}{name}")


def dumps_manifest(manifest: dict) -> bytes:
    return json.dumps(manifest).encode()


def loads_manifest(payload: bytes) -> dict:
    return json.loads(payload.decode())
