"""Commit backends — the pluggable atomic-publish protocol of SnapshotTable.

A :class:`~nifi_dicom_spark.lake.snapshot_table.SnapshotTable` commit is ONE
atomic operation: publish the immutable manifest of version N such that
exactly one writer per version wins (optimistic concurrency) and readers
never observe a partial commit. Everything filesystem-specific about how
that atomicity is achieved lives here, behind :class:`CommitBackend` — the
engine's merge/compaction/ledger logic is byte-identical across backends.

Why a backend interface: the POSIX protocol (atomic ``link(2)`` publish)
rests on semantics object stores do NOT provide — S3 has no hard links or
rename, and until conditional writes there was no create-if-absent. At the
100-TB deployment target the table lives on an
object store, so the commit contract must be expressible as a
**conditional put** (S3 ``If-None-Match: *``, GCS
``x-goog-if-generation-match: 0``, ABFS ``If-None-Match``), which
:class:`ConditionalPutCommitBackend` encodes. The reference gets the same
property from embedded Derby's transactional store
(``DeidentificationController.java:93-99``); Iceberg gets it from its
catalog's atomic swap — this module is the from-scratch analog of that
catalog contract.

Two concrete backends, BOTH single-operation commits (current = max listed
version; no pointer to flip, no mid-commit crash window, no orphan
manifests by construction):

* :class:`PosixCommitBackend` (default) — write the payload to a temp
  file, fsync, then ``os.link(tmp, v{N}.json)``: link(2) is the
  filesystem's conditional put (atomic, ``EEXIST`` for losers) and the
  published name never exists with a partial payload. A writer that dies
  before the link has published nothing; its temp file is age-swept
  litter. (An earlier two-step O_EXCL+CURRENT design is retired — see the
  class docstring for why its orphan repair was inherently racy.)
* :class:`ConditionalPutCommitBackend` — the object-store shape: the
  conditional put of ``v{N}.json`` IS the commit (single atomic operation).
  The backend takes any key-value store implementing the four-method
  contract of :class:`KVStore`; :class:`InMemoryKVStore` is the in-process
  reference implementation used by the fault-injection tests.
"""

from __future__ import annotations

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
    """Single-step hard-link commit for POSIX filesystems (the local
    default) — the filesystem rendition of the conditional put.

    Commit = write the full payload to a hidden temp file, fsync, then
    ``os.link(tmp, v{N}.json)``: link(2) is atomic and fails with
    ``EEXIST`` when the target exists, so exactly one writer per version
    ever succeeds, and the published name only ever appears with its
    COMPLETE payload (readers can never observe a partial manifest).
    There is no CURRENT pointer (current = max listed version, exactly
    like the object-store backend) and therefore no multi-step crash
    window: a writer that dies before the link has published nothing (its
    temp file is litter, age-swept by :meth:`repair`); a writer that dies
    just after the link HAS committed even if it never learns so — on
    restart the ledger inside the published manifest marks its epoch
    applied, so the replay is skipped.

    Design note: an earlier revision used O_EXCL create + an atomic
    ``CURRENT`` rename. That two-step shape needed orphan repair
    (manifests ahead of CURRENT), and repair itself carried an unfixable
    race — a writer stalled longer than the age guard between its two
    steps could have its manifest repaired away and replaced, after which
    BOTH writers' try_commit returned True for the same version (or
    CURRENT was left pointing at a deleted manifest). The single-step
    link has no such window by construction; the only stall casualty is a
    writer whose unpublished temp file aged out, and it loses SAFELY
    (returns False).
    """

    def __init__(self, meta_dir: str, orphan_age_s: float = 60.0):
        self.meta_dir = meta_dir
        #: temp files older than this are swept by repair(); a writer
        #: stalled past it between payload write and link loses its commit
        #: safely rather than double-committing
        self.orphan_age_s = orphan_age_s

    # -- protocol ----------------------------------------------------------

    def initialize(self) -> None:
        try:
            os.makedirs(self.meta_dir, exist_ok=False)
        except FileExistsError:
            if any(_MANIFEST_RE.match(fn) for fn in os.listdir(self.meta_dir)):
                raise  # a committed table lives here
            # only temp litter from dead/live creators remains — harmless:
            # if a live creator is still racing us, its v0 link and ours
            # serialize through EEXIST like any other commit race

    def try_commit(self, version: int, payload: bytes) -> bool:
        target = os.path.join(self.meta_dir, f"v{version}.json")
        tmp = os.path.join(
            self.meta_dir, f".v{version}.{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)  # atomic; EEXIST = another writer won
            # the payload bytes are durable (fsync above) but the NEW
            # DIRECTORY ENTRY is not until the directory itself is synced —
            # without this, a power loss after returning True can revert
            # the listing to N-1, breaking the contract that an
            # acknowledged commit stays visible (the stream would then die
            # on a FileNotFoundError for an offset it already checkpointed)
            self._fsync_dir()
            return True
        except FileExistsError:
            return False
        except FileNotFoundError:
            # our temp file was age-swept by a concurrent repair (this
            # writer stalled longer than orphan_age_s) — lose safely
            return False
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def _fsync_dir(self) -> None:
        """Make directory-entry mutations (link/replace) power-loss
        durable. Best-effort on filesystems that reject directory fsync."""
        try:
            fd = os.open(self.meta_dir, os.O_RDONLY)
        except OSError:
            return
        try:
            os.fsync(fd)
        except OSError:
            pass
        finally:
            os.close(fd)

    def current_version(self) -> int:
        try:
            versions = [
                int(m.group(1))
                for fn in os.listdir(self.meta_dir)
                for m in [_MANIFEST_RE.match(fn)]
                if m
            ]
        except FileNotFoundError as e:
            raise TableNotFoundError(str(e)) from e
        if not versions:
            raise TableNotFoundError(
                f"no committed version in {self.meta_dir}"
            )
        return max(versions)

    def load_manifest(self, version: int) -> bytes:
        with open(os.path.join(self.meta_dir, f"v{version}.json"), "rb") as f:
            return f.read()

    def repair(self) -> int:
        """Sweep aged temp files (dead writers' litter). Committed
        manifests are NEVER touched — under the single-step protocol every
        published ``v{N}.json`` is a complete commit, so there is nothing
        else to repair."""
        removed = 0
        now = time.time()
        try:
            names = os.listdir(self.meta_dir)
        except FileNotFoundError:
            return 0
        for fn in names:
            # commit temps are ".v{N}.{hex}.tmp", blob temps
            # ".{name}.{hex}.tmp" — both hidden dotfiles with the .tmp
            # suffix; committed manifests and blobs never match
            if not (fn.startswith(".") and fn.endswith(".tmp")):
                continue
            p = os.path.join(self.meta_dir, fn)
            try:
                if now - os.path.getmtime(p) >= self.orphan_age_s:
                    os.unlink(p)
                    removed += 1
            except FileNotFoundError:
                pass
        return removed

    # -- blobs -------------------------------------------------------------

    def put_blob(self, name: str, payload: bytes) -> None:
        # .tmp suffix so a crash between write and replace leaves litter
        # repair() sweeps (it matches hidden *.tmp files), not an immortal
        # hidden file
        tmp = os.path.join(self.meta_dir, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.meta_dir, name))
        self._fsync_dir()

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
        # a table exists iff a MANIFEST exists — blobs or (under a shared
        # prefix) unrelated keys are not a table, and current_version()
        # would agree by raising TableNotFoundError for them
        has_manifest = any(
            _MANIFEST_RE.match(k[len(self.prefix):])
            for k in self.kv.list_keys(self.prefix)
        )
        if has_manifest:
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


