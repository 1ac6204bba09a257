"""Conditional-PUT store adapters for the manifest commit protocol.

``txn``'s whole atomicity budget is one primitive: *put-if-absent of a
single small object* (the version manifest). This module makes that
primitive pluggable per URI scheme, so the protocol runs unchanged on
any store that can express it:

- ``LocalLinkStore`` — POSIX paths: write a temp file, ``os.link`` to
  the final name (link creation is atomic and fails with ``EEXIST``;
  content exists in full before the name appears).
- ``HadoopRenameStore`` — HDFS-class filesystems whose rename is
  atomic and refuses an existing destination: create temp + rename.
- object stores (S3 / GCS / ABFS …) — register an adapter wrapping the
  store's native conditional write: S3 ``If-None-Match: *`` (HTTP 412
  on conflict), GCS ``x-goog-if-generation-match: 0``, Azure
  ``If-None-Match: *``. ``InMemoryConditionalStore`` implements those
  exact semantics in memory so the optimistic-concurrency conflict
  path is testable without a bucket; a production S3 adapter is the
  same ~10 lines over boto3's ``put_object(IfNoneMatch="*")``, which
  this container deliberately doesn't ship (no cloud SDKs baked in).

``txn._put_if_absent`` routes: an explicitly registered scheme wins;
local paths use ``LocalLinkStore``; schemes whose Hadoop rename is
copy+delete (``_NON_ATOMIC_RENAME_SCHEMES``) refuse loudly unless an
adapter is registered — degrading to exists-check + rename there would
reintroduce the lost-update window the protocol exists to close.

Object-store contract — EVERY local-FS atomicity primitive in this
repo, and the conditional-write it maps to (round-12 verdict item #6;
``tests/test_stores_contract.py`` enumerates these mechanically, so a
new primitive cannot land without extending this contract):

1. **Manifest put-if-absent** (``txn._put_if_absent`` via this
   module): the commit protocol's only required primitive. S3
   ``If-None-Match: *``, GCS ``x-goog-if-generation-match: 0``,
   Azure ``If-None-Match: *``.
2. **Compaction lease** (``operators/retrieval.py::
   acquire_compaction_lease`` — ``os.mkdir`` + per-holder nonce file
   + ``os.utime`` heartbeat via ``_start_lease_heartbeat``;
   ``release_compaction_lease`` —
   nonce-verified unlink + ``os.rmdir``): maps to a conditional-PUT
   lease OBJECT whose body carries the holder nonce. Acquire =
   put-if-absent; heartbeat = conditional overwrite if-generation-
   matches (refreshing a TTL the store or the reader enforces);
   steal = conditional DELETE if-generation-matches on a stale
   lease, then put-if-absent; release = conditional DELETE
   if-generation-matches (the nonce/generation check is exactly what
   keeps an evicted holder's release from freeing the stealer's
   lease — the local nonce file replays it).
3. **Pending-late marker** (``operators/retrieval.py::
   _write_pending_late`` — temp write + atomic ``os.replace``;
   ``_clear_pending_late`` — unlink). Written and cleared ONLY under
   the compaction lease (single writer), read by recovery and by the
   bloom sidecar's heal-on-read, so a plain last-writer-wins PUT +
   DELETE of a small object suffices on any strongly-consistent
   store (S3/GCS/ABFS all are, for single keys); the atomic replace
   only guarantees readers never see a torn body, which object-store
   PUTs give for free (objects appear whole or not at all).
"""

from __future__ import annotations

import os
import threading
import uuid


class ConditionalPutStore:
    """One method: atomically create ``path`` iff absent.

    Returns True if this call created the object, False if it already
    existed (the optimistic-concurrency "lost the race" signal —
    S3's HTTP 412, GCS's generation-match failure). Implementations
    MUST be all-or-nothing: a reader may never observe partial
    content under the final name.
    """

    def put_if_absent(self, spark, path: str, data: bytes) -> bool:
        raise NotImplementedError


class LocalLinkStore(ConditionalPutStore):
    """POSIX: temp write + hard link (atomic, EEXIST on conflict)."""

    def put_if_absent(self, spark, path: str, data: bytes) -> bool:
        final = path[5:] if path.startswith("file:") else path
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class HadoopRenameStore(ConditionalPutStore):
    """HDFS-class FS: create temp + rename. Valid ONLY where rename is
    atomic and returns false onto an existing destination (HDFS
    contract); never route object-store schemes here."""

    def put_if_absent(self, spark, path: str, data: bytes) -> bool:
        jvm = spark._jvm
        hfinal = jvm.org.apache.hadoop.fs.Path(path)
        fs = hfinal.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hfinal):
            return False
        htmp = jvm.org.apache.hadoop.fs.Path(
            f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        )
        out = fs.create(htmp, False)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        if not fs.rename(htmp, hfinal):
            fs.delete(htmp, False)
            return False
        return True


class InMemoryConditionalStore(ConditionalPutStore):
    """S3 ``If-None-Match: *`` semantics in memory: the first writer
    of a key wins, every later conditional PUT of the same key fails
    (S3 returns HTTP 412 Precondition Failed; here, False). Thread-
    safe so tests can race real threads through the commit protocol's
    conflict path. ``objects`` is inspectable for assertions."""

    def __init__(self) -> None:
        self.objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, spark, path: str, data: bytes) -> bool:
        with self._lock:
            if path in self.objects:
                return False
            self.objects[path] = bytes(data)
            return True

    def get(self, path: str) -> bytes | None:
        with self._lock:
            return self.objects.get(path)


_REGISTRY: dict[str, ConditionalPutStore] = {}


def register_store_adapter(scheme: str, store: ConditionalPutStore) -> None:
    """Route ``scheme://`` put-if-absent through ``store``. Lifts the
    loud refusal for object-store schemes — register the store's
    native conditional-PUT adapter, not a rename shim."""
    _REGISTRY[scheme.lower()] = store


def unregister_store_adapter(scheme: str) -> None:
    _REGISTRY.pop(scheme.lower(), None)


def adapter_for(scheme: str) -> ConditionalPutStore | None:
    return _REGISTRY.get(scheme.lower())
