"""Writer serialization for the plain-parquet idempotent sink.

The reference gets multi-writer duplicate safety for free from the
PRIMARY KEY in ``INSERT ... ON CONFLICT DO NOTHING``
(consumer/meter_consumer.py:104-114): two concurrent consumers can both
attempt the same rows and the database serializes them. A plain-parquet
anti-join append has a read-modify-write race instead — two writers can
both pass the anti-join before either's files land, and both insert.

``table_lock`` closes that race with a filesystem mutex: an atomic
``mkdir`` of ``<table>/_lock`` (atomic on POSIX and HDFS; underscore
prefix keeps it invisible to Spark's partition discovery). The critical
section spans the existing-keys scan *and* the append, so writer B's
anti-join always sees writer A's committed rows — the same end state the
reference's PK guarantees.

Liveness vs safety:

- A **live** holder refreshes the lock directory's mtime from a
  daemon heartbeat thread every ``stale_after_s / 3`` seconds, so a
  long critical section (a full-partition compaction rewrite,
  sources/maintenance.py) never *looks* abandoned no matter how long
  it runs. Only a holder whose process actually died (heartbeat
  stopped) ages past ``stale_after_s``.
- Breaking a presumed-dead lock is **one-winner**: the breaker
  atomically ``rename``s the whole lock directory to a unique
  tombstone name before deleting anything. Concurrent breakers race on
  the rename; exactly one succeeds, the rest see ``FileNotFoundError``
  and re-enter the acquire loop. Because the rename moves the
  directory wholesale, a competitor's *freshly acquired* lock can
  never be half-deleted file-by-file. After the rename the breaker
  re-verifies the tombstone's owner token against the token it
  observed when it judged the lock stale; on a mismatch (the
  microsecond stat→rename window raced with a full
  break+release+reacquire cycle) it restores the directory intact.

On object stores without atomic namespace operations (S3) neither
mkdir nor rename is a mutex; there the sink's production shape is the
manifest commit log in :mod:`~.manifest` (conditional-put semantics)
or a Delta/Iceberg ``MERGE WHEN NOT MATCHED``. This module is the
self-contained equivalent for filesystems that DO have atomic
namespace operations (POSIX, HDFS).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
import uuid
from collections.abc import Iterator

LOCK_DIRNAME = "_lock"
OWNER_FILENAME = "owner"


class LockTimeout(RuntimeError):
    """Raised when the table lock cannot be acquired in time."""


def _read_owner(lock_dir: str) -> str | None:
    try:
        with open(os.path.join(lock_dir, OWNER_FILENAME)) as fh:
            return fh.read()
    except OSError:
        return None


def _remove_dir(lock_dir: str) -> None:
    with contextlib.suppress(FileNotFoundError, OSError):
        for name in os.listdir(lock_dir):
            with contextlib.suppress(FileNotFoundError, OSError):
                os.unlink(os.path.join(lock_dir, name))
        os.rmdir(lock_dir)


def _try_break_stale(lock_dir: str, my_token: str, stale_after_s: float) -> None:
    """Break ``lock_dir`` iff it is stale, atomically and one-winner.

    Rename-before-remove: the rename either moves the *entire* current
    lock directory or fails — no competitor's lock is ever partially
    unlinked. The owner token observed at staleness-judgement time is
    re-checked after the rename; a mismatch means the window between
    stat and rename overlapped a complete break/release + re-acquire by
    someone else, and the stolen fresh lock is restored.
    """
    try:
        age = time.time() - os.stat(lock_dir).st_mtime
    except (FileNotFoundError, OSError):
        return  # released (or already broken) — caller retries mkdir
    if age <= stale_after_s:
        return
    stale_token = _read_owner(lock_dir)
    tombstone = f"{lock_dir}.breaking.{my_token}"
    try:
        os.rename(lock_dir, tombstone)  # atomic: one breaker wins
    except (FileNotFoundError, OSError):
        return
    if _read_owner(tombstone) != stale_token:
        # We grabbed a lock that was re-acquired after our staleness
        # check. Put it back untouched; mkdir by a third party in this
        # sub-microsecond window would make restore impossible, which
        # we surface rather than silently dropping a live lock.
        try:
            os.rename(tombstone, lock_dir)
        except OSError as exc:  # pragma: no cover - double-fault window
            _remove_dir(tombstone)
            raise RuntimeError(
                f"lock break race on {lock_dir}: could not restore a "
                "freshly re-acquired lock"
            ) from exc
        return
    _remove_dir(tombstone)


class _Heartbeat:
    """Daemon thread refreshing the lock dir's mtime so a live holder
    never looks abandoned regardless of critical-section length."""

    def __init__(self, lock_dir: str, interval_s: float) -> None:
        self._lock_dir = lock_dir
        self._interval_s = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.wait(self._interval_s):
            with contextlib.suppress(OSError):
                os.utime(self._lock_dir)

    def __enter__(self) -> "_Heartbeat":
        self._thread.start()
        return self

    def __exit__(self, *exc: object) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)


@contextlib.contextmanager
def table_lock(
    table_dir: str,
    timeout_s: float = 60.0,
    stale_after_s: float = 300.0,
    poll_s: float = 0.05,
    heartbeat: bool = True,
) -> Iterator[str]:
    """Exclusive advisory lock on a table directory.

    Yields the lock path. Raises :class:`LockTimeout` if another writer
    holds the lock past ``timeout_s``. A lock whose mtime is older than
    ``stale_after_s`` is presumed abandoned and broken one-winner (see
    :func:`_try_break_stale`); a live holder's heartbeat keeps its
    mtime fresh, so arbitrarily long critical sections are safe.

    ``heartbeat=False`` exists only for tests that need to simulate a
    dead holder.
    """
    os.makedirs(table_dir, exist_ok=True)
    lock_dir = os.path.join(table_dir, LOCK_DIRNAME)
    owner_token = uuid.uuid4().hex
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            os.mkdir(lock_dir)  # atomic claim
            break
        except FileExistsError:
            _try_break_stale(lock_dir, owner_token, stale_after_s)
            if time.monotonic() > deadline:
                raise LockTimeout(
                    f"could not acquire {lock_dir} within {timeout_s}s"
                ) from None
            time.sleep(poll_s)
    try:
        with open(os.path.join(lock_dir, OWNER_FILENAME), "w") as fh:
            fh.write(owner_token)
        if heartbeat:
            with _Heartbeat(lock_dir, max(stale_after_s / 3.0, 0.01)):
                yield lock_dir
        else:
            yield lock_dir
    finally:
        # Only release a lock we still own: if a (mis)configured waiter
        # broke us mid-section, the dir at lock_dir is theirs now.
        if _read_owner(lock_dir) == owner_token:
            _remove_dir(lock_dir)
