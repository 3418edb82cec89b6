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

Scale notes:

- Lock hold time is one pruned key-scan + one partitioned append —
  seconds per micro-batch, and there is exactly one logical writer per
  table in the streaming design (checkpointed foreachBatch); the lock
  only matters for out-of-band writers (backfills, replays), which is
  precisely the reference's concurrent-consumer case.
- Stale locks (a writer that died mid-commit) are broken after
  ``stale_after_s`` based on the lock directory's mtime, which the
  holder refreshes by touching a heartbeat file.
- On object stores without atomic mkdir (S3) this protocol does not
  hold; there the sink's documented production shape is a Delta/Iceberg
  ``MERGE WHEN NOT MATCHED`` whose log provides the atomicity. This
  module is the self-contained equivalent for filesystems that DO have
  atomic namespace operations.
"""

from __future__ import annotations

import contextlib
import os
import time
import uuid
from collections.abc import Iterator

LOCK_DIRNAME = "_lock"


class LockTimeout(RuntimeError):
    """Raised when the table lock cannot be acquired in time."""


@contextlib.contextmanager
def table_lock(
    table_dir: str,
    timeout_s: float = 60.0,
    stale_after_s: float = 300.0,
    poll_s: float = 0.05,
) -> Iterator[str]:
    """Exclusive advisory lock on a table directory.

    Yields the lock path. Raises :class:`LockTimeout` if another writer
    holds the lock past ``timeout_s``. A lock whose mtime is older than
    ``stale_after_s`` is presumed abandoned and broken (one winner:
    breaking re-acquires through the same atomic mkdir).
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
            try:
                age = time.time() - os.stat(lock_dir).st_mtime
            except FileNotFoundError:
                continue  # holder released between mkdir and stat — retry
            if age > stale_after_s:
                # Presumed-dead holder: remove and let the next mkdir
                # race decide the single new owner.
                _force_remove(lock_dir)
                continue
            if time.monotonic() > deadline:
                raise LockTimeout(
                    f"could not acquire {lock_dir} within {timeout_s}s"
                ) from None
            time.sleep(poll_s)
    try:
        with open(os.path.join(lock_dir, "owner"), "w") as fh:
            fh.write(owner_token)
        yield lock_dir
    finally:
        _force_remove(lock_dir)


def _force_remove(lock_dir: str) -> None:
    with contextlib.suppress(FileNotFoundError, OSError):
        for name in os.listdir(lock_dir):
            with contextlib.suppress(FileNotFoundError):
                os.unlink(os.path.join(lock_dir, name))
        os.rmdir(lock_dir)
