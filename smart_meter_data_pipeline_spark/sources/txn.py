"""Writer serialization for the plain-parquet idempotent sink.

The reference gets multi-writer duplicate safety for free from the
PRIMARY KEY in ``INSERT ... ON CONFLICT DO NOTHING``
(consumer/meter_consumer.py:104-114): two concurrent consumers can both
attempt the same rows and the database serializes them. A plain-parquet
anti-join append has a read-modify-write race instead — two writers can
both pass the anti-join before either's files land, and both insert.

``table_lock`` closes that race with a kernel-enforced file mutex:
``flock(LOCK_EX)`` on ``<table>/_lock.file`` (underscore prefix keeps
it invisible to Spark's partition discovery). The critical section
spans the existing-keys scan *and* the append, so writer B's anti-join
always sees writer A's committed rows — the same end state the
reference's PK guarantees.

Why ``flock`` and not an mkdir-mtime protocol
---------------------------------------------

An earlier revision used atomic ``mkdir`` with an mtime heartbeat and
a rename-based "break stale lock" path (the textbook HDFS-style
advisory lock). Stress-testing it surfaced the protocol's irreducible
flaw: a breaker's staleness judgement (``stat``) and its ``rename``
are two separate syscalls, so a breaker descheduled between them can
rename away a lock that was *released and freshly re-acquired* in the
window — and any restore step can itself collide with a third writer's
``mkdir``. No ordering of stat/read/rename closes the window; it can
only be shrunk. ``flock`` removes the problem by construction:

- **Liveness is kernel truth, not a heuristic.** A lock dies exactly
  when its holder's last open file description closes — including
  ``kill -9``, OOM, or a crashed JVM. There is no stale-after window
  to tune and no heartbeat thread to stall under load.
- **There is no break protocol to race.** Waiters block (or poll) on
  the same kernel object; nobody ever deletes or renames another
  writer's lock state.
- Within one process, each ``table_lock`` call opens its own file
  description, so concurrent threads contend correctly too.

Scope: ``flock`` serializes writers on ONE host (or across hosts on
NFSv4, where it maps to NLM byte-range locks). That matches this
engine's writer topology — concurrent driver processes on a shared
POSIX filesystem. For multi-node writers on HDFS or an object store
(no POSIX lock namespace), the production shape is the manifest commit
log in :mod:`~.manifest` (atomic-rename conditional-put semantics) or
a Delta/Iceberg ``MERGE WHEN NOT MATCHED``; this module is the
self-contained single-filesystem equivalent.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import time
import uuid
from collections.abc import Iterator

LOCK_FILENAME = "_lock.file"


class LockTimeout(RuntimeError):
    """Raised when the table lock cannot be acquired in time."""


@contextlib.contextmanager
def table_lock(
    table_dir: str,
    timeout_s: float = 60.0,
    poll_s: float = 0.05,
) -> Iterator[str]:
    """Exclusive advisory lock on a table directory.

    Yields the lock-file path. Raises :class:`LockTimeout` if another
    writer holds the lock past ``timeout_s``. A holder that dies —
    however abruptly — releases the lock automatically (kernel
    semantics), so there is no stale-lock heuristic and no break
    protocol.

    The holder's token and pid are written into the lock file purely
    as operator diagnostics (``cat <table>/_lock.file`` during an
    incident); correctness never reads them.
    """
    os.makedirs(table_dir, exist_ok=True)
    lock_path = os.path.join(table_dir, LOCK_FILENAME)
    owner_token = uuid.uuid4().hex
    deadline = time.monotonic() + timeout_s
    # Each call opens its own file description: flock contention is
    # per-description, so threads within one process exclude each
    # other exactly like separate processes do.
    fd = os.open(lock_path, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if time.monotonic() > deadline:
                    raise LockTimeout(
                        f"could not acquire {lock_path} within {timeout_s}s"
                    ) from None
                time.sleep(poll_s)
        with contextlib.suppress(OSError):
            os.ftruncate(fd, 0)
            os.write(fd, f"{owner_token} pid={os.getpid()}\n".encode())
        try:
            yield lock_path
        finally:
            with contextlib.suppress(OSError):
                fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)
