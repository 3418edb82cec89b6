"""Custom Python DataSource WRITER: a transactional JSONL corpus sink
(Spark 4 Python DataSource API, writer half — the companion to
``meter_sim_source``'s reader half).

``df.write.format("jsonl_corpus").option("path", ...).save()`` gives
the JSONL export the two-phase commit shape a real sink needs at
cluster scale, which the plain ``.write.json`` path cannot offer
per-file:

- each task writes its rows to a UNIQUELY-NAMED temp file and returns
  the name in its commit message (task side-effects stay invisible);
- the driver's ``commit()`` publishes the batch by renaming every temp
  file to its final name AND writing a ``_SUCCESS.manifest`` JSON
  listing the published files + row counts — readers that honor the
  manifest never observe a torn batch (the same manifest-gated
  visibility contract as ``sources/manifest.py``);
- ``abort()`` deletes the temp files, so a failed/speculated/retried
  task or a cancelled job leaves NOTHING visible.

Pickling: writer classes ship to Python workers by cloudpickle — the
classes live inside :func:`make_jsonl_corpus_sink` so they serialize
by value and workers never need this repo importable (same rule as
the meter_sim reader and the stateful closures).
"""

from __future__ import annotations


def make_jsonl_corpus_sink():
    """Return the DataSource class. Register with
    ``spark.dataSource.register(make_jsonl_corpus_sink())``."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Committed(WriterCommitMessage):
        def __init__(self, temp_name: str, final_name: str, n_rows: int):
            self.temp_name = temp_name
            self.final_name = final_name
            self.n_rows = n_rows

    class _Writer(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_corpus sink requires option 'path'")
            self.overwrite = overwrite

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            stem = uuid.uuid4().hex
            temp_name = f"_tmp.{stem}.jsonl"
            final_name = f"part-{stem}.jsonl"
            n = 0
            with open(os.path.join(self.path, temp_name), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), default=str))
                    fh.write("\n")
                    n += 1
            return _Committed(temp_name, final_name, n)

        def commit(self, messages):
            import json
            import os

            published = []
            for m in messages:
                os.rename(
                    os.path.join(self.path, m.temp_name),
                    os.path.join(self.path, m.final_name),
                )
                published.append(
                    {"file": m.final_name, "n_rows": m.n_rows}
                )
            with open(
                os.path.join(self.path, "_SUCCESS.manifest"), "w"
            ) as fh:
                json.dump(
                    {
                        "files": sorted(published, key=lambda p: p["file"]),
                        "n_rows": sum(p["n_rows"] for p in published),
                    },
                    fh,
                )

        def abort(self, messages):
            import contextlib
            import os

            for m in messages:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(self.path, m.temp_name))

    from pyspark.sql.datasource import DataSourceStreamWriter

    class _StreamWriter(DataSourceStreamWriter):
        """Streaming half (Spark 4 ``DataSourceStreamWriter``): the
        same temp-write / rename-publish two-phase protocol PER
        MICRO-BATCH, made exactly-once under batch REPLAY by the
        batch manifest: ``commit(messages, batchId)`` first deletes
        any files a previous attempt of the SAME batchId published
        (listed in its ``_batch-<id>.manifest``), then publishes the
        new files and atomically replaces the manifest — a crash
        between epochs replays the batch without duplicating rows,
        which is the contract a foreachBatch sink has to hand-roll."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError(
                    "jsonl_corpus stream sink requires option 'path'"
                )

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            stem = uuid.uuid4().hex
            temp_name = f"_tmp.{stem}.jsonl"
            n = 0
            with open(os.path.join(self.path, temp_name), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), default=str))
                    fh.write("\n")
                    n += 1
            return _Committed(temp_name, f"part-{stem}.jsonl", n)

        def commit(self, messages, batchId):
            import contextlib
            import json
            import os
            import uuid

            manifest = os.path.join(
                self.path, f"_batch-{batchId}.manifest"
            )
            # Replay-idempotence ORDER (round-9 advisory): publish the
            # replacement files + manifest FIRST, unpublish the
            # previous attempt's files LAST. Deleting before the
            # atomic manifest swap opens a crash window where the
            # still-live old manifest lists already-deleted files and
            # manifested_stream_files hands readers nonexistent paths;
            # with this order the live manifest only ever lists files
            # that exist (a crash after the swap at worst leaks
            # unlisted orphans, which readers never see).
            stale = []
            if os.path.exists(manifest):
                with open(manifest) as fh:
                    stale = json.load(fh)["files"]
            published = []
            for m in messages:
                final = f"batch{batchId}-{m.final_name}"
                os.rename(
                    os.path.join(self.path, m.temp_name),
                    os.path.join(self.path, final),
                )
                published.append({"file": final, "n_rows": m.n_rows})
            tmp = manifest + f".tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                json.dump(
                    {
                        "batch_id": batchId,
                        "files": sorted(
                            published, key=lambda p: p["file"]
                        ),
                        "n_rows": sum(p["n_rows"] for p in published),
                    },
                    fh,
                )
            os.rename(tmp, manifest)
            relisted = {e["file"] for e in published}
            for e in stale:
                if e["file"] in relisted:
                    continue
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(self.path, e["file"]))

        def abort(self, messages, batchId):
            import contextlib
            import os

            for m in messages:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(self.path, m.temp_name))

    class JsonlCorpusSink(DataSource):
        @classmethod
        def name(cls):
            return "jsonl_corpus"

        def writer(self, schema, overwrite):
            return _Writer(self.options, overwrite)

        def streamWriter(self, schema, overwrite):
            return _StreamWriter(self.options)

    return JsonlCorpusSink


def manifested_stream_files(path: str) -> list[str]:
    """The files the streaming sink's batch manifests declare visible —
    the reader half of the manifest-gated visibility contract (a torn
    or aborted batch's temp files are never listed)."""
    import json
    import os

    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith("_batch-") and name.endswith(".manifest"):
            with open(os.path.join(path, name)) as fh:
                out += [
                    os.path.join(path, e["file"])
                    for e in json.load(fh)["files"]
                ]
    return out
