"""Catalog-level MULTI-TABLE transactions — the Nessie/"git-for-data"
model layered on the manifest commit machinery.

A single manifest table's put-if-absent log makes one table's commits
atomic; nothing in that protocol can make a fact-and-dimension pair
land together (the reference's Postgres sink gets this for free from
DB transactions — consumer/meter_consumer.py writes fact rows inside
one txn; an object-store deployment does not). The catalog closes the
gap by making the CATALOG the log: a numbered chain of catalog
commits, each embedding the full per-table commit payloads (added
files / counts / dates / schema / per-file stats — the same shape as
manifest commits), decided by the same single put-if-absent
primitive. Readers resolve every table's state through the catalog
chain ONLY, so:

- One catalog commit touching N tables is atomic across all N —
  there is no intermediate state where the fact shows and the dim
  doesn't (``consistent_snapshot`` gives the TIME-based version of
  this guarantee for independent tables; the catalog gives the
  TRANSACTIONAL version for coupled writes).
- A crashed transaction (files staged, catalog commit never
  published) is invisible to every table at once; its stage is swept
  by :meth:`Catalog.vacuum`.
- Concurrent transactions serialize through the catalog fence:
  losing the put-if-absent race re-validates the staged batches'
  key sets against the commits that won (the manifest append's
  conflict rule, applied per touched table) and either recommits the
  same staged files at the next number or aborts with a conflict.

Scope: transactional APPENDs (the multi-table ingest case). Row-level
mutations stay single-table operations on :class:`ManifestTable` —
the same split Nessie itself had for years (multi-table commits,
single-table merges).

At 100 TB the catalog chain stays metadata-bounded the same way the
manifest log does: payloads are O(files touched), the chain is
compactable by the same merged-base move, and data files never move —
staging is already distributed, the commit is one conditional PUT.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.sources.manifest import (
    PK,
    CommitConflictError,
    ManifestTable,
    _put_if_absent,
)

CATALOG_DIRNAME = "_catalog"


class Catalog:
    """A directory of tables whose states are decided by one shared
    commit chain (see module docstring)."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.commits_dir = os.path.join(root, CATALOG_DIRNAME)
        os.makedirs(self.commits_dir, exist_ok=True)

    # -- chain -------------------------------------------------------------

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.commits_dir, f"{version:010d}.json")

    def numbered_snapshot(self) -> list[tuple[int, dict]]:
        return ManifestTable._read_log(self.commits_dir)

    def table_handle(self, name: str) -> ManifestTable:
        """The staging/IO handle for ``name`` — its own commit log is
        deliberately unused (the catalog holds the log); it supplies
        the data dir, the staging machinery, and the per-file stats
        reader."""
        return ManifestTable(os.path.join(self.root, "tables", name))

    def tables(self) -> list[str]:
        names: set[str] = set()
        for _, c in self.numbered_snapshot():
            names |= set(c.get("tables", {}))
        return sorted(names)

    def _table_commits(
        self, name: str, version: int | None = None
    ) -> list[dict]:
        """``name``'s embedded commit payloads in chain order, up to
        catalog version ``version`` (positional, like table time
        travel)."""
        out = []
        for i, (_, c) in enumerate(self.numbered_snapshot()):
            if version is not None and i > version:
                break
            p = c.get("tables", {}).get(name)
            if p is not None:
                out.append(p)
        return out

    def read(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame | None:
        """``name``'s catalog-visible contents (None before its first
        committed transaction). ``version`` time-travels the WHOLE
        CATALOG, not one table — version k shows every table as of
        catalog commit k, which is what makes cross-table reads at a
        pinned version mutually consistent by construction."""
        t = self.table_handle(name)
        commits = self._table_commits(name, version)
        if not commits:
            return None
        files = t._files(commits)
        if not files:
            return None
        schema = ManifestTable._evolved_schema(commits)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*files)

    def txn(self) -> "CatalogTxn":
        return CatalogTxn(self)

    # -- maintenance -------------------------------------------------------

    def vacuum(self, ttl_s: float = 3600.0) -> int:
        """Sweep data files no catalog commit references — crashed/
        aborted transactions' stages. TTL-guarded like the manifest
        vacuum so an in-flight transaction's fresh stage survives.
        (Do NOT run ``vacuum_unreferenced`` on a catalog table
        handle: its own log is empty by design and the sweep would
        read everything as unreferenced — this method is the catalog
        half of that lifecycle.)"""
        removed = 0
        now = time.time()
        for name in os.listdir(os.path.join(self.root, "tables")) if (
            os.path.isdir(os.path.join(self.root, "tables"))
        ) else []:
            t = self.table_handle(name)
            referenced = {
                f
                for c in self._table_commits(name)
                for f in c.get("added", [])
            }
            for d in os.listdir(t.data_dir):
                p = os.path.join(t.data_dir, d)
                if not os.path.isdir(p):
                    continue
                for fname in os.listdir(p):
                    rel = os.path.join(d, fname)
                    fp = os.path.join(p, fname)
                    if rel in referenced:
                        continue
                    if now - os.path.getmtime(fp) < ttl_s:
                        continue
                    try:
                        os.unlink(fp)
                        removed += 1
                    except FileNotFoundError:
                        pass
                if not os.listdir(p):
                    try:
                        os.rmdir(p)
                    except OSError:
                        pass
        return removed


class CatalogTxn:
    """Collects staged appends across tables, then publishes ONE
    catalog commit. Usage::

        txn = catalog.txn()
        txn.append(spark, "fact", fact_batch)
        txn.append(spark, "dim_meters", dim_batch, pk=["meter_id"])
        txn.commit()   # both visible, atomically — or neither
    """

    def __init__(self, cat: Catalog) -> None:
        self.cat = cat
        self._payloads: dict[str, dict] = {}
        self._pks: dict[str, list[str]] = {}
        self._committed = False
        # test seam, same contract as ManifestTable._pre_publish_hook
        self._pre_publish_hook = None

    def append(
        self,
        spark: SparkSession,
        name: str,
        batch: DataFrame,
        pk: list[str] = PK,
    ) -> int:
        """Stage a PK-idempotent append to ``name`` inside this
        transaction: dedupe within the batch, anti-join against the
        CATALOG-visible state and against rows already staged for
        ``name`` by this txn, stage the survivors. Nothing is visible
        until :meth:`commit`."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        t = self.cat.table_handle(name)
        clean = batch.dropDuplicates(pk)
        visible = self.cat.read(spark, name)
        if visible is not None:
            clean = clean.join(visible.select(*pk), pk, "left_anti")
        prior = self._payloads.get(name)
        if prior is not None and prior["added"]:
            staged_prior = spark.read.parquet(
                *(os.path.join(t.data_dir, f) for f in prior["added"])
            )
            clean = clean.join(staged_prior.select(*pk), pk, "left_anti")
        clean = clean.persist()
        try:
            n = clean.count()
            if n == 0:
                return 0
            if "reading_timestamp" in clean.columns:
                dates = sorted(
                    str(r["d"])
                    for r in clean.select(
                        F.to_date("reading_timestamp").alias("d")
                    )
                    .distinct()
                    .collect()
                )
            else:
                dates = []
            staged = t._stage(clean)
            payload = {
                "added": staged,
                "count": n,
                "dates": dates,
                "schema": clean.schema.json(),
                "stats": t._file_stats(staged),
            }
            if prior is not None:
                payload = {
                    "added": prior["added"] + staged,
                    "count": prior["count"] + n,
                    "dates": sorted(set(prior["dates"]) | set(dates)),
                    "schema": clean.schema.json(),
                    "stats": {**prior["stats"], **payload["stats"]},
                }
            self._payloads[name] = payload
            self._pks[name] = list(pk)
            return n
        finally:
            clean.unpersist()

    def abort(self) -> None:
        """Discard every staged file; the transaction never happened."""
        for name, p in self._payloads.items():
            t = self.cat.table_handle(name)
            t._discard_stage_all(p["added"])
        self._payloads.clear()

    def commit(self, max_retries: int = 20) -> int:
        """Publish every staged table in ONE put-if-absent catalog
        commit. Fence invariant as in the manifest append: the fence
        and the validation state come from the same chain listing; a
        lost race re-validates each staged table's keys against the
        commits that won (re-reading our own staged files — bounded
        by the txn's size) and recommits the same files at the next
        number when disjoint, or discards and raises on a genuine
        key conflict. Returns the number of tables committed."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        if not self._payloads:
            return 0
        numbered = self.cat.numbered_snapshot()
        fence = ManifestTable._fence(numbered)
        validated_len = len(numbered)
        for _ in range(max_retries):
            payload = json.dumps(
                {
                    "version": fence,
                    "tables": self._payloads,
                    "committed_at": time.time(),
                }
            ).encode()
            if self._pre_publish_hook is not None:
                self._pre_publish_hook()
            if _put_if_absent(self.cat._commit_path(fence), payload):
                self._committed = True
                return len(self._payloads)
            # lost the race — validate only against the commits we
            # lost to, per staged table
            numbered = self.cat.numbered_snapshot()
            new_chain = numbered[validated_len:]
            spark = SparkSession.getActiveSession()
            for name, p in self._payloads.items():
                t = self.cat.table_handle(name)
                new_commits = [
                    c.get("tables", {}).get(name)
                    for _, c in new_chain
                ]
                new_commits = [c for c in new_commits if c is not None]
                if not new_commits:
                    continue
                new_files = t._files(new_commits)
                if not new_files:
                    continue
                pk = self._pks[name]
                ours = spark.read.parquet(
                    *(os.path.join(t.data_dir, f) for f in p["added"])
                ).select(*pk)
                clash = (
                    ours.join(
                        spark.read.parquet(*new_files).select(*pk),
                        pk,
                        "left_semi",
                    )
                    .limit(1)
                    .count()
                )
                if clash:
                    self.abort()
                    raise CommitConflictError(
                        f"catalog txn lost a key-overlapping race on "
                        f"table {name!r}; staged files discarded — "
                        "re-run the transaction against the new state"
                    )
            fence = ManifestTable._fence(numbered)
            validated_len = len(numbered)
        self.abort()
        raise CommitConflictError(
            f"gave up after {max_retries} catalog commit attempts on "
            f"{self.cat.root}"
        )
