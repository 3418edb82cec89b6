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

Scope (round 13): transactional APPENDs (the multi-table ingest
case) AND copy-on-write MUTATIONS — :meth:`CatalogTxn.upsert` /
:meth:`CatalogTxn.delete_where` stage rewrites exactly like the
manifest CoW engine, the payload carries ``removed`` alongside
``added``, and one catalog commit lands a fact restatement and its
dimension update atomically (the reference's "every batch is a
Postgres txn" property — consumer/meter_consumer.py:132-135 — for
coupled multi-table changes). Conflict rule at the fence: a txn
that MUTATED a table aborts if any commit it lost to also removed
files from that table (its rewrite was derived from a state that no
longer exists); append-only interleavings revalidate by key overlap
like appends do.

At 100 TB the catalog chain stays metadata-bounded the same way the
manifest log does: payloads are O(files touched), the chain is
compactable by the same merged-base move, and data files never move —
staging is already distributed, the commit is one conditional PUT.
"""

from __future__ import annotations

import json
import os
import uuid
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
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        tag: str | None = None,
        where: dict | None = None,
        where_in: dict | None = None,
    ) -> DataFrame | None:
        """``name``'s catalog-visible contents (None before its first
        committed transaction). ``version`` time-travels the WHOLE
        CATALOG, not one table — version k shows every table as of
        catalog commit k, which is what makes cross-table reads at a
        pinned version mutually consistent by construction. ``tag``
        reads a named catalog release (:meth:`create_tag`) — the same
        whole-catalog pin by name.

        ``where={col: (lo, hi)}`` / ``where_in={col: [v, ...]}`` add
        zone-map FILE pruning (round 13) against the per-file stats
        every catalog payload records, exactly like
        ``ManifestTable.read``: at a 100 TB catalog a sliced read
        must skip files from metadata, not open everything and let
        the row filter discard it. The row predicate always applies
        on top, so the pruned read equals the plain filtered read
        (skipping is an optimization, never a correctness filter).
        Stats columns follow the table's persisted config (configure
        once via ``ManifestTable(path, stats_columns=[...])`` on the
        handle's directory)."""
        if version is not None and tag is not None:
            raise ValueError("pass at most one of version / tag")
        if tag is not None:
            version = self.version_of_tag(tag)
        t = self.table_handle(name)
        commits = self._table_commits(name, version)
        if not commits:
            return None
        files = t._files(commits)
        if not files:
            return None
        schema = ManifestTable._evolved_schema(commits)
        row_filters = []
        if where or where_in:
            key_ranges: dict[str, tuple] = {}
            for col, (lo, hi) in (where or {}).items():
                key_ranges[col] = (
                    lo if lo is not None else -(2**62),
                    hi if hi is not None else 2**62,
                )
                if lo is not None:
                    row_filters.append(F.col(col) >= F.lit(lo))
                if hi is not None:
                    row_filters.append(F.col(col) <= F.lit(hi))
            for col, vals in (where_in or {}).items():
                vals = [v for v in vals if v is not None]
                row_filters.append(F.col(col).isin(vals))
                if vals and col not in key_ranges:
                    key_ranges[col] = (min(vals), max(vals))
            files = t._prune_by_stats(files, commits, key_ranges)
            if not files:
                if schema is not None:
                    return spark.createDataFrame([], schema)
                files = t._files(commits)[:1]
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*files)
        for f in row_filters:
            df = df.filter(f)
        return df

    def skipping_report(
        self,
        name: str,
        where: dict | None = None,
        where_in: dict | None = None,
    ) -> dict:
        """Metadata-only dry run of :meth:`read`'s file skipping for
        one table — how many live files the payload zone maps keep vs
        skip. The observability half of catalog data skipping; no
        data is read."""
        t = self.table_handle(name)
        commits = self._table_commits(name)
        files = t._files(commits)
        key_ranges = {
            col: (
                lo if lo is not None else -(2**62),
                hi if hi is not None else 2**62,
            )
            for col, (lo, hi) in (where or {}).items()
        }
        for col, vals in (where_in or {}).items():
            vals = [v for v in vals if v is not None]
            if vals and col not in key_ranges:
                key_ranges[col] = (min(vals), max(vals))
        kept = t._prune_by_stats(files, commits, key_ranges)
        return {
            "files_live": len(files),
            "files_read": len(kept),
            "files_skipped": len(files) - len(kept),
        }

    def txn(self) -> "CatalogTxn":
        return CatalogTxn(self)

    # -- tags ----------------------------------------------------------------
    #
    # Catalog-level tags — cross-table RELEASES: one named ref pins
    # EVERY table to one chain position, so "serve release-1" is a
    # single name instead of N per-table version numbers that might
    # not even be mutually consistent. Tags store the chain commit
    # NUMBER (not the position): compaction may merge positions away,
    # and the clamp below guarantees the tagged number's prefix
    # content survives any merge, so a tag resolves forever.

    def _tags_dir(self) -> str:
        return os.path.join(self.root, "_tags")

    def create_tag(self, name: str, version: int | None = None) -> dict:
        """Tag the catalog at positional chain ``version`` (default:
        latest). Immutable — put-if-absent, so two writers cannot
        silently move a release."""
        if isinstance(self, CatalogBranch):
            raise ValueError(
                "tags are main-catalog refs; tag through the parent"
            )
        numbered = self.numbered_snapshot()
        if not numbered:
            raise ValueError("cannot tag an empty catalog")
        if version is None:
            version = len(numbered) - 1
        if version < 0 or version >= len(numbered):
            raise ValueError(
                f"version {version} out of range: catalog has "
                f"{len(numbered)} commits"
            )
        os.makedirs(self._tags_dir(), exist_ok=True)
        ref = {
            "name": name,
            "commit_number": numbered[version][0],
            "created_at": time.time(),
        }
        path = os.path.join(self._tags_dir(), f"{name}.json")
        if not _put_if_absent(path, json.dumps(ref).encode()):
            raise ValueError(f"catalog tag already exists: {name}")
        return ref

    def list_tags(self) -> list[dict]:
        d = self._tags_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as fh:
                    out.append(json.load(fh))
        return out

    def delete_tag(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self._tags_dir(), f"{name}.json"))
        except FileNotFoundError:
            raise ValueError(f"no such catalog tag: {name}") from None

    def version_of_tag(self, name: str) -> int:
        """The tag's POSITIONAL chain version, resolved at read time:
        compaction shifts positions, so the stored commit NUMBER maps
        to 'the last position whose number is <= the tagged number' —
        exactly the prefix the clamp preserves."""
        path = os.path.join(self._tags_dir(), f"{name}.json")
        try:
            with open(path) as fh:
                num = json.load(fh)["commit_number"]
        except FileNotFoundError:
            raise ValueError(f"no such catalog tag: {name}") from None
        numbered = self.numbered_snapshot()
        pos = None
        for i, (n, _) in enumerate(numbered):
            if n <= num:
                pos = i
        if pos is None:
            raise ValueError(
                f"catalog tag {name!r} points before the current chain"
            )
        return pos

    # -- branches ----------------------------------------------------------
    #
    # Whole-CATALOG branches — the full Nessie/"git for data" model:
    # a branch forks the entire catalog (every table at one chain
    # position), transactions run against the branch's own chain, and
    # fast_forward publishes the whole multi-table change-set as ONE
    # main catalog commit. This is WAP at the catalog level: an audit
    # campaign spanning fact AND dimensions serves from the branch,
    # main stays pinned, and the publish is atomic across all of it.

    def _branch_refs_dir(self) -> str:
        return os.path.join(self.root, "_branch_refs")

    def _branch_chain_dir(self, name: str) -> str:
        return os.path.join(self.root, "_catalog_branches", name)

    def create_branch(self, name: str, version: int | None = None) -> dict:
        numbered = self.numbered_snapshot()
        if not numbered:
            raise ValueError(f"cannot branch an empty catalog: {self.root}")
        if version is None:
            version = len(numbered) - 1
        if version < 0 or version >= len(numbered):
            raise ValueError(
                f"version {version} out of range: catalog has "
                f"{len(numbered)} commits"
            )
        payload = {
            "name": name,
            "base_commit_number": numbered[version][0],
            "created_at": time.time(),
        }
        os.makedirs(self._branch_refs_dir(), exist_ok=True)
        path = os.path.join(self._branch_refs_dir(), f"{name}.json")
        if not _put_if_absent(path, json.dumps(payload).encode()):
            raise ValueError(f"catalog branch {name!r} already exists")
        os.makedirs(self._branch_chain_dir(name), exist_ok=True)
        return payload

    def list_branches(self) -> list[dict]:
        refs = self._branch_refs_dir()
        if not os.path.isdir(refs):
            return []
        out = []
        for n in sorted(os.listdir(refs)):
            if n.endswith(".json"):
                with open(os.path.join(refs, n)) as fh:
                    out.append(json.load(fh))
        return out

    def branch(self, name: str) -> "CatalogBranch":
        path = os.path.join(self._branch_refs_dir(), f"{name}.json")
        try:
            with open(path) as fh:
                ref = json.load(fh)
        except FileNotFoundError:
            raise ValueError(f"no such catalog branch: {name!r}") from None
        return CatalogBranch(self, name, ref["base_commit_number"])

    def delete_branch(self, name: str) -> None:
        import shutil as _shutil

        path = os.path.join(self._branch_refs_dir(), f"{name}.json")
        try:
            os.unlink(path)
        except FileNotFoundError:
            raise ValueError(f"no such catalog branch: {name!r}") from None
        _shutil.rmtree(self._branch_chain_dir(name), ignore_errors=True)

    # -- maintenance -------------------------------------------------------

    def vacuum(self, ttl_s: float = 3600.0) -> int:
        """Sweep data files no catalog commit references — crashed/
        aborted transactions' stages. TTL-guarded like the manifest
        vacuum so an in-flight transaction's fresh stage survives.
        (Do NOT run ``vacuum_unreferenced`` on a catalog table
        handle: its own log is empty by design and the sweep would
        read everything as unreferenced — this method is the catalog
        half of that lifecycle.)"""
        if isinstance(self, CatalogBranch):
            raise ValueError(
                "vacuum is a main-catalog maintenance operation (it "
                "sweeps the shared data dirs); run it through the "
                "parent catalog handle"
            )
        removed = 0
        now = time.time()
        branches = [self.branch(b["name"]) for b in self.list_branches()]
        for name in os.listdir(os.path.join(self.root, "tables")) if (
            os.path.isdir(os.path.join(self.root, "tables"))
        ) else []:
            t = self.table_handle(name)
            referenced = {
                f
                for c in self._table_commits(name)
                for f in c.get("added", [])
            }
            # branch chains are GC roots: their txns reference files
            # no main catalog commit names
            for bc in branches:
                referenced |= {
                    f
                    for c in bc._table_commits(name)
                    for f in c.get("added", [])
                }
            for d in os.listdir(t.data_dir):
                p = os.path.join(t.data_dir, d)
                if not os.path.isdir(p):
                    continue
                entries = os.listdir(p)
                dir_has_live = any(
                    os.path.join(d, f) in referenced for f in entries
                )
                for fname in entries:
                    rel = os.path.join(d, fname)
                    fp = os.path.join(p, fname)
                    if rel in referenced:
                        continue
                    # non-data markers (_SUCCESS) stay with a live
                    # stage; they go only when the whole dir is dead
                    if not fname.endswith(".parquet") and dir_has_live:
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


def optimize_catalog_table(
    cat: Catalog,
    spark: SparkSession,
    name: str,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_partitions: int | None = None,
    cluster_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE for a CATALOG table (round 13) — the small-file
    compaction the chain-resolved world was missing: the streaming
    ``catalog_txn`` sink lands one file set per micro-batch, and at a
    100 TB catalog those accumulate just like manifest micro-batch
    ingest. Live files under ``small_file_bytes`` are read once,
    rewritten right-sized (optionally range-clustered on
    ``cluster_by``), and swapped in with ONE catalog commit carrying
    ``added`` + ``removed`` — rows untouched, so readers before and
    after see identical contents, old chain versions still
    time-travel, and the originals become reclaimable once
    ``compact_catalog`` nets them out of the base (the same
    delete → compact → vacuum lifecycle). Publishes through the
    put-if-absent fence like every transaction: a lost race discards
    the stage and re-plans against the new chain; concurrent MUTATORS
    that lose to this commit abort by the removed-files rule (their
    rewrite basis changed), concurrent appends recommit unaffected.
    Returns ``{"files_rewritten", "files_created", "rounds"}``."""
    for attempt in range(5):
        numbered = cat.numbered_snapshot()
        t = cat.table_handle(name)
        commits = [
            c.get("tables", {}).get(name) for _, c in numbered
        ]
        commits = [c for c in commits if c is not None]
        live = t._files(commits)
        small = [
            f
            for f in live
            if os.path.exists(f)
            and os.path.getsize(f) < small_file_bytes
        ]
        if len(small) <= 1:
            return {
                "files_rewritten": 0,
                "files_created": 0,
                "rounds": attempt,
            }
        total = sum(os.path.getsize(f) for f in small)
        n_out = target_partitions or max(1, total // small_file_bytes)
        schema = ManifestTable._evolved_schema(commits)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        src_df = reader.parquet(*small)
        if cluster_by:
            packed = src_df.repartitionByRange(
                int(n_out), *cluster_by
            ).sortWithinPartitions(*cluster_by)
        else:
            packed = src_df.repartition(int(n_out))
        staged = t._stage(packed)
        sdf = spark.read.parquet(
            *(os.path.join(t.data_dir, f) for f in staged)
        )
        aggs = [F.count(F.lit(1)).alias("n")]
        if "reading_timestamp" in sdf.columns:
            aggs.append(
                F.collect_set(
                    F.to_date("reading_timestamp").cast("string")
                ).alias("ds")
            )
        row = sdf.agg(*aggs).collect()[0]
        payload = json.dumps(
            {
                "version": ManifestTable._fence(numbered),
                "tables": {
                    name: {
                        "added": staged,
                        "removed": sorted(
                            os.path.relpath(f, t.data_dir)
                            for f in small
                        ),
                        "count": row["n"],
                        "dates": (
                            sorted(row["ds"])
                            if "ds" in row.__fields__
                            else []
                        ),
                        "schema": (
                            schema.json()
                            if schema is not None
                            else None
                        ),
                        "stats": t._file_stats(staged),
                    }
                },
                "optimize": True,
                "committed_at": time.time(),
            }
        ).encode()
        if _put_if_absent(
            cat._commit_path(ManifestTable._fence(numbered)), payload
        ):
            return {
                "files_rewritten": len(small),
                "files_created": len(staged),
                "rounds": attempt + 1,
            }
        t._discard_stage_all(staged)
    raise CommitConflictError(
        f"optimize gave up after 5 attempts on catalog table {name!r}"
    )


def _squash_payloads(payloads: list[dict]) -> dict:
    """Replay a table's per-commit payloads into ONE payload — the
    shared merge behind :func:`compact_catalog` and
    :meth:`CatalogBranch.fast_forward`. With append-only payloads
    this was plain concatenation; with mutations (round 13) it is a
    replay: a ``removed`` entry drops the file (and its stats) if a
    prior payload in the window added it, else it CARRIES THROUGH to
    the squashed ``removed`` (a branch mutation can remove a file
    main's prefix added — the squash commit must still remove it).
    ``count`` is recomputed from the SURVIVING files' footer stats
    (``"#rows"``) when every survivor carries them — the concatenated
    sum double-counts after a delete→optimize→compact lifecycle
    (optimize's payload re-counts the rows it rewrote), and a
    consumer trusting ``count`` would see inflated totals. Survivors
    without row stats (legacy payloads) fall back to the concatenated
    sum, flagged ``count_is_upper_bound`` so no consumer mistakes it
    for live rows. The last schema wins, dates/stats union over
    SURVIVING files."""
    added: dict[str, None] = {}
    removed: list[str] = []
    stats: dict = {}
    dates: set = set()
    count = 0
    schema = None
    for p in payloads:
        for r in p.get("removed", []):
            if r in added:
                added.pop(r)
                stats.pop(r, None)
            else:
                removed.append(r)
        for f in p["added"]:
            added[f] = None
        count += p["count"]
        dates |= set(p.get("dates", []))
        schema = p.get("schema") or schema
        stats.update(p.get("stats", {}))
    surviving_stats = {f: s for f, s in stats.items() if f in added}
    rows = [
        s.get("#rows") if isinstance(s, dict) else None
        for s in (surviving_stats.get(f) for f in added)
    ]
    out = {
        "added": list(added),
        "removed": removed,
        "count": count,
        "dates": sorted(dates),
        "schema": schema,
        "stats": surviving_stats,
    }
    if all(r is not None for r in rows):
        out["count"] = sum(rows)
    else:
        out["count_is_upper_bound"] = True
    return out


def compact_catalog(cat: Catalog, keep_last: int = 10) -> int:
    """Catalog-chain compaction — the same merged-base move as the
    manifest's ``compact_log``: all commits except the newest
    ``keep_last`` merge into one base commit whose per-table payloads
    are the REPLAY of the merged prefix's (:func:`_squash_payloads` —
    removals net out the files mutations rewrote, making them
    vacuum-reclaimable; dates/stats union, last schema wins). The
    base reuses the lowest commit number; tail numbers are
    untouched, so the transaction fence stays monotone and a lost
    put-if-absent remains the only way to miss concurrent content.
    Catalog-BRANCH bases are GC roots (the clamp rule tags have on
    the manifest log): merging past one would silently widen the
    frozen prefix that branch reads. Positional version pinning
    coarsens for the merged range — the granularity trade every log
    cleanup makes. Returns the number of commits merged."""
    if isinstance(cat, CatalogBranch):
        raise ValueError(
            "compact_catalog is a main-catalog maintenance operation"
        )
    numbered = cat.numbered_snapshot()
    if len(numbered) <= max(keep_last, 1):
        return 0
    cut = len(numbered) - keep_last
    bases = {b["base_commit_number"] for b in cat.list_branches()}
    if bases:
        for i in range(cut):
            if numbered[i][0] in bases:
                cut = i
                break
    # Tag numbers are GC roots too, with STRICT clamp semantics:
    # merging a commit numbered past a tag would fold post-tag
    # content into the base the tag's prefix resolves through,
    # silently changing the release. Merging everything <= the tag
    # number is safe (prefix content is exactly the tag's view).
    tag_nums = {t["commit_number"] for t in cat.list_tags()}
    if tag_nums:
        min_tag = min(tag_nums)
        for i in range(cut):
            if numbered[i][0] > min_tag:
                cut = i
                break
    if cut < 2:
        return 0
    base = numbered[:cut]
    by_table: dict[str, list[dict]] = {}
    for _, c in base:
        for name, p in c.get("tables", {}).items():
            by_table.setdefault(name, []).append(p)
    # Replay-merge (not concatenation): a CoW mutation in the merged
    # prefix removes files an earlier commit added — the base must
    # hold the NET file set or readers would resurrect deleted rows.
    merged = {
        name: _squash_payloads(ps) for name, ps in by_table.items()
    }
    base_num = base[0][0]
    payload = {
        "version": base_num,
        "tables": merged,
        "compacted_from": cut,
        "committed_at": base[-1][1].get("committed_at"),
    }
    # unique per writer, not per process (two THREADS share a pid —
    # the round-12 index-refresh race class), though compaction also
    # serializes under the chain lock
    tmp = cat._commit_path(base_num) + f".compacting.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, cat._commit_path(base_num))
    for num, _ in base[1:]:
        try:
            os.unlink(cat._commit_path(num))
        except FileNotFoundError:
            pass
    return cut


class CatalogTxn:
    """Collects staged appends AND copy-on-write mutations across
    tables, then publishes ONE catalog commit. Usage::

        txn = catalog.txn()
        txn.append(spark, "fact", fact_batch)
        txn.upsert(spark, "fact", restated_rows)
        txn.upsert(spark, "dim_meters", dim_rows, pk=["meter_id"])
        txn.delete_where(spark, "fact", "reading_value < 0")
        txn.commit()   # all visible, atomically — or none

    Members see the txn's own earlier stages (read-your-own-writes):
    each operation resolves the table from the catalog chain PLUS the
    txn's accumulated payload, so an upsert after an append restates
    the appended rows too. Mutations of files this txn itself staged
    rewrite the STAGE (the removed stage file is discarded, never
    listed in the commit's ``removed`` — a published removal may only
    name chain-visible files)."""

    def __init__(self, cat: Catalog) -> None:
        self.cat = cat
        self._payloads: dict[str, dict] = {}
        self._pks: dict[str, list[str]] = {}
        self._mutated: set[str] = set()
        # chain length all staged work has been validated against;
        # commit() revalidates anything that landed past it (the
        # append→commit gap is a race window too, not just lost
        # put-if-absent attempts inside commit)
        self._validated_len: int | None = None
        self._spark: SparkSession | None = None
        self._committed = False
        # test seam, same contract as ManifestTable._pre_publish_hook
        self._pre_publish_hook = None

    def _visible_commits(self, name: str) -> list[dict]:
        """The table's payloads as THIS txn sees them: the catalog
        chain plus our own accumulated stage."""
        commits = self.cat._table_commits(name)
        p = self._payloads.get(name)
        if p is not None:
            commits = commits + [p]
        return commits

    def _note_chain_len(self) -> None:
        n = len(self.cat.numbered_snapshot())
        if self._validated_len is None:
            self._validated_len = n
        else:
            self._validated_len = min(self._validated_len, n)

    def _merge_payload(
        self,
        name: str,
        t: ManifestTable,
        spark: SparkSession,
        staged: list[str],
        removed: list[str],
        schema_json: str | None,
    ) -> None:
        """Fold one operation's (staged, removed) into the table's
        accumulated payload. A removal of a file WE staged earlier
        rewrites the stage in place (file discarded, not published);
        removals of chain files publish in ``removed``. Dates and
        count are recomputed from the payload's current staged files
        (one bounded agg — txn-sized, never table-sized)."""
        prior = self._payloads.get(name) or {
            "added": [],
            "removed": [],
            "count": 0,
            "dates": [],
            "schema": None,
            "stats": {},
        }
        prior_added = list(prior["added"])
        prior_stats = dict(prior["stats"])
        removed_chain: list[str] = []
        for r in removed:
            if r in prior_added:
                prior_added.remove(r)
                prior_stats.pop(r, None)
                t._discard_stage([r])
            else:
                removed_chain.append(r)
        added = prior_added + staged
        stats = {**prior_stats, **t._file_stats(staged)}
        count, dates = 0, []
        if added:
            sdf = spark.read.parquet(
                *(os.path.join(t.data_dir, f) for f in added)
            )
            aggs = [F.count(F.lit(1)).alias("n")]
            if "reading_timestamp" in sdf.columns:
                aggs.append(
                    F.collect_set(
                        F.to_date("reading_timestamp").cast("string")
                    ).alias("ds")
                )
            row = sdf.agg(*aggs).collect()[0]
            count = row["n"]
            dates = sorted(row["ds"]) if "ds" in row.__fields__ else []
        self._payloads[name] = {
            "added": added,
            "removed": sorted(
                set(prior.get("removed", [])) | set(removed_chain)
            ),
            "count": count,
            "dates": dates,
            "schema": schema_json or prior.get("schema"),
            "stats": stats,
        }

    def append(
        self,
        spark: SparkSession,
        name: str,
        batch: DataFrame,
        pk: list[str] = PK,
    ) -> int:
        """Stage a PK-idempotent append to ``name`` inside this
        transaction: dedupe within the batch, anti-join against the
        txn-visible state (catalog chain + rows already staged for
        ``name`` by this txn), stage the survivors. Nothing is
        visible until :meth:`commit`."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        self._spark = spark
        self._note_chain_len()
        t = self.cat.table_handle(name)
        # Same write screens as the manifest append (round 13): the
        # table's persisted CHECK constraints gate the batch before
        # anything stages, and schema evolution stays additive-only —
        # a type-changed column would make the chain's evolved-schema
        # reader produce unreadable mixed-type files later.
        t._check_constraints(batch)
        t._check_schema_compat(batch, self._visible_commits(name))
        clean = batch.dropDuplicates(pk)
        # Date-pruned validation scan (the manifest append's move).
        # The date filter applies at the FILE level inside _files
        # (add-side only — removals always replay), never by dropping
        # whole commits: a mutation commit whose dates don't overlap
        # can still REMOVE an overlapping file, and skipping its
        # removal would anti-join the batch against deleted rows.
        batch_dates: set[str] | None = None
        if "reading_timestamp" in clean.columns:
            batch_dates = {
                str(r["d"])
                for r in clean.select(
                    F.to_date("reading_timestamp").alias("d")
                )
                .distinct()
                .collect()
            }
        commits = self._visible_commits(name)
        files = t._files(commits, batch_dates) if commits else []
        if files:
            schema = ManifestTable._evolved_schema(commits)
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            clean = clean.join(
                reader.parquet(*files).select(*pk), pk, "left_anti"
            )
        clean = clean.persist()
        try:
            n = clean.count()
            if n == 0:
                return 0
            staged = t._stage(clean)
            self._merge_payload(
                name, t, spark, staged, [], clean.schema.json()
            )
            self._pks[name] = list(pk)
            return n
        finally:
            clean.unpersist()

    def upsert(
        self,
        spark: SparkSession,
        name: str,
        batch: DataFrame,
        pk: list[str] = PK,
    ) -> tuple[int, int]:
        """Copy-on-write MERGE inside the transaction — matched rows
        (by ``pk``) are replaced by batch rows, the rest insert, and
        the rewrite publishes with everything else in the txn's ONE
        catalog commit. The txn-local CoW engine mirrors the manifest
        one (sources/manifest.py ``_cow_mutation``): full-column
        UPDATE SET * contract, pk-only stats pruning of candidate
        files, survivors staged under the evolved schema. Returns
        ``(n_matched, n_inserted)``."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        self._spark = spark
        self._note_chain_len()
        t = self.cat.table_handle(name)
        commits = self._visible_commits(name)
        clean = batch.dropDuplicates(pk).persist()
        try:
            if clean.limit(1).count() == 0:
                return 0, 0
            t._check_constraints(clean)
            t._check_schema_compat(clean, commits)
            tbl_schema = ManifestTable._evolved_schema(commits)
            if tbl_schema is not None:
                missing = [
                    f.name
                    for f in tbl_schema.fields
                    if f.name not in set(clean.columns)
                ]
                if missing:
                    raise ValueError(
                        "upsert batch is missing table columns "
                        f"{missing}: matched rows are replaced "
                        "wholesale (UPDATE SET *) — join the batch "
                        "against catalog.read() to carry forward "
                        "unchanged values"
                    )
            # date pruning only when the timestamp is a MATCH key
            # (manifest rule: under a timestamp-free pk a restatement
            # MOVES rows across dates)
            key_dates: set[str] | None = None
            if (
                "reading_timestamp" in pk
                and "reading_timestamp" in clean.columns
            ):
                key_dates = {
                    str(r["d"])
                    for r in clean.select(
                        F.to_date("reading_timestamp").alias("d")
                    )
                    .distinct()
                    .collect()
                }
            cand = t._files(commits, key_dates)
            stat_cols = [
                c
                for c in t.stats_columns
                if c in pk and c in clean.columns
            ]
            key_ranges = t._batch_key_ranges(clean, stat_cols)
            cand = t._prune_by_stats(cand, commits, key_ranges)
            staged: list[str] = []
            removed_rel: list[str] = []
            n_matched = 0
            tagged = None
            if cand:
                reader = spark.read
                if tbl_schema is not None:
                    reader = reader.schema(tbl_schema)
                tagged = reader.parquet(*cand).withColumn(
                    "_file", F.input_file_name()
                )
                matched = tagged.join(
                    clean.select(*pk), pk, "left_semi"
                )
                n_matched = matched.count()
                if n_matched:
                    affected = [
                        r["_file"]
                        for r in matched.select("_file")
                        .distinct()
                        .collect()
                    ]
                    removed_rel = sorted(
                        t._rel(u) for u in affected
                    )
                    survivors = (
                        tagged.filter(F.col("_file").isin(affected))
                        .join(clean.select(*pk), pk, "left_anti")
                        .drop("_file")
                    )
                    staged = t._stage(survivors)
            n_inserted = (
                clean.join(tagged.select(*pk), pk, "left_anti").count()
                if tagged is not None
                else clean.count()
            )
            staged = staged + t._stage(clean)
            self._merge_payload(
                name, t, spark, staged, removed_rel,
                clean.schema.json(),
            )
            self._pks[name] = list(pk)
            self._mutated.add(name)
            return n_matched, n_inserted
        finally:
            clean.unpersist()

    def delete_keys(
        self,
        spark: SparkSession,
        name: str,
        keys: DataFrame,
        pk: list[str] = PK,
    ) -> int:
        """Copy-on-write DELETE by KEY FRAME inside the transaction —
        the GDPR-by-key member: ``keys`` (a DataFrame of pk tuples,
        arbitrarily large — never an IN-list) anti-joins the affected
        files' rows out, with pk-only stats pruning bounding the
        candidate scan. Lands with the rest of the txn atomically.
        Returns the matched-row count."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        self._spark = spark
        self._note_chain_len()
        t = self.cat.table_handle(name)
        commits = self._visible_commits(name)
        in_keys = keys.dropDuplicates(pk).persist()
        try:
            if in_keys.limit(1).count() == 0:
                return 0
            files = t._files(commits) if commits else []
            if not files:
                return 0
            stat_cols = [
                c
                for c in t.stats_columns
                if c in pk and c in in_keys.columns
            ]
            key_ranges = t._batch_key_ranges(in_keys, stat_cols)
            cand = t._prune_by_stats(files, commits, key_ranges)
            if not cand:
                return 0
            schema = ManifestTable._evolved_schema(commits)
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            tagged = reader.parquet(*cand).withColumn(
                "_file", F.input_file_name()
            )
            matched = tagged.join(in_keys.select(*pk), pk, "left_semi")
            n_matched = matched.count()
            if n_matched == 0:
                return 0
            affected = [
                r["_file"]
                for r in matched.select("_file").distinct().collect()
            ]
            removed_rel = sorted(t._rel(u) for u in affected)
            survivors = (
                tagged.filter(F.col("_file").isin(affected))
                .join(in_keys.select(*pk), pk, "left_anti")
                .drop("_file")
            )
            staged = t._stage(survivors)
            self._merge_payload(
                name, t, spark, staged, removed_rel,
                schema.json() if schema is not None else None,
            )
            self._pks.setdefault(name, list(pk))
            self._mutated.add(name)
            return n_matched
        finally:
            in_keys.unpersist()

    def delete_where(
        self,
        spark: SparkSession,
        name: str,
        cond,
        pk: list[str] = PK,
    ) -> int:
        """Copy-on-write DELETE inside the transaction: rows where
        ``cond`` (a SQL string or Column) is TRUE leave the table;
        affected files rewrite to survivors, and the removal lands
        with the rest of the txn atomically. NULL ``cond`` keeps the
        row (SQL DELETE semantics). Returns the matched-row count."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        self._spark = spark
        self._note_chain_len()
        t = self.cat.table_handle(name)
        commits = self._visible_commits(name)
        cond_col = F.expr(cond) if isinstance(cond, str) else cond
        files = t._files(commits) if commits else []
        if not files:
            return 0
        schema = ManifestTable._evolved_schema(commits)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        tagged = reader.parquet(*files).withColumn(
            "_file", F.input_file_name()
        )
        matched = tagged.filter(cond_col)
        n_matched = matched.count()
        if n_matched == 0:
            return 0
        affected = [
            r["_file"]
            for r in matched.select("_file").distinct().collect()
        ]
        removed_rel = sorted(t._rel(u) for u in affected)
        survivors = (
            tagged.filter(F.col("_file").isin(affected))
            .filter(
                F.coalesce(cond_col, F.lit(False)) == F.lit(False)
            )
            .drop("_file")
        )
        staged = t._stage(survivors)
        self._merge_payload(
            name, t, spark, staged, removed_rel,
            schema.json() if schema is not None else None,
        )
        self._pks.setdefault(name, list(pk))
        self._mutated.add(name)
        return n_matched

    def abort(self) -> None:
        """Discard every staged file; the transaction never happened."""
        for name, p in self._payloads.items():
            t = self.cat.table_handle(name)
            t._discard_stage_all(p["added"])
        self._payloads.clear()

    def _revalidate(self, new_chain: list[tuple[int, dict]]) -> None:
        """Per-table conflict check against the commits that landed
        after this txn's staged work was derived. Append-only
        interleavings revalidate by key overlap (re-reading our own
        staged files — bounded by the txn's size, never the table's);
        a table this txn MUTATED additionally aborts if any such
        commit removed files from it — our rewrite was derived from a
        file set that no longer heads the chain, and recommitting it
        could drop the concurrent writer's change (a lost update).
        Raises :class:`CommitConflictError` after discarding the
        stage."""
        # captured at stage time: getActiveSession() is THREAD-LOCAL
        # and returns None on a worker thread, where concurrent
        # transactions naturally run
        spark = self._spark
        for name, p in self._payloads.items():
            t = self.cat.table_handle(name)
            new_commits = [
                c.get("tables", {}).get(name) for _, c in new_chain
            ]
            new_commits = [c for c in new_commits if c is not None]
            if not new_commits:
                continue
            if name in self._mutated and any(
                c.get("removed") for c in new_commits
            ):
                self.abort()
                raise CommitConflictError(
                    f"catalog txn mutated table {name!r} but a "
                    "concurrent commit also removed files from it; "
                    "staged files discarded — re-run the "
                    "transaction against the new state"
                )
            new_files = t._files(new_commits)
            if not new_files or not p["added"]:
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

    def commit(self, max_retries: int = 20) -> int:
        """Publish every staged table in ONE put-if-absent catalog
        commit. Fence invariant as in the manifest append: the fence
        and the validation state come from the same chain listing.
        Anything that landed since the txn's FIRST staged operation
        is validated before the first attempt (the append→commit gap
        is a race window too); a lost put-if-absent re-validates
        against exactly the commits it lost to and recommits the same
        staged files at the next number when compatible, or discards
        and raises on a genuine conflict (key overlap for appends;
        any concurrent file removal for mutated tables). Returns the
        number of tables committed."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        if not self._payloads:
            return 0
        numbered = self.cat.numbered_snapshot()
        validated_len = (
            self._validated_len
            if self._validated_len is not None
            else len(numbered)
        )
        for _ in range(max_retries):
            if len(numbered) > validated_len:
                self._revalidate(numbered[validated_len:])
                validated_len = len(numbered)
            fence = ManifestTable._fence(numbered)
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
            numbered = self.cat.numbered_snapshot()
        self.abort()
        raise CommitConflictError(
            f"gave up after {max_retries} catalog commit attempts on "
            f"{self.cat.root}"
        )


class CatalogBranchDivergedError(CommitConflictError):
    """Main catalog advanced past the branch base — the fast-forward
    would drop those commits, so it refuses."""


class CatalogBranch(Catalog):
    """A writable fork of the WHOLE catalog: every table at the base
    chain position, plus the branch's own catalog commits (kept in
    ``_catalog_branches/<name>/``). Transactions, reads, version
    pinning — everything inherited works against the composite chain
    because it all flows through ``numbered_snapshot`` /
    ``_commit_path``, both redirected here. Data files live in the
    parent's table dirs (staging is table-local and uuid-named), so a
    catalog branch costs one ref regardless of how many tables or
    bytes the catalog holds.

    :meth:`fast_forward` publishes the branch's whole multi-table
    change-set as ONE main catalog commit (append-only squash: the
    per-table payloads concatenate), giving catalog-level
    Write-Audit-Publish: an audit campaign spanning fact AND
    dimension changes serves from the branch, main stays pinned, and
    the publish is atomic across every touched table."""

    def __init__(self, parent: Catalog, name: str, base: int) -> None:
        super().__init__(parent.root)
        self._parent = parent
        self.branch_name = name
        self.base_number = base
        self.commits_dir = self._branch_chain_dir(name)
        os.makedirs(self.commits_dir, exist_ok=True)

    def numbered_snapshot(self) -> list[tuple[int, dict]]:
        main = [
            (n, c)
            for n, c in ManifestTable._read_log(self._parent.commits_dir)
            if n <= self.base_number
        ]
        return main + ManifestTable._read_log(self.commits_dir)

    def create_branch(self, name: str, version: int | None = None) -> dict:
        raise ValueError(
            "cannot branch a catalog branch — fork the main catalog"
        )

    def fast_forward(self, max_retries: int = 5) -> dict:
        """Squash-publish the branch's commits onto the main catalog
        as ONE commit. Requires main's head to still be the branch
        base (:class:`CatalogBranchDivergedError` otherwise); the
        publish rides the same put-if-absent fence as every
        transaction, so a concurrent main txn either loses or makes
        this diverge — never a silent overwrite. Payloads squash by
        per-table REPLAY (:func:`_squash_payloads`): branch-internal
        add-then-remove pairs net out, and a branch mutation's
        removal of a main-prefix file carries through to the squash
        commit; the last schema wins — consistent with how the chain
        itself evolves schemas."""
        bc = [c for _, c in ManifestTable._read_log(self.commits_dir)]
        if not bc:
            return {"published": 0}
        by_table: dict[str, list[dict]] = {}
        for c in bc:
            for name, p in c.get("tables", {}).items():
                by_table.setdefault(name, []).append(p)
        # replay-merge: a branch mutation may remove files MAIN's
        # prefix added — _squash_payloads carries those removals
        # through to the squash commit instead of dropping them
        merged = {
            name: _squash_payloads(ps)
            for name, ps in by_table.items()
        }
        payload = {
            "tables": merged,
            "committed_at": time.time(),
            "fast_forward_of": self.branch_name,
            "squashed_from": len(bc),
        }
        for _ in range(max_retries):
            main_numbered = self._parent.numbered_snapshot()
            fence = ManifestTable._fence(main_numbered)
            if fence != self.base_number + 1:
                raise CatalogBranchDivergedError(
                    f"cannot fast-forward catalog branch "
                    f"{self.branch_name!r}: main is at fence {fence}, "
                    f"branch base is {self.base_number} — main "
                    "advanced since the fork"
                )
            payload["version"] = fence
            if _put_if_absent(
                self._parent._commit_path(fence),
                json.dumps(payload).encode(),
            ):
                self._parent.delete_branch(self.branch_name)
                return {"published": 1, "squashed_from": len(bc)}
        raise CommitConflictError(
            f"gave up after {max_retries} fast-forward attempts on "
            f"catalog branch {self.branch_name!r}"
        )


class CatalogTableView(ManifestTable):
    """Read/maintenance ManifestTable VIEW of one catalog table: the
    commit "log" is the catalog chain's embedded payloads for
    ``name``, numbered by CATALOG commit number (round 14).

    Why it exists: the secondary/text index machinery
    (``sources/index.py``) speaks the manifest log protocol —
    ``numbered_snapshot()`` for the fence, ``_file_origins`` for the
    origin > indexed_upto staleness rule, ``_files`` for the live
    set. A catalog table's OWN manifest log is deliberately empty
    (the catalog holds the log), so handing ``table_handle(name)`` to
    the index would index nothing. This view re-points the log
    accessors at the catalog chain, and every log-replaying consumer
    — index refresh/consult/vacuum/compact, ``maintain_index``,
    skipping reports — composes with catalog transactions unchanged:
    a CatalogTxn CoW upsert's rewritten files carry the txn's catalog
    commit number as their origin, so they read as UNINDEXED until
    the next refresh, exactly like a plain manifest upsert.

    WRITE operations must keep going through :class:`CatalogTxn` —
    the view's mutation methods would publish to the table's unused
    private log and diverge from the catalog. Index maintenance is
    safe: postings live in their own manifest table under the table
    dir, and the only non-posting writes are the index meta files."""

    def __init__(self, cat: Catalog, name: str) -> None:
        super().__init__(os.path.join(cat.root, "tables", name))
        self._cat = cat
        self._name = name

    def numbered_snapshot(self) -> list[tuple[int, dict]]:
        out = []
        for num, c in self._cat.numbered_snapshot():
            p = c.get("tables", {}).get(self._name)
            if p is not None:
                out.append((num, p))
        return out

    def snapshot(self) -> list[dict]:
        return [c for _, c in self.numbered_snapshot()]

    def _fence(self, numbered):  # noqa: ARG002 — guard, not a fence
        # Every manifest mutation fences before publishing; fencing
        # through the view means someone is about to commit to the
        # table's PRIVATE log, which catalog readers ignore — the
        # write would be silently invisible. Fail loud instead.
        raise TypeError(
            "CatalogTableView is read/maintenance-only: route writes "
            f"through Catalog.txn() (table {self._name!r})"
        )
