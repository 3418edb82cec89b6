"""Z-ordered (space-filling-curve) file layout.

At 100 TB, which rows share a file decides how much a selective query
reads: parquet footers carry per-file min/max, and the scan planner
skips files whose range misses the predicate. A single-column sort
gives perfect pruning on that column and none on any other; sorting by
a Morton-interleaved key (operators/extended.py:zorder_key) makes each
file a small rectangle in the two bucketed dimensions, so min/max
pruning works on BOTH — the layout trick behind Delta/Iceberg
Z-ORDER clustering, built here from plain repartitionByRange + sorted
parquet writes (no table format required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_zordered(
    df: DataFrame, path: str, key_col: str = "z_key", n_files: int = 8
) -> None:
    """Range-partition on the z-key (contiguous curve segments per
    file — range, not hash, or curve locality is destroyed), sort
    within partitions so row groups inherit the locality too, and
    write one file per partition. One shuffle, one sort pass — the
    same cost envelope as any clustered write."""
    (
        df.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )
