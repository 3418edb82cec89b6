"""OPTIMIZE ZORDER: interleaved clustering must narrow EVERY clustered
column's per-file stats range, where lexicographic clustering narrows
only the first."""

from __future__ import annotations

import datetime as dt

from smart_meter_data_pipeline_spark.sources.manifest import (
    ManifestTable,
    optimize_table,
)

TS = dt.datetime(2024, 1, 1)


def _grid_table(spark, path):
    """32x32 integer (meter_id, v) grid appended as 8 small files
    (stats record integer columns only)."""
    t = ManifestTable(str(path), stats_columns=["meter_id", "v"])
    rows = [
        (TS + dt.timedelta(minutes=i), i % 32, i // 32)
        for i in range(1024)
    ]
    for lo in range(0, 1024, 128):
        df = spark.createDataFrame(
            rows[lo : lo + 128],
            "reading_timestamp timestamp, meter_id bigint, v bigint",
        ).repartition(1)
        t.idempotent_append(spark, df)
    return t


def _stat_widths(t):
    stats = t.snapshot()[-1]["stats"]
    widths = {"meter_id": [], "v": []}
    for per_file in stats.values():
        for c in widths:
            lo, hi = per_file[c][:2]
            widths[c].append(float(hi) - float(lo))
    return {c: sum(w) / len(w) for c, w in widths.items()}


def test_zorder_narrows_both_columns(spark, tmp_path):
    tz = _grid_table(spark, tmp_path / "tz")
    before = sorted(map(tuple, tz.read(spark).collect()))
    res = optimize_table(
        tz,
        spark,
        target_partitions=16,
        cluster_by=["meter_id", "v"],
        zorder=True,
    )
    assert res["files_rewritten"] == 8 and res["files_created"] >= 8
    assert sorted(map(tuple, tz.read(spark).collect())) == before

    tl = _grid_table(spark, tmp_path / "tl")
    optimize_table(
        tl, spark, target_partitions=16, cluster_by=["meter_id", "v"]
    )

    wz = _stat_widths(tz)
    wl = _stat_widths(tl)
    # lexicographic: first column narrow, second column ~full range
    assert wl["meter_id"] <= 8
    assert wl["v"] >= 24
    # z-order: BOTH columns substantially narrower than full (31)
    assert wz["meter_id"] <= 16
    assert wz["v"] <= 16


def test_zorder_single_column_falls_back_to_range_cluster(spark, tmp_path):
    t = _grid_table(spark, tmp_path / "t1")
    res = optimize_table(
        t, spark, target_partitions=16, cluster_by=["meter_id"], zorder=True
    )
    assert res["files_created"] >= 1
    assert _stat_widths(t)["meter_id"] <= 8


def test_zorder_three_columns_all_narrow(spark, tmp_path):
    """3-D Z-order: EVERY clustered column's per-file stats range must
    narrow (≈ cube-root-of-file-count per axis), where lexicographic
    clustering leaves the 2nd and 3rd columns at ~full range — pins
    the generic bit-interleave beyond the 2-D grid the other tests
    cover."""
    import datetime as dt

    def cube(path):
        t = ManifestTable(
            str(path), stats_columns=["meter_id", "v", "w"]
        )
        rows = [
            (
                TS + dt.timedelta(minutes=i),
                i % 16,
                (i // 16) % 16,
                i // 256,
            )
            for i in range(4096)
        ]
        for lo in range(0, 4096, 512):
            df = spark.createDataFrame(
                rows[lo : lo + 512],
                "reading_timestamp timestamp, meter_id bigint,"
                " v bigint, w bigint",
            ).repartition(1)
            t.idempotent_append(spark, df)
        return t

    tz = cube(tmp_path / "z3")
    optimize_table(
        tz,
        spark,
        target_partitions=16,
        cluster_by=["meter_id", "v", "w"],
        zorder=True,
    )
    tl = cube(tmp_path / "l3")
    optimize_table(
        tl, spark, target_partitions=16, cluster_by=["meter_id", "v", "w"]
    )

    def widths(t):
        stats = t.snapshot()[-1]["stats"]
        out = {"meter_id": [], "v": [], "w": []}
        for per_file in stats.values():
            for c in out:
                lo, hi = per_file[c][:2]
                out[c].append(hi - lo)
        return {c: sum(ws) / len(ws) for c, ws in out.items()}

    wz, wl = widths(tz), widths(tl)
    # lexicographic at one-meter-per-file: only the first axis narrows
    assert wl["meter_id"] <= 1, wl
    assert wl["v"] >= 12 and wl["w"] >= 12, wl
    # z-order: EVERY axis well under the full range (15)
    assert wz["meter_id"] <= 10 and wz["v"] <= 10 and wz["w"] <= 10, wz
