"""Custom Python DataSource: the meter simulator as a first-class
Spark table source (Spark 4 Python DataSource API).

The reference's producer is a standalone process pushing simulated
readings through Kafka (producer/meter_simulator.py:198-250); the
engine already ships its deterministic twin as a DataFrame transform
(``operators.meter_pipeline.gen_meter_readings``). This module makes
the same generator a REGISTERED SOURCE — ``spark.read.format(
"meter_sim").option("n_meters", ...).load()`` — which buys two things
the DataFrame form can't offer:

1. **Partition-parallel generation with NO shuffle**: each input
   partition owns a contiguous meter block and accumulates its own
   meters' cumulative counters locally, so the per-meter running sum
   that costs the DataFrame generator a window Exchange is free here
   (the partitioning IS the grouping). At 100 TB-scale backfills this
   is the difference between a shuffle of every synthetic row and
   none.
2. **Filter pushdown** (Spark 4.1 ``pushFilters``): equality and
   range predicates on ``meter_id`` prune whole meter-block partitions
   before any row is generated — the scan-level pruning story
   (`PushedFilters`) extended into a Python source.

Determinism: the per-row arithmetic replicates the portable-PRNG
expressions of ``gen_meter_readings`` (same integer mix, same IEEE
double expression order), so the source's output is row-identical to
the DataFrame generator — pinned by tests/test_meter_sim_source.py.

Pickling constraint: the DataSource class is shipped to Python
workers by cloudpickle. A module-level class pickles BY REFERENCE and
dies with ModuleNotFoundError when the worker lacks this repo on its
sys.path (the driver-contract situation), so the class is defined
inside :func:`make_meter_sim_source` and captured by value — the same
rule the stateful streaming closures follow.
"""

from __future__ import annotations


def make_meter_sim_source():
    """Return the DataSource class (closure-scoped so cloudpickle
    ships it by value; see module docstring). Register with
    ``spark.dataSource.register(make_meter_sim_source())``."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    class _MeterBlock(InputPartition):
        def __init__(self, lo: int, hi: int, n_ticks: int):
            self.lo = lo  # meter_id range [lo, hi)
            self.hi = hi
            self.n_ticks = n_ticks

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n_meters = int(options.get("n_meters", "200"))
            self.n_ticks = int(options.get("n_ticks", "96"))
            self.block = int(options.get("meters_per_partition", "25"))
            max_safe_ticks = (2**31 - 1) // 1_500_000
            if self.n_ticks > max_safe_ticks:
                raise ValueError(
                    f"n_ticks={self.n_ticks} can overflow the INTEGER "
                    f"cumulative counters (max safe: {max_safe_ticks})"
                )
            # meter_id bounds refined by pushed filters; [lo, hi)
            self.lo = 1
            self.hi = self.n_meters + 1

        def pushFilters(self, filters):
            supported = (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            )
            for f in filters:
                if getattr(f, "attribute", None) != (
                    "meter_id",
                ) or not isinstance(f, supported):
                    yield f  # e.g. IsNotNull, other columns — Spark
                    continue  # keeps applying these after the scan
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                else:
                    yield f  # not fully handled → Spark re-applies
                    continue
                # bounds absorbed the filter exactly → do NOT yield it

        def partitions(self):
            out = []
            lo = self.lo
            while lo < self.hi:
                hi = min(lo + self.block, self.hi)
                out.append(_MeterBlock(lo, hi, self.n_ticks))
                lo = hi
            # empty result still needs ≥1 partition
            return out or [_MeterBlock(0, 0, self.n_ticks)]

        def read(self, partition):
            import datetime as dt
            import math

            M31 = 2147483647
            start = dt.datetime(2024, 1, 1, 0, 0, 0)

            def u(salt, m, t):
                h1 = (m * 2654435761 + t * 40503 + salt * 97) % M31
                return ((h1 * 48271) % M31) / M31

            for m in range(partition.lo, partition.hi):
                cons_cum = 0
                prod_cum = 0
                for t in range(partition.n_ticks):
                    hour = (t // 4) % 24
                    u1 = u(1, m, t)
                    if (6 <= hour < 9) or (17 <= hour < 22):
                        base_w = 2000.0 + u1 * 3000.0
                    elif hour >= 22 or hour < 6:
                        base_w = 500.0 + u1 * 1000.0
                    else:
                        base_w = 1000.0 + u1 * 2000.0
                    jit = 0.8 + u(2, m, t) * 0.4
                    cons_cum += int(math.floor((base_w * jit) * 250.0))
                    if m % 2 == 0:
                        if 6 <= hour < 18:
                            sol_fac = 1.0 - abs(hour - 12) / 6.0
                            sol_peak = 3000.0 + u(3, m, t) * 3000.0
                            sol_jit = 0.8 + u(4, m, t) * 0.4
                            prod_cum += int(
                                math.floor(
                                    ((sol_peak * sol_fac) * sol_jit) * 250.0
                                )
                            )
                        prod = prod_cum
                    else:
                        prod = None
                    r = u(5, m, t) * 100.0
                    status = "V" if r < 98.0 else ("E" if r < 99.5 else "R")
                    yield (
                        start + dt.timedelta(minutes=15 * t),
                        m,
                        cons_cum,
                        prod,
                        status,
                    )

    from pyspark.sql.datasource import DataSourceStreamReader

    class _TickRange(InputPartition):
        """One micro-batch slice: ticks [t_lo, t_hi) for meter block
        [m_lo, m_hi)."""

        def __init__(self, m_lo, m_hi, t_lo, t_hi):
            self.m_lo, self.m_hi = m_lo, m_hi
            self.t_lo, self.t_hi = t_lo, t_hi

    class _StreamReader(DataSourceStreamReader):
        """Offset-tracked streaming form — the Kafka-consumer shape
        (resumable offsets, micro-batch slicing, commit callbacks)
        with the tick index playing the topic offset. DELTAS are
        emitted per tick (the wire contract the reference producer
        ships, producer/meter_simulator.py:198-250 — cumulative state
        belongs to the SINK side in the streaming design), so a batch
        [t_lo, t_hi) needs no history: every micro-batch is a pure
        function of its offset range, which is exactly what makes the
        source replayable after a checkpoint recovery."""

        def __init__(self, options):
            self.n_meters = int(options.get("n_meters", "200"))
            self.n_ticks = int(options.get("n_ticks", "96"))
            self.ticks_per_batch = int(options.get("ticks_per_batch", "24"))
            self.block = int(options.get("meters_per_partition", "50"))

        def initialOffset(self):
            return {"tick": 0}

        def latestOffset(self):
            return {"tick": self.n_ticks}

        def partitions(self, start, end):
            t_lo, t_end = start["tick"], end["tick"]
            out = []
            while t_lo < t_end:
                t_hi = min(t_lo + self.ticks_per_batch, t_end)
                m_lo = 1
                while m_lo <= self.n_meters:
                    m_hi = min(m_lo + self.block, self.n_meters + 1)
                    out.append(_TickRange(m_lo, m_hi, t_lo, t_hi))
                    m_lo = m_hi
                t_lo = t_hi
            return out or [_TickRange(0, 0, 0, 0)]

        def read(self, partition):
            import datetime as dt
            import math

            M31 = 2147483647
            start = dt.datetime(2024, 1, 1, 0, 0, 0)

            def u(salt, m, t):
                h1 = (m * 2654435761 + t * 40503 + salt * 97) % M31
                return ((h1 * 48271) % M31) / M31

            for m in range(partition.m_lo, partition.m_hi):
                for t in range(partition.t_lo, partition.t_hi):
                    hour = (t // 4) % 24
                    u1 = u(1, m, t)
                    if (6 <= hour < 9) or (17 <= hour < 22):
                        base_w = 2000.0 + u1 * 3000.0
                    elif hour >= 22 or hour < 6:
                        base_w = 500.0 + u1 * 1000.0
                    else:
                        base_w = 1000.0 + u1 * 2000.0
                    jit = 0.8 + u(2, m, t) * 0.4
                    cons_delta = int(math.floor((base_w * jit) * 250.0))
                    if m % 2 == 0:
                        if 6 <= hour < 18:
                            sol_fac = 1.0 - abs(hour - 12) / 6.0
                            sol_peak = 3000.0 + u(3, m, t) * 3000.0
                            sol_jit = 0.8 + u(4, m, t) * 0.4
                            prod_delta = int(
                                math.floor(
                                    ((sol_peak * sol_fac) * sol_jit) * 250.0
                                )
                            )
                        else:
                            prod_delta = 0
                    else:
                        prod_delta = None
                    r = u(5, m, t) * 100.0
                    status = "V" if r < 98.0 else ("E" if r < 99.5 else "R")
                    yield (
                        start + dt.timedelta(minutes=15 * t),
                        m,
                        cons_delta,
                        prod_delta,
                        status,
                    )

        def commit(self, end):
            pass  # offsets are pure function inputs — nothing to ack

    class MeterSimDataSource(DataSource):
        @classmethod
        def name(cls):
            return "meter_sim"

        def schema(self):
            return (
                "reading_timestamp timestamp, meter_id int, "
                "reading_consumption_milliwatts int, "
                "reading_production_milliwatts int, status string"
            )

        def reader(self, schema):
            return _Reader(self.options)

        def streamReader(self, schema):
            return _StreamReader(self.options)

    return MeterSimDataSource
