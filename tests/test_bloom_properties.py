"""Property tests for the manifest Bloom index hash/bitmap layer —
pure Python (no Spark), so hypothesis can sweep widely."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable


def _bitmap(values):
    bits = 0
    for v in values:
        for pos in ManifestTable._bloom_positions(v):
            bits |= 1 << pos
    return bits


def _member(bits, v):
    return all(bits >> p & 1 for p in ManifestTable._bloom_positions(v))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_bloom_never_false_negative(values):
    bits = _bitmap(values)
    assert all(_member(bits, v) for v in values)


@settings(max_examples=50, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2**40), max_size=200),
    st.sets(st.integers(min_value=2**41, max_value=2**42), min_size=50, max_size=200),
)
def test_bloom_false_positive_rate_bounded(present, absent):
    """Disjoint probe set: with 32K bits / k=3 and <=200 keys the FP
    rate is ~1e-5; allow a generous margin (it is an optimization —
    the assertion only guards against a degenerate hash)."""
    bits = _bitmap(present)
    fps = sum(1 for v in absent if _member(bits, v))
    assert fps <= max(2, len(absent) // 10)


def test_bloom_positions_stable_and_in_range():
    for v in (0, 1, 63, 2**31, 2**40 + 123):
        pos = ManifestTable._bloom_positions(v)
        assert pos == ManifestTable._bloom_positions(v)
        assert len(pos) == ManifestTable.BLOOM_HASHES
        assert all(0 <= p < ManifestTable.BLOOM_BITS for p in pos)
