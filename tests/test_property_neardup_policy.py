"""Hypothesis property tests for the near-dup ingest survivor policy
(operators/dedup.py:neardup_survivor_bands) against a brute-force
Python reference over arbitrary small band tables — hashing is not
involved, so the policy itself (history-wins + greedy bucket-min) is
checked exhaustively rather than via planted examples."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pubg_data_pipeline_spark.operators.dedup import neardup_survivor_bands

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (doc, band_idx, band_key) rows over tiny id/bucket spaces so
# collisions actually happen; dedupe rows (the real band table emits
# one row per (doc, band_idx)).
_BANDS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=1,
    max_size=24,
    unique=True,
)


def _reference(batch_rows, index_rows):
    """Brute-force reference: drop docs sharing any bucket with the
    index; then drop docs that are not the bucket-min in every
    remaining bucket they occupy."""
    index_keys = {(b, k) for _, b, k in index_rows}
    hist_clean = {
        d
        for d, _, _ in batch_rows
        if not any((b, k) in index_keys for dd, b, k in batch_rows if dd == d)
    }
    rows = [(d, b, k) for d, b, k in batch_rows if d in hist_clean]
    bucket_min = {}
    for d, b, k in rows:
        bucket_min[(b, k)] = min(bucket_min.get((b, k), d), d)
    survivors = {
        d
        for d, _, _ in rows
        if all(bucket_min[(b, k)] == d for dd, b, k in rows if dd == d)
    }
    return {(d, b, k) for d, b, k in rows if d in survivors}


@given(batch=_BANDS, index=_BANDS)
@_SETTINGS
def test_policy_matches_reference_and_invariants(spark, batch, index):
    bt = spark.createDataFrame(batch, "doc long, band_idx int, band_key long")
    idx = spark.createDataFrame(index, "doc long, band_idx int, band_key long")
    got = {(r.doc, r.band_idx, r.band_key) for r in neardup_survivor_bands(bt, idx).collect()}
    assert got == _reference(batch, index)

    # Invariants the policy guarantees (what makes the index sound):
    survivors = {d for d, _, _ in got}
    # 1. no two survivors share a bucket — so (band_idx, band_key) is
    #    unique among appended index rows from a single batch
    buckets = [(b, k) for _, b, k in got]
    assert len(buckets) == len(set(buckets))
    # 2. a survivor keeps its FULL band set (rows are a subset of the
    #    batch restricted to surviving docs, nothing partial)
    assert got == {(d, b, k) for d, b, k in batch if d in survivors}
    # 3. every dropped doc shares >=1 bucket with the index or with a
    #    strictly smaller batch doc (there is always a reason)
    batch_docs = {d for d, _, _ in batch}
    index_keys = {(b, k) for _, b, k in index}
    for d in batch_docs - survivors:
        mine = {(b, k) for dd, b, k in batch if dd == d}
        smaller = {(b, k) for dd, b, k in batch if dd < d}
        assert mine & (index_keys | smaller)


@given(batch=_BANDS)
@_SETTINGS
def test_policy_without_history_matches_reference(spark, batch):
    bt = spark.createDataFrame(batch, "doc long, band_idx int, band_key long")
    got = {(r.doc, r.band_idx, r.band_key) for r in neardup_survivor_bands(bt, None).collect()}
    assert got == _reference(batch, [])
