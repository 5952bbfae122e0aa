"""Unit tests for the partitioned bloom filters: build, incremental
merge (no false negatives ever), degrade-on-overflow sentinel, and the
composite dedup invariant (bloom + exact == exact)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_scrapers_python_spark.operators import dedup as D


def _keys_df(spark, items):
    return spark.createDataFrame(
        [(b, k) for b, k in items], "host_bucket int, url_hash string")


def _probe(filters_rows, bucket, key):
    """Pure-python probe replaying the UDF logic."""
    import numpy as np
    row = filters_rows.get(bucket)
    if row is None:
        return False
    m, k = row["n_bits"], row["n_hashes"]
    if m == 0:
        return True
    bits = np.frombuffer(row["filter"], dtype=np.uint8)
    return all((bits[p >> 3] >> (p & 7)) & 1
               for p in D._positions(key, m, k))


def _collect(filters):
    return {r["host_bucket"]: r.asDict() for r in filters.collect()}


class TestIncrementalBloom:
    def test_merge_no_false_negatives(self, spark):
        base = [(b, f"k{b}-{i}") for b in range(3) for i in range(50)]
        f0 = D.build_bloom_filters(_keys_df(spark, base), capacity=1000)
        delta1 = [(b, f"n{b}-{i}") for b in range(3) for i in range(30)]
        f1 = D.merge_bloom_filters(f0, _keys_df(spark, delta1), capacity=1000)
        delta2 = [(1, f"m-{i}") for i in range(20)] + [(5, "fresh-bucket")]
        f2 = D.merge_bloom_filters(f1, _keys_df(spark, delta2), capacity=1000)
        rows = _collect(f2)
        for b, k in base + delta1 + delta2:
            assert _probe(rows, b, k), (b, k)
        assert rows[5]["n_items"] == 1          # bucket born in the merge
        assert rows[0]["n_items"] == 80

    def test_unseen_keys_mostly_miss(self, spark):
        base = [(0, f"k{i}") for i in range(200)]
        f = D.build_bloom_filters(_keys_df(spark, base), capacity=1000)
        rows = _collect(f)
        fp = sum(_probe(rows, 0, f"unseen-{i}") for i in range(500))
        assert fp < 25                           # ~1% target, generous bound

    def test_overflow_degrades_to_sentinel(self, spark):
        base = [(0, f"k{i}") for i in range(40)]
        f0 = D.build_bloom_filters(_keys_df(spark, base), capacity=40)
        big = [(0, f"x{i}") for i in range(5000)]
        f1 = D.merge_bloom_filters(f0, _keys_df(spark, big), capacity=40)
        rows = _collect(f1)
        assert rows[0]["n_bits"] == 0            # degraded
        assert rows[0]["n_items"] == 5040
        # degraded bucket: every probe is a suspect (exact join decides)
        assert _probe(rows, 0, "anything")
        # and further merges keep the sentinel
        f2 = D.merge_bloom_filters(f1, _keys_df(spark, [(0, "y")]),
                                   capacity=40)
        assert _collect(f2)[0]["n_bits"] == 0

    def test_composite_dedup_equals_exact(self, spark):
        seen = _keys_df(spark, [(i % 4, f"s{i}") for i in range(100)])
        filters = D.build_bloom_filters(seen, capacity=64)  # undersized → FPs
        cand = _keys_df(spark, [(i % 4, f"s{i}") for i in range(50, 150)]
                        + [(9, "brand-new")])
        got = sorted(r["url_hash"] for r in
                     D.dedup_against_seen(cand, seen, filters).collect())
        want = sorted(r["url_hash"] for r in
                      D.anti_join_seen(cand, seen).collect())
        assert got == want

    def test_flag_mode_marks_instead_of_filtering(self, spark):
        """flag_col mode: every candidate row survives exactly once
        (even when the seen EVENT LOG repeats a key) and the flag
        partition reproduces the filtering composite exactly — with
        and without bloom filters."""
        # seen log with duplicate events per key (insert + fetch)
        seen = _keys_df(spark, [(i % 4, f"s{i}") for i in range(100)] * 2)
        cand = _keys_df(spark, [(i % 4, f"s{i}") for i in range(50, 150)]
                        + [(9, "brand-new")])
        want_fresh = sorted(r["url_hash"] for r in
                            D.anti_join_seen(cand, seen).collect())
        want_all = sorted(r["url_hash"] for r in cand.collect())
        for filters in (None,
                        D.build_bloom_filters(
                            seen.distinct(), capacity=64)):  # FP-prone
            marked = D.dedup_against_seen(cand, seen, filters,
                                          flag_col="_fresh").collect()
            assert sorted(r["url_hash"] for r in marked) == want_all
            assert sorted(r["url_hash"] for r in marked
                          if r["_fresh"]) == want_fresh
