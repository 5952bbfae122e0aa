"""Bucketed warehouse tables — the co-located-join scale path.

The snapshot catalog (catalog.py) models Iceberg's commit protocol; this
module models the other half of the warehouse story: hash-bucketed
storage so the hot join of every crawl round — scheduled batch ⋈ pages
corpus on ``url_hash`` — runs WITHOUT shuffling the corpus. At the
10^10-page design point the pages table is written once, bucketed by
``url_hash`` into O(10^3-10^4) buckets; each round's fetch join then
only sorts within matching buckets (Spark reads bucketed tables with a
compatible output partitioning, so the Exchange on both sides is
elided — verified by ``tests/test_sharding.py::TestBucketedJoin``
asserting the physical plan has zero ShuffleExchange).

Local-mode caveat (documented, not hidden): Spark persists bucketing
metadata through ``saveAsTable``; with the sandbox's in-memory catalog
the table registration is session-scoped while the files persist at
``path``. On a real deployment the same calls go against a Hive/Glue/
Iceberg catalog and the metadata is durable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, path: str,
                   key: str = "url_hash", n_buckets: int = 64,
                   mode: str = "overwrite") -> None:
    """Write ``df`` hash-bucketed (and in-bucket sorted) by ``key``.
    Sorting by the join key lets the sort-merge join skip its sort on
    the stored side entirely (plan shows no Sort below the scan)."""
    (df.write.mode(mode)
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .option("path", path)
     .saveAsTable(name))


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table by name (bucket metadata comes from the
    catalog entry, which is what enables exchange elision)."""
    return spark.table(name)
