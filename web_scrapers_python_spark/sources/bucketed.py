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

Sort elision requires TWO preconditions (both handled here/at the call
site): the writer lays out one file per bucket (repartition by the
bucket hash before bucketBy), and the session sets
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — Spark 3+
stopped propagating bucketed sortBy ordering by default, so without
the conf every bucketed join silently re-sorts the stored side.

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
    the stored side entirely (plan shows no Sort below the scan) — but
    Spark only trusts the sortBy metadata when each bucket is ONE
    file, so the writer first co-locates each bucket's rows in one
    task (repartition by the same hash the bucketing uses). This is
    also the at-scale layout discipline: bucketBy from arbitrarily
    partitioned input writes files-per-bucket x tasks small files."""
    from pyspark.sql import functions as F

    (df.repartition(n_buckets, F.col(key))
     .write.mode(mode)
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .option("path", path)
     .saveAsTable(name))


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table by name (bucket metadata comes from the
    catalog entry, which is what enables exchange elision)."""
    return spark.table(name)
