"""Article store-time semantics: content version history with change
detection, and the store-time columns of the articles table (S8).

Reference parity:
- ``content_history`` rows are (url_hash, scraped_at, article_id,
  content_hash, change_type), appended once per stored article
  (cassandra_manager.py:436-452; DDL at 184-193 clusters by
  ``scraped_at DESC`` so the latest version reads first — here the
  per-url latest is a max-round window over the append log).
- ``change_type``: 'new' for a first-ever store of the url, 'updated'
  when the re-scraped content hash differs from the latest stored
  version, 'duplicate' when it matches (the reference marks re-seen
  URLs duplicate via _update_duplicate_tracking,
  cassandra_manager.py:454-464; its DDL comment names the
  new/updated/unchanged ladder at 190).
- store-time article columns: ``id`` (the reference's uuid4 article_id,
  cassandra_manager.py:264 — made deterministic here as a uuid-shaped
  digest of (url_hash, round) so oracles and resume replays agree),
  ``scraped_at`` (store timestamp, deterministic round clock), and
  ``metadata`` MAP<STRING,STRING> (stored empty, exactly as the
  reference passes {} at cassandra_manager.py:288).

Scale: the change-detection join prunes the history side to this
round's url_hashes with a semi-join BEFORE the latest-version window,
so the (ever-growing) history log is scanned on two columns but only
the round-delta subset is shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic round clock: epoch of 2024-01-01T00:00:00Z + 1h/round
ROUND_EPOCH = 1_704_067_200

HISTORY_COLS = ["url_hash", "scraped_at", "round", "article_id",
                "content_hash", "change_type"]


def round_timestamp(r) -> F.Column:
    return F.timestamp_seconds(F.lit(ROUND_EPOCH) + F.lit(r) * 3600)


def article_uuid(url_hash, r) -> F.Column:
    """uuid-shaped deterministic id from (url_hash, round) — stands in
    for the reference's uuid4 (cassandra_manager.py:264) so replays and
    oracles are stable."""
    h = F.sha2(F.concat_ws(":", url_hash, F.lit(r).cast("string")), 256)
    return F.concat_ws(
        "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
        F.substring(h, 13, 4), F.substring(h, 17, 4), F.substring(h, 21, 12))


def with_store_columns(articles: DataFrame, r: int) -> DataFrame:
    """Add the reference's store-time columns (insert_article binding,
    cassandra_manager.py:273-292): id, scraped_at, metadata."""
    return (
        articles
        .withColumn("id", article_uuid(F.col("url_hash"), r))
        .withColumn("scraped_at", round_timestamp(r))
        .withColumn("metadata",
                    F.map_from_arrays(F.array().cast("array<string>"),
                                      F.array().cast("array<string>")))
    )


def content_history_delta(stored: DataFrame, prior: DataFrame | None,
                          r: int) -> DataFrame:
    """History rows for this round's stored articles.

    stored: (url_hash, id, content_hash) — this round's articles.
    prior:  the content_history log up to the previous round (None on
    the first store round). change_type compares against the LATEST
    prior version per url_hash."""
    cur = stored.select(
        "url_hash", F.col("id").alias("article_id"), "content_hash")
    if prior is None:
        prev = cur.select("url_hash",
                          F.lit(None).cast("string").alias("_prev_hash"),
                          F.lit(None).cast("int").alias("_has_prev")) \
                  .limit(0)
    else:
        w = Window.partitionBy("url_hash").orderBy(
            F.col("round").desc(), F.col("article_id").desc())
        prev = (
            prior.select("url_hash", "round", "article_id", "content_hash")
            # prune the big log to this round's keys before any shuffle
            .join(cur.select("url_hash"), "url_hash", "left_semi")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("url_hash", F.col("content_hash").alias("_prev_hash"),
                    F.lit(1).alias("_has_prev"))
        )
    # _has_prev distinguishes "no prior version" from "prior version
    # with a NULL content hash" (weibo posts may store null content);
    # the hash comparison itself is null-safe for the same reason.
    return (
        cur.join(prev, "url_hash", "left")
        .withColumn(
            "change_type",
            F.when(F.col("_has_prev").isNull(), "new")
            .when(F.col("_prev_hash").eqNullSafe(F.col("content_hash")),
                  "duplicate")
            .otherwise("updated"))
        .withColumn("scraped_at", round_timestamp(r))
        .withColumn("round", F.lit(r))
        .select(*HISTORY_COLS)
    )


def latest_content_versions(history: DataFrame) -> DataFrame:
    """W3 over the history log: the latest stored version per url_hash
    (the read path the reference's ``scraped_at DESC`` clustering
    serves, cassandra_manager.py:184-193)."""
    w = Window.partitionBy("url_hash").orderBy(
        F.col("round").desc(), F.col("article_id").desc())
    return (
        history.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).drop("_rn")
    )
