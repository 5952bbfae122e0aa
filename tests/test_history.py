"""content_history change detection (S8), quarantine/errors split, and
article store-time columns — reference semantics at
cassandra_manager.py:273-292 (insert_article), 298/314 (errors
counter), 436-464 (content history + duplicate tracking).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from web_scrapers_python_spark.operators import history as HY
from web_scrapers_python_spark.plans.engine import CrawlConfig, CrawlEngine
from web_scrapers_python_spark.sources import datagen as G
from web_scrapers_python_spark.sources.catalog import SnapshotCatalog
from web_scrapers_python_spark.sources.seeds import read_seeds

POLICY_SCHEMA = ("host string, crawl_delay double, max_per_round int, "
                 "robots_disallow array<string>")


def _stored(spark, rows):
    return spark.createDataFrame(
        rows, "url_hash string, id string, content_hash string")


class TestChangeDetection:
    def test_new_updated_duplicate_ladder(self, spark):
        """Re-scrape ladder: first store -> new; changed content ->
        updated; unchanged content -> duplicate (always vs the LATEST
        prior version)."""
        r0 = HY.content_history_delta(
            _stored(spark, [("u1", "a1", "h1"), ("u2", "a2", "h2")]),
            None, 0)
        got0 = {r["url_hash"]: r["change_type"] for r in r0.collect()}
        assert got0 == {"u1": "new", "u2": "new"}

        r1 = HY.content_history_delta(
            _stored(spark, [("u1", "a3", "h1b"),   # changed
                            ("u2", "a4", "h2"),    # unchanged
                            ("u3", "a5", "h3")]),  # first seen
            r0, 1)
        got1 = {r["url_hash"]: r["change_type"] for r in r1.collect()}
        assert got1 == {"u1": "updated", "u2": "duplicate", "u3": "new"}

        # round 2 compares against round 1's LATEST version, not round 0
        r2 = HY.content_history_delta(
            _stored(spark, [("u1", "a6", "h1b")]), r0.unionByName(r1), 2)
        assert r2.collect()[0]["change_type"] == "duplicate"

    def test_deterministic_ids_and_clock(self, spark):
        df = spark.range(1).select(
            HY.article_uuid(F.lit("abc"), 3).alias("id"),
            HY.round_timestamp(3).alias("ts"))
        row = df.collect()[0]
        # uuid shape: 8-4-4-4-12 hex
        parts = row["id"].split("-")
        assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
        assert row["ts"].hour == 3
        # stable across evaluations
        assert df.collect()[0]["id"] == row["id"]


class TestCrawlIntegration:
    @pytest.fixture(scope="class")
    def crawl(self, spark, tmp_path_factory):
        n, h, seed = 300, 16, 42
        pages = G.generate_pages(spark, n, h, seed).cache()
        policy = spark.createDataFrame(G.host_policy_rows(seed, h),
                                       POLICY_SCHEMA)
        tmp = tmp_path_factory.mktemp("hist")
        sp = tmp / "seeds.txt"
        sp.write_text("\n".join(
            json.dumps({"url": G.url_of(seed, i, h), "label": "a"})
            for i in range(10)))
        cat = SnapshotCatalog(spark, str(tmp / "wh"))
        eng = CrawlEngine(spark, pages, policy, cat, CrawlConfig())
        metrics = eng.run(read_seeds(spark, str(sp)), max_rounds=30)
        return cat, metrics

    def test_history_matches_articles(self, crawl):
        cat, _ = crawl
        arts = {(r["url_hash"], r["id"], r["content_hash"])
                for r in cat.read("articles")
                .select("url_hash", "id", "content_hash").collect()}
        hist = {(r["url_hash"], r["article_id"], r["content_hash"])
                for r in cat.read("content_history")
                .select("url_hash", "article_id", "content_hash").collect()}
        assert arts == hist and len(arts) > 0
        # single-scrape crawl: every history row is a first version
        assert {r["change_type"] for r in
                cat.read("content_history").collect()} == {"new"}

    def test_store_time_columns(self, crawl):
        cat, _ = crawl
        arts = cat.read("articles")
        for c in ("id", "scraped_at", "metadata"):
            assert c in arts.columns, c
        rows = arts.select("id", "scraped_at", "round").collect()
        assert all(r["id"] is not None for r in rows)
        assert all(r["scraped_at"].hour == r["round"] for r in rows)

    def test_errors_metric_equals_quarantine(self, crawl):
        cat, metrics = crawl
        n_quar = cat.read("quarantine").count()
        assert sum(m["errors"] for m in metrics) == n_quar
        if n_quar:
            reasons = {r["fail_reason"] for r in
                       cat.read("quarantine").collect()}
            assert reasons <= {"parse_failed", "missing_title"}


def test_injected_broken_pages_are_quarantined(spark, tmp_path):
    """Pages whose html defeats every selector are counted as errors and
    land in quarantine, not silently dropped."""
    good = ("https://host0.example.com/news/good",
            b"<html><head><title>T</title></head>"
            b"<body><h1>T</h1><div class='article-content'><p>"
            + b"word " * 60 + b"</p></div></body></html>")
    broken = [(f"https://host0.example.com/news/broken-{i}",
               b"<html><body><span>no title no content</span></body></html>")
              for i in range(3)]
    pages = spark.createDataFrame(
        [good, *broken], "url string, html binary",
    ).withColumn("warc_ts", F.current_timestamp()) \
     .withColumn("text", F.lit(None).cast("string")) \
     .withColumn("lang", F.lit("en"))
    seeds = spark.createDataFrame(
        [(u, "PARSE", "generic-news", 0, i) for i, (u, _) in
         enumerate([good, *broken])],
        "url string, label string, parser string, priority int, seq long")
    policy = spark.createDataFrame(
        [("host0.example.com", 0.0, 100, [])], POLICY_SCHEMA)
    cat = SnapshotCatalog(spark, str(tmp_path))
    eng = CrawlEngine(spark, pages, policy, cat, CrawlConfig())
    metrics = eng.run(seeds, max_rounds=3)
    assert sum(m["errors"] for m in metrics) == 3
    quar = cat.read("quarantine").collect()
    assert len(quar) == 3
    assert all(r["fail_reason"] == "parse_failed" for r in quar)
    assert cat.read("articles").count() == 1


class TestSeedFallback:
    SCHEMA = ("url string, label string, parser string, priority int, "
              "seq long, status string")

    def test_db_first_file_fallback(self, spark, tmp_path):
        from web_scrapers_python_spark.sources.seeds import (
            read_seeds, seeds_with_fallback)
        sp = tmp_path / "seeds.txt"
        sp.write_text('{"url": "https://a.example.com/1", "label": "a"}\n'
                      '{"url": "https://a.example.com/2", "label": "a"}\n')
        cat = SnapshotCatalog(spark, str(tmp_path / "wh"))

        # missing table -> file
        got = seeds_with_fallback(spark, cat, str(sp))
        assert got.count() == 2

        # empty table -> file
        cat.write_snapshot("seeds", spark.createDataFrame([], self.SCHEMA))
        got = seeds_with_fallback(spark, cat, str(sp))
        assert got.count() == 2

        # populated table wins; inactive filtered; limit = top priority
        cat.write_snapshot("seeds", spark.createDataFrame(
            [("https://db.example.com/lo", "a", None, 1, 0, "active"),
             ("https://db.example.com/hi", "a", None, 9, 1, "active"),
             ("https://db.example.com/off", "a", None, 99, 2, "disabled")],
            self.SCHEMA))
        got = seeds_with_fallback(spark, cat, str(sp), limit=1).collect()
        assert [r["url"] for r in got] == ["https://db.example.com/hi"]


def test_latest_content_versions(spark):
    rows = [("u1", 0, "a1", "h1", "new"), ("u1", 2, "a3", "h2", "updated"),
            ("u1", 1, "a2", "h1", "duplicate"), ("u2", 0, "a4", "h9", "new")]
    hist = spark.createDataFrame(
        [(u, HY.round_timestamp(r), r, a, c, t)
         for u, r, a, c, t in rows][0:0],  # schema only; rebuild below
        "url_hash string, scraped_at timestamp, round int, "
        "article_id string, content_hash string, change_type string")
    hist = spark.createDataFrame(
        [(u, None, r, a, c, t) for u, r, a, c, t in rows], hist.schema)
    got = {r["url_hash"]: (r["round"], r["content_hash"]) for r in
           HY.latest_content_versions(hist).collect()}
    assert got == {"u1": (2, "h2"), "u2": (0, "h9")}


def test_catalog_compact_append_table(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    for r in range(4):
        df = spark.createDataFrame([(r, f"v{r}")], "k int, v string")
        cat.write_snapshot("t", df, {"round": r}, mode="append")
    pre = cat.current_snapshot("t")
    assert len(pre["paths"]) == 4
    sid = cat.compact("t")
    cur = cat.current_snapshot("t")
    assert len(cur["paths"]) == 1 and cur["id"] == sid
    assert {tuple(r) for r in cat.read("t").collect()} == {
        (r, f"v{r}") for r in range(4)}
    # old snapshot still time-travelable
    assert cat.read("t", snapshot_id=1).count() == 2


class TestRecrawlTTL:
    def test_refresh_cohorts_and_change_ladder(self, spark, tmp_path):
        """recrawl_ttl=2: round r re-enqueues the cohort fetched at
        r-2. Re-fetches of unchanged pages store duplicate versions;
        after swapping page content the next refresh stores updated."""
        n, h, seed = 120, 8, 42
        pages = G.generate_pages(spark, n, h, seed).cache()
        policy = spark.createDataFrame(G.host_policy_rows(seed, h),
                                       POLICY_SCHEMA)
        sp = tmp_path / "seeds.txt"
        sp.write_text("\n".join(
            json.dumps({"url": G.url_of(seed, i, h), "label": "a"})
            for i in range(6)))
        cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
        cfg = CrawlConfig(recrawl_ttl=2)
        eng = CrawlEngine(spark, pages, policy, cat, cfg)
        ms = eng.run(read_seeds(spark, str(sp)), max_rounds=4)
        # rounds: 0 discover, 1 parse, 2 re-enqueue round-0 cohort,
        # 3 re-enqueue round-1 cohort (the parsed articles)
        assert len(ms) == 4
        assert ms[2]["recrawl_enqueued"] == ms[0]["fetched"]
        assert ms[3]["recrawl_enqueued"] == ms[1]["fetched"]
        hist = cat.read("content_history")
        by_type = {r["change_type"]: r["n"] for r in
                   hist.groupBy("change_type").agg(
                       F.count("*").alias("n")).collect()}
        n_first = ms[1]["articles_scraped"]
        assert by_type.get("new") == n_first
        # identical pages re-stored -> duplicate versions
        assert by_type.get("duplicate") == ms[3]["articles_scraped"]
        assert "updated" not in by_type
        # seen merge: re-fetched urls have scrape_count 2
        from web_scrapers_python_spark.plans.engine import merged_seen
        sc = merged_seen(cat.read("seen")).where(F.col("scrape_count") >= 2)
        assert sc.count() == ms[2]["fetched"] + ms[3]["fetched"]
        # status ladder (url_tracker parity): a PARSE-labeled re-store
        # whose content hash matched the stored version is marked
        # 'duplicate' (cassandra_manager.py:454-464) — exactly the
        # round-3 re-stored articles; everything else fetched stays
        # 'scraped'
        st = {r["url"]: r["status"] for r in
              merged_seen(cat.read("seen"))
              .select("url", "status").collect()}
        dup_urls = {r["url_hash"] for r in
                    cat.read("content_history")
                    .where(F.col("change_type") == "duplicate")
                    .select("url_hash").collect()}
        by_hash = {r["url_hash"]: r["status"] for r in
                   merged_seen(cat.read("seen"))
                   .select("url_hash", "status").collect()}
        assert dup_urls, "re-crawl produced no duplicate stores"
        assert all(by_hash[h] == "duplicate" for h in dup_urls)
        assert sum(1 for s in st.values() if s == "duplicate") == \
            len(dup_urls)

        # now the site changes: same warehouse, page BODIES mutated
        # (word swap inside extracted content; hrefs/urls untouched)
        dup_before = by_type.get("duplicate", 0)
        pages2 = pages.withColumn(
            "html", F.encode(F.regexp_replace(
                F.decode(F.col("html"), "UTF-8"),
                "study", "revised"), "UTF-8"))
        eng2 = CrawlEngine(spark, pages2, policy, cat, cfg)
        eng2.run_round(4)        # re-enqueues round-2 cohort (discover)
        m5 = eng2.run_round(5)   # re-enqueues round-3 cohort (parse)
        assert m5["recrawl_enqueued"] == ms[3]["fetched"]
        by_type2 = {r["change_type"]: r["n"] for r in
                    cat.read("content_history").groupBy("change_type")
                    .agg(F.count("*").alias("n")).collect()}
        n_upd = by_type2.get("updated", 0)
        n_dup5 = by_type2.get("duplicate", 0) - dup_before
        assert n_upd > 0                      # real change detected
        assert n_upd + n_dup5 == m5["articles_scraped"]
        # latest version per changed url is the round-5 'updated' store
        latest = HY.latest_content_versions(cat.read("content_history"))
        assert latest.where(F.col("change_type") == "updated").count() \
            == n_upd
        # ladder latest-write-wins: a LATER changed-content store
        # overwrites a 'duplicate' status back to 'scraped', exactly as
        # the reference's tracker row is overwritten on each store;
        # urls whose latest store was again a duplicate stay duplicate
        from web_scrapers_python_spark.plans.engine import merged_seen
        st2 = {r["url_hash"]: r["status"] for r in
               merged_seen(cat.read("seen"))
               .select("url_hash", "status").collect()}
        lat = {r["url_hash"]: r["change_type"] for r in latest.collect()}
        for h, ct in lat.items():
            assert st2[h] == ("duplicate" if ct == "duplicate"
                              else "scraped"), (h, ct)
