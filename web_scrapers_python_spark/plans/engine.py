"""The crawl engine: one DataFrame job per scheduling round, snapshot
checkpoints between rounds (SURVEY §3.1 Spark lifecycle, §2.10 E3/E5).

Per round r (all declarative; Catalyst/AQE pick physical strategies):

  frontier(pending) ─ robots split (broadcast host_policy)
      → per-host politeness top-B (salted window, W2)
      → fetch = inner join pages ⋈ broadcast(scheduled)   (J4)
      → phase split on label (E2): discover | parse
      → discover: link expansion (E1) → first-wins (J2)
                  → bloom + exact anti-join vs seen (J1)
                  → deterministic seq assignment (O1)
      → parse: parser dispatch (F9/P3) → pandas-UDF parsers (P1)
               → AI analysis stage (P4/P5)
      → writes: articles append, seen merge (J3), frontier state,
                round_metrics (A1/A4) → atomic round commit (E5)

The reference's orchestrator (orchestrator.py:419-497) collapses into
``run``'s while-loop; K8s job retries (375-405) become the
``retry_count < max_retries`` re-queue of failed fetches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import links as L
from ..operators import parse as P
from ..operators import politeness as W
from ..operators.sequence import assign_global_seq
from ..sources.catalog import SnapshotCatalog

FRONTIER_COLS = [
    "url", "url_hash", "host", "host_bucket", "depth", "priority",
    "parser", "label", "discovered_from", "seq", "round", "state",
    "retry_count",
]

SEEN_SCHEMA = ("url_hash string, url string, host_bucket int, "
               "first_round int, last_round int, scrape_count int, "
               "status string")


@dataclass
class CrawlConfig:
    n_buckets: int = 64          # host buckets (partitioning + bloom layout)
    default_budget: int = W.DEFAULT_BUDGET
    order: str = "fifo"          # 'fifo' (reference parity) | 'priority' (W1)
    n_salts: int = 0             # >0 → salted two-stage politeness window
    use_bloom: bool = False      # bloom pre-filter before exact anti-join
    bloom_capacity: int = 100_000  # per-bucket sizing headroom for the
                                   # incremental filter merge (10^10
                                   # design point: ~2e7 per bucket)
    rediscover: bool = False     # False = reference two-phase routing
    max_retries: int = 3         # orchestrator.py:64
    max_depth: int | None = None
    max_rounds: int = 100
    # J4 physical strategy: broadcast the scheduled batch into the pages
    # join only while it is provably small. Beyond the threshold the
    # hint is dropped and AQE picks the join from runtime stats (on a
    # real warehouse: sort-merge against the url_hash-bucketed pages
    # table, no pages shuffle). An unconditional broadcast of a
    # budget x hosts batch OOMs the driver at the 10^10 design point.
    fetch_broadcast_rows: int = 1_000_000

    def order_by(self) -> list:
        if self.order == "priority":
            return [F.col("priority").desc(), F.col("depth").asc(),
                    F.col("seq").asc()]
        return [F.col("seq").asc()]


class CrawlEngine:
    def __init__(self, spark: SparkSession, pages: DataFrame,
                 host_policy: DataFrame, catalog: SnapshotCatalog,
                 config: CrawlConfig | None = None):
        self.spark = spark
        self.pages = pages
        self.host_policy = host_policy
        self.catalog = catalog
        self.cfg = config or CrawlConfig()

    # -- bootstrap -----------------------------------------------------------
    def bootstrap(self, seeds: DataFrame) -> None:
        """seeds: (url, label, parser, priority, seq) in file order.
        Seeds enter the frontier at depth 0 and the seen set at enqueue
        time (crawlee uniqueKey semantics, J2)."""
        f = (
            L.with_url_identity(seeds, self.cfg.n_buckets)
            .withColumn("depth", F.lit(0))
            .withColumn("discovered_from", F.lit(None).cast("string"))
            .withColumn("round", F.lit(0))
            .withColumn("state", F.lit("pending"))
            .withColumn("retry_count", F.lit(0))
            .select(*FRONTIER_COLS)
        )
        f = D.first_wins(f, "url_hash", "seq")
        fs = self.catalog.write_snapshot("frontier", f, {"round": -1})
        # derive seen from the *written* frontier snapshot — the seeds
        # decode/identity/dedup chain runs once, not once per write
        seen = self.catalog.read("frontier").select(
            "url_hash", "url", "host_bucket",
            F.lit(0).alias("first_round"), F.lit(0).alias("last_round"),
            F.lit(0).alias("scrape_count"), F.lit("pending").alias("status"),
        )
        ss = self.catalog.write_snapshot("seen", seen, {"round": -1})
        self.catalog.commit_round(-1, {"frontier": fs, "seen": ss})

    # -- one round -------------------------------------------------------------
    def run_round(self, r: int) -> dict:
        import time as _time
        _t0 = _time.time()
        _tm: dict[str, float] = {}

        def _mark(key: str) -> None:
            nonlocal _t0
            now = _time.time()
            _tm[key] = round(now - _t0, 3)
            _t0 = now

        cfg = self.cfg
        frontier = self.catalog.read("frontier")
        seen = self.catalog.read("seen")
        max_seq = frontier.agg(F.max("seq")).collect()[0][0] or 0
        _mark("t_read_state")

        pending = frontier.where(F.col("state") == "pending")
        if cfg.max_depth is not None:
            pending = pending.where(F.col("depth") <= cfg.max_depth)

        allowed, blocked = W.apply_robots(pending, self.host_policy)
        blocked = blocked.cache()
        scheduled = W.schedule_per_host(
            allowed, self.host_policy, cfg.order_by(),
            cfg.default_budget, cfg.n_salts,
        ).select(*FRONTIER_COLS).cache()

        # J4: pages ⋈ broadcast(scheduled) inner, split per phase BEFORE
        # the join so each branch streams html straight from the pages
        # cache into its UDF. html is NEVER cached or shuffled — caching
        # the joined rows would double-buffer the whole fetched payload
        # (memory-eviction thrash that also destroys core scaling); only
        # the narrow key set materializes. Misses (scheduled URLs absent
        # from the corpus) come from a key-level anti-join.
        is_parse = F.col("label") == "PARSE"
        is_discover = F.col("label").isNotNull() & ~is_parse
        sched_parse = scheduled.where(is_parse)
        sched_discover = scheduled.where(is_discover)

        # size-gate the broadcast: scheduled is already cached, so the
        # count is a cheap metadata-ish job and doubles as the batch-size
        # signal the metrics layer wants anyway
        n_scheduled_rows = scheduled.count()
        _bcast = (F.broadcast if n_scheduled_rows <= cfg.fetch_broadcast_rows
                  else (lambda df: df))

        page_urls = self.pages.select("url")
        fetched = page_urls.join(
            _bcast(scheduled.select("url", "url_hash")), "url", "inner"
        ).select("url_hash").cache()
        missing = scheduled.select("url_hash").join(
            _bcast(fetched), "url_hash", "left_anti")

        parse_rows = self.pages.select("url", "html").join(
            _bcast(sched_parse), "url", "inner")
        discover_rows = self.pages.select("url", "html").join(
            _bcast(sched_discover), "url", "inner")

        # P3/P1: parser dispatch + parse. Reference routing parses only
        # label='PARSE' rows (routes.py:61-100); label-null rows are
        # fetched but neither discovered-from nor parsed (routes.py:33-39).
        parse_eff = parse_rows.withColumn(
            "parser", P.U.select_parser_id(F.col("url"), F.col("parser"))
        ).where(F.col("parser").isNotNull())
        articles = P.parse_articles(parse_eff, analyze=True) \
                    .withColumn("round", F.lit(r))
        # WeiboPost is a distinct schema in the reference (weibo.py:15-24
        # incl. engagement metrics); persist it as its own table. The
        # weibo subset is tiny (~5% of pages) so the re-parse is noise.
        weibo_posts = (
            parse_eff.where(F.col("parser") == "weibo")
            .withColumn("_w", P.parse_weibo_udf(F.col("html"), F.col("url")))
            .where(F.col("_w.ok").isNotNull())
            .select(
                F.col("url"),
                F.col("_w.id").alias("id"),
                F.col("_w.author").alias("author"),
                F.col("_w.content").alias("content"),
                F.col("_w.likes").alias("likes"),
                F.col("_w.reposts").alias("reposts"),
                F.col("_w.comments").alias("comments"),
            ).withColumn("round", F.lit(r))
        )

        # E1: link expansion from discover rows
        children = L.expand_links(discover_rows, cfg.n_buckets,
                                  cfg.rediscover)
        children = D.first_wins(
            children.withColumn(
                "seq", F.col("parent_seq") * 1024 + F.col("pos")
            ),
            "url_hash", "seq",
        ).cache()
        # Seen-filter maintenance is INCREMENTAL: the per-bucket blooms
        # are read from the previous round's snapshot and only this
        # round's inserts are OR-ed in (O(delta), not O(seen) — a full
        # rebuild per round would scan the entire 10^10 seen set). The
        # full build runs once (first bloom round / resume from a
        # pre-filter snapshot); overgrown buckets degrade to the exact
        # path until a rebuild.
        filters = None
        if cfg.use_bloom:
            if self.catalog.current_snapshot("seen_filters"):
                filters = self.catalog.read("seen_filters")
            else:
                filters = D.build_bloom_filters(
                    seen, "url_hash", "host_bucket",
                    capacity=cfg.bloom_capacity)
        fresh = D.dedup_against_seen(children, seen, filters)
        fresh = assign_global_seq(
            fresh.drop("seq"), ["parent_seq", "pos"], start=max_seq + 1
        )
        # cached: consumed twice (frontier union + seen inserts) — the
        # dedup + global-seq chain must not run once per write
        fresh_frontier = fresh.select(
            "url", "url_hash", "host", "host_bucket", "depth", "priority",
            "parser", "label", "discovered_from", "seq",
            F.lit(r + 1).alias("round"), F.lit("pending").alias("state"),
            F.lit(0).alias("retry_count"),
        ).cache()

        # frontier state transitions
        fetched_keys = fetched.select("url_hash").withColumn("_new", F.lit("fetched"))
        missing_keys = missing.select("url_hash").withColumn("_new", F.lit("fetch_failed"))
        blocked_keys = blocked.select("url_hash").withColumn("_new", F.lit("robots_blocked"))
        transitions = fetched_keys.unionByName(missing_keys).unionByName(blocked_keys)
        new_frontier = (
            frontier.join(transitions, "url_hash", "left")
            .withColumn(
                "retry_count",
                F.when(F.col("_new") == "fetch_failed",
                       F.col("retry_count") + 1).otherwise(F.col("retry_count")),
            )
            .withColumn(
                "state",
                F.when(F.col("_new").isNull(), F.col("state"))
                .when((F.col("_new") == "fetch_failed")
                      & (F.col("retry_count") < cfg.max_retries), "pending")
                .when(F.col("_new") == "fetch_failed", "failed")
                .otherwise(F.col("_new")),
            )
            .drop("_new")
            .select(*FRONTIER_COLS)
            .unionByName(fresh_frontier)
        )

        # J3: seen MERGE — update fetched rows, insert fresh children
        upd = fetched.select("url_hash").withColumn("_f", F.lit(1))
        seen_updated = (
            seen.join(upd, "url_hash", "left")
            .withColumn("last_round",
                        F.when(F.col("_f").isNotNull(), F.lit(r))
                        .otherwise(F.col("last_round")))
            .withColumn("scrape_count",
                        F.when(F.col("_f").isNotNull(),
                               F.col("scrape_count") + 1)
                        .otherwise(F.col("scrape_count")))
            .withColumn("status",
                        F.when(F.col("_f").isNotNull(), F.lit("scraped"))
                        .otherwise(F.col("status")))
            .drop("_f")
        )
        seen_inserts = fresh_frontier.select(
            "url_hash", "url", "host_bucket",
            F.lit(r + 1).alias("first_round"),
            F.lit(r + 1).alias("last_round"),
            F.lit(0).alias("scrape_count"), F.lit("pending").alias("status"),
        )
        new_seen = seen_updated.unionByName(seen_inserts)

        # commits (each write is one snapshot; the round tag makes the
        # group atomic-at-resume — E5)
        snaps = {}
        _mark("t_plan")
        snaps["articles"] = self.catalog.write_snapshot(
            "articles", articles, {"round": r}, mode="append")
        snaps["weibo_posts"] = self.catalog.write_snapshot(
            "weibo_posts", weibo_posts, {"round": r}, mode="append")
        _mark("t_write_articles")
        snaps["frontier"] = self.catalog.write_snapshot(
            "frontier", new_frontier, {"round": r})
        _mark("t_write_frontier")
        snaps["seen"] = self.catalog.write_snapshot(
            "seen", new_seen, {"round": r})
        if cfg.use_bloom:
            snaps["seen_filters"] = self.catalog.write_snapshot(
                "seen_filters",
                D.merge_bloom_filters(
                    filters, seen_inserts.select("host_bucket", "url_hash"),
                    capacity=cfg.bloom_capacity),
                {"round": r})
        _mark("t_write_seen")

        # A1/A4 metrics from the committed snapshots (exact, idempotent).
        # One grouped pass over transitions + one conditional agg over the
        # new frontier — not a job per counter.
        nf = self.catalog.read("frontier")
        tc = {row["_new"]: row["n"] for row in
              transitions.groupBy("_new").agg(F.count("*").alias("n"))
              .collect()}
        n_fetched = tc.get("fetched", 0)
        n_blocked = tc.get("robots_blocked", 0)
        n_sched = n_fetched + tc.get("fetch_failed", 0)
        nf_row = nf.agg(
            F.sum(F.when(F.col("state") == "pending", 1).otherwise(0))
            .alias("pending"),
            F.sum(F.when(F.col("round") == r + 1, 1).otherwise(0))
            .alias("fresh"),
        ).collect()[0]
        n_articles = self.catalog.read("articles").where(
            F.col("round") == r).count()
        n_children = children.count()
        n_fresh = int(nf_row["fresh"] or 0)
        metrics = {
            "round": r,
            "scheduled": n_sched,
            "fetched": n_fetched,
            "fetch_failed": n_sched - n_fetched,
            "robots_blocked": n_blocked,
            "articles_scraped": n_articles,
            "links_discovered": n_children,
            "links_enqueued": n_fresh,
            "duplicates_skipped": n_children - n_fresh,
            "pending_after": int(nf_row["pending"] or 0),
        }
        mdf = self.spark.createDataFrame(
            [(r, k, int(v)) for k, v in metrics.items()
             if k != "round" and not k.startswith("_")],
            "round int, metric string, value long",
        ).withColumn("round", F.lit(r))
        snaps["round_metrics"] = self.catalog.write_snapshot(
            "round_metrics", mdf, {"round": r}, mode="append")
        self.catalog.commit_round(r, snaps)
        for df in (scheduled, fetched, children, blocked, fresh_frontier):
            df.unpersist()
        _mark("t_metrics")
        metrics["_timings"] = _tm
        return metrics

    # -- loop -------------------------------------------------------------------
    def run(self, seeds: DataFrame | None = None,
            max_rounds: int | None = None) -> list[dict]:
        """E3: bootstrap (unless resuming) then rounds until the frontier
        drains. Resume = continue from the last complete round's
        snapshots — no recomputation, identical final state."""
        if seeds is not None:
            self.bootstrap(seeds)
        last = self.catalog.last_complete_round()
        start = (last["round"] + 1) if last else 0
        out = []
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        for r in range(start, start + limit):
            m = self.run_round(r)
            out.append(m)
            if m["pending_after"] == 0:
                break
        return out
