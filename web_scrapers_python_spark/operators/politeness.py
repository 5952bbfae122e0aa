"""Per-host politeness scheduling (SURVEY §2.5 W2, §2.10 E6).

Reference analog: global ``max_concurrency=2`` (main.py:73-75) and the
orchestrator's per-job cap (orchestrator.py:239-240). The north rule
generalizes this to a per-host budget from a broadcast host-policy
table plus robots rules (net-new; the reference has no robots handling).

Skew: Common-Crawl hosts are Zipfian, so ``Window.partitionBy(host)``
alone hot-spots one task per hot host. We pre-aggregate with a salted
two-stage top-k: stage 1 takes the per-(host, salt) top-B (parallel
across salts), stage 2 the exact per-host top-B over the ≤ B×S
survivors — same result as a single window, bounded skew (SURVEY §4.2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2  # reference MAX_CONCURRENCY, main.py:73-75


def robots_allowed(url: Column, disallow: Column) -> Column:
    """True iff no robots_disallow prefix matches the URL path."""
    path = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*", "")
    return (
        disallow.isNull()
        | (F.size(disallow) == 0)
        | ~F.exists(disallow, lambda p: path.startswith(p))
    )


def apply_robots(frontier: DataFrame, host_policy: DataFrame) -> DataFrame:
    """Split candidates into (allowed, blocked) by broadcast host policy."""
    joined = frontier.join(
        F.broadcast(host_policy.select("host", "robots_disallow")),
        "host", "left",
    )
    allowed = robots_allowed(F.col("url"), F.col("robots_disallow"))
    return (
        joined.where(allowed).drop("robots_disallow"),
        joined.where(~allowed).drop("robots_disallow"),
    )


def _order_cols(order_by: list) -> list:
    return [c if not isinstance(c, str) else F.col(c) for c in order_by]


def schedule_per_host(candidates: DataFrame, host_policy: DataFrame,
                      order_by: list | None = None,
                      default_budget: int = DEFAULT_BUDGET,
                      n_salts: int = 0,
                      max_budget: int | None = None) -> DataFrame:
    """Top-budget-per-host selection of this round's fetch batch.

    order_by defaults to FIFO (``seq`` asc) for reference parity; the
    priority-frontier mode passes [desc('priority'), 'depth', 'seq']
    (W1/W2). With n_salts>0 the salted two-stage plan is used.

    ``max_budget`` (any upper bound on every host's budget — e.g.
    max(host_policy.max_per_round, default)) is load-bearing at scale:
    a LITERAL rank cap lets Catalyst insert a *partial* WindowGroupLimit
    below the exchange, so each map partition forwards at most
    max_budget rows per host instead of its whole frontier slice. The
    per-host window then shuffles O(hosts x max_budget) rows, not
    O(pending) — this is what keeps scheduling cost flat as the pending
    queue grows (verified in PLANS.md: `WindowGroupLimit ... Partial`
    above the exchange). The exact per-host column budget still applies
    after the window, so results are identical for any valid bound."""
    order = _order_cols(order_by or ["seq"])
    budgeted = candidates.join(
        F.broadcast(host_policy.select("host", "max_per_round")), "host", "left"
    ).withColumn(
        "_budget", F.coalesce(F.col("max_per_round"), F.lit(default_budget))
    ).drop("max_per_round")
    # Budget-starved rows (hosts at max_per_round <= 0 this round) can
    # never satisfy ``cap`` (row_number >= 1 > 0 >= _budget), so drop
    # them map-side BEFORE any window: a backlog parked on zero-budget
    # hosts costs a scan+filter, never a shuffle. At the design point
    # (10^10 frontier, most pending rows waiting on politeness) this is
    # the difference between shuffling O(pending) and O(eligible).
    budgeted = budgeted.where(F.col("_budget") > 0)

    def cap(rank_col: Column) -> Column:
        exact = rank_col <= F.col("_budget")
        if max_budget is not None:
            return (rank_col <= F.lit(int(max_budget))) & exact
        return exact

    if n_salts > 0:
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(n_salts))
        stage1 = Window.partitionBy(F.col("host"), salt).orderBy(*order)
        budgeted = (
            budgeted.withColumn("_rn1", F.row_number().over(stage1))
            .where(cap(F.col("_rn1")))
            .drop("_rn1")
        )
    w = Window.partitionBy("host").orderBy(*order)
    return (
        budgeted.withColumn("_rn", F.row_number().over(w))
        .where(cap(F.col("_rn")))
        .drop("_rn", "_budget")
    )
