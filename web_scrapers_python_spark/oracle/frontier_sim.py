"""Pure-Python crawl simulator — the ordering/seen-set golden.

Implements the reference's frontier semantics (crawlee FIFO request
queue + first-enqueue-wins dedup, routes.py:44-57; two-phase routing,
routes.py:25-100; retry budget, orchestrator.py:375-405) under the same
round/politeness discipline as the Spark engine, on the same synthetic
corpus. The equivalence test asserts, per round, identical scheduled
URL sets, identical seq assignment, identical final seen set, and
identical article payloads (SURVEY §5.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import extract as ox
from . import reference as ref


@dataclass
class SimEntry:
    url: str
    url_hash: str
    host: str
    depth: int
    priority: int
    parser: str | None
    label: str | None
    discovered_from: str | None
    seq: int
    state: str = "pending"
    retry_count: int = 0


@dataclass
class SimResult:
    rounds: list[dict] = field(default_factory=list)
    articles: list[dict] = field(default_factory=list)
    entries: dict[str, SimEntry] = field(default_factory=dict)  # by url_hash

    @property
    def seen(self) -> set[str]:
        return set(self.entries)


def _path_of(url: str) -> str:
    host = ref.extract_domain(url)
    i = url.find(host) + len(host)
    return url[i:]


def simulate(pages: dict[str, bytes], seeds: list[dict],
             host_policy: dict[str, dict], default_budget: int = 2,
             max_retries: int = 3, max_rounds: int = 100,
             order: str = "fifo") -> SimResult:
    res = SimResult()
    next_seq = 0

    # bootstrap: seeds in file order, first-wins (J2)
    for s in seeds:
        h = ref.canonical_url_hash(s["url"])  # crawlee uniqueKey (J2)
        if h in res.entries:
            continue
        res.entries[h] = SimEntry(
            url=s["url"], url_hash=h, host=ref.extract_domain(s["url"]),
            depth=0, priority=s.get("priority") or 0,
            parser=s.get("parser"), label=s.get("label"),
            discovered_from=None, seq=next_seq,
        )
        next_seq += 1

    for r in range(max_rounds):
        pending = [e for e in res.entries.values() if e.state == "pending"]
        if not pending:
            break

        # robots split
        allowed: list[SimEntry] = []
        for e in pending:
            rules = host_policy.get(e.host, {}).get("robots_disallow", [])
            if any(_path_of(e.url).startswith(p) for p in rules):
                e.state = "robots_blocked"
            else:
                allowed.append(e)

        # per-host politeness top-B
        if order == "priority":
            allowed.sort(key=lambda e: (-e.priority, e.depth, e.seq))
        else:
            allowed.sort(key=lambda e: e.seq)
        taken: dict[str, int] = {}
        scheduled: list[SimEntry] = []
        for e in allowed:
            budget = host_policy.get(e.host, {}).get(
                "max_per_round", default_budget)
            if taken.get(e.host, 0) < budget:
                taken[e.host] = taken.get(e.host, 0) + 1
                scheduled.append(e)

        round_log = {"round": r, "scheduled": [], "articles": 0,
                     "enqueued": 0, "errors": 0}
        discoveries: list[tuple[int, int, SimEntry, str]] = []
        for e in scheduled:
            round_log["scheduled"].append(e.url)
            html = pages.get(e.url)
            if html is None:
                e.retry_count += 1
                e.state = "pending" if e.retry_count < max_retries else "failed"
                continue
            e.state = "fetched"
            if e.label == "PARSE":
                pid = ref.select_parser_id(e.url, e.parser)
                if pid == "weibo":
                    post = ox.parse_weibo(html, e.url)
                    if post:
                        res.articles.append({**post, "parser_used": pid})
                        round_log["articles"] += 1
                    else:
                        round_log["errors"] += 1
                elif pid is not None:
                    art = ox.parse_generic_news(html, e.url)
                    if art:
                        res.articles.append({**art, "parser_used": pid})
                        round_log["articles"] += 1
                    else:
                        round_log["errors"] += 1
            elif e.label is not None:
                for pos, child in enumerate(ox.extract_links(html, e.label)):
                    discoveries.append((e.seq, pos, e, child))

        # enqueue in (parent_seq, pos) order — the engine's seq semantics
        discoveries.sort(key=lambda t: (t[0], t[1]))
        for parent_seq, pos, parent, child in discoveries:
            h = ref.canonical_url_hash(child)  # crawlee uniqueKey (J2)
            if h in res.entries:
                continue  # first-wins + seen dedup (J1/J2)
            res.entries[h] = SimEntry(
                url=child, url_hash=h, host=ref.extract_domain(child),
                depth=parent.depth + 1, priority=parent.priority,
                parser=parent.parser, label="PARSE",
                discovered_from=parent.url, seq=next_seq,
            )
            next_seq += 1
            round_log["enqueued"] += 1

        res.rounds.append(round_log)
    return res
