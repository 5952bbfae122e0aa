"""URL predicates, hashing, domain extraction — native Column exprs.

Provenance (reference = /root/reference):
- news predicate: src/parsers/generic_news.py:25-39
- weibo predicate: src/parsers/weibo.py:34-36
- news-lookalike fallback: src/core/parser_manager.py:62-87
- url/content hash: src/database/cassandra_manager.py:408-414
- domain (netloc, keeps port): src/database/cassandra_manager.py:416-420
- scheme check: src/core/seeds.py:109
- parser selection order: src/core/parser_manager.py:18-60
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# generic_news.py:28-36 — union of the 7 patterns (re.search semantics ⇒
# unanchored rlike). The 7th pattern /(news|article|story) subsumes the
# first three but is kept for fidelity.
NEWS_URL_REGEX = (
    r"/news/|/article/|/story/|/post/|/[0-9]{4}/[0-9]{2}/|/blog/"
    r"|/(news|article|story)"
)

# parser_manager.py:73-83 — substring heuristics (plain contains, not regex)
LOOKS_LIKE_NEWS_SUBSTRINGS = [
    "news", "article", "story", "post", "blog", "/20",
    "/article/", "/news/", "/story/",
]

# urlparse().netloc ≡ the authority component: after ``scheme://`` up to
# the first ``/``, ``?`` or ``#`` — keeps userinfo and port
# (test_cassandra_integration.py:238-249 requires `sub.domain.com:8080`).
AUTHORITY_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"


def news_url_predicate(url: Column) -> Column:
    return F.lower(url).rlike(NEWS_URL_REGEX)


def weibo_url_predicate(url: Column) -> Column:
    return F.lower(url).contains("weibo.com")


def looks_like_news(url: Column) -> Column:
    expr = F.lit(False)
    low = F.lower(url)
    for s in LOOKS_LIKE_NEWS_SUBSTRINGS:
        expr = expr | low.contains(s)
    return expr


def select_parser_id(url: Column, forced: Column | None = None) -> Column:
    """parser_manager.py:18-60 — forced id > registration-order can_parse
    (generic-news, weibo) > news-lookalike fallback > NULL.
    CASE WHEN evaluation order = the reference's first-match loop."""
    sel = (
        F.when(news_url_predicate(url), F.lit("generic-news"))
        .when(weibo_url_predicate(url), F.lit("weibo"))
        .when(looks_like_news(url), F.lit("generic-news"))
        .otherwise(F.lit(None).cast("string"))
    )
    if forced is not None:
        sel = F.coalesce(forced, sel)
    return sel


def url_hash(url: Column) -> Column:
    """sha256(url)[:16] hex — cassandra_manager.py:408-410."""
    return F.substring(F.sha2(url, 256), 1, 16)


def content_hash(content: Column) -> Column:
    """sha256(content)[:16] hex — cassandra_manager.py:412-414."""
    return F.substring(F.sha2(content, 256), 1, 16)


def extract_domain(url: Column) -> Column:
    """urlparse(url).netloc — keeps host:port and userinfo.

    NOT parse_url(url,'HOST') (drops port) — byte-parity per
    test_cassandra_integration.py:238-249."""
    return F.regexp_extract(url, AUTHORITY_REGEX, 1)


def url_scheme_ok(url: Column) -> Column:
    """startswith http:// or https:// — seeds.py:109."""
    return url.startswith("http://") | url.startswith("https://")


# --------------------------------------------------------------------------
# URL canonicalization (crawlee uniqueKey semantics)
# --------------------------------------------------------------------------
# The reference's request-queue dedup key is crawlee's canonicalized
# uniqueKey, not the raw URL (SURVEY §2.3 J2; crawlee-python
# `normalize_url`, a public library behavior): trim, drop the fragment,
# lowercase scheme+authority, strip the scheme's default port, strip
# trailing path slashes, drop `utm_*` tracking params, sort the
# remaining query params. The dedup key canonicalizes; the fetch URL
# stays as discovered. Delta vs the library (documented): params are
# compared as raw `k=v` strings — no percent-re-encoding pass, which
# would need a Python UDF for zero practical gain on crawl corpora.
# Non-http(s) inputs are out of contract (the F5 scheme gate runs
# first).

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Crawlee-style canonical form as a native Column expression —
    pair with ``url_hash`` for the seen/queue dedup key (J1/J2)."""
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, AUTHORITY_REGEX, 1))
    auth = F.when((scheme == "http"), F.regexp_replace(auth, ":80$", "")) \
        .when((scheme == "https"), F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).startswith("utm_"))
    q2 = F.array_join(F.array_sort(params), "&")
    base = F.concat(scheme, F.lit("://"), auth, path)
    return F.when(q2 == "", base).otherwise(
        F.concat(base, F.lit("?"), q2))


def canonical_url_hash(url: Column) -> Column:
    """sha256(canonical_url)[:16] — the J1/J2 dedup key."""
    return url_hash(canonicalize_url(url))


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of ``canonicalize_url`` (same regexes, same rules)."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    scheme = f"lower(coalesce(regexp_extract({u}, '{_SCHEME_RE}', 1), ''))"
    auth0 = f"lower(coalesce(regexp_extract({u}, '{AUTHORITY_REGEX}', 1), ''))"
    auth = (f"CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({auth0}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({auth0}, ':443$', '') "
            f"ELSE {auth0} END")
    path = (f"regexp_replace(coalesce(regexp_extract({u}, '{_PATH_RE}', 1),"
            f" ''), '/+$', '')")
    query = f"coalesce(regexp_extract({u}, '\\?([^#]*)', 1), '')"
    params = (f"list_sort(list_filter(string_split({query}, '&'), "
              f"p -> p != '' AND NOT starts_with(lower(p), 'utm_')))")
    # array_to_string/list_sort yield NULL on an empty list in DuckDB
    q2 = f"coalesce(array_to_string({params}, '&'), '')"
    base = f"({scheme} || '://' || {auth} || {path})"
    return f"(CASE WHEN {q2} = '' THEN {base} ELSE {base} || '?' || {q2} END)"
