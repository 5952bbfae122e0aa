"""Content analysis — native Column exprs (content_analyzer.py:284-509).

Rule-based analysis stage of the AI-enhanced parser, fully JVM-side
(whole-stage codegen) — no UDF needed for any of these. The one
stateful analysis op (entity extraction, content_analyzer.py:466-494)
lives in operators.parse as a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import sentence_count, strip_ws, word_count

AUTHORITY_WORDS = ["according to", "research", "study", "data"]  # :311-314
ENGLISH_INDICATORS = ["the", "and", "or", "but", "in", "on", "at", "to", "for"]
POSITIVE_WORDS = ["good", "great", "excellent", "amazing", "breakthrough",
                  "success", "achievement"]
NEGATIVE_WORDS = ["bad", "terrible", "crisis", "problem", "issue", "concern",
                  "failure"]
# dict order is semantic (first-3 cap) — content_analyzer.py:415-457
TOPIC_KEYWORDS = [
    ("technology", ["tech", "digital", "software", "computer", "ai",
                    "artificial intelligence"]),
    ("business", ["business", "company", "market", "economy", "finance",
                  "startup"]),
    ("health", ["health", "medical", "hospital", "doctor", "medicine",
                "treatment"]),
    ("politics", ["government", "political", "policy", "election",
                  "president", "minister"]),
    ("science", ["research", "study", "scientist", "discovery", "experiment",
                 "analysis"]),
    ("sports", ["sport", "game", "team", "player", "championship",
                "tournament"]),
]


def _truthy(c: Column) -> Column:
    """Python truthiness for optional strings: non-null and non-empty."""
    return c.isNotNull() & (c != "")


def _contains_any(lower_text: Column, words: list[str]) -> Column:
    expr = F.lit(False)
    for w in words:
        expr = expr | lower_text.contains(w)
    return expr


def _count_contains(lower_text: Column, words: list[str]) -> Column:
    terms = [
        F.when(lower_text.contains(w), 1).otherwise(0) for w in words
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def quality_score(title: Column, content: Column) -> Column:
    """content_analyzer.py:284-317 — additive ladder, cap 10.0.

    ``not title.isupper()`` ≡ title has a lowercase-able char or no cased
    chars at all: NOT(title == upper(title) AND upper != lower)."""
    wc = word_count(content)
    not_isupper = (title != F.upper(title)) | (F.upper(title) == F.lower(title))
    lower = F.lower(content)
    score = (
        F.lit(5.0)
        + F.when(_truthy(title) & (F.length(strip_ws(title)) > 10), 1.0).otherwise(0.0)
        + F.when(_truthy(title) & not_isupper, 0.5).otherwise(0.0)
        + F.when(wc > 100, 1.0).otherwise(0.0)
        + F.when(wc > 500, 1.0).otherwise(0.0)
        + F.when(wc > 1000, 0.5).otherwise(0.0)
        + F.when(_truthy(content) & (sentence_count(content) > 5), 0.5).otherwise(0.0)
        + F.when(_truthy(content) & (content.contains("?") | content.contains("!")),
                 0.3).otherwise(0.0)
        + F.when(_truthy(content) & _contains_any(lower, AUTHORITY_WORDS),
                 0.7).otherwise(0.0)
    )
    return F.least(score, F.lit(10.0))


def readability(content: Column) -> Column:
    """content_analyzer.py:319-337 — avg words/sentence buckets."""
    words = word_count(content)
    sentences = sentence_count(content)
    avg = words.cast("double") / sentences
    return (
        F.when(~_truthy(content), "unknown")
        .when(sentences == 0, "basic")
        .when(avg < 15, "basic")
        .when(avg < 25, "intermediate")
        .otherwise("advanced")
    )


def completeness(title: Column, content: Column, author: Column,
                 published_at: Column, description: Column,
                 image: Column) -> Column:
    """content_analyzer.py:339-357 — weighted presence / 6, cap 1.0."""
    c = (
        F.when(_truthy(title), 1.0).otherwise(0.0)
        + F.when(_truthy(content) & (F.length(content) > 100), 2.0).otherwise(0.0)
        + F.when(_truthy(author), 1.0).otherwise(0.0)
        + F.when(published_at.isNotNull(), 1.0).otherwise(0.0)
        + F.when(_truthy(description), 0.5).otherwise(0.0)
        + F.when(_truthy(image), 0.5).otherwise(0.0)
    )
    return F.least(c / 6, F.lit(1.0))


def detect_language(content: Column) -> Column:
    """content_analyzer.py:359-370 — ≥2 of 9 stop-word substrings → 'en'."""
    lower = F.lower(content)
    return (
        F.when(~_truthy(content), "unknown")
        .when(_count_contains(lower, ENGLISH_INDICATORS) >= 2, "en")
        .otherwise("unknown")
    )


def sentiment(content: Column) -> Column:
    """content_analyzer.py:372-406 — substring counts with ±1 margin."""
    lower = F.lower(content)
    pos = _count_contains(lower, POSITIVE_WORDS)
    neg = _count_contains(lower, NEGATIVE_WORDS)
    return (
        F.when(~_truthy(content), "neutral")
        .when(pos > neg + 1, "positive")
        .when(neg > pos + 1, "negative")
        .otherwise("neutral")
    )


def topics(text: Column) -> Column:
    """content_analyzer.py:408-464 — keyword buckets, dict order, cap 3."""
    lower = F.lower(text)
    detected = F.array(*[
        F.when(_contains_any(lower, kws), F.lit(topic))
        for topic, kws in TOPIC_KEYWORDS
    ])
    arr = F.slice(F.filter(detected, lambda x: x.isNotNull()), 1, 3)
    return F.when(~_truthy(text), F.array().cast("array<string>")).otherwise(arr)


def summary(title: Column, content: Column) -> Column:
    """content_analyzer.py:496-509 — first 2 nonempty '.'-sentences."""
    sents = F.transform(
        F.filter(F.split(content, r"\."), lambda s: strip_ws(s) != ""),
        lambda s: strip_ws(s),
    )
    n = F.size(sents)
    return (
        F.when(~_truthy(content),
               F.coalesce(F.nullif(title, F.lit("")),
                          F.lit("No content available for summary.")))
        .when(n >= 2, F.concat(F.concat_ws(". ", F.slice(sents, 1, 2)), F.lit(".")))
        .when(n == 1, F.concat(sents[0], F.lit(".")))
        .otherwise(F.coalesce(F.nullif(title, F.lit("")),
                              F.lit("No summary available.")))
    )
