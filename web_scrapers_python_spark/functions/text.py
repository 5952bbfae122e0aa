"""Text cleaning — native Column exprs (generic_news.py:168-213).

Whitespace note: Python ``str.strip``/``re \\s`` cover Unicode
whitespace while Java's default ``\\s`` is ASCII. These native exprs are
byte-identical for ASCII text (all sandbox fixtures/oracle checks); the
parse UDF path (operators.parse) uses Python ``re`` directly, so the
end-to-end article pipeline keeps full Python-regex parity (SURVEY §4.2.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_EDGE = r"^\s+|\s+$"


def strip_ws(c: Column) -> Column:
    """Python str.strip() — NOT F.trim (which strips only 0x20)."""
    return F.regexp_replace(c, WS_EDGE, "")


def clean_title(title: Column) -> Column:
    """strip + drop ' - rest' / ' | rest' suffix — generic_news.py:176-180.
    NULL/empty-in → NULL (reference omits the key for falsy titles)."""
    t = strip_ws(title)
    return F.when(
        title.isNotNull() & (title != ""),
        F.regexp_replace(t, r"\s*[-|]\s*.+$", ""),
    )


def clean_content(content: Column) -> Column:
    """strip, collapse \\s+ → ' ', cap 10000 — generic_news.py:183-187."""
    c = F.regexp_replace(strip_ws(content), r"\s+", " ")
    return F.when(content.isNotNull() & (content != ""), F.substring(c, 1, 10000))


def clean_author(author: Column) -> Column:
    """keep stripped author iff len<100 — generic_news.py:190-193."""
    a = strip_ws(author)
    return F.when(
        author.isNotNull() & (author != "") & (F.length(a) < 100), a
    )


def clean_description(description: Column) -> Column:
    """keep stripped description iff len<1000 — generic_news.py:196-199."""
    d = strip_ws(description)
    return F.when(
        description.isNotNull() & (description != "") & (F.length(d) < 1000), d
    )


def clean_image(image: Column) -> Column:
    """keep stripped image url iff http(s):// — generic_news.py:208-211."""
    i = strip_ws(image)
    return F.when(
        image.isNotNull() & (image != "")
        & (i.startswith("http://") | i.startswith("https://")),
        i,
    )


def word_count(content: Column) -> Column:
    """len(content.split()) — content_analyzer.py:198. Python split()
    drops empty tokens; '' and all-whitespace → 0."""
    stripped = strip_ws(content)
    return (
        F.when(content.isNull() | (stripped == ""), F.lit(0))
        .otherwise(F.size(F.split(stripped, r"\s+")))
    )


def sentence_count(content: Column) -> Column:
    """len([s for s in content.split('.') if s.strip()]) —
    content_analyzer.py:306,325."""
    return F.when(content.isNull(), F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.split(content, r"\."),
                lambda s: F.regexp_replace(s, WS_EDGE, "") != "",
            )
        )
    )
