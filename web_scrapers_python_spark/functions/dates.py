"""Multi-format date parsing — generic_news.py:215-240.

First-match-wins over the reference's 6 strptime formats, in order —
the order is semantic: ``14/03/2024`` must parse day-first because
``%d/%m/%Y`` precedes ``%m/%d/%Y``; ``03/04/2024`` parses as April 3rd
(d/M/y) for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import strip_ws

# (python strptime fmt, spark datetime pattern) — generic_news.py:225-232
DATE_FORMAT_PAIRS = [
    ("%Y-%m-%d", "yyyy-MM-dd"),
    ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss"),
    ("%Y-%m-%dT%H:%M:%SZ", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
    ("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
    ("%d/%m/%Y", "dd/MM/yyyy"),
    ("%m/%d/%Y", "MM/dd/yyyy"),
]


def parse_date_multi(value: Column) -> Column:
    """coalesce(try_to_timestamp(fmt_i)) in reference order; NULL if none.

    try_to_timestamp keeps strptime's fail→try-next semantics without
    raising (spark.sql.ansi-safe)."""
    v = strip_ws(value)
    attempts = [
        F.try_to_timestamp(v, F.lit(spark_fmt))
        for _, spark_fmt in DATE_FORMAT_PAIRS
    ]
    return F.coalesce(*attempts)
