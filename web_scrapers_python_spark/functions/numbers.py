"""Weibo engagement-number parsing — weibo.py:99-125, native exprs.

Replicates the reference exactly, including its quirk: both ``,`` and
``.`` are stripped from the matched number BEFORE scaling, so
``1.5K`` → 15 × 1000 = 15000 (not 1500). K/千 ×1e3, 万 ×1e4, M ×1e6,
B ×1e9.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENGAGEMENT_REGEX = r"(\d+(?:[,.]?\d+)*)\s*([KMB万千]?)"


def extract_engagement_number(text: Column) -> Column:
    num_str = F.regexp_extract(text, ENGAGEMENT_REGEX, 1)
    suffix = F.regexp_extract(text, ENGAGEMENT_REGEX, 2)
    base = F.regexp_replace(num_str, r"[,.]", "").cast("double")
    scaled = (
        F.when(suffix.isin("K", "千"), base * 1000)
        .when(suffix == "万", base * 10000)
        .when(suffix == "M", base * 1000000)
        .when(suffix == "B", base * 1000000000)
        .otherwise(base)
    )
    return F.when(
        text.isNotNull() & (num_str != ""), scaled.cast("long")
    )
