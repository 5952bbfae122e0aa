"""Spark-native scalar expressions mirroring the reference's row-level
semantics (SURVEY §2.8). Everything here is a pure Column expression —
JVM-side, whole-stage-codegen friendly; the pandas-UDF equivalents (used
where Python-regex byte parity is mandatory) live in ``operators.parse``.
"""

from .urls import (  # noqa: F401
    url_hash, content_hash, extract_domain, news_url_predicate,
    weibo_url_predicate, looks_like_news, url_scheme_ok, select_parser_id,
)
from .text import (  # noqa: F401
    strip_ws, clean_title, clean_content, clean_author, clean_description,
    clean_image, word_count, sentence_count,
)
from .dates import parse_date_multi  # noqa: F401
from .numbers import extract_engagement_number  # noqa: F401
from .analysis import (  # noqa: F401
    quality_score, readability, completeness, detect_language, sentiment,
    topics, summary,
)
