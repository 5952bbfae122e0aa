"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side Column expressions (whole-stage codegen; no UDFs), each
with a DuckDB-SQL twin for the driver's independent oracle. These
extend the reference's analysis surface (content_analyzer.py:284-509 —
see functions.analysis for the byte-parity ports) with the corpus-prep
operations a 100 TB text pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import hashing as H

# Per-language stopword profiles for the n-gram/stopword language
# scorer. The English list is the reference's 9 indicators
# (content_analyzer.py:363-365); the rest are standard high-frequency
# function words.
LANG_PROFILES = [
    ("en", ["the", "and", "or", "but", "in", "on", "at", "to", "for"]),
    ("de", ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"]),
    ("es", ["el", "la", "los", "las", "que", "de", "y", "en", "un"]),
    ("fr", ["le", "la", "les", "et", "est", "dans", "que", "une", "pour"]),
    ("zh", ["的", "是", "了", "在", "和", "有", "我", "不"]),
]

PUNCT_CLASS = "[.,!?;:]"
DIGIT_CLASS = "[0-9]"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def ws_token_count(text: Column) -> Column:
    """Whitespace token count (empty text -> 0)."""
    t = F.regexp_replace(text, r"^\s+|\s+$", "")
    return F.when(F.length(t) == 0, 0).otherwise(
        F.size(F.split(t, r"\s+")))


def ws_token_count_sql(e: str) -> str:
    t = f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"
    return (f"CASE WHEN length({t}) = 0 THEN 0 "
            f"ELSE len(string_split({t}, ' ')) END")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens (letter runs / digit runs / single
    symbols) — the standard proxy for LLM token budgeting."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), 0))


def bpe_token_count_sql(e: str) -> str:
    return f"len(regexp_extract_all({e}, '{BPE_REGEX}'))"


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword / digit ratios)
# ---------------------------------------------------------------------------

def _ratio_of_class(text: Column, cls: str) -> Column:
    n = F.length(text)
    hits = n - F.length(F.regexp_replace(text, cls, ""))
    return F.when(n == 0, 0.0).otherwise(hits.cast("double") / n)


def _ratio_of_class_sql(e: str, cls: str) -> str:
    return (f"CASE WHEN length({e}) = 0 THEN 0.0 ELSE "
            f"cast(length({e}) - length(regexp_replace({e}, '{cls}', '', 'g'))"
            f" as double) / length({e}) END")


def stopword_ratio(text: Column) -> Column:
    toks = F.split(H.normalize_text(text), " ")
    stops = set(LANG_PROFILES[0][1])
    hits = F.size(F.filter(toks, lambda t: t.isin(*stops)))
    return F.when(F.size(toks) == 0, 0.0).otherwise(
        hits.cast("double") / F.size(toks))


def stopword_ratio_sql(e: str) -> str:
    nrm = H.normalize_text_sql(e)
    stops = ", ".join(f"'{w}'" for w in LANG_PROFILES[0][1])
    return (f"CASE WHEN len(string_split({nrm}, ' ')) = 0 THEN 0.0 ELSE "
            f"cast(len(list_filter(string_split({nrm}, ' '), "
            f"t -> t IN ({stops}))) as double) "
            f"/ len(string_split({nrm}, ' ')) END")


def doc_quality_score(text: Column) -> Column:
    """Additive 0-10 ladder in the style of the reference's
    quality_score (content_analyzer.py:284-317) but over corpus-prep
    signals: length band, punctuation presence, stopword density,
    digit pollution, mean token length sanity."""
    n = F.length(text)
    ntok = ws_token_count(text)
    mean_len = F.when(ntok == 0, 0.0).otherwise(n.cast("double") / ntok)
    punct = _ratio_of_class(text, PUNCT_CLASS)
    digit = _ratio_of_class(text, DIGIT_CLASS)
    stop = stopword_ratio(text)
    score = (
        F.lit(2.0)
        + F.when((n >= 100) & (n <= 20000), 2.0)
          .when((n >= 25) & (n < 100), 1.0).otherwise(0.0)
        + F.when((punct > 0.0) & (punct < 0.1), 1.0).otherwise(0.0)
        + F.when(stop >= 0.05, 2.0).when(stop >= 0.02, 1.0).otherwise(0.0)
        + F.when(digit < 0.2, 1.0).otherwise(0.0)
        + F.when((mean_len >= 3.0) & (mean_len <= 12.0), 2.0).otherwise(0.0)
    )
    return F.least(score, F.lit(10.0))


def doc_quality_score_sql(e: str) -> str:
    n = f"length({e})"
    ntok = ws_token_count_sql(e)
    mean_len = (f"(CASE WHEN {ntok} = 0 THEN 0.0 "
                f"ELSE cast({n} as double) / {ntok} END)")
    punct = _ratio_of_class_sql(e, PUNCT_CLASS)
    digit = _ratio_of_class_sql(e, DIGIT_CLASS)
    stop = stopword_ratio_sql(e)
    return f"""least(2.0
  + CASE WHEN {n} >= 100 AND {n} <= 20000 THEN 2.0
         WHEN {n} >= 25 AND {n} < 100 THEN 1.0 ELSE 0.0 END
  + CASE WHEN {punct} > 0.0 AND {punct} < 0.1 THEN 1.0 ELSE 0.0 END
  + CASE WHEN {stop} >= 0.05 THEN 2.0
         WHEN {stop} >= 0.02 THEN 1.0 ELSE 0.0 END
  + CASE WHEN {digit} < 0.2 THEN 1.0 ELSE 0.0 END
  + CASE WHEN {mean_len} >= 3.0 AND {mean_len} <= 12.0 THEN 2.0
         ELSE 0.0 END, 10.0)"""


# ---------------------------------------------------------------------------
# Language identification (stopword-profile argmax)
# ---------------------------------------------------------------------------

def _char_class(words: list[str]) -> str:
    """Regex char class over the profile's characters, with class
    metacharacters (']', '^', '-', '\\') escaped — a future profile
    edit must not silently corrupt the pattern. The escaping is
    identical in Java regex (Spark) and RE2 (DuckDB), so both twins
    stay in lockstep."""
    chars = "".join(words)
    return "[" + "".join(
        ("\\" + c) if c in "]^-\\[" else c for c in chars) + "]"


def _profile_count(nrm: Column, lang: str, words: list[str]) -> Column:
    """Hits of one language profile against normalized text. Scripts
    written without word separators (zh) can't be token-matched —
    whitespace tokenization leaves one giant token that never equals a
    single-character stopword — so zh counts profile-CHARACTER
    occurrences instead (length delta after stripping them)."""
    if lang == "zh":
        return F.length(nrm) - F.length(
            F.regexp_replace(nrm, _char_class(words), ""))
    toks = F.split(nrm, " ")
    return F.size(F.filter(toks, lambda t: t.isin(*set(words))))


def _profile_count_sql(nrm: str, lang: str, words: list[str]) -> str:
    if lang == "zh":
        return (f"(len({nrm}) - len(regexp_replace({nrm}, "
                f"'{_char_class(words)}', '', 'g')))")
    inlist = ", ".join(f"'{w}'" for w in words)
    return (f"len(list_filter(string_split({nrm}, ' '), "
            f"t -> t IN ({inlist})))")


def langid(text: Column) -> Column:
    """Predicted language: argmax of per-language stopword hits over
    LANG_PROFILES (token hits for space-separated scripts, character
    hits for zh); 'unknown' when nothing matches. Ties resolve in
    profile order (en first) — mirrored by the CASE order in the SQL
    twin. Generalizes the reference's en/unknown detector
    (content_analyzer.py:359-370)."""
    nrm = H.normalize_text(text)
    counts = [
        _profile_count(nrm, lang, words) for lang, words in LANG_PROFILES
    ]
    best = F.greatest(*counts)
    out = F.lit("unknown")
    for (lang, _), cnt in reversed(list(zip(LANG_PROFILES, counts))):
        out = F.when((best > 0) & (cnt == best), lang).otherwise(out)
    return out


def langid_sql(e: str) -> str:
    nrm = H.normalize_text_sql(e)
    cnt_exprs = [
        _profile_count_sql(nrm, lang, words) for lang, words in LANG_PROFILES
    ]
    best = f"greatest({', '.join(cnt_exprs)})"
    whens = "\n".join(
        f"WHEN {best} > 0 AND {cnt} = {best} THEN '{lang}'"
        for (lang, _), cnt in zip(LANG_PROFILES, cnt_exprs))
    return f"CASE {whens} ELSE 'unknown' END"


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def fingerprint64(text: Column) -> Column:
    """int64 fingerprint of whitespace/case-normalized text — the join
    key for cross-corpus exact dedup at scale (8 bytes vs 16-char hex)."""
    return H.h64(H.normalize_text(text))


def fingerprint64_sql(e: str) -> str:
    return H.h64_sql(H.normalize_text_sql(e))


def content_hash16(text: Column) -> Column:
    """The reference's exact content hash: sha256 hex [:16]
    (cassandra_manager.py:412-414)."""
    return F.substring(F.sha2(text, 256), 1, 16)


def content_hash16_sql(e: str) -> str:
    return f"substring(sha256({e}), 1, 16)"


# ---------------------------------------------------------------------------
# Quality-filter pipeline (C4/Gopher-style keep/drop composition)
# ---------------------------------------------------------------------------
# The standard training-data cleaning step the reference lacks: compose
# the corpus-prep signals above into a single keep/drop decision with a
# first-match drop reason (ladder order is part of the contract, like
# F9's parser CASE). Entirely JVM-native — one map-only pass, no
# shuffle; at 100 TB this is the cheapest stage of the pipeline.

QF_MIN_TOKENS = 50
QF_MAX_TOKENS = 10_000
QF_MIN_QUALITY = 5.0          # of the 0-10 doc_quality_score ladder
QF_MIN_STOPWORD = 0.01
QF_LANGS = ("en",)


def quality_drop_reason(text: Column, langs: tuple[str, ...] = QF_LANGS,
                        min_tokens: int = QF_MIN_TOKENS,
                        max_tokens: int = QF_MAX_TOKENS,
                        min_quality: float = QF_MIN_QUALITY,
                        min_stopword: float = QF_MIN_STOPWORD) -> Column:
    """First failing gate as a string, NULL = keep. Gate order:
    too_short, too_long, wrong_lang, low_quality, low_stopword."""
    wt = ws_token_count(text)
    return (
        F.when(wt < min_tokens, "too_short")
        .when(wt > max_tokens, "too_long")
        .when(~langid(text).isin(*langs), "wrong_lang")
        .when(doc_quality_score(text) < min_quality, "low_quality")
        .when(stopword_ratio(text) < min_stopword, "low_stopword")
    )


def quality_drop_reason_sql(e: str, langs: tuple[str, ...] = QF_LANGS,
                            min_tokens: int = QF_MIN_TOKENS,
                            max_tokens: int = QF_MAX_TOKENS,
                            min_quality: float = QF_MIN_QUALITY,
                            min_stopword: float = QF_MIN_STOPWORD) -> str:
    wt = ws_token_count_sql(e)
    langs_sql = ", ".join(f"'{lg}'" for lg in langs)
    return f"""CASE
  WHEN {wt} < {min_tokens} THEN 'too_short'
  WHEN {wt} > {max_tokens} THEN 'too_long'
  WHEN {langid_sql(e)} NOT IN ({langs_sql}) THEN 'wrong_lang'
  WHEN {doc_quality_score_sql(e)} < {min_quality} THEN 'low_quality'
  WHEN {stopword_ratio_sql(e)} < {min_stopword} THEN 'low_stopword'
  ELSE NULL END"""
