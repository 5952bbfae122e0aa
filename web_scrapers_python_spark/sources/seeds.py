"""Seed-file source — Spark-native (SURVEY §2.1 S1-S3, §2.8 X18).

Reference behavior (src/core/seeds.py:39-112): read newline text file;
skip blank lines and ``#`` comments; each line is either a JSON object
(with lenient repair: quote unquoted keys, single→double quotes) or a
bare ``http(s)://`` URL; invalid lines are dropped with a warning.

Everything is a Column expression over ``spark.read.text`` — the seed
file scan distributes and the decode stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import strip_ws

SEED_SCHEMA = "url STRING, label STRING, parser STRING, priority INT"


def decode_seed_line(line: Column) -> Column:
    """parse_seed_line (seeds.py:76-112) as one expression.

    Order: strict JSON → lenient-repair JSON → bare URL → NULL.
    ``from_json`` in PERMISSIVE mode yields a NULL struct on broken
    JSON, mirroring the caught JSONDecodeError. The repair
    (seeds.py:97-102) is replicated verbatim — including its quirk of
    quoting the scheme colon in absolute-URL values (those lines fail
    in the reference too; see tests/test_functions_parity.py)."""
    ln = strip_ws(line)
    is_jsonish = ln.startswith("{") & ln.endswith("}")
    strict = F.from_json(ln, SEED_SCHEMA)
    repaired = F.from_json(
        F.replace(
            F.regexp_replace(ln, r"(\w+):", '"$1":'), F.lit("'"), F.lit('"')
        ),
        SEED_SCHEMA,
    )
    bare = F.struct(
        ln.alias("url"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("string").alias("parser"),
        F.lit(None).cast("int").alias("priority"),
    )
    return (
        F.when(is_jsonish & strict["url"].isNotNull(), strict)
        .when(is_jsonish & repaired["url"].isNotNull(), repaired)
        .when(ln.startswith("http://") | ln.startswith("https://"), bare)
        .otherwise(F.lit(None).cast(f"struct<{SEED_SCHEMA.replace(' STRING', ':STRING').replace(' INT', ':INT').replace(', ', ',')}>"))
    )


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Seed file → DataFrame(url, label, parser, priority, seq).

    ``seq`` is the 0-based file line order of *valid* seeds — the FIFO
    position the reference gives them (main.py:96-107 preserves list
    order). Sequencing is the distributed range-partitioned dense rank
    (``assign_global_seq``), NOT an unpartitioned window: a
    ``Window.orderBy`` would pull every seed into ONE task, which caps
    bootstrap at a single core — fatal for a billion-URL seed list.
    Splits of a single text file are assigned in byte-offset order, so
    ``monotonically_increasing_id`` (partition_id << 33 | row-in-part)
    is consistent with file line order across splits; for multi-file
    seed sets, prefix file-name ordering upstream."""
    from ..operators.sequence import assign_global_seq

    lines = (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("_file_pos"),
            F.col("value"),
        )
    )
    stripped = strip_ws(F.col("value"))
    decoded = (
        lines
        .where((F.length(stripped) > 0) & ~stripped.startswith("#"))  # seeds.py:60-61
        .select("_file_pos", decode_seed_line(F.col("value")).alias("seed"))
        .where(F.col("seed").isNotNull() & F.col("seed")["url"].isNotNull())
        .select(
            F.col("_file_pos"),
            F.col("seed")["url"].alias("url"),
            F.col("seed")["label"].alias("label"),
            F.col("seed")["parser"].alias("parser"),
            F.coalesce(F.col("seed")["priority"], F.lit(0)).alias("priority"),
        )
    )
    return assign_global_seq(decoded, ["_file_pos"], out_col="seq") \
        .drop("_file_pos")


def seeds_with_fallback(spark: SparkSession, catalog, file_path: str,
                        table: str = "seeds",
                        limit: int | None = None) -> DataFrame:
    """S4 bootstrap chain: prefer the warehouse seed TABLE; fall back to
    the seed file when the table is missing or empty
    (cassandra_parser_manager.py:98-119 falls back to
    _get_file_based_seeds at 152-162 when the DB yields nothing).

    The table must carry (url, label, parser, priority, seq); an
    optional ``status`` column keeps only 'active' rows
    (cassandra_manager.py:353-372 reads active seeds with a limit).
    ``limit`` takes the top rows by (priority DESC, seq ASC) — the W1
    ordering the engine schedules by."""
    try:
        if catalog.exists(table):
            df = catalog.read(table)
            if "status" in df.columns:
                df = df.where(F.col("status") == "active")
            df = df.select(
                "url",
                F.col("label") if "label" in df.columns
                else F.lit(None).cast("string").alias("label"),
                F.col("parser") if "parser" in df.columns
                else F.lit(None).cast("string").alias("parser"),
                (F.coalesce(F.col("priority"), F.lit(0))
                 if "priority" in df.columns
                 else F.lit(0)).alias("priority"),
                F.col("seq").cast("long"),
            )
            if limit is not None:
                df = df.orderBy(F.col("priority").desc(),
                                F.col("seq").asc()).limit(limit)
            if df.limit(1).count() > 0:    # cheap emptiness probe
                return df
    except FileNotFoundError:
        pass
    return read_seeds(spark, file_path)
