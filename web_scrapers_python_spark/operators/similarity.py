"""Approximate-nearest-neighbor search over embedding columns.

Scale-path component for training-data pipelines (no reference
counterpart — the reference stores no vectors). Two strategies:

- ``brute_topk``: exact cosine top-k, query-set x corpus join. The
  baseline and the verifier for the approximate path. All arithmetic
  is JVM-side (zip_with/aggregate fold in double precision), bit-
  reproducible in the DuckDB oracle (same sequential fold).
- ``lsh_topk``: random-hyperplane LSH — sign-bit bucket key, candidate
  generation by bucket equi-join (optionally multi-probe over bands of
  the signature), exact cosine re-rank within candidates. At 10^10
  vectors the bucket join shuffles only (bucket_key), never quadratic.
- ``ivf_topk``: inverted-file index — the corpus is partitioned into
  NLIST cells by nearest pivot vector; a query probes only its NPROBE
  nearest cells. Pivots are chosen by a deterministic hash-systematic
  rule (no RNG, no iteration) so the whole index build is a pure
  function of the data and the DuckDB oracle reproduces it exactly.

Hyperplanes are pseudo-random but *arithmetically* derived (no RNG
state) so the oracle reproduces them:  plane_p[d] =
((p * DIM + d) * KNUTH mod 1000) / 999.5 - 1.0  in [-1, 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import KNUTH

N_PLANES = 12
BAND_BITS = 4          # multi-probe: join on 4-bit bands of the signature


def _plane(p: int, dim: int) -> list[float]:
    return [((p * dim + d) * KNUTH % 1000) / 999.5 - 1.0 for d in range(dim)]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine in double precision; sequential left-fold so the
    oracle (same fold) is bit-identical."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def cosine_sql(a: str, b: str, dim: int) -> str:
    def dot(x, y):
        return (f"list_reduce([0.0] || [{x}[i]::DOUBLE * {y}[i]::DOUBLE "
                f"for i in range(1, {dim + 1})], (p, q) -> p + q)")
    return (f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))")


def brute_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector (self-matches excluded).
    Returns (query_id, neighbor_id, rank, cosine_sim). Norms are
    precomputed map-side on each input (N + M dots, not N*M*3); the
    corpus side streams through a broadcast of the (small) query set —
    at scale the roles flip or the LSH path takes over."""
    def prep(df: DataFrame, role: str) -> DataFrame:
        if role == "neighbor":   # corpus side carries the per-pair work
            df = df.repartition(
                df.sparkSession.sparkContext.defaultParallelism)
        dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(f"{role}_id"), dv.alias(f"_{role}v"),
        ).withColumn(f"_{role}n", F.sqrt(_dot(F.col(f"_{role}v"),
                                              F.col(f"_{role}v"))))

    q, c = prep(queries, "query"), prep(corpus, "neighbor")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim",
                    _dot(F.col("_queryv"), F.col("_neighborv"))
                    / (F.col("_queryn") * F.col("_neighborn")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def brute_topk_sql(q_table: str, c_table: str, dim: int, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    cos = cosine_sql(f"q.{vec_col}", f"c.{vec_col}", dim)
    return f"""
WITH scored AS (
  SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
         {cos} AS cosine_sim,
         row_number() OVER (PARTITION BY q.{id_col}
                            ORDER BY {cos} DESC, c.{id_col} ASC) AS rank
  FROM {q_table} q CROSS JOIN {c_table} c
  WHERE q.{id_col} != c.{id_col}
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM scored WHERE rank <= {k}
"""


def _signature(vec: Column, dim: int) -> Column:
    """ARRAY<INT> of sign bits against the N_PLANES hyperplanes."""
    bits = []
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in _plane(p, dim)])
        dv = F.transform(vec, lambda x: x.cast("double"))
        bits.append(F.when(_dot(dv, plane) >= 0, 1).otherwise(0))
    return F.array(*bits)


def lsh_signatures(df: DataFrame, dim: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, sig ARRAY<INT>, bucket STRING) — map-only signature stage.
    Input repartitioned to cluster parallelism: small single-file
    inputs would otherwise single-thread the hyperplane dot products."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sig = _signature(F.col(vec_col), dim)
    return df.select(
        F.col(id_col), F.col(vec_col), sig.alias("sig"),
        F.concat_ws("", *[F.element_at(sig, i + 1).cast("string")
                          for i in range(N_PLANES)]).alias("bucket"))


def lsh_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: candidates share at least one BAND_BITS-bit band of
    the hyperplane signature (multi-probe banding — recall knob), then
    exact cosine re-rank. Join key is (band_idx, band_bits): uniform,
    shuffle-friendly, no cross join anywhere.

    Shuffle discipline: the band join and the candidate `distinct()`
    carry ONLY ids — vectors would otherwise cross the wire once per
    band match AND sit inside the dedup's shuffle key (the round-1
    scale bug). Embeddings are joined back exactly once per unique
    candidate pair for the re-rank: query vectors via a broadcast
    (query set is small by contract), corpus vectors via one hash join
    on neighbor_id."""
    n_bands = N_PLANES // BAND_BITS

    def banded(df: DataFrame, role: str) -> DataFrame:
        s = lsh_signatures(df, dim, id_col, vec_col)
        return s.select(
            F.col(id_col).alias(f"{role}_id"),
            F.posexplode(F.array(*[
                F.concat_ws("", *[
                    F.element_at(F.col("sig"), b * BAND_BITS + i + 1)
                    .cast("string") for i in range(BAND_BITS)])
                for b in range(n_bands)
            ])).alias("band_idx", "band_bits"))

    # id-only candidate generation + dedup (narrow shuffles)
    cand = (
        banded(queries, "query").join(banded(corpus, "neighbor"),
                                      ["band_idx", "band_bits"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # vectors join back once per unique pair; norms are precomputed
    # once per VECTOR before the join (N + M sqrt-dots, not 2 more per
    # candidate pair) — same arithmetic as brute_topk's prep, so the
    # cosine value (hence the oracle hash) is bit-identical
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        dv.alias("_queryv")) \
        .withColumn("_queryn", F.sqrt(_dot(F.col("_queryv"),
                                           F.col("_queryv"))))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       dv.alias("_neighborv")) \
        .withColumn("_neighborn", F.sqrt(_dot(F.col("_neighborv"),
                                              F.col("_neighborv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine_sim", _dot(F.col("_queryv"), F.col("_neighborv"))
                    / (F.col("_queryn") * F.col("_neighborn")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def embedding_near_dup_pairs(df: DataFrame, dim: int,
                             threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate detection: unordered id pairs
    (id_a < id_b) sharing at least one LSH band whose exact cosine
    meets the threshold. Candidate generation and dedup carry ONLY ids
    (one uniform band-key shuffle + one id-pair distinct); vectors join
    back once per unique pair for the exact verify — the corpus-scale
    member of the dedup family (docdedup.py covers text sketches)."""
    n_bands = N_PLANES // BAND_BITS

    def banded(role: str) -> DataFrame:
        s = lsh_signatures(df, dim, id_col, vec_col)
        return s.select(
            F.col(id_col).alias(role),
            F.posexplode(F.array(*[
                F.concat_ws("", *[
                    F.element_at(F.col("sig"), b * BAND_BITS + i + 1)
                    .cast("string") for i in range(BAND_BITS)])
                for b in range(n_bands)
            ])).alias("band_idx", "band_bits"))

    cand = (
        banded("id_a").join(banded("id_b"), ["band_idx", "band_bits"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # per-vector norms precomputed before the join (see lsh_topk)
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    va = df.select(F.col(id_col).alias("id_a"), dv.alias("_va")) \
        .withColumn("_na", F.sqrt(_dot(F.col("_va"), F.col("_va"))))
    vb = df.select(F.col(id_col).alias("id_b"), dv.alias("_vb")) \
        .withColumn("_nb", F.sqrt(_dot(F.col("_vb"), F.col("_vb"))))
    cos = (_dot(F.col("_va"), F.col("_vb"))
           / (F.col("_na") * F.col("_nb")))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine_sim", cos)
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def embedding_near_dup_sql(table: str, dim: int, threshold: float = 0.9,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> str:
    """DuckDB twin of embedding_near_dup_pairs (same planes/bands)."""
    n_bands = N_PLANES // BAND_BITS

    def dot_plane(vec: str, p: int) -> str:
        plane = _plane(p, dim)
        terms = " + ".join(f"{vec}[{d + 1}]::DOUBLE * ({plane[d]!r})"
                           for d in range(dim))
        return f"(0.0 + {terms})"

    def bit(vec: str, p: int) -> str:
        return f"CASE WHEN {dot_plane(vec, p)} >= 0 THEN '1' ELSE '0' END"

    def band_rows(role: str) -> str:
        sels = []
        for b in range(n_bands):
            key = " || ".join(bit(vec_col, b * BAND_BITS + i)
                              for i in range(BAND_BITS))
            sels.append(
                f"SELECT {id_col} AS {role}, {b} AS band_idx, "
                f"{key} AS band_bits FROM {table}")
        return " UNION ALL ".join(sels)

    cos = cosine_sql(f"a.{vec_col}", f"b.{vec_col}", dim)
    return f"""
WITH ba AS ({band_rows('id_a')}),
bb AS ({band_rows('id_b')}),
cand AS (
  SELECT DISTINCT id_a, id_b
  FROM ba JOIN bb ON ba.band_idx = bb.band_idx
                 AND ba.band_bits = bb.band_bits
  WHERE id_a < id_b
)
SELECT id_a, id_b, {cos} AS cosine_sim
FROM cand
JOIN {table} a ON a.{id_col} = cand.id_a
JOIN {table} b ON b.{id_col} = cand.id_b
WHERE {cos} >= {threshold}
"""


def lsh_topk_sql(q_table: str, c_table: str, dim: int, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB twin of lsh_topk (same planes, bands, re-rank)."""
    n_bands = N_PLANES // BAND_BITS

    def dot_plane(vec: str, p: int) -> str:
        plane = _plane(p, dim)
        terms = " + ".join(f"{vec}[{d + 1}]::DOUBLE * ({plane[d]!r})"
                           for d in range(dim))
        return f"(0.0 + {terms})"

    def bit(vec: str, p: int) -> str:
        return f"CASE WHEN {dot_plane(vec, p)} >= 0 THEN '1' ELSE '0' END"

    def band_rows(table: str, role: str) -> str:
        sels = []
        for b in range(n_bands):
            key = " || ".join(bit(vec_col, b * BAND_BITS + i)
                              for i in range(BAND_BITS))
            sels.append(
                f"SELECT {id_col} AS {role}_id, {vec_col} AS {role}_v, "
                f"{b} AS band_idx, {key} AS band_bits FROM {table}")
        return " UNION ALL ".join(sels)

    cos = cosine_sql("query_v", "neighbor_v", dim)
    return f"""
WITH qb AS ({band_rows(q_table, 'query')}),
cb AS ({band_rows(c_table, 'neighbor')}),
cand AS (
  SELECT DISTINCT query_id, neighbor_id, query_v, neighbor_v
  FROM qb JOIN cb ON qb.band_idx = cb.band_idx
                 AND qb.band_bits = cb.band_bits
  WHERE query_id != neighbor_id
),
scored AS (
  SELECT query_id, neighbor_id, {cos} AS cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {cos} DESC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM scored WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

NLIST = 16             # cells; scale as ~sqrt(N) on a real corpus
NPROBE = 4             # cells probed per query — the recall knob
PIVOT_MOD = 1_000_003  # hash-systematic pivot selection modulus


def _pivot_key(id_col: Column) -> Column:
    """Deterministic pivot-selection key: (id * KNUTH) % PIVOT_MOD.
    Plain integer arithmetic (no engine-specific hash) so the DuckDB
    twin computes the identical ordering. Domain note: ids must stay
    below ~3.4e9 to avoid 64-bit overflow in the multiply; at larger
    id spaces switch the key to pmod(id, PIVOT_MOD) * KNUTH % ... on
    pre-bucketed ids (documented, not needed at sandbox scale)."""
    return F.pmod(id_col.cast("long") * F.lit(KNUTH), F.lit(PIVOT_MOD))


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Driver-side dot with the SAME left-fold order as ``_dot`` /
    ``cosine_sql`` so pivot norms are bit-identical across engines."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def ivf_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nlist: int = NLIST, nprobe: int = NPROBE) -> DataFrame:
    """IVF ANN top-k: (query_id, neighbor_id, rank, cosine_sim).

    Index build: NLIST pivot vectors are the corpus rows with the
    smallest hash-systematic key (TakeOrdered — one narrow top-k job,
    NLIST rows to the driver). Every corpus vector is assigned to its
    max-cosine pivot ENTIRELY map-side against the broadcast pivot
    literals — no shuffle, no cross join, no iteration; the inverted
    "list" is just a column. Query: the NPROBE highest-cosine cells
    are probed, so the re-rank touches ~nprobe/nlist of the corpus.

    Scale: the only shuffles are the (list_id) candidate equi-join and
    the per-query top-k window — both keyed uniformly (cells are
    hash-balanced pivots). At 10^10 vectors raise nlist toward
    sqrt(N); assignment cost is O(N * nlist * dim) map-side, the probe
    join is never quadratic. A Lloyd-refinement of the pivots is a
    drop-in (re-collect, re-assign) but is deliberately NOT the
    default: the unrefined index is a pure function of the data, which
    keeps the cross-engine oracle exact.
    """
    import math as _math

    pivots = (corpus
              .orderBy(_pivot_key(F.col(id_col)), F.col(id_col))
              .limit(nlist)
              .select(id_col, vec_col)
              .collect())
    pvecs = [[float(x) for x in r[vec_col]] for r in pivots]
    pnorms = [_math.sqrt(_fold_dot(v, v)) for v in pvecs]

    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def with_cells(df: DataFrame, role: str) -> DataFrame:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        df = df.select(F.col(id_col).alias(f"{role}_id"),
                       dv.alias(f"_{role}v"))
        df = df.withColumn(f"_{role}n",
                           F.sqrt(_dot(F.col(f"_{role}v"),
                                       F.col(f"_{role}v"))))
        pcos = F.array(*[
            _dot(F.col(f"_{role}v"),
                 F.array(*[F.lit(x) for x in pvecs[p]]))
            / (F.col(f"_{role}n") * F.lit(pnorms[p]))
            for p in range(nlist)])
        return df.withColumn("_pcos", pcos)

    # corpus: map-only argmax assignment (first index on ties == the
    # oracle's ORDER BY cos DESC, pidx ASC)
    c = (with_cells(corpus, "neighbor")
         .withColumn("list_id",
                     F.array_position(F.col("_pcos"),
                                      F.array_max(F.col("_pcos")))
                     .cast("int"))
         .select("neighbor_id", "_neighborv", "_neighborn", "list_id"))

    # queries: NPROBE best cells each (sort by (-cos, pidx) — Spark
    # normalizes -0.0 == 0.0 in comparisons, matching the oracle)
    probe_structs = F.array(*[
        F.struct((-F.element_at(F.col("_pcos"), p + 1)).alias("d"),
                 F.lit(p + 1).alias("p"))
        for p in range(nlist)])
    q = (with_cells(queries, "query")
         .withColumn("list_id",
                     F.explode(F.transform(
                         F.slice(F.array_sort(probe_structs), 1, nprobe),
                         lambda s: s["p"].cast("int"))))
         .select("query_id", "_queryv", "_queryn", "list_id"))

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim",
                    _dot(F.col("_queryv"), F.col("_neighborv"))
                    / (F.col("_queryn") * F.col("_neighborn")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def ivf_topk_sql(q_table: str, c_table: str, dim: int, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 nlist: int = NLIST, nprobe: int = NPROBE) -> str:
    """DuckDB twin of ivf_topk (same pivots, assignment, probes)."""
    key = f"({id_col} * {KNUTH}) % {PIVOT_MOD}"
    cos_cp = cosine_sql(f"c.{vec_col}", "p.pv", dim)
    cos_qp = cosine_sql(f"q.{vec_col}", "p.pv", dim)
    cos_qn = cosine_sql("qv", "nv", dim)
    return f"""
WITH piv AS (
  SELECT row_number() OVER (ORDER BY {key}, {id_col}) AS pidx,
         {vec_col} AS pv
  FROM (SELECT {id_col}, {vec_col} FROM {c_table}
        ORDER BY {key}, {id_col} LIMIT {nlist})
),
assign AS (
  SELECT neighbor_id, nv, list_id FROM (
    SELECT c.{id_col} AS neighbor_id, c.{vec_col} AS nv, p.pidx AS list_id,
           row_number() OVER (PARTITION BY c.{id_col}
                              ORDER BY {cos_cp} DESC, p.pidx ASC) AS rn
    FROM {c_table} c CROSS JOIN piv p) WHERE rn = 1
),
probe AS (
  SELECT query_id, qv, list_id FROM (
    SELECT q.{id_col} AS query_id, q.{vec_col} AS qv, p.pidx AS list_id,
           row_number() OVER (PARTITION BY q.{id_col}
                              ORDER BY {cos_qp} DESC, p.pidx ASC) AS rn
    FROM {q_table} q CROSS JOIN piv p) WHERE rn <= {nprobe}
),
scored AS (
  SELECT query_id, neighbor_id, {cos_qn} AS cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {cos_qn} DESC, neighbor_id ASC) AS rank
  FROM probe JOIN assign USING (list_id)
  WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM scored WHERE rank <= {k}
"""
