"""Document-level deduplication for training-data pipelines.

The reference dedups exactly by content hash (cassandra_manager.py:
317-329, 412-414: sha256(content)[:16]); that is `exact_dedup` here.
Everything else is the scale path a 100 TB corpus needs and the
reference lacks: MinHash+LSH, SimHash, n-gram Jaccard, embedding
near-dup. All sketches run JVM-side (higher-order functions over the
cross-engine hash in functions.hashing — no Python UDFs), so the hot
path stays inside whole-stage codegen and the only shuffles are the
groupBy/band-join shuffles that define each algorithm.

Scale notes (10^10-doc design point):
- MinHash: signature build is map-only; the LSH band join shuffles
  (band_idx, band_key) — uniform by construction (hash keys), no skew.
- SimHash: pigeonhole blocking — hamming<=3 over 32 bits means at
  least one of 4 byte-chunks is equal, so candidate generation is 4
  equi-joins on 8-bit chunks, never a cross join.
- Embedding near-dup: random-hyperplane LSH buckets then exact cosine
  within bucket.

Each operator has a DuckDB-SQL twin (``*_sql``) generating the same
arithmetic for the driver's independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_K = 7
SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4          # 8-bit chunks -> catches hamming <= 3


# ---------------------------------------------------------------------------
# Exact dedup (the reference's semantics: sha256(content)[:16])
# ---------------------------------------------------------------------------

def _spread(df: DataFrame) -> DataFrame:
    """Repartition tiny inputs to the cluster's parallelism: a few-MB
    parquet file arrives as ONE split, which would single-thread the
    shingle fan-out (hundreds of shingles per row) no matter how many
    cores exist. The shuffle is on the small pre-explode rows — cheap."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """First-wins exact dedup on the reference's content hash
    (cassandra_manager.py:412-414). Map-side partial agg then one
    shuffle on the 16-hex-char hash — uniform keys, no skew."""
    fp = F.substring(F.sha2(F.col(text_col), 256), 1, 16)
    return (
        df.withColumn("content_hash", fp)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def exact_dedup_sql(table: str, id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    return (
        f"SELECT substring(sha256({text_col}), 1, 16) AS content_hash, "
        f"min({id_col}) AS {id_col}, count(*) AS n_copies "
        f"FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, sig_00..sig_NN): MinHash over distinct char-7-gram shingles.

    Spelled as explode → hash-aggregate of NUM_HASHES ``min`` functions
    rather than ``array_min(transform(...))``: higher-order array
    functions are interpreted (no whole-stage codegen) and were ~10x
    slower, while min-aggregates are codegen'd with map-side partial
    aggregation — one narrow shuffle keyed by doc id, linear at any
    corpus size."""
    norm = H.normalize_text(F.col(text_col))
    exploded = _spread(df).select(
        F.col(id_col),
        F.explode(H.char_shingles(norm, SHINGLE_K)).alias("_sh"),
    ).withColumn("_h", H.h31(F.col("_sh")))
    return exploded.groupBy(id_col).agg(
        *[F.min(H.perm(F.col("_h"), i)).alias(f"sig_{i:02d}")
          for i in range(NUM_HASHES)])


def minhash_signatures_sql(table: str, id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    nrm = H.normalize_text_sql(text_col)
    sh = H.char_shingles_sql(nrm, SHINGLE_K)
    sigs = ", ".join(
        f"list_min([{H.perm_sql('h', i)} for h in _hs]) AS sig_{i:02d}"
        for i in range(NUM_HASHES)
    )
    return (
        f"WITH base AS (SELECT {id_col}, "
        f"[{H.h31_sql('s')} for s in {sh}] AS _hs FROM {table}) "
        f"SELECT {id_col}, {sigs} FROM base"
    )


def _band_key(i: int):
    cols = [F.col(f"sig_{j:02d}")
            for j in range(i * ROWS_PER_BAND, (i + 1) * ROWS_PER_BAND)]
    return F.concat_ws(":", *[c.cast("string") for c in cols])


def minhash_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      threshold: float = 0.0,
                      top_k: int | None = 20) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact char-shingle
    Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    The band join shuffles only (band_idx, band_key) — at 10^10 docs
    each bucket holds the docs agreeing on one band, so the self-join
    is local per bucket and never quadratic in the corpus."""
    sigs = minhash_signatures(df, id_col, text_col)
    bands = sigs.select(
        id_col,
        F.posexplode(F.array(*[_band_key(i) for i in range(BANDS)]))
        .alias("band_idx", "band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
        # materialize once (O(dup pairs) rows): the pair set feeds both
        # the candidate-id broadcast and the verify join below, and
        # without the checkpoint each use would re-run the whole
        # signature + band-join pipeline. eager=False keeps plan
        # CONSTRUCTION lazy (explain/audit tooling pays nothing); the
        # block materializes at first action and is reused thereafter
        .localCheckpoint(eager=False)
    )
    pairs = _exact_jaccard(df, cand, id_col, text_col) \
        .where(F.col("jaccard") >= threshold)
    if top_k is not None:
        pairs = pairs.orderBy(F.col("jaccard").desc(), "id_a", "id_b") \
                     .limit(top_k)
    return pairs


def _exact_jaccard(df: DataFrame, cand: DataFrame, id_col: str,
                   text_col: str) -> DataFrame:
    """Exact char-shingle Jaccard for candidate (id_a, id_b) pairs via
    explode + count-common (codegen aggregates; the array_intersect
    spelling is interpreted and quadratic in shingle count). Pairs with
    zero common shingles are not produced (their jaccard is 0).

    Only CANDIDATE docs are shingled: a broadcast semi-join against the
    (tiny, checkpointed) candidate-id set prunes the corpus before the
    explode, so the verify fan-out and its join shuffles are
    O(candidate docs x shingles), not O(corpus x shingles) — at 10^10
    docs the verify cost tracks the dup density, not the corpus."""
    ids = (cand.select(F.col("id_a").alias("_id"))
           .unionByName(cand.select(F.col("id_b").alias("_id")))
           .distinct())
    docs_c = df.join(F.broadcast(ids),
                     F.col(id_col) == F.col("_id"), "semi")
    shing = _spread(docs_c).select(
        F.col(id_col).alias("_id"),
        F.explode(H.char_shingles(H.normalize_text(F.col(text_col)),
                                  SHINGLE_K)).alias("_sh"))
    sizes = shing.groupBy("_id").agg(F.count("*").alias("_n"))
    common = (
        cand.join(shing.withColumnRenamed("_id", "id_a"), "id_a")
        .join(shing.withColumnRenamed("_id", "id_b"), ["id_b", "_sh"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("_common"))
    )
    return (
        common
        .join(sizes.withColumnRenamed("_id", "id_a")
              .withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b")
              .withColumnRenamed("_n", "_nb"), "id_b")
        .select("id_a", "id_b",
                (F.col("_common").cast("double")
                 / (F.col("_na") + F.col("_nb") - F.col("_common")))
                .alias("jaccard"))
    )


def minhash_dup_pairs_sql(table: str, id_col: str = "doc_id",
                          text_col: str = "text",
                          threshold: float = 0.0,
                          top_k: int | None = 20) -> str:
    sig_sql = minhash_signatures_sql(table, id_col, text_col)
    band_selects = []
    for i in range(BANDS):
        key = " || ':' || ".join(
            f"cast(sig_{j:02d} as varchar)"
            for j in range(i * ROWS_PER_BAND, (i + 1) * ROWS_PER_BAND))
        band_selects.append(
            f"SELECT {id_col}, {i} AS band_idx, {key} AS band_key FROM sigs")
    nrm = H.normalize_text_sql(text_col)
    sh = H.char_shingles_sql(nrm, SHINGLE_K)
    lim = f"ORDER BY jaccard DESC, id_a, id_b LIMIT {top_k}" if top_k else ""
    return f"""
WITH sigs AS ({sig_sql}),
bands AS (
  {' UNION ALL '.join(band_selects)}
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.{id_col} < b.{id_col}
),
shing AS (SELECT {id_col}, {sh} AS sh FROM {table})
SELECT id_a, id_b,
       cast(len(list_intersect(sa.sh, sb.sh)) as double)
         / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
FROM cand
JOIN shing sa ON sa.{id_col} = cand.id_a
JOIN shing sb ON sb.{id_col} = cand.id_b
WHERE len(list_intersect(sa.sh, sb.sh)) > 0
  AND cast(len(list_intersect(sa.sh, sb.sh)) as double)
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= {threshold}
{lim}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, simhash): 32-bit SimHash over distinct word tokens.
    Map-only; bit-majority computed as a sum over the token-hash array
    per bit (JVM aggregate — no explode, no shuffle)."""
    df = _spread(df)
    norm = H.normalize_text(F.col(text_col))
    hs = F.transform(H.word_tokens(norm), lambda t: H.h32(t))
    def bit_sum(b: int):
        return F.aggregate(
            F.col("_hs"), F.lit(0),
            lambda acc, h: acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
    sim = None
    df = df.withColumn("_hs", hs)
    for b in range(SIMHASH_BITS):
        term = F.when(bit_sum(b) >= 0, F.lit(2 ** b).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return df.select(id_col, sim.alias("simhash"))


def simhash_sql(table: str, id_col: str = "doc_id",
                text_col: str = "text") -> str:
    nrm = H.normalize_text_sql(text_col)
    toks = H.word_tokens_sql(nrm)
    terms = []
    for b in range(SIMHASH_BITS):
        s = (f"list_reduce([CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END "
             f"for h in _hs], (x, y) -> x + y)")
        terms.append(f"CASE WHEN {s} >= 0 THEN {2 ** b}::BIGINT ELSE 0 END")
    return (
        f"WITH base AS (SELECT {id_col}, "
        f"[{H.h32_sql('t')} for t in {toks}] AS _hs FROM {table}) "
        f"SELECT {id_col}, {' + '.join(terms)} AS simhash FROM base"
    )


def simhash_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked by 8-bit
    chunks (pigeonhole: hamming <= 3 guarantees a shared chunk; wider
    radii trade recall). Returns (id_a, id_b, hamming)."""
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), 8 * c).bitwiseAND(F.lit(255))
            for c in range(SIMHASH_CHUNKS)
        ])).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(
                    F.col("b.simhash"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (blocked pairwise)
# ---------------------------------------------------------------------------

MAX_BLOCK_DOCS = 10_000


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", block_col: str = "source",
                        top_k: int = 20,
                        max_block_docs: int = MAX_BLOCK_DOCS) -> DataFrame:
    """Exact char-7-gram Jaccard for all pairs within a blocking key
    (e.g. same source/host) — the quadratic stays inside blocks.
    Returns the global top-k most-similar pairs (deterministic order).

    100 TB contract made explicit: this is the EXACT tool, and one
    pathological block (every doc sharing a boilerplate prefix) would
    re-create all-pairs inside it. ``max_block_docs`` caps block size
    with a LOUD in-plan failure — a broadcast-joined ``assert_true``
    gate on the shingle frame, so the self-join's input cannot leave
    the scan without passing the guard, no extra driver action, no
    eager count. Oversized blocks are a modeling error (pick a finer
    blocking key, or use minhash/simhash for that corpus), not
    something to silently grind through."""
    blk_guard = (
        df.groupBy(F.col(block_col).alias("_blk"))
        .agg(F.count("*").alias("_n_docs"))
        .select(
            "_blk",
            F.assert_true(
                F.col("_n_docs") <= F.lit(max_block_docs),
                F.concat(
                    F.lit("ngram_jaccard_pairs: block '"),
                    F.col("_blk").cast("string"),
                    F.lit(f"' holds "), F.col("_n_docs").cast("string"),
                    F.lit(f" docs > max_block_docs={max_block_docs}; "
                          "all-pairs inside one block would be "
                          "quadratic — use a finer blocking key or "
                          "minhash/simhash for this corpus"),
                )).alias("_chk"))
    )
    shing = _spread(df).select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("_id"),
        F.explode(H.char_shingles(H.normalize_text(F.col(text_col)),
                                  SHINGLE_K)).alias("_sh")) \
        .join(F.broadcast(blk_guard), "_blk") \
        .where(F.col("_chk").isNull()).drop("_chk")
    sizes = shing.groupBy("_blk", "_id").agg(F.count("*").alias("_n"))
    # co-occurrence join on (block, shingle): only pairs that share at
    # least one shingle materialize (jaccard-0 pairs never exist), and
    # the shuffle key is the shingle — codegen aggregates, no
    # interpreted array ops, no all-pairs blow-up within a block
    a, b = shing.alias("a"), shing.alias("b")
    common = (
        a.join(b, ["_blk", "_sh"])
        .where(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_common"))
    )
    pairs = (
        common
        .join(sizes.select(F.col("_id").alias("id_a"),
                           F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"),
                           F.col("_n").alias("_nb")), "id_b")
        .select("id_a", "id_b",
                (F.col("_common").cast("double")
                 / (F.col("_na") + F.col("_nb") - F.col("_common")))
                .alias("jaccard"))
    )
    return pairs.orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(top_k)


def ngram_jaccard_pairs_sql(table: str, id_col: str = "doc_id",
                            text_col: str = "text", block_col: str = "source",
                            top_k: int = 20) -> str:
    nrm = H.normalize_text_sql(text_col)
    sh = H.char_shingles_sql(nrm, SHINGLE_K)
    return f"""
WITH shing AS (SELECT {block_col} AS blk, {id_col}, {sh} AS sh FROM {table})
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       cast(len(list_intersect(a.sh, b.sh)) as double)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM shing a JOIN shing b ON a.blk = b.blk AND a.{id_col} < b.{id_col}
WHERE len(list_intersect(a.sh, b.sh)) > 0
ORDER BY jaccard DESC, id_a, id_b LIMIT {top_k}
"""


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components over dup pairs)
# ---------------------------------------------------------------------------

def dup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                 max_iters: int = 20) -> DataFrame:
    """Resolve pairwise duplicate edges into clusters: (doc_id,
    cluster_id) with cluster_id = the MIN doc id of the connected
    component — the canonical "keep one representative per dup group"
    step every corpus-dedup pipeline needs after pair generation.

    Iterative min-label propagation: each round every vertex takes the
    min of its own label and its neighbors' labels; converges in
    O(component diameter) rounds. Dup components are shallow (near-dup
    relations are locally transitive), so the loop terminates in a few
    iterations; ``max_iters`` bounds pathological chains, and the loop
    exits early at the fixpoint (a count per iteration — cheap, the
    label table is |vertices-in-pairs|, not |corpus|). At 10^10 pairs
    swap the propagation step for the large-star/small-star rewriting
    (same driver loop shape, fewer rounds on high-diameter graphs).

    A component whose diameter exceeds ``max_iters`` is never silently
    truncated: the loop ESCALATES to large-star/small-star rewriting
    (``star_components`` below, O(log^2 n) rounds regardless of
    diameter) and only raises if that too fails to converge."""
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    # each iteration MUST truncate lineage (localCheckpoint, not cache):
    # the labels plan references itself twice per round, so the logical
    # plan otherwise doubles every iteration and analysis OOMs the
    # driver around a dozen rounds. On a cluster use a reliable
    # checkpoint dir for fault tolerance; the loop shape is identical.
    labels = sym.select("src").distinct() \
                .withColumn("label", F.col("src")).localCheckpoint()
    for _ in range(max_iters):
        prop = sym.join(labels.withColumnRenamed("src", "dst"), "dst") \
                  .select("src", "label")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("src").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = new_labels.join(
            labels.withColumnRenamed("label", "_old"), "src"
        ).where(F.col("label") < F.col("_old")).count()
        labels = new_labels
        if changed == 0:
            break
    else:
        # high-diameter component: min-label would need O(diameter)
        # rounds; the star rewriting needs O(log^2 n) — switch.
        return star_components(sym)
    return labels.select(F.col("src").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def star_components(sym: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SOCC'14) — the 10^10-edge / high-diameter path promised by
    ``dup_clusters``. Converges in O(log^2 n) rounds independent of
    component diameter, so billion-long chains cost ~tens of rounds,
    not a round per hop.

    ``sym``: symmetric edge list (src, dst), self-loop-free or not.
    Returns (doc_id, cluster_id = component-min doc id) — identical to
    min-label output, so the DuckDB recursive-CTE oracle is unchanged.

    Each round is two grouped-min + join rewrites:
      large-star: every node u links each STRICTLY-LARGER neighbor to
        min(G(u) + {u}) — shrinks long tails toward local minima
        without ever orienting an edge away from the component min;
      small-star: every node u (over edges oriented u > v) links its
        smaller neighbors and itself to min(G-(u) + {u}) — flattens
        the partial trees into stars.
    Fixpoint: the small-star output is already a star forest rooted at
    component minima; detected when the canonical edge set stops
    changing (count + one-sided anti-join, two cheap jobs on the
    O(edges) frame). Lineage is truncated per round (localCheckpoint)
    for the same driver-OOM reason as the min-label loop."""
    edges = (sym.where(F.col("src") != F.col("dst"))
             .select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
             .distinct().localCheckpoint())
    verts = (sym.select(F.col("src").alias("doc_id"))
             .unionByName(sym.select(F.col("dst").alias("doc_id")))
             .distinct().localCheckpoint())
    n_prev = edges.count()
    for _ in range(max_iters):
        both = edges.select(F.col("a").alias("u"), F.col("b").alias("v")) \
            .unionByName(
                edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        lmin = both.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        large = (both.join(lmin, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("m").alias("a"), F.col("v").alias("b"))
                 .where(F.col("a") != F.col("b")).distinct())
        down = large.select(F.col("b").alias("u"), F.col("a").alias("v"))
        smin = down.groupBy("u").agg(F.min("v").alias("m"))
        joined = down.join(smin, "u")
        small = (
            joined.select(F.col("m").alias("a"), F.col("v").alias("b"))
            .unionByName(
                joined.select(F.col("m").alias("a"), F.col("u").alias("b")))
            .where(F.col("a") != F.col("b")).distinct().localCheckpoint())
        n_new = small.count()
        if n_new == n_prev and \
                small.join(edges, ["a", "b"], "left_anti").isEmpty():
            edges = small
            break
        edges, n_prev = small, n_new
    else:
        raise RuntimeError(
            f"star_components did not converge in {max_iters} rounds")
    return (verts.join(edges.select(F.col("b").alias("doc_id"),
                                    F.col("a").alias("_c")),
                       "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("_c"),
                               F.col("doc_id")).alias("cluster_id")))


def dup_clusters_star(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b") -> DataFrame:
    """``dup_clusters`` forced through the large-star/small-star path
    unconditionally (no min-label attempt first). Same input contract
    (pairwise dup edges) and same output contract (doc_id, cluster_id =
    component-min doc id), so ``dup_clusters_sql`` is its oracle too —
    exposed as its own query so the O(log^2 n) scale path is verified
    end-to-end against DuckDB on real pair data, not only via the
    escalation branch and synthetic pytest graphs.

    No pre-symmetrization: star_components canonicalizes edges via
    least/greatest and collects vertices from both columns, so a
    reversed-edge union would only double the pre-distinct edge frame
    (round-4 ADVICE)."""
    return star_components(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")))


def dup_clusters_sql(pairs_sql: str, id_a: str = "id_a",
                     id_b: str = "id_b") -> str:
    """DuckDB twin of dup_clusters: transitive closure by recursive CTE
    (components are small, so the closure is bounded), then min per
    vertex."""
    return f"""
WITH RECURSIVE _pairs AS ({pairs_sql}),
sym AS (
  SELECT {id_a} AS s, {id_b} AS d FROM _pairs
  UNION SELECT {id_b}, {id_a} FROM _pairs
),
reach(s, d) AS (
  SELECT s, d FROM sym
  UNION SELECT s, s FROM sym
  UNION SELECT r.s, x.d FROM reach r JOIN sym x ON r.d = x.s
)
SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
"""
