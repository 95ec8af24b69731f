"""Wave-2 query registry: dedup / similarity / text analysis (training-data
pipeline operators) — registered into the same QUERIES/ORACLES maps."""

from __future__ import annotations

from pyspark.sql import functions as F

from lagespark import oracles
from lagespark.harness import ORACLES, QUERIES, T, points_df, q
from lagespark.operators import dedup, similarity, spatial, text


@q(
    "q69-geo-knn-points",
    "WITH pts AS (" + oracles.POINTS_SELECT + "), "
    "q AS (SELECT * FROM pts WHERE pid % 101 = 0), "
    "cand AS (SELECT q.pid AS qid, t.pid AS nn_id, "
    "ROUND(SQRT(POWER(q.x - t.x, 2) + POWER(q.y - t.y, 2)), 6) AS dist "
    "FROM q, pts t WHERE t.pid <> q.pid) "
    "SELECT qid, nn_id, dist, CAST(rank AS INT) AS rank FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, nn_id) AS rank "
    "FROM cand) WHERE rank <= 3",
)
def q69(spark, sf):
    """EXACT data-scale point×point kNN join (ring-expansion over grid
    cells; neither side broadcast; density-adaptive cell size) — oracle is
    the quadratic window-rank."""
    pts = points_df(spark, sf)
    qs = pts.filter(F.col("pid") % 101 == 0)
    return spatial.knn_join_points(qs, pts, k=3)

# ===========================================================================
# deduplication
# ===========================================================================


@q(
    "q70-dedup-exact",
    "WITH all_docs AS (SELECT * FROM documents UNION ALL "
    "SELECT * FROM documents WHERE doc_id % 10 = 0) "
    "SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keeper "
    "FROM all_docs GROUP BY md5(text) HAVING COUNT(*) > 1",
)
def q70(spark, sf):
    """Exact dedup (hash-groupBy). The harness documents are all unique, so
    known duplicates are injected by unioning a deterministic sample."""
    d = T(spark, sf, "documents")
    dup = d.filter(F.col("doc_id") % 10 == 0)
    return dedup.exact_dedup(d.unionByName(dup))


@q(
    "q71-dedup-ngram-jaccard",
    "WITH s AS (SELECT doc_id, " + dedup.shingles_sql("text", 3) + " AS sh "
    "FROM documents WHERE doc_id < 150) "
    "SELECT a.doc_id AS a, b.doc_id AS b, "
    "ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
    "len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard "
    "FROM s a, s b WHERE a.doc_id < b.doc_id "
    "AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
    "len(list_distinct(list_concat(a.sh, b.sh))) >= 0.62",
)
def q71(spark, sf):
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 150)
    return dedup.ngram_jaccard_pairs(d, n=3, threshold=0.62)


@q(
    "q72-dedup-minhash-lsh",
    dedup.minhash_pairs_sql(perms=8, band_rows=2, n=3, source="documents"),
)
def q72(spark, sf):
    return dedup.minhash_pairs(T(spark, sf, "documents"), perms=8, band_rows=2, n=3)


@q("q72b-dedup-minhash-fast")  # production path (xxhash64 int64 sigs) → rows-only
def q72b(spark, sf):
    """MinHash+LSH on native int64 xxhash64 signatures — the 100 TB path
    (the md5-hex variant q72 exists for oracle portability). Same plan
    shape; candidate-set equivalence vs q72 is asserted in tests."""
    return dedup.minhash_pairs_fast(
        T(spark, sf, "documents"), perms=8, band_rows=2, n=3
    )


@q("q71b-dedup-lsh-jaccard")  # approx recall (LSH candidates) → rows-only
def q71b(spark, sf):
    """Production dedup pipeline: LSH candidates → exact Jaccard refine —
    only candidate pairs pay the quadratic set comparison. Precision is
    exact; recall (LSH) asserted on injected duplicates in tests."""
    d = T(spark, sf, "documents")
    dup = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return dedup.minhash_jaccard_pairs(d.unionByName(dup), threshold=0.62)


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"{e} AS {a}" for a, e in dedup.simhash_vote_exprs(16, "duckdb")
    )
    val = dedup.simhash_value_sql(16)
    return (
        "WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents), v AS (SELECT doc_id, "
        + votes
        + " FROM words GROUP BY doc_id) "
        f"SELECT doc_id, {val} AS simhash FROM v"
    )


@q("q73-dedup-simhash", _simhash_oracle())
def q73(spark, sf):
    d = T(spark, sf, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    v = words.groupBy("doc_id").agg(
        *[F.expr(e).alias(a) for a, e in dedup.simhash_vote_exprs(16, "spark")]
    )
    return v.selectExpr("doc_id", dedup.simhash_value_sql(16) + " AS simhash")


@q(
    "q74-dedup-embed-cosine",
    "SELECT a.vec_id AS a, b.vec_id AS b, "
    "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos "
    "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id "
    "AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.3",
)
def q74(spark, sf):
    """Embedding-cosine near-duplicate pairs (vectorized matmul per batch)."""
    e = T(spark, sf, "embeddings")
    return similarity.cosine_pairs(e, threshold=0.3)


@q(
    "q82b-dedup-simhash-pairs",
    "WITH v AS (" + _simhash_oracle() + ") "
    "SELECT a.doc_id AS a, b.doc_id AS b, "
    "CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming "
    "FROM v a, v b WHERE a.doc_id < b.doc_id "
    "AND bit_count(xor(a.simhash, b.simhash)) <= 2",
)
def q82b(spark, sf):
    """SimHash near-dup pairs via pigeonhole banding (hamming ≤ 2 ⇒ one of 3
    disjoint chunks equal): equi-join on (band, chunk), refine with NATIVE
    bit_count/xor — no all-pairs join, no Python anywhere."""
    sh = q73(spark, sf)
    return dedup.hamming_pairs(sh, "simhash", id_col="doc_id", bits=16, max_hamming=2)


def _components_oracle() -> str:
    """Connected components of the high-similarity pair graph via a
    recursive transitive-closure CTE (node set is small at harness scale;
    the Spark side is the scalable label-propagation loop)."""
    pairs = (
        "SELECT a.doc_id AS a, b.doc_id AS b FROM s a, s b "
        "WHERE a.doc_id < b.doc_id AND "
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
        "len(list_distinct(list_concat(a.sh, b.sh))) >= 0.65"
    )
    return (
        "WITH RECURSIVE s AS (SELECT doc_id, " + dedup.shingles_sql("text", 3)
        + " AS sh FROM documents WHERE doc_id < 120), "
        "p AS (" + pairs + "), "
        "e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p), "
        "reach AS ("
        "  SELECT u, v FROM e"
        "  UNION"
        "  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u"
        ") "
        "SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u"
    )


@q("q81-dedup-components", _components_oracle())
def q81(spark, sf):
    """Duplicate clusters: LSH/Jaccard pairs → connected components by
    iterative min-label propagation (the canonical-representative step of a
    dedup pipeline)."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 120)
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.65)
    return dedup.duplicate_components(pairs.select("a", "b"))


# ===========================================================================
# similarity search
# ===========================================================================


@q("q74b-dedup-embed-cosine-lsh")  # approx recall (sign-LSH buckets) → rows-only
def q74b(spark, sf):
    """Embedding near-dup pairs at SCALE: sign-LSH bucket self-join + exact
    cosine refine (q74 is the bounded exact baseline). Injected-duplicate
    recall asserted in tests."""
    e = T(spark, sf, "embeddings")
    dup = e.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    return similarity.cosine_pairs_lsh(e.unionByName(dup), threshold=0.85)


@q(
    "q75-ann-topk",
    "WITH qs AS (SELECT * FROM embeddings WHERE vec_id % 25 = 0), "
    "cand AS (SELECT q.vec_id AS qid, t.vec_id AS nn_id, "
    "ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[])), 6) AS cos "
    "FROM qs q, embeddings t WHERE q.vec_id <> t.vec_id) "
    "SELECT qid, nn_id, cos, CAST(rank AS INT) AS rank FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nn_id) "
    "AS rank FROM cand) WHERE rank <= 5",
)
def q75(spark, sf):
    """Brute-force cosine top-k (exact baseline for ANN)."""
    e = T(spark, sf, "embeddings")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    return similarity.cosine_topk(qs, e, k=5, round_to=6)


@q("q76-ann-lsh")  # approximate (seeded hyperplanes) → rows-only check
def q76(spark, sf):
    """Random-hyperplane LSH buckets + exact refine — the shuffle-based scale
    path; recall vs q75 is asserted in tests."""
    e = T(spark, sf, "embeddings")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    # planes ≈ log2(N / desired_bucket_size); multi-table OR-amplification
    # for recall (>= 0.8 vs exact q75 at the defaults — asserted in tests)
    return similarity.lsh_topk(qs, e, k=5)


@q("q76b-ann-ivf")  # approximate (k-means index) → rows-only check
def q76b(spark, sf):
    """IVF approximate top-k (second ANN scale path): k-means bucket index,
    multi-probe queries, exact refine; recall vs q75 asserted in tests."""
    e = T(spark, sf, "embeddings")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    return similarity.ivf_topk(qs, e, k=5)


@q("q76c-ann-pq")  # approximate (quantized codes) → rows-only check
def q76c(spark, sf):
    """Product-quantization ANN (third scale path): per-subspace codebooks,
    4-byte codes, asymmetric-distance scan over broadcast query LUTs, exact
    re-rank of the shortlist; recall vs q75 asserted in tests."""
    e = T(spark, sf, "embeddings")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    return similarity.pq_topk(qs, e, k=5, m_sub=16, ks=32, rerank=50)


# ===========================================================================
# text analysis
# ===========================================================================


@q(
    "q77-text-langid",
    "SELECT doc_id, " + text.langid_expr("text", "duckdb") + " AS lang_pred "
    "FROM documents",
)
def q77(spark, sf):
    d = T(spark, sf, "documents")
    return d.selectExpr("doc_id", text.langid_expr("text", "spark") + " AS lang_pred")


def _quality_oracle() -> str:
    ex = text.quality_exprs("text", "duckdb")
    cols = ", ".join(f"{v} AS {k}" for k, v in ex.items())
    return f"SELECT doc_id, {cols} FROM documents"


@q("q78-text-quality", _quality_oracle())
def q78(spark, sf):
    d = T(spark, sf, "documents")
    ex = text.quality_exprs("text", "spark")
    return d.selectExpr("doc_id", *[f"{v} AS {k}" for k, v in ex.items()])


@q(
    "q79-text-tokens",
    "SELECT doc_id, "
    + text.token_count_ws_expr("text", "duckdb")
    + " AS n_ws_tokens, "
    + text.token_count_bpeish_expr("text", "duckdb")
    + " AS n_bpeish_tokens FROM documents",
)
def q79(spark, sf):
    d = T(spark, sf, "documents")
    return d.selectExpr(
        "doc_id",
        text.token_count_ws_expr("text", "spark") + " AS n_ws_tokens",
        text.token_count_bpeish_expr("text", "spark") + " AS n_bpeish_tokens",
    )


@q(
    "q80-text-fingerprint",
    "SELECT doc_id, " + text.fingerprint_expr("text", "duckdb") + " AS fp "
    "FROM documents",
)
def q80(spark, sf):
    d = T(spark, sf, "documents")
    # fingerprint is the one CPU-heavy text projection (per-doc word sort)
    # and the documents parquet scans as ONE partition — spread first
    # (dedup._spread discipline; round 8: 1.9 s -> 0.35 s at sf0.1)
    return dedup._spread(d.select("doc_id", "text")).selectExpr(
        "doc_id", text.fingerprint_expr("text", "spark") + " AS fp"
    )


def _q96_oracle() -> str:
    """Kept docs = subset minus every non-representative cluster member
    (recursive transitive closure, same graph as q81)."""
    pairs = (
        "SELECT a.doc_id AS a, b.doc_id AS b FROM s a, s b "
        "WHERE a.doc_id < b.doc_id AND "
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
        "len(list_distinct(list_concat(a.sh, b.sh))) >= 0.65"
    )
    return (
        "WITH RECURSIVE s AS (SELECT doc_id, " + dedup.shingles_sql("text", 3)
        + " AS sh FROM documents WHERE doc_id < 120), "
        "p AS (" + pairs + "), "
        "e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p), "
        "reach AS (SELECT u, v FROM e UNION "
        "SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u), "
        "comp AS (SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u) "
        "SELECT doc_id FROM documents WHERE doc_id < 120 AND doc_id NOT IN "
        "(SELECT doc FROM comp WHERE doc <> component)"
    )


@q("q96-dedup-corpus", _q96_oracle())
def q96(spark, sf):
    """End-to-end dedup FILTER: near-dup pair graph → components → keep only
    each cluster's minimum id + all unclustered docs (dedup.dedup_corpus)."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 120)
    return dedup.dedup_corpus(d, threshold=0.65).select("doc_id")


@q(
    "q97-sample-hash",
    "SELECT doc_id FROM documents WHERE "
    + text.sample_hash_expr("text", "duckdb"),
)
def q97(spark, sf):
    """Deterministic content-hash sampling (~1/8): reproducible at any
    partitioning — the sampling primitive for corpus subsetting."""
    d = T(spark, sf, "documents")
    return d.filter(F.expr(text.sample_hash_expr("text", "spark"))).select("doc_id")


@q(
    "q98-text-normalize",
    "SELECT doc_id, " + text.normalize_expr("text", "duckdb") + " AS norm "
    "FROM documents",
)
def q98(spark, sf):
    d = T(spark, sf, "documents")
    return d.selectExpr("doc_id", text.normalize_expr("text", "spark") + " AS norm")


def _q99_oracle() -> str:
    lang = text.langid_expr("text", "duckdb")
    ws = text.token_count_ws_expr("text", "duckdb")
    return (
        f"SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_ws) AS BIGINT) AS total_tokens, "
        "ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_chars FROM ("
        f"SELECT {lang} AS lang, {ws} AS n_ws, length(text) AS n_chars "
        "FROM documents) GROUP BY lang"
    )


@q("q99-corpus-stats", _q99_oracle())
def q99(spark, sf):
    """Corpus rollup by predicted language — the reporting aggregate a data
    pipeline materializes after filtering."""
    d = T(spark, sf, "documents")
    lang = text.langid_expr("text", "spark")
    ws = text.token_count_ws_expr("text", "spark")
    per = d.selectExpr(
        f"{lang} AS lang", f"{ws} AS n_ws", "length(text) AS n_chars"
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").cast("long").alias("total_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 2).alias("avg_chars"),
    )
