"""Wave-4 query registry: streaming operators in batch mode (the
batch-equivalence half of SURVEY.md §5 item 6; streaming execution itself is
exercised in tests/test_streaming.py with real readStream/availableNow)."""

from __future__ import annotations

from lagespark import oracles
from lagespark.harness import T, q
from lagespark.streaming import ops


@q(
    "q90-stream-tumble",
    "SELECT CAST(epoch_us(time_bucket(INTERVAL 10 MINUTES, ts)) AS BIGINT) "
    "AS win_start_us, COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
    "FROM events GROUP BY win_start_us",
)
def q90(spark, sf):
    return ops.tumbling_counts(T(spark, sf, "events"))


@q(
    "q91-stream-slide",
    # sliding windows = union of the two phase-shifted tumbling bucketings
    "WITH b AS (SELECT CAST(epoch_us(time_bucket(INTERVAL 10 MINUTES, ts)) AS BIGINT)"
    " AS s FROM events UNION ALL "
    "SELECT CAST(epoch_us(time_bucket(INTERVAL 10 MINUTES, ts - INTERVAL 5 MINUTES)) "
    "AS BIGINT) + 300000000 AS s FROM events) "
    "SELECT s AS win_start_us, COUNT(*) AS n FROM b GROUP BY s",
)
def q91(spark, sf):
    return ops.sliding_counts(T(spark, sf, "events"))


@q(
    "q92-stream-session",
    # gaps-and-islands session reconstruction (5-minute gap). Spark's
    # session_window is half-open [start, start+gap): a gap EXACTLY equal to
    # the window breaks the session — so the oracle breaks on >= too
    "WITH o AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
    "(PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTES OR LAG(ts) OVER "
    "(PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk "
    "FROM events), s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
    "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess FROM o) "
    "SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS sess_start_us, "
    "COUNT(*) AS n FROM s GROUP BY user_id, sess",
)
def q92(spark, sf):
    return ops.session_counts(T(spark, sf, "events"))


@q(
    "q94-stream-stream-join",
    "WITH c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM events "
    "WHERE event_type = 'click'), "
    "s AS (SELECT event_id AS signup_id, user_id, ts AS s_ts FROM events "
    "WHERE event_type = 'signup') "
    "SELECT c.click_id, s.signup_id, c.user_id, "
    "CAST(epoch_us(c.c_ts) AS BIGINT) AS click_us, "
    "CAST(epoch_us(s.s_ts) AS BIGINT) AS signup_us "
    "FROM c JOIN s ON c.user_id = s.user_id AND s.s_ts <= c.c_ts "
    "AND s.s_ts >= c.c_ts - INTERVAL 30 MINUTES",
)
def q94(spark, sf):
    """Stream-stream interval join in batch mode (streaming execution with
    watermarks on both sides is tested in tests/test_streaming.py)."""
    return ops.clicks_after_signup(T(spark, sf, "events"))


@q(
    "q95-spatiotemporal-rollup",
    "SELECT CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS "
    "hour_us, " + oracles.zone_case_sql(
        "((event_id * 9973) % 100000) / 10.0 + 0.05",
        "((event_id * 7919) % 100000) / 10.0 + 0.05",
    )
    + " AS zone, COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
    "FROM events GROUP BY hour_us, zone",
)
def q95(spark, sf):
    """Spatiotemporal rollup: Lagefaktor zone × hour bucket — the composite
    continuous-aggregate shape (cell/zone key + time bucket) a monitoring
    pipeline materializes incrementally."""
    from pyspark.sql import functions as F

    # `ts` threads through zone_of_events' projection — no second scan of
    # events / self-join on event_id to recover it (round-6 plan fix)
    z = ops.zone_of_events(
        T(spark, sf, "events").select("event_id", "ts", "event_type", "value"),
        keep=("ts",),
    )
    return (
        z.groupBy(
            F.unix_micros(
                F.date_trunc("hour", F.col("ts").cast("timestamp"))
            ).alias("hour_us"),
            "zone",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@q(
    "q93-stream-geo",
    "SELECT zone, event_type, COUNT(*) AS n FROM (SELECT event_type, "
    + oracles.zone_case_sql(
        "((event_id * 9973) % 100000) / 10.0 + 0.05",
        "((event_id * 7919) % 100000) / 10.0 + 0.05",
    )
    + " AS zone FROM events) GROUP BY zone, event_type",
)
def q93(spark, sf):
    from pyspark.sql import functions as F

    z = ops.zone_of_events(T(spark, sf, "events"))
    return z.groupBy("zone", "event_type").agg(F.count(F.lit(1)).alias("n"))


# ===========================================================================
# decontamination (round 4): benchmark-overlap removal for training corpora
# ===========================================================================

from pyspark.sql import functions as F  # noqa: E402

from lagespark.operators import dedup as _dedup  # noqa: E402

_DECON_N = 20
_DECON_SH = _dedup.shingles_sql("text", _DECON_N)

@q(
    "q100-decontaminate",
    "WITH bm AS (SELECT DISTINCT sh FROM (SELECT unnest(" + _DECON_SH + ") AS sh "
    "FROM documents WHERE doc_id % 97 = 0) WHERE sh IS NOT NULL), "
    "c AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(" + _DECON_SH + ") AS sh "
    "FROM documents WHERE doc_id % 97 <> 0)) "
    "SELECT c.doc_id, COUNT(*) AS n_hits FROM c JOIN bm USING (sh) GROUP BY c.doc_id",
)
def q100(spark, sf):
    """Test-set decontamination: flag corpus docs sharing any 20-char
    shingle with the benchmark subset (doc_id % 97 = 0) — broadcast
    semi-join of the benchmark shingle set; corpus never shuffles."""
    d = T(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return _dedup.decontaminate(corpus, bench, n=_DECON_N)


# ===========================================================================
# document packing (round 4): sequence packing for training batches
# ===========================================================================

from lagespark.operators import text as _text  # noqa: E402

_PACK_BUDGET = 512  # whitespace tokens per pack
_PACK_SHARD = ("lang", "bucket")  # language × 16-way hash sub-shard


def _q101_oracle() -> str:
    lang = _text.langid_expr("text", "duckdb")
    tok = _text.token_count_ws_expr("text", "duckdb")
    bucket = _text.pack_bucket_expr("doc_id", "duckdb")
    running, pack_id = _text.pack_exprs("tok", _PACK_SHARD, "doc_id", _PACK_BUDGET)
    base = (
        f"SELECT doc_id, {lang} AS lang, {bucket} AS bucket, "
        f"CASE WHEN text IS NULL THEN 0 ELSE CAST({tok} AS BIGINT) END AS tok "
        "FROM documents"
    )
    run = f"SELECT lang, bucket, tok, {running} AS running FROM ({base})"
    packed = f"SELECT lang, bucket, {pack_id} AS pack_id, tok FROM ({run})"
    return (
        "SELECT lang, bucket, pack_id, COUNT(*) AS n_docs, "
        f"CAST(SUM(tok) AS BIGINT) AS total_tokens FROM ({packed}) "
        "GROUP BY lang, bucket, pack_id"
    )


@q("q101-doc-pack", _q101_oracle())
def q101(spark, sf):
    """Sequence PACKING for training batches: greedy cumulative-token
    chunking — doc d joins pack floor(tokens_before_d / budget), i.e. docs
    concatenate in deterministic (doc_id) order until the budget spills
    into the next pack (packs may overrun by one doc; the concat-and-chunk
    semantics real pipelines use). The running sum is a per-(language,
    hash-bucket) window — pack_bucket_expr's 16-way md5 sub-shard bounds any
    reducer's input at corpus/16 even for a monolingual corpus, so the
    window is never a global (or per-language) total order at 100 TB; the
    bucket count is the parallelism knob."""
    from pyspark.sql import functions as F

    lang = _text.langid_expr("text", "spark")
    tok = _text.token_count_ws_expr("text", "spark")
    bucket = _text.pack_bucket_expr("doc_id", "spark")
    base = T(spark, sf, "documents").selectExpr(
        "doc_id",
        f"{lang} AS lang",
        f"{bucket} AS bucket",
        f"CASE WHEN text IS NULL THEN 0 ELSE CAST({tok} AS BIGINT) END AS tok",
    )
    running, pack_id = _text.pack_exprs("tok", _PACK_SHARD, "doc_id", _PACK_BUDGET)
    run = base.selectExpr("doc_id", "lang", "bucket", "tok", f"{running} AS running")
    packed = run.selectExpr("lang", "bucket", f"{pack_id} AS pack_id", "tok")
    return packed.groupBy("lang", "bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
    )


# ===========================================================================
# semantic (embedding) dedup corpus filter (round 4)
# ===========================================================================

from lagespark.operators import similarity as _sim  # noqa: E402

_EMB_COS_T = 0.3


def _q102_oracle() -> str:
    pairs = (
        "SELECT a.vec_id AS a, b.vec_id AS b FROM embeddings a, embeddings b "
        "WHERE a.vec_id < b.vec_id AND "
        "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        f"CAST(b.embedding AS DOUBLE[])), 4) >= {_EMB_COS_T}"
    )
    return (
        "WITH RECURSIVE p AS (" + pairs + "), "
        "e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p), "
        "reach AS (SELECT u, v FROM e UNION "
        "SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u), "
        "comp AS (SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u) "
        "SELECT vec_id FROM embeddings WHERE vec_id NOT IN "
        "(SELECT doc FROM comp WHERE doc <> component)"
    )


@q("q102-embed-dedup-corpus", _q102_oracle())
def q102(spark, sf):
    """End-to-end SEMANTIC dedup filter: embedding-cosine near-dup pairs →
    connected components → keep each cluster's minimum id + all unclustered
    vectors — the embedding-space counterpart of q96's text-shingle filter
    (at unbounded N swap the exact pair finder for
    similarity.cosine_pairs_lsh; the component/filter machinery is shared).

    Scale note on the HARNESS data: the synthetic embedding table percolates
    at this threshold as density grows — sf0.01 keeps 18 of 500 vectors,
    sf0.1 collapses to ONE connected component (1 kept). Both are the
    mathematically-correct transitive closure (oracle-matched); threshold
    choice vs corpus density is configuration, exactly as in text dedup."""
    from pyspark.sql import functions as F

    e = T(spark, sf, "embeddings")
    pairs = _sim.cosine_pairs(e, threshold=_EMB_COS_T)
    kept = _dedup.dedup_corpus(e, pairs=pairs, id_col="vec_id")
    return kept.select("vec_id")


# ===========================================================================
# training-mix rebalancing (round 4): per-language deterministic resampling
# ===========================================================================

_MIX_RATES = {"en": "4000", "de": "8000"}  # en ≈ 1/4, de ≈ 1/2, rest keep-all


def _q103_oracle() -> str:
    lang = _text.langid_expr("text", "duckdb")
    pred = _text.stratified_sample_pred("text", "lang", _MIX_RATES, "duckdb")
    return (
        f"SELECT doc_id, lang FROM (SELECT doc_id, text, {lang} AS lang "
        f"FROM documents) WHERE {pred}"
    )


@q("q103-mix-resample", _q103_oracle())
def q103(spark, sf):
    """Training-mix rebalancing: per-language deterministic content-hash
    downsampling (en→1/4, de→1/2, rest kept) — the data-mix step between
    dedup/quality filtering and packing. Pure Catalyst predicate; the scan
    is the only pass and the filter pushes down."""
    lang = _text.langid_expr("text", "spark")
    pred = _text.stratified_sample_pred("text", "lang", _MIX_RATES, "spark")
    d = T(spark, sf, "documents").selectExpr("doc_id", "text", f"{lang} AS lang")
    return d.filter(F.expr(pred)).select("doc_id", "lang")


# ===========================================================================
# streaming ingest dedup, batch-equivalence mode (round 6): first-writer-wins
# LSH band claims — the batch replay of streaming.ops.dedup_stream_minhash
# (real streaming execution + cross-batch state pinned in
# tests/test_streaming.py)
# ===========================================================================


def _q104_oracle() -> str:
    # same (sh, sig, keys) CTE chain as the q72 pair oracle, then the
    # first-writer window: documents carries no ingest timestamp, so
    # arrival order is doc_id (the documented batch surrogate); the
    # dup_of <> doc_id guard mirrors ingest_claims_batch's no-self-claim
    # rule (no-op on the unique-id documents table)
    return _dedup.band_keys_ctes_sql() + """
SELECT doc_id, band, dup_of FROM (
  SELECT doc_id, band,
    ROW_NUMBER() OVER (PARTITION BY band, band_key ORDER BY doc_id) AS rn,
    FIRST_VALUE(doc_id) OVER (PARTITION BY band, band_key ORDER BY doc_id)
      AS dup_of
  FROM keys) WHERE rn > 1 AND dup_of <> doc_id
"""


@q("q104-dedup-ingest-claims", _q104_oracle())
def q104(spark, sf):
    """Near-dup suppression at INGEST (streaming dedup, batch-equivalence
    mode): each (band, band_key) is owned by the earliest-arriving doc;
    later docs sharing the key emit claim rows (doc_id, band, dup_of).
    The md5-oracle signature path keeps this SQL-checkable; the streaming
    twin runs the production xxhash64 path with one write-once state entry
    per band key."""
    return ops.ingest_claims_batch(T(spark, sf, "documents"))
