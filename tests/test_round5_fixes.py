"""Round-5 regression pins (VERDICT r4 next-items + the regex-serialization
discovery):

- normalize_expr / quality punct counting are translate()-based (regex-free):
  in this Spark build regexp evaluation serializes across executor threads
  (wall time invariant to partition count), so regex in a hot projection
  caps the stage at single-core speed. The rewrite must stay bit-identical
  to the old regex semantics on the ASCII corpus contract.
- minhash_pairs_fast computes its signature as ONE aggregate fold (struct
  accumulator) instead of `perms` transform+array_min projections; the mins
  must be bit-identical.
- decontaminate(hash_keys=True) equality with the string path is pinned in
  test_round4_fixes (round-4 file) — the pipeline band-rows fit is covered
  by the corpus e2e test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# the OLD regex forms, kept verbatim as the semantic reference
_OLD_NORM_DUCK = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " '  *', ' ', 'g'))"
)
_OLD_PUNCT_DUCK = "CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS INT)"

_EDGE_ROWS = (
    "VALUES (''), (NULL), ('...'), ('a'), ('a  b\tc'), ('Hello, World!'), "
    "('x''y\\z'), ('  lead trail  '), ('MiXeD CaSe 42!'), "
    "('tab\tnewline\nret\rdone')"
)


def test_normalize_translate_matches_regex_reference(duck):
    """The translate-based normalize must equal the regex reference on the
    whole harness corpus AND on edge cases (empty, NULL, control chars,
    quote/backslash, run collapse, trim)."""
    from lagespark.operators import text

    new = text.normalize_expr("text", "duckdb")
    n = duck.execute(
        "SELECT count(*) FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet') "
        f"WHERE ({new}) IS DISTINCT FROM ({_OLD_NORM_DUCK})"
    ).fetchone()[0]
    assert n == 0
    rows = duck.execute(
        f"WITH t(text) AS ({_EDGE_ROWS}) "
        f"SELECT text, ({new}), ({_OLD_NORM_DUCK}) FROM t"
    ).fetchall()
    for txt, got, want in rows:
        assert got == want, f"normalize({txt!r}) = {got!r}, want {want!r}"


def test_quality_punct_translate_matches_regex_reference(duck):
    from lagespark.operators import text

    new = text.quality_exprs("text", "duckdb")["punct_ratio"]
    old = f"ROUND({_OLD_PUNCT_DUCK} / CAST(length(text) AS DOUBLE), 4)"
    n = duck.execute(
        "SELECT count(*) FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet') "
        f"WHERE ({new}) IS DISTINCT FROM ({old})"
    ).fetchone()[0]
    assert n == 0
    rows = duck.execute(
        f"WITH t(text) AS ({_EDGE_ROWS}) SELECT text, ({new}), ({old}) FROM t"
    ).fetchall()
    for txt, got, want in rows:
        assert got == want, f"punct_ratio({txt!r}) = {got!r}, want {want!r}"


def test_normalize_spark_duckdb_agree_on_edges(spark, duck):
    """Both dialects of the rewritten normalize agree row-for-row on the
    edge cases (incl. '' -> '' and NULL -> NULL, the round-5 guard)."""
    from lagespark.operators import text

    texts = ["", None, "...", "a", "a  b\tc", "Hello, World!",
             "x'y\\z", "  lead trail  ", "MiXeD CaSe 42!"]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got_s = [
        r[0]
        for r in sdf.selectExpr(text.normalize_expr("text", "spark")).collect()
    ]
    got_d = [
        r[1]
        for r in duck.execute(
            "WITH t(text) AS (SELECT unnest(?)) SELECT text, "
            + text.normalize_expr("text", "duckdb") + " FROM t",
            [texts],
        ).fetchall()
    ]
    assert got_s == got_d


def test_minhash_aggregate_signature_matches_transform_reference(spark):
    """The one-pass aggregate minhash signature equals the old
    perms×(transform + array_min) computation bit-for-bit."""
    from lagespark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = dedup._spread(
        docs.filter(F.col("text").isNotNull()).select("doc_id", "text")
    )
    sh = base.select(
        "doc_id", dedup.shingle_col("text", 3, distinct=False).alias("shs")
    ).filter(F.size("shs") > 0)
    perms = 8

    def _perm(p):
        return lambda s: F.xxhash64(F.lit(p), s)

    ref = sh.select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("shs"), _perm(p))).alias(f"mh{p}")
            for p in range(perms)
        ],
    )
    init = F.struct(
        *[F.lit(2**63 - 1).cast("long").alias(f"m{p}") for p in range(perms)]
    )

    def _merge(acc, s):
        return F.struct(
            *[
                F.least(acc[f"m{p}"], F.xxhash64(F.lit(p), s)).alias(f"m{p}")
                for p in range(perms)
            ]
        )

    agg = sh.select("doc_id", F.aggregate("shs", init, _merge).alias("_mh")).select(
        "doc_id", *[F.col(f"_mh.m{p}").alias(f"mh{p}") for p in range(perms)]
    )
    assert ref.exceptAll(agg).count() == 0 and agg.exceptAll(ref).count() == 0


def test_regex_free_clean_plan(spark):
    """The clean-stage expressions must not contain regex operators — the
    serialization pin: RegExpReplace/RegExpExtractAll in this projection
    would cap the corpus pipeline's clean stage at single-core speed."""
    from lagespark.operators import text

    df = spark.createDataFrame([("x y",)], "text string").selectExpr(
        text.normalize_expr("text", "spark") + " AS norm",
        text.quality_exprs("text", "spark")["punct_ratio"] + " AS pr",
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "regexp_replace" not in plan and "regexp_extract" not in plan
