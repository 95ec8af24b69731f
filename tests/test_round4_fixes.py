"""Round-4 regression pins (VERDICT r3 items 2/6/7 + ADVICE r3 items 1-5):

- pq_topk guards the query-set size BEFORE the driver-side collect and
  derives its mapInPandas schema from the actual id dtypes
- pq_topk / ivf_topk codebook training draws a seeded sample through a
  deterministic pmod(xxhash64) filter predicate (scan pruning at scale,
  independent of partition layout — deliberately NOT a Catalyst Sample
  node, whose per-partition seeding would tie the draw to layout)
- empty-input guards: pq_topk dim probe, _train_sample_pdf, knn_auto_cell_size
- feature_cover_pdf covers are CONTAINMENT-conservative: boundary-aligned
  zero-width cells stay in the cover on both the rect fast path and the
  eps-expanded clip path (an inclusive-boundary point floors into them)
- knn_join_points stays exact when query ids are duplicated (the pending
  loop no longer relies on unique-qid arithmetic)
- q100 decontamination broadcasts the benchmark shingle set (corpus side
  never shuffles for the semi-join)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lagespark.operators import similarity, spatial


def _vec_df(spark, n, dim, id_type="long", seed=0, prefix="v"):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    rows = []
    for i in range(n):
        vid = i if id_type == "long" else f"{prefix}{i:04d}"
        rows.append((vid, [float(x) for x in mat[i]]))
    return spark.createDataFrame(
        rows, f"vec_id {id_type}, embedding array<double>"
    )


def test_pq_topk_query_bound_checked_before_collect(spark, monkeypatch):
    """Oversized query set must raise from a count(), not after a driver
    collect (VERDICT r3 what's-wrong #1)."""
    targets = _vec_df(spark, 64, 8, seed=1)
    queries = _vec_df(spark, 50, 8, seed=2)
    monkeypatch.setattr(similarity, "MAX_EXACT_TARGET_ROWS", 10)

    collected = []
    orig = type(queries).toPandas

    def spy(self, *a, **kw):
        collected.append(self.columns)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(queries), "toPandas", spy)
    with pytest.raises(ValueError, match="broadcast bound"):
        similarity.pq_topk(queries, targets, k=2, m_sub=4, ks=8)
    # the only collects allowed before the raise are codebook TRAINING
    # draws (vector column only) — never the query id+vector frame
    assert ["vec_id", "embedding"] not in collected


def test_pq_topk_string_ids(spark):
    """Schema follows the id dtype (ADVICE r3 #4): string image_ids work."""
    targets = _vec_df(spark, 64, 8, id_type="string", seed=3)
    queries = _vec_df(spark, 5, 8, id_type="string", seed=3)  # same ids v0000..
    out = similarity.pq_topk(
        queries, targets, k=2, m_sub=4, ks=8, rerank=16
    )
    assert dict(out.dtypes)["qid"] == "string"
    assert dict(out.dtypes)["nn_id"] == "string"
    rows = out.collect()
    assert len(rows) == 10  # 5 queries × k=2
    assert all(r.qid != r.nn_id for r in rows)


def test_pq_topk_empty_targets_raises(spark):
    empty = _vec_df(spark, 64, 8).filter(F.col("vec_id") < 0)
    queries = _vec_df(spark, 3, 8)
    with pytest.raises(ValueError, match="empty"):
        similarity.pq_topk(queries, empty, k=2, m_sub=4, ks=8)


def test_train_sample_prunes_scan_and_is_layout_independent(spark):
    """n >> train_rows → the training draw prunes via a deterministic hash
    filter BEFORE the rank (VERDICT r3 next #6) and returns the SAME rows
    regardless of partition layout (df.sample seeds per partition and was
    rejected for exactly that reason)."""
    df = _vec_df(spark, 1200, 8, seed=7)
    a = similarity._train_sample_pdf(df, "vec_id", "embedding", 50, seed=42)
    b = similarity._train_sample_pdf(
        df.repartition(17), "vec_id", "embedding", 50, seed=42
    )
    assert len(a) == 50
    assert [list(v) for v in a["embedding"]] == [list(v) for v in b["embedding"]]
    # the pruning predicate reaches the plan for oversized tables
    base = df.select("vec_id", "embedding")
    h = F.xxhash64(F.col("vec_id").cast("string"), F.lit(42))
    k = int(1200 // (4.0 * 50))
    plan = base.filter(F.pmod(h, F.lit(k)) == 0)._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan and "xxhash64" in plan


def test_train_sample_empty_raises(spark):
    empty = _vec_df(spark, 8, 8).filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        similarity._train_sample_pdf(empty, "vec_id", "embedding", 50, seed=1)


def test_knn_auto_cell_size_empty_targets(spark):
    """ADVICE r3 #1: empty targets → default 250.0, not TypeError."""
    pts = spark.createDataFrame([], "pid long, x double, y double")
    assert spatial.knn_auto_cell_size(pts, k=3) == 250.0


def _rect_featureset(xmin, ymin, xmax, ymax):
    ring = [
        {"x": xmin, "y": ymin},
        {"x": xmax, "y": ymin},
        {"x": xmax, "y": ymax},
        {"x": xmin, "y": ymax},
    ]
    pdf = pd.DataFrame(
        {
            "feature_id": ["r1"],
            "rings": [[ring]],
            "xmin": [xmin],
            "ymin": [ymin],
            "xmax": [xmax],
            "ymax": [ymax],
        }
    )
    return spatial.FeatureSet(pdf)


def test_cover_keeps_boundary_cells_for_inclusive_pip():
    """Covers are CONTAINMENT-conservative, not area-minimal: a point lying
    exactly on a grid-aligned high edge (x == xmax == i*cs) floors into the
    NEXT cell over, so that zero-area-overlap cell must stay in the cover —
    for the rect fast path AND the general clip path (ADVICE r3 #3 proposed
    trimming them; the trim was reverted after review because it silently
    drops boundary points from pip joins)."""
    from lagespark.kernels import cells

    # rect path: grid-aligned rect
    feats = _rect_featureset(0.0, 0.0, 20.0, 10.0)
    cov = spatial.feature_cover_pdf(feats, cell_size=10.0, exact=True)
    ci, cj = cells.grid_decode(cov["cell"].to_numpy())
    got = set(zip(ci.tolist(), cj.tolist()))
    # the boundary point (20.0, 10.0) is INSIDE the closed rect and floors
    # into cell (2, 1) — every cell a contained point can floor into is kept
    bx, by = np.float64(20.0), np.float64(10.0)
    assert (int(bx // 10), int(by // 10)) in got
    assert {(0, 0), (1, 0)} <= got

    # general clip path: a grid-aligned TRIANGLE with its vertical edge on
    # x == 20 (not an axis rect → exercises the eps-expanded clip test)
    ring = [{"x": 0.0, "y": 0.0}, {"x": 20.0, "y": 0.0}, {"x": 20.0, "y": 10.0}]
    pdf = pd.DataFrame(
        {"feature_id": ["t1"], "rings": [[ring]], "xmin": [0.0], "ymin": [0.0],
         "xmax": [20.0], "ymax": [10.0]}
    )
    cov2 = spatial.feature_cover_pdf(spatial.FeatureSet(pdf), cell_size=10.0, exact=True)
    ci2, cj2 = cells.grid_decode(cov2["cell"].to_numpy())
    got2 = set(zip(ci2.tolist(), cj2.tolist()))
    # (20.0, 5.0) is ON the triangle's edge (inclusive containment) and
    # floors into cell (2, 0) — the zero-width-touch cell must be kept
    assert (2, 0) in got2


def test_rect_cover_unaligned_keeps_full_bbox():
    """A rect strictly inside its boundary cells keeps the whole bbox cover."""
    feats = _rect_featureset(1.0, 1.0, 19.0, 9.0)
    cov = spatial.feature_cover_pdf(feats, cell_size=10.0, exact=True)
    assert len(cov) == 2  # i in {0,1}, j = 0


def test_knn_join_points_duplicate_qids(spark):
    """ADVICE r3 #5: duplicated query ids must terminate AND stay exact
    (one top-k per distinct qid; the window merges duplicate rows)."""
    rng = np.random.default_rng(11)
    tgt = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 1000, (300, 2)))]
    targets = spark.createDataFrame(tgt, "pid long, x double, y double")
    # 40 query rows over only 20 distinct ids (each id appears twice with
    # IDENTICAL coordinates — the realistic synthesized-key duplication)
    qrows = []
    for i, (x, y) in enumerate(rng.uniform(0, 1000, (20, 2))):
        # qids disjoint from target ids (the join excludes nn_id == qid)
        qrows.append((1000 + int(i), float(x), float(y)))
        qrows.append((1000 + int(i), float(x), float(y)))
    queries = spark.createDataFrame(qrows, "pid long, x double, y double")
    out = spatial.knn_join_points(queries, targets, k=3).collect()
    got = {(r.qid, r.rank): r.nn_id for r in out}
    assert len(got) == 60  # 20 distinct qids × k
    # brute-force oracle
    import numpy as _np

    tm = _np.array([[t[1], t[2]] for t in tgt])
    tid = _np.array([t[0] for t in tgt])
    assert len({(q[1], q[2]) for q in qrows}) == 20  # one coord pair per qid
    qm = {q[0]: (q[1], q[2]) for q in qrows}
    for qid in list(qm)[:5]:
        x, y = qm[qid]
        d = _np.round(_np.hypot(tm[:, 0] - x, tm[:, 1] - y), 6)
        order = _np.lexsort((tid, d))[:3]
        for r, j in enumerate(order):
            assert got[(qid, r + 1)] == int(tid[j])


# ---------------------------------------------------------------------------
# native (pure-Catalyst) S2 encode — round-4 q57 oracle path
# ---------------------------------------------------------------------------


def test_s2_native_matches_numpy_kernel(spark):
    """with_s2_cell_native must reproduce cells.s2_encode bit-for-bit on
    the harness domain AND a global fuzz across all 6 cube faces (the SQL
    step chain replays the numpy kernel's exact double-op order)."""
    import numpy as np
    import pandas as pd

    from lagespark.kernels import cells

    rng = np.random.default_rng(3)
    lat = np.concatenate(
        [52.0 + rng.uniform(0, 0.09, 4000), rng.uniform(-89.9, 89.9, 4000)]
    )
    lon = np.concatenate(
        [13.0 + rng.uniform(0, 0.09, 4000), rng.uniform(-179.9, 179.9, 4000)]
    )
    want = cells.s2_encode(lat, lon, 15)
    pdf = pd.DataFrame({"k": np.arange(len(lat)), "lat": lat, "lon": lon})
    df = spark.createDataFrame(pdf)
    got = (
        spatial.with_s2_cell_native(df, "lat", "lon", 15)
        .orderBy("k")
        .select("cell_s2")
        .toPandas()["cell_s2"]
        .to_numpy()
    )
    assert (got == want).all()


def test_s2_native_plan_has_no_python_udf(spark):
    """The native encode stays inside whole-stage codegen: no
    ArrowEvalPython / BatchEvalPython node may appear in the plan."""
    import io
    from contextlib import redirect_stdout

    df = spark.range(0, 100).selectExpr(
        "cast(id as double) / 100 + 52.0 as lat",
        "cast(id as double) / 100 + 13.0 as lon",
    )
    out = spatial.with_s2_cell_native(df, "lat", "lon", 15)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan  # no ArrowEvalPython/BatchEvalPython
    assert "codegen id" in plan  # formatted mode marks codegen stages this way


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """q100 shape: the benchmark shingle set rides a BroadcastHashJoin (the
    corpus side must not shuffle for the semi-join) and the query registers
    with a matching oracle."""
    import io
    from contextlib import redirect_stdout

    from lagespark import harness
    from lagespark import harness4  # noqa: F401

    assert "q100-decontaminate" in harness.ORACLES
    df = harness.QUERIES["q100-decontaminate"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_hashed_keys_match_string_path(spark):
    """hash_keys=True (production 8-byte xxhash64 wire format, used by the
    corpus pipeline) returns exactly the string path's result on the
    harness corpus — same contaminated ids, same per-doc hit counts."""
    from pyspark.sql import functions as F

    from lagespark.operators import dedup

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    s = dedup.decontaminate(corpus, bench, n=20).toPandas()
    h = dedup.decontaminate(corpus, bench, n=20, hash_keys=True).toPandas()
    key = lambda pdf: pdf.sort_values("doc_id").reset_index(drop=True)
    assert key(s).equals(key(h))
    assert len(s) > 0  # the harness corpus really has contaminated docs


def test_doc_pack_invariants(spark):
    """Sequence-packing semantics (q101 / pipeline pack stage): packs are
    contiguous per (lang, bucket) shard, conserve every token, and overrun
    the budget by at most one document (greedy concat-and-chunk)."""
    import numpy as np

    from lagespark.operators import text

    rng = np.random.default_rng(5)
    rows = [
        (int(i), ["en", "de", "fr"][i % 3], int(rng.integers(1, 400)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, tok long")
    budget = 512
    bucket = text.pack_bucket_expr("doc_id", "spark")
    running, pack_id = text.pack_exprs(
        "tok", ("lang", "bucket"), "doc_id", budget
    )
    packed = (
        df.selectExpr("doc_id", "lang", f"{bucket} AS bucket", "tok")
        .selectExpr("doc_id", "lang", "bucket", "tok", f"{running} AS running")
        .selectExpr("doc_id", "lang", "bucket", "tok", f"{pack_id} AS pack_id")
        .toPandas()
    )
    assert packed["tok"].sum() == sum(r[2] for r in rows)  # token conservation
    assert packed["bucket"].between(0, 15).all()
    assert packed["bucket"].nunique() > 4  # the md5 sub-shard really spreads
    for (lang, bkt), g in packed.groupby(["lang", "bucket"]):
        ids = sorted(g["pack_id"].unique())
        assert ids == list(range(len(ids)))  # contiguous pack ids per shard
        per = g.groupby("pack_id")["tok"].agg(["sum", "max"])
        # greedy overrun bound: a pack exceeds the budget only by (part of)
        # its final document
        assert (per["sum"] < budget + per["max"]).all()


def test_doc_pack_bucket_parity_and_window_partitioning(spark, duck):
    """The hash sub-shard is dialect-portable (Spark and DuckDB decode the
    same md5 digit to the same bucket for the same ids) AND the physical
    window really partitions by (lang, bucket), not lang alone — the q101
    scale fix: no single reducer holds a whole language."""
    import io
    from contextlib import redirect_stdout

    from lagespark import harness
    from lagespark import harness4  # noqa: F401  (registers q101)
    from lagespark.operators import text

    ids = list(range(0, 4000, 7))
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    s_bkt = {
        r["doc_id"]: r["bucket"]
        for r in sdf.selectExpr(
            "doc_id", text.pack_bucket_expr("doc_id", "spark") + " AS bucket"
        ).collect()
    }
    d_expr = text.pack_bucket_expr("doc_id", "duckdb")
    d_rows = duck.execute(
        f"SELECT doc_id, {d_expr} AS bucket FROM "
        f"(SELECT unnest({ids}) AS doc_id)"
    ).fetchall()
    assert {i: b for i, b in d_rows} == s_bkt
    assert set(s_bkt.values()) == set(range(16))

    df = harness.QUERIES["q101-doc-pack"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    import re

    m = re.search(
        r"windowspecdefinition\((\w+)#\d+L?, (\w+)#\d+L?, (\w+)#\d+L? ASC", plan
    )
    assert m, f"no window spec found in plan:\n{plan}"
    assert m.groups() == ("lang", "bucket", "doc_id")
