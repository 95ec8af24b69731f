"""End-to-end TRAINING-CORPUS pipeline CLI — the text counterpart of the
image pipeline (pipeline/cli.py), chaining the registry's data-pipeline
operators into one resumable, checkpoint-manifested job:

  clean   — normalize + language-ID + token counts + quality signals;
            quality gate drops short/punct-heavy docs (partitioned by lang
            → partition pruning serves both per-language reads and resume)
  dedup   — production MinHash+LSH candidates → EXACT Jaccard refine →
            connected components → keep each cluster's minimum id (all in
            native Catalyst; raw LSH candidates alone would over-merge a
            template-dense corpus into one giant cluster)
  decon   — test-set decontamination against the eval holdout
            (doc_id % 97 = 0): drop docs sharing any 20-char span
  mix     — per-language deterministic content-hash downsampling
            (training-mix rebalancing; rates are configuration)
  pack    — greedy cumulative-token sequence packing per language shard

Every stage writes partitioned parquet + a JSON manifest (per-partition
lineage + metrics, atomic commit — pipeline/manifest.py), so a killed run
resumes from the last committed stage and a cluster swaps the writer to
Iceberg via the format-pluggable seam.

Usage:
  python -m lagespark.pipeline.corpus --out /tmp/corpus \
      --sf-dir /root/testdata/sf0.01 [--resume] [--master local[8]]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lagespark-corpus", description=__doc__)
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default=None)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.3)
    p.add_argument("--dedup-jaccard", type=float, default=0.9)
    # LSH banding matched to the threshold: b bands of r rows target
    # J* ≈ (1/b)^(1/r); perms=8 with r=4 → b=2 → J* ≈ 0.84, the right
    # operating point for the 0.9 default (r=2 targets J* ≈ 0.5 and
    # generates ~8× the candidates on the template-dense harness corpus,
    # all discarded by the exact refine — measured 14.7 s → 6.6 s for the
    # pair stage at 8 cores with an IDENTICAL final pair set).
    # At-threshold recall caveat (ADVICE r5): with r=4 the LSH collision
    # probability AT J=0.9 is ~0.88 (vs ~0.999 for r=2), so borderline
    # duplicates with J in [0.90, ~0.95] can be missed; near-identical
    # duplicates (J→1) are still found with probability ~1. Set
    # --dedup-band-rows 2 when at-threshold recall matters more than the
    # ~8x candidate volume. The default derives as
    # dedup.fit_band_rows(perms=8, threshold=0.9) — see that helper for
    # the general matching rule and the over-generation measurement.
    p.add_argument(
        "--dedup-band-rows", type=int, default=4,
        help="LSH rows per band (default 4: J*~0.84, at-threshold "
        "J=0.9 recall ~0.88; use 2 for recall ~1 at ~8x candidates). "
        "To RAISE at-threshold recall without the candidate blow-up, "
        "raise --dedup-perms instead and set both from "
        "dedup.fit_banding(threshold, min_recall) — e.g. (16, 4) reaches "
        "recall ~0.99 at J=0.9",
    )
    p.add_argument(
        "--dedup-perms", type=int, default=8,
        help="MinHash permutations (more perms = finer banding grid and "
        "more bands at the same rows-per-band -> higher at-threshold "
        "recall; signature cost is linear in perms)",
    )
    p.add_argument("--decon-ngram", type=int, default=20)
    p.add_argument("--pack-budget", type=int, default=512)
    p.add_argument("--mix-rates", default="en:4000,de:8000",
                   help="lang:rate_hex4 pairs; absent langs keep everything")
    return p


def _fingerprint(path: str) -> str:
    """Cheap content fingerprint of a parquet file/dir: resolved path plus
    every file's (relative name, size, mtime_ns). Changing --sf-dir OR
    regenerating the source data changes the fingerprint, which changes
    stage 1's inputs and therefore invalidates the manifest-id chain.

    Deliberately conservative (ADVICE r5): byte-identical data that was
    copied, re-downloaded, or touched ALSO invalidates — resume requires
    the same resolved path with untouched mtimes. That trades spurious
    rebuilds for never serving a stale chain; hash the parquet footers
    instead if content-addressed resume is ever needed."""
    import hashlib

    path = os.path.abspath(path)
    h = hashlib.md5(path.encode())
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                rel = os.path.relpath(os.path.join(root, f), path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return f"src:{path}:{h.hexdigest()}"


def run(args) -> dict:
    from lagespark.operators import dedup, text
    from lagespark.pipeline import manifest
    from lagespark.session import get_spark

    from pyspark.sql import SparkSession

    # reuse an ACTIVE session untouched (embedded use: bench/scaling drive
    # this from an already-configured per-level session, and getOrCreate
    # would apply the builder's options TO that session — silently resetting
    # spark.sql.shuffle.partitions and the log level mid-benchmark); only a
    # standalone CLI invocation builds its own
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
        if args.master is not None:
            # ADVICE r5: make a mismatched --master visible — the active
            # session wins and its master may differ from what was requested
            import warnings

            warnings.warn(
                f"corpus.run: reusing ACTIVE SparkSession "
                f"(master={spark.sparkContext.master!r}); --master "
                f"{args.master!r} and the WARN log-level set are IGNORED",
                stacklevel=2,
            )
    else:
        spark = get_spark(args.master, app_name="lagespark-corpus")
        spark.sparkContext.setLogLevel("WARN")

    # _spread: the clean stage's langid/quality expressions are CPU-bound
    # native work — a small-file scan is ONE partition and would run them
    # single-threaded (CLAUDE.md invariant; no-op once the scan is wide)
    docs = dedup._spread(
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    )

    # per-stage wall times (VERDICT r5 #2): the scaling job reads this split
    # to attribute sublinear end-to-end efficiency to fixed write/read stage
    # barriers vs genuinely sublinear compute stages
    stage_sec: dict[str, float] = {}

    def stage(df_builder, out_dir, name, inputs):
        """Build + write the stage, or — on resume with a complete manifest
        for the SAME inputs — skip even constructing the DataFrame
        (iterative builders fire jobs at construction time)."""
        import time

        t0 = time.perf_counter()
        if args.resume and manifest.stage_done(out_dir, inputs):
            man = manifest.read_manifest(out_dir)
            stage_sec[name] = 0.0
        else:
            man = manifest.write_stage(
                df_builder(), out_dir, name, "lang", inputs=inputs,
                resume=args.resume,
            )
            stage_sec[name] = round(time.perf_counter() - t0, 3)
        df, _ = manifest.read_stage(spark, out_dir)
        return df, man

    # stage 1: clean — normalize, langid, tokens, quality gate.
    # inputs = the resolved source dir + a cheap content fingerprint of
    # documents.parquet (file sizes + mtimes): re-running into the same --out
    # with a different --sf-dir (or regenerated source data) must invalidate
    # the whole manifest-id chain instead of silently serving the stale
    # clean stage (stage_done compares inputs).
    src = os.path.join(args.sf_dir, "documents.parquet")
    src_fp = _fingerprint(src)
    clean_dir = os.path.join(args.out, "clean")
    lang = text.langid_expr("text", "spark")
    tok = text.token_count_ws_expr("text", "spark")
    qual = text.quality_exprs("text", "spark")
    clean = docs.filter(F.col("text").isNotNull()).selectExpr(
        "doc_id",
        "text",
        text.normalize_expr("text", "spark") + " AS norm",
        f"{lang} AS lang",
        f"CAST({tok} AS BIGINT) AS tok",
        f"{qual['punct_ratio']} AS punct_ratio",
    ).filter(
        (F.col("tok") >= args.min_tokens)
        & (F.col("punct_ratio") <= args.max_punct_ratio)
    )
    # stage inputs carry the upstream identity AND the stage's own
    # parameters: a changed flag must invalidate the checkpoint on
    # --resume exactly like changed data does (stage_done compares the
    # full list) — otherwise e.g. a different --dedup-band-rows would
    # silently serve the old pair set
    clean, m1 = stage(
        lambda: clean, clean_dir, "clean",
        [src_fp, f"min_tokens={args.min_tokens}",
         f"max_punct_ratio={args.max_punct_ratio}"],
    )

    # stage 2: dedup — LSH candidates over the NORMALIZED text, refined by
    # exact n-gram Jaccard (only candidates pay the set comparison), then
    # components → keep each cluster's min id (+ all unclustered docs)
    dedup_dir = os.path.join(args.out, "dedup")

    def _build_dedup():
        pairs = dedup.minhash_jaccard_pairs(
            clean, id_col="doc_id", text_col="norm",
            perms=args.dedup_perms,
            band_rows=args.dedup_band_rows, threshold=args.dedup_jaccard,
        )
        return dedup.dedup_corpus(clean, pairs=pairs, id_col="doc_id")

    # inputs = upstream MANIFEST IDS (not paths): a rebuilt upstream stage
    # gets a fresh id, so stage_done/write_stage invalidate downstream
    # checkpoints instead of serving stale data (see pipeline/cli.py)
    kept, m2 = stage(
        _build_dedup, dedup_dir, "dedup",
        [m1["manifest_id"], f"perms={args.dedup_perms}",
         f"band_rows={args.dedup_band_rows}",
         f"jaccard={args.dedup_jaccard}"],
    )

    # stage 3: decon — drop docs overlapping the eval holdout
    decon_dir = os.path.join(args.out, "decon")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = kept.filter(F.col("doc_id") % 97 != 0)
    def _build_decon():
        # hash_keys: production wire format — the broadcast + probe carry
        # 8-byte xxhash64 keys instead of raw 20-char shingle strings
        contaminated = dedup.decontaminate(
            corpus, bench, id_col="doc_id", text_col="text",
            n=args.decon_ngram, hash_keys=True,
        ).select("doc_id")
        return corpus.join(contaminated, "doc_id", "left_anti")

    deconned, m3 = stage(
        _build_decon, decon_dir, "decon",
        [m2["manifest_id"], f"ngram={args.decon_ngram}", "keys=xxhash64"],
    )

    # stage 4: mix — per-language deterministic downsampling
    mix_dir = os.path.join(args.out, "mix")
    rates = dict(kv.split(":") for kv in args.mix_rates.split(",") if kv)
    pred = text.stratified_sample_pred("text", "lang", rates, "spark")
    mixed, m4 = stage(
        lambda: deconned.filter(F.expr(pred)), mix_dir, "mix",
        [m3["manifest_id"], f"rates={args.mix_rates}"],
    )

    # stage 5: pack — greedy cumulative-token chunking per (lang, hash-bucket)
    # shard: the 16-way md5 sub-shard bounds any window reducer's input at
    # corpus/16 even when the mix is monolingual (pack_bucket_expr)
    pack_dir = os.path.join(args.out, "packs")
    bucket_sql = text.pack_bucket_expr("doc_id", "spark")
    run_sql, pack_sql = text.pack_exprs(
        "tok", ("lang", "bucket"), "doc_id", args.pack_budget
    )
    running = mixed.selectExpr(
        "doc_id", "lang", f"{bucket_sql} AS bucket", "tok"
    ).selectExpr(
        "doc_id", "lang", "bucket", "tok", f"{run_sql} AS running"
    ).selectExpr("doc_id", "lang", "bucket", "tok", f"{pack_sql} AS pack_id")
    packs, m5 = stage(
        lambda: running, pack_dir, "packs",
        [m4["manifest_id"], f"budget={args.pack_budget}"],
    )

    def _rows(man: dict) -> int:
        return sum(p["rows"] for p in man["partitions"].values())

    stats = {
        "input_docs": docs.count(),
        "clean": _rows(m1),
        "dedup": _rows(m2),
        "decon": _rows(m3),
        "mix": _rows(m4),
        "packed_docs": _rows(m5),
        "n_packs": packs.select("lang", "bucket", "pack_id").distinct().count(),
        "stage_sec": stage_sec,
    }
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    stats = run(args)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
