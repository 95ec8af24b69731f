"""Spark-side image payload tests: the BASELINE.json:6,15 per-row invariant
(decoded-pixel allclose / PSNR ≥ 40 dB for lossy + caption equality + pHash)
through the REAL distributed path (mapInPandas over generated table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lagespark.operators import image_ops

N = 240  # covers all fmt×size combinations many times over


@pytest.fixture(scope="module")
def images(spark):
    image_ops.set_image_batching(spark)
    return image_ops.generate_images(spark, N, partitions=4).cache()


def test_generation_deterministic_across_partitionings(spark):
    a = image_ops.generate_images(spark, 60, partitions=2).toPandas()
    b = image_ops.generate_images(spark, 60, partitions=7).toPandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert (a["bytes"] == b["bytes"]).all()
    assert (a["x"] == b["x"]).all()


def test_per_row_invariant(images):
    chk = image_ops.roundtrip_check(images).toPandas()
    assert len(chk) == N
    lossy = chk[chk.fmt == "qdct"]
    lossless = chk[chk.fmt != "qdct"]
    assert (lossless.exact).all(), "lossless formats must decode exactly"
    assert (lossy.psnr >= 40.0).all(), "lossy PSNR >= 40 dB invariant"
    assert (chk.phash_hamming <= 2).all()


def test_transcode_preserves_pixels_and_captions(spark, images):
    out = image_ops.transcode(images, "png")
    chk = image_ops.roundtrip_check(out).toPandas()
    # png re-encode of qdct-decoded pixels: exact vs the DECODED pixels is
    # not checkable here, but PSNR vs the procedural reference still holds
    assert (chk.psnr >= 40.0).all()
    assert (chk[chk.fmt == "png"].fmt == "png").all()
    caps = (
        images.select("image_id", F.col("caption").alias("a"))
        .join(out.select("image_id", F.col("caption").alias("b")), "image_id")
        .toPandas()
    )
    assert (caps.a == caps.b).all()


def test_resize_shapes(images):
    small = image_ops.resize_pool2(images).toPandas()
    assert ((small.w.isin([8, 16, 32])) & (small.h == small.w)).all()
    assert (small["bytes"].str.len() == small.w * small.h * 3).all()


def test_multimodal_stub(spark):
    av = image_ops.generate_av(spark, 100)
    feats = image_ops.decode_av_features(av).toPandas()
    assert len(feats) == 100
    assert set(feats.media_type) == {"audio", "video"}
    with pytest.raises(NotImplementedError):
        image_ops.decode_av_features(av, real_codecs=True)


def test_av_frame_sampling(spark):
    """sample_av_frames: the native schedule emits exactly
    min(max_samples, floor(duration·fps)) samples per media row; samples
    are deterministic across partitionings; the real-codec seam raises."""
    av = image_ops.generate_av(spark, 120, partitions=3)
    frames = image_ops.sample_av_frames(av, fps=1.0, max_samples=8).toPandas()
    meta = av.select("media_id", "media_type", "duration_ms").toPandas()
    counts = frames.groupby("media_id").size()
    for r in meta.itertuples():
        want = min(8, max(1, int(r.duration_ms * 1.0 / 1000.0)))
        assert counts[r.media_id] == want, (r.media_id, counts[r.media_id], want)
    vid = frames[frames.media_type == "video"]
    aud = frames[frames.media_type == "audio"]
    assert (vid["data"].str.len() == 16 * 16 * 3).all() and (vid.w == 16).all()
    assert (aud["data"].str.len() == 256 * 2).all() and (aud.w == 0).all()
    # deterministic under a different partitioning
    av2 = image_ops.generate_av(spark, 120, partitions=7)
    again = image_ops.sample_av_frames(av2, fps=1.0, max_samples=8).toPandas()
    key = ["media_id", "sample_no"]
    a = frames.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    assert (a["data"] == b["data"]).all() and (a["ts_ms"] == b["ts_ms"]).all()
    with pytest.raises(NotImplementedError):
        image_ops.sample_av_frames(av, real_codecs=True)


def test_ann_lsh_recall(spark):
    """LSH top-k recall vs exact brute force at DEFAULT parameters — the
    production floor: the near-uniform harness embeddings are sign-LSH's
    hardest case, and the defaults must still clear 0.8 (measured 0.89)."""
    from lagespark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    exact = similarity.cosine_topk(qs, e, k=5).toPandas()
    approx = similarity.lsh_topk(qs, e, k=5).toPandas()
    ex = {(r.qid, r.nn_id) for r in exact.itertuples()}
    ap = {(r.qid, r.nn_id) for r in approx.itertuples()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below production floor"


def test_tile_chain_roundtrip(spark, images):
    """Tiles reassemble to the original pixels (decode→tile→encode→decode)."""
    import numpy as np

    from lagespark.image import codecs

    tiles = image_ops.tile_chain(images, grid=2, to_fmt="png").toPandas()
    src = images.toPandas().set_index("image_id")
    for iid, grp in list(tiles.groupby("image_id"))[:10]:
        r = src.loc[iid]
        orig = codecs.decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        th, tw = r["h"] // 2, r["w"] // 2
        rebuilt = np.zeros((th * 2, tw * 2, 3), np.uint8)
        for t in grp.itertuples():
            gy, gx = divmod(t.tile_no, 2)
            rebuilt[gy * th : (gy + 1) * th, gx * tw : (gx + 1) * tw] = (
                codecs.decode_image(t.bytes, "png", t.w, t.h)
            )
        if r["fmt"] == "qdct":
            assert codecs.psnr(orig[: th * 2, : tw * 2], rebuilt) == float("inf")
        else:
            assert (rebuilt == orig[: th * 2, : tw * 2]).all()


def test_ann_ivf_recall(spark):
    """IVF top-k recall vs exact brute force at DEFAULT parameters — the
    production floor (measured 0.90 on the harness embeddings)."""
    from lagespark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    exact = similarity.cosine_topk(qs, e, k=5).toPandas()
    approx = similarity.ivf_topk(qs, e, k=5).toPandas()
    ex = {(r.qid, r.nn_id) for r in exact.itertuples()}
    ap = {(r.qid, r.nn_id) for r in approx.itertuples()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, f"IVF recall {recall:.2f} below production floor"


def test_ann_pq_recall(spark):
    """PQ/ADC top-k recall vs exact brute force. With exact re-rank of the
    ADC shortlist, a wrong answer requires a true neighbor to fall outside
    the top-`rerank` ADC candidates — the floor here is far above the LSH/
    IVF ones because the shortlist is 10× k."""
    from lagespark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    exact = similarity.cosine_topk(qs, e, k=5).toPandas()
    approx = similarity.pq_topk(qs, e, k=5, m_sub=16, ks=32, rerank=50).toPandas()
    ex = {(r.qid, r.nn_id) for r in exact.itertuples()}
    ap = {(r.qid, r.nn_id) for r in approx.itertuples()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, f"PQ recall {recall:.2f} below re-rank floor"
    # determinism: a second run returns the identical result
    again = similarity.pq_topk(qs, e, k=5, m_sub=16, ks=32, rerank=50).toPandas()
    assert {(r.qid, r.nn_id, r.rank) for r in again.itertuples()} == {
        (r.qid, r.nn_id, r.rank) for r in approx.itertuples()
    }


def test_phash_neardup_detection(spark):
    """Every injected duplicate is found; no false pairs at hamming <= 6."""
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_with_neardups(spark, 300, partitions=4, dup_every=10)
    pairs = image_ops.phash_neardup_pairs(imgs, max_hamming=6).toPandas()
    got = {(r.a, r.b) for r in pairs.itertuples()}
    want = {
        (f"dup{i:08d}", f"img{i:08d}") for i in range(0, 300, 10)
    }
    assert want <= got, want - got
    extras = got - want
    assert not extras, f"false near-dup pairs: {extras}"


def test_phash_dedup_corpus_keeps_one_per_cluster(spark):
    """q85b shape: every injected (dupX, imgX) cluster keeps exactly ONE
    representative; unclustered images all survive; no surviving near-dup
    pair remains."""
    from lagespark.operators import image_ops

    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_with_neardups(spark, 300, partitions=4, dup_every=10)
    n_total = imgs.count()
    kept = image_ops.phash_dedup_corpus(imgs, max_hamming=6)
    kept_ids = {r.image_id for r in kept.select("image_id").collect()}

    pairs = image_ops.phash_neardup_pairs(imgs, max_hamming=6).toPandas()
    clustered = set(pairs["a"]) | set(pairs["b"])
    # unclustered images all survive
    all_ids = {r.image_id for r in imgs.select("image_id").collect()}
    assert (all_ids - clustered) <= kept_ids
    # no surviving near-dup pair
    for r in pairs.itertuples():
        assert not (r.a in kept_ids and r.b in kept_ids), (r.a, r.b)
    # kept count == total - (cluster sizes - 1) summed: hand-rolled union-find
    parent = {}

    def find(u):
        parent.setdefault(u, u)
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for r in pairs.itertuples():
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            parent[ra] = rb
    from collections import Counter

    sizes = Counter(find(u) for u in clustered)
    expected_kept = n_total - sum(s - 1 for s in sizes.values())
    assert len(kept_ids) == expected_kept


# ---------------------------------------------------------------------------
# LAV1 container (round-4: real multimodal decode, VERDICT r3 next #4)
# ---------------------------------------------------------------------------


def test_av_container_roundtrip_psnr():
    """Per-frame PSNR ≥ 40 dB through encode_video→decode; audio lossless."""
    import numpy as np

    from lagespark.image import av, codecs

    frames = av.procedural_frames(9, 10)
    blob = av.encode_video(frames, 2.0)
    hdr, units = av.decode_all(blob)
    assert hdr["n_units"] == 10 and (hdr["w"], hdr["h"]) == (16, 16)
    for f, u in zip(frames, units):
        assert codecs.psnr(f, u) >= 40.0
    # frames are distinct content (roll+ramp), not repeats
    assert len({u.tobytes() for u in units}) == 10
    # index seek decodes exactly the same unit as the full pass
    assert (av.decode_unit(blob, hdr, 7) == units[7]).all()

    s = av.procedural_audio(4, 5000, 4000)
    ah, au = av.decode_all(av.encode_audio(s, 4000, 256))
    assert (np.concatenate(au)[:5000] == s).all()


def test_av_features_are_real_decode(spark):
    """decode_av_features stats come from DECODED content: recompute one
    row's mean/std driver-side from the regenerated source signal."""
    import numpy as np

    from lagespark.image import av as avc
    from lagespark.operators.image_ops import AV_RATE, AV_WINDOW

    df = image_ops.generate_av(spark, 8, partitions=2)
    feats = image_ops.decode_av_features(df).toPandas().set_index("media_id")
    # audio is lossless: decoded signal == procedural source (+ zero pad)
    i = 2  # med000002, audio
    dur = 1000 + (i % 60) * 500
    src = avc.procedural_audio(i, dur * AV_RATE // 1000, AV_RATE)
    n_units = (len(src) + AV_WINDOW - 1) // AV_WINDOW
    pad = np.zeros(n_units * AV_WINDOW, dtype=np.int16)
    pad[: len(src)] = src
    row = feats.loc[f"med{i:06d}"]
    assert row["n_units"] == n_units
    assert row["sig_mean"] == round(float(pad.astype(np.float64).mean()), 4)
    assert row["sig_std"] == round(float(pad.astype(np.float64).std()), 4)


def test_av_sampled_frames_match_source_psnr(spark):
    """End-to-end PSNR invariant: every sampled VIDEO frame decodes within
    40 dB of the procedural source frame it encodes; audio samples are
    bit-exact."""
    import numpy as np

    from lagespark.image import av as avc, codecs
    from lagespark.operators.image_ops import AV_FPS, AV_RATE, AV_WINDOW

    df = image_ops.generate_av(spark, 30, partitions=3)
    frames = image_ops.sample_av_frames(df, fps=1.0, max_samples=4).toPandas()
    assert len(frames) > 0
    for r in frames.itertuples():
        i = int(r.media_id[3:])
        if r.media_type == "video":
            dur = 1000 + (i % 60) * 500
            n_frames = max(1, int(dur * AV_FPS) // 1000)
            src = avc.procedural_frames(i, n_frames)
            fno = min(n_frames - 1, int(r.ts_ms * AV_FPS / 1000.0))
            got = np.frombuffer(r.data, dtype=np.uint8).reshape(r.h, r.w, 3)
            assert codecs.psnr(src[fno], got) >= 40.0
        else:
            dur = 1000 + (i % 60) * 500
            src = avc.procedural_audio(i, dur * AV_RATE // 1000, AV_RATE)
            wno = int(r.ts_ms * AV_RATE / 1000.0 / AV_WINDOW)
            got = np.frombuffer(r.data, dtype=np.int16)
            want = np.zeros(AV_WINDOW, dtype=np.int16)
            chunk = src[wno * AV_WINDOW : (wno + 1) * AV_WINDOW]
            want[: len(chunk)] = chunk
            assert (got == want).all()


def test_av_container_rejects_garbage():
    """Malformed containers fail with clear errors, not silent junk."""
    import zlib

    import numpy as np
    import pytest

    from lagespark.image import av

    with pytest.raises(ValueError, match="LAV1"):
        av.read_header(b"NOPE" + b"\x00" * 32)
    with pytest.raises(ValueError, match="media type"):
        av.read_header(av.MAGIC + bytes([9]) + b"\x00" * 32)
    # truncated body: header parses, decoding the missing unit raises
    blob = av.encode_video(av.procedural_frames(1, 3), 2.0)
    hdr = av.read_header(blob)
    cut = blob[: hdr["body_off"] + 4]
    with pytest.raises((ValueError, zlib.error)):
        av.decode_unit(cut, hdr, 2)
    # empty inputs refused at encode time
    with pytest.raises(ValueError, match="at least one"):
        av.encode_video([], 2.0)
    with pytest.raises(ValueError, match="at least one"):
        av.encode_audio(np.array([], dtype=np.int16), 4000)
