"""Unit tests for the training-data pipeline operators (dedup, similarity,
textops, multimodal) on small synthetic corpora with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.operators.dedup import (
    exact_dedup,
    jaccard_similarity,
    minhash_dedup_pairs,
    simhash_near_pairs,
)
from inbev_data_engineering_case_spark.operators.multimodal import (
    assets_from_documents,
    decode_features,
    resize_assets,
    sample_frames,
    target_rows_per_partition,
)
from inbev_data_engineering_case_spark.operators.similarity import (
    ann_bucketed_topk,
    cosine_topk,
)
from inbev_data_engineering_case_spark.operators.textops import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra tail"),  # near dup of 1
        (4, "completely different content about spark query engines"),
        (5, "el perro y el gato en la casa con un libro"),  # spanish-ish
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups_identical_texts(docs):
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse, min id survives
    assert out[3] == 1 and out[4] == 1


def test_fingerprint_is_whitespace_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [("The  Quick   Fox",), ("the quick fox",)], ["text"]
    )
    fps = [r[0] for r in df.select(fingerprint("text")).collect()]
    assert fps[0] == fps[1]


def test_minhash_finds_near_dup_not_distinct(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup: all slots equal
    assert (1, 3) in pairs  # near dup caught by LSH
    assert not any(4 in p for p in pairs)  # distinct doc has no pair


def test_simhash_near_pairs(docs):
    # bucket_bits=1 on this 5-doc corpus: the bucket prefilter is a
    # recall/scale dial and a flipped high bit can hide a near-dup behind a
    # bucket boundary — at test scale we want (almost) all-pairs.
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_pairs(docs, max_hamming=6, bucket_bits=1).collect()}
    assert pairs.get((1, 2)) == 0  # identical text → identical signature
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 6  # near dup caught
    assert not any(4 in p for p in pairs)  # distinct doc beyond budget


def test_jaccard_exact_values(spark, docs):
    pairs = spark.createDataFrame([(1, 2), (1, 4)], ["id_a", "id_b"])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           jaccard_similarity(pairs, docs).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 4)] < 0.1


def test_token_count_and_lang_id(docs):
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            token_count("text").alias("n"),
            lang_id("text").alias("lang"),
            quality_score("text").alias("q"),
        ).collect()
    }
    assert rows[1]["n"] == 12
    assert rows[1]["lang"] == "en"
    assert rows[5]["lang"] == "es"
    assert 0.0 <= rows[1]["q"] <= 1.0


def test_cosine_topk_self_similarity(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # anti-parallel to 0
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2, 3]
    assert out[0]["query_id"] == 0
    sims = {r["neighbor_id"]: r["sim"] for r in out}
    assert sims[3] == -1.0


def test_ann_bucketed_is_subset_of_exact(spark):
    import random

    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 3)
    exact = cosine_topk(df, queries, k=5).collect()
    approx = ann_bucketed_topk(df, queries, k=5, num_planes=4).collect()
    # bucketed candidates are a subset: every approx neighbor's sim must
    # appear in the exact all-pairs scores for that query
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    all_scores = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk(df, queries, k=50).collect()
    }
    for r in approx:
        assert (r["query_id"], r["neighbor_id"]) in all_scores
        assert all_scores[(r["query_id"], r["neighbor_id"])] == r["sim"]
    assert len(exact) == 3 * 5


def test_multimodal_plumbing(spark, docs):
    documents = docs.withColumn("source", F.lit("unit")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text"))
    assets = assets_from_documents(documents)
    row = assets.filter(F.col("asset_id") == 1).first()
    assert row["media_type"] == "text/plain"
    assert bytes(row["payload"]).decode() == docs.filter(
        F.col("doc_id") == 1
    ).first()["text"]
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))

    feats = {r["asset_id"]: r for r in decode_features(assets).collect()}
    payload = bytes(row["payload"])
    assert feats[1]["n_bytes"] == len(payload)
    assert feats[1]["checksum"] == sum(payload) % 1_000_003
    assert feats[1]["feature"][0] == float(len(payload))

    # the real (stdlib) decoder path also runs on text assets: crc32
    # checksum instead of the fake's byte-sum
    import zlib

    real = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    assert real[1]["checksum"] == zlib.crc32(payload) % 1_000_003


def test_target_rows_per_partition():
    assert target_rows_per_partition(2 * 1024 * 1024) == 128
    assert target_rows_per_partition(0) >= 1


def test_resize_assets_pads_and_truncates(spark, docs):
    documents = docs.withColumn("source", F.lit("unit")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text"))
    assets = assets_from_documents(documents)
    out = {r["asset_id"]: r for r in resize_assets(assets, target_bytes=16).collect()}
    for r in out.values():
        assert len(bytes(r["payload"])) == 16
        assert r["meta"]["n_bytes"] == 16
    long_text = docs.filter(F.col("doc_id") == 1).first()["text"]
    assert bytes(out[1]["payload"]) == long_text.encode()[:16]  # truncated
    # the real branch treats non-media payloads the same way (no decoder
    # to apply): truncate/pad, metadata recomputed
    real = {
        r["asset_id"]: r
        for r in resize_assets(assets, target_bytes=16, real_decoder=True).collect()
    }
    assert bytes(real[1]["payload"]) == long_text.encode()[:16]


def test_sample_frames_is_one_to_many(spark, docs):
    documents = docs.withColumn("source", F.lit("unit")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text"))
    assets = assets_from_documents(documents.filter(F.col("doc_id") == 1))
    text = docs.filter(F.col("doc_id") == 1).first()["text"].encode()
    frames = sorted(
        sample_frames(assets, frame_bytes=10, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    n_chunks = (len(text) + 9) // 10
    assert len(frames) == (n_chunks + 1) // 2  # every 2nd chunk kept
    assert [r["frame_idx"] for r in frames] == list(range(0, n_chunks, 2))
    assert bytes(frames[0]["frame"]) == text[:10]
    assert all(r["n_bytes"] == len(bytes(r["frame"])) for r in frames)


def test_dedup_components_chain_and_singleton(spark):
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components,
    )

    # chain 1-2-3 (one component), pair 7-9, node 5 only as id_a partner
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (5, 9)], ["id_a", "id_b"]
    )
    out = {r["node"]: r["comp"] for r in dedup_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 7: 5, 9: 5}


def test_ann_ivf_is_subset_of_exact(spark):
    import random

    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_ivf_topk,
    )

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 3)
    all_scores = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk(df, queries, k=60).collect()
    }
    approx = ann_ivf_topk(df, queries, k=5, n_centroids=8, n_probe=2).collect()
    assert approx  # probing 2 of 8 cells yields candidates
    for r in approx:
        assert all_scores[(r["query_id"], r["neighbor_id"])] == r["sim"]
    # per-query ranks are 1..n contiguous
    for qid in {r["query_id"] for r in approx}:
        ranks = sorted(r["rank"] for r in approx if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_embedding_near_dup_multiprobe_superset(spark):
    import random

    from inbev_data_engineering_case_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    rng = random.Random(3)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    # near-dups: tiny perturbation of each base vector
    rows = [(i, v) for i, v in enumerate(base)] + [
        (100 + i, [x * 1.001 if j % 2 else x for j, x in enumerate(v)])
        for i, v in enumerate(base)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    one = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.99).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.99, n_probes=3
        ).collect()
    }
    assert one <= multi  # extra probes only add recall
    # with 3 probes every constructed near-dup pair should be found
    assert {(i, 100 + i) for i in range(40)} <= multi


def test_ivf_trained_centroids_recall_holds(spark):
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact = cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
    n_exact = exact.count()

    def recall(ivf):
        return (
            ivf.select("query_id", "neighbor_id")
            .join(exact, ["query_id", "neighbor_id"])
            .count()
            / n_exact
        )

    cents = train_ivf_centroids(emb, n_centroids=16, n_iter=2)
    assert cents.count() <= 16  # cells may drop, never multiply
    # deterministic training: rounded means, deterministic init/ties
    again = train_ivf_centroids(emb, n_centroids=16, n_iter=2)
    assert sorted(map(tuple, cents.collect())) == sorted(
        map(tuple, again.collect())
    )
    trained = recall(ann_ivf_topk(emb, q, k=5, centroids=cents))
    firstn = recall(ann_ivf_topk(emb, q, k=5, n_centroids=16))
    # on this near-uniform synthetic corpus training rebalances cells;
    # recall must hold (within noise) at equal probe count, with a floor
    assert trained >= firstn - 0.05
    assert trained >= 0.4


def test_dedup_components_reliable_checkpoint_and_rounds(spark, tmp_path):
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components_with_stats,
    )

    # path graph 0-1-2-3-4: diameter 4 — the fused init already holds
    # round 1's neighbor-min (r15), the first loop round's hop+jump
    # reaches the remaining distance, and the loop then needs two more
    # rounds to OBSERVE the fixed point: the r16 one-action-per-round
    # loop measures convergence on the hop output (pre-jump), so
    # progress made by a round's jump is credited by the NEXT round's
    # hop sum — on a deep path that costs one extra confirm round
    # (3 vs 2) while every round now pays a single action instead of
    # two plus an eager checkpoint (the sf0.1 pair graph converges
    # hop-wise and keeps its round count; jobs/run measured 41 → 34)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["id_a", "id_b"]
    )
    expected = {i: 0 for i in range(5)}

    local_labels, local_rounds = dedup_components_with_stats(
        pairs, reliable_checkpoint=False
    )
    assert {r["node"]: r["comp"] for r in local_labels.collect()} == expected
    assert local_rounds == 3

    # cluster-safe path: fault-tolerant checkpoint to a checkpoint dir
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        rel_labels, rel_rounds = dedup_components_with_stats(pairs)  # auto
        assert {r["node"]: r["comp"] for r in rel_labels.collect()} == expected
        assert rel_rounds == local_rounds
        import os

        assert os.listdir(str(tmp_path / "ckpt"))  # actually wrote there
    finally:
        spark.sparkContext.setCheckpointDir(None)


def test_stdlib_real_decoder_wav_end_to_end(spark):
    import io
    import wave
    import zlib

    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _stdlib_featurize,
        decode_features,
    )

    def make_wav(freq_hz: int, seconds: float, framerate: int = 8000) -> bytes:
        t = np.arange(int(framerate * seconds)) / framerate
        pcm = (np.sin(2 * np.pi * freq_hz * t) * 12000).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(framerate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    wav_a, wav_b = make_wav(440, 0.5), make_wav(220, 0.25)
    blob = b"not media, just bytes" * 3
    assets = spark.createDataFrame(
        [
            (1, "audio/wav", wav_a, {"n_bytes": len(wav_a), "source": "t"}),
            (2, "audio/wav", wav_b, {"n_bytes": len(wav_b), "source": "t"}),
            (3, "application/octet-stream", blob,
             {"n_bytes": len(blob), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    out = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    # WAV really decoded: duration, framerate, channels from the container,
    # mean |amplitude| from the PCM frames (sine of amp A -> mean 2A/pi)
    dur, fr, nch, mean_abs = out[1]["feature"]
    assert (dur, fr, nch) == (0.5, 8000.0, 1.0)
    assert abs(mean_abs - 12000 * 2 / 3.14159) < 200
    assert out[2]["feature"][0] == 0.25
    # opaque binary: crc32 checksum + zlib compressibility
    assert out[3]["checksum"] == zlib.crc32(blob) % 1_000_003
    assert 0.0 < out[3]["feature"][1] < 1.0  # repetitive text compresses

    # compressed images / video remain the honest stub: PIL/ffmpeg absent
    import pytest as _pytest

    with _pytest.raises(
        NotImplementedError, match="requires a codec library"
    ):
        _stdlib_featurize("image/png", b"\x89PNG")
    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        _stdlib_featurize("video/mp4", b"\x00\x00\x00 ftypisom")


def _make_bmp(
    pixels_bgr: list[list[tuple[int, int, int]]], top_down: bool = False
) -> bytes:
    """Assemble a 24bpp BI_RGB BMP from a row-major pixel grid (stored
    bottom-up unless top_down, matching the format)."""
    import struct

    height, width = len(pixels_bgr), len(pixels_bgr[0])
    row_stride = ((width * 3 + 3) // 4) * 4
    raster = b""
    rows = pixels_bgr if top_down else list(reversed(pixels_bgr))
    for row in rows:
        raw = b"".join(bytes(px) for px in row)
        raster += raw.ljust(row_stride, b"\xAA")  # junk padding on purpose
    hdr_h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, hdr_h, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return file_hdr + info + raster


def test_stdlib_image_decoders():
    """BMP and binary-PNM decode natively: dimensions, mean pixel, and a
    padding-insensitive crc32 — no PIL involved."""
    import zlib

    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _stdlib_featurize,
    )

    # 2x3 BMP, known bytes: mean over the UNPADDED raster only
    grid = [
        [(0, 0, 0), (255, 255, 255), (10, 20, 30)],
        [(100, 110, 120), (1, 2, 3), (200, 210, 220)],
    ]
    flat = [b for row in grid for px in row for b in px]
    want_mean = sum(flat) / len(flat)
    checksum, feat = _stdlib_featurize("image/bmp", _make_bmp(grid))
    assert feat == [3.0, 2.0, 24.0, want_mean]

    # top-down variant: same pixels, same mean, same dimensions
    _, feat_td = _stdlib_featurize("image/bmp", _make_bmp(grid, top_down=True))
    assert feat_td[:3] == [3.0, 2.0, 24.0] and feat_td[3] == want_mean

    # P6 PPM with a header comment; checksum is crc32 of the raster
    raster = bytes(range(2 * 2 * 3))
    ppm = b"P6\n# a comment\n2 2\n255\n" + raster
    checksum, feat = _stdlib_featurize("image/x-portable-pixmap", ppm)
    assert feat == [2.0, 2.0, 3.0, sum(raster) / len(raster)]
    assert checksum == zlib.crc32(raster) % 1_000_003

    # P5 PGM, dispatched on magic even under a generic media type
    pgm = b"P5 3 1 255 " + bytes([0, 128, 255])
    _, feat = _stdlib_featurize("image/anything", pgm)
    assert feat == [3.0, 1.0, 1.0, (0 + 128 + 255) / 3]

    # malformed payloads fail loud, not wrong
    with _pytest.raises(ValueError, match="truncated"):
        _stdlib_featurize("image/bmp", _make_bmp(grid)[:-4])
    with _pytest.raises(ValueError, match="maxval"):
        _stdlib_featurize("image/x-portable-pixmap", b"P6 1 1 65535 \x00\x00")


def test_stdlib_image_decode_through_spark(spark):
    """The BMP branch through the real mapInPandas path (not just the inner
    function): q_multimodal_features' plumbing with real_decoder=True."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
    )

    bmp = _make_bmp([[(5, 5, 5), (10, 10, 10)]])
    assets = spark.createDataFrame(
        [(1, "image/bmp", bmp, {"n_bytes": len(bmp), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    row = decode_features(assets, real_decoder=True).collect()[0]
    assert row["feature"] == [2.0, 1.0, 24.0, 7.5]


def _make_png(rows, color_type, filters, palette=None) -> bytes:
    """Assemble a real PNG: per-row forward filtering (the encoder side of
    the spec's five filters, so the decoder's unfilter paths all get
    exercised), zlib-compressed scanlines, CRC'd chunks."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def px_bytes(px):
        return bytes([px]) if isinstance(px, int) else bytes(px)

    raw_rows = [b"".join(px_bytes(px) for px in row) for row in rows]
    bpp, stride = channels, len(raw_rows[0])
    prev = bytes(stride)
    scan = b""
    for raw, f in zip(raw_rows, filters):
        if f == 0:
            filt = raw
        elif f == 1:  # Sub
            filt = bytes(
                (raw[x] - (raw[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:  # Up
            filt = bytes((raw[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:  # Average
            filt = bytes(
                (raw[x] - (((raw[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            filt = b""
            for x in range(stride):
                a = raw[x - bpp] if x >= bpp else 0
                b_ = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                filt += bytes([(raw[x] - pred) & 0xFF])
        scan += bytes([f]) + filt
        prev = raw

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", stride // channels, len(rows), 8,
                       color_type, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    body += chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def test_stdlib_png_decoder():
    """PNG decodes for real — zlib inflate + all five unfilter paths; the
    fingerprint is over decoded pixels, so two encodings of the same image
    (different filter choices) hash identically."""
    import zlib

    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _stdlib_featurize,
    )

    # 3x5 RGB gradient: filters None/Sub/Up on one encoding, Avg/Paeth/Sub
    # on another — identical decoded raster, identical checksum
    rows = [
        [((r * 40 + c * 31) % 256, (r * 7 + c * 11) % 256, (r + c * 90) % 256)
         for c in range(5)]
        for r in range(3)
    ]
    flat = [v for row in rows for px in row for v in px]
    want_mean = sum(flat) / len(flat)
    want_crc = zlib.crc32(bytes(flat)) % 1_000_003
    enc_a = _make_png(rows, color_type=2, filters=[0, 1, 2])
    enc_b = _make_png(rows, color_type=2, filters=[3, 4, 1])
    for enc in (enc_a, enc_b):
        checksum, feat = _stdlib_featurize("image/png", enc)
        assert feat == [5.0, 3.0, 3.0, want_mean]
        assert checksum == want_crc
    assert enc_a != enc_b  # genuinely different byte streams

    # grayscale with Paeth + RGBA with Average: channel counts flow through
    gray = [[10, 200, 30], [250, 5, 128]]
    _, feat = _stdlib_featurize("image/png", _make_png(gray, 0, [4, 4]))
    assert feat == [3.0, 2.0, 1.0, (10 + 200 + 30 + 250 + 5 + 128) / 6]
    rgba = [[(1, 2, 3, 255), (9, 8, 7, 0)]]
    _, feat = _stdlib_featurize("image/png", _make_png(rgba, 6, [3]))
    assert feat[:3] == [2.0, 1.0, 4.0]

    # palette expands through PLTE before the stats
    pal = [(255, 0, 0), (0, 255, 0)]
    png_p = _make_png([[0, 1], [1, 0]], 3, [0, 2], palette=pal)
    checksum, feat = _stdlib_featurize("image/png", png_p)
    assert feat == [2.0, 2.0, 3.0, 510 / 6.0]
    expanded = bytes([255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 0])
    assert checksum == zlib.crc32(expanded) % 1_000_003

    # malformed/unsupported fail loud (cut reaches into the IDAT data;
    # a clipped IEND alone is tolerated, as it should be)
    with _pytest.raises(ValueError, match="truncated"):
        _stdlib_featurize("image/png", enc_a[:-17])
    import struct as _struct

    bad_depth = bytearray(_make_png(gray, 0, [0, 0]))
    bad_depth[24] = 16  # IHDR bit_depth byte
    bad_depth[29:33] = _struct.pack(
        ">I", zlib.crc32(bytes(bad_depth[12:29]))
    )
    with _pytest.raises(ValueError, match="bit_depth"):
        _stdlib_featurize("image/png", bytes(bad_depth))
    # JPEG now routes to the native decoder: a corrupt stream fails loud
    # (ValueError -> dead-letter), not as a capability gap
    with _pytest.raises(ValueError, match="truncated|marker"):
        _stdlib_featurize("image/jpeg", b"\xff\xd8\xff\xe0 not decodable")


def test_png_roundtrip_property():
    """Encoder(test)→decoder(engine) round-trip under hypothesis: any pixel
    grid, any per-row filter choice, any supported channel count must
    decode back to exactly the input pixels — the unfilter math (incl. the
    sequential Average/Paeth paths) is bit-exact, not approximately right."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _png_decode,
    )

    @settings(max_examples=30, deadline=None)
    @given(data=st.data())
    def check(data):
        h = data.draw(st.integers(1, 5))
        w = data.draw(st.integers(1, 5))
        color_type, ch = data.draw(
            st.sampled_from([(0, 1), (2, 3), (6, 4)])
        )
        px = data.draw(
            st.lists(
                st.lists(
                    st.tuples(*([st.integers(0, 255)] * ch)),
                    min_size=w, max_size=w,
                ),
                min_size=h, max_size=h,
            )
        )
        rows = [[p[0] for p in row] for row in px] if ch == 1 else px
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        decoded, channels = _png_decode(_make_png(rows, color_type, filters))
        assert channels == ch
        want = np.array(
            [[list(p) for p in row] for row in px], dtype=np.uint8
        )
        assert np.array_equal(decoded, want)

    check()


def _make_y4m(width: int, height: int, lumas: list[int]) -> bytes:
    """Assemble a C420 YUV4MPEG2 stream: one constant-luma frame per entry
    (chroma planes fixed at 128)."""
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (width, height)
    n_luma = width * height
    n_chroma = n_luma // 2
    return head + b"".join(
        b"FRAME\n" + bytes([y]) * n_luma + bytes([128]) * n_chroma
        for y in lumas
    )


def test_y4m_demux_featurize_and_frame_sample(spark):
    """Uncompressed video decodes for real: the Y4M featurizer reports
    true dimensions/frame-count/mean-luma, and sample_frames' real branch
    demuxes at FRAME boundaries keeping original frame indices."""
    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _stdlib_featurize,
        sample_frames,
    )

    y4m = _make_y4m(4, 2, lumas=[0, 100, 200, 50, 250])
    checksum, feat = _stdlib_featurize("video/x-y4m", y4m)
    assert feat == [4.0, 2.0, 5.0, (0 + 100 + 200 + 50 + 250) / 5]

    assets = spark.createDataFrame(
        [(7, "video/x-y4m", y4m, {"n_bytes": len(y4m), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    frames = sorted(
        sample_frames(assets, every_n=2, real_decoder=True).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in frames] == [0, 2, 4]
    # each kept frame is the raw planar payload: 8 luma + 4 chroma bytes
    assert all(r["n_bytes"] == 4 * 2 * 3 // 2 for r in frames)
    assert bytes(frames[1]["frame"])[:8] == bytes([200]) * 8

    with _pytest.raises(ValueError, match="FRAME marker"):
        _stdlib_featurize("video/x-y4m", y4m + b"JUNK")
    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        _stdlib_featurize("video/mp4", b"\x00\x00\x00 ftypisom")


def test_resize_assets_real_decoders(spark):
    """The real resize branch decodes → resamples → re-encodes: images
    come back as smaller PNM rasters (media_type updated), WAV comes back
    frame-decimated with duration preserved."""
    import io
    import wave

    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        resize_assets,
    )

    bmp = _make_bmp([[(90, 90, 90)] * 4 for _ in range(4)])  # 4x4 constant
    png = _make_png([[(10, 20, 30)] * 6 for _ in range(6)], 2, [0] * 6)
    pcm = (np.sin(np.arange(4000) / 20) * 9000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    wav = buf.getvalue()

    assets = spark.createDataFrame(
        [
            (1, "image/bmp", bmp, {"n_bytes": len(bmp), "source": "t"}),
            (2, "image/png", png, {"n_bytes": len(png), "source": "t"}),
            (3, "audio/wav", wav, {"n_bytes": len(wav), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    out = {
        r["asset_id"]: r
        for r in resize_assets(
            assets, target_bytes=2000, real_decoder=True
        ).collect()
    }

    # 4x4x3 = 48 bytes already fits 2000 -> no upsampling, same pixels
    p1 = bytes(out[1]["payload"])
    assert out[1]["media_type"] == "image/x-portable-pixmap"
    assert p1.startswith(b"P6\n4 4\n255\n")
    assert set(p1.split(b"255\n", 1)[1]) == {90}  # BGR->RGB of a constant

    # 6x6 PNG -> PNM, still 6x6 (108 bytes fit), RGB order preserved
    p2 = bytes(out[2]["payload"])
    assert p2.startswith(b"P6\n6 6\n255\n")
    assert p2.split(b"255\n", 1)[1][:3] == bytes([10, 20, 30])

    # image genuinely shrinks when over budget: 6x6 -> 2x2 under 12 bytes
    small = {
        r["asset_id"]: r
        for r in resize_assets(
            assets.filter("asset_id = 2"), target_bytes=12, real_decoder=True
        ).collect()
    }
    assert bytes(small[2]["payload"]).startswith(b"P6\n2 2\n255\n")

    # WAV: 8000 bytes of PCM -> k=4 decimation, frame rate 8000->2000,
    # duration 0.5 s preserved
    with wave.open(io.BytesIO(bytes(out[3]["payload"]))) as r:
        assert r.getframerate() == 2000
        assert r.getnframes() == 1000
        kept = np.frombuffer(r.readframes(1000), dtype="<i2")
    assert np.array_equal(kept, pcm[::4])


def test_read_binary_assets_lands_real_media(spark, tmp_path):
    """The binaryFile landing scan → asset schema → real decoder, end to
    end: files on disk come back as typed assets whose payloads genuinely
    decode; the size cap prunes oversized files at the source."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        ASSET_SCHEMA,
        decode_features,
    )
    from inbev_data_engineering_case_spark.sources.readers import (
        read_binary_assets,
    )

    bmp = _make_bmp([[(9, 9, 9), (9, 9, 9)]])
    y4m = _make_y4m(2, 2, lumas=[10, 20])
    (tmp_path / "a.bmp").write_bytes(bmp)
    (tmp_path / "b.y4m").write_bytes(y4m)
    (tmp_path / "huge.bin").write_bytes(b"\0" * 4096)

    assets = read_binary_assets(spark, str(tmp_path), max_bytes=2048)
    # same names/types as the asset contract (nullability flags differ:
    # source-derived columns are conservatively nullable)
    assert assets.schema.simpleString() == ASSET_SCHEMA.simpleString()
    rows = {r["media_type"]: r for r in assets.collect()}
    assert set(rows) == {"image/bmp", "video/x-y4m"}  # huge.bin pruned
    assert bytes(rows["image/bmp"]["payload"]) == bmp
    assert rows["video/x-y4m"]["meta"]["n_bytes"] == len(y4m)
    assert rows["image/bmp"]["meta"]["source"].endswith("a.bmp")

    feats = {
        r["media_type"]: r["feature"]
        for r in decode_features(assets, real_decoder=True).collect()
    }
    assert feats["image/bmp"] == [2.0, 1.0, 24.0, 9.0]
    assert feats["video/x-y4m"] == [2.0, 2.0, 2.0, 15.0]

    # asset ids are a pure function of the path: stable across re-listing
    ids_a = sorted(r["asset_id"] for r in assets.collect())
    ids_b = sorted(
        r["asset_id"]
        for r in read_binary_assets(spark, str(tmp_path), max_bytes=2048).collect()
    )
    assert ids_a == ids_b


def test_train_ivf_centroids_rejects_huge_k(spark):
    """The collect-path Lloyd trainer round-trips the K×d model through
    the driver per iteration; a K that makes the model driver-sized must
    fail loud before any training work — while 'auto' routes the same K
    to the DataFrame path instead of refusing (covered in
    test_ivf_dataframe_training_matches_collect)."""
    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="max_centroid_cells"):
        train_ivf_centroids(emb, n_centroids=2_000_000, method="collect")


def test_ann_multiprobe_recall_monotone(spark):
    """Multi-probe candidates are a superset of single-probe (seed 0 runs
    in both) and ranking is by true cosine, so every exact neighbor found
    at 1 probe is still found at 3."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_bucketed_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    p1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_bucketed_topk(emb, q, k=5, n_probes=1).collect()
    }
    p3 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_bucketed_topk(emb, q, k=5, n_probes=3).collect()
    }
    # per query, 3-probe top-5 is at least as similar: the 1-probe hit set
    # against the exact top-k can only grow (asserted end-to-end by
    # q_ann_probes); here we check the candidate-superset mechanics —
    # every query keeps >= as many returned neighbors
    from collections import Counter

    c1, c3 = Counter(a for a, _ in p1), Counter(a for a, _ in p3)
    assert all(c3[qid] >= n for qid, n in c1.items())


def test_signlsh_literal_weights_match_runtime_path(spark):
    """The r15 literal-weight bucket path (dim known → plane weights
    embedded as plan literals) is bit-identical to the runtime
    portable_hash64 path for every (seed, vector), the driver-side
    weight twin reproduces the in-plan expression exactly, and a
    vector whose length differs from the probed dim raises in-plan
    instead of silently bucketing in a different geometry."""
    import math

    import pytest

    from inbev_data_engineering_case_spark.operators.similarity import (
        _plane_weight,
        _plane_weight_value,
        _vec_dim,
        signlsh_bucket,
    )

    d = 16
    df = spark.createDataFrame(
        [
            (j, [math.sin(j * 37.0 + i * 13.0) for i in range(d)])
            for j in range(60)
        ]
        + [(999, None)],  # NULL vector: bucket 0 on both paths
        "vec_id long, embedding array<double>",
    )
    assert _vec_dim(df, "embedding") == d
    for seed in (0, 1, 2):
        rows = df.select(
            signlsh_bucket("embedding", 8, seed=seed).alias("rt"),
            signlsh_bucket("embedding", 8, seed=seed, dim=d).alias("lit"),
        ).collect()
        assert all(r["rt"] == r["lit"] for r in rows), seed

    # the driver twin == the in-plan weight expression, element-wise
    got = spark.range(1).select(
        *[
            _plane_weight(p, F.lit(i), seed).alias(f"w_{p}_{i}_{seed}")
            for p in (0, 3)
            for i in (0, 7, 15)
            for seed in (0, 2)
        ]
    ).collect()[0]
    for p in (0, 3):
        for i in (0, 7, 15):
            for seed in (0, 2):
                assert got[f"w_{p}_{i}_{seed}"] == _plane_weight_value(
                    p, i, seed
                ), (p, i, seed)

    bad = spark.createDataFrame(
        [(1, [1.0] * d), (2, [1.0] * (d + 1))],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="mixed-dimension"):
        bad.select(
            signlsh_bucket("embedding", 8, seed=0, dim=d)
        ).collect()


def test_ann_multiprobe_provably_adds_known_neighbor(spark):
    """Deterministic synthetic fixture where the second probe PROVABLY
    contributes: a neighbor in a different seed-0 bucket than the query
    but the same seed-1 bucket is invisible at n_probes=1 and found at
    n_probes=2. An implementation that silently ignores the lever (e.g.
    always bucketing under seed 0) returns the identical result for both
    and fails here — the regression class the weakened sf-fixture
    property oracles (monotone + in-range) cannot detect."""
    import math

    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_bucketed_topk,
        signlsh_bucket,
    )

    d = 16
    vecs = {
        j: [math.sin(j * 37.0 + i * 13.0) for i in range(d)]
        for j in range(80)
    }
    df = spark.createDataFrame(
        [(j, v) for j, v in vecs.items()], ["vec_id", "embedding"]
    )
    buckets = {
        r["vec_id"]: (r["b0"], r["b1"])
        for r in df.select(
            "vec_id",
            signlsh_bucket("embedding", 8, seed=0).alias("b0"),
            signlsh_bucket("embedding", 8, seed=1).alias("b1"),
        ).collect()
    }
    # pick (query, cross, same): `cross` shares the query's seed-1 bucket
    # only; `same` shares its seed-0 bucket. Hyperplanes are deterministic
    # pseudo-randoms of (plane, dim), so this scan is reproducible.
    pick = next(
        (
            (q, c, s)
            for q in buckets
            for c in buckets
            for s in buckets
            if len({q, c, s}) == 3
            and buckets[c][0] != buckets[q][0]
            and buckets[c][1] == buckets[q][1]
            and buckets[s][0] == buckets[q][0]
        ),
        None,
    )
    assert pick is not None, "fixture degenerated: no probe-2-only pair"
    qid, cross, same = pick

    corpus = df.filter(F.col("vec_id").isin(qid, cross, same))
    query = df.filter(F.col("vec_id") == qid)

    def found(n_probes: int) -> set:
        return {
            r["neighbor_id"]
            for r in ann_bucketed_topk(
                corpus, query, k=5, n_probes=n_probes
            ).collect()
        }

    assert found(1) == {same}  # cross-bucket neighbor invisible
    assert found(2) == {same, cross}  # second probe adds exactly it


def test_ensure_parallelism_in_memory_fallback(spark):
    """Non-file sources (createDataFrame) have no scan-split estimate; the
    rdd-partition fallback must still fan a 1-partition corpus out to the
    session's core count before the compute-bound signature stage."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        _ensure_parallelism,
    )

    one_part = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], ["doc_id", "text"]
    ).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    assert _ensure_parallelism(one_part).rdd.getNumPartitions() == target

    # file scans keep the metadata path: a parquet input at/above target
    # parallelism is left alone (no extra exchange)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.range(1000).repartition(target).write.parquet(f"{d}/t")
        wide = spark.read.parquet(f"{d}/t")
        assert _ensure_parallelism(wide) is wide


def test_curate_corpus_end_to_end(spark):
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )

    en = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    rows = [
        (1, en),                         # kept
        (2, en),                         # exact dup of 1 -> dropped
        (3, en + " extra tail words"),   # near-dup of 1 -> dropped
        (4, "el que la de y en un una por con el que la de y en un por"),
        # ^ Spanish -> dropped by language filter
        (5, "x! y? z. a; b: c, d! e? f."),  # junk -> dropped by quality
        (6, "a completely different english text about the history of "
            "bridges and the people that built them in the old days of "
            "iron and stone for the crossing of rivers"),  # kept
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = curate_corpus(docs, min_quality=0.3, near_dup_threshold=0.5)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 6]
    cols = set(kept.columns)
    assert {"doc_id", "text", "lang", "quality"} <= cols

    # optional decontamination stage: a benchmark sharing an 8-gram with
    # doc 6 drops it from the curated corpus; everything else unchanged
    benchmark = spark.createDataFrame(
        [(99, "the history of bridges and the people that built them")],
        ["doc_id", "text"],
    )
    decon = curate_corpus(
        docs, min_quality=0.3, near_dup_threshold=0.5, benchmark=benchmark
    )
    assert sorted(r["doc_id"] for r in decon.collect()) == [1]


def test_score_documents_matches_standalone_expressions(spark):
    """The staged one-tokenization scorer must produce bit-identical
    (lang, quality) to the standalone lang_id/quality_score expressions —
    it is a plan restructuring, not a semantic change."""
    from inbev_data_engineering_case_spark.operators.textops import (
        lang_id,
        quality_score,
        score_documents,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog in a field"),
        (2, "el que la de y en un una por con el que la de y en un"),
        (3, "der die das und ist von mit ein zu den der die das und"),
        (4, "le la les de et un une est que pour le la les de et"),
        (5, "zzz qqq www!!! ???"),          # und + junky punctuation
        (6, "the el der le"),               # cross-language tie-break
        (7, "x"),                           # single token, no stopwords
        # r16: score_documents builds its staged plan as SQL text (one
        # selectExpr parse per stage); these rows pin the lexer-facing
        # edges of that rewrite — every whitespace-class control char
        # (the regex is embedded as a raw string literal), quotes and
        # backslashes in the data, and whitespace-only text
        (8, "tab\tand\x0bvt\fff\rcr\nnl the of and to"),
        (9, "   "),                         # whitespace-only: [''] token
        (10, "it's a 'quoted' back\\slash the of"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    staged = {
        r["doc_id"]: (r["lang"], r["quality"])
        for r in score_documents(docs).collect()
    }
    standalone = {
        r["doc_id"]: (r["lang"], r["quality"])
        for r in docs.select(
            "doc_id",
            lang_id("text").alias("lang"),
            quality_score("text").alias("quality"),
        ).collect()
    }
    assert staged == standalone  # exact float equality, not approx


def test_minhash_signatures_expr_parity(spark):
    """r16: ``minhash_signatures`` builds its two projections as SQL text
    (one selectExpr parse each) instead of a py4j Column tree. The parsed
    plan must stay bit-identical to the Column-API form — same shingles,
    same md5 base hash, same affine mixes — including every whitespace
    control character the tokenizer class names, quotes/backslashes in
    the data, and too-short/empty documents (empty shingle set → all-NULL
    signature slots on both paths)."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.functions import (
        MH_PRIME,
        MH_RANGE,
        minhash_mixers,
        portable_hash64,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_signatures,
        word_shingle_set,
    )

    def column_form(df, text_col="text", id_col="doc_id", num_hashes=8,
                    shingle_words=3):
        def mixer(a, b):
            return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MH_PRIME)

        base = F.transform(
            word_shingle_set(text_col, shingle_words),
            lambda s: portable_hash64(s) % F.lit(MH_RANGE),
        )
        hashed = df.select(F.col(id_col).alias("id"), base.alias("h"))
        sig = F.array(
            *[
                F.array_min(F.transform(F.col("h"), mixer(a, b)))
                for a, b in minhash_mixers(num_hashes)
            ]
        )
        return hashed.select("id", sig.alias("sig"))

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in a field"),
            (2, "tab\tand\x0bvt\fff\rcr\nnl the of and to"),
            (3, "   "),
            (4, "it's a 'quoted' back\\slash the of and to in is"),
            (5, "one two"),          # shorter than the shingle window
            (6, ""),
            (7, "the quick brown fox jumps over the lazy dog in a field"),
        ],
        "doc_id long, text string",
    )
    for k, w in ((8, 3), (4, 2)):
        new = sorted(
            (r["id"], tuple(r["sig"]))
            for r in minhash_signatures(
                docs, num_hashes=k, shingle_words=w
            ).collect()
        )
        old = sorted(
            (r["id"], tuple(r["sig"]))
            for r in column_form(
                docs, num_hashes=k, shingle_words=w
            ).collect()
        )
        assert new == old, (k, w)


@pytest.mark.slow
def test_ivf_dataframe_training_matches_collect(spark, tmp_path):
    """method='dataframe' must produce bit-identical centroids to the
    collect path (means are rounded before they cross iterations), and a
    K*d above the collect guard must train via auto-selection instead of
    raising."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        train_ivf_centroids,
    )

    vecs = spark.createDataFrame(
        [
            (i, [float((i * 3) % 7), float((i * 5) % 11), float(i % 4) + 1.0])
            for i in range(60)
        ],
        "vec_id long, embedding array<double>",
    )

    coll = train_ivf_centroids(vecs, 4, n_iter=2, method="collect")
    for mode in ("local", f"table:{tmp_path}/ivf"):
        df = train_ivf_centroids(
            vecs, 4, n_iter=2, method="dataframe", materialize_mode=mode
        )
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, coll.collect())
        )

    # collect path refuses beyond the guard; auto now trains instead
    with pytest.raises(ValueError, match="too large to collect"):
        train_ivf_centroids(vecs, 4, method="collect", max_centroid_cells=4)
    auto = train_ivf_centroids(vecs, 4, n_iter=2, max_centroid_cells=4)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, coll.collect())
    )


@pytest.mark.slow
def test_curate_incremental_parity_with_full_batch(spark):
    """The composed daily-crawl pipeline: curating only the snapshot delta
    against the stored corpus artifacts must reach the same curated corpus
    as re-running full-batch curate_corpus on the union (for delta docs
    whose similarity links are direct — the documented incremental
    contract)."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )

    en = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    bridges = (
        "a completely different english text about the history of bridges "
        "and the people that built them in the old days of iron and stone "
        "for the crossing of rivers"
    )
    history = spark.createDataFrame(
        [
            (1, en),                        # kept
            (2, en),                        # exact dup -> dropped
            (3, en + " extra tail words"),  # near-dup of 1 -> dropped
            (6, bridges),                   # kept
        ],
        ["doc_id", "text"],
    )
    kept = curate_corpus(history, min_quality=0.3, near_dup_threshold=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 6]

    # yesterday's run stored these artifacts over the KEPT corpus only
    stored_sigs = minhash_signatures(kept.select("doc_id", "text"))
    stored_fps = exact_dedup(kept.select("doc_id", "text"))

    delta = spark.createDataFrame(
        [
            (10, en),                        # exact dup of kept 1 -> dropped
            (11, en + " extra tail words"),  # near-dup of kept 1 -> dropped
            (12, bridges + " extra tail words"),  # near-dup of kept 6 -> dropped
            (13, "an entirely fresh english report on the building of "
                 "lighthouses along the coast and the keepers who lived "
                 "in them through the long storms of winter"),  # kept
            (14, "el que la de y en un una por con el que la de y en un"),
            # ^ Spanish -> filtered
        ],
        ["doc_id", "text"],
    )
    new_snapshot = history.unionByName(delta)

    incr = curate_incremental(
        history, new_snapshot, stored_sigs, stored_fps,
        min_quality=0.3, near_dup_threshold=0.5,
    )
    incr_ids = sorted(r["doc_id"] for r in incr.collect())
    assert incr_ids == [13]

    full = curate_corpus(
        new_snapshot, min_quality=0.3, near_dup_threshold=0.5
    )
    kept_union = sorted(
        [r["doc_id"] for r in kept.collect()] + incr_ids
    )
    assert kept_union == sorted(r["doc_id"] for r in full.collect())

    # updates re-enter curation under their unchanged id: the self-pair
    # guard keeps an updated doc from matching its own stale signature
    updated = new_snapshot.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 6,
            F.concat("text", F.lit(" revised edition with new words")),
        ).otherwise(F.col("text")),
    )
    upd = curate_incremental(
        new_snapshot, updated, stored_sigs, stored_fps,
        min_quality=0.3, near_dup_threshold=0.5,
    )
    assert sorted(r["doc_id"] for r in upd.collect()) == [6]


def test_chunk_documents_known_answer(spark):
    """Hand-computed chunk boundaries: 10 tokens, window 4, overlap 1
    (stride 3) -> chunks at starts 0,3,6 cover all tokens... n=10:
    n_chunks = ceil((10-4)/3)+1 = 3, last chunk = tokens 7..10."""
    from inbev_data_engineering_case_spark.operators.curate import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
            (2, "a b c"),  # under the window: one whole chunk
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            docs, chunk_tokens=4, overlap=1
        ).collect()
    }
    assert out == {
        (1, 0): ("t1 t2 t3 t4", 4),
        (1, 1): ("t4 t5 t6 t7", 4),
        (1, 2): ("t7 t8 t9 t10", 4),
        (2, 0): ("a b c", 3),
    }
    # every token appears in some chunk; consecutive chunks overlap by 1
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


@pytest.mark.slow
def test_curate_incremental_chained_two_days(spark):
    """Two consecutive incremental runs with artifact advancement between
    them must reach the same corpus as one full-batch run over
    everything — the loop a daily pipeline actually executes: curate
    delta, advance artifacts by the kept rows, repeat."""
    from inbev_data_engineering_case_spark.operators.curate import (
        advance_corpus_artifacts,
        curate_corpus,
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )

    en = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    lighthouse = (
        "an entirely fresh english report on the building of lighthouses "
        "along the coast and the keepers who lived in them through the "
        "long storms of winter"
    )
    day0 = spark.createDataFrame([(1, en)], ["doc_id", "text"])
    kept0 = curate_corpus(day0, min_quality=0.3, near_dup_threshold=0.5)
    sigs = minhash_signatures(kept0.select("doc_id", "text"))
    fps = exact_dedup(kept0.select("doc_id", "text"))

    # day 1: one fresh doc (kept), one near-dup of day-0 (dropped)
    d1 = spark.createDataFrame(
        [(10, lighthouse), (11, en + " extra tail words")],
        ["doc_id", "text"],
    )
    snap1 = day0.unionByName(d1)
    kept1 = curate_incremental(
        day0, snap1, sigs, fps, min_quality=0.3, near_dup_threshold=0.5
    )
    assert sorted(r["doc_id"] for r in kept1.collect()) == [10]
    sigs, fps = advance_corpus_artifacts(
        kept1.select("doc_id", "text"), sigs, fps
    )

    # day 2: near-dup AND exact dup of the doc kept on day 1 — only the
    # advanced artifacts can drop these — plus one fresh doc
    d2 = spark.createDataFrame(
        [
            (20, lighthouse + " extra tail words"),
            (21, lighthouse),
            (22, "a completely different english text about the history "
                 "of bridges and the people that built them in the old "
                 "days of iron and stone for the crossing of rivers"),
        ],
        ["doc_id", "text"],
    )
    snap2 = snap1.unionByName(d2)
    kept2 = curate_incremental(
        snap1, snap2, sigs, fps, min_quality=0.3, near_dup_threshold=0.5
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [22]

    full = curate_corpus(snap2, min_quality=0.3, near_dup_threshold=0.5)
    incremental_union = sorted(
        [r["doc_id"] for r in kept0.collect()]
        + [r["doc_id"] for r in kept1.collect()]
        + [r["doc_id"] for r in kept2.collect()]
    )
    assert incremental_union == sorted(
        r["doc_id"] for r in full.collect()
    )


@pytest.mark.slow
def test_advance_artifacts_update_semantics(spark):
    """An UPDATED doc (same id, new text) across an advancement: append
    mode keeps the old rows as the memory of everything ever emitted
    (a later near-dup of the OLD text still drops), replace mode sheds
    them (a later near-dup of the old text is fresh again). Both modes
    index the new text."""
    from inbev_data_engineering_case_spark.operators.curate import (
        advance_corpus_artifacts,
        curate_corpus,
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )

    old_text = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    new_text = (
        "an entirely fresh english report on the building of lighthouses "
        "along the coast and the keepers who lived in them through the "
        "long storms of winter"
    )
    day0 = spark.createDataFrame([(1, old_text)], ["doc_id", "text"])
    kept0 = curate_corpus(day0, min_quality=0.3, near_dup_threshold=0.5)
    sigs0 = minhash_signatures(kept0.select("doc_id", "text"))
    fps0 = exact_dedup(kept0.select("doc_id", "text"))

    # day 1: doc 1 is UPDATED to entirely new text
    snap1 = spark.createDataFrame([(1, new_text)], ["doc_id", "text"])
    kept1 = curate_incremental(
        day0, snap1, sigs0, fps0, min_quality=0.3, near_dup_threshold=0.5
    )
    # the update re-enters curation and, being fresh text, is kept (the
    # self-pair guard keeps it from matching its own stale signature)
    assert [r["doc_id"] for r in kept1.collect()] == [1]

    probe = spark.createDataFrame(
        [(50, old_text + " extra tail words"),
         (51, new_text + " extra tail words")],
        ["doc_id", "text"],
    )

    def day2_kept(sigs, fps):
        snap2 = snap1.unionByName(probe)
        kept = curate_incremental(
            snap1, snap2, sigs, fps, min_quality=0.3,
            near_dup_threshold=0.5,
        )
        return sorted(r["doc_id"] for r in kept.collect())

    ap_sigs, ap_fps = advance_corpus_artifacts(
        kept1.select("doc_id", "text"), sigs0, fps0
    )
    # append: BOTH old-text and new-text near-dups drop — the old text
    # was already emitted, its signature is retained on purpose
    assert day2_kept(ap_sigs, ap_fps) == []
    assert ap_sigs.filter(F.col("id") == 1).count() == 2  # old + new rows

    rp_sigs, rp_fps = advance_corpus_artifacts(
        kept1.select("doc_id", "text"), sigs0, fps0, mode="replace",
        delta_ids=snap1.select("doc_id"),
    )
    # replace: the stale signature is gone, so the old-text near-dup is
    # fresh again; the new-text near-dup still drops
    assert day2_kept(rp_sigs, rp_fps) == [50]
    assert rp_sigs.filter(F.col("id") == 1).count() == 1  # new row only


@pytest.mark.slow
def test_curate_corpus_materialize_modes_identical(spark, tmp_path):
    """The cluster-safe materialization swaps (reliable checkpoint,
    parquet scratch table) are config values; every mode must produce the
    byte-identical curated corpus as the executor-local default."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )

    en = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    rows = [
        (1, en),
        (2, en),
        (3, en + " extra tail words"),
        (6, "a completely different english text about the history of "
            "bridges and the people that built them in the old days of "
            "iron and stone for the crossing of rivers"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def snapshot(mode: str) -> list[tuple]:
        kept = curate_corpus(
            docs, min_quality=0.3, near_dup_threshold=0.5,
            materialize_mode=mode,
        )
        return sorted(tuple(r) for r in kept.collect())

    baseline = snapshot("local")
    assert [r[0] for r in baseline] == [1, 6]

    assert snapshot(f"table:{tmp_path}/mat") == baseline
    # table mode actually wrote its scratch tables
    assert list((tmp_path / "mat").glob("mat_*")), "no scratch tables written"

    # every scratch path is registered, and bulk cleanup removes them all
    # (caller-owned contract: nothing is auto-deleted while plans may
    # still read them; cleanup is explicit after the terminal action)
    from inbev_data_engineering_case_spark.operators.dedup import (
        cleanup_scratch_tables,
        scratch_table_paths,
    )

    on_disk = {str(p) for p in (tmp_path / "mat").glob("mat_*")}
    assert on_disk <= set(scratch_table_paths(spark))
    removed = cleanup_scratch_tables(spark)
    assert on_disk <= set(removed)
    assert not list((tmp_path / "mat").glob("mat_*"))
    assert scratch_table_paths(spark) == []

    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        assert snapshot("checkpoint") == baseline
    finally:
        sc.setCheckpointDir(None)


def test_materialize_mode_rejects_unknown(spark):
    from inbev_data_engineering_case_spark.operators.dedup import (
        _parse_materialize_mode,
    )

    for bad in ("tables", "table:", "delta", ""):
        with pytest.raises(ValueError):
            _parse_materialize_mode(bad)
    assert _parse_materialize_mode("table:/tmp/x") == ("table", "/tmp/x")


def test_incremental_pairs_table_mode_identical(spark, tmp_path):
    from inbev_data_engineering_case_spark.operators.curate import (
        incremental_minhash_pairs,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    stored = minhash_signatures(
        spark.createDataFrame([(1, base)], ["doc_id", "text"])
    )
    new = spark.createDataFrame(
        [(10, base + " tail"), (11, "totally unrelated words here now")],
        ["doc_id", "text"],
    )

    def pairs(mode: str) -> list[tuple]:
        out = incremental_minhash_pairs(
            new, stored, threshold=0.3, materialize_mode=mode
        )
        return sorted(tuple(r) for r in out.collect())

    assert pairs(f"table:{tmp_path}/inc") == pairs("local")


def test_components_long_chain_converges_logarithmically(spark):
    """A 64-node path graph has diameter 63: pure min-label propagation
    needs 63 rounds (silently wrong under max_iter=25); pointer jumping
    must converge in O(log diameter) and still produce minimal labels."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components_with_stats,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    labels, rounds = dedup_components_with_stats(chain)
    assert {r["comp"] for r in labels.collect()} == {0}
    assert labels.count() == 64
    assert rounds <= 9, rounds  # log2(63) ~ 6 plus fixed-point round


def test_contamination_report_and_decontaminate(spark):
    """Known-answer decontamination: a doc embedding a benchmark 8-gram is
    flagged with the exact distinct-gram count; clean docs pass through
    untouched; repeated phrases within one doc don't inflate the count."""
    from inbev_data_engineering_case_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    benchmark = spark.createDataFrame(
        [(900, bench_text)], "doc_id long, text string"
    )
    # 9 tokens -> two 8-grams: tokens[0:8] and tokens[1:9]
    contaminated = "intro " + bench_text + " outro"  # contains both grams
    repeated = ("alpha bravo charlie delta echo foxtrot golf hotel " * 2).strip()
    clean = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, contaminated), (2, repeated), (3, clean)],
        "doc_id long, text string",
    )

    report = {
        r["doc_id"]: r["matched_ngrams"]
        for r in contamination_report(docs, benchmark, n=8).collect()
    }
    # doc 1 embeds the full benchmark text -> both benchmark 8-grams match
    # (the intro/outro-spanning grams don't exist in the benchmark)
    assert report[1] == 2
    # doc 2 repeats the first 8-gram; array_distinct keeps the count at 1
    assert report == {1: 2, 2: 1}

    kept = decontaminate(docs, benchmark, n=8)
    assert [r["doc_id"] for r in kept.collect()] == [3]
    # a clean corpus passes through whole
    clean_only = docs.filter("doc_id = 3")
    assert decontaminate(clean_only, benchmark, n=8).count() == 1

    # the xxhash64 production path (portable=False) reports identically —
    # only the join-key hash function differs
    fast = {
        r["doc_id"]: r["matched_ngrams"]
        for r in contamination_report(
            docs, benchmark, n=8, portable=False
        ).collect()
    }
    assert fast == report


def test_boilerplate_report_known_answer(spark):
    """Known-answer boilerplate profiling: a footer phrase shared by two
    docs is hot, unique text is not, repeated grams within one doc count
    once, docs shorter than n words get no row, and the shuffle-join path
    (broadcast_hot=False) reports identically."""
    from inbev_data_engineering_case_spark.operators.decontaminate import (
        boilerplate_report,
    )

    footer = "all rights reserved by example corp"  # 6 words -> two 5-grams
    docs = spark.createDataFrame(
        [
            (1, "unique alpha text one two three " + footer),
            (2, "different beta words four five six " + footer),
            (3, "entirely original content with no shared phrases at all"),
            (4, "too short"),  # < 5 words -> no gram, no row
        ],
        "doc_id long, text string",
    )
    rep = {
        r["doc_id"]: r for r in boilerplate_report(docs, n=5, min_docs=2).collect()
    }
    assert set(rep) == {1, 2, 3}
    # doc 1: 12 words -> 8 distinct 5-grams; hot ones are the 2 footer
    # grams (the bridging grams mix unique prefix words, so not shared)
    assert rep[1]["n_grams"] == 8 and rep[1]["n_hot"] == 2
    assert rep[1]["boiler_ppm"] == 2 * 1_000_000 // 8
    assert rep[3]["n_hot"] == 0 and rep[3]["boiler_ppm"] == 0

    shuffled = {
        r["doc_id"]: (r["n_grams"], r["n_hot"])
        for r in boilerplate_report(
            docs, n=5, min_docs=2, broadcast_hot=False
        ).collect()
    }
    assert shuffled == {
        k: (v["n_grams"], v["n_hot"]) for k, v in rep.items()
    }


def test_repetition_ratios_known_answers(spark):
    from inbev_data_engineering_case_spark.operators.textops import (
        line_repetition_ratio,
        token_repetition_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d"),              # all unique
            (2, "spam spam spam ham"),   # 2 repeated of 4
            (3, "x\ny\nx\ny\nz"),        # 2 repeated lines of 5
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_repetition_ratio("text").alias("tr"),
            line_repetition_ratio("text").alias("lr"),
        ).collect()
    }
    assert out[1]["tr"] == 0.0 and out[1]["lr"] == 0.0
    assert out[2]["tr"] == 0.5
    assert out[3]["lr"] == 0.4


def test_scrub_pii_redacts_emails_then_phones(spark):
    from inbev_data_engineering_case_spark.operators.textops import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org or call "
                "+1 (555) 010-2233 today"),
            (2, "no pii here, just the year 2024 and pi 3.14"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["scrubbed"] for r in df.select(
        "doc_id", scrub_pii("text").alias("scrubbed")
    ).collect()}
    assert out[1] == "mail me at <EMAIL> or call <PHONE> today"
    # short digit runs and decimals survive (phone pattern needs 8+ chars)
    assert out[2] == "no pii here, just the year 2024 and pi 3.14"


def test_stratified_sample_deterministic_and_balanced(spark):
    """Hash-based stratified sampling: membership is a pure function of
    (id, salt) — identical across reruns and repartitions; per-stratum
    keep-rates land near the configured fractions; unlisted strata use the
    default."""
    from inbev_data_engineering_case_spark.operators.sample import (
        stratified_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else ("es" if i % 4 == 1 else "xx"))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fractions = {"en": 0.5, "es": 0.2}

    kept = stratified_sample(df, "lang", fractions).collect()
    again = stratified_sample(df.repartition(7), "lang", fractions).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in again
    )  # stable under repartition (sampleBy with a seed is NOT)

    by_lang = {}
    for r in kept:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang.get("xx", 0) == 0  # default fraction 0
    assert abs(by_lang["en"] / 1000 - 0.5) < 0.08
    assert abs(by_lang["es"] / 500 - 0.2) < 0.08

    # independent draws under different salts
    other = stratified_sample(df, "lang", fractions, salt=3).collect()
    assert sorted(r["doc_id"] for r in other) != sorted(
        r["doc_id"] for r in kept
    )


def test_pq_encode_codes_in_range_and_deterministic(spark):
    """PQ plumbing: every (vector, subspace) gets exactly one code in
    [0, k); encoding is a pure function of the data (stable under
    repartition); a codebook SEED row encodes to its own codeword in
    every subspace (its sub-slices ARE codewords -> distance 0)."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        pq_encode,
        pq_sampled_codebook,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m, k = 4, 8
    book = pq_sampled_codebook(emb, m=m, k=k)
    brows = book.collect()
    assert len(brows) == m * k
    assert {r["subspace"] for r in brows} == set(range(m))

    codes = pq_encode(emb, book, m=m, k=k).collect()
    n = emb.count()
    assert len(codes) == n * m
    assert all(0 <= r["code"] < k for r in codes)

    again = pq_encode(emb.repartition(7), book, m=m, k=k).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, again))

    # seed rows quantize losslessly to their own codeword
    from inbev_data_engineering_case_spark.functions import portable_hash64
    seeds = (
        emb.withColumn("_h", portable_hash64(F.col("vec_id"), seed=0xC0DE))
        .orderBy("_h", "vec_id").limit(k).collect()
    )
    seed_code = {r["vec_id"]: i for i, r in enumerate(seeds)}
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
    for vid, code in seed_code.items():
        got = by_vec[vid]
        # every subspace of a seed row re-finds its own code (or an
        # identical earlier codeword — smaller-code tie-break)
        assert all(c <= code for c in got.values())
        assert any(c == code for c in got.values()) or any(
            seeds[c]["embedding"] == seeds[code]["embedding"]
            for c in got.values()
        )


def test_pq_adc_distance_is_exact_on_codebook_rows(spark):
    """For query AND neighbor both in the seed set, PQ reconstruction is
    lossless, so adc_micro must equal the true micro squared distance —
    verifies the encode/LUT/sum path numerically end to end."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m, k = 4, 8
    from inbev_data_engineering_case_spark.functions import portable_hash64
    seeds = (
        emb.withColumn("_h", portable_hash64(F.col("vec_id"), seed=0xC0DE))
        .orderBy("_h", "vec_id").limit(k)
    )
    seed_rows = seeds.collect()
    corpus = seeds.select("vec_id", "embedding")
    out = ann_pq_topk(
        corpus, corpus, k_neighbors=k, m=m, k=k
    ).collect()

    import math

    def micro_sq(a, b):
        w = len(a) // m
        total = 0
        for s in range(m):
            d2 = math.fsum(
                (float(a[i]) - float(b[i])) ** 2
                for i in range(s * w, (s + 1) * w)
            )
            total += round(d2 * 1_000_000)
        return total

    vecs = {r["vec_id"]: r["embedding"] for r in seed_rows}
    for r in out:
        expected = micro_sq(vecs[r["query_id"]], vecs[r["neighbor_id"]])
        # fsum vs sequential fold can differ in the last micro-unit
        assert abs(r["adc_micro"] - expected) <= m


def test_ivf_pq_probing_all_cells_equals_plain_pq(spark):
    """Construction identity: with n_probe == n_centroids every corpus
    vector is a candidate for every query, so IVF-PQ must return exactly
    the plain PQ/ADC top-k (same codes, same integer LUT sums, same
    ranks). Also: with fewer probes the result set is a subset of the
    candidate relation — distances of surviving pairs are identical."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_ivf_pq_topk,
        ann_pq_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 200)
    qs = emb.filter(F.col("vec_id") < 5)
    full = sorted(
        map(tuple, ann_pq_topk(emb, qs, k_neighbors=5, m=4, k=8).collect())
    )
    ivf_all = sorted(
        map(
            tuple,
            ann_ivf_pq_topk(
                emb, qs, k_neighbors=5, n_centroids=8, n_probe=8, m=4, k=8
            ).collect(),
        )
    )
    assert ivf_all == full

    probed = ann_ivf_pq_topk(
        emb, qs, k_neighbors=5, n_centroids=8, n_probe=2, m=4, k=8
    ).collect()
    full_d = {(r[0], r[1]): r[2] for r in full}
    all_pq = {
        (r["query_id"], r["neighbor_id"]): r["adc_micro"]
        for r in ann_pq_topk(emb, qs, k_neighbors=200, m=4, k=8).collect()
    }
    for r in probed:
        # every probed pair's ADC distance matches the full PQ distance
        assert all_pq[(r["query_id"], r["neighbor_id"])] == r["adc_micro"]


@pytest.mark.slow
def test_ann_index_roundtrip_identical_to_direct_path(spark, tmp_path):
    """ann_from_index over a build_ann_index output returns rows
    IDENTICAL to ann_ivf_pq_topk's direct compute on the same
    corpus/model — the materialized index changes where the work
    happens, never the answer (shared _ivf_pq_probe tail). The probe
    side takes m from the stored meta geometry; rebuilding publishes a
    new committed snapshot and retention prunes old generations."""
    import os

    from inbev_data_engineering_case_spark.operators.similarity import (
        ANN_INDEX_PREFIX,
        ann_from_index,
        ann_ivf_pq_topk,
        build_ann_index,
        resolve_ann_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 200)
    qs = emb.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "annindex")
    audit = build_ann_index(emb, idx, n_centroids=8, m=4, k=8)
    assert audit["cells_rows"] == 200  # one inverted-list row per vector
    assert audit["codes_rows"] == 200 * 4  # m codes per vector
    direct = sorted(
        map(
            tuple,
            ann_ivf_pq_topk(
                emb, qs, k_neighbors=5, n_centroids=8, n_probe=2, m=4, k=8
            ).collect(),
        )
    )
    indexed = sorted(
        map(
            tuple,
            ann_from_index(spark, idx, qs, k_neighbors=5, n_probe=2).collect(),
        )
    )
    assert indexed == direct and len(indexed) == 25
    snap1 = resolve_ann_index(idx)
    build_ann_index(emb, idx, n_centroids=8, m=4, k=8)
    build_ann_index(emb, idx, n_centroids=8, m=4, k=8)
    assert resolve_ann_index(idx) != snap1
    snaps = [
        d for d in os.listdir(idx) if d.startswith(ANN_INDEX_PREFIX)
    ]
    assert len(snaps) == 2  # retention (default 2) pruned the first


@pytest.mark.slow
def test_ann_index_delta_update_two_day_loop(spark, tmp_path):
    """The daily vector-ingest loop: day 2's NEW vectors assign cells
    and PQ-encode against the STORED model (centroids/codebook frozen
    between rebuilds — the IVF append discipline), day 1's cells/codes
    part files ride into the new snapshot as HARD LINKS (inode
    identity: zero bytes rewritten), and probing the updated index is
    identical to the direct IVF-PQ compute over day1+day2 with the
    same model. A changed+deleted delta routes to the merge path with
    the same parity."""
    import os

    from inbev_data_engineering_case_spark.operators.similarity import (
        ann_from_index,
        ann_ivf_pq_topk,
        build_ann_index,
        pq_sampled_codebook,
        resolve_ann_index,
        update_ann_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    day1 = emb.filter(F.col("vec_id") < 150)
    day2 = emb.filter(
        (F.col("vec_id") >= 150) & (F.col("vec_id") < 200)
    )
    qs = emb.filter(F.col("vec_id") < 5)
    # the frozen model: day-1 deterministic centroids + day-1 codebook
    cents = day1.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    book = pq_sampled_codebook(day1, m=4, k=8)
    idx = str(tmp_path / "annindex")
    build_ann_index(
        day1, idx, n_centroids=8, m=4, k=8, centroids=cents, codebook=book
    )
    snap1 = resolve_ann_index(idx)
    inodes1 = {
        f: os.stat(os.path.join(snap1, "codes", f)).st_ino
        for f in os.listdir(os.path.join(snap1, "codes"))
        if not f.startswith(("_", "."))
    }
    audit = update_ann_index(spark, idx, day2)
    assert audit["mode"] == "append"
    assert audit["cells_rows"] == 200 and audit["codes_rows"] == 800
    snap2 = resolve_ann_index(idx)
    inodes2 = {
        f: os.stat(os.path.join(snap2, "codes", f)).st_ino
        for f in os.listdir(os.path.join(snap2, "codes"))
        if not f.startswith(("_", "."))
    }
    for f, ino in inodes1.items():
        assert inodes2[f] == ino  # day-1 files hard-linked, not copied
    key = lambda r: tuple(r)  # noqa: E731
    indexed = sorted(
        map(
            tuple,
            ann_from_index(spark, idx, qs, k_neighbors=5, n_probe=2).collect(),
        )
    )
    direct = sorted(
        map(
            key,
            ann_ivf_pq_topk(
                day1.unionByName(day2),
                qs,
                k_neighbors=5,
                n_probe=2,
                m=4,
                k=8,
                centroids=cents,
                codebook=book,
            ).collect(),
        )
    )
    assert indexed == direct and len(indexed) == 25

    # merge path: re-embed one vector, delete another; parity against
    # direct compute over the final corpus with the same frozen model
    changed = day1.filter(F.col("vec_id") == 120).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x * F.lit(-1.0)).cast("float")
        ).alias("embedding"),
    )
    deleted = spark.createDataFrame([(121,)], "vec_id long")
    audit2 = update_ann_index(spark, idx, changed, deleted_ids=deleted)
    assert audit2["mode"] == "merge"
    assert audit2["cells_rows"] == 199  # 121 gone, 120 replaced
    final = (
        day1.filter(~F.col("vec_id").isin(120, 121))
        .unionByName(day2)
        .unionByName(changed)
    )
    indexed2 = sorted(
        map(
            key,
            ann_from_index(spark, idx, qs, k_neighbors=5, n_probe=2).collect(),
        )
    )
    direct2 = sorted(
        map(
            key,
            ann_ivf_pq_topk(
                final, qs, k_neighbors=5, n_probe=2, m=4, k=8,
                centroids=cents, codebook=book,
            ).collect(),
        )
    )
    assert indexed2 == direct2


@pytest.mark.slow
def test_ann_index_update_equals_rebuild_property(spark):
    """Hypothesis property (the text-index twin): for ANY day-1 vector
    set and ANY delta mix (new + changed + deleted ids), update_ann_index
    against the FROZEN day-1 model produces cells/codes contents
    identical to a full rebuild of the final corpus with the same
    model — whichever physical path (append/merge) the delta routes
    to."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from inbev_data_engineering_case_spark.operators.similarity import (
        build_ann_index,
        pq_sampled_codebook,
        resolve_ann_index,
        update_ann_index,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 60)
        .localCheckpoint(eager=True)
    )
    base = emb.filter(F.col("vec_id") < 40)
    cents = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    book = pq_sampled_codebook(base, m=4, k=8)

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n_new=st.integers(0, 10),
        changed_ids=st.lists(
            st.integers(10, 39), unique=True, max_size=4
        ),
        deleted_ids=st.lists(
            st.integers(10, 39), unique=True, max_size=4
        ),
    )
    def prop(n_new, changed_ids, deleted_ids):
        deleted_ids = [i for i in deleted_ids if i not in changed_ids]
        new = emb.filter(
            (F.col("vec_id") >= 40) & (F.col("vec_id") < 40 + n_new)
        )
        changed = emb.filter(F.col("vec_id").isin(changed_ids)).select(
            "vec_id",
            F.transform(
                "embedding", lambda x: (x * F.lit(-1.0)).cast("float")
            ).alias("embedding"),
        ) if changed_ids else new.limit(0)
        delta = changed.unionByName(new)
        deleted = (
            spark.createDataFrame(
                [(i,) for i in deleted_ids], "vec_id long"
            )
            if deleted_ids
            else None
        )
        root = tempfile.mkdtemp(prefix="annprop_")
        try:
            idx = f"{root}/idx"
            build_ann_index(
                base, idx, n_centroids=4, m=4, k=8,
                centroids=cents, codebook=book,
            )
            update_ann_index(spark, idx, delta, deleted_ids=deleted)
            final = (
                base.join(delta.select("vec_id"), "vec_id", "left_anti")
                .unionByName(delta)
            )
            if deleted is not None:
                final = final.join(deleted, "vec_id", "left_anti")
            rb = f"{root}/rebuild"
            build_ann_index(
                final, rb, n_centroids=4, m=4, k=8,
                centroids=cents, codebook=book,
            )
            s_upd, s_rb = resolve_ann_index(idx), resolve_ann_index(rb)
            for table in ("cells", "codes"):
                got = sorted(
                    map(tuple, spark.read.parquet(f"{s_upd}/{table}").collect())
                )
                want = sorted(
                    map(tuple, spark.read.parquet(f"{s_rb}/{table}").collect())
                )
                assert got == want, (table, len(got), len(want))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    prop()


def test_train_pq_codebooks_deterministic_and_usable(spark):
    from inbev_data_engineering_case_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 100)
    m, k = 2, 4
    book = train_pq_codebooks(emb, m=m, k=k, n_iter=1)
    rows = sorted(map(tuple, book.collect()))
    again = sorted(map(tuple, train_pq_codebooks(emb, m=m, k=k, n_iter=1).collect()))
    assert rows == again  # rounded means -> bit-identical retrain
    assert {r[0] for r in rows} == set(range(m))

    codes = pq_encode(emb, book, m=m, k=k)
    assert codes.count() == emb.count() * m


def test_mixture_sample_hits_target_composition(spark):
    """Data-mixing resampling: the achieved output composition tracks the
    target weights, the scarcest stratum binds (its rate is ~1), rates are
    pure int64 (deterministic under repartition), and unweighted strata
    are excluded."""
    from inbev_data_engineering_case_spark.operators.sample import (
        mixture_rates,
        mixture_sample,
    )

    # a: 3000 rows, b: 1000 rows (scarce), c: 2000 rows, d: unweighted
    rows = [(i, ["a", "a", "a", "b", "c", "c", "d"][i % 7]) for i in range(7000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    target = {"a": 400_000, "b": 300_000, "c": 300_000}

    rates = {r["src"]: r for r in mixture_rates(df, "src", target).collect()}
    assert set(rates) == {"a", "b", "c"}  # d has no target -> no rate row
    # b is scarcest relative to its weight -> binding stratum, rate ~1
    # (floor arithmetic in budget and keep_n shaves <=2 ppm-grains)
    assert rates["b"]["rate_ppm"] >= 998_000
    assert rates["a"]["rate_ppm"] < 1_000_000

    kept = mixture_sample(df, "src", target, id_col="doc_id").collect()
    by = {}
    for r in kept:
        by[r["src"]] = by.get(r["src"], 0) + 1
    assert "d" not in by
    total = sum(by.values())
    # achieved composition within a few percent of target (hash noise)
    assert abs(by["a"] / total - 0.4) < 0.05
    assert abs(by["b"] / total - 0.3) < 0.05
    assert abs(by["c"] / total - 0.3) < 0.05

    again = mixture_sample(df.repartition(5), "src", target).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in kept
    )


def test_random_projection_preserves_norms_in_expectation(spark):
    """JL property: with the 1/sqrt(d_out)-scaled Rademacher matrix,
    E[||proj||^2] = ||x||^2 — the mean squared-norm ratio over the fixture
    embeddings must sit near 1; and the matrix is deterministic, so the
    projection is identical on rerun."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, v: a + v
    )
    joined = (
        random_projection(emb, d_in=64, d_out=8)
        .join(emb, "vec_id")
        .select(
            (sq(F.col("proj")) / sq(F.col("embedding").cast("array<double>"))
             ).alias("ratio")
        )
    )
    mean_ratio = joined.agg(F.avg("ratio")).first()[0]
    assert 0.8 < mean_ratio < 1.2, mean_ratio

    a = random_projection(emb, d_in=64, d_out=8).orderBy("vec_id").collect()
    b = random_projection(emb, d_in=64, d_out=8).orderBy("vec_id").collect()
    assert a == b


def test_bpe_train_and_tokenize_classic_example(spark):
    """The textbook BPE corpus: frequency-ordered merges, lexicographic
    tie-break, and a frequent word collapsing to a single token."""
    from inbev_data_engineering_case_spark.operators.bpe import (
        bpe_tokenize,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest newest widest widest"),
        ],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=6)
    # 'es' appears 8x (6 newest + 2 widest) -> first; then est, est</w>;
    # 'lo' 7x; 'low' 7x; then 'e','w' (ties broken lexicographically)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]

    toks = {
        r["doc_id"]: r
        for r in bpe_tokenize(docs, merges).collect()
    }
    assert toks[1]["bpe_tokens"] == ["low", "</w>"] * 5
    assert toks[3]["bpe_tokens"][:3] == ["n", "ew", "est</w>"]
    assert toks[3]["n_bpe_tokens"] == 4 * 3 + 2 * 4  # newest x4, widest x2

    # early stop: merges below min_pair_count are not learned
    tiny = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    assert train_bpe(tiny, n_merges=5, min_pair_count=2) == []


def test_top_fraction_by_score_adaptive_threshold(spark):
    """The keep-set adapts to the data: the threshold is the corpus's own
    quantile, so shifting every score shifts the cut, not the kept ids."""
    from inbev_data_engineering_case_spark.operators.sample import (
        top_fraction_by_score,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, score double"
    )
    kept = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(df, "score", 0.25).collect()
    )
    # 0.75-quantile of 0..99 is 74.25 -> keep 75..99
    assert kept == list(range(75, 100))

    shifted = df.selectExpr("doc_id", "score + 1000 AS score")
    kept2 = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(shifted, "score", 0.25).collect()
    )
    assert kept2 == kept  # same ids survive a uniform shift

    # the sketch path keeps roughly the same fraction (exactness not
    # contractual at scale)
    approx = top_fraction_by_score(df, "score", 0.25, approx=True).count()
    assert 20 <= approx <= 30


def test_deterministic_shuffle_is_stable_permutation(spark):
    """Epoch shuffle: a total order that is a pure function of (ids, salt)
    — same permutation on rerun, different permutation per salt, every row
    exactly once."""
    from inbev_data_engineering_case_spark.operators.sample import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    e0 = [r["doc_id"] for r in deterministic_shuffle(df, salt=0).collect()]
    e0_again = [
        r["doc_id"]
        for r in deterministic_shuffle(df.repartition(5), salt=0).collect()
    ]
    e1 = [r["doc_id"] for r in deterministic_shuffle(df, salt=1).collect()]
    assert e0 == e0_again
    assert e0 != e1 and e0 != sorted(e0)
    assert sorted(e0) == sorted(e1) == list(range(500))


def test_hash_split_deterministic_and_complete(spark):
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import hash_split

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row assigned, no nulls
    assert 0.75 < counts["train"] / 2000 < 0.85  # hash is roughly uniform
    assert counts["val"] > 0 and counts["test"] > 0

    # deterministic: identical assignment on re-run; different under a salt
    again = {r["doc_id"]: r["split"] for r in hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r["doc_id"]: r["split"] for r in split.collect()}
    assert first == again
    other = {r["doc_id"]: r["split"] for r in hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2").collect()}
    assert first != other


def test_pack_sequences_bin_assignment(spark):
    """Within each packer stream: bins fill in doc-id order, bin_id is
    exactly floor(tokens-before / ctx_len), and every doc lands in one
    bin."""
    from inbev_data_engineering_case_spark.operators.curate import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "w " * (5 + i % 7)) for i in range(300)], ["doc_id", "text"]
    )
    packed = pack_sequences(docs, ctx_len=16, n_packers=4)
    rows = sorted(
        ((r["packer"], r["doc_id"], r["bin_id"], r["n_tokens"])
         for r in packed.collect()),
    )
    assert len(rows) == 300
    by_packer: dict = {}
    for packer, doc_id, bin_id, n_tokens in rows:
        cum_before = by_packer.get(packer, 0)
        assert bin_id == cum_before // 16, (packer, doc_id)
        by_packer[packer] = cum_before + n_tokens
    assert len(by_packer) == 4  # all packer streams populated


def test_incremental_minhash_matches_batch_semantics(spark):
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        incremental_minhash_pairs,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    other = (
        "a completely different english text about the history of bridges "
        "and the people that built them in the old days of iron and stone"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(10, base + " late arrival"), (11, other), (12, "unrelated words "
          "nothing shared here with anyone at all in any way")],
        ["doc_id", "text"],
    )

    stored = minhash_signatures(corpus)
    inc = incremental_minhash_pairs(new, stored)
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    # new-vs-stored hits + no stored-vs-stored pairs, no self pairs
    assert (1, 10) in got and (2, 11) in got
    assert all(b >= 10 for _, b in got)

    # parity: the same pairs a full-batch rerun over corpus+new would find,
    # restricted to pairs involving a new doc
    full = minhash_dedup_pairs(corpus.unionByName(new))
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_b"] >= 10 or r["id_a"] >= 10
    }
    assert got == want


def test_incremental_minhash_recrawl_overlap(spark):
    """A doc present in BOTH the stored signatures and the new batch must
    not emit an (x, x) self-pair, and pairs whose stored id exceeds the new
    id must come out least/greatest-canonical."""
    from inbev_data_engineering_case_spark.operators.curate import (
        incremental_minhash_pairs,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    # stored corpus has a HIGH id (20) so the stored-vs-new pair comes back
    # (5, 20) only if the canonicalization reorders it
    corpus = spark.createDataFrame([(20, base)], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(20, base), (5, base + " late arrival")], ["doc_id", "text"]
    )

    inc = incremental_minhash_pairs(new, minhash_signatures(corpus))
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    assert all(a < b for a, b in got), f"non-canonical pair in {got}"
    assert (20, 20) not in got, "re-crawled doc paired with itself"
    # the near-dup is found exactly once despite appearing in both branches
    rows = inc.filter("id_a = 5 AND id_b = 20").collect()
    assert len(rows) == 1 and rows[0]["est_jaccard"] >= 0.5


def test_hot_bucket_guard_bounds_pair_counts(spark):
    """Degenerate template-heavy corpus: every doc shares one long
    boilerplate prefix + a unique tail, so (uncapped) every band bucket
    holds the whole corpus and the self-join goes quadratic. With the cap,
    hot buckets star-link to the min-id representative: pair count drops
    from O(n^2) to O(n), and component connectivity is preserved (all
    members still collapse into one duplicate group)."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components,
    )

    n = 200
    boiler = " ".join(f"w{i}" for i in range(40))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(boiler + " tail"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    uncapped = minhash_dedup_pairs(docs, max_bucket_size=None).count()
    capped_df = minhash_dedup_pairs(docs, max_bucket_size=50)
    capped = capped_df.count()
    assert uncapped >= n * (n - 1) // 2  # quadratic blow-up is real
    assert capped <= 2 * n  # star pairs: linear in bucket size
    # connectivity preserved: everything still collapses into one group
    comps = dedup_components(capped_df)
    assert comps.select("comp").distinct().count() == 1
    assert comps.count() == n


def test_hot_bucket_guard_is_identity_below_cap(spark, docs):
    """On a corpus whose buckets all sit below the cap, the guarded and
    unguarded pipelines are row-identical — the guard only changes hot
    buckets (this also covers the driver fixtures, where the default cap
    never engages and oracle parity is exact)."""
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(minhash_dedup_pairs(docs, max_bucket_size=None)) == rows(
        minhash_dedup_pairs(docs, max_bucket_size=10_000)
    )
    assert rows(
        simhash_near_pairs(docs, max_hamming=6, bucket_bits=1,
                           max_bucket_size=None)
    ) == rows(
        simhash_near_pairs(docs, max_hamming=6, bucket_bits=1,
                           max_bucket_size=10_000)
    )


def test_hot_bucket_guard_simhash_star_links(spark):
    """Identical texts share one SimHash bucket AND signature; with a cap
    below the group size the bucket emits exactly n-1 star pairs at
    hamming 0."""
    n = 64
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("same exact template text body for every single doc").alias(
            "text"
        ),
    )
    pairs = simhash_near_pairs(
        docs, max_hamming=3, bucket_bits=4, max_bucket_size=10
    ).collect()
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in pairs)


def test_decode_errors_dead_letter_not_raise(spark):
    """A codec-bound (JPEG) or corrupt asset must survive as a flagged row
    — null features, decode_ok=false, message in `error` — instead of
    killing the job; strict=True restores the raise. The expected error
    class depends on the capability probes: with no PIL/ffmpeg the
    decoders refuse with NotImplementedError; with a backend present
    these deliberately-corrupt payloads fail inside it instead — either
    way the row is dead-lettered, never raised."""
    import pytest as _pytest
    from pyspark.errors import PythonException

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _optional_ffmpeg,
        decode_features,
        resize_assets,
        sample_frames,
    )

    # the corrupt JPEG now always fails INSIDE a decoder (native baseline
    # or PIL), so a ValueError/OSError — matched by "Error" — either way
    img_err = "Error"
    vid_err = (
        "NotImplementedError" if _optional_ffmpeg() is None else "Error"
    )

    bmp = _make_bmp([[(5, 5, 5), (10, 10, 10)]])
    jpeg = b"\xff\xd8\xff\xe0 not decodable"
    assets = spark.createDataFrame(
        [
            (1, "image/bmp", bmp, {"n_bytes": len(bmp), "source": "t"}),
            (2, "image/jpeg", jpeg, {"n_bytes": len(jpeg), "source": "t"}),
            (3, "video/mp4", b"\x00\x00\x00 ftyp", {"n_bytes": 8, "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )

    feats = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    assert feats[1]["decode_ok"] and feats[1]["error"] is None
    assert feats[1]["feature"] == [2.0, 1.0, 24.0, 7.5]
    for bad, expect in ((2, img_err), (3, vid_err)):
        assert not feats[bad]["decode_ok"]
        assert feats[bad]["checksum"] is None
        assert feats[bad]["feature"] is None
        assert expect in feats[bad]["error"]

    resized = {
        r["asset_id"]: r
        for r in resize_assets(assets, 2000, real_decoder=True).collect()
    }
    assert resized[1]["decode_ok"]
    assert not resized[2]["decode_ok"]
    assert bytes(resized[2]["payload"]) == jpeg  # original kept for retry

    frames = sample_frames(assets, real_decoder=True).collect()
    bad_rows = [r for r in frames if not r["decode_ok"]]
    assert {r["asset_id"] for r in bad_rows} == {3}  # only video demuxes
    assert bad_rows[0]["frame_idx"] == -1 and bad_rows[0]["frame"] is None

    with _pytest.raises(PythonException, match="Error"):
        decode_features(assets, real_decoder=True, strict=True).collect()


def test_decode_reason_codes_size_the_decoder_gap(spark):
    """Reason-coded dead-letters: an ARITHMETIC-CODED JPEG (real
    baseline stream re-marked SOF0->SOF9 — structurally valid header;
    the decoder refuses at the SOF before entropy decode) lands as
    reason='decoder_gap', a corrupt stream as reason='corrupt', a good
    asset as reason NULL — so a corpus QA report can size the decoder
    gap separately from junk data. A PROGRESSIVE (SOF2) stream, the
    gap this report sized in r8, now DECODES natively (r9) — its row
    is reason NULL. decode_reason_report turns the rest into per-kind
    exact-ppm corpus shares, arithmetic JPEG on its own line."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_encode_baseline,
        _jpeg_encode_progressive,
        decode_features,
        decode_reason_report,
    )

    baseline = _jpeg_encode_baseline(_jpeg_gradient(16, 16), quality=90)
    assert b"\xff\xc0" in baseline
    arithmetic = baseline.replace(b"\xff\xc0", b"\xff\xc9", 1)
    progressive = _jpeg_encode_progressive(
        _jpeg_gradient(16, 16), quality=90
    )
    corrupt = b"\xff\xd8\xff\xe0 not decodable"
    bmp = _make_bmp([[(5, 5, 5), (10, 10, 10)]])
    assets = spark.createDataFrame(
        [
            (1, "image/jpeg", arithmetic, {"n_bytes": len(arithmetic), "source": "t"}),
            (2, "image/jpeg", corrupt, {"n_bytes": len(corrupt), "source": "t"}),
            (3, "image/bmp", bmp, {"n_bytes": len(bmp), "source": "t"}),
            (4, "image/jpeg", baseline, {"n_bytes": len(baseline), "source": "t"}),
            (5, "image/jpeg", progressive, {"n_bytes": len(progressive), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    feats = decode_features(assets, real_decoder=True)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert rows[1]["reason"] == "decoder_gap"
    assert "arithmetic" in rows[1]["error"]
    assert rows[2]["reason"] == "corrupt"
    assert rows[3]["reason"] is None and rows[3]["decode_ok"]
    assert rows[4]["reason"] is None and rows[4]["decode_ok"]
    assert rows[5]["reason"] is None and rows[5]["decode_ok"]

    report = decode_reason_report(feats).collect()
    by_key = {(r["media_type"], r["reason"]): r for r in report}
    gap = by_key[("image/jpeg", "decoder_gap")]
    assert gap["n_assets"] == 1 and gap["share_ppm"] == 200_000
    assert "arithmetic" in gap["detail"]
    assert by_key[("image/jpeg", "corrupt")]["share_ppm"] == 200_000
    assert by_key[("image/bmp", "ok")]["n_assets"] == 1
    assert by_key[("image/jpeg", "ok")]["n_assets"] == 2
    assert by_key[("image/jpeg", "ok")]["detail"] is None
    assert sum(r["n_assets"] for r in report) == 5


def test_jpeg_featurize_through_pil_when_available(spark):
    """Capability-routed codec decode: with PIL importable a real JPEG
    featurizes (and resizes) through the same mapInPandas plumbing, same
    normalized-raster feature shape as the stdlib decoders. Skips where
    PIL is absent — there the dead-letter test above covers the fallback
    arm of the same probe."""
    import io

    image_mod = pytest.importorskip(
        "PIL.Image", reason="PIL not installed; stdlib fallback covered "
        "by test_decode_errors_dead_letter_not_raise"
    )

    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
        resize_assets,
    )

    im = image_mod.new("RGB", (6, 4), (10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, "JPEG")
    jpeg = buf.getvalue()
    assets = spark.createDataFrame(
        [(1, "image/jpeg", jpeg, {"n_bytes": len(jpeg), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )

    r = decode_features(assets, real_decoder=True).collect()[0]
    assert r["decode_ok"] and r["error"] is None
    w, h, bpp, mean_px = r["feature"]
    assert (w, h, bpp) == (6.0, 4.0, 24.0)
    assert 0.0 < mean_px < 255.0

    rz = resize_assets(assets, 2000, real_decoder=True).collect()[0]
    assert rz["decode_ok"]  # decoded via PIL, re-encoded to PNM


def _jpeg_gradient(h, w):
    """Smooth RGB gradient — JPEG-friendly content with a known mean."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_native_roundtrip_444():
    """Native encoder → native decoder at 4:4:4: non-multiple-of-8
    dimensions, high quality — every pixel within a few quantization
    levels, dimensions exact."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
    )

    img = _jpeg_gradient(41, 53)
    out = _jpeg_decode(_jpeg_encode_baseline(img, quality=95))
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 6 and diff.mean() < 1.5


def test_jpeg_native_roundtrip_420_restarts_identical():
    """4:2:0 chroma subsampling decodes (upsample path), and restart
    intervals are pure framing: the decoded raster with DRI 1/3/7 is
    bit-identical to the no-restart stream of the same coefficients."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
    )

    img = _jpeg_gradient(37, 61)
    base = _jpeg_decode(_jpeg_encode_baseline(img, quality=90))
    for ri in (1, 3, 7):
        out = _jpeg_decode(
            _jpeg_encode_baseline(img, quality=90, restart_interval=ri)
        )
        assert np.array_equal(out, base)
    sub = _jpeg_decode(
        _jpeg_encode_baseline(
            img, quality=90, subsample=True, restart_interval=2
        )
    )
    assert sub.shape == img.shape
    assert np.abs(sub.astype(int) - img.astype(int)).max() <= 30


def test_jpeg_native_grayscale_single_component_scan():
    """1-component JPEG exercises the A.2.2 single-component MCU rule
    (plain 8x8 grid) and stays 1-channel like every other gray decode."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
    )

    gray = _jpeg_gradient(21, 34)[:, :, 0]
    out = _jpeg_decode(_jpeg_encode_baseline(gray, quality=95))
    assert out.shape == (21, 34, 1)
    assert np.abs(out[:, :, 0].astype(int) - gray.astype(int)).max() <= 4


def test_jpeg_native_unsupported_variants_fail_loud():
    """Arithmetic-coded (SOF9) raises NotImplementedError (the PIL-or-
    dead-letter arm); truncated entropy data and corrupt headers raise
    ValueError — never garbage pixels with decode_ok semantics. A
    baseline stream re-marked SOF2 is NOT a valid progressive stream
    (its sequential Ss=0/Se=63 scan mixes DC and AC), so it must fail
    loud as corrupt rather than decode garbage."""
    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
    )

    payload = bytearray(_jpeg_encode_baseline(_jpeg_gradient(16, 16)))
    sof_at = payload.index(b"\xff\xc0")
    arithmetic = bytes(
        payload[:sof_at] + b"\xff\xc9" + payload[sof_at + 2 :]
    )
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        _jpeg_decode(arithmetic)
    fake_progressive = bytes(
        payload[:sof_at] + b"\xff\xc2" + payload[sof_at + 2 :]
    )
    with _pytest.raises(ValueError, match="mixes DC and AC"):
        _jpeg_decode(fake_progressive)
    with _pytest.raises(ValueError, match="truncated"):
        _jpeg_decode(bytes(payload[: len(payload) // 2]))
    with _pytest.raises(ValueError, match="SOI"):
        _jpeg_decode(b"\x89PNG not a jpeg")


def test_jpeg_progressive_round_trip_matches_baseline():
    """Progressive (SOF2) decodes natively: a progressive and a
    baseline encode of the same raster at the same quality carry
    IDENTICAL quantized coefficients, so the two decodes must be
    BIT-IDENTICAL — across grayscale/color, 4:2:0 subsampling,
    non-multiple-of-8 dims, per-scan restart intervals, and a custom
    scan script with multiple successive-approximation levels."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
        _jpeg_encode_progressive,
    )

    rng = np.random.RandomState(11)
    cases = [
        ((16, 16, 3), {}),
        ((20, 24, 3), {"subsample": True}),
        ((17, 9, 1), {}),
        ((16, 16, 3), {"restart_interval": 2}),
        ((24, 16, 3), {"subsample": True, "restart_interval": 1}),
    ]
    for shape, kw in cases:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        base = _jpeg_decode(_jpeg_encode_baseline(img, quality=80, **kw))
        prog = _jpeg_decode(
            _jpeg_encode_progressive(img, quality=80, **kw)
        )
        assert np.array_equal(base, prog), (shape, kw)

    # deeper successive approximation (3 levels on luma AC) + a DC
    # refinement chain, still bit-identical to the one-shot baseline
    img = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    scans = [
        ([0, 1, 2], 0, 0, 0, 2),
        ([0, 1, 2], 0, 0, 1, 1),
        ([0], 1, 63, 0, 3),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0], 1, 63, 3, 2),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 63, 2, 1),
        ([0], 1, 63, 1, 0),
    ]
    base = _jpeg_decode(_jpeg_encode_baseline(img, quality=70))
    prog = _jpeg_decode(
        _jpeg_encode_progressive(img, quality=70, scans=scans)
    )
    assert np.array_equal(base, prog)


def test_jpeg_sequential_non_interleaved_scans_decode():
    """A fully NON-INTERLEAVED sequential JPEG (one scan per component
    — a real libjpeg output mode) decodes natively and matches the
    interleaved encode of the same raster bit for bit (identical
    quantized coefficients, only the scan layout differs); a partially
    interleaved scan subset stays honestly NIE-routed. Also pins the
    per-scan restart-interval reset on the non-interleaved walk."""
    import struct

    import numpy as np
    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators import (
        multimodal as M,
    )

    def encode_non_interleaved(img, quality, subsample, restart=0):
        h, w, gray, samplings, quants, coeffs, _ = (
            M._jpeg_prepare_encode(img, quality, subsample)
        )
        ncomp = 1 if gray else 3
        dc_maps, ac_maps = M._jpeg_std_maps(ncomp)
        out = M._jpeg_header_segments(
            h, w, gray, samplings, quants, 0xC0, restart
        )
        frame = (h, w, [[ci + 1, *samplings[ci], 0] for ci in range(ncomp)])
        for ci in range(ncomp):
            bh, bw = M._jpeg_comp_blocks(frame, *samplings[ci])
            sos = bytes(
                [1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0]
            )
            out += struct.pack(">BBH", 0xFF, 0xDA, 2 + len(sos)) + sos
            wtr = M._JpegBitWriter()
            pred = 0
            done = 0
            rst = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and done == restart:
                        wtr.flush()
                        wtr.buf += bytes([0xFF, 0xD0 + (rst % 8)])
                        rst += 1
                        pred = 0
                        done = 0
                    pred = M._jpeg_encode_block(
                        wtr, coeffs[ci][by, bx], pred,
                        dc_maps[ci], ac_maps[ci],
                    )
                    done += 1
            wtr.flush()
            out += wtr.buf
        out += b"\xff\xd9"
        return bytes(out)

    rng = np.random.RandomState(17)
    for shape, subsample, restart in (
        ((16, 16, 3), False, 0),
        ((20, 12, 3), True, 0),
        ((16, 16, 3), False, 2),
    ):
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        want = M._jpeg_decode(
            M._jpeg_encode_baseline(img, quality=85, subsample=subsample)
        )
        got = M._jpeg_decode(
            encode_non_interleaved(img, 85, subsample, restart)
        )
        assert np.array_equal(got, want), (shape, subsample, restart)

    # a stream TRUNCATED between component scans must fail loud — the
    # zeroed Cb/Cr planes would otherwise decode to a color-shifted
    # raster with decode_ok=true (the r9 second-review catch)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    full = encode_non_interleaved(img, 85, False)
    sos_offsets = []
    at = -1
    while True:
        at = full.find(b"\xff\xda", at + 1)
        if at < 0:
            break
        sos_offsets.append(at)
    assert len(sos_offsets) == 3
    truncated = full[: sos_offsets[2]] + b"\xff\xd9"
    with _pytest.raises(ValueError, match="missing scan"):
        M._jpeg_decode(truncated)

    # a 2-of-3-component scan stays honestly capability-gated
    img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    payload = bytearray(M._jpeg_encode_baseline(img, quality=85))
    at = payload.index(b"\xff\xda")
    # rewrite the SOS header to claim 2 components (structurally valid
    # header; the decoder must refuse before entropy decode)
    seglen = (payload[at + 2] << 8) | payload[at + 3]
    sos = bytes([2]) + bytes(payload[at + 5 : at + 9]) + bytes(
        payload[at + 2 + seglen - 3 : at + 2 + seglen]
    )
    two_comp = (
        bytes(payload[:at])
        + struct.pack(">BBH", 0xFF, 0xDA, 2 + len(sos))
        + sos
        + bytes(payload[at + 2 + seglen :])
    )
    with _pytest.raises(NotImplementedError, match="partially"):
        M._jpeg_decode(two_comp)


def test_jpeg_codec_round_trip_property():
    """Hypothesis fuzz over the whole codec surface: ANY dims (down to
    1x1 and single-row/column rasters), quality, grayscale/color,
    4:2:0, and restart intervals — the progressive decode must equal
    the baseline decode of the same raster bit for bit (identical
    quantized coefficients by construction), and both decoders must
    return the exact input shape."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
        _jpeg_encode_progressive,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        gray=st.booleans(),
        quality=st.integers(30, 95),
        subsample=st.booleans(),
        restart=st.sampled_from([0, 1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(h, w, gray, quality, subsample, restart, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(
            0, 256, (h, w, 1 if gray else 3), dtype=np.uint8
        )
        base = _jpeg_decode(
            _jpeg_encode_baseline(
                img, quality, subsample=subsample,
                restart_interval=restart,
            )
        )
        prog = _jpeg_decode(
            _jpeg_encode_progressive(
                img, quality, subsample=subsample,
                restart_interval=restart,
            )
        )
        assert base.shape == img.shape
        assert np.array_equal(base, prog)

    prop()


def test_jpeg_grayscale_declared_sampling_factors_ignored():
    """A one-component frame's declared sampling factors are IGNORED
    (T.81 A.2.2 — `jpegtran -grayscale` output famously keeps the luma
    factors at 2x2): both the sequential and the progressive decoder
    must produce the identical raster when the SOF sampling byte says
    2x2. The r9 review caught the progressive path walking only
    ceil(h/16) blocks here — 191/256 pixels silently flat-gray with
    decode_ok=true — because one of three geometry-math copies skipped
    the remap; geometry now flows through _jpeg_frame_geometry."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
        _jpeg_encode_progressive,
    )

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (16, 16, 1), dtype=np.uint8)
    for encode, sof_marker in (
        (_jpeg_encode_baseline, b"\xff\xc0"),
        (_jpeg_encode_progressive, b"\xff\xc2"),
    ):
        payload = bytearray(encode(img, quality=85))
        at = payload.index(sof_marker)
        # FF Cx | len(2) | prec(1) h(2) w(2) ncomp(1) | cid(1) hv(1) ...
        assert payload[at + 11] == 0x11
        want = _jpeg_decode(bytes(payload))
        payload[at + 11] = 0x22  # declare 2x2 sampling on the only comp
        got = _jpeg_decode(bytes(payload))
        assert np.array_equal(got, want), sof_marker


def test_jpeg_progressive_hand_built_eob_runs_and_refinement():
    """Pin the Annex-G entropy semantics with a HAND-BUILT stream,
    independent of this repo's progressive encoder (the encoder emits
    only EOB1, so multi-block EOB runs are only pinned here): a 3-block
    grayscale SOF2 stream whose AC-first scan carries an EOB2-with-
    extension run (eobrun=3 spans block 0's tail plus blocks 1-2) and
    whose refinement scan orders bits exactly as G.2.3 requires —
    huffman symbol, sign bit, then the buffered correction bits of the
    nonzero-history coefficients crossed on the way."""
    import struct

    import numpy as np

    from inbev_data_engineering_case_spark.operators import (
        multimodal as M,
    )

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, 2 + len(body)) + body

    def dht(tc, th, lengths):  # {symbol: code_len} -> DHT body, 1-bit codes
        counts = [0] * 16
        for _sym, ln in lengths.items():
            counts[ln - 1] += 1
        # canonical order: by length then insertion — all length-1 here
        vals = [s for s, ln in lengths.items()]
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(vals)
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # identity quant
    out += seg(
        0xC2, struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0])
    )

    # scan 1: DC first (Al=0), diffs 4, 4, -12 -> sizes {3, 4}
    out += dht(0, 0, {3: 1, 4: 1})
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    w = M._JpegBitWriter()
    w.write(0, 1)  # size 3 (code 0)
    w.write(4, 3)  # DC block0 = 4
    w.write(0, 1)
    w.write(4, 3)  # diff 4 -> DC block1 = 8
    w.write(1, 1)  # size 4 (code 1)
    w.write(-12 + 15, 4)  # diff -12 -> DC block2 = -4
    w.flush()
    out += w.buf

    # scan 2: AC first, band 1-63, Al=1 — block0 gets t=3 at zigzag
    # k=1 (final value 6 before refinement), then EOB2+ext covering
    # block0's tail AND blocks 1-2 (eobrun = 2 + receive(1) = 3)
    out += dht(1, 0, {0x02: 1, 0x10: 1})
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    w = M._JpegBitWriter()
    w.write(0, 1)  # symbol 0x02 (r=0, s=2)
    w.write(3, 2)  # t = +3 -> coef 3<<1 = 6
    w.write(1, 1)  # symbol 0x10 (EOB2)
    w.write(1, 1)  # extension bit -> eobrun = 3
    w.flush()
    out += w.buf

    # scan 3: AC refinement Ah=1 -> Al=0 — block0 refines k=1 from 6
    # to 7 (correction bit 1) and adds a NEW coefficient -1 at k=3
    # after one zero-history zero (r=1): bit order must be symbol
    # 0x11, sign 0, THEN the buffered correction bit; EOB2+ext again
    # spans the rest
    out += dht(1, 0, {0x11: 1, 0x10: 1})
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    w = M._JpegBitWriter()
    w.write(0, 1)  # symbol 0x11 (skip r=1 zero-history, new coef s=1)
    w.write(0, 1)  # sign: negative -> -1 at k=3
    w.write(1, 1)  # correction bit for the k=1 history coef: 6 -> 7
    w.write(1, 1)  # symbol 0x10 (EOB2)
    w.write(1, 1)  # extension -> eobrun = 3
    w.flush()
    out += w.buf
    out += b"\xff\xd9"

    got = M._jpeg_decode(bytes(out))

    # expected raster from the pinned coefficients through the same
    # orthonormal IDCT contract the sequential tests pin
    m = M._jpeg_dct_matrix()
    expect = np.zeros((8, 24), np.float64)
    for b, dc in enumerate((4, 8, -4)):
        c = np.zeros(64)
        c[0] = dc
        if b == 0:
            c[M._JPEG_ZIGZAG[1]] = 7.0   # 6 + correction
            c[M._JPEG_ZIGZAG[3]] = -1.0  # newly nonzero in refinement
        spatial = m.T @ c.reshape(8, 8) @ m
        expect[:, b * 8 : (b + 1) * 8] = spatial
    expect = np.clip(np.round(expect) + 128.0, 0, 255).astype(np.uint8)
    assert got.shape == (8, 24, 1)
    assert np.array_equal(got[:, :, 0], expect)


def test_jpeg_decodes_through_spark_without_pil(spark):
    """The round-6 'Done' criterion: a real .jpg payload decodes with
    decode_ok=true and featurizes through the mapInPandas plumbing with
    no PIL in the environment; dhash and resize consume the same native
    path; a progressive variant still dead-letters."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_encode_baseline,
        decode_features,
        image_dhash,
        resize_assets,
    )

    img = _jpeg_gradient(24, 32)
    jpeg = _jpeg_encode_baseline(img, quality=95)
    payload = bytearray(jpeg)
    sof_at = payload.index(b"\xff\xc0")
    progressive = bytes(
        payload[:sof_at] + b"\xff\xc2" + payload[sof_at + 2 :]
    )
    assets = spark.createDataFrame(
        [
            (1, "image/jpeg", jpeg, {"n_bytes": len(jpeg), "source": "t"}),
            (
                2,
                "image/jpeg",
                progressive,
                {"n_bytes": len(progressive), "source": "t"},
            ),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )

    feats = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    ok = feats[1]
    assert ok["decode_ok"] and ok["error"] is None
    w, h, bpp, mean_px = ok["feature"]
    assert (w, h, bpp) == (32.0, 24.0, 24.0)
    assert abs(mean_px - float(img.mean())) < 3.0
    bad = feats[2]
    assert not bad["decode_ok"] and "progressive" in bad["error"]

    hashes = {r["asset_id"]: r for r in image_dhash(assets).collect()}
    assert hashes[1]["decode_ok"] and hashes[1]["dhash"] is not None
    assert not hashes[2]["decode_ok"]

    rz = {
        r["asset_id"]: r
        for r in resize_assets(assets, 500, real_decoder=True).collect()
    }
    assert rz[1]["decode_ok"]  # decoded natively, re-encoded to PNM
    assert not rz[2]["decode_ok"]
    assert bytes(rz[2]["payload"]) == progressive  # kept for a PIL retry


def test_jpeg_native_matches_pil_decode(spark):
    """Cross-implementation check against a REAL codec where available:
    PIL's decode of our encoder's stream and our decode of PIL's stream
    must agree within a few levels (IDCT implementations legitimately
    differ by rounding). Skips where PIL is absent (this container)."""
    import io

    import numpy as np

    image_mod = pytest.importorskip(
        "PIL.Image", reason="PIL not installed; round-trip tests above "
        "cover the native decoder against the native encoder"
    )
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
    )

    img = _jpeg_gradient(40, 48)
    # our encoder -> PIL decoder
    with image_mod.open(io.BytesIO(_jpeg_encode_baseline(img, 95))) as im:
        pil_pixels = np.asarray(im.convert("RGB"), dtype=np.uint8)
    ours = _jpeg_decode(_jpeg_encode_baseline(img, 95))
    assert np.abs(
        pil_pixels.astype(int) - ours.astype(int)
    ).max() <= 4
    # PIL encoder -> our decoder
    buf = io.BytesIO()
    image_mod.fromarray(img).save(buf, "JPEG", quality=95)
    theirs_decoded = _jpeg_decode(buf.getvalue())
    with image_mod.open(io.BytesIO(buf.getvalue())) as im:
        pil_own = np.asarray(im.convert("RGB"), dtype=np.uint8)
    assert np.abs(
        theirs_decoded.astype(int) - pil_own.astype(int)
    ).max() <= 4


def test_compressed_video_through_ffmpeg_when_available(spark):
    """Capability-routed video demux: with ffmpeg on PATH a compressed
    container round-trips (y4m → mp4 via ffmpeg, then featurize + frame
    sample through _ffmpeg_to_y4m). Skips where ffmpeg is absent."""
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        pytest.skip("ffmpeg not on PATH; dead-letter fallback covered "
                    "by test_decode_errors_dead_letter_not_raise")

    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
        sample_frames,
    )

    y4m = _make_y4m(4, 2, lumas=[0, 100, 200])
    proc = subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "yuv4mpegpipe", "-i", "pipe:0",
         "-f", "mp4", "-movflags", "frag_keyframe+empty_moov", "pipe:1"],
        input=y4m, capture_output=True, check=True,
    )
    mp4 = proc.stdout
    assets = spark.createDataFrame(
        [(1, "video/mp4", mp4, {"n_bytes": len(mp4), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )

    r = decode_features(assets, real_decoder=True).collect()[0]
    assert r["decode_ok"] and r["error"] is None
    # feature = [width, height, n_frames, mean_luma]
    assert r["feature"][:3] == [4.0, 2.0, 3.0]

    frames = sample_frames(assets, real_decoder=True).collect()
    assert all(f["decode_ok"] for f in frames)
    assert len(frames) >= 1


def test_paletted_bmp_matches_paletted_png_fingerprint(spark):
    """Cross-encoding parity: the same image stored as a paletted (8-bpp)
    BMP and a paletted PNG must produce identical checksum and mean —
    both normalize through their color tables to the same RGB raster."""
    import struct

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _stdlib_featurize,
    )

    pal = [(255, 0, 0), (0, 255, 0), (12, 34, 56)]
    idx_rows = [[0, 1, 2], [2, 1, 0]]

    # 8bpp BMP: color table of BGRA entries right after the 40-byte info
    # header, palette-index raster stored bottom-up with row padding
    table = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in pal)
    stride = ((3 + 3) // 4) * 4
    raster = b"".join(
        bytes(row).ljust(stride, b"\xAA") for row in reversed(idx_rows)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(raster), 2835, 2835, len(pal), 0
    )
    off = 14 + 40 + len(table)
    bmp = (
        struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
        + info + table + raster
    )
    png = _make_png(idx_rows, 3, [0, 0], palette=pal)

    bmp_crc, bmp_feat = _stdlib_featurize("image/bmp", bmp)
    png_crc, png_feat = _stdlib_featurize("image/png", png)
    assert bmp_crc == png_crc
    assert bmp_feat[3] == png_feat[3]  # identical mean over expanded RGB
    assert bmp_feat[:2] == png_feat[:2] == [3.0, 2.0]


@pytest.mark.slow
def test_batched_bpe_cuts_rounds_and_stays_valid(spark):
    """Batched BPE learns K pairwise-disjoint merges per Spark round:
    same merge budget in >=5x fewer (count + apply) cycles, deterministic
    across re-runs, batch members mutually disjoint, and batch_size=1
    reduces exactly to the classic sequential algorithm."""
    from inbev_data_engineering_case_spark.operators.bpe import (
        train_bpe,
        train_bpe_with_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest newest widest widest"),
            (4, "bright brighter brightest brightly brighten"),
        ],
        "doc_id long, text string",
    )

    seq_merges, seq_rounds = train_bpe_with_stats(docs, n_merges=10)
    bat_merges, bat_rounds = train_bpe_with_stats(
        docs, n_merges=10, batch_size=5
    )
    assert seq_rounds == 10 and bat_rounds == 2  # 5x fewer Spark cycles
    assert len(bat_merges) == 10
    assert bat_merges == train_bpe(docs, n_merges=10, batch_size=5)  # det.

    # within each round's batch, no pair consumes an earlier pair's
    # operand (right==earlier-left / left==earlier-right) or uses a
    # symbol minted this round — the count-invariance admission rule
    for start in (0, 5):
        lefts, rights, minted = set(), set(), set()
        for left, right in bat_merges[start : start + 5]:
            assert right not in lefts and left not in rights
            assert left not in minted and right not in minted
            lefts.add(left)
            rights.add(right)
            minted.add(left + right)

    # batch_size=1 IS classic BPE
    assert train_bpe(docs, n_merges=6, batch_size=1) == train_bpe(
        docs, n_merges=6
    )


def test_bpe_tokenize_cache_cap_preserves_output(spark):
    """A tiny LRU cap must not change tokenization — only bound memory."""
    from inbev_data_engineering_case_spark.operators.bpe import (
        bpe_tokenize,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, f"newest widest lowest token{i} alpha beta") for i in range(20)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=6)
    big = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_tokenize(docs, merges).collect()}
    tiny = {r["doc_id"]: r["bpe_tokens"]
            for r in bpe_tokenize(docs, merges, cache_size=2).collect()}
    assert big == tiny


def test_image_dhash_perceptual_near_dup(spark):
    """dHash perceptual near-dup: the SAME picture at a different
    resolution (2x nearest upsample) hashes identically (hamming 0); a
    slightly-edited copy lands within the hamming radius; an unrelated
    image does not pair; undecodable payloads dead-letter."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _dhash64,
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(16, 18, 3)).astype("uint8")
    up = np.kron(base, np.ones((2, 2, 1))).astype("uint8")  # 2x upsample
    assert _dhash64(base) == _dhash64(up)

    edited = base.copy()
    edited[0, 0] = [255, 255, 255]  # tiny edit -> small hamming
    other = rng.randint(0, 256, size=(16, 18, 3)).astype("uint8")

    def bmp(px):
        # _make_bmp takes row-major BGR tuples
        return _make_bmp(
            [[tuple(int(v) for v in p[::-1]) for p in row] for row in px]
        )

    assets = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(bmp(base))),
            (2, "image/bmp", bytearray(bmp(up))),
            (3, "image/bmp", bytearray(bmp(edited))),
            (4, "image/bmp", bytearray(bmp(other))),
            (5, "image/jpeg", bytearray(b"\xff\xd8\xff junk")),
        ],
        "asset_id long, media_type string, payload binary",
    )
    hashes = {r["asset_id"]: r for r in image_dhash(assets).collect()}
    assert hashes[1]["dhash"] == hashes[2]["dhash"]
    assert hashes[5]["decode_ok"] is False and hashes[5]["error"]

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(
            assets, max_hamming=6, bucket_bits=4
        ).collect()
    }
    assert pairs.get((1, 2)) == 0  # resolution-invariant exact match
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6  # edited copy found
    assert not any(4 in p for p in pairs)  # unrelated image stays out


def test_curate_corpus_asset_near_dup_gate(spark):
    """r14 VERDICT ask #2: the asset_near_dup= curation gate drops
    image near-dup LOSERS in the same pass — composition parity with
    (a) standalone image_near_dup_keep deciding the survivors and (b)
    curating only the asset-surviving documents. Text-only documents
    (no asset row) and undecodable assets are never touched."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )
    from inbev_data_engineering_case_spark.operators.multimodal import (
        image_near_dup_keep,
    )

    texts = {
        1: "a completely different tale about the river and the old "
           "boat that the fisherman kept near the house by the shore",
        2: "the cats sleep on the warm stones by the garden wall all "
           "day and the dogs watch them from the porch in the shade",
        3: "a brand new page about the markets and the traders who "
           "walk the long road to the city every morning at dawn",
        4: "short fresh note about the quiet harbor lighthouse and the "
           "keeper who climbs the spiral stairs at dusk every evening",
    }
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(16, 18, 3)).astype("uint8")
    edited = base.copy()
    edited[0, 0] = [255, 255, 255]

    def bmp(px):
        return _make_bmp(
            [[tuple(int(v) for v in p[::-1]) for p in row] for row in px]
        )

    # doc 2's image near-dups doc 1's (texts are unrelated — the gate
    # is pixel-space, not text-space); doc 3's asset is undecodable
    # junk (dead-letter → survives the gate); doc 4 is text-only
    assets = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(bmp(base))),
            (2, "image/bmp", bytearray(bmp(edited))),
            (3, "image/jpeg", bytearray(b"\xff\xd8\xff junk")),
        ],
        "asset_id long, media_type string, payload binary",
    )

    gated = sorted(
        r["doc_id"]
        for r in curate_corpus(
            docs, min_quality=0.0,
            asset_near_dup=assets, asset_bucket_bits=4,
        ).collect()
    )
    assert gated == [1, 3, 4]  # 2's image lost its cluster; 3, 4 kept

    # (a) standalone keep decides the same survivors
    kept_assets = sorted(
        r["asset_id"]
        for r in image_near_dup_keep(assets, bucket_bits=4).collect()
    )
    assert kept_assets == [1, 3]

    # (b) identical to curating only the asset-surviving documents
    survivor_docs = docs.filter(F.col("doc_id") != 2)
    want = sorted(
        r["doc_id"]
        for r in curate_corpus(survivor_docs, min_quality=0.0).collect()
    )
    assert gated == want


def test_bigram_lm_scores_typical_text_higher(spark):
    """Perplexity-filter semantics: a document made of the corpus's
    dominant bigrams scores a higher avg logprob than one of unique
    gibberish; one-token docs get no row; the integer sum path is
    deterministic under repartition."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        bigram_lm_scores,
    )

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(5)]
        + [(10, "zq xv jk wp lm qn"), (11, "solo")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert 11 not in rows  # no bigram
    assert rows[0]["n_bigrams"] == 5
    assert rows[0]["avg_logprob"] > rows[10]["avg_logprob"]

    again = {
        r["doc_id"]: r["sum_lp_micro"]
        for r in bigram_lm_scores(docs.repartition(7)).collect()
    }
    assert again == {k: v["sum_lp_micro"] for k, v in rows.items()}


def test_curate_corpus_perplexity_stage(spark):
    """min_avg_logprob drops the gibberish doc the cheap filters keep,
    and default-off leaves curate_corpus output unchanged."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )

    natural = "the cat sat on the mat and the dog sat on the rug"
    docs = spark.createDataFrame(
        [(i, natural + f" extra{i}") for i in range(6)]
        + [(20, "the zq the xv the jk the wp the lm the qn the aa the bb")],
        "doc_id long, text string",
    )
    base_ids = {
        r["doc_id"]
        for r in curate_corpus(
            docs, languages=("en",), min_quality=0.0, near_dup_threshold=0.9
        ).collect()
    }
    assert 20 in base_ids  # survives lang/quality (stopword-heavy)

    filtered_ids = {
        r["doc_id"]
        for r in curate_corpus(
            docs,
            languages=("en",),
            min_quality=0.0,
            near_dup_threshold=0.9,
            min_avg_logprob=-2.5,
        ).collect()
    }
    assert 20 not in filtered_ids  # rare bigrams: -2.9 vs -1.55 typical
    assert filtered_ids  # natural docs survive
    assert filtered_ids <= base_ids


def test_curate_corpus_strip_html_stage(spark):
    """strip_html=True reduces page markup to prose BEFORE scoring and
    dedup: an HTML-wrapped copy of a kept doc becomes its exact dup (the
    markup would otherwise make fingerprints differ), and a markup-heavy
    junk page is judged on its stripped text, not its tags."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )

    en = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    rows = [
        (1, en),
        (2, f"<html><body><p>{en}</p><script>var x=1;</script></body></html>"),
        # markup-only page: strips to almost nothing -> quality-dropped
        (3, "<div><span></span></div><script>a=1</script>"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = curate_corpus(
        docs, min_quality=0.3, near_dup_threshold=0.5, strip_html=True
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # doc 2 collapses to an exact dup of doc 1 (min-id survivor wins)
    assert ids == [1]
    # the stripping is what makes it EXACT: raw fingerprints differ
    # (markup in the hash), stripped fingerprints are identical
    from inbev_data_engineering_case_spark.operators.textops import (
        fingerprint,
        html_to_text,
    )

    fps = docs.select(
        "doc_id",
        fingerprint("text").alias("raw_fp"),
        fingerprint(html_to_text("text")).alias("stripped_fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in fps}
    assert by_id[1]["raw_fp"] != by_id[2]["raw_fp"]
    assert by_id[1]["stripped_fp"] == by_id[2]["stripped_fp"]


def _make_gif(idx_rows, palette, interlaced=False, animated_tail=False):
    """Minimal GIF89a encoder for tests: global color table padded to 4
    entries (min LZW code size 2), raster emitted with a CLEAR code
    before every pixel code (the classic 'uncompressed GIF' technique —
    valid LZW, dictionary never grows), optional interlace flag with
    rows pre-shuffled into pass order, optional second image block to
    exercise first-frame semantics."""
    import struct

    h = len(idx_rows)
    w = len(idx_rows[0])
    pal = list(palette) + [(0, 0, 0)] * (4 - len(palette))
    gct = b"".join(bytes(c) for c in pal)
    header = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80 | 0x01, 0, 0])
    # rows in stream order: interlaced GIFs store pass 1 (rows 0,8,..),
    # pass 2 (4,12,..), pass 3 (2,6,..), pass 4 (odd rows)
    rows = idx_rows
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = [idx_rows[r] for r in order]
    min_code, clear, eoi = 2, 4, 5
    bits, nbits = [], 3  # code size = min_code + 1
    for px in (p for row in rows for p in row):
        for code in (clear, px):
            for b in range(nbits):
                bits.append((code >> b) & 1)
    for b in range(nbits):
        bits.append((eoi >> b) & 1)
    while len(bits) % 8:
        bits.append(0)
    data = bytes(
        sum(bit << i for i, bit in enumerate(bits[k : k + 8]))
        for k in range(0, len(bits), 8)
    )
    blocks = b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    )
    img = (
        b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlaced else 0])
        + bytes([min_code]) + blocks + b"\x00"
    )
    # a graphic-control extension before the image (block-skip coverage)
    ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    tail = img if animated_tail else b""
    return header + gct + ext + img + tail + b"\x3B"


def test_stdlib_gif_decoder_known_answer():
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    pal = [(255, 0, 0), (0, 255, 0), (12, 34, 56)]
    idx_rows = [[0, 1, 2], [2, 1, 0]]
    pixels = _gif_decode_pixels(_make_gif(idx_rows, pal))
    want = np.array([[pal[i] for i in row] for row in idx_rows], np.uint8)
    assert pixels.shape == (2, 3, 3)
    assert (pixels == want).all()


def test_gif_interlace_and_first_frame():
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    pal = [(10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 40, 40)]
    idx_rows = [[r % 4] * 2 for r in range(5)]  # 5 rows -> 4 passes used
    plain = _gif_decode_pixels(_make_gif(idx_rows, pal))
    inter = _gif_decode_pixels(_make_gif(idx_rows, pal, interlaced=True))
    assert (plain == inter).all()  # deinterlace restores row order
    # animated: first frame decoded, trailer frames ignored
    anim = _gif_decode_pixels(_make_gif(idx_rows, pal, animated_tail=True))
    assert (anim == plain).all()
    want = np.array([[pal[r % 4]] * 2 for r in range(5)], np.uint8)
    assert (plain == want).all()


def test_gif_matches_paletted_png_fingerprint():
    """Cross-encoding parity, extended to GIF: the same paletted image as
    GIF and paletted PNG checksums identically over the expanded RGB
    raster (the encoding-invariance contract of _featurize_bmp)."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _stdlib_featurize,
    )

    pal = [(255, 0, 0), (0, 255, 0), (12, 34, 56)]
    idx_rows = [[0, 1, 2], [2, 1, 0]]
    gif_crc, gif_feat = _stdlib_featurize(
        "image/gif", _make_gif(idx_rows, pal)
    )
    png_crc, png_feat = _stdlib_featurize(
        "image/png", _make_png(idx_rows, 3, [0, 0], palette=pal)
    )
    assert gif_crc == png_crc
    assert gif_feat[:2] == png_feat[:2] == [3.0, 2.0]
    assert gif_feat[3] == png_feat[3]


def test_gif_corrupt_stream_raises():
    import pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    pal = [(1, 2, 3)]
    good = _make_gif([[0, 0], [0, 0]], pal)
    with pytest.raises(ValueError):
        _gif_decode_pixels(good[:20])  # truncated mid-stream
    with pytest.raises(ValueError):
        _gif_decode_pixels(b"GIF89a" + b"\x00" * 5)  # header truncated


def test_gif_lzw_roundtrip_with_real_compression():
    """The clear-per-pixel fixtures above never grow the LZW dictionary;
    this encodes rasters with the REAL GIF LZW algorithm (growing
    dictionary, variable code width, KwK self-reference on repeats) and
    round-trips them through the decoder."""
    import random

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    def lzw_encode(indices, min_code_size):
        clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
        out_bits = []
        code_size = min_code_size + 1

        def emit(code):
            for b in range(code_size):
                out_bits.append((code >> b) & 1)

        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        emit(clear)
        cur = b""
        for px in indices:
            nxt = cur + bytes([px])
            if nxt in table:
                cur = nxt
                continue
            emit(table[cur])
            table[nxt] = next_code
            next_code += 1
            # encoder widens AFTER assigning the code that fills the
            # current width (mirror of the decoder's bump condition)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
            cur = bytes([px])
        if cur:
            emit(table[cur])
        emit(eoi)
        while len(out_bits) % 8:
            out_bits.append(0)
        return bytes(
            sum(bit << i for i, bit in enumerate(out_bits[k : k + 8]))
            for k in range(0, len(out_bits), 8)
        )

    rng = random.Random(7)
    for trial, min_code in [(0, 2), (1, 4), (2, 8)]:
        n_colors = 1 << min_code
        # runs of repeats force the KwK case; enough pixels to force
        # several code-width bumps
        indices = []
        while len(indices) < 4000:
            indices += [rng.randrange(n_colors)] * rng.randint(1, 9)
        indices = indices[:4000]
        data = lzw_encode(indices, min_code)
        got = _gif_lzw_decode(data, min_code, len(indices))
        assert list(got) == indices, f"trial {trial} mismatch"


def test_gif_decoder_matches_pil_when_available():
    """Cross-implementation check against a REAL encoder: PIL-written
    GIFs (its LZW, its palette layout) must decode to PIL's own pixel
    answer. Skips where PIL is absent (this container); runs anywhere it
    exists."""
    import io

    import numpy as np
    import pytest

    image_mod = pytest.importorskip("PIL.Image")

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 255, size=(13, 17, 3), dtype=np.uint8)
    im = image_mod.fromarray(rgb, "RGB").convert(
        "P", palette=image_mod.Palette.ADAPTIVE
    )
    buf = io.BytesIO()
    im.save(buf, format="GIF")
    payload = buf.getvalue()
    want = np.asarray(im.convert("RGB"))
    got = _gif_decode_pixels(payload)
    assert got.shape == want.shape
    assert (got == want).all()


def _box(btype: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + btype + body


def _make_mp4(width=320, height=240, timescale=1000, duration=2500,
              audio_track=True, largesize_mdat=False):
    """Minimal ISO BMFF fixture: ftyp + (optional 64-bit-size mdat) +
    moov[mvhd + video trak + optional audio trak]."""
    import struct

    mvhd = _box(
        b"mvhd",
        bytes(1) + bytes(3)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + bytes(80),  # rate/volume/reserved/matrix/predefines/next id
    )

    def tkhd(w, h):
        return _box(
            b"tkhd",
            bytes(4) + struct.pack(">IIII", 0, 0, 1, 0)
            + struct.pack(">I", duration) + bytes(52)
            + struct.pack(">II", w << 16, h << 16),
        )

    traks = _box(b"trak", tkhd(width, height))
    if audio_track:
        traks += _box(b"trak", tkhd(0, 0))
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    mdat = b""
    if largesize_mdat:
        payload = b"\x00" * 24
        mdat = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(payload)) + payload
        )
    return ftyp + mdat + moov


def test_video_metadata_box_walk(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        video_metadata,
    )

    rows = [
        (1, "video/mp4", _make_mp4()),
        (2, "video/mp4", _make_mp4(width=1920, height=1080, timescale=600,
                                   duration=1200, audio_track=False,
                                   largesize_mdat=True)),
        (3, "video/y4m", _make_y4m(4, 2, [10, 200])),
        (4, "video/mp4", b"\x00\x00\x00\x08ftyp"),  # no moov -> dead-letter
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    out = {r["asset_id"]: r for r in video_metadata(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (320, 240)
    assert out[1]["duration_ms"] == 2500  # 2500 ticks @ 1000 ticks/s
    assert out[1]["n_tracks"] == 2  # audio trak counted, its 0x0 ignored
    assert (out[2]["width"], out[2]["height"]) == (1920, 1080)
    assert out[2]["duration_ms"] == 2000  # 1200 ticks @ 600 ticks/s
    assert out[2]["n_tracks"] == 1  # 64-bit mdat skipped correctly
    assert (out[3]["width"], out[3]["height"]) == (4, 2)
    assert out[3]["meta_ok"] and out[3]["duration_ms"] is None
    assert not out[4]["meta_ok"] and "moov" in out[4]["error"]
    # strict mode raises instead of dead-lettering
    import pytest

    with pytest.raises(Exception, match="moov"):
        video_metadata(df, strict=True).collect()


def test_video_metadata_truncated_tkhd_dead_letters(spark):
    """A tkhd whose body is shorter than the 84-byte v0 layout must
    dead-letter, not read its display size from the preceding sibling's
    bytes and report garbage dimensions with meta_ok=true."""
    import struct

    from inbev_data_engineering_case_spark.operators.multimodal import (
        video_metadata,
    )

    mvhd = _box(
        b"mvhd",
        bytes(1) + bytes(3) + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, 2500) + bytes(80),
    )
    stub_tkhd = _box(b"tkhd", bytes(4) + struct.pack(">III", 0, 0, 1))
    moov = _box(b"moov", mvhd + _box(b"trak", stub_tkhd))
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    short_mvhd = _box(b"moov", _box(b"mvhd", bytes(4)))
    df = spark.createDataFrame(
        [(1, "video/mp4", ftyp + moov), (2, "video/mp4", ftyp + short_mvhd)],
        "asset_id long, media_type string, payload binary",
    )
    out = {r["asset_id"]: r for r in video_metadata(df).collect()}
    assert not out[1]["meta_ok"] and "tkhd" in out[1]["error"]
    assert not out[2]["meta_ok"] and "mvhd" in out[2]["error"]


def test_semantic_decontaminate_drops_paraphrase_neighbors(spark):
    """A corpus vector nearly parallel to a benchmark vector is flagged
    and its document dropped; orthogonal vectors survive. The n-gram
    check would miss this entirely (no shared text)."""
    from inbev_data_engineering_case_spark.operators.decontaminate import (
        semantic_contamination,
        semantic_decontaminate,
    )

    d = 8
    e = lambda i: [0.0] * i + [1.0] + [0.0] * (d - i - 1)  # noqa: E731
    bench = spark.createDataFrame(
        [(900, e(0)), (901, e(1))], "vec_id long, embedding array<double>"
    )
    near = [0.999] + [0.001] * (d - 1)  # cosine ~0.9999 to e(0)
    corpus_emb = spark.createDataFrame(
        [(1, near), (2, e(4)), (3, e(5))],
        "vec_id long, embedding array<double>",
    )
    pairs = semantic_contamination(corpus_emb, bench, threshold=0.9).collect()
    assert {(r["corpus_id"], r["bench_id"]) for r in pairs} == {(1, 900)}
    assert pairs[0]["sim"] > 0.99

    docs = spark.createDataFrame(
        [(1, "paraphrased eval question"), (2, "clean"), (3, "clean too")],
        "doc_id long, text string",
    )
    kept = semantic_decontaminate(docs, corpus_emb, bench, threshold=0.9)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_curate_corpus_semantic_stage(spark):
    """The optional semantic-decontamination stage inside curate_corpus:
    a doc whose embedding neighbors an eval vector is dropped even
    though its TEXT shares nothing with the benchmark."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )

    en1 = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    en2 = (
        "a completely different english text about the history of bridges "
        "and the people that built them in the old days of iron and stone"
    )
    docs = spark.createDataFrame([(1, en1), (2, en2)], ["doc_id", "text"])
    d = 8
    e = lambda i: [0.0] * i + [1.0] + [0.0] * (d - i - 1)  # noqa: E731
    corpus_emb = spark.createDataFrame(
        [(1, [0.999] + [0.001] * (d - 1)), (2, e(4))],
        "vec_id long, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(900, e(0))], "vec_id long, embedding array<double>"
    )
    kept = curate_corpus(
        docs,
        min_quality=0.3,
        near_dup_threshold=0.5,
        corpus_embeddings=corpus_emb,
        benchmark_embeddings=bench_emb,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [2]
    # guard: benchmark embeddings without the corpus mapping is an error
    import pytest

    with pytest.raises(ValueError, match="corpus_embeddings"):
        curate_corpus(docs, benchmark_embeddings=bench_emb)


def test_gif_depth_reflects_actual_color_table():
    """Depth regression: the reported bit depth comes from the color
    table the frame USED, not the logical-screen packed bits (which are
    meaningless for local tables / unset global flags)."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_gif,
    )

    pal4 = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    _, feat = _featurize_gif(_make_gif([[0, 1], [2, 3]], pal4))
    assert feat[2] == 2.0  # 4-entry table -> 2-bit indices


def test_gif_offset_frame_composes_onto_logical_screen():
    """A first frame that is a sub-rectangle of the logical screen must
    compose at its (left, top) offset over the background color — like
    PIL — so dimensions and checksums stay encoding-invariant."""
    import struct

    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    # 4x3 logical screen, 2x1 frame at (1, 1); bg index 1
    pal = [(10, 20, 30), (200, 200, 200), (1, 2, 3), (4, 5, 6)]
    base = _make_gif([[0, 2]], pal)  # reuse the encoder's blocks
    # patch: header screen 4x3, bg=1; image descriptor left=1, top=1
    patched = bytearray(base)
    struct.pack_into("<HH", patched, 6, 4, 3)
    patched[11] = 1
    img_off = patched.index(0x2C)
    struct.pack_into("<HH", patched, img_off + 1, 1, 1)
    pixels = _gif_decode_pixels(bytes(patched))
    assert pixels.shape == (3, 4, 3)
    bg = np.array(pal[1], np.uint8)
    assert (pixels[0, 0] == bg).all() and (pixels[2, 3] == bg).all()
    assert (pixels[1, 1] == np.array(pal[0], np.uint8)).all()
    assert (pixels[1, 2] == np.array(pal[2], np.uint8)).all()


def test_video_metadata_accepts_styp_and_mdat_first(spark):
    """BMFF files needn't lead with ftyp: fragmented streams lead with
    styp and legacy MOVs can be mdat-first — the box walk, not a magic
    allowlist, decides."""
    import struct

    from inbev_data_engineering_case_spark.operators.multimodal import (
        video_metadata,
    )

    base = _make_mp4(width=640, height=480)
    styp_first = _box(b"styp", b"msdh" + bytes(4)) + base
    # mdat-first: move a tiny mdat ahead of everything
    mdat_first = _box(b"mdat", b"\x00" * 8) + base
    df = spark.createDataFrame(
        [(1, "video/mp4", styp_first), (2, "video/quicktime", mdat_first)],
        "asset_id long, media_type string, payload binary",
    )
    out = {r["asset_id"]: r for r in video_metadata(df).collect()}
    assert out[1]["meta_ok"] and (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[2]["meta_ok"] and (out[2]["width"], out[2]["height"]) == (640, 480)


def test_weighted_sample_scales_with_weight(spark):
    """A-ES properties: heavier rows are overrepresented, no row repeats,
    zero/NULL weights never draw, and the subset is deterministic."""
    from inbev_data_engineering_case_spark.operators.sample import (
        weighted_sample,
    )

    rows = (
        [(i, 10.0) for i in range(500)]           # heavy: weight 10
        + [(1000 + i, 1.0) for i in range(500)]   # light: weight 1
        + [(9001, 0.0), (9002, None)]             # never drawn
    )
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = weighted_sample(df, 300, "w").collect()
    ids = [r["doc_id"] for r in picked]
    assert len(ids) == len(set(ids)) == 300  # without replacement
    assert 9001 not in ids and 9002 not in ids
    heavy = sum(1 for i in ids if i < 500)
    # E[heavy] ~ 272 of 300 (weight ratio 10:1); even a loose bound
    # separates it decisively from unweighted (~150)
    assert heavy > 200, heavy
    # deterministic: same data -> same subset; new salt -> new subset
    again = [r["doc_id"] for r in weighted_sample(df, 300, "w").collect()]
    assert again == ids
    other = [
        r["doc_id"] for r in weighted_sample(df, 300, "w", salt=1).collect()
    ]
    assert other != ids


def test_gif_declared_screen_bounds_are_enforced():
    """A tiny payload declaring a huge logical screen must dead-letter,
    not allocate a multi-GB canvas; an overhanging frame is corrupt."""
    import struct

    import pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    pal = [(1, 2, 3)]
    base = bytearray(_make_gif([[0, 0]], pal))
    struct.pack_into("<HH", base, 6, 65535, 65535)  # 12.9 GB canvas claim
    with pytest.raises(ValueError, match="64M-pixel"):
        _gif_decode_pixels(bytes(base))

    overhang = bytearray(_make_gif([[0, 0]], pal))
    struct.pack_into("<HH", overhang, 6, 2, 1)  # screen 2x1
    img_off = overhang.index(0x2C)
    struct.pack_into("<HH", overhang, img_off + 1, 1, 0)  # frame at left=1
    with pytest.raises(ValueError, match="overhangs"):
        _gif_decode_pixels(bytes(overhang))


def test_weighted_sample_excludes_null_ids(spark):
    from inbev_data_engineering_case_spark.operators.sample import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (None, 99.0), (2, 5.0)], "doc_id long, w double"
    )
    ids = [r["doc_id"] for r in weighted_sample(df, 3, "w").collect()]
    assert ids and None not in ids


def test_curation_report_matches_pipeline_cardinalities(spark):
    """The report's funnel counts are the pipeline's own intermediate
    cardinalities: monotone non-increasing, and the final row equals
    curate_corpus's output size on the same corpus."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
        curation_report,
    )

    en = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for that in the sun with a friend of the family"
    )
    rows = [
        (1, en),
        (2, en),                            # exact dup
        (3, en + " extra tail words"),      # near dup
        (4, "el que la de y en un una por con el que la de y en un por"),
        (5, "x! y? z. a; b: c, d! e? f."),  # junk
        (6, "a completely different english text about the history of "
            "bridges and the people that built them in the old days"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    report = {
        r["stage"]: r["survivors"]
        for r in curation_report(docs).collect()
    }
    assert report["input"] == 6
    # doc 4 (Spanish) and doc 5 (no stopwords -> lang 'und') both fall
    # at the language gate; nothing else falls at quality here
    assert report["lang"] == 4
    assert report["quality"] == 4
    assert report["exact_dedup"] == 3  # doc 2 out
    assert report["near_dedup"] == 2   # doc 3 out
    counts = [report[s] for s in
              ("input", "lang", "quality", "exact_dedup", "near_dedup")]
    assert counts == sorted(counts, reverse=True)
    assert report["near_dedup"] == curate_corpus(docs).count()


@pytest.mark.slow
def test_curation_report_surfaces_decontamination_and_halo(spark):
    """The decontamination stages are funnel rows (r12 VERDICT ask —
    a halo run's contamination drop must be visible to the
    day-over-day alarm): with a benchmark, a 'decontaminate' row lands
    at the direct drop's spot and the final row equals
    curate_corpus(benchmark=...); with halo_hops, the drop defers past
    the dedup chain (no mid-funnel row) and a final 'halo' row equals
    curate_corpus(benchmark=..., halo_hops=...) — including the
    contaminated-by-association representative only the halo drops.
    halo_hops without benchmark raises, same as the pipeline. A
    collapse in the halo stage trips curation_drift like any other
    stage (the alarm keys on stage names, so the new row is armed for
    free)."""
    import datetime

    import pytest

    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
        curation_drift,
        curation_report,
    )

    bench_text = (
        "this exact benchmark passage with its very specific wording "
        "must never appear inside any document of the training corpus"
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    docs = spark.createDataFrame(
        [
            # 1 and 2 directly flagged (verbatim + tail paraphrase)
            (1, bench_text),
            (2, bench_text + " with a small harmless tail added"),
            (3, "an entirely clean document about the weather and the "
                "mountains where the hikers rest by the little stream"),
            # 5 clean, kept as cluster rep; 6 contaminated near-dup of
            # 5 (higher id, dropped by dedup) — plain decontamination
            # never drops 5, only the halo does (1 hop via the pair)
            (5, "a long and ordinary english report on the harvest and "
                "the carts that the farmers drive to the market today"),
            (6, "a long and ordinary english report on the harvest and "
                "the carts that the farmers drive to the market today "
                + bench_text),
        ],
        "doc_id long, text string",
    )

    with pytest.raises(ValueError, match="requires benchmark"):
        curation_report(docs, halo_hops=2)

    plain = {
        r["stage"]: r["survivors"]
        for r in curation_report(docs, min_quality=0.0, benchmark=bench).collect()
    }
    assert "decontaminate" in plain and "halo" not in plain
    assert plain["decontaminate"] == 2  # docs 1, 2, 6 directly flagged
    assert plain["near_dedup"] == curate_corpus(
        docs, min_quality=0.0, benchmark=bench
    ).count()

    halo = {
        r["stage"]: r["survivors"]
        for r in curation_report(
            docs, min_quality=0.0, benchmark=bench, halo_hops=2
        ).collect()
    }
    assert "decontaminate" not in halo  # the drop is deferred
    want_kept = curate_corpus(
        docs, min_quality=0.0, benchmark=bench, halo_hops=2
    )
    assert halo["halo"] == want_kept.count() == 1
    assert {r["doc_id"] for r in want_kept.collect()} == {3}
    # positional indices stay contiguous in both shapes
    for rep in (plain, halo):
        assert len(rep) == 6
    # the halo row arms the drift alarm: a stable halo series with a
    # day-15 collapse flags exactly that (stage, day)
    d0 = datetime.date(2024, 3, 1)
    rows = []
    for i in range(15):
        rows.append((d0 + datetime.timedelta(days=i), "halo", 900 + i % 2))
    rows.append((d0 + datetime.timedelta(days=15), "halo", 90))
    out = curation_drift(
        spark.createDataFrame(rows, "day date, stage string, survivors long"),
        window_days=12,
    ).collect()
    flagged = [r for r in out if r["is_drift"]]
    assert len(flagged) == 1 and flagged[0]["stage"] == "halo"
    assert flagged[0]["day"] == d0 + datetime.timedelta(days=15)


def test_curation_drift_flags_injected_collapse(spark):
    """Known-answer drift alarm: 15 days of stable per-stage funnel
    counts with small jitter, then day 15's quality stage collapses —
    exactly that (stage, day) flags, nothing else does, warm-up days
    emit no rows, and a zero-variance stage never scores."""
    import datetime

    from inbev_data_engineering_case_spark.operators.curate import (
        curation_drift,
    )

    d0 = datetime.date(2024, 3, 1)
    rows = []
    for i in range(15):
        day = d0 + datetime.timedelta(days=i)
        rows.append((day, "input", 5000))            # constant: never scores
        rows.append((day, "quality", 1000 + i % 3))  # jittered baseline
    rows.append((d0 + datetime.timedelta(days=15), "input", 5000))
    rows.append((d0 + datetime.timedelta(days=15), "quality", 300))  # crash
    history = spark.createDataFrame(
        rows, "day date, stage string, survivors long"
    )

    out = curation_drift(history, window_days=12).collect()
    # only full 12-day windows score: days 0-10 are warm-up
    assert len(out) == 2 * (16 - 11)
    flagged = [r for r in out if r["is_drift"]]
    assert len(flagged) == 1
    assert flagged[0]["stage"] == "quality"
    assert flagged[0]["day"] == d0 + datetime.timedelta(days=15)
    assert flagged[0]["survivors"] == 300
    assert flagged[0]["z_e4"] < -30000  # a collapse, not a spike
    # the constant stage has zero variance -> no score, no flag
    assert all(
        r["z_e4"] is None and not r["is_drift"]
        for r in out
        if r["stage"] == "input"
    )


def test_gif_frame_declared_bounds_checked_before_decode():
    """The 64M-pixel bound and overhang check run BEFORE the LZW decode
    and palette expansion — a descriptor-declared huge frame must
    dead-letter without allocating its raster, and a frame larger than
    the screen at (0,0) is just as corrupt as a shifted one."""
    import struct

    import pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _gif_decode_pixels,
    )

    pal = [(1, 2, 3)]
    huge_frame = bytearray(_make_gif([[0, 0]], pal))
    struct.pack_into("<HH", huge_frame, 6, 65535, 65535)  # screen claim
    img_off = huge_frame.index(0x2C)
    struct.pack_into("<HH", huge_frame, img_off + 5, 65535, 65535)  # frame
    with pytest.raises(ValueError, match="64M-pixel"):
        _gif_decode_pixels(bytes(huge_frame))

    origin_overhang = bytearray(_make_gif([[0, 0]], pal))  # frame 2x1
    struct.pack_into("<HH", origin_overhang, 6, 1, 1)  # screen 1x1
    with pytest.raises(ValueError, match="overhangs"):
        _gif_decode_pixels(bytes(origin_overhang))


def test_bm25_ranks_rare_term_and_length_norm(spark):
    """BM25 semantics: a doc matching the RARE query term outranks docs
    matching only the common one (idf), and between two docs with the
    same tf for the same term, the shorter one ranks higher (length
    normalization). Scores are int64 micro-units; ranks tie-break on
    doc_id."""
    import pytest as _pytest

    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_topk,
    )

    common = "the data table holds data rows"
    rows = [
        (1, "zebra " + common),                 # rare term + common
        (2, common + " " + common),             # common terms only
        (4, "nothing relevant here at all"),    # no match -> absent
        # identical tf profile (zebra:1, data:1), different lengths:
        (6, "zebra data pad pad pad pad pad pad pad pad"),
        (7, "zebra data"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in bm25_topk(docs, ["zebra", "data"], k=10).collect()
    }
    assert 4 not in out
    assert out[1]["n_terms_matched"] == 2
    # rare-term docs beat the common-only doc
    assert out[1]["rnk"] < out[2]["rnk"] and out[7]["rnk"] < out[2]["rnk"]
    # same tf profile: the shorter doc wins on length normalization
    assert out[7]["score_micro"] > out[6]["score_micro"]
    with _pytest.raises(ValueError, match="empty"):
        bm25_topk(docs, [])


def test_heavy_hitters_exact_counts_and_threshold(spark):
    """Sample-then-verify heavy hitters: an item above phi is reported
    with its EXACT count and integer-ppm share; items below phi are
    absent even when sampled; results are deterministic across runs."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.quality import (
        heavy_hitters,
    )

    # 400 rows across carrier ids 0..199: 'hot' 200x (50% of the
    # stream), 'warm' 58x (14.5%), 'cold' 2x (0.5%), fillers for the rest
    rows = [(i, "hot") for i in range(200)]
    rows += [(i % 200, "warm") for i in range(58)]
    rows += [(i, "cold") for i in range(2)]
    rows += [(i % 200, "filler%d" % (i % 97)) for i in range(140)]
    df = spark.createDataFrame(rows, ["doc_id", "term"])
    n = df.count()
    assert n == 400

    out = {
        r["item"]: r
        for r in heavy_hitters(
            df, "term", "doc_id", phi_ppm=50_000, sample_ppm=500_000
        ).collect()
    }
    assert set(out) == {"hot", "warm"}
    assert out["hot"]["cnt"] == 200  # exact, not estimated
    assert out["warm"]["cnt"] == 58
    assert out["hot"]["share_ppm"] == 200 * 1_000_000 // n
    # determinism: the hash-Bernoulli sample is a pure function of ids
    again = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(
            df, "term", "doc_id", phi_ppm=50_000, sample_ppm=500_000
        ).collect()
    }
    assert again == {k: v["cnt"] for k, v in out.items()}


def test_pmi_collocations_finds_planted_pair(spark):
    """A planted collocation ('san francisco': the pair always co-occurs)
    tops the PMI ranking over independent filler pairs; pairs under the
    min-count floor never appear."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        pmi_collocations,
    )

    filler = "the of and to in for on at by from"
    rows = []
    for i in range(20):
        rows.append((i, f"san francisco {filler}"))
    rows.append((100, "rare pair " + filler))  # below min_count=5
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pmi_collocations(docs, k=5, min_count=5).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("san", "francisco")
    assert top["pair_count"] == 20 and top["rnk"] == 1
    assert all((r["w1"], r["w2"]) != ("rare", "pair") for r in out)
    # PMI of the always-together pair beats any filler transition
    assert top["pmi_micro"] > out[1]["pmi_micro"]


def test_rrf_fuse_rewards_agreement_with_exact_micro_scores(spark):
    """A document ranked 2nd+3rd in two lists outscores the leaders of
    either single list (1e6//62 + 1e6//63 > 1e6//61), scores are exact
    floor-division micro-units, and ties break on the id."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(10, 1), (7, 2), (3, 3)], "doc_id long, rnk long"
    )
    sem = spark.createDataFrame(
        [(20, 1), (7, 2), (10, 4)], "doc_id long, rnk long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem], topk=10).collect()}
    assert out[7]["rrf_micro"] == 1_000_000 // 62 + 1_000_000 // 62
    assert out[10]["rrf_micro"] == 1_000_000 // 61 + 1_000_000 // 64
    assert out[20]["rrf_micro"] == 1_000_000 // 61
    assert out[3]["rrf_micro"] == 1_000_000 // 63
    assert out[7]["n_lists"] == 2 and out[20]["n_lists"] == 1
    # 7 (32258) > 10 (32016) > 20 (16393) > 3 (15873)
    assert [r["doc_id"] for r in sorted(
        out.values(), key=lambda r: r["rnk"])] == [7, 10, 20, 3]
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hard_negatives_excludes_same_label_and_null_labels(spark):
    """The nearest neighbor overall shares the query's label and must
    NOT appear; the mined hard negative is the closest CROSS-label
    vector; NULL-label vectors are excluded from both sides."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0], 1),     # query, label 1
        (1, [0.99, 0.14], 1),   # nearest overall — same label, excluded
        (2, [0.9, 0.44], 2),    # closest cross-label -> the hard negative
        (3, [0.0, 1.0], 2),     # far cross-label
        (4, [1.0, 0.01], None), # nearer than 2 but unlabeled, excluded
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = hard_negatives(
        emb, emb.filter("vec_id = 0"), k=2
    ).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in got] == [(2, 1), (3, 2)]
    assert all(r["neighbor_label"] == 2 for r in got)
    # a NULL-label QUERY mines nothing
    assert (
        hard_negatives(emb, emb.filter("vec_id = 4"), k=2).count() == 0
    )


def test_rrf_fuse_null_and_invalid_ranks(spark):
    """NULL ranks drop before the union (the doc is 'not in that list'
    — n_lists excludes it); a rank < 1 is a caller bug and fails
    loudly rather than corrupting the reciprocal term."""
    import pytest

    from inbev_data_engineering_case_spark.operators.relevance import (
        rrf_fuse,
    )

    withnull = spark.createDataFrame(
        [(1, None), (2, 1)], "doc_id long, rnk long"
    )
    out = rrf_fuse([withnull]).collect()
    assert [(r["doc_id"], r["n_lists"]) for r in out] == [(2, 1)]
    bad = spark.createDataFrame([(1, 0)], "doc_id long, rnk long")
    with pytest.raises(Exception, match="must be >= 1"):
        rrf_fuse([bad]).collect()


def test_rrf_fuse_dedups_duplicate_doc_within_one_list(spark):
    """A retriever list carrying the same doc twice (e.g. one row per
    matched term) contributes exactly ONE membership at its BEST
    (minimum) rank — n_lists never inflates past len(rankings) and the
    doc never collects two reciprocal terms from one list."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        rrf_fuse,
    )

    dup = spark.createDataFrame(
        [(7, 2), (7, 5), (3, 1)], "doc_id long, rnk long"
    )
    other = spark.createDataFrame([(7, 1)], "doc_id long, rnk long")
    out = {r["doc_id"]: r for r in rrf_fuse([dup, other], topk=10).collect()}
    assert out[7]["n_lists"] == 2  # once per list, not once per row
    assert out[7]["rrf_micro"] == 1_000_000 // 62 + 1_000_000 // 61
    assert out[3]["n_lists"] == 1


def test_bm25_index_roundtrip_identical_to_scan_path(spark, tmp_path):
    """bm25_from_index over a build_text_index output returns rows
    IDENTICAL to bm25_topk's one-pass scan on the same corpus — the
    materialized index changes where the work happens, never the
    answer. The index build's audit counts match the corpus shape."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        bm25_topk,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles data across the cluster"),
            (1, "spark spark spark tuning"),
            (2, "a zebra walked into the cluster"),
            (3, "unrelated text entirely"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "index")
    audit = build_text_index(docs, idx)
    assert audit["doclen_rows"] == 4
    # pinned expected value: 6 + 2 + 6 + 3 distinct (doc, term) pairs —
    # a regrouping regression changes this, a re-read of the same file
    # would not
    assert audit["tf_rows"] == 17
    key = lambda r: tuple(r)  # noqa: E731
    scan = sorted(map(key, bm25_topk(docs, ["spark", "zebra"], k=4).collect()))
    indexed = sorted(
        map(key, bm25_from_index(spark, idx, ["spark", "zebra"], k=4).collect())
    )
    assert scan == indexed and len(scan) == 3  # doc 3 matches nothing


def test_text_index_publishes_atomically_and_prunes(spark, tmp_path):
    """Each build publishes ONE committed snapshot (tf/doclen/stats
    together behind a single rename): a reader can never see
    mixed-generation tables. A crashed build's staging leftovers are
    invisible to resolution, and retention caps snapshot accumulation
    across rebuilds."""
    import os

    from inbev_data_engineering_case_spark.operators.relevance import (
        TEXT_INDEX_PREFIX,
        build_text_index,
        resolve_text_index,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    idx = str(tmp_path / "index")
    build_text_index(docs, idx)
    snap1 = resolve_text_index(idx)
    assert os.path.basename(snap1) == f"{TEXT_INDEX_PREFIX}_000000000001"
    for table in ("tf", "doclen", "stats"):
        assert os.path.isdir(os.path.join(snap1, table))
    # a torn build = staging dir with no commit; resolution ignores it
    os.makedirs(
        os.path.join(idx, f".staging_{TEXT_INDEX_PREFIX}_999_dead/tf")
    )
    assert resolve_text_index(idx) == snap1
    # rebuilds advance the snapshot; retention (default 2) prunes
    build_text_index(docs, idx)
    build_text_index(docs, idx)
    snaps = sorted(
        d for d in os.listdir(idx) if d.startswith(TEXT_INDEX_PREFIX)
    )
    assert snaps == [
        f"{TEXT_INDEX_PREFIX}_000000000002",
        f"{TEXT_INDEX_PREFIX}_000000000003",
    ]


def test_text_index_term_clustering_gives_disjoint_file_spans(
    spark, tmp_path
):
    """cluster_by_term=N writes the tf table as N term-range files with
    DISJOINT per-file term spans — parquet min/max stats then prune
    whole files under the pushed term filter (the physical form of
    'bucket the index by term at scale'). Results are identical to the
    unclustered build."""
    import os

    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        build_text_index,
        resolve_text_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "clustered")
    build_text_index(docs, idx, cluster_by_term=8)
    snap = resolve_text_index(idx)
    tf_dir = os.path.join(snap, "tf")
    spans = sorted(
        spark.read.parquet(os.path.join(tf_dir, f))
        .selectExpr("min(term)", "max(term)")
        .first()
        for f in os.listdir(tf_dir)
        if f.endswith(".parquet")
    )
    assert len(spans) == 8
    assert all(
        prev_hi <= lo for (_, prev_hi), (lo, _) in zip(spans, spans[1:])
    )
    plain = str(tmp_path / "plain")
    build_text_index(docs, plain)
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(
        map(key, bm25_from_index(spark, idx, ["data", "the"], k=10).collect())
    ) == sorted(
        map(
            key,
            bm25_from_index(spark, plain, ["data", "the"], k=10).collect(),
        )
    )


def test_text_index_compaction_reclusters_without_retokenizing(
    spark, tmp_path
):
    """Weekly maintenance for the delta-maintained index: after appends
    leave wide-span delta files, compact_text_index rewrites tf as N
    disjoint term-range files FROM THE STORED ROWS (no document text is
    read), hard-links doclen/stats through unchanged (inode identity),
    and query results are identical across the compaction."""
    import os

    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        build_text_index,
        compact_text_index,
        resolve_text_index,
        update_text_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "index")
    build_text_index(docs.filter("doc_id < 400"), idx)
    update_text_index(
        spark, idx, docs.filter("doc_id >= 400")
    )
    before = resolve_text_index(idx)
    key = lambda r: tuple(r)  # noqa: E731
    want = sorted(
        map(key, bm25_from_index(spark, idx, ["data", "the"], k=10).collect())
    )
    doclen_inodes = {
        f: os.stat(os.path.join(before, "doclen", f)).st_ino
        for f in os.listdir(os.path.join(before, "doclen"))
        if not f.startswith(("_", "."))
    }
    compact_text_index(spark, idx, cluster_by_term=8)
    snap = resolve_text_index(idx)
    assert snap != before
    tf_dir = os.path.join(snap, "tf")
    spans = sorted(
        spark.read.parquet(os.path.join(tf_dir, f))
        .selectExpr("min(term)", "max(term)")
        .first()
        for f in os.listdir(tf_dir)
        if f.endswith(".parquet")
    )
    assert len(spans) == 8
    assert all(
        prev_hi <= lo for (_, prev_hi), (lo, _) in zip(spans, spans[1:])
    )
    for f, ino in doclen_inodes.items():
        assert (
            os.stat(os.path.join(snap, "doclen", f)).st_ino == ino
        )  # carried through as links, not rewritten
    got = sorted(
        map(key, bm25_from_index(spark, idx, ["data", "the"], k=10).collect())
    )
    assert got == want


@pytest.mark.slow
def test_index_update_equals_rebuild_property(spark):
    """Hypothesis property: for ANY day-1 corpus and ANY day-2 delta
    (new docs + changed docs + deletes, in any mix hypothesis picks),
    update_text_index over the delta produces tf/doclen/stats contents
    IDENTICAL to a full rebuild of the final corpus — the delta path
    can never drift from the rebuild it stands in for, whichever
    physical path (append/merge) it routes to."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from inbev_data_engineering_case_spark.operators.relevance import (
        build_text_index,
        resolve_text_index,
        update_text_index,
    )

    words = st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=1,
        max_size=8,
    ).map(" ".join)

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        day1=st.lists(words, min_size=1, max_size=5),
        new=st.lists(words, min_size=0, max_size=3),
        data=st.data(),
    )
    def prop(day1, new, data):
        n1 = len(day1)
        changed_ids = data.draw(
            st.lists(
                st.integers(0, n1 - 1), unique=True, max_size=n1
            )
        )
        # delete from the unchanged day-1 ids; when none remain, a
        # not-in-corpus id exercises the delete-absent no-op instead
        deletable = sorted(set(range(n1)) - set(changed_ids))
        deleted_ids = data.draw(
            st.lists(st.sampled_from(deletable or [10**6]), unique=True)
        )
        d1 = spark.createDataFrame(
            list(enumerate(day1)), "doc_id long, text string"
        )
        changed = spark.createDataFrame(
            [(i, data.draw(words)) for i in changed_ids]
            + [(n1 + j, t) for j, t in enumerate(new)],
            "doc_id long, text string",
        ) if (changed_ids or new) else d1.limit(0)
        deleted = (
            spark.createDataFrame(
                [(i,) for i in deleted_ids], "doc_id long"
            )
            if deleted_ids
            else None
        )
        root = tempfile.mkdtemp(prefix="idxprop_")
        try:
            idx = f"{root}/idx"
            build_text_index(d1, idx)
            update_text_index(spark, idx, changed, deleted_ids=deleted)
            final = (
                d1.join(changed.select("doc_id"), "doc_id", "left_anti")
                .unionByName(changed)
            )
            if deleted is not None:
                final = final.join(deleted, "doc_id", "left_anti")
            rb = f"{root}/rebuild"
            build_text_index(final, rb)
            s_upd, s_rb = resolve_text_index(idx), resolve_text_index(rb)
            for table in ("tf", "doclen", "stats"):
                got = sorted(
                    map(tuple, spark.read.parquet(f"{s_upd}/{table}").collect())
                )
                want = sorted(
                    map(tuple, spark.read.parquet(f"{s_rb}/{table}").collect())
                )
                assert got == want, (table, got, want)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    prop()


def test_text_index_refuses_unindexable_documents(spark, tmp_path):
    """A NULL-text document produces no tf/doclen rows; silently
    excluding it would shift N (and every idf) away from the scan path
    and the shared oracle, so the build FAILS LOUDLY inside the stats
    job instead — nothing publishes, and the caller is told to filter.
    The delta updater enforces the same on its changed docs."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from inbev_data_engineering_case_spark.operators.relevance import (
        build_text_index,
        resolve_text_index,
        update_text_index,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, None)], "doc_id long, text string"
    )
    idx = str(tmp_path / "index")
    with _pytest.raises(Exception, match="produced no index rows"):
        build_text_index(docs, idx)
    with _pytest.raises(FileNotFoundError):
        resolve_text_index(idx)  # the torn build never published
    # a clean build, then a NULL-text delta: same loud refusal
    build_text_index(docs.filter("text is not null"), idx)
    good = resolve_text_index(idx)
    delta = spark.createDataFrame(
        [(2, None)], "doc_id long, text string"
    )
    with _pytest.raises((Exception, Py4JJavaError), match="produced no"):
        update_text_index(spark, idx, delta)
    assert resolve_text_index(idx) == good  # generation unchanged
    # duplicate ids get their OWN diagnosis (their term counts would
    # merge into one corrupted tf entry) — never blamed on NULL text
    dup = spark.createDataFrame(
        [(5, "alpha"), (5, "alpha")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="duplicate doc id"):
        build_text_index(dup, str(tmp_path / "dupidx"))
    with _pytest.raises((Exception, Py4JJavaError), match="duplicate doc id"):
        update_text_index(spark, idx, dup)
    assert resolve_text_index(idx) == good


def test_text_index_delta_update_two_day_loop(spark, tmp_path):
    """The daily-crawl index loop: day 2 publishes a NEW committed
    snapshot from DELTA-SIZED work — only the new docs tokenize, day
    1's tf/doclen part files ride into the new snapshot as HARD LINKS
    (inode identity: zero bytes rewritten), and stats recompute from
    the merged doclen partials. The updated index is query-identical
    to a full rebuild over day1+day2."""
    import os

    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        build_text_index,
        resolve_text_index,
        update_text_index,
    )

    day1 = spark.createDataFrame(
        [
            (0, "spark shuffles data across the cluster"),
            (1, "spark spark spark tuning"),
        ],
        "doc_id long, text string",
    )
    day2 = spark.createDataFrame(
        [(2, "a zebra walked into the cluster")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "index")
    build_text_index(day1, idx)
    snap1 = resolve_text_index(idx)
    inodes1 = {
        f: os.stat(os.path.join(snap1, "tf", f)).st_ino
        for f in os.listdir(os.path.join(snap1, "tf"))
        if not f.startswith(("_", "."))
    }
    audit = update_text_index(spark, idx, day2)
    assert audit["mode"] == "append"
    snap2 = resolve_text_index(idx)
    assert snap2 != snap1
    # delta-sized work, proven physically: every day-1 tf part file is
    # the SAME inode inside the new snapshot (hard link, not a copy)
    inodes2 = {
        f: os.stat(os.path.join(snap2, "tf", f)).st_ino
        for f in os.listdir(os.path.join(snap2, "tf"))
        if not f.startswith(("_", "."))
    }
    assert set(inodes1) <= set(inodes2)  # old files present + new delta files
    for f, ino in inodes1.items():
        assert inodes2[f] == ino
    # parity vs full rebuild: identical query answers and stats
    rebuild_dir = str(tmp_path / "rebuild")
    build_text_index(day1.unionByName(day2), rebuild_dir)
    key = lambda r: tuple(r)  # noqa: E731
    got = sorted(
        map(key, bm25_from_index(spark, idx, ["spark", "zebra"], k=4).collect())
    )
    want = sorted(
        map(
            key,
            bm25_from_index(
                spark, rebuild_dir, ["spark", "zebra"], k=4
            ).collect(),
        )
    )
    assert got == want and len(got) == 3
    stats_got = spark.read.parquet(f"{snap2}/stats").collect()
    stats_want = spark.read.parquet(
        f"{resolve_text_index(rebuild_dir)}/stats"
    ).collect()
    assert stats_got == stats_want


@pytest.mark.slow
def test_text_index_delta_update_merge_path_on_changed_doc(spark, tmp_path):
    """A CHANGED document routes to the merge path: its stale tf/doclen
    rows anti-join out, the re-tokenized rows union in, and the result
    is query- and stats-identical to a full rebuild of the final
    corpus. Deletes ride the same path."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        build_text_index,
        resolve_text_index,
        update_text_index,
    )

    v1 = spark.createDataFrame(
        [(0, "spark tuning"), (1, "zebra herd"), (2, "doomed doc")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "index")
    build_text_index(v1, idx)
    changed = spark.createDataFrame(
        [(0, "spark spark cluster")], "doc_id long, text string"
    )
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    audit = update_text_index(spark, idx, changed, deleted_ids=deleted)
    assert audit["mode"] == "merge"
    final = spark.createDataFrame(
        [(0, "spark spark cluster"), (1, "zebra herd")],
        "doc_id long, text string",
    )
    rebuild_dir = str(tmp_path / "rebuild")
    build_text_index(final, rebuild_dir)
    key = lambda r: tuple(r)  # noqa: E731
    got = sorted(
        map(key, bm25_from_index(spark, idx, ["spark", "zebra"], k=4).collect())
    )
    want = sorted(
        map(
            key,
            bm25_from_index(
                spark, rebuild_dir, ["spark", "zebra"], k=4
            ).collect(),
        )
    )
    assert got == want and len(got) == 2
    snap = resolve_text_index(idx)
    assert spark.read.parquet(f"{snap}/stats").collect() == (
        spark.read.parquet(
            f"{resolve_text_index(rebuild_dir)}/stats"
        ).collect()
    )
    assert audit["doclen_rows"] == 2  # doc 2 fully gone


def test_rrf_fuse_order_invariant_and_monotone(spark):
    """Fusion is invariant under list-order permutation (integer sums
    commute), and adding a list can only raise a document's score."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        rrf_fuse,
    )

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rnk long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rnk long")
    c = spark.createDataFrame([(1, 3)], "doc_id long, rnk long")
    key = lambda r: tuple(r)  # noqa: E731
    fwd = sorted(map(key, rrf_fuse([a, b, c]).collect()))
    rev = sorted(map(key, rrf_fuse([c, b, a]).collect()))
    assert fwd == rev
    two = {r["doc_id"]: r["rrf_micro"] for r in rrf_fuse([a, b]).collect()}
    three = {
        r["doc_id"]: r["rrf_micro"] for r in rrf_fuse([a, b, c]).collect()
    }
    assert all(three[d] >= s for d, s in two.items())
    assert three[1] > two[1]  # doc 1 gained from list c


def test_cap_per_source_keeps_best_and_presalt_is_identity(spark):
    """Domain caps: exactly max_docs survive per source, the survivors
    are the HIGHEST-quality ones with a deterministic boundary, and
    the presalt two-phase form (the hot-domain bound) returns the
    IDENTICAL result — phase one's per-salt-bucket cap is a proven
    superset of the winners."""
    from inbev_data_engineering_case_spark.operators.sample import (
        cap_per_source,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    kept = cap_per_source(docs, max_docs=5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    n_sources = docs.select("source").distinct().count()
    assert len(by_src) == n_sources
    assert all(len(v) == 5 for v in by_src.values())
    assert all(
        sorted(r["src_rank"] for r in v) == [1, 2, 3, 4, 5]
        for v in by_src.values()
    )
    # survivors really are the per-source top-5 by (quality desc, id)
    one_src = kept[0]["source"]
    from inbev_data_engineering_case_spark.operators.textops import (
        quality_score,
    )

    ranked = (
        docs.filter(F.col("source") == one_src)
        .select(
            "doc_id", F.round(quality_score("text"), 6).alias("q")
        )
        .collect()
    )
    want_ids = [
        r["doc_id"]
        for r in sorted(ranked, key=lambda r: (-r["q"], r["doc_id"]))[:5]
    ]
    got_ids = [
        r["doc_id"]
        for r in sorted(by_src[one_src], key=lambda r: r["src_rank"])
    ]
    assert got_ids == want_ids
    # presalt two-phase identity, across salt counts
    key = lambda r: tuple(r)  # noqa: E731
    direct = sorted(map(key, kept))
    for s in (1, 3, 16):
        assert (
            sorted(
                map(
                    key,
                    cap_per_source(docs, max_docs=5, presalt=s).collect(),
                )
            )
            == direct
        )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_docs"):
        cap_per_source(docs, max_docs=0)


def test_distribution_drift_flags_shift_and_zeroes_identity(spark):
    """Known answers: an identical sample pair gaps 0 ppm at every probe
    point; a +1 location shift of a uniform sample shows a large max
    gap (the KS signal); NULL values are excluded from numerator and
    denominator consistently; probe points are the reference quantiles
    in order."""
    from inbev_data_engineering_case_spark.operators.quality import (
        distribution_drift,
    )

    ref = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "value double"
    )
    same = distribution_drift(ref, ref, "value", n_cuts=7).collect()
    assert len(same) == 7
    assert all(r["gap_ppm"] == 0 for r in same)
    assert [r["cut_idx"] for r in same] == list(range(1, 8))
    assert all(
        a["cut_value"] < b["cut_value"] for a, b in zip(same, same[1:])
    )
    # ref CDF at the i/8 quantile probe is ~i/8 of the non-NULL rows
    assert same[3]["ref_cdf_ppm"] == 500_000  # median probe: 50/100

    shifted = spark.createDataFrame(
        [(float(i) + 50.0,) for i in range(100)], "value double"
    )
    drift = distribution_drift(ref, shifted, "value", n_cuts=7).collect()
    # at the ref median (49.5): ref CDF 0.5, shifted CDF 0 -> gap 500000
    assert max(r["gap_ppm"] for r in drift) == 500_000
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_cuts"):
        distribution_drift(ref, ref, "value", n_cuts=0)
    # an empty/all-NULL sample IS the drift event — fail loudly, never
    # report a NULL/zero gap that reads as "no drift"
    empty = spark.createDataFrame([(None,)], "value double")
    with _pytest.raises(Exception, match="no non-NULL values"):
        distribution_drift(ref, empty, "value", n_cuts=3).collect()
    with _pytest.raises(Exception, match="no non-NULL values"):
        distribution_drift(empty, ref, "value", n_cuts=3).collect()


def test_containment_pairs_catches_quote_inclusion_jaccard_misses(spark):
    """A 6-word fragment quoted inside a 40-word page: Jaccard ≈ 2/37
    (far below any near-dup threshold) but containment(fragment in
    page) = 1.0 — the directed pair surfaces, the reverse direction
    does not; near-identical docs pair BOTH ways; a doc below n words
    has no grams and never pairs; corpus-hot grams are excluded from
    numerator and denominator consistently."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        containment_pairs,
    )

    page_words = [f"w{i}" for i in range(40)]
    fragment = " ".join(page_words[10:16])  # 6 words inside the page
    docs = [
        (1, " ".join(page_words)),
        (2, fragment),
        (3, " ".join(page_words) + " tail"),  # near-identical to 1
        (4, "too few words"),  # < 5 words -> no grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["contained_id"], r["container_id"]): r
        for r in containment_pairs(
            df, n=5, threshold_ppm=800_000, max_gram_df=None
        ).collect()
    }
    # fragment (2 five-grams) fully contained in page 1 and in page 3
    assert out[(2, 1)]["containment_ppm"] == 1_000_000
    assert out[(2, 1)]["n_shared"] == 2 and out[(2, 1)]["n_grams"] == 2
    assert out[(2, 3)]["containment_ppm"] == 1_000_000
    # the page is NOT contained in the fragment (2/36 grams)
    assert (1, 2) not in out
    # near-identical pages pair in BOTH directions
    assert out[(1, 3)]["containment_ppm"] == 1_000_000  # 36/36
    assert out[(3, 1)]["containment_ppm"] >= 900_000  # 36/37
    # the short doc never appears on either side
    assert not any(4 in k for k in out)
    # hot-gram exclusion: with max_gram_df=1 every shared gram is hot
    # (df >= 2), so no pair survives — exclusion hits both sides
    assert (
        containment_pairs(df, n=5, threshold_ppm=1, max_gram_df=1).count()
        == 0
    )


def test_dedup_spans_drops_planted_boilerplate_and_preserves_case(spark):
    """A 4-token span shared verbatim by 5 docs (case differing — the
    match is case-folded) is dropped everywhere; unique spans keep
    their original case and order; an all-boilerplate doc rebuilds to
    ''; counts account for every span."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_spans,
    )

    boiler = "subscribe to our newsletter"
    docs = [(i, f"{boiler} Unique{i} content here now") for i in range(4)]
    docs.append((4, boiler.upper()))  # all-boilerplate, case differs
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup_spans(df, span_tokens=4, max_docs=3).collect()
    }
    assert len(out) == 5
    for i in range(4):
        assert out[i]["text_clean"] == f"Unique{i} content here now"
        assert (out[i]["n_spans"], out[i]["n_dropped"]) == (2, 1)
    assert out[4]["text_clean"] == ""
    assert (out[4]["n_spans"], out[4]["n_dropped"]) == (1, 1)
    # below the threshold nothing drops
    few = spark.createDataFrame(docs[:3], "doc_id long, text string")
    assert (
        dedup_spans(few, span_tokens=4, max_docs=3)
        .filter("n_dropped > 0")
        .count()
        == 0
    )


def test_dedup_spans_zero_length_token_array_cannot_step_negative(spark):
    """The span-index sequence is guarded: a 0-length token array must
    yield ZERO spans, matching the oracle twin's range(0). Unguarded,
    Spark's sequence(0, -1) auto-steps downward and fabricates two
    phantom spans — unreachable through tokens() today (split(trim(x))
    always yields >= 1 element) but pinned here at the expression level
    so the guard can't be dropped silently."""
    k = 4
    guarded = spark.sql(
        "SELECT case when size(_toks) >= 1 then "
        f"transform(sequence(0, cast(ceil(size(_toks) / {k}.0) as int) - 1), "
        "i -> i) else array() end AS spans "
        "FROM (SELECT cast(array() as array<string>) AS _toks)"
    ).collect()
    assert guarded[0]["spans"] == []
    # the failure mode the guard exists for, pinned: without it the
    # sequence steps DOWNWARD and fabricates phantom span indices
    unguarded = spark.sql(
        "SELECT sequence(0, cast(ceil(size(_toks) / 4.0) as int) - 1) AS s "
        "FROM (SELECT cast(array() as array<string>) AS _toks)"
    ).collect()
    assert unguarded[0]["s"] == [0, -1]
    # the normal path is unchanged: empty STRING text tokenizes to ['']
    # (one empty token -> one span), never to a 0-length array
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_spans,
    )

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    rows = dedup_spans(df, span_tokens=k, max_docs=3).collect()
    assert [(r["doc_id"], r["n_spans"]) for r in rows] == [(1, 1)]


def test_ann_index_duplicate_ids_fail_loudly(spark, tmp_path):
    """A duplicate vec_id in the corpus (or within a delta) would write
    duplicate cells/codes rows and surface as duplicated neighbor
    candidates in top-k — the ANN index must refuse it the way
    build_text_index refuses duplicate doc ids: an in-plan raise inside
    the build job, so staging never publishes. A delta id that matches
    a STORED id is the normal update case and must keep working."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        build_ann_index,
        resolve_ann_index,
        update_ann_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 100)
    idx = str(tmp_path / "annindex")

    dup_corpus = base.unionByName(base.filter(F.col("vec_id") == 7))
    with pytest.raises(Exception, match="duplicate vec_id"):
        build_ann_index(dup_corpus, idx, n_centroids=8, m=4, k=8)
    with pytest.raises(FileNotFoundError):
        resolve_ann_index(idx)  # the failed build published nothing

    build_ann_index(base, idx, n_centroids=8, m=4, k=8)
    delta = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 110)
    )
    with pytest.raises(Exception, match="duplicate vec_id"):
        update_ann_index(
            spark, idx, delta.unionByName(delta.limit(1))
        )
    # a changed id that exists in the store is an UPDATE, not a dup:
    changed = base.filter(F.col("vec_id") == 3).unionByName(delta)
    audit = update_ann_index(spark, idx, changed)
    assert audit["mode"] == "merge" and audit["cells_rows"] == 110


@pytest.mark.slow
def test_curate_capped_mode_identity_with_standalone_cap(spark):
    """curate_corpus(max_docs_per_source=) composes cap_per_source as
    the LAST stage: the composed kept set must be IDENTICAL to running
    standalone cap_per_source over the uncapped curation output
    (dedup-then-cap, so duplicates never consume quota slots), and the
    quality_col fast path (rank by the pipeline's one-pass score) must
    equal the recompute path."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )
    from inbev_data_engineering_case_spark.operators.sample import (
        cap_per_source,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")

    composed = curate_corpus(docs, max_docs_per_source=3)
    assert set(composed.columns) == {
        "doc_id", "text", "lang", "quality", "source"
    }
    uncapped = curate_corpus(docs, max_docs_per_source=None)
    # standalone cap over the (re-sourced) uncapped output — the
    # uncapped pipeline drops the source column, so join it back
    standalone_ids = sorted(
        r["doc_id"]
        for r in cap_per_source(
            uncapped.join(docs.select("doc_id", "source"), "doc_id"),
            max_docs=3,
        ).collect()
    )
    composed_ids = sorted(r["doc_id"] for r in composed.collect())
    assert composed_ids == standalone_ids and composed_ids

    # quality_col fast path == recompute path on the same frame
    sourced = uncapped.join(docs.select("doc_id", "source"), "doc_id")
    key = lambda r: tuple(r)  # noqa: E731
    fast = sorted(
        map(key, cap_per_source(sourced, max_docs=3,
                                quality_col="quality").collect())
    )
    slow = sorted(map(key, cap_per_source(sourced, max_docs=3).collect()))
    assert fast == slow

    # presalt forwards through the composition unchanged
    presalted = sorted(
        r["doc_id"]
        for r in curate_corpus(
            docs, max_docs_per_source=3, cap_presalt=4
        ).collect()
    )
    assert presalted == composed_ids

    # a capped source really is capped at 3
    per_src = composed.groupBy("source").count().collect()
    assert per_src and all(r["count"] <= 3 for r in per_src)


@pytest.mark.slow
def test_curate_token_budget_identity_with_standalone_selection(spark):
    """curate_corpus(token_budget=) composes select_within_budget as
    the stage after the per-source cap: the composed kept set must be
    IDENTICAL to running standalone select_within_budget (character
    cost, pipeline quality) over the unbudgeted curation output, the
    budget must bind (strictly fewer survivors than unbudgeted, total
    kept mass within budget), it must stack with the cap (quota first,
    then spend), and the split assigns on the budgeted set."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )
    from inbev_data_engineering_case_spark.operators.sample import (
        select_within_budget,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")

    unbudgeted = curate_corpus(docs)
    total = unbudgeted.agg(
        F.sum(F.length("text")).alias("t")
    ).first()["t"]
    budget = int(total) // 2

    composed = curate_corpus(docs, token_budget=budget)
    assert composed.columns == unbudgeted.columns
    composed_rows = composed.collect()
    composed_ids = sorted(r["doc_id"] for r in composed_rows)
    standalone_ids = sorted(
        r["doc_id"]
        for r in select_within_budget(
            unbudgeted.withColumn(
                "_tb_cost", F.length("text").cast("bigint")
            ),
            budget,
            cost_col="_tb_cost",
            quality_col="quality",
        ).collect()
    )
    assert composed_ids == standalone_ids and composed_ids
    # the budget binds and is respected
    assert len(composed_ids) < unbudgeted.count()
    assert sum(len(r["text"]) for r in composed_rows) <= budget

    # stacks with the cap: quota first, then spend — the budgeted
    # capped set is the standalone selection over the capped output
    capped = curate_corpus(docs, max_docs_per_source=3)
    both = sorted(
        r["doc_id"]
        for r in curate_corpus(
            docs, max_docs_per_source=3, token_budget=budget
        ).collect()
    )
    want_both = sorted(
        r["doc_id"]
        for r in select_within_budget(
            capped.withColumn(
                "_tb_cost", F.length("text").cast("bigint")
            ),
            budget,
            cost_col="_tb_cost",
            quality_col="quality",
        ).collect()
    )
    assert both == want_both
    # the cap's quota still holds inside the composed run
    assert set(both) <= {r["doc_id"] for r in capped.collect()}

    # split composes after the budget: same kept ids, split column on
    split_out = curate_corpus(
        docs,
        token_budget=budget,
        split_weights={"train": 0.9, "val": 0.1},
    )
    assert "split" in split_out.columns
    assert (
        sorted(r["doc_id"] for r in split_out.collect()) == composed_ids
    )

    # the DICT form spends per stratum, keyed by source (carried
    # through the scoring projection like the cap stage's): identical
    # to the standalone by-stratum selection over the unbudgeted
    # sourced output, and unbudgeted sources are excluded
    from inbev_data_engineering_case_spark.operators.sample import (
        select_within_budget_by_stratum,
    )

    srcs = sorted(
        r["source"] for r in docs.select("source").distinct().collect()
    )
    per_src = {srcs[0]: budget // 4, srcs[1]: budget // 8}
    strat_out = curate_corpus(docs, token_budget=per_src)
    assert "source" in strat_out.columns
    sourced = curate_corpus(docs, max_docs_per_source=10**9)  # carry source
    want_strat = sorted(
        r["doc_id"]
        for r in select_within_budget_by_stratum(
            sourced.withColumn(
                "_tb_cost", F.length("text").cast("bigint")
            ),
            "source",
            per_src,
            cost_col="_tb_cost",
            quality_col="quality",
        ).collect()
    )
    got_strat = sorted(r["doc_id"] for r in strat_out.collect())
    assert got_strat == want_strat and got_strat
    assert {r["source"] for r in strat_out.collect()} <= set(per_src)


@pytest.mark.slow
def test_curate_corpus_bloom_prefilter_identity(spark):
    """bloom_prefilter_bits routes the three id-keyed keep-joins (LM
    keep list, exact-dedup survivors, cap winners) through the
    Bloom-prefiltered exact semi join AND the near-dedup drop-join
    through the prefiltered anti join — the kept rows must be
    HASH-IDENTICAL to the plain pipeline at any bit count, including a
    deliberately tiny (high-fp) filter: false positives die in the
    exact join, false negatives cannot exist. 'auto' (the production
    setting) must also match — and at this scale must resolve to the
    PLAIN plan (keys broadcastable, fact under the amortization
    floor), so small runs never pay the bitmap build."""
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")

    def frame(bits):
        return curate_corpus(
            docs,
            min_avg_logprob=-12.0,  # exercises the LM keep-join too
            max_docs_per_source=3,  # and the cap winners join
            bloom_prefilter_bits=bits,
        )

    def snapshot(bits):
        return sorted(tuple(r) for r in frame(bits).collect())

    plain = snapshot(None)
    assert plain  # the fixture must keep something for this to mean much
    forced = frame(1 << 16)
    # forced bits engage the prefilter on keep AND drop joins
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "_bloom_" in plan
    assert sorted(tuple(r) for r in forced.collect()) == plain
    assert snapshot(64) == plain  # ~everything passes the filter: still exact

    auto = frame("auto")
    assert sorted(tuple(r) for r in auto.collect()) == plain
    # below the crossover the gate must resolve to the plain plan
    auto_plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_bloom_" not in auto_plan

    # any string that is not exactly 'auto' is a config error raised
    # at plan time, not a confusing type failure downstream
    import pytest

    with pytest.raises(ValueError, match="'Auto'"):
        frame("Auto")


def test_bow_classifier_learns_and_guards(spark):
    """Hashed-BOW classifier: on linearly separable text the model
    separates train docs perfectly AND generalizes to held-out docs of
    the same distributions; zero-token docs score bias-only; one-class
    training raises; a model without its special rows is refused."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        BIAS_BUCKET,
        score_bow_classifier,
        train_bow_classifier,
    )

    good = ["clear prose sentence with informative words here"]
    spam = ["buy buy cheap cheap click click now now win win"]
    rows = []
    for i in range(40):
        rows.append((i, f"{good[0]} variant{i % 7}", True))
        rows.append((100 + i, f"{spam[0]} variant{i % 7}", False))
    train = spark.createDataFrame(
        rows[: 60], "doc_id long, text string, label boolean"
    )
    heldout = spark.createDataFrame(
        rows[60:], "doc_id long, text string, label boolean"
    )
    model = train_bow_classifier(train, n_buckets=1 << 12)
    scored = score_bow_classifier(
        heldout.select("doc_id", "text"), model
    ).join(heldout.select("doc_id", "label"), "doc_id")
    got = scored.collect()
    assert got and all(
        (r["score_micro"] > 0) == r["label"] for r in got
    )

    # zero-token doc: bias-only score, n_tokens 0
    empty = spark.createDataFrame(
        [(999, "   ")], "doc_id long, text string"
    )
    bias = model.filter(F.col("bucket") == BIAS_BUCKET).first()[
        "weight_micro"
    ]
    row = score_bow_classifier(empty, model).first()
    assert row["n_tokens"] == 0 and row["score_micro"] == bias

    # one-class training refuses
    with pytest.raises(ValueError, match="non-empty"):
        train_bow_classifier(train.filter("label"))

    # a weights table without the special rows is not a model
    with pytest.raises(ValueError, match="special rows"):
        score_bow_classifier(
            empty, model.filter(F.col("bucket") >= 0)
        )


@pytest.mark.slow
def test_curate_incremental_classifier_gate(spark):
    """curate_incremental's learned quality gate scores only the
    DELTA's eligible docs against the stored model: the gated kept
    set is a subset of the ungated one, every gated survivor clears
    the threshold, and the gate demonstrably bites."""
    from inbev_data_engineering_case_spark.operators.classify import (
        score_bow_classifier,
        train_bow_classifier,
    )
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    model = train_bow_classifier(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", (F.col("lang") == "en").alias("label")),
        n_buckets=1 << 14,
    )
    old = docs.filter(F.col("doc_id") < 100)
    new = old.unionByName(
        docs.filter(F.col("doc_id") >= 100).select(
            (F.col("doc_id") + 700000).alias("doc_id"), "text"
        )
    )
    sigs = minhash_signatures(old, "text", "doc_id")
    fps = exact_dedup(old, "text", "doc_id")
    thresh = -8_000_000

    plain = {
        r["doc_id"]
        for r in curate_incremental(old, new, sigs, fps).collect()
    }
    gated = {
        r["doc_id"]
        for r in curate_incremental(
            old, new, sigs, fps,
            classifier_model=model, min_score_micro=thresh,
        ).collect()
    }
    assert gated and gated < plain  # bites, and strictly a subset
    kept_scores = {
        r["doc_id"]: r["score_micro"]
        for r in score_bow_classifier(
            new.join(
                spark.createDataFrame(
                    [(i,) for i in gated], "doc_id long"
                ),
                "doc_id",
                "left_semi",
            ),
            model,
        ).collect()
    }
    assert all(s >= thresh for s in kept_scores.values())


def test_bow_classifier_incremental_counts_parity(spark):
    """The classifier's sufficient statistics are ADDITIVE: training
    counts on a delta alone and merging into stored counts derives a
    model BYTE-IDENTICAL to retraining on the full union — the
    incremental-artifact discipline (signature/gram tables) applied to
    the model, history never re-tokenized. Merging two different
    hash-space sizes is refused via the META row."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        bow_weights_from_counts,
        merge_bow_counts,
        train_bow_classifier,
        train_bow_counts,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id", "text", (F.col("lang") == "en").alias("label")
    )
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    day2 = docs.filter(F.col("doc_id") % 3 == 0)

    full = train_bow_classifier(day1.unionByName(day2), n_buckets=1 << 12)
    merged = merge_bow_counts(
        train_bow_counts(day1, n_buckets=1 << 12),
        train_bow_counts(day2, n_buckets=1 << 12),
    )
    inc = bow_weights_from_counts(merged)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )

    # mismatched hash spaces: the META rows disagree -> loud refusal
    bad = merge_bow_counts(
        train_bow_counts(day1, n_buckets=1 << 12),
        train_bow_counts(day2, n_buckets=1 << 13),
    )
    with pytest.raises(ValueError, match="META"):
        bow_weights_from_counts(bad)


def test_curate_corpus_split_from_same_components_pass(spark):
    """curate_corpus(split_weights=...) emits the leakage-safe split
    column from the SAME connected-components pass the drop list came
    from: row-identical to the standalone leakage_safe_split over the
    kept corpus + the pipeline's own pair table, with exactly ONE
    dedup_components invocation in the composed run (the standalone
    chain pays a second)."""
    from inbev_data_engineering_case_spark.operators import (
        curate as curate_mod,
    )
    from inbev_data_engineering_case_spark.operators.curate import (
        _dedup_chain,
        curate_corpus,
        leakage_safe_split,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from inbev_data_engineering_case_spark.operators.textops import (
        score_documents,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # append near-dup variants so clusters actually exist
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat("text", F.lit(" the end")).alias("text"),
        )
    )
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}

    calls = []
    real = curate_mod.dedup_components

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    curate_mod.dedup_components = counting
    try:
        composed = curate_corpus(corpus, split_weights=weights)
        rows = sorted(tuple(r) for r in composed.collect())
    finally:
        curate_mod.dedup_components = real
    assert calls == [1]  # ONE components pass for drop list AND split
    assert {r[-1] for r in rows} <= set(weights)
    assert len({r[-1] for r in rows}) > 1  # a real partition, not 1 split

    # standalone parity: the same kept corpus + the pipeline's own
    # pair table through leakage_safe_split must assign identically
    scored = score_documents(corpus, "text", "doc_id")
    eligible = scored.filter(
        F.col("lang").isin("en") & (F.col("quality") >= 0.3)
    ).localCheckpoint()
    after_exact, final, _, _ = _dedup_chain(
        eligible, "text", "doc_id", 0.5, "local"
    )
    pairs = minhash_dedup_pairs(after_exact, "text", "doc_id", threshold=0.5)
    standalone = leakage_safe_split(final, pairs, weights=weights)
    want = sorted(tuple(r) for r in standalone.collect())
    assert rows == want


@pytest.mark.slow
def test_curate_split_loose_threshold_guards_subdedup_leaks(spark):
    """split_threshold < near_dup_threshold: pairs generate once at
    the looser threshold, dedup uses the tight subset, and kept
    documents similar enough to LEAK but not to dedup (est_jaccard in
    [split_t, dedup_t)) are guaranteed ONE split — demonstrably
    load-bearing: the plain per-id hash split straddles such a pair
    under some salt while the loose keying never does, at any salt.
    Parity with standalone leakage_safe_split over the loose pair
    graph; invalid thresholds refused."""
    import pytest

    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
        hash_split,
        leakage_safe_split,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat("text", F.lit(" the end")).alias("text"),
        )
    )
    weights = {"train": 0.5, "test": 0.5}

    kept_plain = curate_corpus(corpus)
    # the pipeline's loose graph spans its post-exact-dedup ELIGIBLE
    # frame (lang/quality-filtered, exact-deduped) — replicate that
    # frame so the standalone comparison closes the same graph
    from inbev_data_engineering_case_spark.operators.curate import (
        _dedup_chain,
    )
    from inbev_data_engineering_case_spark.operators.textops import (
        score_documents,
    )

    eligible = (
        score_documents(corpus, "text", "doc_id")
        .filter(F.col("lang").isin("en") & (F.col("quality") >= 0.3))
        .localCheckpoint()
    )
    after_exact, _, _, _ = _dedup_chain(
        eligible, "text", "doc_id", 0.5, "local"
    )
    pairs_loose = minhash_dedup_pairs(after_exact, threshold=0.25)
    kept_ids = {r["doc_id"] for r in kept_plain.select("doc_id").collect()}
    kk_loose = [
        (p["id_a"], p["id_b"])
        for p in pairs_loose.filter(
            F.col("est_jaccard") < 0.5
        ).collect()
        if p["id_a"] in kept_ids and p["id_b"] in kept_ids
    ]
    assert kk_loose  # the sub-dedup leak case exists in this fixture

    # find a salt where the PLAIN per-id split straddles a loose pair
    # (guaranteed findable: keys differ, 50/50 weights), then show the
    # loose keying never straddles under that same salt
    straddle_salt = None
    plain_assign = {}
    for cand in ("s0", "s1", "s2", "s3", "s4", "s5", "s6", "s7"):
        assign = {
            r["doc_id"]: r["split"]
            for r in hash_split(
                kept_plain.select("doc_id"), weights=weights,
                id_col="doc_id", salt=cand,
            ).collect()
        }
        if any(assign[a] != assign[b] for a, b in kk_loose):
            straddle_salt, plain_assign = cand, assign
            break
    assert straddle_salt is not None

    composed = curate_corpus(
        corpus, split_weights=weights, split_salt=straddle_salt,
        split_threshold=0.25,
    )
    got = {r["doc_id"]: r["split"] for r in composed.collect()}
    assert set(got) == kept_ids  # same kept set; split never drops rows
    assert all(got[a] == got[b] for a, b in kk_loose)  # no straddle
    assert plain_assign != got  # and it genuinely changed assignments

    # parity: standalone leakage_safe_split over the SAME loose graph
    want = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            kept_plain, pairs_loose, weights=weights,
            salt=straddle_salt,
        ).collect()
    }
    assert got == want

    # guards
    with pytest.raises(ValueError, match="split_weights"):
        curate_corpus(corpus, split_threshold=0.25).collect()
    with pytest.raises(ValueError, match="near_dup_threshold"):
        curate_corpus(
            corpus, split_weights=weights, split_threshold=0.9
        ).collect()


def test_auto_bloom_bits_gates(spark):
    """auto_bloom_bits: None when keys broadcast or the fact is under
    the amortization floor; a clamped power-of-two sized from the key
    estimate when both gates clear. Pure plan introspection — and the
    enabled path keeps join identity."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators import joins

    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).select("l_orderkey", "l_quantity")
    keys = li.select("l_orderkey").filter(F.col("l_orderkey") % 5 == 0)

    # tiny keys: broadcastable -> plain join regardless of fact size
    assert joins.auto_bloom_bits(li, keys) is None
    assert joins.auto_bloom_bits(li, keys, min_fact_bytes=0) is None

    # unreadable plan stats (Spark Connect / JVM API drift): the gate
    # must fall back to the PLAIN join, never to a max-size prefilter
    real_size = joins._plan_size_bytes
    joins._plan_size_bytes = lambda df: None
    try:
        assert joins.auto_bloom_bits(li, keys, min_fact_bytes=0) is None
    finally:
        joins._plan_size_bytes = real_size

    # force both gates open: keys "too big" (threshold 0 disables the
    # broadcast gate) and no fact floor -> a sized, clamped bit count
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bits = joins.auto_bloom_bits(li, keys, min_fact_bytes=0)
        assert bits is not None and bits & (bits - 1) == 0
        assert 1 << 20 <= bits <= joins._PROBE_MAX_BITS
        # identity on the enabled path (both directions)
        want_semi = sorted(
            r[0] for r in li.join(keys, "l_orderkey", "left_semi")
            .select("l_orderkey").collect()
        )
        got_semi = sorted(
            r[0] for r in joins.bloom_semi_join(
                li, keys, "l_orderkey", num_bits=bits
            ).select("l_orderkey").collect()
        )
        assert got_semi == want_semi
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.slow
def test_curate_incremental_bloom_drop_identity(spark):
    """curate_incremental's final near-dup drop join accepts the same
    prefilter family: forced bits must be row-identical to the plain
    pipeline (the q_curate_bloom discipline, delta form)."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 200)
    new = old.unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
    )
    sigs = minhash_signatures(old, "text", "doc_id")
    fps = exact_dedup(old, "text", "doc_id")

    def run(bits):
        return sorted(
            tuple(r)
            for r in curate_incremental(
                old, new, sigs, fps, bloom_prefilter_bits=bits
            ).collect()
        )

    plain = run(None)
    assert plain
    assert run(1 << 16) == plain
    assert run("auto") == plain


def test_containment_portable_false_same_pairs(spark):
    """portable=False swaps the oracle-replayable md5 gram hash for
    xxhash64 — the decontaminate family's production setting. The
    emitted pairs must be IDENTICAL (any 60-bit fingerprint space
    yields the same set semantics), in both the full-batch and the
    delta form, with the hash kind riding the stored state."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_gram_table,
        containment_pairs,
        incremental_containment_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
    )
    new = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.substring("text", 1, 120).alias("text"),
    )
    kw = dict(n=4, threshold_ppm=500_000, max_gram_df=50)
    corpus = docs.unionByName(new)
    md5_pairs = sorted(
        map(tuple, containment_pairs(corpus, **kw).collect())
    )
    xx_pairs = sorted(
        map(
            tuple,
            containment_pairs(corpus, portable=False, **kw).collect(),
        )
    )
    assert md5_pairs == xx_pairs and md5_pairs

    inc_md5 = sorted(map(tuple, incremental_containment_pairs(
        build_gram_table(docs, n=4), new, **kw).collect()))
    inc_xx = sorted(map(tuple, incremental_containment_pairs(
        build_gram_table(docs, n=4, portable=False), new,
        portable=False, **kw).collect()))
    assert inc_md5 == inc_xx


def test_incremental_containment_full_batch_parity(spark):
    """incremental_containment_pairs(stored gram table, new crawl) must
    return EXACTLY the containment_pairs(stored ∪ new) rows involving a
    new document — including when a gram crosses the hot cap only once
    the delta lands (the combined-df semantics: that gram must leave
    numerator AND denominator of every pair, stored-side denominators
    included)."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_gram_table,
        containment_pairs,
        incremental_containment_pairs,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").filter(F.col("doc_id") < 120)
    # new crawl: 40%-prefix fragments of every 10th doc (true
    # containment hits) plus docs that repeat one planted sentence so
    # its grams cross max_gram_df only with the delta counted
    from inbev_data_engineering_case_spark.functions import tokens

    frag = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.array_join(
                F.expr(
                    "slice(_toks, 1, greatest((size(_toks) * 2) div 5, 6))"
                ),
                " ",
            ).alias("text"),
        )
    )
    planted = spark.range(600000, 600030).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the planted template sentence appears verbatim here "),
            F.lit("plus tail "), F.col("id").cast("string"),
        ).alias("text"),
    )
    new = frag.unionByName(planted)
    kw = dict(n=3, threshold_ppm=300_000, max_gram_df=20)
    full = containment_pairs(docs.unionByName(new), **kw)
    want = sorted(
        map(
            tuple,
            full.filter(
                (F.col("contained_id") >= 500000)
                | (F.col("container_id") >= 500000)
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            incremental_containment_pairs(
                build_gram_table(docs, n=3), new, **kw
            ).collect(),
        )
    )
    assert got == want and got
    # the planted sentence must pair the planted docs with each other
    # BELOW the cap and stop once combined df crosses it — sanity that
    # the fixture exercised the hot-cap path at all:
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_gram_table as _bgt,
    )

    hot_df = (
        _bgt(docs.unionByName(new), n=3)
        .groupBy("gram_h").count().filter(F.col("count") > 20).count()
    )
    assert hot_df > 0  # the cap was load-bearing in this parity run


def test_distribution_drift_approx_cuts_within_gk_rank_error(spark):
    """Hypothesis property for the 100 TB mode: every approx=True probe
    boundary must satisfy the Greenwald-Khanna guarantee against the
    reference sample — the returned cut is SOME order statistic whose
    rank lies within N/accuracy (accuracy=10000; +1 for the ceiling)
    of the target rank q*N. Tie-safe formulation: with duplicates the
    cut's admissible rank range is [count(x < cut) + 1, count(x <=
    cut)], which must intersect [qN - eps, qN + eps]. This is the
    q_approx_percentiles discipline applied to the drift operator's
    own bounds (the array-form approx_percentile path)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from inbev_data_engineering_case_spark.operators.quality import (
        distribution_drift,
    )

    n_cuts = 5
    qs = [i / (n_cuts + 1) for i in range(1, n_cuts + 1)]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        values=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=12,
            max_size=120,
        )
    )
    def prop(values):
        ref = spark.createDataFrame(
            [(float(v),) for v in values], "value double"
        )
        rows = sorted(
            distribution_drift(ref, ref, "value", n_cuts=n_cuts,
                               approx=True).collect(),
            key=lambda r: r["cut_idx"],
        )
        ordered = sorted(values)
        n = len(ordered)
        eps = n / 10000 + 1  # GK bound at accuracy=10000 + ceiling slack
        for r, q in zip(rows, qs):
            cut = r["cut_value"]
            lo_rank = sum(1 for v in ordered if v < cut) + 1
            hi_rank = sum(1 for v in ordered if v <= cut)
            target = q * n
            assert lo_rank <= target + eps and hi_rank >= target - eps, (
                q, cut, lo_rank, hi_rank, target, n
            )
            # identical samples: the drift gap must be exactly zero
            assert r["gap_ppm"] == 0

    prop()


@pytest.mark.slow
def test_incremental_embedding_near_dup_full_batch_parity(spark):
    """incremental_embedding_near_dup(stored sig table, new vectors)
    must return EXACTLY the embedding_near_dup_pairs(stored ∪ new)
    rows involving a new vector — including when a bucket crosses the
    hot cap only once the delta lands (combined-population guard and
    combined min-id star representative), and under multi-probe."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_table,
        embedding_near_dup_pairs,
        incremental_embedding_near_dup,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    stored = emb.filter(F.col("vec_id") < 80)
    # new crawl: perturbed copies of some stored vectors (near-dup
    # hits) plus EXACT copies of vector 3 to flood one bucket past a
    # tiny hot cap only when the delta is counted
    near = stored.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1) + F.lit(0.001) * ((i % 3) - 1)),
        ).alias("embedding"),
    )
    flood_src = stored.filter(F.col("vec_id") == 3).select("embedding")
    flood = spark.range(200000, 200012).join(
        F.broadcast(flood_src)
    ).select(F.col("id").alias("vec_id"), "embedding")
    new = near.unionByName(flood)

    for kw in (
        dict(threshold=0.9, num_planes=8, n_probes=1, max_bucket_size=10),
        dict(threshold=0.9, num_planes=6, n_probes=2, max_bucket_size=10),
        dict(threshold=0.9, num_planes=8, n_probes=1,
             max_bucket_size=None),
    ):
        full = embedding_near_dup_pairs(stored.unionByName(new), **kw)
        want = sorted(
            map(
                tuple,
                full.filter(
                    (F.col("id_a") >= 100000) | (F.col("id_b") >= 100000)
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                incremental_embedding_near_dup(
                    build_embedding_sig_table(
                        stored,
                        num_planes=kw["num_planes"],
                        n_probes=kw["n_probes"],
                    ),
                    new,
                    **kw,
                ).collect(),
            )
        )
        assert got == want and got, kw


def test_embedding_sig_table_normalized_storage_parity(spark):
    """The multi-probe storage split: build_embedding_sig_tables_
    normalized + join_embedding_sig_tables must reassemble EXACTLY the
    denormalized build_embedding_sig_table rows at n_probes>1, and the
    incremental path must return identical pairs when fed the
    reassembled form — normalization is a storage choice, not a
    semantics change."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_table,
        build_embedding_sig_tables_normalized,
        incremental_embedding_near_dup,
        join_embedding_sig_tables,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    stored = emb.filter(F.col("vec_id") < 80)
    new = stored.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1) + F.lit(0.001) * ((i % 3) - 1)),
        ).alias("embedding"),
    )

    denorm = build_embedding_sig_table(stored, num_planes=6, n_probes=3)
    vectors, buckets = build_embedding_sig_tables_normalized(
        stored, num_planes=6, n_probes=3
    )
    joined = join_embedding_sig_tables(vectors, buckets)
    assert joined.columns == denorm.columns
    key = lambda r: (r["seed"], r["id"])  # noqa: E731
    assert sorted(map(tuple, joined.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, denorm.collect()), key=lambda t: t[:2])
    # each embedding is stored once; each probe contributes one bucket row
    assert vectors.count() == stored.count()
    assert buckets.count() == 3 * stored.count()
    assert "v" not in buckets.columns and "bucket" not in vectors.columns

    kw = dict(threshold=0.9, num_planes=6, n_probes=3, max_bucket_size=10)
    want = sorted(map(tuple, incremental_embedding_near_dup(
        denorm, new, **kw).collect()))
    got = sorted(map(tuple, incremental_embedding_near_dup(
        joined, new, **kw).collect()))
    assert got == want and got


def test_incremental_simhash_full_batch_parity(spark):
    """incremental_simhash_near_pairs(stored sig table, new crawl)
    must return EXACTLY the simhash_near_pairs(stored ∪ new) rows
    involving a new document — including when identical templates
    flood one bucket past the hot cap only once the delta lands
    (combined-population guard + combined min-id star
    representative)."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_simhash_table,
        incremental_simhash_near_pairs,
        simhash_near_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
    )
    near = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" the end")).alias("text"),
    )
    # identical templates: same text → same signature → one bucket
    flood = spark.range(300000, 300015).select(
        F.col("id").alias("doc_id"),
        F.lit("the very same template text repeated verbatim").alias(
            "text"
        ),
    )
    new = near.unionByName(flood)
    for kw in (
        dict(max_hamming=6, bits=60, bucket_bits=8, max_bucket_size=8),
        dict(max_hamming=6, bits=60, bucket_bits=8, max_bucket_size=None),
        dict(max_hamming=3, bits=48, bucket_bits=6, max_bucket_size=8),
    ):
        build_kw = dict(bits=kw["bits"], bucket_bits=kw["bucket_bits"])
        full = simhash_near_pairs(docs.unionByName(new), **kw)
        want = sorted(
            map(
                tuple,
                full.filter(
                    (F.col("id_a") >= 200000) | (F.col("id_b") >= 200000)
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                incremental_simhash_near_pairs(
                    build_simhash_table(docs, **build_kw), new, **kw
                ).collect(),
            )
        )
        assert got == want and got, kw


def test_incremental_state_geometry_guards_raise_in_plan(spark):
    """The r8 stored-state tables carry their build geometry, and each
    incremental twin raises IN-PLAN on a mismatch instead of silently
    mixing n-gram spaces (wrong containment values) or shifting every
    bucket (lost recall) — the CMS wrong-geometry discipline applied
    to the delta paths."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_table,
        build_gram_table,
        build_simhash_table,
        incremental_containment_pairs,
        incremental_embedding_near_dup,
        incremental_simhash_near_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 30)
    )
    new_docs = docs.select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    with pytest.raises(Exception, match="geometry mismatch"):
        incremental_containment_pairs(
            build_gram_table(docs, n=5), new_docs, n=3
        ).collect()
    # the gram HASH KIND is geometry too: a delta hashed with the
    # other function would match nothing, silently — so it raises
    with pytest.raises(Exception, match="geometry mismatch"):
        incremental_containment_pairs(
            build_gram_table(docs, n=5, portable=True),
            new_docs,
            n=5,
            portable=False,
        ).collect()
    with pytest.raises(Exception, match="geometry mismatch"):
        incremental_simhash_near_pairs(
            build_simhash_table(docs, bits=60, bucket_bits=8),
            new_docs,
            bits=48,
            bucket_bits=6,
        ).collect()
    # a pre-geometry (or plain-wrong) state table fails FAST at plan
    # time with an actionable message, not an unresolved-column error
    with pytest.raises(ValueError, match="lacks geometry column"):
        incremental_containment_pairs(
            build_gram_table(docs, n=5).select("doc_id", "gram_h"),
            new_docs,
            n=5,
        )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).filter(F.col("vec_id") < 30)
    new_emb = emb.select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )
    with pytest.raises(Exception, match="geometry mismatch"):
        incremental_embedding_near_dup(
            build_embedding_sig_table(emb, num_planes=8, n_probes=1),
            new_emb,
            num_planes=6,
            n_probes=1,
        ).collect()


@pytest.mark.slow
def test_incremental_embedding_normalized_native_parity(spark):
    """incremental_embedding_near_dup_normalized consumes the
    (vectors, buckets) pair directly — no reassembly join, vectors
    joining only for candidates — and must return EXACTLY the
    denormalized path's pairs at n_probes>1, including when identical
    vectors flood one bucket past the hot cap (combined-population
    guard + min-id star representative, id-only until the deferred
    vector join)."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_table,
        build_embedding_sig_tables_normalized,
        incremental_embedding_near_dup,
        incremental_embedding_near_dup_normalized,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    base = emb.filter(F.col("vec_id") < 80)
    # identical vectors flood one bucket in every probe -> hot path
    template = emb.filter(F.col("vec_id") == 3).select("embedding")
    flood = (
        spark.range(300000, 300020)
        .crossJoin(template)
        .select(F.col("id").alias("vec_id"), "embedding")
    )
    stored = base.unionByName(flood)
    new = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1) + F.lit(0.001) * ((i % 3) - 1)),
        ).alias("embedding"),
    ).unionByName(
        # new members of the flooded bucket too (delta touches hot)
        spark.range(400000, 400005)
        .crossJoin(template)
        .select(F.col("id").alias("vec_id"), "embedding")
    )

    kw = dict(threshold=0.9, num_planes=6, n_probes=3, max_bucket_size=10)
    denorm = build_embedding_sig_table(stored, num_planes=6, n_probes=3)
    vectors, buckets = build_embedding_sig_tables_normalized(
        stored, num_planes=6, n_probes=3
    )
    want = sorted(map(tuple, incremental_embedding_near_dup(
        denorm, new, **kw).collect()))
    got = sorted(map(tuple, incremental_embedding_near_dup_normalized(
        vectors, buckets, new, **kw).collect()))
    assert got == want and got
    # no-hot-guard form agrees too (the cold-only plan)
    kw2 = dict(threshold=0.9, num_planes=6, n_probes=3,
               max_bucket_size=None)
    want2 = sorted(map(tuple, incremental_embedding_near_dup(
        denorm, new, **kw2).collect()))
    got2 = sorted(map(tuple, incremental_embedding_near_dup_normalized(
        vectors, buckets, new, **kw2).collect()))
    assert got2 == want2 and got2
    # geometry mismatch raises in-plan, same as the denormalized twin
    import pytest

    with pytest.raises(Exception, match="num_planes"):
        incremental_embedding_near_dup_normalized(
            vectors, buckets, new, threshold=0.9, num_planes=8,
            n_probes=3,
        ).collect()


def _cmyk_gradient(h, w):
    """Smooth stored-sample (Adobe-inverted) CMYK raster."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            255 - xx * 255 // max(w - 1, 1),
            255 - yy * 255 // max(h - 1, 1),
            255 - (xx + yy) * 128 // max(w + h - 2, 1),
            200 + yy * 55 // max(h - 1, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_cmyk_and_ycck_roundtrip():
    """4-component JPEG decodes natively: a CMYK stream (Adobe APP14
    transform 0) round-trips to the stored samples within quantization
    tolerance, the YCCK form (transform 2) of the SAME raster decodes
    to nearly the same samples (the color transform is the encoder's
    internal affair), and the RGB composite helper renders it."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_cmyk_to_rgb,
        _jpeg_decode,
        _jpeg_encode_cmyk,
    )

    img = _cmyk_gradient(37, 29)  # non-multiple-of-8 dims
    for transform in (0, 2):
        out = _jpeg_decode(_jpeg_encode_cmyk(img, 95, transform))
        assert out.shape == img.shape == (37, 29, 4)
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.max() <= 12 and diff.mean() < 2.5, (
            transform, diff.max(), diff.mean(),
        )
    rgb = _jpeg_cmyk_to_rgb(out)
    assert rgb.shape == (37, 29, 3) and rgb.dtype == np.uint8


def test_jpeg_cmyk_featurizes_and_reason_report_flips(spark):
    """End to end: a CMYK asset lands decode_ok with 32-bit depth (4
    channels × 8) through decode_features — the r10 flip of the
    '4-component JPEG' decoder_gap line — and resize_assets composites
    it to RGB rather than refusing."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_encode_cmyk,
        decode_features,
    )

    payload = _jpeg_encode_cmyk(_cmyk_gradient(24, 16), 90, 2)
    assets = spark.createDataFrame(
        [(1, "image/jpeg", payload, {"n_bytes": len(payload), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    row = decode_features(assets, real_decoder=True).collect()[0]
    assert row["decode_ok"] and row["reason"] is None
    assert row["feature"][:3] == [16.0, 24.0, 32.0]


def test_jpeg_dnl_deferred_height_decodes():
    """A DNL-deferred stream (SOF height 0; the true line count in the
    0xFFDC segment closing the first scan, per T.81 B.2.5) decodes
    bit-identically to its plain twin — including with restart markers
    in the entropy data (the marker-aware DNL scan must not trip on
    RSTn or stuffed 0xFF00 bytes) — and a height-0 stream WITHOUT a
    DNL is corrupt, not a gap."""
    import struct

    import numpy as np
    import pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode_baseline,
    )

    img = _jpeg_gradient(21, 33)
    for ri in (0, 3):
        plain = _jpeg_encode_baseline(img, quality=90, restart_interval=ri)
        want = _jpeg_decode(plain)
        # defer the height: zero the SOF field, append DNL before EOI
        sof_at = plain.index(b"\xff\xc0")
        patched = bytearray(plain)
        struct.pack_into(">H", patched, sof_at + 5, 0)
        assert patched.endswith(b"\xff\xd9")
        dnl = b"\xff\xdc\x00\x04" + struct.pack(">H", 21)
        payload = bytes(patched[:-2]) + dnl + b"\xff\xd9"
        got = _jpeg_decode(payload)
        assert np.array_equal(got, want), ri
        # T.81 B.1.1.2 fill bytes may pad ANY marker: an odd run of
        # 0xFF before the DNL must not desync the marker-aware scan
        filled = bytes(patched[:-2]) + b"\xff" + dnl + b"\xff\xd9"
        assert np.array_equal(_jpeg_decode(filled), want), ri

    with pytest.raises(ValueError, match="DNL"):
        _jpeg_decode(bytes(patched))  # height 0, no DNL segment
    with pytest.raises(ValueError, match="DNL"):
        # NL=0 is illegal (valid range 1-65535): corrupt, never a
        # decode_ok zero-pixel raster
        zero_dnl = b"\xff\xdc\x00\x04" + struct.pack(">H", 0)
        _jpeg_decode(bytes(patched[:-2]) + zero_dnl + b"\xff\xd9")


def test_avi_mjpeg_native_video_decode():
    """Motion-JPEG AVI — the first COMPRESSED video format whose
    content decodes natively: demux finds every '00dc' JPEG frame,
    the featurizer reports the Y4M contract [w, h, n_frames, mean
    luma] with a checksum over the bit-exact decoded rasters, a frame
    stripped of its DHT segments still decodes (the MJPEG implied
    Annex-K default-table convention), and a non-MJPEG AVI raises the
    capability NotImplementedError rather than decoding garbage."""
    import numpy as np
    import pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        _featurize_avi_mjpeg,
        _jpeg_decode,
        _parse_avi_mjpeg,
    )

    f0 = _jpeg_gradient(24, 32)
    f1 = np.roll(f0, 5, axis=1)
    f2 = np.roll(f0, 11, axis=0)
    payload = _avi_encode_mjpeg([f0, f1, f2], quality=92, fps=8)

    w, h, fps, frames, n_streams = _parse_avi_mjpeg(payload)
    assert (w, h, len(frames), n_streams) == (32, 24, 3, 1)
    assert abs(fps - 8.0) < 1e-6
    assert all(fr[:2] == b"\xff\xd8" for fr in frames)

    checksum, feats = _featurize_avi_mjpeg(payload)
    assert feats[:3] == [32.0, 24.0, 3.0]
    assert 0.0 < feats[3] < 255.0

    # MJPEG convention: strip DHT (0xFFC4) segments from a frame —
    # the implied Annex-K tables must decode it IDENTICALLY to the
    # tables the encoder actually wrote (they are the same tables)
    import struct as _struct

    def strip_dht(jpeg: bytes) -> bytes:
        out, pos = bytearray(jpeg[:2]), 2
        while pos + 4 <= len(jpeg):
            if jpeg[pos] != 0xFF:
                out += jpeg[pos:]
                break
            marker = jpeg[pos + 1]
            if marker == 0xDA:
                out += jpeg[pos:]
                break
            seglen = _struct.unpack_from(">H", jpeg, pos + 2)[0]
            if marker != 0xC4:
                out += jpeg[pos : pos + 2 + seglen]
            pos += 2 + seglen
        return bytes(out)

    bare = strip_dht(frames[0])
    assert b"\xff\xc4" not in bare[: bare.index(b"\xff\xda")]
    with pytest.raises(ValueError):
        _jpeg_decode(bare)  # a PLAIN jpeg without DHT is corrupt
    assert np.array_equal(
        _jpeg_decode(bare, mjpeg_default_huff=True),
        _jpeg_decode(frames[0]),
    )

    # foreign codec: honest capability gap, not garbage — including
    # field-interlaced MJPA, whose chunks are half-height field pairs
    for fourcc in (b"XVID", b"MJPA"):
        foreign = payload.replace(b"vidsMJPG", b"vids" + fourcc, 1)
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            _parse_avi_mjpeg(foreign)

    # avih dims are ADVISORY (capture muxers write 0) — the JPEG SOF
    # dims are authoritative for featurization
    import struct as _st

    zeroed = bytearray(payload)
    at = payload.index(b"avih") + 8
    _st.pack_into("<II", zeroed, at + 32, 0, 0)
    checksum0, feats0 = _featurize_avi_mjpeg(bytes(zeroed))
    assert feats0 == feats and checksum0 == checksum


def test_avi_mjpeg_cmyk_frame_luma_composites():
    """A 4-channel (Adobe CMYK) MJPEG frame is stored-inverted ink —
    the featurizer must composite through _jpeg_cmyk_to_rgb before the
    BT.601 luma, not weight the C/M/Y planes as if they were RGB."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators import multimodal
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        _featurize_avi_mjpeg,
        _jpeg_cmyk_to_rgb,
        _jpeg_decode,
        _jpeg_encode_cmyk,
    )

    # K=128 makes composite != stored C/M/Y planes, so the two luma
    # formulas disagree by a wide margin
    cmyk = np.zeros((16, 16, 4), np.uint8)
    cmyk[..., 0], cmyk[..., 1], cmyk[..., 2], cmyk[..., 3] = (
        200, 100, 50, 128,
    )
    frame = _jpeg_encode_cmyk(cmyk, quality=95)

    orig = multimodal._jpeg_encode_baseline
    multimodal._jpeg_encode_baseline = lambda f, quality=85: frame
    try:
        payload = _avi_encode_mjpeg([cmyk[..., :3]], quality=95, fps=4)
    finally:
        multimodal._jpeg_encode_baseline = orig

    decoded = _jpeg_decode(frame)
    assert decoded.shape[2] == 4
    rgb = _jpeg_cmyk_to_rgb(decoded).astype(np.float64)
    want = float(
        (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        .mean()
    )
    raw = decoded.astype(np.float64)
    wrong = float(
        (0.299 * raw[..., 0] + 0.587 * raw[..., 1] + 0.114 * raw[..., 2])
        .mean()
    )
    assert abs(want - wrong) > 30  # the bug would be a silent skew

    _, feats = _featurize_avi_mjpeg(payload)
    assert feats[:3] == [16.0, 16.0, 1.0]
    assert abs(feats[3] - want) < 1e-9


def test_video_metadata_avi_recovers_dims_from_sof(spark):
    """video_metadata's AVI branch must not report the advisory avih
    canvas dims when a capture muxer wrote 0s — the first frame's SOF
    header (a cheap marker walk, no entropy decode) is the authority
    the featurize surface already uses, so both report the same
    resolution."""
    import struct

    import numpy as np
    import pytest

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        _jpeg_sof_dimensions,
        video_metadata,
    )

    f0 = _jpeg_gradient(24, 32)
    payload = _avi_encode_mjpeg([f0, np.roll(f0, 3, 1)], quality=90, fps=5)
    zeroed = bytearray(payload)
    struct.pack_into("<II", zeroed, payload.index(b"avih") + 8 + 32, 0, 0)

    # the probe itself: header-only dims, garbage rejected loudly
    frames_at = payload.index(b"\xff\xd8")
    assert _jpeg_sof_dimensions(payload[frames_at:]) == (24, 32)
    with pytest.raises(ValueError, match="SOI"):
        _jpeg_sof_dimensions(b"\x00\x01\x02\x03")

    # DNL-deferred height with an FF DC byte pair INSIDE a COM segment
    # payload between SOF and SOS: the probe must step over marker
    # segments and only byte-search the post-SOS entropy region (where
    # 0xFF is always stuffed or a restart marker)
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"\xff\xdc\x99\x99"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 0, 32, 1) + bytes(
        [1, 0x11, 0]
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    entropy = b"\x12\x34\x56\x78"
    dnl = b"\xff\xdc" + struct.pack(">HH", 4, 24)
    fake = b"\xff\xd8" + com + sof0 + sos + entropy + dnl + b"\xff\xd9"
    assert _jpeg_sof_dimensions(fake) == (24, 32)

    # ISO/IEC 10918-1 B.1.1.2: markers may be padded with 0xFF fill
    # bytes — a run before SOF must be stepped over, not parsed as a
    # marker whose "length" bytes desynchronize the walk
    padded = b"\xff\xd8" + b"\xff\xff\xff" + sof0[1:] + sos + entropy
    assert _jpeg_sof_dimensions(padded + dnl) == (24, 32)

    df = spark.createDataFrame(
        [(1, "video", bytes(zeroed))],
        "asset_id long, media_type string, payload binary",
    )
    row = video_metadata(df).collect()[0]
    assert row["meta_ok"] and (row["width"], row["height"]) == (32, 24)


def test_avi_mjpeg_through_spark_featurize_and_frame_sample(spark):
    """End to end through the Arrow operators: an MJPEG AVI asset
    lands decode_ok through decode_features (video family), and
    sample_frames emits its per-frame JPEG payloads with original
    indices (every_n honored)."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        decode_features,
        sample_frames,
    )

    frames = [
        np.roll(_jpeg_gradient(16, 16), k, axis=1) for k in range(5)
    ]
    payload = _avi_encode_mjpeg(frames, quality=90, fps=4)
    assets = spark.createDataFrame(
        [(1, "video/x-msvideo", payload,
          {"n_bytes": len(payload), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    row = decode_features(assets, real_decoder=True).collect()[0]
    assert row["decode_ok"] and row["reason"] is None
    assert row["feature"][:3] == [16.0, 16.0, 5.0]

    out = sample_frames(assets, every_n=2, real_decoder=True).collect()
    kept = sorted(r["frame_idx"] for r in out)
    assert kept == [0, 2, 4]
    assert all(bytes(r["frame"])[:2] == b"\xff\xd8" for r in out)


def test_video_metadata_covers_avi(spark):
    """The metadata-only pass parses AVI container facts regardless
    of codec (resolution/duration gates are codec-agnostic), while
    content DECODE stays MJPG-bound."""
    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        video_metadata,
    )

    frames = [np.roll(_jpeg_gradient(12, 20), k, axis=0) for k in range(4)]
    mjpg = _avi_encode_mjpeg(frames, quality=85, fps=4)
    xvid = mjpg.replace(b"vidsMJPG", b"vidsXVID", 1)
    assets = spark.createDataFrame(
        [
            (1, "video/x-msvideo", mjpg, {"n_bytes": len(mjpg), "source": "t"}),
            (2, "video/x-msvideo", xvid, {"n_bytes": len(xvid), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    rows = {r["asset_id"]: r for r in video_metadata(assets).collect()}
    for rid in (1, 2):  # codec-agnostic container facts
        assert rows[rid]["meta_ok"]
        assert (rows[rid]["width"], rows[rid]["height"]) == (20, 12)
        assert rows[rid]["duration_ms"] == 1000  # 4 frames at 4 fps


def test_avi_opendml_avix_and_multistream():
    """OpenDML 'RIFF AVIX' extension segments are walked (frames past
    the first segment count), and chunks of NON-primary streams are
    excluded by their stream prefix — an audio stream raises
    n_streams without inflating the frame count or duration."""
    import struct

    import numpy as np

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        _featurize_avi_mjpeg,
        _jpeg_encode_baseline,
        _parse_avi_mjpeg,
    )

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(t, body):
        return chunk(b"LIST", t + body)

    frames = [np.roll(_jpeg_gradient(16, 16), k, axis=1) for k in range(2)]
    base = _avi_encode_mjpeg(frames, quality=90, fps=4)

    # append an AVIX segment carrying a third frame
    extra = _jpeg_encode_baseline(_jpeg_gradient(16, 16), quality=90)
    avix = chunk(
        b"RIFF", b"AVIX" + lst(b"movi", chunk(b"00dc", extra))
    )
    w, h, fps, got, n = _parse_avi_mjpeg(base + avix)
    assert len(got) == 3 and got[2] == extra
    _checksum, feats = _featurize_avi_mjpeg(base + avix)
    assert feats[2] == 3.0

    # inject an audio strl AFTER the video strl, and an '01wb' audio
    # chunk into movi: n_streams=2, frames still the video stream's
    strh_aud = b"auds" + b"\x00" * 48
    audio_strl = lst(b"strl", chunk(b"strh", strh_aud))
    # rebuild: insert the audio strl right before the movi LIST
    movi_at = base.index(b"movi") - 8
    with_audio = bytearray(
        base[:movi_at] + audio_strl + base[movi_at:]
    )
    struct.pack_into(  # fix the outer RIFF size
        "<I", with_audio, 4, len(with_audio) - 8
    )
    # smuggle an audio data chunk into movi too
    movi_at2 = bytes(with_audio).index(b"movi") - 8
    movi_size = struct.unpack_from("<I", with_audio, movi_at2 + 4)[0]
    audio_chunk = chunk(b"01wb", b"\x00" * 10)
    insert_at = movi_at2 + 8 + movi_size
    out = bytearray(
        bytes(with_audio[:insert_at])
        + audio_chunk
        + bytes(with_audio[insert_at:])
    )
    struct.pack_into("<I", out, movi_at2 + 4, movi_size + len(audio_chunk))
    struct.pack_into("<I", out, 4, len(out) - 8)
    w2, h2, fps2, frames2, n2 = _parse_avi_mjpeg(bytes(out))
    assert n2 == 2 and len(frames2) == 2  # audio chunk not a "frame"


def test_leakage_safe_split_cluster_coherent(spark):
    """The eval-contamination guard: every near-dup CLUSTER (transitive
    closure over pairs, not just direct pairs) lands in exactly one
    split, and documents with no near-dup get precisely the assignment
    plain hash_split would give them — the guard changes nothing it
    doesn't have to."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.range(1, 1001).select(F.col("id").alias("doc_id"))
    # a 3-chain (1~2, 2~3 but never 1~3 directly) + a detached pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert len(out) == 1000
    assert out[1] == out[2] == out[3]  # transitive, not just pairwise
    assert out[10] == out[11]
    plain = {
        r["doc_id"]: r["split"] for r in hash_split(docs).collect()
    }
    clustered = {1, 2, 3, 10, 11}
    for doc_id, split in out.items():
        if doc_id not in clustered:
            assert split == plain[doc_id], doc_id
    # cluster members take their REPRESENTATIVE's plain assignment
    assert out[1] == plain[1] and out[10] == plain[10]
    # weights still land in the right ballpark (98/1/1 over 1000 docs)
    from collections import Counter

    counts = Counter(out.values())
    assert counts["train"] > 900


def test_leakage_safe_split_real_pairs_never_straddle(spark):
    """On the real near-dup corpus: no MinHash pair may straddle splits
    (the exact failure mode a per-document split exhibits — asserted to
    actually OCCUR on the same corpus, so the guard is load-bearing)."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        hash_split,
        leakage_safe_split,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = d.select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat("text", F.lit(" the end")).alias("text"),
        )
    )
    pairs = minhash_dedup_pairs(corpus).localCheckpoint(eager=True)
    assert pairs.count() > 0
    safe = leakage_safe_split(corpus, pairs).select("doc_id", "split")

    def straddles(split_df):
        s = split_df
        return (
            pairs.join(
                s.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("split").alias("split_a"),
                ),
                "id_a",
            )
            .join(
                s.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("split").alias("split_b"),
                ),
                "id_b",
            )
            .filter(F.col("split_a") != F.col("split_b"))
            .count()
        )

    assert straddles(safe) == 0
    # the per-document split DOES straddle on this corpus — the guard
    # is demonstrably load-bearing, not vacuous (98/1/1 keeps it rare;
    # widen to 50/50 so the fixture corpus exhibits it)
    wide = {"train": 0.5, "test": 0.5}
    naive = hash_split(corpus, weights=wide).select("doc_id", "split")
    safe_wide = leakage_safe_split(corpus, pairs, weights=wide).select(
        "doc_id", "split"
    )
    assert straddles(naive) > 0
    assert straddles(safe_wide) == 0


def test_leakage_safe_split_requires_convergence(spark):
    """Non-minimal labels give one cluster several representatives —
    the exact straddle the operator exists to prevent, silently. An
    exhausted max_iter must therefore raise, not return."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        leakage_safe_split,
    )

    docs = spark.range(1, 40).select(F.col("id").alias("doc_id"))
    # a 30-node chain: diameter 29 needs ~5 pointer-jumping rounds
    # plus the confirming no-change round; max_iter=2 cannot finish
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="max_iter"):
        leakage_safe_split(docs, chain, max_iter=2).collect()
    # and the same chain converges fine at the default budget
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, chain).collect()
    }
    assert len({out[i] for i in range(1, 31)}) == 1


def test_leakage_safe_split_rejects_reserved_column(spark):
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        leakage_safe_split,
    )

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("_split_key")
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="_split_key"):
        leakage_safe_split(docs, pairs)


def test_incremental_leakage_split_inherit_bridge_fresh(spark):
    """The three delta cases: inherit one stored split across the batch
    boundary; surface a bridge (>=2 stored splits reachable) as
    telemetry with the min-id stored member's split; assign fresh
    clusters with the plain hash — and empty history reproduces the
    batch operator exactly."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        incremental_leakage_split,
        leakage_safe_split,
    )

    stored = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train")],
        "doc_id long, split string",
    )
    new = spark.range(100, 110).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [
            (3, 100),            # inherit: touches only doc 3 (train)
            (1, 101), (2, 101),  # bridge: train(1) + test(2)
            (104, 105),          # fresh two-doc cluster
        ],
        "id_a long, id_b long",
    )
    out = {
        r["doc_id"]: (r["split"], r["n_linked_splits"])
        for r in incremental_leakage_split(new, stored, pairs).collect()
    }
    assert len(out) == 10
    assert out[100] == ("train", 1)          # inherited
    assert out[101] == ("train", 2)          # bridge: min-id stored (1)
    assert out[104][1] == 0 and out[105][1] == 0
    assert out[104][0] == out[105][0]        # fresh cluster coherent

    # empty history == the batch operator, byte for byte
    empty = stored.filter(F.lit(False))
    fresh_pairs = spark.createDataFrame(
        [(100, 101), (104, 105)], "id_a long, id_b long"
    )
    inc = {
        r["doc_id"]: r["split"]
        for r in incremental_leakage_split(
            new, empty, fresh_pairs
        ).collect()
    }
    batch = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(new, fresh_pairs).collect()
    }
    assert inc == batch

    # id overlap between new and stored raises (frozen history)
    with pytest.raises(ValueError, match="frozen"):
        incremental_leakage_split(
            new.unionByName(stored.select("doc_id")), stored, pairs
        )


def test_incremental_leakage_split_rejects_output_columns(spark):
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        incremental_leakage_split,
    )

    stored = spark.createDataFrame([(1, "train")], "doc_id long, split string")
    pairs = spark.createDataFrame([(1, 100)], "id_a long, id_b long")
    docs = spark.range(100, 105).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("split")
    )
    # a provisional 'split' column would be silently clobbered AND
    # duplicated in the output — reject loudly instead
    with pytest.raises(ValueError, match="split"):
        incremental_leakage_split(docs, stored, pairs)


def test_advanced_state_feeds_incremental_leakage_split(spark):
    """Loop closure for the split family: the maintained dedup state
    (advance_corpus_artifacts — pinned stream==batch identical in
    test_streaming) feeds incremental_minhash_pairs feeds
    incremental_leakage_split, so a daily crawl is split-assigned
    against frozen history without re-reading yesterday's text."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        advance_corpus_artifacts,
        hash_split,
        incremental_leakage_split,
        incremental_minhash_pairs,
    )

    day1 = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "an entirely different second document about rivers")],
        "doc_id long, text string",
    )
    frozen = hash_split(day1).select("doc_id", "split")
    empty_sigs = spark.createDataFrame([], "id long, sig array<bigint>")
    empty_fps = spark.createDataFrame([], "fp long, keep_id long")
    sigs, _fps = advance_corpus_artifacts(day1, empty_sigs, empty_fps)

    day2 = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today"
               " the end"),
         (101, "completely unrelated fresh content about volcanoes and"
               " islands forming")],
        "doc_id long, text string",
    )
    pairs = incremental_minhash_pairs(day2, sigs)
    assert pairs.filter("id_a = 0 and id_b = 100").count() == 1
    out = {
        r["doc_id"]: (r["split"], r["n_linked_splits"])
        for r in incremental_leakage_split(day2, frozen, pairs).collect()
    }
    frozen0 = frozen.filter("doc_id = 0").collect()[0]["split"]
    assert out[100] == (frozen0, 1)   # inherited across the boundary
    assert out[101][1] == 0           # fresh


@pytest.mark.slow
def test_evaluate_bow_classifier_confusion_and_holdout(spark):
    """Classifier evaluation surface: exact confusion counts + int-ppm
    derived metrics on a crafted frame (including NULL rates on empty
    denominators and a moved threshold), then the documented holdout
    protocol end to end — leakage_safe-split train/test partitions,
    model trained on the train labels only, evaluated on the held-out
    test labels of linearly separable text."""
    from inbev_data_engineering_case_spark.operators.classify import (
        evaluate_bow_classifier,
        score_bow_classifier,
        train_bow_classifier,
    )

    scored = spark.createDataFrame(
        [(1, 50), (2, 10), (3, -5), (4, -50), (5, 0), (6, -1)],
        "doc_id long, score_micro bigint",
    )
    labels = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (4, False), (5, True),
         (6, False)],
        "doc_id long, label boolean",
    )
    row = evaluate_bow_classifier(scored, labels).first()
    # pred = score >= 0: {1,2,5} predicted positive
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (2, 1, 2, 1)
    assert row["accuracy_ppm"] == (4 * 1_000_000) // 6
    assert row["precision_ppm"] == (2 * 1_000_000) // 3
    assert row["recall_ppm"] == (2 * 1_000_000) // 3
    assert row["f1_ppm"] == (4 * 1_000_000) // 6  # 2tp/(2tp+fp+fn)

    # moved threshold: >= 20 keeps only doc 1
    strict = evaluate_bow_classifier(
        scored, labels, threshold_micro=20
    ).first()
    assert (strict["tp"], strict["fp"], strict["tn"], strict["fn"]) == (
        1, 0, 3, 2,
    )
    assert strict["precision_ppm"] == 1_000_000

    # empty-denominator rates are NULL, not a crash or a fake 0
    no_pos = evaluate_bow_classifier(
        scored.filter("doc_id IN (4, 6)"),
        labels.filter("doc_id IN (4, 6)"),
        threshold_micro=10_000_000,
    ).first()
    assert no_pos["tp"] == 0 and no_pos["precision_ppm"] is None
    assert no_pos["recall_ppm"] is None and no_pos["f1_ppm"] is None

    # population integrity: a labeled id with NO scored row, or a
    # label that casts to NULL boolean, raises instead of silently
    # shrinking the metric denominators
    import pytest

    with pytest.raises(Exception, match="no scored row"):
        evaluate_bow_classifier(
            scored.filter("doc_id IN (4, 6)"), labels
        ).first()
    null_labels = spark.createDataFrame(
        [(1, None)], "doc_id long, label boolean"
    )
    with pytest.raises(Exception, match="NULL boolean"):
        evaluate_bow_classifier(scored, null_labels).first()

    # holdout protocol: split -> train on 'train' labels only ->
    # evaluate on the held-out 'test' labels (separable text)
    from inbev_data_engineering_case_spark.operators.curate import (
        hash_split,
    )

    good = "clear prose sentence with informative words here"
    spam = "buy buy cheap cheap click click now now win win"
    rows = [
        (i, (good if i % 2 == 0 else spam) + f" v{i}", i % 2 == 0)
        for i in range(200)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label boolean"
    )
    split = hash_split(
        docs, weights={"train": 0.7, "test": 0.3}, id_col="doc_id"
    )
    train = split.filter("split = 'train'")
    test = split.filter("split = 'test'")
    assert train.count() and test.count()
    model = train_bow_classifier(train, n_buckets=1 << 12)
    held = evaluate_bow_classifier(
        score_bow_classifier(test.select("doc_id", "text"), model),
        test.select("doc_id", "label"),
    ).first()
    assert held["tp"] + held["fn"] > 0 and held["fp"] + held["tn"] > 0
    assert held["accuracy_ppm"] == 1_000_000  # separable by design


def test_evaluate_bow_classifier_duplicate_guard_wins_when_defects_stack(
    spark,
):
    """Guard precedence (r12 ADVICE): a duplicated labeled id whose
    scored row is ALSO missing (or NULL) must be named as the fan-out
    defect — the root cause to clean up — not misdirected to the
    per-row 'no scored row' / 'NULL score' diagnostic."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        evaluate_bow_classifier,
    )

    scored = spark.createDataFrame(
        [(1, 50)], "doc_id long, score_micro bigint"
    )
    # id 7 is duplicated in the labels AND has no scored row
    dup_missing = spark.createDataFrame(
        [(1, True), (7, True), (7, False)],
        "doc_id long, label boolean",
    )
    with pytest.raises(Exception, match="duplicated id"):
        evaluate_bow_classifier(scored, dup_missing).first()

    # duplicated SCORED id carrying a NULL score: same precedence
    dup_null = spark.createDataFrame(
        [(1, None), (1, None)], "doc_id long, score_micro bigint"
    )
    labels = spark.createDataFrame(
        [(1, True)], "doc_id long, label boolean"
    )
    with pytest.raises(Exception, match="duplicated id"):
        evaluate_bow_classifier(dup_null, labels).first()


def test_evaluate_bow_classifier_does_not_truncate_double_scores(spark):
    """The guarded frame passes the score through UNCAST: a double
    score of -0.4 against threshold 0 is a negative prediction —
    casting to bigint first would truncate it to 0 and silently flip
    it positive (third r13 review pass)."""
    from inbev_data_engineering_case_spark.operators.classify import (
        evaluate_bow_classifier,
    )

    scored = spark.createDataFrame(
        [(1, -0.4), (2, 0.6)], "doc_id long, score_micro double"
    )
    labels = spark.createDataFrame(
        [(1, False), (2, True)], "doc_id long, label boolean"
    )
    row = evaluate_bow_classifier(scored, labels).first()
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (1, 0, 1, 0)


_HALO_SENTINEL = "copied verbatim from the held out eval benchmark set"


def _halo_corpus(spark):
    """documents + near-dup copies; copies of every 40th doc carry the
    benchmark sentinel (direct n-gram flag), the rest ' the end'. The
    flagged copy is the HIGHER id of its near-dup cluster, so dedup
    keeps the clean original — the contaminated-by-association
    representative only the halo can drop."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    return docs.unionByName(
        docs.select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(
                "text",
                F.when(
                    F.col("doc_id") % 40 == 0, F.lit(" " + _HALO_SENTINEL)
                ).otherwise(F.lit(" the end")),
            ).alias("text"),
        )
    )


@pytest.mark.slow
def test_curate_corpus_halo_composed_parity(spark):
    """curate_corpus(benchmark=..., halo_hops=k) drops kept documents
    within k near-dup hops of a directly contaminated one, walking the
    pipeline's OWN pair graph (exactly ONE minhash pair computation in
    the composed run), and equals the standalone
    seed -> BFS -> flag chain over the same graph. The load-bearing
    case: a flagged copy's clean ORIGINAL survives dedup as the
    cluster rep and plain decontamination keeps it — the halo drops
    it."""
    from inbev_data_engineering_case_spark.operators import (
        curate as curate_mod,
    )
    from inbev_data_engineering_case_spark.operators.curate import (
        _dedup_chain,
        curate_corpus,
    )
    from inbev_data_engineering_case_spark.operators.decontaminate import (
        contamination_report,
    )
    from inbev_data_engineering_case_spark.operators.graph import (
        multi_source_bfs,
    )
    from inbev_data_engineering_case_spark.operators.textops import (
        score_documents,
    )

    corpus = _halo_corpus(spark)
    bench = spark.createDataFrame([(_HALO_SENTINEL,)], "text string")

    calls = []
    real = curate_mod.minhash_dedup_pairs

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    curate_mod.minhash_dedup_pairs = counting
    try:
        composed = curate_corpus(corpus, benchmark=bench, halo_hops=2)
        got = sorted(tuple(r) for r in composed.collect())
    finally:
        curate_mod.minhash_dedup_pairs = real
    assert calls == [1]  # ONE pairs computation for dedup AND halo

    got_ids = {r[0] for r in got}
    assert got_ids  # something survives
    # the clean originals of flagged copies are gone (the halo's work)
    plain = curate_corpus(corpus, benchmark=bench)
    plain_ids = {r["doc_id"] for r in plain.select("doc_id").collect()}
    halo_only = plain_ids - got_ids
    assert any(i % 40 == 0 and i < 200000 for i in halo_only), (
        "fixture must exercise the rep-contamination case"
    )
    assert got_ids <= plain_ids  # the halo only ever drops MORE

    # standalone parity: same eligible frame, direct flags, pair graph,
    # BFS, drop — chained from the public operators
    eligible = (
        score_documents(corpus, "text", "doc_id")
        .filter(F.col("lang").isin("en") & (F.col("quality") >= 0.3))
        .localCheckpoint()
    )
    direct = contamination_report(eligible, bench, n=8).select("doc_id")
    _, final_nb, _, pairs = _dedup_chain(
        eligible, "text", "doc_id", 0.5, "local"
    )
    halo_nodes = multi_source_bfs(
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        direct,
        max_hops=2,
    ).select(F.col("node").alias("doc_id"))
    want = sorted(
        tuple(r)
        for r in final_nb.join(
            halo_nodes, on="doc_id", how="left_anti"
        ).collect()
    )
    assert got == want


def test_decontaminate_halo_standalone(spark):
    """decontaminate(halo_hops=k, pair_edges=...): the drop set extends
    transitively over the supplied pair graph; halo_hops without
    pair_edges is refused; halo_hops=0 equals the plain direct drop."""
    import pytest

    from inbev_data_engineering_case_spark.operators.decontaminate import (
        decontaminate,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base + " contaminated tail one two three four five six"),
            (2, base + " paraphrased tail one two three four five six"),
            (3, base + " another body entirely different words here now"),
            (4, "totally unrelated text with none of those words at all"),
        ],
        "doc_id long, text string",
    )
    # benchmark shares an 8-gram ONLY with doc 1
    bench = spark.createDataFrame(
        [("contaminated tail one two three four five six",)],
        "text string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )

    plain = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
    assert plain == {2, 3, 4}

    hop0 = {
        r["doc_id"]
        for r in decontaminate(
            docs, bench, halo_hops=0, pair_edges=edges
        ).collect()
    }
    assert hop0 == plain

    hop1 = {
        r["doc_id"]
        for r in decontaminate(
            docs, bench, halo_hops=1, pair_edges=edges
        ).collect()
    }
    assert hop1 == {3, 4}

    hop2 = {
        r["doc_id"]
        for r in decontaminate(
            docs, bench, halo_hops=2, pair_edges=edges
        ).collect()
    }
    assert hop2 == {4}

    with pytest.raises(ValueError, match="pair_edges"):
        decontaminate(docs, bench, halo_hops=1)


@pytest.mark.slow
def test_classifier_score_drift_recipe(spark):
    """The classifier-score drift monitor is a COMPOSITION, not a new
    operator: score_bow_classifier's (doc_id, score_micro) output
    feeds quality.distribution_drift directly — a reference window's
    scores vs today's. An unchanged corpus mix stays inside the alarm
    band; a shifted mix (the model drifting out of calibration, or
    the corpus drifting under the model) blows the KS gap out. The
    DEPLOYMENT runbook documents this recipe beside the stream-drift
    monitor."""
    from inbev_data_engineering_case_spark.operators.classify import (
        score_bow_classifier,
        train_bow_classifier,
    )
    from inbev_data_engineering_case_spark.operators.quality import (
        distribution_drift,
    )

    good = "clear prose sentence with informative words here"
    spam = "buy buy cheap cheap click click now now win win"

    def corpus(start, n, spam_mod):
        # deterministic mix: every spam_mod-th doc is spam; suffix
        # varies tokens so scores are not all identical
        rows = [
            (
                i,
                (spam if i % spam_mod == 0 else good) + f" v{i % 7}",
            )
            for i in range(start, start + n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    labeled = spark.createDataFrame(
        [(i, good + f" v{i % 7}", True) for i in range(200)]
        + [(i + 200, spam + f" v{i % 7}", False) for i in range(200)],
        "doc_id long, text string, label boolean",
    )
    model = train_bow_classifier(labeled, n_buckets=1 << 12)

    def scores(df):
        return score_bow_classifier(df, model).select("score_micro")

    ref = scores(corpus(1000, 400, 5))  # 20% spam reference window
    same = scores(corpus(5000, 400, 5))  # same mix, later window
    shifted = scores(corpus(9000, 400, 2))  # 50% spam: corpus drifted

    def max_gap(cur):
        return (
            distribution_drift(ref, cur, "score_micro", n_cuts=9)
            .agg(F.max("gap_ppm").alias("g"))
            .first()["g"]
        )

    stable, drifted = max_gap(same), max_gap(shifted)
    assert stable < 100_000  # unchanged mix: inside the band
    assert drifted > 250_000  # mix shift: unmistakable KS gap
    assert drifted > 2 * stable


def test_classifier_threshold_sweep_matches_reference(spark):
    """The PR-curve sweep equals a per-threshold python reference at
    every quantile cut (thresholds ARE the score quantiles), recall is
    monotone nonincreasing in the threshold, each row agrees with
    evaluate_bow_classifier at that exact threshold, and n_cuts < 1 is
    refused."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        classifier_threshold_sweep,
        evaluate_bow_classifier,
    )

    data = [
        (i, s, lab)
        for i, (s, lab) in enumerate(
            [(-90, False), (-50, False), (-10, True), (-10, False),
             (0, True), (20, True), (35, False), (60, True),
             (80, True), (95, True)]
        )
    ]
    scored = spark.createDataFrame(
        [(i, s) for i, s, _ in data], "doc_id long, score_micro bigint"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in data], "doc_id long, label boolean"
    )
    n_cuts = 5
    rows = (
        classifier_threshold_sweep(scored, labels, n_cuts=n_cuts)
        .orderBy("cut_idx")
        .collect()
    )
    assert len(rows) == n_cuts

    scores = sorted(s for _, s, _ in data)

    def pct(q):  # Spark/DuckDB linear-interpolation percentile
        pos = q * (len(scores) - 1)
        lo, frac = int(pos), pos - int(pos)
        hi = min(lo + 1, len(scores) - 1)
        return scores[lo] + frac * (scores[hi] - scores[lo])

    recalls = []
    for k, r in enumerate(rows, start=1):
        t = pct(k / (n_cuts + 1))
        assert abs(r["threshold"] - t) < 1e-9
        tp = sum(1 for _, s, y in data if y and s >= t)
        fp = sum(1 for _, s, y in data if not y and s >= t)
        pos = sum(1 for _, _, y in data if y)
        neg = len(data) - pos
        assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (
            tp, fp, neg - fp, pos - tp,
        )
        assert r["recall_ppm"] == tp * 1_000_000 // pos
        if tp + fp:
            assert r["precision_ppm"] == tp * 1_000_000 // (tp + fp)
        recalls.append(r["recall_ppm"])
        # row-for-row agreement with the point evaluator at this cut
        # (integer threshold: these cuts all land on whole micros)
        if t == int(t):
            pt = evaluate_bow_classifier(
                scored, labels, threshold_micro=int(t)
            ).first()
            assert (pt["tp"], pt["fp"]) == (tp, fp)
    assert recalls == sorted(recalls, reverse=True)

    with pytest.raises(ValueError, match="n_cuts"):
        classifier_threshold_sweep(scored, labels, n_cuts=0)


@pytest.mark.slow
def test_dedup_components_incremental_matches_batch(spark):
    """Delta maintenance of a components labeling: contracting stored
    components and closing only the delta graph must equal the batch
    closure over the union — on random graphs/deltas (cluster merges
    through chains of new edges, new nodes that become the new minimum
    of an old component, old-old delta edges) and for the empty delta
    (labels unchanged)."""
    import random

    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components,
        dedup_components_incremental,
    )

    def pairs_df(edges):
        return spark.createDataFrame(edges, "id_a long, id_b long")

    rng = random.Random(0xCC12)
    for trial, (n_old, m_old, n_new, m_new) in enumerate(
        [(24, 20, 8, 10), (50, 40, 12, 20), (16, 6, 30, 25)]
    ):
        base = list(
            {
                (rng.randrange(n_old), rng.randrange(n_old))
                for _ in range(m_old)
            }
        )
        base = [(a, b) for a, b in base if a != b]
        all_n = n_old + n_new
        # new nodes get ids ABOVE and BELOW the old range (negative
        # ids), so a new node can become an old component's minimum
        def nid(k):
            return -(k + 1) if k % 3 == 0 else n_old + k

        delta = list(
            {
                (rng.randrange(all_n), rng.randrange(all_n))
                for _ in range(m_new)
            }
        )
        delta = [
            (a if a < n_old else nid(a - n_old),
             b if b < n_old else nid(b - n_old))
            for a, b in delta
        ]
        delta = [
            (a, b)
            for a, b in delta
            if a != b and (a, b) not in set(base)
        ]
        stored = dedup_components(
            pairs_df(base), require_convergence=True
        ).localCheckpoint(eager=True)
        got = {
            (r["node"], r["comp"])
            for r in dedup_components_incremental(
                stored, pairs_df(delta)
            ).collect()
        }
        want = {
            (r["node"], r["comp"])
            for r in dedup_components(
                pairs_df(base + delta), require_convergence=True
            ).collect()
        }
        assert got == want, trial

    # empty delta: the stored labeling comes back unchanged
    base_df = pairs_df([(1, 2), (2, 3), (7, 9)])
    stored = dedup_components(base_df, require_convergence=True)
    unchanged = {
        (r["node"], r["comp"])
        for r in dedup_components_incremental(
            stored, base_df.limit(0)
        ).collect()
    }
    assert unchanged == {
        (r["node"], r["comp"]) for r in stored.collect()
    }


# ---------------------------------------------------------------------------
# multi-class hashed-BOW classifier (classify.py multiclass family)
# ---------------------------------------------------------------------------


def _mc_python_reference(rows, n_buckets, alpha=1.0):
    """Plain-Python NB reference: same hash, same smoothing, same
    micro-unit rounding, argmax ties to the smallest class."""
    import hashlib
    import math

    def h64(t):
        # the portable 60-bit hash (functions.portable_hash64) in pure
        # Python: first 15 hex chars of md5
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    def buckets(text):
        return [
            h64(t) % n_buckets
            for t in text.lower().split()
            if t != ""
        ]

    cnt: dict = {}
    pri: dict = {}
    for _id, text, cls in rows:
        pri[cls] = pri.get(cls, 0) + 1
        for b in buckets(text):
            cnt[(cls, b)] = cnt.get((cls, b), 0) + 1
    tot = {}
    for (cls, _b), c in cnt.items():
        tot[cls] = tot.get(cls, 0) + c
    micro = 1_000_000

    def r(x):
        # Spark's round(double) goes through BigDecimal.valueOf =
        # shortest-repr string, then HALF_UP — mirror exactly
        import decimal

        return int(
            decimal.Decimal(repr(x * micro)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    w = {
        (cls, b): r(
            math.log((c + alpha) / (tot[cls] + alpha * n_buckets))
        )
        for (cls, b), c in cnt.items()
    }
    bias = {cls: r(math.log(n)) for cls, n in pri.items()}
    dflt = {
        cls: r(
            math.log(alpha / (tot.get(cls, 0) + alpha * n_buckets))
        )
        for cls in pri
    }
    out = {}
    for _id, text, _cls in rows:
        bs = buckets(text)
        best = None
        for cls in sorted(pri):
            s = bias[cls] + sum(
                w.get((cls, b), dflt[cls]) for b in bs
            )
            if best is None or s > best[1]:
                best = (cls, s)
        out[_id] = (len(bs), best[0], best[1])
    return out


def test_multiclass_bow_matches_python_reference(spark):
    """train + score + argmax against an exact plain-Python NB
    reference (same portable hash, same smoothing, same micro-unit
    rounding, ties to the smallest class name) — including a
    zero-token doc (bias-only argmax) and a class whose tokens never
    overlap the others."""
    from inbev_data_engineering_case_spark.operators.classify import (
        score_bow_multiclass,
        train_bow_multiclass,
    )

    rows = [
        (1, "alpha beta beta alpha", "web"),
        (2, "alpha alpha gamma", "web"),
        (3, "def return yield import", "code"),
        (4, "import numpy def lambda", "code"),
        (5, "theorem lemma proof", "math"),
        (6, "proof proof theorem alpha", "math"),
        (7, "", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    model = train_bow_multiclass(docs, n_buckets=128)
    got = {
        r["doc_id"]: (r["n_tokens"], r["pred_class"], r["score_micro"])
        for r in score_bow_multiclass(
            docs.select("doc_id", "text"), model
        ).collect()
    }
    want = _mc_python_reference(rows, 128)
    assert got == want


def test_multiclass_train_and_score_fused_parity(spark):
    """The r15 one-tokenization composition
    (train_and_score_bow_multiclass: shared per-(doc, class, bucket)
    count table feeding both the sufficient statistics and the
    scorer) is row-identical to the separate train + score chain —
    including the zero-token bias-only doc — and the NULL-class guard
    still raises through the shared table's plan."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        score_bow_multiclass,
        train_and_score_bow_multiclass,
        train_bow_multiclass,
    )

    rows = [
        (1, "alpha beta beta alpha", "web"),
        (2, "alpha alpha gamma", "web"),
        (3, "def return yield import", "code"),
        (4, "import numpy def lambda", "code"),
        (5, "theorem lemma proof", "math"),
        (6, "proof proof theorem alpha", "math"),
        (7, "", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    model = train_bow_multiclass(docs, n_buckets=128)
    want = sorted(
        map(
            tuple,
            score_bow_multiclass(
                docs.select("doc_id", "text"), model
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            train_and_score_bow_multiclass(docs, n_buckets=128).collect(),
        )
    )
    assert got == want

    bad = spark.createDataFrame(
        [(1, "alpha", "web"), (2, "beta", None)],
        "doc_id long, text string, label string",
    )
    with pytest.raises(Exception, match="class label casts to NULL"):
        train_and_score_bow_multiclass(bad, n_buckets=128).collect()


@pytest.mark.slow
def test_multiclass_counts_merge_parity_and_guards(spark):
    """The incremental-artifact loop: training on the union equals
    merging a labeled delta's counts into the stored table and
    re-deriving — byte-identical weights. Guards: NULL class label
    raises in-plan; <2 classes raises; a double-META merge raises."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        merge_multiclass_bow_counts,
        multiclass_bow_counts,
        multiclass_bow_weights_from_counts,
        train_bow_multiclass,
    )

    day1 = [(1, "alpha beta", "a"), (2, "gamma gamma", "b")]
    day2 = [(3, "alpha alpha delta", "a"), (4, "epsilon", "c")]
    df1 = spark.createDataFrame(
        day1, "doc_id long, text string, label string"
    )
    df2 = spark.createDataFrame(
        day2, "doc_id long, text string, label string"
    )
    both = df1.unionByName(df2)

    merged = merge_multiclass_bow_counts(
        multiclass_bow_counts(df1, n_buckets=64),
        multiclass_bow_counts(df2, n_buckets=64),
    )
    inc = {
        (r["class"], r["bucket"]): r["weight_micro"]
        for r in multiclass_bow_weights_from_counts(merged).collect()
    }
    full = {
        (r["class"], r["bucket"]): r["weight_micro"]
        for r in train_bow_multiclass(both, n_buckets=64).collect()
    }
    assert inc == full

    # NULL class label raises in-plan
    bad = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", None)],
        "doc_id long, text string, label string",
    )
    with pytest.raises(Exception, match="NULL"):
        multiclass_bow_counts(bad, n_buckets=64).collect()

    # one-class table raises at derive time
    one = spark.createDataFrame(
        [(1, "x", "a")], "doc_id long, text string, label string"
    )
    with pytest.raises(ValueError, match=">= 2 classes"):
        multiclass_bow_weights_from_counts(
            multiclass_bow_counts(one, n_buckets=64)
        )

    # merging two hash spaces leaves two META rows -> derive refuses
    with pytest.raises(ValueError, match="exactly one META"):
        multiclass_bow_weights_from_counts(
            merge_multiclass_bow_counts(
                multiclass_bow_counts(df1, n_buckets=64),
                multiclass_bow_counts(df2, n_buckets=128),
            )
        )


def test_multiclass_eval_confusion_and_guards(spark):
    """Per-class one-vs-rest confusion on a hand frame (including a
    class that is only ever PREDICTED — zero support, NULL recall),
    plus the population-integrity guards with the duplicate guard
    outranking the per-row ones."""
    import pytest

    from inbev_data_engineering_case_spark.operators.classify import (
        evaluate_multiclass_classifier,
    )

    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "a")],
        "doc_id long, pred_class string",
    )
    labels = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "a"), (5, "a")],
        "doc_id long, label string",
    )
    got = {
        r["class"]: r.asDict()
        for r in evaluate_multiclass_classifier(pred, labels).collect()
    }
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a["tp"], a["fp"], a["fn"], a["tn"]) == (2, 1, 1, 1)
    assert a["support"] == 3
    assert a["precision_ppm"] == (2 * 1_000_000) // 3
    assert a["recall_ppm"] == (2 * 1_000_000) // 3
    c = got["c"]  # predicted once, never true
    assert (c["tp"], c["fp"], c["fn"], c["support"]) == (0, 1, 0, 0)
    assert c["precision_ppm"] == 0 and c["recall_ppm"] is None
    b = got["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (1, 0, 1)

    # guards: labeled id with no prediction row
    with pytest.raises(Exception, match="no prediction row"):
        evaluate_multiclass_classifier(
            pred.filter("doc_id != 3"), labels
        ).collect()
    # NULL label
    with pytest.raises(Exception, match="NULL for"):
        evaluate_multiclass_classifier(
            pred,
            spark.createDataFrame(
                [(1, None)], "doc_id long, label string"
            ),
        ).collect()
    # NULL predicted class (row present)
    with pytest.raises(Exception, match="NULL class"):
        evaluate_multiclass_classifier(
            spark.createDataFrame(
                [(1, None)], "doc_id long, pred_class string"
            ),
            labels.filter("doc_id = 1"),
        ).collect()
    # duplicated id outranks the per-row diagnostics even when the
    # duplicated id ALSO has no prediction row
    with pytest.raises(Exception, match="duplicated id"):
        evaluate_multiclass_classifier(
            pred.filter("doc_id = 1"),
            spark.createDataFrame(
                [(1, "a"), (9, "a"), (9, "b")],
                "doc_id long, label string",
            ),
        ).collect()


def test_multiclass_separable_holdout_and_score_guards(spark):
    """End-to-end on linearly separable per-class vocabularies under
    the hash-split holdout protocol: held-out accuracy 100% for every
    class. Score-side guards: a model missing its META row refuses,
    and a class missing its bias/default rows raises in-plan."""
    import pytest
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.classify import (
        META_BUCKET,
        evaluate_multiclass_classifier,
        score_bow_multiclass,
        train_bow_multiclass,
    )
    from inbev_data_engineering_case_spark.operators.curate import (
        hash_split,
    )

    vocab = {
        "web": "news article page link site story",
        "code": "def class import return lambda yield",
        "math": "theorem lemma proof integral matrix",
    }
    rows = [
        (i, vocab[cls] + f" v{i}", cls)
        for i, cls in enumerate(
            [c for c in vocab for _ in range(60)]
        )
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    split = hash_split(
        docs, weights={"train": 0.7, "test": 0.3}, id_col="doc_id"
    )
    train = split.filter("split = 'train'")
    test = split.filter("split = 'test'")
    model = train_bow_multiclass(train, n_buckets=1 << 12)
    ev = evaluate_multiclass_classifier(
        score_bow_multiclass(test.select("doc_id", "text"), model),
        test.select("doc_id", "label"),
    ).collect()
    assert {r["class"] for r in ev} == set(vocab)
    for r in ev:
        assert r["support"] > 0
        assert r["precision_ppm"] == 1_000_000, r
        assert r["recall_ppm"] == 1_000_000, r

    # META missing -> refuses
    with pytest.raises(ValueError, match="META"):
        score_bow_multiclass(
            docs.select("doc_id", "text"),
            model.filter(F.col("bucket") != META_BUCKET),
        )
    # a class stripped of its bias row raises in-plan
    broken = model.filter(
        ~((F.col("class") == "web") & (F.col("bucket") == -1))
    )
    with pytest.raises(Exception, match="bias/default"):
        score_bow_multiclass(
            docs.select("doc_id", "text"), broken
        ).collect()


def test_mixture_sample_by_class_composition(spark):
    """The classifier-routed mixing hook equals mixture_sample over
    the argmax-tagged corpus (same strata, same rates, same hash
    membership) — the composition can never disagree with its
    parts."""
    from inbev_data_engineering_case_spark.operators.classify import (
        mixture_sample_by_class,
        score_bow_multiclass,
        train_bow_multiclass,
    )
    from inbev_data_engineering_case_spark.operators.sample import (
        mixture_sample,
    )

    vocab = {
        "web": "news article page link",
        "code": "def import return lambda",
    }
    rows = [
        (i, vocab["web" if i % 3 else "code"] + f" v{i}",
         "web" if i % 3 else "code")
        for i in range(90)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    model = train_bow_multiclass(docs, n_buckets=1 << 12)
    target = {"web": 300_000, "code": 700_000}

    got = {
        r["doc_id"]
        for r in mixture_sample_by_class(
            docs.select("doc_id", "text"), model, target, salt=7
        ).collect()
    }
    tagged = docs.select("doc_id", "text").join(
        score_bow_multiclass(
            docs.select("doc_id", "text"), model
        ).select("doc_id", "pred_class"),
        on="doc_id",
    )
    want = {
        r["doc_id"]
        for r in mixture_sample(
            tagged, "pred_class", target, salt=7
        ).collect()
    }
    assert got == want and got


@pytest.mark.slow
def test_select_within_budget_prefix_semantics_and_guards(spark):
    """Budgeted data selection: the kept set is the maximal
    (quality DESC, id ASC) prefix whose summed cost fits the budget —
    hand-checked boundaries (mid-level split, exact fit, zero budget,
    budget over total), random-input parity against a brute-force
    Python reference, in-plan guards for NULL/negative cost and NULL
    quality, and the reserved-column clash."""
    import random

    import pytest

    from inbev_data_engineering_case_spark.operators.sample import (
        select_within_budget,
    )

    rows = [
        (1, 10, 0.9), (2, 10, 0.9), (3, 10, 0.9),
        (4, 15, 0.8),
        (5, 100, 0.7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality double"
    )
    expect = {
        0: [], 5: [], 10: [1], 25: [1, 2], 30: [1, 2, 3],
        44: [1, 2, 3], 45: [1, 2, 3, 4], 135: [1, 2, 3, 4],
        200: [1, 2, 3, 4, 5],
    }
    for b, want in expect.items():
        got = sorted(
            r["doc_id"]
            for r in select_within_budget(df, b).collect()
        )
        assert got == want, (b, got)
    # output schema is the input's, staging columns dropped
    assert select_within_budget(df, 30).columns == [
        "doc_id", "n_tokens", "quality",
    ]

    def reference(rows, budget):
        order = sorted(
            rows, key=lambda r: (-round(r[2] * 1_000_000), r[0])
        )
        kept, cum = [], 0
        for rid, cost, _q in order:
            cum += cost
            if cum > budget:
                break
            kept.append(rid)
        return sorted(kept)

    rng = random.Random(0xB0D6)
    for trial in range(4):
        rws = [
            (i, rng.randrange(0, 40), rng.choice([0.3, 0.55, 0.8]))
            for i in range(60)
        ]
        rdf = spark.createDataFrame(
            rws, "doc_id long, n_tokens long, quality double"
        )
        total = sum(r[1] for r in rws)
        for b in (0, total // 7, total // 3, total - 1, total + 5):
            got = sorted(
                r["doc_id"]
                for r in select_within_budget(rdf, b).collect()
            )
            assert got == reference(rws, b), (trial, b)

    with pytest.raises(Exception, match="NULL or negative cost"):
        select_within_budget(
            spark.createDataFrame(
                [(1, -5, 0.5)], "doc_id long, n_tokens long, quality double"
            ),
            100,
        ).collect()
    with pytest.raises(Exception, match="NULL quality"):
        select_within_budget(
            spark.createDataFrame(
                [(1, 5, None)], "doc_id long, n_tokens long, quality double"
            ),
            100,
        ).collect()
    with pytest.raises(ValueError, match="_mq"):
        select_within_budget(df.withColumn("_mq", df.doc_id), 100)
    with pytest.raises(ValueError, match="_cost"):
        select_within_budget(df.withColumn("_cost", df.doc_id), 100)


def test_select_within_budget_never_sorts_the_corpus(spark):
    """The scale contract: the corpus side is a scan + broadcast
    semi-join — the only Sort nodes in the plan sit under window/limit
    operators over the LEVEL histogram or the single boundary level,
    never a corpus-wide range-partition sort (no RangePartitioning
    exchange anywhere)."""
    from inbev_data_engineering_case_spark.operators.sample import (
        select_within_budget,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id",
        F.length("text").alias("n_tokens"),
        (F.col("n_chars") / 1000.0).alias("quality"),
    )
    plan = (
        select_within_budget(docs, 50_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert "BatchEvalPython" not in plan


def test_select_within_budget_by_stratum_parity_and_guards(spark):
    """Per-stratum budgeted selection: equals the scalar form applied
    per stratum and unioned (the identity contract), dict and
    DataFrame budget shapes agree, unbudgeted strata are excluded,
    zero-budget strata select nothing, and a malformed budget frame or
    staged-column clash is refused."""
    import random

    import pytest

    from inbev_data_engineering_case_spark.operators.sample import (
        select_within_budget,
        select_within_budget_by_stratum,
    )

    rng = random.Random(0x57A7)
    rows = [
        (
            i,
            rng.choice(["a", "b", "c", "d"]),
            rng.randrange(0, 40),
            rng.choice([0.3, 0.55, 0.8]),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, src string, n_tokens long, quality double"
    )
    # d has no budget (excluded); c's zero budget selects nothing —
    # including its zero-cost docs (the scalar short-circuit's case)
    budgets = {"a": 150, "b": 1, "c": 0}
    got = sorted(
        r["doc_id"]
        for r in select_within_budget_by_stratum(
            df, "src", budgets
        ).collect()
    )
    want: list[int] = []
    for s, b in budgets.items():
        want += [
            r["doc_id"]
            for r in select_within_budget(
                df.filter(F.col("src") == s), b
            ).collect()
        ]
    assert got == sorted(want)
    # the DataFrame budget shape selects identically, budget column
    # name free; output schema is the input's, staging columns dropped
    bdf = spark.createDataFrame(
        sorted(budgets.items()), "src string, spend long"
    )
    sel = select_within_budget_by_stratum(df, "src", bdf)
    assert sorted(r["doc_id"] for r in sel.collect()) == got
    assert sel.columns == ["doc_id", "src", "n_tokens", "quality"]
    with pytest.raises(ValueError, match="budgets must be"):
        select_within_budget_by_stratum(
            df, "src", bdf.withColumn("extra", F.lit(1))
        )
    with pytest.raises(ValueError, match="_mq"):
        select_within_budget_by_stratum(
            df.withColumn("_mq", df.doc_id), "src", budgets
        )
    # a NULL budget raises (the family's NULL discipline) instead of
    # silently excluding the stratum
    null_bdf = spark.createDataFrame(
        [("a", 150), ("b", None)], "src string, spend long"
    )
    with pytest.raises(Exception, match="NULL budget"):
        select_within_budget_by_stratum(df, "src", null_bdf).collect()
    # the dict shape honors the same NULL discipline (driver-side)
    with pytest.raises(ValueError, match="NULL budget"):
        select_within_budget_by_stratum(df, "src", {"a": 150, "b": None})
    # an empty dict is refused loudly, not an obscure schema error
    with pytest.raises(ValueError, match="empty budgets"):
        select_within_budget_by_stratum(df, "src", {})
    # a float budget (30e9-style) is refused — the dict shape shares
    # the DataFrame shape's exact-int64 boundary discipline instead
    # of silently comparing _cum <= _blim in double
    with pytest.raises(ValueError, match="non-integer budget"):
        select_within_budget_by_stratum(df, "src", {"a": 150.0, "b": 60})
    # duplicate stratum rows would duplicate boundary output — refused
    dup_bdf = spark.createDataFrame(
        [("a", 150), ("a", 10)], "src string, spend long"
    )
    with pytest.raises(Exception, match="duplicate budget"):
        select_within_budget_by_stratum(df, "src", dup_bdf).collect()
    # the scalar form does NOT reserve the by-stratum staging names
    from inbev_data_engineering_case_spark.operators.sample import (
        select_within_budget as _scalar,
    )

    assert (
        _scalar(df.withColumn("_rn", df.doc_id), 30).columns[-1] == "_rn"
    )


def test_mixture_budgets_arithmetic_and_guards(spark):
    """mixture_budgets: budget_units = (w_s · scarcest-budget) div 1e6
    hand-checked, never exceeds the stratum's own mass (the floor
    bound), strata outside target_ppm get no row, and the shared
    mixture guards raise on a zero-mass stratum."""
    import pytest

    from inbev_data_engineering_case_spark.operators.sample import (
        mixture_budgets,
    )

    rows = [("a", 100)] * 10 + [("b", 100)] * 5 + [("x", 100)] * 3
    df = spark.createDataFrame(
        [(i, s, c) for i, (s, c) in enumerate(rows)],
        "doc_id long, src string, cost long",
    )
    # masses: a=1000, b=500; budget = min(1000e6//5e5, 500e6//5e5) =
    # 1000 (b is scarcest); budget_units = 5e5*1000 div 1e6 = 500 each
    out = {
        r["src"]: r.asDict()
        for r in mixture_budgets(
            df, "src", {"a": 500_000, "b": 500_000}, "cost"
        ).collect()
    }
    assert set(out) == {"a", "b"}  # x: no target row
    assert out["a"]["budget_units"] == 500
    assert out["b"]["budget_units"] == 500
    assert all(v["budget_units"] <= v["n_units"] for v in out.values())
    # asymmetric 3:1 targets, A now the scarce side: budget =
    # min(1000e6 div 75e4, 500e6 div 25e4) = min(1333, 2000) = 1333;
    # a: 75e4·1333 div 1e6 = 999 ≤ 1000; b: 25e4·1333 div 1e6 = 333
    out2 = {
        r["src"]: r["budget_units"]
        for r in mixture_budgets(
            df, "src", {"a": 750_000, "b": 250_000}, "cost"
        ).collect()
    }
    assert out2 == {"a": 999, "b": 333}
    with pytest.raises(Exception, match="ZERO total weight"):
        mixture_budgets(
            df.withColumn(
                "cost",
                F.when(F.col("src") == "b", F.lit(0)).otherwise(
                    F.col("cost")
                ),
            ),
            "src",
            {"a": 500_000, "b": 500_000},
            "cost",
        ).collect()


def test_select_mixture_within_budget_composition_and_plan(spark):
    """The composed mixture-budget selection equals deriving the
    budgets and selecting per stratum explicitly, and its executed
    plan keeps the family's scale locks: no RangePartitioning exchange
    (the corpus never globally sorts) and no Python in the plan."""
    from inbev_data_engineering_case_spark.operators.sample import (
        mixture_budgets,
        select_mixture_within_budget,
        select_within_budget_by_stratum,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("cost"),
        (F.col("n_chars") / 1000.0).alias("quality"),
    )
    target = {"src1": 400_000, "src2": 400_000, "src3": 200_000}
    composed = select_mixture_within_budget(
        docs, "source", target, cost_col="cost"
    )
    explicit = select_within_budget_by_stratum(
        docs,
        "source",
        mixture_budgets(docs, "source", target, "cost").select(
            "source", "budget_units"
        ),
        cost_col="cost",
    )
    got = sorted(r["doc_id"] for r in composed.collect())
    assert got == sorted(r["doc_id"] for r in explicit.collect())
    assert got  # non-vacuous fixture
    plan = (
        composed._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert "BatchEvalPython" not in plan


def test_mixture_rates_weighted_by_units(spark):
    """Token-weighted mixing: the per-stratum mass is sum(weight_col)
    (column named n_units), the budget/rate arithmetic is the same
    exact int64, membership stays the id hash, and the guards raise on
    NULL/negative weights and on a stratum mass past the exact-int64
    bound. Hand-checked rates, plus row-vs-unit divergence when length
    correlates with the stratum."""
    import pytest

    from inbev_data_engineering_case_spark.operators.sample import (
        mixture_rates,
        mixture_sample,
    )

    # long "code" docs vs short "web" docs: equal ROW counts, 4x the
    # unit mass on code
    rows = [(i, "code" if i % 2 else "web", 400 if i % 2 else 100)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    target = {"code": 500_000, "web": 500_000}

    by_rows = {
        r["src"]: r["rate_ppm"]
        for r in mixture_rates(df, "src", target).collect()
    }
    assert by_rows == {"code": 1_000_000, "web": 1_000_000}

    by_units = {
        r["src"]: r
        for r in mixture_rates(df, "src", target, weight_col="w").collect()
    }
    # masses: code 8000, web 2000; budget = min(8000*1e6/5e5,
    # 2000*1e6/5e5) = 4000; kept_s = 2000 -> code rate 250000, web 1e6
    assert by_units["code"]["n_units"] == 8000
    assert by_units["web"]["n_units"] == 2000
    assert by_units["code"]["rate_ppm"] == 250_000
    assert by_units["web"]["rate_ppm"] == 1_000_000

    # the sampler composes: kept set = hash membership under the
    # weighted rates (web kept whole, code down to ~a quarter)
    kept = mixture_sample(df, "src", target, weight_col="w")
    kept_by = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert kept_by["web"] == 20 and 0 < kept_by["code"] < 20

    with pytest.raises(Exception, match="NULL or negative weight"):
        mixture_rates(
            spark.createDataFrame(
                [(1, "a", -3)], "doc_id long, src string, w long"
            ),
            "src",
            {"a": 1_000_000},
            weight_col="w",
        ).collect()
    with pytest.raises(Exception, match="exact int64 bound"):
        mixture_rates(
            spark.createDataFrame(
                [(1, "a", (2**63 - 1) // 1_000_000 + 1)],
                "doc_id long, src string, w long",
            ),
            "src",
            {"a": 1_000_000},
            weight_col="w",
        ).collect()
    # an in-target zero-mass stratum would zero the global budget and
    # silently empty the whole mixture — it raises instead; the same
    # stratum OUTSIDE the target is simply dropped by the join
    zero = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 10)], "doc_id long, src string, w long"
    )
    with pytest.raises(Exception, match="ZERO total weight"):
        mixture_rates(
            zero, "src", {"a": 500_000, "b": 500_000}, weight_col="w"
        ).collect()
    ok = {
        r["src"]: r["rate_ppm"]
        for r in mixture_rates(
            zero, "src", {"b": 1_000_000}, weight_col="w"
        ).collect()
    }
    assert ok == {"b": 1_000_000}
