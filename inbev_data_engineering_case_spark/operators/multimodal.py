"""Multimodal-column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schema, partitioning,
UDF signature, batch shape. The actual media decoding is STUBBED: the
image/audio libraries are not in this container, so ``decode_features``
routes to a deterministic fake featurizer by default and raises
``NotImplementedError`` from the clearly-marked real branch. Swapping in a
real decoder (PIL/librosa/ffmpeg) changes only the inner function — the
distributed plumbing is already the production shape:

- **Arrow batches, not rows**: ``mapInPandas`` streams pandas DataFrames of
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows; payload bytes move
  driver-free from the JVM columnar buffers into Python once per batch.
- **Partition sizing**: media payloads are large — callers should
  ``repartition`` so a partition's payload sum fits executor memory
  (``target_rows_per_partition`` helper); the transform itself is
  shuffle-free.
- **Typed metadata travels with the payload** (struct column), so
  downstream filters (width ≥ X, duration ≤ Y) prune *before* decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

FEATURE_DIM = 4


def assets_from_documents(documents: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture: the text
    payload stands in for media bytes (deterministic, so tests and oracles
    agree). Real pipelines land payloads the same way: binary column +
    metadata struct."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_featurize(payload: bytes) -> tuple[int, list[float]]:
    """Deterministic stand-in for a media decoder: byte-sum checksum and a
    tiny moment vector. Pure function of the bytes — reproducible anywhere."""
    n = len(payload)
    checksum = sum(payload) % 1_000_003
    mean = sum(payload) / n if n else 0.0
    first = float(payload[0]) if n else 0.0
    last = float(payload[-1]) if n else 0.0
    return checksum, [float(n), mean, first, last]


def _featurize_bmp(payload: bytes) -> tuple[int, list[float]]:
    """Pure-stdlib BMP decode (uncompressed BI_RGB, 8/24/32 bpp): header
    parse via ``struct``, pixel raster via numpy with the 4-byte row padding
    stripped. Feature = [width, height, bpp, mean pixel value]; checksum =
    crc32 of the unpadded raster (padding bytes are undefined by the format
    and must not affect the fingerprint). Negative height (top-down rows)
    only flips row order, which neither the mean nor the per-row crc input
    order here depends on — we hash rows in stored order either way."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(
            f"unsupported BMP variant (compression={compression}, bpp={bpp})"
        )
    abs_h, bytes_pp = abs(height), bpp // 8
    row_stride = ((width * bytes_pp + 3) // 4) * 4
    if pix_off + row_stride * abs_h > len(payload):
        raise ValueError("BMP raster truncated")
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * abs_h, offset=pix_off
    )
    pixels = raster.reshape(abs_h, row_stride)[:, : width * bytes_pp]
    checksum = zlib.crc32(pixels.tobytes()) % 1_000_003
    mean_px = float(pixels.astype(np.float64).mean()) if pixels.size else 0.0
    return checksum, [float(width), float(abs_h), float(bpp), mean_px]


def _featurize_pnm(payload: bytes) -> tuple[int, list[float]]:
    """Pure-stdlib binary PNM decode (P6 PPM = RGB, P5 PGM = gray, 8-bit
    maxval): whitespace/comment-tolerant header tokenizer, then the raster
    straight out of numpy. Feature = [width, height, channels, mean sample];
    checksum = crc32 of the raster."""
    import zlib

    import numpy as np

    magic = payload[:2]
    channels = {b"P6": 3, b"P5": 1}.get(magic)
    if channels is None:
        raise ValueError("not a binary PNM payload (P5/P6 magic expected)")
    # header: magic, then width/height/maxval as ASCII ints separated by
    # whitespace, with '#'-to-EOL comments allowed anywhere between tokens
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(payload):
            raise ValueError("PNM header truncated")
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < len(payload) and payload[i] != ord("\n"):
                i += 1
        elif ord("0") <= c <= ord("9"):
            j = i
            while j < len(payload) and ord("0") <= payload[j] <= ord("9"):
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError(f"malformed PNM header at byte {i}")
    width, height, maxval = tokens
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PNM maxval {maxval} (8-bit only)")
    i += 1  # exactly ONE whitespace byte separates maxval from the raster
    count = width * height * channels
    if i + count > len(payload):
        raise ValueError("PNM raster truncated")
    raster = np.frombuffer(payload, dtype=np.uint8, count=count, offset=i)
    checksum = zlib.crc32(raster.tobytes()) % 1_000_003
    mean_px = float(raster.astype(np.float64).mean()) if raster.size else 0.0
    return checksum, [float(width), float(height), float(channels), mean_px]


def _stdlib_featurize(media_type: str, payload: bytes) -> tuple[int, list[float]]:
    """REAL decoders built from the stdlib, so the mapInPandas plumbing is
    exercised end-to-end by genuine decoding (not the deterministic fake):

    - ``audio/wav``: parsed with ``wave`` — feature = [duration_s,
      framerate, n_channels, mean |amplitude|] over the decoded PCM frames,
      checksum = crc32 of the raw frames.
    - ``image/*``: BMP (BI_RGB 8/24/32bpp) and binary PNM (P5/P6) decode
      for real — header parse + raster mean/crc32, dispatched on the
      payload magic so mislabeled subtypes still decode. Compressed
      formats (PNG/JPEG/...) need PIL and raise.
    - ``video/*``: container demux needs ffmpeg — not installed here,
      raises NotImplementedError (the remaining honest stub).
    - anything else: treated as opaque binary — crc32 checksum and
      compressibility features (zlib ratio), the standard corpus-QA signal.
    """
    import zlib

    if media_type in ("audio/wav", "audio/x-wav"):
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(payload)) as w:
            nch = w.getnchannels()
            sampwidth = w.getsampwidth()
            framerate = w.getframerate()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
        checksum = zlib.crc32(frames) % 1_000_003
        if sampwidth == 2 and frames:
            samples = np.frombuffer(frames, dtype="<i2")
            mean_abs = float(np.abs(samples.astype(np.int64)).mean())
        elif frames:
            mean_abs = float(np.frombuffer(frames, dtype=np.uint8).mean())
        else:
            mean_abs = 0.0
        duration = n_frames / framerate if framerate else 0.0
        return checksum, [duration, float(framerate), float(nch), mean_abs]
    if media_type.partition("/")[0] == "image":
        if payload[:2] == b"BM":
            return _featurize_bmp(payload)
        if payload[:2] in (b"P5", b"P6"):
            return _featurize_pnm(payload)
        raise NotImplementedError(
            "compressed image decoding (PNG/JPEG/...) requires PIL, which "
            "is not installed in this environment; BMP and binary PNM "
            "decode natively — see _featurize_bmp/_featurize_pnm."
        )
    if media_type.partition("/")[0] == "video":
        raise NotImplementedError(
            "real video decoding requires PIL/ffmpeg, which are not "
            "installed in this environment; the mapInPandas plumbing is the "
            "production path — add the decoder for these media types here."
        )
    checksum = zlib.crc32(payload) % 1_000_003
    n = len(payload)
    ratio = len(zlib.compress(payload)) / n if n else 0.0
    first = float(payload[0]) if n else 0.0
    last = float(payload[-1]) if n else 0.0
    return checksum, [float(n), ratio, first, last]


def decode_features(
    assets: DataFrame, real_decoder: bool = False
) -> DataFrame:
    """Decode/feature-extract each asset via Arrow-batched ``mapInPandas``.

    ``real_decoder=True`` routes to the stdlib decoders in
    ``_stdlib_featurize`` (real WAV parsing via ``wave``+numpy, crc32/zlib
    features for opaque binary; image/video still need PIL/ffmpeg and
    raise). The default fake featurizer stays the oracle-checked path —
    its output is reproducible in SQL, the crc32/PCM decoders' is not."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            checksums, features = [], []
            for media_type, payload in zip(
                batch["media_type"], batch["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if real_decoder:
                    checksum, feature = _stdlib_featurize(media_type, payload)
                else:
                    checksum, feature = _fake_featurize(payload)
                checksums.append(checksum)
                features.append(feature)
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "media_type": batch["media_type"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in batch["payload"]],
                    "checksum": checksums,
                    "feature": features,
                }
            )

    return assets.mapInPandas(featurize, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = ASSET_SCHEMA

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def resize_assets(
    assets: DataFrame, target_bytes: int = 64, real_decoder: bool = False
) -> DataFrame:
    """Resize each asset payload (1→1 binary transform, same asset schema
    out). The real branch would decode → resample → re-encode (PIL/ffmpeg);
    the stub truncates/zero-pads to ``target_bytes`` — deterministic, and
    exercises the exact production plumbing: binary in, binary out, metadata
    recomputed from the new payload."""
    if real_decoder:
        raise NotImplementedError(
            "real image/audio resizing requires PIL/ffmpeg (not installed); "
            "replace the stub body inside `resize` below."
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_payloads, metas = [], []
            for payload, meta in zip(batch["payload"], batch["meta"]):
                b = bytes(payload) if payload is not None else b""
                resized = b[:target_bytes].ljust(target_bytes, b"\0")
                out_payloads.append(resized)
                metas.append(
                    {"n_bytes": len(resized), "source": meta["source"]}
                )
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "media_type": batch["media_type"],
                    "payload": out_payloads,
                    "meta": metas,
                }
            )

    return assets.mapInPandas(resize, schema=RESIZE_SCHEMA)


def sample_frames(
    assets: DataFrame,
    frame_bytes: int = 32,
    every_n: int = 2,
    real_decoder: bool = False,
) -> DataFrame:
    """Frame-sample each asset (1→N explode: one output row per kept frame).
    The real branch would demux the container and keep every n-th video
    frame; the stub treats the payload as fixed-size byte chunks. The
    distributed shape is the production one: ``mapInPandas`` may yield more
    rows than it consumes, frames inherit the asset id for downstream joins,
    and no shuffle happens until something groups on asset_id."""
    if real_decoder:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg/pyav (not installed); "
            "replace the chunking inside `sample` below."
        )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, frames = [], [], []
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                b = bytes(payload) if payload is not None else b""
                chunks = [
                    b[o : o + frame_bytes]
                    for o in range(0, len(b), frame_bytes)
                ]
                for i in range(0, len(chunks), every_n):
                    ids.append(asset_id)
                    idxs.append(i)
                    frames.append(chunks[i])
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return assets.mapInPandas(sample, schema=FRAME_SCHEMA)


def target_rows_per_partition(
    avg_payload_bytes: int, budget_bytes: int = 256 * 1024 * 1024
) -> int:
    """Rows per partition so a partition's payloads fit the memory budget —
    the repartition hint for large media (e.g. 2 MB images → ~128 rows)."""
    return max(1, budget_bytes // max(avg_payload_bytes, 1))
