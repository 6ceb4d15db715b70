"""Measure the decode surface: one representative asset per media
kind through ``decode_features(real_decoder=True)`` and the per-kind
``decode_reason_report`` shares — the number the decoder-gap rule
sizes investments by (SOF2 was sized this way before r9 built it;
libwebp closed lossy VP8 in r10; libheif closed AVIF/HEIC in r11).

Run:  python tools/decode_report_probe.py

Prints the report table plus an OK/GAP summary per kind. Every OK
line is a format whose content decodes natively or through a bound
system library in THIS container; every decoder_gap line is an
honestly reason-coded refusal (see COVERAGE.md's r11 scoping notes
for why each remaining gap stands: normative spec tables with no
in-environment verification path, or no system codec library).
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def _pnm(px):
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _wav(tag: int, bits: int, data: bytes, rate=8000, ch=1) -> bytes:
    ba = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ba, ba, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _y4m(w, h, lumas):
    hdr = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (w, h)
    frames = b"".join(
        b"FRAME\n"
        + bytes([y]) * (w * h)
        + bytes([128]) * (w * h // 2)
        for y in lumas
    )
    return hdr + frames


def build_assets():
    from inbev_data_engineering_case_spark.operators import (
        libheif,
        libwebp,
    )
    from inbev_data_engineering_case_spark.operators.flac import (
        flac_encode,
    )
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _avi_encode_mjpeg,
        _jpeg_encode_baseline,
        _jpeg_encode_cmyk,
        _jpeg_encode_progressive,
    )
    from inbev_data_engineering_case_spark.operators.webp import (
        vp8l_encode,
    )

    g = _gradient(24, 32)
    rgba = np.dstack([g, np.full(g.shape[:2], 255, np.uint8)])
    baseline = _jpeg_encode_baseline(g, quality=90)
    pcm = struct.pack(
        "<32h", *[int(2000 * np.sin(i / 3)) for i in range(32)]
    )
    mjpeg = _avi_encode_mjpeg([g, np.roll(g, 3, 1)], quality=88, fps=5)

    assets = [
        ("image/x-portable-pixmap", _pnm(g)),
        ("image/jpeg", baseline),
        ("image/jpeg", _jpeg_encode_progressive(g, quality=90)),
        ("image/jpeg", _jpeg_encode_cmyk(
            np.dstack([g, np.full(g.shape[:2], 200, np.uint8)]))),
        # arithmetic-coded: re-marked SOF0->SOF9, refused pre-entropy
        ("image/jpeg", baseline.replace(b"\xff\xc0", b"\xff\xc9", 1)),
        ("image/webp", vp8l_encode(rgba)),
        ("audio/wav", _wav(1, 16, pcm)),
        ("audio/wav", _wav(0x0011, 4, b"\x00" * 256)),  # IMA ADPCM
        ("audio/flac", flac_encode(
            list(struct.unpack("<32h", pcm)), 8000)),
        ("audio/mpeg", b"ID3\x03\x00\x00\x00\x00\x00\x00" + b"\xff\xfb" * 64),
        ("video/y4m", _y4m(16, 12, [40, 90, 140])),
        ("video/avi", mjpeg),
        ("video/avi", mjpeg.replace(b"vidsMJPG", b"vidsXVID", 1)),
        ("video/mp4", b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64),
        ("application/octet-stream", os.urandom(96)),
    ]
    if libwebp.available():
        assets.append(("image/webp", libwebp.encode_rgba(rgba, 80.0)))
    if libheif.have_encoder(libheif.COMPRESSION_AV1):
        avif = libheif.encode(g, libheif.COMPRESSION_AV1, 85)
        assets.append(("image/avif", avif))
        if libheif.have_decoder(libheif.COMPRESSION_AV1):
            # AV1-in-MP4 / AV1-in-WebM (closed r12): the shared
            # fixture un-boxer + minimal muxers build real container
            # payloads from the SAME encoded AVIF's primary item
            from inbev_data_engineering_case_spark.av1_fixtures import (
                avif_primary_item,
                mux_av1_mp4,
                mux_av1_webm,
            )

            av1c, w, h, item = avif_primary_item(avif)
            assets.append(("video/mp4", mux_av1_mp4(av1c, w, h, item)))
            assets.append(
                ("video/webm", mux_av1_webm(av1c[8:], w, h, item))
            )
    if libheif.have_encoder(libheif.COMPRESSION_HEVC):
        assets.append(
            ("image/heic", libheif.encode(g, libheif.COMPRESSION_HEVC, 85))
        )
    return assets


def main() -> None:
    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
        decode_reason_report,
    )
    from inbev_data_engineering_case_spark.session import get_spark

    spark = get_spark("decode-report-probe")
    assets = build_assets()
    df = spark.createDataFrame(
        [
            (i, mt, payload, {"n_bytes": len(payload), "source": "probe"})
            for i, (mt, payload) in enumerate(assets)
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    report = decode_reason_report(
        decode_features(df, real_decoder=True)
    ).collect()
    print(f"\n{len(assets)} assets, {len(report)} (media_type, reason) kinds")
    print(f"{'media_type':28} {'reason':13} {'n':>3} {'ppm':>8}  detail")
    gaps = 0
    for r in report:
        if r["reason"] == "decoder_gap":
            gaps += r["n_assets"]
        print(
            f"{r['media_type']:28} {r['reason']:13} {r['n_assets']:>3}"
            f" {r['share_ppm']:>8}  {(r['detail'] or '')[:60]}"
        )
    oks = sum(r["n_assets"] for r in report if r["reason"] == "ok")
    print(
        f"\ndecoded ok: {oks}/{len(assets)}; decoder_gap: {gaps}"
        " (arithmetic JPEG, ADPCM, mp3, non-MJPEG AVI, non-AV1"
        " mp4/webm content — scoped in COVERAGE.md r11/r12 notes;"
        " AV1-in-MP4/WebM closed r12)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
