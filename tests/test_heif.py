"""AVIF/HEIC decode tests: the system-libheif binding (the libwebp
capability-probe discipline applied to the HEIF family) — genuine
AV1 and HEVC round-trips through the container's dav1d/aom/libde265
plugins, the ftyp brand sniffer, Spark-side routing through
decode_features / resize_assets with reason-coded dead-letters when
the library or a codec plugin is absent, and the bomb guard."""

from __future__ import annotations

import numpy as np
import pytest

from inbev_data_engineering_case_spark.av1_fixtures import (
    avif_primary_item as _avif_primary_item,
    mux_av1_mp4 as _mux_av1_mp4,
    mux_av1_webm as _mux_av1_webm,
)
from inbev_data_engineering_case_spark.operators import libheif as LH

AVIF_OK = LH.have_decoder(LH.COMPRESSION_AV1) and LH.have_encoder(
    LH.COMPRESSION_AV1
)
HEIC_OK = LH.have_decoder(LH.COMPRESSION_HEVC) and LH.have_encoder(
    LH.COMPRESSION_HEVC
)


def _gradient(h, w):
    """Smooth raster — lossy codecs reproduce it within a tight bound,
    so round-trips assert real decode, not accidental pass-through."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_is_heif_brand_sniffer():
    assert LH.is_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 12)
    assert LH.is_heif(b"\x00\x00\x00\x18ftypheic" + b"\x00" * 12)
    # compatible-brand carry: major isom, avif in the compat list
    assert LH.is_heif(
        b"\x00\x00\x00\x1cftypisom\x00\x00\x00\x00isomavif" + b"\x00" * 4
    )
    assert not LH.is_heif(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    assert not LH.is_heif(b"\x00\x00\x00\x18ftypisom----avc1")
    assert not LH.is_heif(b"")


@pytest.mark.skipif(not AVIF_OK, reason="libheif AV1 plugins absent")
def test_avif_roundtrip_real_av1():
    img = _gradient(48, 64)
    payload = LH.encode(img, LH.COMPRESSION_AV1, quality=90)
    assert payload[4:8] == b"ftyp" and LH.is_heif(payload)
    out = LH.decode_rgb(payload)
    assert out.shape == (48, 64, 3)
    err = float(np.abs(out.astype(int) - img.astype(int)).mean())
    assert err < 6.0  # real lossy decode, not garbage


@pytest.mark.skipif(not HEIC_OK, reason="libheif HEVC plugins absent")
def test_heic_roundtrip_real_hevc():
    img = _gradient(32, 40)
    payload = LH.encode(img, LH.COMPRESSION_HEVC, quality=90)
    assert LH.is_heif(payload)
    out = LH.decode_rgb(payload)
    assert out.shape == (32, 40, 3)
    err = float(np.abs(out.astype(int) - img.astype(int)).mean())
    assert err < 6.0


@pytest.mark.skipif(not LH.available(), reason="libheif absent")
def test_heif_garbage_is_corrupt_not_gap():
    with pytest.raises(ValueError):
        LH.decode_rgb(b"\x00\x00\x00\x18ftypavif" + b"junk" * 16)


def test_heif_unavailable_is_capability_gap(monkeypatch):
    """With the library gone, the contract is NotImplementedError —
    the reason-coded decoder_gap, never a crash or a silent wrong."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_heif,
    )

    monkeypatch.setattr(LH, "available", lambda: False)
    with pytest.raises(NotImplementedError, match="libheif"):
        _featurize_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 12)


@pytest.mark.skipif(not AVIF_OK, reason="libheif AV1 plugins absent")
def test_heif_gap_not_misfiled_as_corrupt_when_pil_flails(monkeypatch):
    """With libheif gone and a PIL that CANNOT decode HEIF (stock
    Pillow), the featurize and resize dispatches must surface the
    capability NotImplementedError — not PIL's failure, which the
    dead-letter router would misfile as 'corrupt' (the G.711
    misfiling class)."""
    from inbev_data_engineering_case_spark.operators import multimodal

    payload = LH.encode(_gradient(8, 8), LH.COMPRESSION_AV1, quality=90)

    class _FakePil:
        pass

    def boom(_payload):
        raise ValueError("cannot identify image file")

    monkeypatch.setattr(LH, "_lib", lambda: None)  # available() + decode
    monkeypatch.setattr(multimodal, "_optional_pil", lambda: _FakePil())
    monkeypatch.setattr(multimodal, "_pil_decode_pixels", boom)
    with pytest.raises(NotImplementedError, match="libheif"):
        multimodal._stdlib_featurize("image/avif", payload)
    with pytest.raises(NotImplementedError, match="libheif"):
        multimodal._decode_image_pixels(payload)


@pytest.mark.skipif(not LH.available(), reason="libheif absent")
def test_heif_missing_plugin_is_decoder_gap(monkeypatch):
    """Library present but the brand's codec plugin absent: the brand
    names the plugin in the decoder_gap message."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_heif,
    )

    monkeypatch.setattr(LH, "have_decoder", lambda fmt: False)
    with pytest.raises(NotImplementedError, match="dav1d"):
        _featurize_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 12)
    with pytest.raises(NotImplementedError, match="libde265"):
        _featurize_heif(b"\x00\x00\x00\x18ftypheic" + b"\x00" * 12)


@pytest.mark.skipif(not AVIF_OK or not HEIC_OK,
                    reason="libheif plugins absent")
def test_heif_through_spark_featurize_and_resize(spark):
    """End to end through the Arrow operators: AVIF and HEIC assets
    featurize (decoded-RGB checksum + [w, h, 24, mean]) and resize
    (decode -> downsample -> PNM) through the same mapInPandas
    plumbing as every other image format; a corrupt HEIF dead-letters
    as corrupt, and with the library monkeypatched away the row is a
    reason-coded decoder_gap."""
    from inbev_data_engineering_case_spark.operators import multimodal
    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
        decode_reason_report,
        resize_assets,
    )

    img = _gradient(40, 56)
    avif = LH.encode(img, LH.COMPRESSION_AV1, quality=90)
    heic = LH.encode(img, LH.COMPRESSION_HEVC, quality=90)
    corrupt = b"\x00\x00\x00\x18ftypavif" + b"zz" * 40
    assets = spark.createDataFrame(
        [
            (1, "image/avif", avif, {"n_bytes": len(avif), "source": "t"}),
            (2, "image/heic", heic, {"n_bytes": len(heic), "source": "t"}),
            (3, "image/avif", corrupt,
             {"n_bytes": len(corrupt), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    feats = decode_features(assets, real_decoder=True)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert rows[1]["decode_ok"] and rows[1]["feature"][:3] == [
        56.0, 40.0, 24.0,
    ]
    assert rows[2]["decode_ok"] and rows[2]["feature"][:3] == [
        56.0, 40.0, 24.0,
    ]
    # the decoded rasters differ (different codecs) but both sit near
    # the source mean — a real decode signal
    src_mean = float(img.astype(np.float64).mean())
    assert abs(rows[1]["feature"][3] - src_mean) < 4.0
    assert abs(rows[2]["feature"][3] - src_mean) < 4.0
    assert rows[3]["reason"] == "corrupt"

    report = {
        (r["media_type"], r["reason"]): r
        for r in decode_reason_report(feats).collect()
    }
    assert report[("image/avif", "ok")]["n_assets"] == 1
    assert report[("image/avif", "corrupt")]["n_assets"] == 1
    assert report[("image/heic", "ok")]["n_assets"] == 1

    resized = {
        r["asset_id"]: r
        for r in resize_assets(
            assets.filter("asset_id < 3"), target_bytes=1000,
            real_decoder=True,
        ).collect()
    }
    assert resized[1]["decode_ok"] and resized[2]["decode_ok"]
    assert resized[1]["media_type"] == "image/x-portable-pixmap"
    assert len(resized[1]["payload"]) <= 1100  # header slack
    # avoid "multimodal" unused when the skip guards trim the suite
    assert multimodal is not None


@pytest.mark.skipif(not AVIF_OK, reason="libheif AV1 plugins absent")
def test_av1_in_mp4_decodes_via_libheif_reboxing():
    """AV1-in-MP4 video: the first sync sample demuxes out of the
    sample tables, re-boxes as a one-item AVIF, and decodes through
    the same dav1d/aom plugin — features identical to decoding the
    original AVIF still, dims from the sample entry, and the sample
    bytes byte-identical to the AVIF's primary item."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_heif,
        _featurize_mp4_av1,
        _mp4_av1_keyframe,
        video_metadata,
    )

    img = _gradient(40, 56)
    avif = LH.encode(img, LH.COMPRESSION_AV1, quality=90)
    av1c, w, h, item = _avif_primary_item(avif)
    assert (w, h) == (56, 40)
    mp4 = _mux_av1_mp4(av1c, w, h, item)

    got_av1c, gw, gh, sample = _mp4_av1_keyframe(mp4)
    assert (got_av1c, gw, gh) == (av1c, 56, 40)
    assert sample == item  # byte-identical demux

    assert _featurize_mp4_av1(mp4) == _featurize_heif(avif)

    # the metadata surface agrees (tkhd display dims, header-only walk)
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _parse_mp4_metadata,
    )

    assert _parse_mp4_metadata(mp4)[:2] == (56, 40)


@pytest.mark.skipif(not LH.available(), reason="libheif absent")
def test_mp4_without_av1_track_stays_reason_coded():
    """A non-AV1 MP4 keeps its honest decoder_gap: the av01 router
    raises NotImplementedError naming the missing capability instead
    of misfiling the asset as corrupt."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _mp4_av1_keyframe,
    )

    # minimal MP4 with an avc1 (h264) sample entry instead of av01
    # (replace every occurrence — the first is the ftyp brand)
    fake = _mux_av1_mp4(b"\x00\x00\x00\x0cavcCxxxx", 8, 8, b"\x00" * 16)
    fake = fake.replace(b"av01", b"avc1")
    with pytest.raises(NotImplementedError, match="av01"):
        _mp4_av1_keyframe(fake)


@pytest.mark.skipif(not AVIF_OK, reason="libheif AV1 plugins absent")
def test_av1_in_webm_decodes_via_libheif_reboxing():
    """AV1-in-WebM: CodecPrivate IS the av1C record, the first
    keyframe SimpleBlock demuxes byte-identically, and the features
    match the source AVIF through the same re-box path. A laced block
    and a BlockGroup keyframe (no ReferenceBlock) both behave; a
    VP9-only WebM stays reason-coded."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_heif,
        _featurize_webm_av1,
        _webm_av1_keyframe,
    )

    img = _gradient(40, 56)
    avif = LH.encode(img, LH.COMPRESSION_AV1, quality=90)
    av1c, w, h, item = _avif_primary_item(avif)
    webm = _mux_av1_webm(av1c[8:], w, h, item)  # private = box BODY

    got_av1c, gw, gh, frame = _webm_av1_keyframe(webm)
    assert (got_av1c, gw, gh) == (av1c, 56, 40)
    assert frame == item
    assert _featurize_webm_av1(webm) == _featurize_heif(avif)

    # BlockGroup keyframe form: Block + no ReferenceBlock
    group_webm = _mux_av1_webm(av1c[8:], w, h, item, group=True)
    assert _webm_av1_keyframe(group_webm)[3] == item

    # laced block: honest reason code, not garbage
    laced = webm.replace(
        b"\x81\x00\x00\x80" + item[:4], b"\x81\x00\x00\x86" + item[:4]
    )
    with pytest.raises(NotImplementedError, match="laced"):
        _webm_av1_keyframe(laced)

    # VP9 WebM: different codec, reason-coded gap
    vp9 = _mux_av1_webm(b"", w, h, item).replace(b"V_AV1", b"V_VP9")
    with pytest.raises(NotImplementedError, match="V_AV1"):
        _webm_av1_keyframe(vp9)


@pytest.mark.skipif(not AVIF_OK, reason="libheif AV1 plugins absent")
def test_mp4_webm_truncated_tables_and_gap_reclassification(monkeypatch):
    """Lying sample tables raise ValueError (bounds checks — never a
    silent read of adjacent boxes' bytes), and through the featurize
    router WITHOUT ffmpeg the partial-demuxer verdict is the
    capability gap naming ffmpeg, not corrupt — for MP4 and WebM
    both."""
    import struct

    from inbev_data_engineering_case_spark.operators import multimodal
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _mp4_av1_keyframe,
        _stdlib_featurize,
        _webm_av1_keyframe,
    )

    img = _gradient(16, 24)
    avif = LH.encode(img, LH.COMPRESSION_AV1, quality=90)
    av1c, w, h, item = _avif_primary_item(avif)
    mp4 = _mux_av1_mp4(av1c, w, h, item)

    def lie(tag, delta, value):
        buf = bytearray(mp4)
        struct.pack_into(">I", buf, mp4.index(tag) + delta, value)
        return bytes(buf)

    # entry_count/sample_count inflated past the declaring box
    with pytest.raises(ValueError, match="stsz table truncated"):
        _mp4_av1_keyframe(lie(b"stsz", 12, 9999))
    with pytest.raises(ValueError, match="stsc table truncated"):
        _mp4_av1_keyframe(lie(b"stsc", 8, 9999))
    with pytest.raises(ValueError, match="stco table truncated"):
        _mp4_av1_keyframe(lie(b"stco", 8, 9999))
    # an stsc whose runs cannot cover the sync sample (first_chunk
    # past the single stco chunk) raises instead of reading garbage
    with pytest.raises(ValueError, match="stsc"):
        _mp4_av1_keyframe(
            mp4.replace(
                struct.pack(">IIII", 1, 1, 1, 1),
                struct.pack(">IIII", 1, 7, 1, 1),
            )
        )

    # keyframe-less WebM cluster: ValueError from the demuxer
    webm = _mux_av1_webm(av1c[8:], w, h, item)
    no_key = webm.replace(
        b"\x81\x00\x00\x80" + item[:4], b"\x81\x00\x00\x00" + item[:4]
    )
    with pytest.raises(ValueError, match="keyframe"):
        _webm_av1_keyframe(no_key)

    # through the router with NO ffmpeg: the partial-demuxer verdict
    # is decoder_gap naming ffmpeg (a fragmented MP4 or keyframe-less
    # first cluster can be a VALID file), never corrupt
    monkeypatch.setattr(multimodal, "_optional_ffmpeg", lambda: None)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        _stdlib_featurize("video/mp4", lie(b"stsz", 12, 9999))
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        _stdlib_featurize("video/webm", no_key)
