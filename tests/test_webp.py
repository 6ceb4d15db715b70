"""WebP VP8L codec tests: encoder/decoder round trips over every
encoder feature (plain literals, subtract-green, palette packing at
every width, color cache, run-length LZ77), hand-built bitstreams for
the decoder paths the fixture encoder doesn't emit (all 14 predictor
modes, the color transform, meta-Huffman group switching, non-trivial
LZ77 plane distances), and the Spark-side routing: VP8L decodes
natively through decode_features / resize_assets; lossy VP8 decodes
via the system libwebp when its capability probe resolves (with
bidirectional VP8L parity against that independent implementation)
and stays the reason-coded decoder_gap dead-letter when it doesn't;
animated WebP decodes FRAME 1 composed onto the canvas (the GIF
first-frame discipline), with a lossy first frame riding the same
libwebp gate."""

from __future__ import annotations

import numpy as np
import pytest

from inbev_data_engineering_case_spark.operators import webp as W


def _rand_img(rng, h, w, ncol=None):
    if ncol:
        pal = rng.randint(0, 256, (ncol, 4), dtype=np.uint8)
        return pal[rng.randint(0, ncol, (h, w))]
    return rng.randint(0, 256, (h, w, 4), dtype=np.uint8)


def test_vp8l_roundtrip_all_encoder_features():
    rng = np.random.RandomState(7)
    option_sets = (
        {},
        {"use_subtract_green": True},
        {"cache_bits": 4},
        {"rle": True},
        {"rle": True, "cache_bits": 3},
        {"use_subtract_green": True, "rle": True},
    )
    for trial in range(24):
        h, w = rng.randint(1, 12), rng.randint(1, 12)
        img = _rand_img(rng, h, w, ncol=(None, 3, None, 2)[trial % 4])
        if trial % 4 == 3:  # runs: repeat one column
            img = np.repeat(img[:, :1], w, axis=1)
        for opts in option_sets:
            out = W.webp_decode(W.vp8l_encode(img, **opts))
            assert np.array_equal(out, img), (trial, opts)


def test_vp8l_roundtrip_palette_every_packing_width():
    """Palette sizes straddling each packed-pixel mode: ≤2 → 8 px per
    green byte, ≤4 → 4, ≤16 → 2, >16 → unpacked."""
    rng = np.random.RandomState(11)
    for ncol in (2, 3, 4, 5, 15, 16, 17, 40, 200):
        h, w = rng.randint(1, 14), rng.randint(1, 14)
        img = _rand_img(rng, h, w, ncol=ncol)
        for opts in (
            {"use_palette": True},
            {"use_palette": True, "use_subtract_green": True},
            {"use_palette": True, "rle": True},
        ):
            out = W.webp_decode(W.vp8l_encode(img, **opts))
            assert np.array_equal(out, img), (ncol, opts)


def test_vp8l_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 9),
        w=st.integers(1, 9),
        seed=st.integers(0, 2**16),
        sub_green=st.booleans(),
        palette=st.booleans(),
        cache=st.sampled_from([0, 2, 5]),
        rle=st.booleans(),
    )
    def prop(h, w, seed, sub_green, palette, cache, rle):
        rng = np.random.RandomState(seed)
        img = _rand_img(rng, h, w, ncol=rng.randint(2, 9))
        out = W.webp_decode(
            W.vp8l_encode(
                img,
                use_subtract_green=sub_green,
                use_palette=palette,
                cache_bits=cache,
                rle=rle,
            )
        )
        assert np.array_equal(out, img)

    prop()


def _pack(img):
    a = img.astype(np.uint32)
    return [
        int(v)
        for v in (
            (a[..., 3] << 24) | (a[..., 0] << 16) | (a[..., 1] << 8)
            | a[..., 2]
        ).reshape(-1)
    ]


def _sub_px(a, b):
    """Per-channel (a - b) & 0xff over packed ARGB."""
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) - ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _header(bw, w, h):
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 1)
    bw.write(3, 0)


def test_vp8l_predictor_transform_all_modes():
    """The fixture encoder never emits the predictor transform, so the
    decoder path is pinned with hand-built streams: one per predictor
    mode, residuals computed forward from the target image (the
    reconstruction IS the target, so neighbor reads match), one tile
    covering the whole 4x4 image. Includes the Select and clamped
    add/subtract modes and the rightmost-column TR aliasing."""
    rng = np.random.RandomState(3)
    img = _rand_img(rng, 4, 4)
    target = _pack(img)
    w = h = 4
    for mode in range(14):
        res = [0] * (w * h)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if y == 0 and x == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = target[i - 1]
                elif x == 0:
                    pred = target[i - w]
                else:
                    pred = W._predict(
                        mode,
                        target[i - 1],
                        target[i - w],
                        target[i - w - 1],
                        target[i - w + 1],
                    )
                res[i] = _sub_px(target[i], pred)
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)  # transform present
        bw.write(2, 0)  # predictor
        bits = 2
        bw.write(3, bits - 2)
        W._encode_image(
            bw, [0xFF000000 | (mode << 8)], 0, False, is_main=False
        )
        bw.write(1, 0)  # no more transforms
        W._encode_image(bw, res, 0, False, is_main=True)
        out = W.webp_decode(_wrap(bw.finish()))
        assert np.array_equal(out, img), f"predictor mode {mode}"


def test_vp8l_color_transform():
    """Hand-built color-transform stream: known multipliers (packed per
    libwebp's ColorCodeToMultipliers: blue byte = green_to_red, green
    byte = green_to_blue, red byte = red_to_blue, incl. negative int8
    values), residuals computed with the forward transform — decode
    must restore the exact pixels."""
    rng = np.random.RandomState(5)
    img = _rand_img(rng, 3, 5)
    target = _pack(img)
    g2r, g2b, r2b = 0x40, 0xE0, 0x15  # 0xE0 = -32 as int8
    res = []
    for px in target:
        g = (px >> 8) & 0xFF
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        red_res = (red - W._ct_delta(g2r, g)) & 0xFF
        blue_res = (
            blue - W._ct_delta(g2b, g) - W._ct_delta(r2b, red)
        ) & 0xFF
        res.append((px & 0xFF00FF00) | (red_res << 16) | blue_res)
    bw = W._BitWriter()
    _header(bw, 5, 3)
    bw.write(1, 1)
    bw.write(2, 1)  # color transform
    bits = 3  # one 8x8 tile covers 5x3
    bw.write(3, bits - 2)
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    W._encode_image(bw, [cte], 0, False, is_main=False)
    bw.write(1, 0)
    W._encode_image(bw, res, 0, False, is_main=True)
    out = W.webp_decode(_wrap(bw.finish()))
    assert np.array_equal(out, img)


def test_vp8l_meta_huffman_group_switch():
    """Hand-built meta-Huffman stream: an 8x1 image, huffman_bits=2 →
    two 4-pixel tiles selecting two DIFFERENT code groups (group index
    = (red<<8)|green of the entropy-image pixel). Each group's
    single-symbol codes decode a different pixel — group routing is
    the only thing that can produce the expected output."""
    px0 = 0xFF0A0102  # a=255 r=10 g=1 b=2
    px1 = 0xFF141903  # a=255 r=20 g=25 b=3
    bw = W._BitWriter()
    _header(bw, 8, 1)
    bw.write(1, 0)  # no transforms
    bw.write(1, 0)  # no color cache
    bw.write(1, 1)  # meta huffman present
    hbits = 2
    bw.write(3, hbits - 2)
    # entropy image 2x1: green byte = group index
    W._encode_image(
        bw, [0xFF000000, 0xFF000100], 0, False, is_main=False
    )
    # group 0 then group 1: five codes each (single-symbol → 0 bits
    # per emitted symbol, so the pixel stream below is empty)
    for px in (px0, px1):
        for sym in (
            (px >> 8) & 0xFF,
            (px >> 16) & 0xFF,
            px & 0xFF,
            (px >> 24) & 0xFF,
            0,
        ):
            W._write_huffman_code(bw, {sym: 1})
    out = W.webp_decode(_wrap(bw.finish()))
    expect = np.zeros((1, 8, 4), np.uint8)
    for x in range(8):
        px = px0 if x < 4 else px1
        expect[0, x] = [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF,
                        (px >> 24) & 0xFF]
    assert np.array_equal(out, expect)


def test_vp8l_lz77_plane_distance():
    """Hand-built LZ77 stream with a NON-trivial distance: two literals
    then copy(length=2, distance=2) — distance 2 is plane code 6
    ((2,0)), whose prefix code carries an extra bit. Output must be
    A B A B; a wrong plane table or prefix decode cannot produce it."""
    pxa = 0xFF010203
    pxb = 0xFF040506
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.write(1, 0)  # no transforms
    bw.write(1, 0)  # no cache
    bw.write(1, 0)  # no meta
    g_codes = W._write_huffman_code(
        bw, W._huffman_lengths({2: 1, 5: 1, 257: 1}, 15)
    )  # greens of A(2), B(5), and length-prefix symbol 257 (length 2)
    r_codes = W._write_huffman_code(
        bw, W._huffman_lengths({1: 1, 4: 1}, 15)
    )
    b_codes = W._write_huffman_code(
        bw, W._huffman_lengths({3: 1, 6: 1}, 15)
    )
    a_codes = W._write_huffman_code(bw, {255: 1})
    d_codes = W._write_huffman_code(bw, {4: 1})  # dist prefix code 4
    for px in (pxa, pxb):
        W._emit(bw, g_codes, (px >> 8) & 0xFF)
        W._emit(bw, r_codes, (px >> 16) & 0xFF)
        W._emit(bw, b_codes, px & 0xFF)
        W._emit(bw, a_codes, 255)
    W._emit(bw, g_codes, 257)  # length prefix 1 → length 2, no extras
    W._emit(bw, d_codes, 4)  # dist prefix 4 + 1 extra bit
    bw.write(1, 1)  # extra → dist code 6 → plane (2,0) → distance 2
    out = W.webp_decode(_wrap(bw.finish()))
    expect = np.array(
        [[[1, 2, 3, 255], [4, 5, 6, 255], [1, 2, 3, 255], [4, 5, 6, 255]]],
        np.uint8,
    )
    assert np.array_equal(out, expect)


def test_plane_code_table_and_prefix_inverse():
    """The generated distance table's head matches the spec's opening
    enumeration, and prefix encode/decode are exact inverses over a
    wide value range."""
    assert W._PLANE_CODES[:8] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    ]
    assert len(W._PLANE_CODES) == 120
    assert len(set(W._PLANE_CODES)) == 120
    for value in list(range(1, 300)) + [1000, 4096, 100000]:
        code, extra, ev = W._prefix_encode(value)

        class _FakeBr:
            def read(self, n):
                assert n == extra
                return ev

        assert W._prefix_value(code, _FakeBr()) == value


def test_webp_container_routing_and_lossy_stub():
    """Container parsing: VP8L decodes; a GARBAGE lossy-only (VP8)
    container is 'corrupt' when the system libwebp can try it
    (ValueError) and a capability gap when it can't
    (NotImplementedError); junk raises ValueError; an ANIMATED
    container is always a decoder gap for the still-image API."""
    from inbev_data_engineering_case_spark.operators import libwebp

    img = np.full((2, 2, 4), 9, np.uint8)
    ok = W.vp8l_encode(img)
    assert np.array_equal(W.webp_decode(ok), img)

    body = b"\x00" * 10
    lossy = (
        b"RIFF"
        + (4 + 8 + len(body)).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8 "
        + len(body).to_bytes(4, "little")
        + body
    )
    if libwebp.available():
        with pytest.raises(ValueError, match="failed to decode"):
            W.webp_decode(lossy)
    else:
        with pytest.raises(NotImplementedError, match="lossy"):
            W.webp_decode(lossy)
    with pytest.raises(ValueError):
        W.webp_decode(b"RIFF\x00\x00\x00\x00JUNK")
    # a bare ANIM chunk with no ANMF frame is a CORRUPT animation now
    # that frame 1 decodes (not a capability gap)
    anim = (
        b"RIFF"
        + (4 + 8 + 6).to_bytes(4, "little")
        + b"WEBP"
        + b"ANIM"
        + (6).to_bytes(4, "little")
        + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="ANMF"):
        W.webp_decode(anim)
    # an extended container with NO image chunk at all stays the
    # capability-gap NotImplementedError
    vp8x_only = (
        b"RIFF"
        + (4 + 8 + 10).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8X"
        + (10).to_bytes(4, "little")
        + b"\x00" * 10
    )
    with pytest.raises(NotImplementedError, match="extended"):
        W.webp_decode(vp8x_only)


@pytest.mark.skipif(
    not __import__(
        "inbev_data_engineering_case_spark.operators.libwebp",
        fromlist=["available"],
    ).available(),
    reason="system libwebp not present",
)
def test_lossy_vp8_decodes_via_system_libwebp():
    """A REAL lossy VP8 bitstream (encoded by libwebp itself — genuine
    RFC 6386 boolean-coder output, not a fixture fake) decodes through
    webp_decode: right shape, alpha opaque, content within the lossy
    tolerance of the source."""
    from inbev_data_engineering_case_spark.operators import libwebp

    h, w = 24, 17
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = (xx * 9) % 256
    img[..., 1] = (yy * 7) % 256
    img[..., 2] = ((xx + yy) * 5) % 256
    img[..., 3] = 255
    payload = libwebp.encode_rgba(img, quality=90.0)
    assert payload[12:16] == b"VP8 "  # simple lossy container
    out = W.webp_decode(payload)
    assert out.shape == (h, w, 4)
    assert (out[..., 3] == 255).all()
    mad = float(np.abs(out.astype(int) - img.astype(int)).mean())
    assert mad < 8.0, mad


@pytest.mark.skipif(
    not __import__(
        "inbev_data_engineering_case_spark.operators.libwebp",
        fromlist=["available"],
    ).available(),
    reason="system libwebp not present",
)
def test_native_vp8l_decoder_parity_with_libwebp():
    """Independent-implementation parity for the NATIVE VP8L decoder:
    (a) libwebp's own lossless encoder produces streams our native
    decoder must read bit-identically (stronger than self-round-trip —
    the reference encoder exercises code paths our fixture encoder
    never emits), and (b) our fixture encoder's streams decode
    identically through both decoders."""
    from inbev_data_engineering_case_spark.operators import libwebp

    rng = np.random.RandomState(41)
    for h, w, ncol in ((1, 1, 2), (7, 5, 4), (16, 11, 12), (9, 23, 0)):
        if ncol:
            pal = rng.randint(0, 256, (ncol, 4), np.uint8)
            pal[:, 3] = rng.choice([255, 200], ncol)
            img = pal[rng.randint(0, ncol, (h, w))]
        else:
            img = rng.randint(0, 256, (h, w, 4), np.uint8)
            # keep alpha >= 1: libwebp's encoder rewrites the RGB of
            # FULLY transparent pixels by default (alpha cleanup), so
            # alpha-0 pixels round-trip the alpha but not the RGB —
            # an encoder policy, not a decoder defect
            img[..., 3] = np.maximum(img[..., 3], 1)
        ref_stream = libwebp.encode_lossless_rgba(img)
        assert ref_stream[12:16] == b"VP8L"
        assert np.array_equal(W.webp_decode(ref_stream), img)  # (a)
        ours = W.vp8l_encode(img, use_palette=bool(ncol))
        assert np.array_equal(libwebp.decode_rgba(ours), img)  # (b)


def test_webp_decodes_through_spark_and_lossy_dead_letters(spark):
    """End to end through the mapInPandas operator: a genuine VP8L
    asset decodes on a bare cluster (decode_ok, reason NULL, the
    PNG-contract features); a REAL lossy VP8 asset decodes when the
    system libwebp resolved (the capability flip this round closed) or
    dead-letters as decoder_gap without it; an ANIMATED container is
    always the still-API's decoder gap; and decode_reason_report sizes
    what remains."""
    from inbev_data_engineering_case_spark.operators import libwebp
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _optional_pil,
        decode_features,
        decode_reason_report,
    )

    rng = np.random.RandomState(13)
    img = _rand_img(rng, 6, 5, ncol=4)
    vp8l = W.vp8l_encode(img, use_palette=True, rle=True)
    if libwebp.available():
        limg = np.zeros((8, 9, 4), np.uint8)
        limg[..., 1] = np.arange(9, dtype=np.uint8) * 20
        limg[..., 3] = 255
        lossy = libwebp.encode_rgba(limg, quality=90.0)
    else:
        body = b"\x00" * 16
        lossy = (
            b"RIFF"
            + (4 + 8 + len(body)).to_bytes(4, "little")
            + b"WEBP"
            + b"VP8 "
            + len(body).to_bytes(4, "little")
            + body
        )
    # extended container with no image chunk: the one remaining
    # always-gap webp shape (animation first frames decode since r10)
    gap = (
        b"RIFF"
        + (4 + 8 + 10).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8X"
        + (10).to_bytes(4, "little")
        + b"\x00" * 10
    )
    assets = spark.createDataFrame(
        [
            (1, "image/webp", vp8l, {"n_bytes": len(vp8l), "source": "t"}),
            (2, "image/webp", lossy, {"n_bytes": len(lossy), "source": "t"}),
            (3, "image/webp", gap, {"n_bytes": len(gap), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    rows = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    assert rows[1]["decode_ok"] and rows[1]["reason"] is None
    assert rows[1]["feature"][0] == 5.0 and rows[1]["feature"][1] == 6.0
    assert rows[1]["feature"][2] == 4.0  # RGBA channels
    import zlib

    assert rows[1]["checksum"] == zlib.crc32(img.tobytes()) % 1_000_003
    n_ok = 1
    if libwebp.available():
        # the r10 capability flip: a real VP8 still decodes end to end
        assert rows[2]["decode_ok"] and rows[2]["reason"] is None
        assert rows[2]["feature"][:3] == [9.0, 8.0, 4.0]
        n_ok += 1
    elif _optional_pil() is None:
        assert not rows[2]["decode_ok"]
        assert rows[2]["reason"] == "decoder_gap"
        assert "lossy" in rows[2]["error"]
    if _optional_pil() is None:
        assert not rows[3]["decode_ok"]
        assert rows[3]["reason"] == "decoder_gap"
        assert "extended" in rows[3]["error"]
        report = decode_reason_report(
            decode_features(assets, real_decoder=True)
        ).collect()
        by_key = {(r["media_type"], r["reason"]): r for r in report}
        assert by_key[("image/webp", "ok")]["n_assets"] == n_ok
        gap_share = by_key[("image/webp", "decoder_gap")]["share_ppm"]
        assert gap_share == (3 - n_ok) * 1_000_000 // 3


def test_webp_resizes_natively(spark):
    """resize_assets path: a VP8L asset decodes (alpha dropped, the
    PNG discipline) and resizes through the native pipeline."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _decode_image_pixels,
    )

    rng = np.random.RandomState(17)
    img = _rand_img(rng, 8, 6)
    pixels = _decode_image_pixels(W.vp8l_encode(img))
    assert pixels.shape == (8, 6, 3)
    assert np.array_equal(pixels, img[:, :, :3])


def test_vp8l_predictor_with_color_cache_combined():
    """Transforms and the color cache COMPOSE: the cache operates on
    the entropy-coded (residual) pixels, and inverse transforms apply
    after — a decoder that cached post-inverse pixels would desync.
    Hand-built: predictor mode 1 (L) over a constant-color image makes
    every residual after the first pixel identical, so the stream is
    one literal + cache hits; the decode must still reconstruct the
    constant image through the inverse predictor."""
    px = 0xFF2A1B3C
    w, h = 6, 3
    target = [px] * (w * h)
    # forward predictor: first pixel vs black, row 0 vs L, col 0 vs T,
    # interior mode-1 (L)
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0 or x > 0:
                pred = target[i - 1]
            else:
                pred = target[i - w]
            res.append(_sub_px(target[i], pred))
    assert len(set(res[1:])) == 1  # constant residual -> cache hits
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(2, 0)  # predictor
    bw.write(3, 0)  # bits=2 -> one tile here? 6px/4 -> 2x1 tiles
    tiles_w = (w + 3) // 4
    W._encode_image(
        bw,
        [0xFF000000 | (1 << 8)] * tiles_w,  # mode 1 everywhere
        0,
        False,
        is_main=False,
    )
    bw.write(1, 0)  # no more transforms
    cache_bits = 3
    bw.write(1, 1)
    bw.write(4, cache_bits)  # color cache on the MAIN image
    bw.write(1, 0)  # no meta huffman
    first, rest = res[0], res[1]
    hit_idx = W._cache_index(rest, cache_bits)
    g_codes = W._write_huffman_code(
        bw,
        W._huffman_lengths(
            {
                (first >> 8) & 0xFF: 1,
                (rest >> 8) & 0xFF: 1,
                280 + hit_idx: 1,
            },
            15,
        ),
    )
    r_codes = W._write_huffman_code(
        bw,
        W._huffman_lengths(
            {(first >> 16) & 0xFF: 1, (rest >> 16) & 0xFF: 1}, 15
        ),
    )
    b_codes = W._write_huffman_code(
        bw, W._huffman_lengths({first & 0xFF: 1, rest & 0xFF: 1}, 15)
    )
    # under the predictor transform the literal stream carries
    # RESIDUALS, whose alpha is 0 here (constant opaque image), not 255
    a_codes = W._write_huffman_code(bw, {(first >> 24) & 0xFF: 1})
    W._write_huffman_code(bw, {0: 1})  # distance: unused
    # pixel stream: literal residual[0], literal residual[1] (fills the
    # cache slot), then cache hits for the rest
    for lit in (res[0], res[1]):
        W._emit(bw, g_codes, (lit >> 8) & 0xFF)
        W._emit(bw, r_codes, (lit >> 16) & 0xFF)
        W._emit(bw, b_codes, lit & 0xFF)
        W._emit(bw, a_codes, (lit >> 24) & 0xFF)
    for _ in res[2:]:
        W._emit(bw, g_codes, 280 + hit_idx)
    out = W.webp_decode(_wrap(bw.finish()))
    expect = np.full((h, w, 4), 0, np.uint8)
    expect[..., 0] = (px >> 16) & 0xFF
    expect[..., 1] = (px >> 8) & 0xFF
    expect[..., 2] = px & 0xFF
    expect[..., 3] = 255
    assert np.array_equal(out, expect)


def _anmf(x, y, fw, fh, flags, subchunks: bytes) -> bytes:
    body = (
        (x // 2).to_bytes(3, "little")
        + (y // 2).to_bytes(3, "little")
        + (fw - 1).to_bytes(3, "little")
        + (fh - 1).to_bytes(3, "little")
        + (40).to_bytes(3, "little")  # duration ms
        + bytes([flags])
        + subchunks
    )
    return b"ANMF" + len(body).to_bytes(4, "little") + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _make_animated_webp(canvas_wh, bg_rgba, frames) -> bytes:
    """frames: list of (x, y, fw, fh, flags, inner_chunk_bytes)."""
    cw, ch = canvas_wh
    vp8x = (
        b"VP8X"
        + (10).to_bytes(4, "little")
        + bytes([0x12, 0, 0, 0])  # animation + alpha hint flags
        + (cw - 1).to_bytes(3, "little")
        + (ch - 1).to_bytes(3, "little")
    )
    r, g, b, a = bg_rgba
    anim = (
        b"ANIM"
        + (6).to_bytes(4, "little")
        + bytes([b, g, r, a])  # stored B,G,R,A
        + (0).to_bytes(2, "little")
    )
    inner = vp8x + anim + b"".join(
        _anmf(*f[:5], f[5]) for f in frames
    )
    return (
        b"RIFF" + (4 + len(inner)).to_bytes(4, "little") + b"WEBP" + inner
    )


def _still_chunk(payload: bytes) -> bytes:
    """The VP8/VP8L chunk (with header + pad) out of a simple still."""
    size = int.from_bytes(payload[16:20], "little")
    return payload[12 : 20 + size + (size & 1)]


def test_animated_webp_first_frame_composes_on_canvas():
    """Animated WebP decodes frame 1 composed onto the canvas — the
    GIF first-frame discipline, with the canvas TRANSPARENT BLACK
    (matching libwebp's WebPAnimDecoder / PIL, so the fingerprint is
    identical across capability routes; the advisory ANIM background
    color is deliberately not pre-filled): a sub-rectangle frame
    lands at its (x, y) offset, the raster has the canvas
    dimensions, overwrite (B=1) pastes verbatim, and blend (B=0)
    source-over-composites so a transparent frame pixel stays
    transparent."""
    img = np.zeros((3, 4, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = 255
    img[1, 1] = (9, 9, 9, 0)  # one fully transparent pixel
    frame = _still_chunk(W.vp8l_encode(img))

    for flags, blended in ((0x02, False), (0x00, True)):
        payload = _make_animated_webp(
            (10, 7), (10, 20, 30, 255), [(2, 4, 4, 3, flags, frame)]
        )
        out = W.webp_decode(payload)
        assert out.shape == (7, 10, 4)
        assert tuple(out[0, 0]) == (0, 0, 0, 0)  # transparent canvas
        assert tuple(out[4, 2]) == (200, 0, 0, 255)  # frame origin
        if blended:  # transparent px over transparent canvas
            assert tuple(out[5, 3]) == (0, 0, 0, 0)
        else:  # overwrite keeps the transparent pixel verbatim
            assert tuple(out[5, 3]) == (9, 9, 9, 0)

    # featurize + reason report see it as a decode_ok asset now
    checksum, feats = W.featurize_webp(
        _make_animated_webp(
            (10, 7), (10, 20, 30, 255), [(2, 4, 4, 3, 0x02, frame)]
        )
    )
    assert feats[:3] == [10.0, 7.0, 4.0]

    # corrupt forms stay ValueError (not capability gaps)
    with pytest.raises(ValueError, match="ANMF"):
        W.webp_decode(
            _make_animated_webp((10, 7), (0, 0, 0, 0), [])
        )
    with pytest.raises(ValueError, match="exits canvas"):
        W.webp_decode(
            _make_animated_webp(
                (4, 3), (0, 0, 0, 0), [(2, 0, 4, 3, 0x02, frame)]
            )
        )


@pytest.mark.skipif(
    not __import__(
        "inbev_data_engineering_case_spark.operators.libwebp",
        fromlist=["available"],
    ).available(),
    reason="system libwebp not present",
)
def test_animated_webp_lossy_first_frame_via_libwebp():
    """An animated WebP whose first frame is LOSSY (VP8 chunk inside
    ANMF) decodes through the re-wrapped libwebp route."""
    from inbev_data_engineering_case_spark.operators import libwebp

    h, w = 16, 24
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 1] = 180
    img[..., 3] = 255
    frame = _still_chunk(libwebp.encode_rgba(img, quality=92.0))
    assert frame[:4] == b"VP8 "
    payload = _make_animated_webp(
        (w, h), (0, 0, 0, 255), [(0, 0, w, h, 0x02, frame)]
    )
    out = W.webp_decode(payload)
    assert out.shape == (h, w, 4)
    mad = float(
        np.abs(out.astype(int) - img.astype(int))[..., :3].mean()
    )
    assert mad < 8.0, mad
