"""FLAC codec tests: round-trips across every subframe/stereo/residual
path, a hand-built stream pinning decoder paths the fixture encoder
does not emit (variable blocking, table-coded block size / sample
rate, end-of-header rate forms), independent CRC implementations,
corruption → ValueError, and the mapInPandas integration (WAV and
FLAC of the same PCM fingerprint identically; non-WAV/FLAC audio is a
decoder_gap, a recognized-but-broken container is corrupt)."""

import hashlib
import io
import wave
import zlib

import numpy as np
import pytest

from inbev_data_engineering_case_spark.operators import flac


def _pcm(n=2000, seed=7, scale=300):
    rng = np.random.default_rng(seed)
    p = np.cumsum(rng.integers(-scale, scale, size=n)).astype(np.int64)
    return np.clip(p, -32768, 32767).astype(np.int32)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "subframe,kwargs",
    [
        ("verbatim", {}),
        ("fixed", {"fixed_order": 0}),
        ("fixed", {"fixed_order": 1}),
        ("fixed", {"fixed_order": 2, "partition_order": 2}),
        ("fixed", {"fixed_order": 3}),
        ("fixed", {"fixed_order": 4, "partition_order": 1}),
        ("fixed", {"fixed_order": 2, "rice2": True}),
        ("fixed", {"fixed_order": 2, "force_escape": True}),
        ("lpc", {"lpc": ([31, -14], 4, 6)}),
        ("lpc", {"lpc": ([16], 4, 6), "partition_order": 2}),
        ("lpc", {"lpc": ([25, -12, 3, -1], 5, 7)}),
    ],
)
def test_flac_round_trip_mono(subframe, kwargs):
    pcm = _pcm(1500)
    enc = flac.flac_encode(
        pcm, 8000, bps=16, block_size=512, subframe=subframe, **kwargs
    )
    rate, nch, bps, dec = flac.flac_decode(enc)
    assert (rate, nch, bps) == (8000, 1, 16)
    assert np.array_equal(dec[:, 0], pcm)
    # genuine compression on the predictive paths (not a raw rewrap)
    if subframe != "verbatim" and not kwargs.get("force_escape"):
        assert len(enc) < pcm.nbytes


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_flac_round_trip_stereo_decorrelation(mode):
    left = _pcm(1000, seed=1)
    right = _pcm(1000, seed=2, scale=80)
    st = np.stack([left, right], axis=1)
    enc = flac.flac_encode(
        st, 44100, bps=16, block_size=256, stereo_mode=mode,
        subframe="fixed", fixed_order=2,
    )
    rate, nch, bps, dec = flac.flac_decode(enc)
    assert (rate, nch, bps) == (44100, 2, 16)
    assert np.array_equal(dec, st)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_flac_round_trip_bit_depths(bps):
    base = _pcm(600).astype(np.int64)
    pcm = (base * ((1 << (bps - 1)) - 1) // 32768).astype(np.int64)
    enc = flac.flac_encode(pcm, 16000, bps=bps, block_size=200)
    rate, nch, got_bps, dec = flac.flac_decode(enc)
    assert got_bps == bps
    assert np.array_equal(dec[:, 0].astype(np.int64), pcm)


def test_flac_constant_wasted_and_short_final_block():
    flat = np.full(700, -123, dtype=np.int32)  # 700 % 256 != 0
    enc = flac.flac_encode(flat, 8000, block_size=256, subframe="auto")
    assert np.array_equal(flac.flac_decode(enc)[3][:, 0], flat)
    assert len(enc) < 150  # constant subframes: bytes per frame, not per sample

    w = (_pcm(512) // 8) * 8  # 3 guaranteed-zero low bits
    enc_w = flac.flac_encode(
        w, 8000, block_size=256, subframe="fixed", wasted_bits=3
    )
    enc_plain = flac.flac_encode(w, 8000, block_size=256, subframe="fixed")
    assert np.array_equal(flac.flac_decode(enc_w)[3][:, 0], w)
    assert len(enc_w) < len(enc_plain)  # wasted-bit signalling pays


def test_flac_empty_first_partition():
    # partition order that leaves the first partition exactly empty
    # (block 256 >> 3 = 32 samples/partition == lpc order 32)
    pcm = _pcm(256)
    enc = flac.flac_encode(
        pcm, 8000, block_size=256, subframe="lpc",
        lpc=([1] * 32, 5, 4), partition_order=3,
    )
    assert np.array_equal(flac.flac_decode(enc)[3][:, 0], pcm)


# ---------------------------------------------------------------------------
# independent CRC implementations + MD5 cross-check
# ---------------------------------------------------------------------------


def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    reg, top, mask = 0, 1 << (width - 1), (1 << width) - 1
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            fb = ((reg >> (width - 1)) & 1) ^ bit
            reg = ((reg << 1) & mask) ^ (poly if fb else 0)
    return reg


def test_flac_crc_tables_match_bitwise_definition():
    for data in (b"", b"\x00", b"flac", bytes(range(256))):
        assert flac._crc8(data) == _crc_bitwise(data, 0x07, 8)
        assert flac._crc16(data) == _crc_bitwise(data, 0x8005, 16)


def test_flac_md5_is_over_original_pcm():
    # the encoder writes MD5 of the INPUT PCM; the decoder recomputes
    # over its OUTPUT — so every green round trip is cross-checked by
    # a hash path that never goes through the decoder
    pcm = _pcm(300)
    enc = flac.flac_encode(pcm, 8000, block_size=100)
    assert enc[4 + 4 + 18:4 + 4 + 34] == hashlib.md5(
        pcm.astype("<i2").tobytes()
    ).digest()
    flac.flac_decode(enc)  # green = decoder PCM matched that digest


# ---------------------------------------------------------------------------
# hand-built stream: decoder paths the fixture encoder never emits
# ---------------------------------------------------------------------------


def _hand_frame(sr_code, sr_extra_bits, blocking, coded_number_bytes,
                bs_code=1, block=None, rate=44100):
    """One constant-subframe frame with caller-chosen header codes."""
    w = flac._BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(blocking, 1)
    w.write(bs_code, 4)
    w.write(sr_code, 4)
    w.write(0, 4)  # mono
    w.write(4, 3)  # 16-bit
    w.write(0, 1)
    for b in coded_number_bytes:
        w.write(b, 8)
    if sr_extra_bits is not None:
        w.write(*sr_extra_bits)
    head = w.bytes()
    w.write(flac._crc8(head), 8)
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(0, 1)  # no wasted bits
    w.write(42, 16)
    w.align()
    w.write(flac._crc16(w.bytes()), 16)
    return w.bytes()


def _hand_stream(frame, rate=44100, total=192):
    h = flac._BitWriter()
    h.write(192, 16)
    h.write(192, 16)
    h.write(0, 24)
    h.write(0, 24)
    h.write(rate, 20)
    h.write(0, 3)
    h.write(15, 5)
    h.write(total, 36)
    si = h.bytes() + b"\x00" * 16  # all-zero MD5 = no check
    return b"fLaC" + b"\x80" + len(si).to_bytes(3, "big") + si + frame


@pytest.mark.parametrize(
    "sr_code,extra,rate",
    [
        (9, None, 44100),            # table-coded rate
        (12, (44, 8), 44000),        # 8-bit kHz form
        (13, (44100, 16), 44100),    # 16-bit Hz form
        (14, (4410, 16), 44100),     # 16-bit Hz/10 form
    ],
)
def test_flac_hand_built_header_rate_forms(sr_code, extra, rate):
    # variable blocking (sample number 0), block size from the code
    # table (code 1 = 192) — neither is emitted by the encoder
    frame = _hand_frame(sr_code, extra, blocking=1,
                        coded_number_bytes=[0], rate=rate)
    got_rate, nch, bps, dec = flac.flac_decode(_hand_stream(frame, rate))
    assert got_rate == rate
    assert dec.shape == (192, 1)
    assert set(dec[:, 0].tolist()) == {42}


def test_flac_hand_built_multibyte_coded_number():
    # a 2-byte coded sample number (value 128) — the UTF-8-style form
    frame = _hand_frame(9, None, blocking=1,
                        coded_number_bytes=[0xC2, 0x80])
    assert flac.flac_decode(_hand_stream(frame)).__len__() == 4
    # and the encoder's own coded numbers agree with the decoder at
    # every byte-length boundary
    for v in (0, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1,
              (1 << 36) - 1):
        bits = flac._Bits(flac._coded_number(v))
        assert flac._read_coded_number(bits, 7) == v


# ---------------------------------------------------------------------------
# corruption → ValueError (the `corrupt` dead-letter reason)
# ---------------------------------------------------------------------------


def test_flac_corruption_raises_value_error():
    pcm = _pcm(400)
    enc = bytearray(flac.flac_encode(pcm, 8000, block_size=200))
    with pytest.raises(ValueError, match="fLaC"):
        flac.flac_decode(b"fLaX" + bytes(enc[4:]))
    # flip a bit deep in the entropy region → CRC-16 catches it
    broken = bytearray(enc)
    broken[-40] ^= 0x10
    with pytest.raises(ValueError, match="flac"):
        flac.flac_decode(bytes(broken))
    # flip the STREAMINFO MD5 → decoded PCM fails the digest
    md5_off = 4 + 4 + 18
    broken = bytearray(enc)
    broken[md5_off] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        flac.flac_decode(bytes(broken))
    # truncation inside a frame
    with pytest.raises(ValueError, match="truncated|lost|promised"):
        flac.flac_decode(bytes(enc[:-30]))
    # header CRC-8
    broken = bytearray(enc)
    si_end = 4 + 4 + 34
    broken[si_end + 2] ^= 0x01  # inside the first frame header
    with pytest.raises(ValueError):
        flac.flac_decode(bytes(broken))


def test_flac_reserved_codes_raise():
    frame = _hand_frame(15, None, blocking=0, coded_number_bytes=[0])
    with pytest.raises(ValueError, match="sample rate code"):
        flac.flac_decode(_hand_stream(frame))
    frame = _hand_frame(9, None, blocking=0, coded_number_bytes=[0],
                        bs_code=0)
    with pytest.raises(ValueError, match="block size code"):
        flac.flac_decode(_hand_stream(frame))


# ---------------------------------------------------------------------------
# mapInPandas integration
# ---------------------------------------------------------------------------


def test_flac_decode_features_integration(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
    )

    pcm = _pcm(1600, seed=3)
    fl = flac.flac_encode(pcm, 8000, bps=16, block_size=512)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav = buf.getvalue()
    assert len(fl) < len(wav)  # the compression is real

    mp3ish = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb" * 40
    bad_wav = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVEjunkjunk"
    assets = spark.createDataFrame(
        [
            (1, "audio/flac", fl, {"n_bytes": len(fl), "source": "t"}),
            (2, "audio/wav", wav, {"n_bytes": len(wav), "source": "t"}),
            (3, "audio/wav", fl, {"n_bytes": len(fl), "source": "t"}),
            (4, "audio/mpeg", mp3ish,
             {"n_bytes": len(mp3ish), "source": "t"}),
            (5, "audio/wav", bad_wav,
             {"n_bytes": len(bad_wav), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    out = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    # one PCM, two containers, ONE fingerprint + feature vector
    assert out[1]["checksum"] == out[2]["checksum"]
    assert out[1]["checksum"] == zlib.crc32(
        pcm.astype("<i2").tobytes()
    ) % 1_000_003
    assert out[1]["feature"] == out[2]["feature"]
    assert out[1]["feature"][:3] == [0.2, 8000.0, 1.0]
    # magic dispatch: FLAC mislabeled as wav still decodes
    assert out[3]["checksum"] == out[1]["checksum"]
    # mp3: honestly a decoder gap; broken WAV container: corrupt
    assert not out[4]["decode_ok"] and out[4]["reason"] == "decoder_gap"
    assert not out[5]["decode_ok"] and out[5]["reason"] == "corrupt"


def test_flac_resize_assets_decimates(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        resize_assets,
    )

    pcm = _pcm(4000, seed=5)
    fl = flac.flac_encode(pcm, 8000, bps=16, block_size=1024)
    assets = spark.createDataFrame(
        [(1, "audio/flac", fl, {"n_bytes": len(fl), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    row = resize_assets(
        assets, target_bytes=2000, real_decoder=True
    ).collect()[0]
    assert row["decode_ok"]
    rate, nch, bps, dec = flac.flac_decode(bytes(row["payload"]))
    k = -(-4000 * 2 // 2000)  # the decimation factor the rule picks
    assert rate == 8000 // k
    assert np.array_equal(dec[:, 0], pcm[::k])  # decimated, not resampled
    # duration preserved: n/k samples at rate/k
    assert abs(dec.shape[0] / rate - 4000 / 8000) < 0.01


def test_flac_round_trip_fuzz():
    """Encoder(fixture)→decoder(engine) under hypothesis: any PCM, any
    subframe/stereo/partition/rice knob combination must decode back
    bit-exactly — and every green example is independently cross-checked
    by the STREAMINFO MD5 (computed from the input, verified against
    the output)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def check(data):
        nch = data.draw(st.integers(1, 2))
        n = data.draw(st.integers(16, 400))
        bps = data.draw(st.sampled_from([8, 12, 16]))
        hi = (1 << (bps - 1)) - 1
        flat = data.draw(
            st.lists(st.integers(-hi - 1, hi), min_size=n * nch,
                     max_size=n * nch)
        )
        arr = np.array(flat, dtype=np.int64).reshape(n, nch)
        block = data.draw(st.sampled_from([16, 64, 192, 256]))
        mode = (
            data.draw(st.sampled_from(
                ["independent", "left_side", "right_side", "mid_side"]
            ))
            if nch == 2
            else "independent"
        )
        sub = data.draw(st.sampled_from(["auto", "verbatim", "fixed"]))
        kwargs = {}
        if sub == "fixed":
            kwargs["fixed_order"] = data.draw(st.integers(0, 4))
            # a partition order the block divides (first partition may
            # be small but the encoder raises if order exceeds it)
            porder = data.draw(st.sampled_from([0, 1, 2]))
            if (block >> porder) > kwargs["fixed_order"]:
                kwargs["partition_order"] = porder
            kwargs["rice2"] = data.draw(st.booleans())
            kwargs["force_escape"] = data.draw(st.booleans())
        enc = flac.flac_encode(
            arr, 8000, bps=bps, block_size=block, stereo_mode=mode,
            subframe=sub, **kwargs
        )
        rate, got_nch, got_bps, dec = flac.flac_decode(enc)
        assert (rate, got_nch, got_bps) == (8000, nch, bps)
        assert np.array_equal(dec.astype(np.int64), arr)

    check()


# ---------------------------------------------------------------------------
# review-batch regressions
# ---------------------------------------------------------------------------


def test_flac_crafted_lpc_bomb_is_bounded():
    """A CRC-valid LPC subframe with a huge coefficient and all-zero
    (escaped) residuals must die at the FIRST out-of-range predicted
    sample with ValueError — not grow big-ints exponentially until the
    executor OOMs (the range check IS the resource bound)."""
    w = flac._BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(1, 4)   # block size 192
    w.write(9, 4)   # 44100
    w.write(0, 4)   # mono
    w.write(4, 3)   # 16-bit
    w.write(0, 1)
    w.write(0, 8)   # frame number 0
    head = w.bytes()
    w.write(flac._crc8(head), 8)
    w.write(0, 1)
    w.write(32, 6)          # LPC order 1
    w.write(0, 1)           # no wasted bits
    w.write(16384, 16)      # warmup
    w.write(14, 4)          # precision 15
    w.write(0, 5)           # shift 0
    w.write(16383, 15)      # coefficient
    w.write(0, 2)           # rice method 0
    w.write(0, 4)           # partition order 0
    w.write(15, 4)          # escape
    w.write(0, 5)           # raw = 0 -> 191 zero residuals, zero bits
    w.align()
    w.write(flac._crc16(w.bytes()), 16)
    with pytest.raises(ValueError, match="exceeds the bit depth"):
        flac.flac_decode(_hand_stream(w.bytes()))


def test_flac_32bit_full_scale_resizes_via_verbatim_fallback():
    # full-scale 32-bit: order-1 differencing WIDENS past the 31-bit
    # escape cap; the encoder must fall back to verbatim, not raise —
    # so resize_assets can round-trip loud high-depth audio
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _resize_flac,
    )

    hi = (1 << 31) - 1
    pcm = np.array([hi, -hi - 1] * 300, dtype=np.int64)
    enc = flac.flac_encode(pcm, 8000, bps=32, block_size=100)
    assert np.array_equal(flac.flac_decode(enc)[3][:, 0], pcm)
    out = _resize_flac(enc, 1200)
    rate, nch, bps, dec = flac.flac_decode(out)
    # 600 samples * 4 bytes = 2400 -> k=2: every other sample survives
    assert bps == 32 and np.array_equal(dec[:, 0], pcm[::2])


def test_flac_wav_fingerprint_identity_at_8_and_24_bit(spark):
    # WAV stores 8-bit PCM UNSIGNED; the fingerprint must canonicalize
    # to signed LE so both containers hash identically at every depth
    from inbev_data_engineering_case_spark.operators.multimodal import (
        decode_features,
    )

    rows = []
    p8 = (_pcm(400) // 256).astype(np.int32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes((p8.astype(np.int16) + 128).astype(np.uint8).tobytes())
    rows.append((1, "audio/wav", buf.getvalue()))
    rows.append((2, "audio/flac", flac.flac_encode(p8, 8000, bps=8,
                                                   block_size=100)))
    p24 = (_pcm(400).astype(np.int64) * 200).astype(np.int64)
    b4 = p24.astype("<i4").tobytes()
    le3 = np.frombuffer(b4, dtype=np.uint8).reshape(-1, 4)[:, :3].tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(le3)
    rows.append((3, "audio/wav", buf.getvalue()))
    rows.append((4, "audio/flac", flac.flac_encode(p24, 8000, bps=24,
                                                   block_size=100)))
    assets = spark.createDataFrame(
        [(i, t, p, {"n_bytes": len(p), "source": "t"}) for i, t, p in rows],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    out = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    assert out[1]["checksum"] == out[2]["checksum"]
    assert out[1]["feature"] == out[2]["feature"]
    assert out[3]["checksum"] == out[4]["checksum"]
    assert out[3]["feature"] == out[4]["feature"]


def test_flac_resize_magic_dispatch_and_honest_audio_gap(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        resize_assets,
    )

    pcm = _pcm(2000)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav = buf.getvalue()
    mp3ish = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb" * 40
    assets = spark.createDataFrame(
        [
            (1, "audio/mpeg", wav, {"n_bytes": len(wav), "source": "t"}),
            (2, "audio/mpeg", mp3ish,
             {"n_bytes": len(mp3ish), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    out = {
        r["asset_id"]: r
        for r in resize_assets(
            assets, target_bytes=1000, real_decoder=True
        ).collect()
    }
    # mislabeled WAV: REALLY decimated (magic dispatch), not truncated
    assert out[1]["decode_ok"]
    with wave.open(io.BytesIO(bytes(out[1]["payload"]))) as r:
        assert r.getnframes() == 500  # 4000 bytes / 1000 -> k=4
    # unknown audio codec: honest dead-letter, original payload kept
    assert not out[2]["decode_ok"]
    assert bytes(out[2]["payload"]) == mp3ish


def test_flac_aggressive_decimation_preserves_duration():
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _resize_flac,
        _resize_wav,
    )

    pcm = _pcm(160_000)  # 20 s at 8 kHz
    # k=5000 -> 32 samples; the true decimated rate is 1.6 Hz, so the
    # best integer rate (2 Hz) reads 16 s — a 20% representability
    # error, vs 60% (32 s) with the floored rate this test regresses
    out = _resize_flac(
        flac.flac_encode(pcm, 8000, block_size=4096), 64
    )
    rate, nch, bps, dec = flac.flac_decode(out)
    assert abs(dec.shape[0] / rate - 20.0) / 20.0 < 0.25
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    with wave.open(io.BytesIO(_resize_wav(buf.getvalue(), 64))) as r:
        assert abs(r.getnframes() / r.getframerate() - 20.0) / 20.0 < 0.25


def test_flac_extension_routes_to_audio(spark, tmp_path):
    from inbev_data_engineering_case_spark.sources.readers import (
        read_binary_assets,
    )

    pcm = _pcm(400)
    (tmp_path / "a.flac").write_bytes(
        flac.flac_encode(pcm, 8000, block_size=100)
    )
    row = read_binary_assets(spark, str(tmp_path / "*.flac")).collect()[0]
    assert row["media_type"] == "audio/flac"


def test_flac_constant_bomb_hits_sample_count_guard():
    """Sample COUNT is not tied to payload size (silence compresses
    ~4000x legitimately), so a crafted pile of CONSTANT frames must hit
    the decompression guard — ValueError, not a multi-GB materialize."""
    def const_frame(frame_no, block_size):
        w = flac._BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 2)
        w.write(7, 4)  # 16-bit block size at end
        w.write(9, 4)
        w.write(0, 4)
        w.write(4, 3)
        w.write(0, 1)
        for b in flac._coded_number(frame_no):
            w.write(b, 8)
        w.write(block_size - 1, 16)
        head = w.bytes()
        w.write(flac._crc8(head), 8)
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(0, 16)
        w.align()
        w.write(flac._crc16(w.bytes()), 16)
        return w.bytes()

    frames = b"".join(const_frame(i, 65535) for i in range(40))
    stream = _hand_stream(frames, total=0)
    # ~600 bytes claim 2.6M samples: fine under the default guard but
    # must die at a small cap without materializing
    with pytest.raises(ValueError, match="decompression guard"):
        flac.flac_decode(stream, max_samples=1 << 20)
    # STREAMINFO-promised totals past the cap die before any frame
    big = _hand_stream(b"", total=(1 << 24) + 1)
    with pytest.raises(ValueError, match="decompression guard"):
        flac.flac_decode(big)


def test_wav_truncation_is_corrupt_not_wrong_duration(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _resize_wav,
        decode_features,
    )

    pcm = _pcm(2000)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav = buf.getvalue()
    truncated = wav[: len(wav) - 1500]  # header still promises 2000 frames
    assets = spark.createDataFrame(
        [(1, "audio/wav", truncated,
          {"n_bytes": len(truncated), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    row = decode_features(assets, real_decoder=True).collect()[0]
    assert not row["decode_ok"] and row["reason"] == "corrupt"
    with pytest.raises(ValueError, match="truncated"):
        _resize_wav(truncated, 1000)


def test_resize_corrects_media_type_on_magic_dispatch(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        resize_assets,
    )

    pcm = _pcm(2000)
    fl = flac.flac_encode(pcm, 8000, block_size=512)
    assets = spark.createDataFrame(
        [(1, "audio/mpeg", fl, {"n_bytes": len(fl), "source": "t"})],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    row = resize_assets(
        assets, target_bytes=1000, real_decoder=True
    ).collect()[0]
    # positively identified by magic and re-encoded -> type corrected,
    # matching the _resize_image PNM precedent
    assert row["decode_ok"] and row["media_type"] == "audio/flac"


# ---------------------------------------------------------------------------
# G.711 A-law / µ-law WAV (companding is formula-defined — no tables)
# ---------------------------------------------------------------------------


def _raw_wav(fmt_tag, data, nch=1, rate=8000, bits=8):
    import struct

    block = max(1, nch * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, nch, rate, rate * block, block, bits
    )
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out)) + out


def test_g711_tables_pin_standard_endpoints():
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _g711_table,
    )

    ulaw, alaw = _g711_table("ulaw"), _g711_table("alaw")
    # the canonical G.711 identities every published codec agrees on
    assert ulaw[0xFF] == 0 and ulaw[0x7F] == 0      # ±zero codes
    assert ulaw[0x80] == 32124 and ulaw[0x00] == -32124  # max magnitude
    assert alaw[0xD5] == 8 and alaw[0x55] == -8     # smallest magnitudes
    assert alaw[0xAA] == 32256 and alaw[0x2A] == -32256
    # each law is a bijection onto symmetric magnitudes, monotone per
    # segment: positive µ-law codes 0x80..0xFF decode strictly
    # decreasing in magnitude
    pos = ulaw[0x80:0x100].astype(np.int64)
    assert (np.diff(pos) < 0).all() and (pos >= 0).all()
    neg = ulaw[0x00:0x80].astype(np.int64)
    assert (np.diff(neg) > 0).all() and (neg <= 0).all()
    # A-law: sign bit (post-0x55-inversion invariant) splits the code
    # space into exact magnitude mirrors
    assert (alaw[0x80:0x100].astype(np.int64)
            == -alaw[0x00:0x80].astype(np.int64)).all()


def test_g711_compander_round_trip_tolerance():
    """Encode via nearest-code search against OUR decode table, decode
    back: the error must stay within each segment's half-step — the
    defining property of the companding curve."""
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _g711_table,
    )

    rng = np.random.default_rng(11)
    x = rng.integers(-32124, 32124, size=4000).astype(np.int64)
    for law in ("ulaw", "alaw"):
        table = _g711_table(law).astype(np.int64)
        order = np.argsort(table)
        sorted_vals = table[order]
        idx = np.clip(
            np.searchsorted(sorted_vals, x), 1, len(sorted_vals) - 1
        )
        pick = np.where(
            np.abs(sorted_vals[idx] - x) < np.abs(sorted_vals[idx - 1] - x),
            idx, idx - 1,
        )
        decoded = sorted_vals[pick]
        err = np.abs(decoded - x)
        # both laws' top segment steps by 8<<7 / 16<<6 = 1024 between
        # adjacent codes -> nearest-code error is at most the 512
        # half-step (hit exactly at boundary ties)
        assert err.max() <= 512, law


def test_g711_wav_decode_features_and_resize(spark):
    from inbev_data_engineering_case_spark.operators.multimodal import (
        _g711_table,
        decode_features,
        resize_assets,
    )

    # a µ-law byte stream whose expansion we know exactly
    codes = bytes([0xFF, 0x80, 0x00, 0xD5, 0x40, 0xC0] * 400)
    ulaw_wav = _raw_wav(7, codes)
    alaw_wav = _raw_wav(6, codes)
    adpcm_wav = _raw_wav(2, b"\x00" * 256, bits=4)
    assets = spark.createDataFrame(
        [
            (1, "audio/wav", ulaw_wav,
             {"n_bytes": len(ulaw_wav), "source": "t"}),
            (2, "audio/basic", alaw_wav,  # mislabeled: magic wins
             {"n_bytes": len(alaw_wav), "source": "t"}),
            (3, "audio/wav", adpcm_wav,
             {"n_bytes": len(adpcm_wav), "source": "t"}),
        ],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    out = {
        r["asset_id"]: r
        for r in decode_features(assets, real_decoder=True).collect()
    }
    table = _g711_table("ulaw")
    want = table[np.frombuffer(codes, dtype=np.uint8)]
    assert out[1]["decode_ok"]
    assert out[1]["checksum"] == zlib.crc32(
        want.astype("<i2").tobytes()
    ) % 1_000_003
    assert out[1]["feature"][:3] == [2400 / 8000, 8000.0, 1.0]
    assert out[2]["decode_ok"]  # A-law under a wrong label still decodes
    # ADPCM needs spec-literal step tables: an honest decoder gap
    assert not out[3]["decode_ok"] and out[3]["reason"] == "decoder_gap"

    rows = {
        r["asset_id"]: r
        for r in resize_assets(
            assets, target_bytes=1200, real_decoder=True
        ).collect()
    }
    assert rows[1]["decode_ok"] and rows[1]["media_type"] == "audio/wav"
    import io as _io
    import wave as _wave

    with _wave.open(_io.BytesIO(bytes(rows[1]["payload"]))) as r:
        # 2400 frames x 2 bytes = 4800 -> k=4 -> 600 PCM16 frames
        assert r.getnframes() == 600 and r.getsampwidth() == 2
        assert abs(r.getnframes() / r.getframerate() - 0.3) < 0.01
    assert not rows[3]["decode_ok"]  # ADPCM resize: honest dead-letter


def test_wav_flavors_sloppy_trailer_extensible_float(spark):
    """The review-batch regressions: a sloppy trailer chunk after the
    audio must not corrupt-file a decodable WAV (the walk stops once
    fmt+data are in hand, first data chunk wins — the stdlib
    convention); WAVE_FORMAT_EXTENSIBLE PCM decodes natively (stdlib
    wave rejects the container before Python 3.12); IEEE-float WAV
    decodes as the uncompressed formula-free format it is."""
    import struct

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_wav,
        _resize_wav,
        decode_features,
    )

    pcm = _pcm(800)
    # hand-assembled PCM16 with an overshooting LIST trailer
    base = _raw_wav(1, pcm.astype("<i2").tobytes(), bits=16)
    sloppy = base + b"LIST" + struct.pack("<I", 99999) + b"INFO"
    cs_clean, feats_clean = _featurize_wav(base)
    cs_sloppy, feats_sloppy = _featurize_wav(sloppy)
    assert (cs_clean, feats_clean) == (cs_sloppy, feats_sloppy)
    _resize_wav(sloppy, 400)  # resizes too, not corrupt

    # two data chunks: FIRST wins (stdlib convention)
    two = base + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    assert _featurize_wav(two) == (cs_clean, feats_clean)

    # extensible container wrapping PCM16
    block = 2
    # tag nch rate byterate block bits cbSize(22) validBits mask,
    # then the SubFormat GUID whose first two LE bytes are tag 1 (PCM)
    fmt = struct.pack(
        "<HHIIHHHHIH", 0xFFFE, 1, 8000, 8000 * block, block, 16, 22, 16,
        0x4, 1,
    ) + b"\x00" * 14
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack(
        "<I", len(pcm.astype("<i2").tobytes())
    ) + pcm.astype("<i2").tobytes()
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _featurize_wav(ext) == (cs_clean, feats_clean)

    # float32 WAV: native [-1, 1] scale
    f32 = (pcm.astype(np.float32) / 32768.0).tobytes()
    fwav = _raw_wav(3, f32, bits=32)
    cs_f, feats_f = _featurize_wav(fwav)
    assert feats_f[:3] == [0.1, 8000.0, 1.0]
    assert 0.0 < feats_f[3] < 1.0  # native float scale
    out = _resize_wav(fwav, 800)  # float stays float, tag 3, 32-bit
    tag, nch, rate, bits, data = __import__(
        "inbev_data_engineering_case_spark.operators.multimodal",
        fromlist=["_parse_wav_raw"],
    )._parse_wav_raw(out)
    assert (tag, bits) == (3, 32)
    assert np.array_equal(
        np.frombuffer(data, dtype="<f4"),
        np.frombuffer(f32, dtype="<f4")[::4],
    )

    # end-to-end: all flavors green through the mapInPandas boundary
    assets = spark.createDataFrame(
        [(i + 1, "audio/wav", p, {"n_bytes": len(p), "source": "t"})
         for i, p in enumerate([sloppy, ext, fwav])],
        "asset_id long, media_type string, payload binary, "
        "meta struct<n_bytes:long, source:string>",
    )
    rows = decode_features(assets, real_decoder=True).collect()
    assert all(r["decode_ok"] for r in rows)


def test_wav_taxonomy_and_resize_validation(spark):
    """Pass-2 review regressions: the corrupt-vs-decoder_gap taxonomy
    must hold at the edges, and resize must validate what it emits."""
    import struct

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _featurize_wav,
        _resize_wav,
    )

    # odd-length stereo ADPCM: capability gap, NOT corrupt (the frame
    # check must not fire before the tag dispatch)
    adpcm_odd = _raw_wav(2, b"\x00" * 257, nch=2, bits=4)
    with pytest.raises(NotImplementedError):
        _featurize_wav(adpcm_odd)
    with pytest.raises(NotImplementedError):
        _resize_wav(adpcm_odd, 100)

    # extensible fmt missing its SubFormat GUID: truncation = corrupt,
    # not 'tag 65534 requires codec tables'
    fmt16 = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt16
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="extensible"):
        _featurize_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    # NaN float samples: corrupt, never a NaN feature with decode_ok
    nanwav = _raw_wav(3, struct.pack("<4f", 0.5, float("nan"), 0.1, 0.2),
                      bits=32)
    with pytest.raises(ValueError, match="non-finite"):
        _featurize_wav(nanwav)

    # unsupported widths must not resize into files the decoder
    # rejects: 16-bit float and 12-bit PCM dead-letter on BOTH paths
    f16 = _raw_wav(3, b"\x00" * 8, bits=16)
    with pytest.raises(ValueError, match="float bit depth"):
        _resize_wav(f16, 100)
    p12 = _raw_wav(1, b"\x00" * 12, bits=12)
    with pytest.raises(ValueError, match="PCM bit depth"):
        _resize_wav(p12, 100)


def test_leakage_safe_split_rejects_existing_split_column(spark):
    # twin symmetry: the batch operator must reject a pre-existing
    # 'split' column exactly like its incremental twin, instead of
    # silently clobbering the caller's assignment
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        leakage_safe_split,
    )

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("train").alias("split")
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="split"):
        leakage_safe_split(docs, pairs)
