"""WebP VP8L (lossless) codec — pure stdlib + numpy, no PIL.

Decoder: the full RFC 9649 VP8L feature set — all four transforms
(predictor, color, subtract-green, color-indexing incl. sub-byte pixel
packing), color cache, meta Huffman groups, and LZ77 backward
references — so WebP-lossless crawl assets decode on a bare cluster
the way PNG/GIF/JPEG already do (``multimodal._stdlib_featurize``).
Lossy VP8 decodes through the system libwebp when the capability
probe resolves it (``operators/libwebp.py`` — a ctypes binding to the
format's public reference implementation; its docstring explains why
VP8 is bound, not reimplemented: the RFC 6386 normative probability
tables are spec literals that cannot be re-derived offline). Without
libwebp (or PIL), lossy stays an honest ``NotImplementedError`` → the
``decoder_gap`` dead-letter reason. Animated WebP decodes FRAME 1
composed onto the canvas (``_webp_first_frame`` — pure RFC 9649
container demux, the GIF first-frame discipline); a LOSSY first frame
rides the same libwebp gate.

Encoder: a fixture/round-trip tool (the ``_jpeg_encode`` discipline) —
enough of the format (simple + code-length-coded Huffman, subtract-
green, color-indexing with packing, color cache, run-length LZ77) to
produce genuine VP8L bitstreams for tests without PIL, not a
production encoder.

Format facts (bit order, transform semantics, the 120-entry distance
mapping, prefix codes, cache hashing) follow RFC 9649 / the public
libwebp sources; the distance neighborhood table is GENERATED from its
sort rule (squared distance, then |dx|, positive dx first) rather than
transcribed, so it cannot be mistyped.
"""

from __future__ import annotations

import heapq
import zlib

# ---------------------------------------------------------------------------
# bit I/O — VP8L is LSB-first within bytes (unlike JPEG's MSB-first)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        v = 0
        p = self.bitpos
        if p + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.bitpos = p + n
        return v


class _BitWriter:
    __slots__ = ("bytes_", "acc", "n")

    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, n: int, v: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.bytes_.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.bytes_.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.bytes_)


# ---------------------------------------------------------------------------
# canonical Huffman codes (decode: bit-by-bit, code extended MSB-first)
# ---------------------------------------------------------------------------


def _build_table(lengths: list[int]):
    """Canonical code table ``{(length, code): symbol}`` (DEFLATE
    assignment: by length, then symbol value). A single used symbol is
    the one allowed incomplete code — a 0-bit read. Over-/under-
    subscribed codes raise (corrupt stream)."""
    nz = [(length, s) for s, length in enumerate(lengths) if length > 0]
    if not nz:
        raise ValueError("VP8L: empty huffman code")
    if len(nz) == 1:
        return (None, nz[0][1])
    max_len = max(length for length, _ in nz)
    bl = [0] * (max_len + 1)
    for length, _ in nz:
        bl[length] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for length in range(1, max_len + 1):
        code = (code + bl[length - 1]) << 1
        next_code[length] = code
    table: dict[tuple[int, int], int] = {}
    space = 0
    for s, length in enumerate(lengths):
        if length:
            table[(length, next_code[length])] = s
            next_code[length] += 1
            space += 1 << (max_len - length)
    if space != 1 << max_len:
        raise ValueError("VP8L: over/under-subscribed huffman code")
    return (table, max_len)


def _read_symbol(table, br: _BitReader) -> int:
    if table[0] is None:
        return table[1]  # single-symbol code consumes no bits
    tbl, max_len = table
    code = 0
    for length in range(1, max_len + 1):
        code = (code << 1) | br.read(1)
        sym = tbl.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("VP8L: invalid huffman code in stream")


# code-length-code symbol transmission order (RFC 9649 §5.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_huffman_code(br: _BitReader, alphabet_size: int):
    if br.read(1):  # simple code: 1 or 2 symbols, lengths 0/1
        num_symbols = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 1:
            return (None, sym0)
        sym1 = br.read(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise ValueError("VP8L: bad simple-code symbol pair")
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _build_table(lengths)
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_table = _build_table(cl_lengths)
    if br.read(1):  # explicit max_symbol budget
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = _read_symbol(cl_table, br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _build_table(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2-D distance neighborhood
# ---------------------------------------------------------------------------


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _make_plane_codes() -> list[tuple[int, int]]:
    """The 120 (dx, dy) near-pixel offsets distance codes 1..120 map
    to, generated from the spec's ordering rule: sort by squared
    euclidean distance, then |dx|, positive dx before negative
    (verified against the spec's opening entries (0,1) (1,0) (1,1)
    (-1,1) (0,2) ...)."""
    pairs = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(pairs) == 120
    return pairs


_PLANE_CODES = _make_plane_codes()


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_CODES[code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _ceil_shift(v: int, bits: int) -> int:
    return (v + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# entropy-coded image (shared by the main image and every sub-image)
# ---------------------------------------------------------------------------


def _decode_image(br: _BitReader, w: int, h: int, allow_meta: bool):
    """One spatially-coded VP8L image → list of w*h ARGB ints. Order
    per stream: color-cache info, then (main image only) the meta
    Huffman bit + entropy image, then the Huffman groups, then the
    pixel/LZ77/cache symbol stream."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: color-cache bits out of range")
    meta_img = None
    hbits = 0
    meta_w = 0
    num_groups = 1
    if allow_meta and br.read(1):
        hbits = br.read(3) + 2
        meta_w = _ceil_shift(w, hbits)
        meta_img = _decode_image(br, meta_w, _ceil_shift(h, hbits), False)
        num_groups = max((px >> 8) & 0xFFFF for px in meta_img) + 1
    green_alphabet = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_huffman_code(br, green_alphabet),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 40),
            )
        )
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = w * h
    out: list[int] = [0] * n
    pos = x = y = 0
    group = groups[0]
    while pos < n:
        if meta_img is not None:
            mpx = meta_img[(y >> hbits) * meta_w + (x >> hbits)]
            group = groups[(mpx >> 8) & 0xFFFF]
        s = _read_symbol(group[0], br)
        if s < 256:  # literal: G then R, B, A
            r = _read_symbol(group[1], br)
            b = _read_symbol(group[2], br)
            a = _read_symbol(group[3], br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:  # LZ77 backward reference
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(_read_symbol(group[4], br), br)
            dist = _plane_to_distance(dcode, w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            for _ in range(length):
                if pos >= n:
                    raise ValueError("VP8L: backward reference overflows")
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
                x += 1
                if x == w:
                    x = 0
                    y += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without a cache")
            px = cache[s - 280]
            out[pos] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return out


# ---------------------------------------------------------------------------
# inverse transforms (applied in reverse stream order)
# ---------------------------------------------------------------------------


def _add_px(a: int, b: int) -> int:
    """Per-channel byte-wise (a + b) & 0xff over packed ARGB."""
    return (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF) | (
        ((((a >> 8) & 0x00FF00FF) + ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF)
        << 8
    )


def _avg2(a: int, b: int) -> int:
    """Per-channel floor average (libwebp's carry-free bit trick)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _channels(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _select(t: int, l_: int, tl: int) -> int:  # predictor 11
    pa_minus_pb = 0
    for tc, lc, tlc in zip(_channels(t), _channels(l_), _channels(tl)):
        pa_minus_pb += abs(lc - tlc) - abs(tc - tlc)
    return t if pa_minus_pb <= 0 else l_


def _clamp_add_sub_full(l_: int, t: int, tl: int) -> int:  # predictor 12
    px = 0
    for lc, tc, tlc in zip(_channels(l_), _channels(t), _channels(tl)):
        px = (px << 8) | _clip255(lc + tc - tlc)
    return px


def _clamp_add_sub_half(l_: int, t: int, tl: int) -> int:  # predictor 13
    ave = _avg2(l_, t)
    px = 0
    for ac, tlc in zip(_channels(ave), _channels(tl)):
        d = ac - tlc
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        px = (px << 8) | _clip255(ac + half)
    return px


def _predict(mode: int, l_: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l_
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l_, tr), t)
    if mode == 6:
        return _avg2(l_, tl)
    if mode == 7:
        return _avg2(l_, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l_, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l_, tl)
    if mode == 12:
        return _clamp_add_sub_full(l_, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l_, t, tl)
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _inv_predictor(pix: list[int], w: int, h: int, bits: int, data):
    tw = _ceil_shift(w, bits)
    out = pix  # in place: residual + prediction, scan order
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = (data[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                # TR of the rightmost column aliases the current row's
                # first pixel (contiguous-memory semantics the spec
                # blessed); it is already decoded
                pred = _predict(
                    mode, out[i - 1], out[i - w], out[i - w - 1],
                    out[i - w + 1],
                )
            out[i] = _add_px(out[i], pred)
    return out


def _ct_delta(pred_byte: int, color_byte: int) -> int:
    """(int8)pred * (int8)color >> 5 with arithmetic shift."""
    p = pred_byte - 256 if pred_byte >= 128 else pred_byte
    c = color_byte - 256 if color_byte >= 128 else color_byte
    return (p * c) >> 5


def _inv_color_transform(pix: list[int], w: int, h: int, bits: int, data):
    tw = _ceil_shift(w, bits)
    for y in range(h):
        row = y * w
        trow = (y >> bits) * tw
        for x in range(w):
            i = row + x
            cte = data[trow + (x >> bits)]
            # multiplier packing per libwebp ColorCodeToMultipliers:
            # blue byte = green_to_red, green byte = green_to_blue,
            # red byte = red_to_blue
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            argb = pix[i]
            green = (argb >> 8) & 0xFF
            red = ((argb >> 16) & 0xFF) + _ct_delta(g2r, green)
            red &= 0xFF
            blue = (argb & 0xFF) + _ct_delta(g2b, green)
            blue += _ct_delta(r2b, red)
            blue &= 0xFF
            pix[i] = (argb & 0xFF00FF00) | (red << 16) | blue
    return pix


def _inv_subtract_green(pix: list[int]) -> list[int]:
    for i, argb in enumerate(pix):
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) + g) & 0xFF
        b = ((argb & 0xFF) + g) & 0xFF
        pix[i] = (argb & 0xFF00FF00) | (r << 16) | b
    return pix


def _palette_width_bits(num_colors: int) -> int:
    if num_colors <= 2:
        return 3
    if num_colors <= 4:
        return 2
    if num_colors <= 16:
        return 1
    return 0


def _inv_color_index(
    pix: list[int], packed_w: int, h: int, wbits: int, palette: list[int],
    orig_w: int,
) -> list[int]:
    out = [0] * (orig_w * h)
    bpp = 8 >> wbits  # bits per palette index
    ppb = 1 << wbits  # indices packed per green byte
    mask = (1 << bpp) - 1
    np_ = len(palette)
    for y in range(h):
        prow = y * packed_w
        orow = y * orig_w
        for x in range(orig_w):
            green = (pix[prow + (x >> wbits)] >> 8) & 0xFF
            idx = (green >> (bpp * (x & (ppb - 1)))) & mask
            # out-of-range index → transparent black, per spec
            out[orow + x] = palette[idx] if idx < np_ else 0
    return out


# ---------------------------------------------------------------------------
# VP8L bitstream + WebP container decode
# ---------------------------------------------------------------------------


def vp8l_decode(data: bytes):
    """Decode one VP8L chunk payload → (pixels, width, height) where
    pixels is an ``h*w`` list of packed ARGB ints."""
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint (informative)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L: unsupported version {version}")
    transforms = []
    seen: set[int] = set()
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            data_img = _decode_image(
                br, _ceil_shift(cur_w, bits), _ceil_shift(h, bits), False
            )
            transforms.append((ttype, bits, data_img, cur_w))
        elif ttype == 2:  # subtract green
            transforms.append((2, 0, None, cur_w))
        else:  # color indexing
            num_colors = br.read(8) + 1
            raw = _decode_image(br, num_colors, 1, False)
            palette = []
            acc = 0
            for px in raw:  # palette entries are per-channel deltas
                acc = _add_px(acc, px)
                palette.append(acc)
            wbits = _palette_width_bits(num_colors)
            transforms.append((3, wbits, palette, cur_w))
            cur_w = _ceil_shift(cur_w, wbits)
    pix = _decode_image(br, cur_w, h, True)
    for ttype, bits, tdata, t_w in reversed(transforms):
        if ttype == 3:
            pix = _inv_color_index(pix, cur_w, h, bits, tdata, t_w)
            cur_w = t_w
        elif ttype == 2:
            pix = _inv_subtract_green(pix)
        elif ttype == 1:
            pix = _inv_color_transform(pix, cur_w, h, bits, tdata)
        else:
            pix = _inv_predictor(pix, cur_w, h, bits, tdata)
    if cur_w != w:
        raise ValueError("VP8L: width not restored by transforms")
    return pix, w, h


def _vp8l_pixels_to_rgba(pix, w: int, h: int):
    """Packed-ARGB word list → (h, w, 4) uint8 RGBA array — the ONE
    channel-order-sensitive unpack, shared by the still and
    animation-frame decode paths."""
    import numpy as np

    arr = np.asarray(pix, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF  # R
    out[..., 1] = (arr >> 8) & 0xFF  # G
    out[..., 2] = arr & 0xFF  # B
    out[..., 3] = (arr >> 24) & 0xFF  # A
    return out


def _le24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _webp_first_frame(payload: bytes):
    """Animated WebP → FRAME 1 composed onto the canvas as (h, w, 4)
    uint8 RGBA — the GIF first-frame discipline (multimodal.
    _gif_decode_pixels: sub-rectangle frames compose onto the full
    canvas over the background color, so the raster always has the
    canvas dimensions and the cross-encoding checksum contract holds).

    Pure RFC 9649 container parsing: VP8X carries the canvas size,
    the first ANMF the frame rectangle (x/2, y/2, w-1, h-1 in 24-bit
    LE fields), its blend flag, and the frame's own ALPH/VP8/VP8L
    sub-chunks. VP8L frames decode natively; VP8 frames re-wrap as a
    still container for the system libwebp (NotImplementedError
    without one — the honest remaining gap); blend method 0
    source-over-composites the frame onto the canvas, 1 overwrites
    the rectangle.

    The canvas initializes TRANSPARENT BLACK, deliberately ignoring
    the ANIM background color: the spec makes the fill advisory
    ("MAY be used"), and the reference renderers — libwebp's
    WebPAnimDecoder, and therefore PIL's animated-WebP route —
    compose onto a transparent canvas. Matching them keeps the
    deterministic-fingerprint contract across capability routes: the
    same asset checksums identically whether a worker decodes it
    here or falls through to PIL."""
    import numpy as np

    pos = 12
    canvas_w = canvas_h = None
    anmf = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8X" and len(body) >= 10:
            canvas_w = _le24(body, 4) + 1
            canvas_h = _le24(body, 7) + 1
        elif tag == b"ANMF":
            anmf = body
            break
        pos += 8 + size + (size & 1)
    if anmf is None or canvas_w is None:
        raise ValueError(
            "animated WebP: missing ANMF frame or VP8X canvas"
        )
    if len(anmf) < 16:
        raise ValueError("animated WebP: ANMF header truncated")
    fx, fy = 2 * _le24(anmf, 0), 2 * _le24(anmf, 3)
    fw, fh = _le24(anmf, 6) + 1, _le24(anmf, 9) + 1
    no_blend = bool(anmf[15] & 0x02)
    # frame data: optional ALPH chunk, then one VP8/VP8L chunk
    fpos, alph = 16, None
    frame_px = None
    while fpos + 8 <= len(anmf):
        tag = anmf[fpos : fpos + 4]
        size = int.from_bytes(anmf[fpos + 4 : fpos + 8], "little")
        body = anmf[fpos + 8 : fpos + 8 + size]
        if tag == b"ALPH":
            alph = anmf[fpos : fpos + 8 + size + (size & 1)]
        elif tag == b"VP8L":
            pix, w, h = vp8l_decode(body)
            frame_px = _vp8l_pixels_to_rgba(pix, w, h)
            break
        elif tag == b"VP8 ":
            from inbev_data_engineering_case_spark.operators import (
                libwebp as _libwebp,
            )

            if not _libwebp.available():
                raise NotImplementedError(
                    "animated WebP with a LOSSY (VP8) first frame "
                    "requires the system libwebp (capability probe "
                    "found none); VP8L first frames decode natively."
                )
            chunk = anmf[fpos : fpos + 8 + size + (size & 1)]
            if alph is not None:
                # re-wrap as a VP8X still so libwebp applies the
                # ALPH plane to the lossy frame
                vp8x = (
                    b"VP8X"
                    + (10).to_bytes(4, "little")
                    + bytes([0x10, 0, 0, 0])  # alpha flag
                    + (fw - 1).to_bytes(3, "little")
                    + (fh - 1).to_bytes(3, "little")
                )
                inner = vp8x + alph + chunk
            else:
                inner = chunk
            still = (
                b"RIFF"
                + (4 + len(inner)).to_bytes(4, "little")
                + b"WEBP"
                + inner
            )
            frame_px = _libwebp.decode_rgba(still)
            break
        fpos += 8 + size + (size & 1)
    if frame_px is None:
        raise ValueError("animated WebP: ANMF carries no VP8/VP8L data")
    if frame_px.shape[:2] != (fh, fw):
        raise ValueError(
            "animated WebP: frame bitstream size disagrees with the "
            "ANMF rectangle"
        )
    if fx + fw > canvas_w or fy + fh > canvas_h:
        raise ValueError("animated WebP: frame rectangle exits canvas")
    canvas = np.zeros((canvas_h, canvas_w, 4), dtype=np.uint8)
    target = canvas[fy : fy + fh, fx : fx + fw]
    if no_blend:
        target[:] = frame_px
    else:  # source-over with straight alpha, per the blend method
        fa = frame_px[..., 3:4].astype(np.float64) / 255.0
        ba = target[..., 3:4].astype(np.float64) / 255.0
        out_a = fa + ba * (1.0 - fa)
        safe = np.where(out_a == 0.0, 1.0, out_a)
        rgb = (
            frame_px[..., :3] * fa + target[..., :3] * ba * (1.0 - fa)
        ) / safe
        target[..., :3] = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        target[..., 3:4] = np.clip(np.round(out_a * 255.0), 0, 255).astype(
            np.uint8
        )
    return canvas


def webp_decode(payload: bytes):
    """RIFF/WEBP container → decoded (h, w, 4) uint8 RGBA array.
    VP8L (also inside VP8X) decodes natively; lossy VP8 (and VP8X
    still images) decode via the system libwebp when the capability
    probe finds it (operators/libwebp.py — see its docstring for why
    VP8 is a binding, not a reimplementation); without it, lossy
    raises NotImplementedError (→ the decoder_gap dead-letter
    reason). Animated WebP decodes FRAME 1 composed onto the canvas
    (``_webp_first_frame``, the GIF first-frame discipline); a lossy
    first frame needs libwebp too."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    pos = 12
    vp8l = None
    saw_lossy = False
    saw_extended = False
    saw_animated = False
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            saw_lossy = True
        if tag == b"VP8X":
            saw_extended = True
        if tag in (b"ANIM", b"ANMF"):
            saw_animated = True
        pos += 8 + size + (size & 1)
    if vp8l is None:
        if saw_lossy or saw_animated:
            # lossy VP8 / extended still images: the system libwebp
            # (RFC 6386's reference implementation) decodes them when
            # the capability probe finds it — see operators/libwebp.py
            # for why native VP8 is a binding, not a reimplementation
            from inbev_data_engineering_case_spark.operators import (
                libwebp as _libwebp,
            )

            if _libwebp.available() and not saw_animated:
                try:
                    return _libwebp.decode_rgba(payload)
                except ValueError:
                    # a plain lossy still that libwebp rejects is
                    # corrupt, not a capability gap
                    raise ValueError(
                        "WebP: lossy VP8 bitstream failed to decode"
                    ) from None
        if saw_lossy and not saw_animated:
            raise NotImplementedError(
                "lossy WebP (VP8) decoding requires a codec (the "
                "system libwebp or PIL, when the capability probes "
                "find one); lossless VP8L decodes natively — see "
                "webp.vp8l_decode."
            )
        if saw_animated:
            # ANIMATED WebP: decode FRAME 1 composed onto the canvas
            # (the GIF first-frame discipline — still-image semantics
            # every thumbnailer uses). The demux is pure container
            # parsing (RFC 9649 extended format); the frame payload
            # routes to the same VP8L-native / VP8-via-libwebp codecs
            # as stills, so the only remaining capability gap is a
            # LOSSY first frame without a system libwebp
            return _webp_first_frame(payload)
        if saw_extended:
            raise NotImplementedError(
                "extended WebP (VP8X) without a decodable image chunk "
                "requires PIL; still images and animation first "
                "frames decode natively (VP8L) or via the system "
                "libwebp (VP8)."
            )
        raise ValueError("WebP: no VP8L/VP8 image chunk found")
    pix, w, h = vp8l_decode(vp8l)
    return _vp8l_pixels_to_rgba(pix, w, h)


def featurize_webp(payload: bytes):
    """The ``_featurize_png`` contract for WebP lossless: checksum =
    crc32 of the decoded RGBA raster (two encodings of one image —
    different transform/cache choices — fingerprint identically),
    features = [width, height, channels, mean sample]."""
    pixels = webp_decode(payload)
    h, w, c = pixels.shape
    checksum = zlib.crc32(pixels.tobytes()) % 1_000_003
    mean_px = float(pixels.astype("float64").mean()) if pixels.size else 0.0
    return checksum, [float(w), float(h), float(c), mean_px]


# ---------------------------------------------------------------------------
# encoder — fixture / round-trip tool
# ---------------------------------------------------------------------------


def _huffman_lengths(hist: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths from a symbol histogram (heapq Huffman). Raises if
    the depth exceeds ``max_len`` — fine for a fixture tool; a
    production encoder would length-limit."""
    if len(hist) == 1:
        return {next(iter(hist)): 1}
    heap = [(cnt, [sym]) for sym, cnt in hist.items()]
    heapq.heapify(heap)
    depth = {s: 0 for s in hist}
    while len(heap) > 1:
        c1, s1 = heapq.heappop(heap)
        c2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, s1 + s2))
    if max(depth.values()) > max_len:
        raise ValueError("VP8L encoder: huffman depth exceeds limit")
    return depth


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (length, code) under the canonical assignment the
    decoder replays (by length, then symbol value)."""
    max_len = max(lengths.values())
    bl = [0] * (max_len + 1)
    for length in lengths.values():
        bl[length] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for length in range(1, max_len + 1):
        code = (code + bl[length - 1]) << 1
        next_code[length] = code
    out = {}
    for sym in sorted(lengths):
        length = lengths[sym]
        out[sym] = (length, next_code[length])
        next_code[length] += 1
    return out


def _write_huffman_code(bw: _BitWriter, lengths: dict[int, int]) -> dict:
    """Serialize one Huffman code (simple form for ≤2 symbols, the
    code-length-code form otherwise, truncated via max_symbol) and
    return the symbol→(len,code) map for the payload writer."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 0)  # num_symbols - 1 = 0
        s = syms[0]
        if s <= 1:
            bw.write(1, 0)  # 1-bit first symbol
            bw.write(1, s)
        else:
            bw.write(1, 1)
            bw.write(8, s)
        return {s: (0, 0)}
    single_large = None
    if len(syms) == 1:
        # a symbol ≥ 256 cannot ride the 8-bit simple form; a
        # single-length-1 full code is the allowed incomplete code.
        # The DECODER reads a one-symbol code as 0 bits (_build_table's
        # single-symbol case), so the returned emission map must be
        # 0-bit too — a 1-bit map here would desync the stream.
        single_large = syms[0]
        lengths = dict(lengths)
        lengths[syms[0]] = 1
    if len(syms) == 2 and max(syms) < 256:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(8, syms[0])
        bw.write(8, syms[1])
        # canonical: smaller symbol → code 0
        return {syms[0]: (1, 0), syms[1]: (1, 1)}
    bw.write(1, 0)  # full code
    seq = [lengths.get(s, 0) for s in range(max(syms) + 1)]
    cl_hist: dict[int, int] = {}
    for v in seq:
        cl_hist[v] = cl_hist.get(v, 0) + 1
    cl_lengths = _huffman_lengths(cl_hist, 7)
    if len(cl_lengths) == 1:
        # a 1-symbol code-length code would be incomplete; pad with a
        # never-used second symbol at length 1
        only = next(iter(cl_lengths))
        cl_lengths = {only: 1, (only + 1) % 16: 1}
    num_cl = max(_CL_ORDER.index(s) for s in cl_lengths) + 1
    num_cl = max(num_cl, 4)
    bw.write(4, num_cl - 4)
    for i in range(num_cl):
        bw.write(3, cl_lengths.get(_CL_ORDER[i], 0))
    cl_codes = _canonical_codes(cl_lengths)
    # truncate transmission at the last nonzero length via max_symbol
    bw.write(1, 1)
    nbits = 2
    while (len(seq) - 2) >= (1 << nbits):
        nbits += 2
    bw.write(3, (nbits - 2) // 2)
    bw.write(nbits, len(seq) - 2)
    for v in seq:
        length, code = cl_codes[v]
        for bit_i in range(length - 1, -1, -1):
            bw.write(1, (code >> bit_i) & 1)
    if single_large is not None:
        return {single_large: (0, 0)}  # decoder reads this code 0-bit
    return _canonical_codes(lengths)


def _emit(bw: _BitWriter, codes: dict, sym: int) -> None:
    length, code = codes[sym]
    for bit_i in range(length - 1, -1, -1):
        bw.write(1, (code >> bit_i) & 1)


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (≥1) → (prefix_code, extra_bits, extra_value): the exact
    inverse of ``_prefix_value`` (codes 0-3 are the literals 1-4; code
    2k/2k+1 spans [2<<(k-1), …] / [3<<(k-1), …])."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, extra, v & ((1 << extra) - 1)


def vp8l_encode(
    pixels,
    use_subtract_green: bool = False,
    use_palette: bool = False,
    cache_bits: int = 0,
    rle: bool = False,
) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA array as a genuine VP8L WebP.
    Feature toggles exist so round-trip tests can exercise each decoder
    path (transforms, packing, cache, LZ77) independently."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    argb = (
        (arr[..., 3].astype(np.uint32) << 24)
        | (arr[..., 0].astype(np.uint32) << 16)
        | (arr[..., 1].astype(np.uint32) << 8)
        | arr[..., 2].astype(np.uint32)
    ).reshape(-1)
    bw = _BitWriter()
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, int(bool((arr[..., 3] != 255).any())))
    bw.write(3, 0)  # version

    pix = [int(v) for v in argb]
    enc_w = w
    if use_palette:
        palette = sorted(set(pix))
        if len(palette) > 256:
            raise ValueError("VP8L encoder: >256 colors with use_palette")
        bw.write(1, 1)  # transform present
        bw.write(2, 3)  # color indexing
        bw.write(8, len(palette) - 1)
        deltas = []
        prev = 0
        for c in palette:
            # per-channel delta so the decoder's running sum restores it
            d = (
                (((c >> 24) - (prev >> 24)) & 0xFF) << 24
                | (((c >> 16 & 0xFF) - (prev >> 16 & 0xFF)) & 0xFF) << 16
                | (((c >> 8 & 0xFF) - (prev >> 8 & 0xFF)) & 0xFF) << 8
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            deltas.append(d)
            prev = c
        _encode_image(bw, deltas, 0, False, is_main=False)
        index_of = {c: i for i, c in enumerate(palette)}
        wbits = _palette_width_bits(len(palette))
        bpp = 8 >> wbits
        ppb = 1 << wbits
        enc_w = _ceil_shift(w, wbits)
        packed = [0] * (enc_w * h)
        for y in range(h):
            for x in range(w):
                idx = index_of[pix[y * w + x]]
                shift = 8 + bpp * (x & (ppb - 1))  # green channel bits
                packed[y * enc_w + (x >> wbits)] |= idx << shift
        pix = [0xFF000000 | p for p in packed]
    if use_subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        pix = [
            (p & 0xFF00FF00)
            | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
            | ((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF
            for p in pix
        ]
    bw.write(1, 0)  # no more transforms
    _encode_image(bw, pix, cache_bits, rle)
    payload = bw.finish()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _encode_image(
    bw: _BitWriter,
    pix: list[int],
    cache_bits: int,
    rle: bool,
    is_main: bool = True,
) -> None:
    """One spatially-coded image: optional color cache, no meta
    Huffman, literals plus (optionally) distance-1 run-length LZ77 and
    cache hits. The meta-Huffman bit exists ONLY in the main image's
    stream — sub-images (palette, transform data) never carry it, so
    ``is_main=False`` must not write it."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
    else:
        bw.write(1, 0)
    if is_main:
        bw.write(1, 0)  # no meta huffman
    # token stream: ("lit", px) | ("run", length) | ("hit", index)
    tokens: list[tuple[str, int]] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    n = len(pix)
    while i < n:
        px = pix[i]
        if rle and i > 0 and pix[i - 1] == px:
            run = 1
            while i + run < n and pix[i + run] == px:
                run += 1
            tokens.append(("run", run))
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            i += run
            continue
        if cache is not None:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                tokens.append(("hit", ci))
                i += 1
                continue
            cache[ci] = px
        tokens.append(("lit", px))
        i += 1
    g_hist: dict[int, int] = {}
    r_hist: dict[int, int] = {}
    b_hist: dict[int, int] = {}
    a_hist: dict[int, int] = {}
    d_hist: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "lit":
            g_hist[(v >> 8) & 0xFF] = g_hist.get((v >> 8) & 0xFF, 0) + 1
            r_hist[(v >> 16) & 0xFF] = r_hist.get((v >> 16) & 0xFF, 0) + 1
            b_hist[v & 0xFF] = b_hist.get(v & 0xFF, 0) + 1
            a_hist[(v >> 24) & 0xFF] = a_hist.get((v >> 24) & 0xFF, 0) + 1
        elif kind == "run":
            pc, _, _ = _prefix_encode(v)
            g_hist[256 + pc] = g_hist.get(256 + pc, 0) + 1
            # distance 1 = plane code 2 ((1,0)) → prefix code 1
            d_hist[1] = d_hist.get(1, 0) + 1
        else:
            g_hist[280 + v] = g_hist.get(280 + v, 0) + 1
    for hist in (r_hist, b_hist, a_hist):
        if not hist:
            hist[0] = 1  # unused channel still needs a (simple) code
    if not d_hist:
        d_hist[0] = 1
    g_len = _huffman_lengths(g_hist, 15)
    g_codes = _write_huffman_code(bw, g_len)
    r_codes = _write_huffman_code(bw, _huffman_lengths(r_hist, 15))
    b_codes = _write_huffman_code(bw, _huffman_lengths(b_hist, 15))
    a_codes = _write_huffman_code(bw, _huffman_lengths(a_hist, 15))
    d_codes = _write_huffman_code(bw, _huffman_lengths(d_hist, 15))
    for kind, v in tokens:
        if kind == "lit":
            _emit(bw, g_codes, (v >> 8) & 0xFF)
            _emit(bw, r_codes, (v >> 16) & 0xFF)
            _emit(bw, b_codes, v & 0xFF)
            _emit(bw, a_codes, (v >> 24) & 0xFF)
        elif kind == "run":
            pc, extra, ev = _prefix_encode(v)
            _emit(bw, g_codes, 256 + pc)
            if extra:
                bw.write(extra, ev)
            # distance 1 = plane code 2 ((1,0)): prefix code 1, no
            # extra bits
            _emit(bw, d_codes, 1)
        else:
            _emit(bw, g_codes, 280 + v)
