"""ctypes binding to the system libwebp — the capability-gated lossy
WebP (VP8) decode path.

Why a binding and not a native decoder: VP8 key-frame decoding (RFC
6386) is built on ~2,000 normative constant table entries (the
1056-entry default coefficient probabilities, the 900-entry key-frame
intra-mode probabilities, the token trees) that exist only as literals
in the spec text and its reference implementation. In an offline build
those literals cannot be re-derived — only copied or guessed — and a
guessed table decodes garbage with no error. libwebp IS the public
reference implementation of the format (the same role PIL/ffmpeg play
for the other codec-bound formats in ``multimodal._featurize``), so the
honest production path is: bind it when the system provides it, keep
the ``decoder_gap`` dead-letter when it doesn't. Lossless VP8L still
decodes natively (``webp.vp8l_decode``, RFC 9649) — this module also
gives that decoder an independent-implementation parity oracle.

Reference parity note: the reference repo
(Leo200467/Inbev-Data-Engineering-Case) has no image handling at all;
this is part of the multimodal extension family (SURVEY.md §2.6), and
follows its capability-probe discipline (``_optional_pil`` /
``_optional_ffmpeg``): resolution at call time, ``available()`` False
degrades routing to the reason-coded dead-letter, never a crash.

The encoder entry points exist for FIXTURES (real VP8/VP8L bitstreams
for tests without shipping binaries); production encode is out of
scope, as it is for every other codec here.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache

# SONAME candidates first (a bare .so usually needs the -dev package);
# find_library covers platforms with a working ldconfig cache
_CANDIDATES = (
    "libwebp.so.7",
    "libwebp.so.6",
    "libwebp.so",
    "libwebp.7.dylib",
    "libwebp.dylib",
)

_u8p = ctypes.POINTER(ctypes.c_uint8)


@lru_cache(maxsize=1)
def _lib():
    names = []
    found = ctypes.util.find_library("webp")
    if found:
        names.append(found)
    names.extend(_CANDIDATES)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPDecodeRGBAInto.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                _u8p,
                ctypes.c_size_t,
                ctypes.c_int,
            ]
            lib.WebPDecodeRGBAInto.restype = _u8p
            for enc in ("WebPEncodeRGBA", "WebPEncodeLosslessRGBA"):
                fn = getattr(lib, enc)
                fn.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                ] + ([ctypes.c_float] if enc == "WebPEncodeRGBA" else []) + [
                    ctypes.POINTER(_u8p)
                ]
                fn.restype = ctypes.c_size_t
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            lib.WebPFree.restype = None
        except AttributeError:
            continue
        return lib
    return None


def available() -> bool:
    """True when a usable system libwebp resolved (cached)."""
    return _lib() is not None


def decode_rgba(payload: bytes):
    """WebP payload (simple lossy/lossless or VP8X STILL image) →
    (h, w, 4) uint8 RGBA array, decoded into a numpy-owned buffer
    (``WebPDecodeRGBAInto`` — no cross-boundary malloc to free).

    Raises ``NotImplementedError`` when no libwebp is available (the
    capability contract) and ``ValueError`` when libwebp itself
    rejects the bitstream — which includes ANIMATED files (still-image
    API); callers that can classify animation route it to their own
    decoder-gap reason before calling."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not found by the capability probe "
            "(libwebp.available)"
        )
    w, h = ctypes.c_int(), ctypes.c_int()
    if not lib.WebPGetInfo(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    ):
        raise ValueError("libwebp: not a decodable WebP header")
    if w.value <= 0 or h.value <= 0 or w.value * h.value > 1 << 28:
        raise ValueError("libwebp: implausible dimensions")
    out = np.empty((h.value, w.value, 4), dtype=np.uint8)
    res = lib.WebPDecodeRGBAInto(
        payload,
        len(payload),
        out.ctypes.data_as(_u8p),
        out.nbytes,
        w.value * 4,
    )
    if not res:
        raise ValueError("libwebp: bitstream failed to decode")
    return out


def _encode(arr, encoder: str, *extra) -> bytes:
    import numpy as np

    lib = _lib()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not found by the capability probe "
            "(libwebp.available)"
        )
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 4:
        raise ValueError("encode expects an (h, w, 4) uint8 RGBA array")
    h, w = arr.shape[:2]
    out = _u8p()
    size = getattr(lib, encoder)(
        arr.ctypes.data_as(ctypes.c_char_p),
        w,
        h,
        w * 4,
        *extra,
        ctypes.byref(out),
    )
    if not size or not out:
        raise ValueError(f"libwebp: {encoder} failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)


def encode_rgba(arr, quality: float = 85.0) -> bytes:
    """LOSSY VP8 fixture encoder: (h, w, 4) uint8 RGBA → simple-lossy
    WebP bytes (real RFC 6386 bitstreams for tests)."""
    return _encode(arr, "WebPEncodeRGBA", ctypes.c_float(quality))


def encode_lossless_rgba(arr) -> bytes:
    """LOSSLESS VP8L fixture encoder — an INDEPENDENT implementation of
    the format our native ``webp.vp8l_decode`` reads, so round-trips
    through it validate the native decoder against the reference
    encoder, not just our own fixture encoder."""
    return _encode(arr, "WebPEncodeLosslessRGBA")
