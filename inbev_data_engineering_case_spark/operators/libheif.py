"""ctypes binding to the system libheif — the capability-gated
AVIF/HEIC decode path.

Why a binding and not a native decoder: AV1 intra-frame decoding (the
AVIF payload) and HEVC intra decoding (HEIC) are each built on
thousands of normative constant table entries — AV1's default CDF
tables alone dwarf VP8's ~2,000 literals that already scoped native
VP8 out (see ``libwebp.py``) — that exist only as literals in the
spec text and its reference implementation. In an offline build those
literals cannot be re-derived, only copied or guessed, and a guessed
table decodes garbage with no error. libheif over dav1d/aom (AV1) and
libde265 (HEVC) is the standard open decode stack for these formats,
so the honest production path is the ``libwebp`` precedent: bind it
when the system provides it, keep the ``decoder_gap`` dead-letter when
it doesn't.

Binding-safety note (why libheif and not libjpeg/dav1d for this
round's gap): libheif's public C API is opaque pointers + accessor
FUNCTIONS — ``heif_image_handle_get_width(handle)``, never
``handle->width`` — so the binding depends on zero struct field
offsets. The one by-value struct, ``heif_error``
(code, subcode, message), has been ABI-frozen since libheif 1.0 and
is declared here verbatim. Contrast libjpeg (present as
``libjpeg.so.62`` but its error contract is setjmp/longjmp with a
default handler that calls ``exit()`` — unimplementable from a ctypes
callback, so one corrupt stream could kill an executor; the
crash-safe TurboJPEG API is not installed) and raw dav1d (requires
reading ``Dav1dPicture`` field offsets, which drift by version).

The encoder entry points exist for FIXTURES (real AVIF/HEIC
bitstreams for tests without shipping binaries); production encode is
out of scope, as it is for every other codec here. Encoding goes
through a temp file (``heif_context_write_to_file``) rather than the
callback-struct writer API — fixtures only, never a hot path.

Reference parity note: the reference repo
(Leo200467/Inbev-Data-Engineering-Case) has no image handling at all;
this is part of the multimodal extension family (SURVEY.md §2.6) and
follows its capability-probe discipline: resolution at call time,
``available()`` False degrades routing to the reason-coded
dead-letter, never a crash.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache

_CANDIDATES = (
    "libheif.so.1",
    "libheif.so",
    "libheif.1.dylib",
    "libheif.dylib",
)

# enum heif_compression_format (heif.h, ABI-stable): the two values
# this module uses. Behaviorally cross-checked at probe time: the
# round-trip tests encode with one enum site and decode through the
# format's own brand sniffing, against rasters that never touch these
# constants — a wrong value fails loudly, never silently.
COMPRESSION_HEVC = 1
COMPRESSION_AV1 = 4

_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHANNEL_INTERLEAVED = 10

# ISO-BMFF brands that mark a HEIF-family STILL image (not a movie):
# the payload sniffer multimodal's image router uses. mif1/msf1 are
# codec-agnostic structural brands — a decode attempt settles them.
_HEIF_BRANDS = frozenset(
    (b"avif", b"avis", b"heic", b"heix", b"heim", b"heis",
     b"hevc", b"hevx", b"mif1", b"msf1")
)


class _HeifError(ctypes.Structure):
    """struct heif_error — returned BY VALUE by every fallible call."""

    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


def is_heif(payload: bytes) -> bool:
    """True when the payload leads with an ISO-BMFF ftyp box carrying a
    HEIF-family still-image brand (major or compatible)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return False
    if payload[8:12] in _HEIF_BRANDS:
        return True
    size = int.from_bytes(payload[:4], "big")
    if not 16 <= size <= min(len(payload), 4096) or size % 4:
        return False
    compat = (
        payload[i:i + 4] for i in range(16, size, 4)
    )
    return any(b in _HEIF_BRANDS for b in compat)


@lru_cache(maxsize=1)
def _lib():
    names = []
    found = ctypes.util.find_library("heif")
    if found:
        names.append(found)
    names.extend(_CANDIDATES)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.heif_context_alloc.restype = ctypes.c_void_p
            lib.heif_context_free.argtypes = [ctypes.c_void_p]
            lib.heif_context_read_from_memory_without_copy.restype = (
                _HeifError
            )
            lib.heif_context_read_from_memory_without_copy.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p,
            ]
            lib.heif_context_get_primary_image_handle.restype = _HeifError
            lib.heif_context_get_primary_image_handle.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ]
            for fn in ("heif_image_handle_get_width",
                       "heif_image_handle_get_height"):
                getattr(lib, fn).restype = ctypes.c_int
                getattr(lib, fn).argtypes = [ctypes.c_void_p]
            lib.heif_image_handle_release.argtypes = [ctypes.c_void_p]
            lib.heif_decode_image.restype = _HeifError
            lib.heif_decode_image.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.heif_image_get_plane_readonly.restype = ctypes.POINTER(
                ctypes.c_uint8
            )
            lib.heif_image_get_plane_readonly.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.heif_image_release.argtypes = [ctypes.c_void_p]
            lib.heif_have_decoder_for_format.restype = ctypes.c_int
            lib.heif_have_decoder_for_format.argtypes = [ctypes.c_int]
            lib.heif_have_encoder_for_format.restype = ctypes.c_int
            lib.heif_have_encoder_for_format.argtypes = [ctypes.c_int]
            # fixture-encoder surface
            lib.heif_context_get_encoder_for_format.restype = _HeifError
            lib.heif_context_get_encoder_for_format.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.heif_encoder_set_lossy_quality.restype = _HeifError
            lib.heif_encoder_set_lossy_quality.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.heif_encoder_release.argtypes = [ctypes.c_void_p]
            lib.heif_image_create.restype = _HeifError
            lib.heif_image_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.heif_image_add_plane.restype = _HeifError
            lib.heif_image_add_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.heif_image_get_plane.restype = ctypes.POINTER(
                ctypes.c_uint8
            )
            lib.heif_image_get_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.heif_context_encode_image.restype = _HeifError
            lib.heif_context_encode_image.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.heif_context_write_to_file.restype = _HeifError
            lib.heif_context_write_to_file.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
            ]
        except AttributeError:
            continue
        return lib
    return None


def available() -> bool:
    """True when a usable system libheif resolved (cached)."""
    return _lib() is not None


def have_decoder(compression: int) -> bool:
    """True when libheif resolved AND a decoder plugin for the given
    compression format (``COMPRESSION_AV1``/``COMPRESSION_HEVC``) is
    compiled in — AVIF needs dav1d/aom, HEIC needs libde265."""
    lib = _lib()
    return bool(lib and lib.heif_have_decoder_for_format(compression))


def have_encoder(compression: int) -> bool:
    """Fixture-encoder probe (aom for AVIF, x265 for HEIC)."""
    lib = _lib()
    return bool(lib and lib.heif_have_encoder_for_format(compression))


# enum heif_error_code (heif.h, ABI-frozen since 1.0): the one value
# the capability contract keys on — 4 = heif_error_Unsupported_feature,
# which is how a missing/incapable codec plugin surfaces at decode
# time. Everything else about a payload we already brand-sniffed as
# HEIF is data trouble (invalid input, truncation), i.e. corrupt.
_ERR_UNSUPPORTED_FEATURE = 4


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"?").decode("utf-8", "replace")
        # classify by the ABI-stable CODE, not the English message
        # (wording varies across versions/builds); keep the string
        # probe only as a belt-and-braces widener for plugin wrappers
        # that misreport their code
        if err.code == _ERR_UNSUPPORTED_FEATURE or (
            "unsupported" in msg.lower() and "codec" in msg.lower()
        ):
            raise NotImplementedError(
                f"libheif {what}: {msg} (code {err.code})"
            )
        raise ValueError(f"libheif {what}: {msg} (code {err.code})")


def decode_rgb(payload: bytes):
    """HEIF-family payload (AVIF/HEIC still image) → (h, w, 3) uint8
    RGB array via the interleaved-RGB decode path.

    Raises ``NotImplementedError`` when no libheif resolved or the
    payload's codec has no decoder plugin (the capability contract)
    and ``ValueError`` when libheif rejects the bitstream itself."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise NotImplementedError(
            "system libheif not found by the capability probe "
            "(libheif.available)"
        )
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise MemoryError("libheif: context alloc failed")
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        # payload (a Python bytes) stays referenced for the whole
        # scope, satisfying without_copy's borrow
        _check(
            lib.heif_context_read_from_memory_without_copy(
                ctx, payload, len(payload), None
            ),
            "read",
        )
        _check(
            lib.heif_context_get_primary_image_handle(
                ctx, ctypes.byref(handle)
            ),
            "primary image",
        )
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if w <= 0 or h <= 0 or w * h > 1 << 28:
            raise ValueError("libheif: implausible dimensions")
        _check(
            lib.heif_decode_image(
                handle, ctypes.byref(img), _COLORSPACE_RGB,
                _CHROMA_INTERLEAVED_RGB, None,
            ),
            "decode",
        )
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride)
        )
        if not ptr or stride.value < w * 3:
            raise ValueError("libheif: no interleaved plane")
        raw = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
        return np.ascontiguousarray(
            raw[:, : w * 3].reshape(h, w, 3)
        )
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def encode(arr, compression: int = COMPRESSION_AV1,
           quality: int = 85) -> bytes:
    """FIXTURE encoder: (h, w, 3) uint8 RGB → AVIF (default) or HEIC
    bytes through the system encoder plugins, via a temp file (the
    file writer is the struct-free API). Tests only."""
    import os
    import tempfile

    import numpy as np

    lib = _lib()
    if lib is None or not lib.heif_have_encoder_for_format(compression):
        raise NotImplementedError(
            "libheif encoder plugin unavailable "
            "(libheif.have_encoder)"
        )
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3 or not arr.size:
        raise ValueError("encode expects a non-empty (h, w, 3) RGB array")
    h, w = arr.shape[:2]
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise MemoryError("libheif: context alloc failed")
    encoder = ctypes.c_void_p()
    img = ctypes.c_void_p()
    out_handle = ctypes.c_void_p()
    try:
        _check(
            lib.heif_context_get_encoder_for_format(
                ctx, compression, ctypes.byref(encoder)
            ),
            "get encoder",
        )
        _check(
            lib.heif_encoder_set_lossy_quality(encoder, int(quality)),
            "set quality",
        )
        _check(
            lib.heif_image_create(
                w, h, _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB,
                ctypes.byref(img),
            ),
            "image create",
        )
        _check(
            lib.heif_image_add_plane(
                img, _CHANNEL_INTERLEAVED, w, h, 8
            ),
            "add plane",
        )
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride)
        )
        if not ptr or stride.value < w * 3:
            raise ValueError("libheif: no writable plane")
        dst = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
        dst[:, : w * 3] = arr.reshape(h, w * 3)
        _check(
            lib.heif_context_encode_image(
                ctx, img, encoder, None, ctypes.byref(out_handle)
            ),
            "encode",
        )
        fd, path = tempfile.mkstemp(suffix=".heif")
        os.close(fd)
        try:
            _check(
                lib.heif_context_write_to_file(ctx, path.encode()),
                "write",
            )
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        if out_handle:
            lib.heif_image_handle_release(out_handle)
        if img:
            lib.heif_image_release(img)
        if encoder:
            lib.heif_encoder_release(encoder)
        lib.heif_context_free(ctx)
