"""AV1 container FIXTURE builders shared by the test suite and
``tools/decode_report_probe.py``: un-box an encoded AVIF's primary
item and re-mux it as a minimal AV1-in-MP4 / AV1-in-WebM payload, so
the video-decode surface can be exercised from the one AV1 encoder
this container has (libheif's). These build synthetic assets only —
the PRODUCTION demux path lives in ``operators/multimodal.py``
(``_mp4_av1_keyframe`` / ``_webm_av1_keyframe``); keeping the
builders here means a tests/ refactor (or a checkout without tests/)
cannot break the shipped probe tool.

Container layouts follow the public specs: ISO BMFF (ISO/IEC
14496-12) sample tables for MP4, Matroska/WebM EBML for WebM, and the
AVIF spec's meta/iprp/iloc item model.
"""

from __future__ import annotations


def avif_primary_item(payload):
    """Fixture-side AVIF un-boxer: (av1C box bytes, width, height, item
    bytes) of the primary item — walks meta/iprp/ipco for the config +
    ispe and meta/iloc for the extent, handling iloc v0-v2 size
    nibbles and base offsets (construction_method 0 only)."""
    import struct

    from inbev_data_engineering_case_spark.operators.multimodal import (
        _iter_boxes,
    )

    meta = next(
        (b, e)
        for t, b, e in _iter_boxes(payload, 0, len(payload))
        if t == b"meta"
    )
    kids = {
        t: (b, e)
        for t, b, e in _iter_boxes(payload, meta[0] + 4, meta[1])
    }
    ipco = None
    for t, b, e in _iter_boxes(payload, *kids[b"iprp"]):
        if t == b"ipco":
            ipco = (b, e)
    av1c = w = h = None
    for t, b, e in _iter_boxes(payload, *ipco):
        if t == b"av1C":
            av1c = payload[b - 8 : e]
        elif t == b"ispe":
            w, h = struct.unpack_from(">II", payload, b + 4)
    ib, ie = kids[b"iloc"]
    ver = payload[ib]
    off_sz, len_sz = payload[ib + 4] >> 4, payload[ib + 4] & 0xF
    base_sz, idx_sz = payload[ib + 5] >> 4, payload[ib + 5] & 0xF
    pos = ib + 6
    if ver < 2:
        count = struct.unpack_from(">H", payload, pos)[0]
        pos += 2
    else:
        count = struct.unpack_from(">I", payload, pos)[0]
        pos += 4
    if count < 1:
        raise ValueError("avif_primary_item: empty iloc item table")

    def read(n):
        nonlocal pos
        v = int.from_bytes(payload[pos : pos + n], "big")
        pos += n
        return v

    read(4 if ver == 2 else 2)  # item id
    if ver in (1, 2):
        if read(2) & 0xF != 0:  # construction_method: file offset
            raise ValueError(
                "avif_primary_item: non-file-offset construction_method"
            )
    read(2)  # data reference index
    base = read(base_sz)
    n_ext = read(2)
    if n_ext < 1:
        raise ValueError("avif_primary_item: item has no extents")
    if ver in (1, 2) and idx_sz:
        read(idx_sz)
    ext_off, ext_len = read(off_sz), read(len_sz)
    item = payload[base + ext_off : base + ext_off + ext_len]
    if not (av1c and w and h and item):
        raise ValueError("avif_primary_item: missing av1C/ispe/extent")
    return av1c, w, h, item


def mux_av1_mp4(av1c, w, h, sample):
    """Fixture-side minimal AV1-in-MP4 muxer: ftyp + mdat + moov with one
    video track whose stbl tables (stsd/av01+av1C, stts, stss, stsc,
    stsz, stco) describe the single keyframe sample."""
    import struct

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    def fullbox(t, ver, flags, body):
        return box(t, bytes([ver]) + flags.to_bytes(3, "big") + body)

    matrix = struct.pack(
        ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomav01mp41")
    mdat = box(b"mdat", sample)
    off = len(ftyp) + 8  # absolute offset of the sample in the file
    av01 = box(
        b"av01",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + av1c,
    )
    stbl = box(
        b"stbl",
        fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + av01)
        + fullbox(b"stts", 0, 0, struct.pack(">III", 1, 1, 1000))
        + fullbox(b"stss", 0, 0, struct.pack(">II", 1, 1))
        + fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
        + fullbox(b"stsz", 0, 0, struct.pack(">III", 0, 1, len(sample)))
        + fullbox(b"stco", 0, 0, struct.pack(">II", 1, off)),
    )
    minf = box(
        b"minf",
        fullbox(b"vmhd", 0, 1, b"\x00" * 8)
        + box(
            b"dinf",
            fullbox(
                b"dref",
                0,
                0,
                struct.pack(">I", 1) + fullbox(b"url ", 0, 1, b""),
            ),
        )
        + stbl,
    )
    mdia = box(
        b"mdia",
        fullbox(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, 1000, 1000)
            + struct.pack(">HH", 0x55C4, 0),
        )
        + fullbox(
            b"hdlr",
            0,
            0,
            b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
        )
        + minf,
    )
    tkhd = fullbox(
        b"tkhd",
        0,
        7,
        struct.pack(">III", 0, 0, 1)
        + b"\x00" * 4
        + struct.pack(">I", 1000)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    mvhd = fullbox(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, 1000)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    return ftyp + mdat + box(b"moov", mvhd + box(b"trak", tkhd + mdia))


def mux_av1_webm(codec_private, w, h, frame, group=False):
    """Fixture-side minimal AV1-in-WebM muxer: EBML header + Segment
    containing Tracks(V_AV1 + CodecPrivate + Video dims) and one
    Cluster with a keyframe SimpleBlock (or, with ``group=True``, a
    BlockGroup keyframe — Block with no ReferenceBlock)."""

    def vsize(n):
        return bytes([0x01]) + n.to_bytes(7, "big")  # 8-octet form

    def el(eid, body):
        return eid + vsize(len(body)) + body

    def uint(v):
        return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")

    header = el(
        b"\x1aE\xdf\xa3",
        el(b"\x42\x82", b"webm")  # DocType
        + el(b"\x42\x87", uint(4))  # DocTypeVersion
        + el(b"\x42\x85", uint(2)),  # DocTypeReadVersion
    )
    video = el(b"\xe0", el(b"\xb0", uint(w)) + el(b"\xba", uint(h)))
    track = el(
        b"\xae",
        el(b"\xd7", uint(1))  # TrackNumber
        + el(b"\x83", uint(1))  # TrackType: video
        + el(b"\x86", b"V_AV1")  # CodecID
        + el(b"\x63\xa2", codec_private)
        + video,
    )
    tracks = el(b"\x16\x54\xae\x6b", track)
    if group:
        # BlockGroup keyframe: Block + no ReferenceBlock sibling
        sblock = el(b"\xa0", el(b"\xa1", b"\x81\x00\x00\x00" + frame))
    else:
        # SimpleBlock: track 1 (vint 0x81), timestamp 0, keyframe flag
        sblock = el(b"\xa3", b"\x81\x00\x00\x80" + frame)
    cluster = el(b"\x1f\x43\xb6\x75", el(b"\xe7", uint(0)) + sblock)
    return header + el(b"\x18\x53\x80\x67", tracks + cluster)
