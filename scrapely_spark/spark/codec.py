"""Deterministic image payload codec + fidelity metrics.

The sandbox has no image libraries (no PIL/opencv), so real PNG/JPEG
decode is STUBBED — but everything Spark-side is real: images are opaque
``binary`` columns with typed metadata, encoded/decoded by deterministic
pure-numpy kernels inside Arrow batches, and fidelity is checked with the
same per-row invariant the north rule demands (decoded-pixel allclose /
PSNR ≥ 40 dB for the lossy format + caption equality).

Formats:

* ``png``  — lossless: zlib-compressed raw RGB with a tiny header.
* ``jpeg`` — lossy stand-in: quantized (step 2) then zlib-compressed;
  round-trips at ~42-48 dB PSNR, exercising the lossy acceptance path.

Real-codec integration point: :func:`decode_image` — swap the body for
``PIL.Image.open`` when the dependency exists; the Spark plumbing
(schemas, batch shapes, UDF signatures) does not change.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = b"SGIM"
_LOSSY_STEP = 2


def pixels_for(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic ground-truth pixels for a synthetic image id."""
    seed = zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # add smooth structure so quantization error is image-like
    yy = np.linspace(0, np.pi * 2, h)[:, None, None]
    xx = np.linspace(0, np.pi * 2, w)[None, :, None]
    wave = (127 + 64 * np.sin(yy + xx)).astype(np.uint8)
    return ((base.astype(np.uint16) + wave) // 2).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode pixels into the deterministic container format."""
    h, w, _ = pixels.shape
    if fmt == "jpeg":
        payload = (pixels // _LOSSY_STEP).astype(np.uint8)
    elif fmt == "png":
        payload = pixels
    else:
        raise NotImplementedError(
            "real codec for %r requires an image library absent from this "
            "environment; plug PIL into decode_image/encode_image" % fmt)
    header = MAGIC + fmt[:1].encode() + w.to_bytes(4, "big") + \
        h.to_bytes(4, "big")
    return header + zlib.compress(payload.tobytes(), level=1)


def decode_image(data: bytes) -> tuple[np.ndarray, int, int, str]:
    """Decode container bytes → (pixels, w, h, fmt).

    STUB BOUNDARY: replace with a real decoder (PIL) for actual
    PNG/JPEG payloads; everything downstream consumes the numpy array.
    """
    if not data.startswith(MAGIC):
        raise NotImplementedError(
            "unknown image container; real PNG/JPEG decode needs PIL which "
            "is not available in this environment")
    fmt = "jpeg" if data[4:5] == b"j" else "png"
    w = int.from_bytes(data[5:9], "big")
    h = int.from_bytes(data[9:13], "big")
    raw = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    pixels = raw.reshape(h, w, 3)
    if fmt == "jpeg":
        pixels = np.minimum(
            pixels.astype(np.uint16) * _LOSSY_STEP + _LOSSY_STEP // 2,
            255).astype(np.uint8)
    return pixels, w, h, fmt


MAGIC_VIDEO = b"SGVD"


def frames_for(video_id: str, w: int, h: int, n_frames: int) -> list:
    """Deterministic ground-truth frames for a synthetic video id."""
    return [pixels_for("%s#f%d" % (video_id, i), w, h)
            for i in range(n_frames)]


def encode_video(frames: list, fmt: str) -> bytes:
    """Encode frames into the MJPEG-shaped deterministic container.

    Every frame is an independently decodable :func:`encode_image`
    payload behind a length index — the defining MJPEG property — so a
    sampler can seek to frame k without decoding the k-1 before it.
    """
    if not frames:
        raise ValueError("cannot encode an empty video")
    h, w, _ = frames[0].shape
    parts = [MAGIC_VIDEO, fmt[:1].encode(),
             w.to_bytes(4, "big"), h.to_bytes(4, "big"),
             len(frames).to_bytes(4, "big")]
    for frame in frames:
        blob = encode_image(frame, fmt)
        parts.append(len(blob).to_bytes(4, "big"))
        parts.append(blob)
    return b"".join(parts)


def video_meta(data: bytes) -> tuple:
    """Container bytes → (w, h, n_frames, fmt) without decoding frames."""
    if not data.startswith(MAGIC_VIDEO):
        raise NotImplementedError(
            "unknown video container; real decode needs ffmpeg/pyav which "
            "is not available in this environment")
    fmt = "jpeg" if data[4:5] == b"j" else "png"
    w = int.from_bytes(data[5:9], "big")
    h = int.from_bytes(data[9:13], "big")
    n = int.from_bytes(data[13:17], "big")
    return w, h, n, fmt


def iter_video_frames(data: bytes, indices) -> list:
    """Seek out the frames at ``indices``; returns (index, image_bytes).

    Only the length index is scanned; non-sampled frames are never
    decompressed (the point of frame-level sampling at pipeline scale).
    """
    w, h, n, fmt = video_meta(data)
    wanted = {i for i in indices if 0 <= i < n}
    out = []
    pos = 17
    for i in range(n):
        size = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        if i in wanted:
            out.append((i, data[pos:pos + size]))
        pos += size
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10((255.0 ** 2) / mse)


def average_hash(pixels: np.ndarray) -> int:
    """64-bit average perceptual hash over an 8×8 luma downsample."""
    luma = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    if h < 1 or w < 1:
        return 0  # degenerate decode: deterministic, never NaN bits
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            # clamp like _area_downsample: images under 8px repeat
            # linspace boundaries and an empty slice means NaN → a
            # constant hash that pairs ALL small images as dups
            cells[i, j] = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                               xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    # interpret as signed int64 for BIGINT columns
    return value - (1 << 64) if value >= (1 << 63) else value


# --------------------------------------------------------------- EXIF

_TIFF_II = b"II*\x00"
_TAG_MAKE, _TAG_ORIENT, _TAG_DATETIME = 271, 274, 306


def _ascii_entry(tag: int, data_b: bytes, off: int) -> tuple:
    """One ASCII IFD entry: TIFF 6.0 §2 requires values of ≤4 bytes
    INLINE in the value field (padded), longer ones via offset.
    Returns (entry_bytes, tail_bytes, next_off)."""
    import struct

    if len(data_b) <= 4:
        return (struct.pack("<HHI", tag, 2, len(data_b))
                + data_b.ljust(4, b"\x00"), b"", off)
    return (struct.pack("<HHII", tag, 2, len(data_b), off),
            data_b, off + len(data_b))


def exif_bytes(orientation: int, datetime: str, make: str) -> bytes:
    """Build a REAL little-endian TIFF/EXIF IFD0 blob (ISO 12234-2 /
    TIFF 6.0 layout): header, 3-entry IFD (Make ASCII, Orientation
    SHORT in-place, DateTime ASCII), zero next-IFD pointer, then any
    out-of-line ASCII data (values of ≤4 bytes are inlined per spec —
    what exif_meta's reader and the scrubber's canonical
    re-serialization both assume).  Unlike the pixel codec there is
    nothing stubbed here — this is the actual on-disk byte layout
    camera JPEGs embed, parseable by any EXIF reader.
    """
    import struct

    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"
    # header(8) + count(2) + 3*12 + next(4) = 50; data follows
    off = 50
    make_e, make_tail, off = _ascii_entry(_TAG_MAKE, make_b, off)
    dt_e, dt_tail, off = _ascii_entry(_TAG_DATETIME, dt_b, off)
    ifd = struct.pack("<H", 3)
    ifd += make_e
    ifd += struct.pack("<HHII", _TAG_ORIENT, 3, 1, orientation & 0xFFFF)
    ifd += dt_e
    ifd += struct.pack("<I", 0)
    return _TIFF_II + struct.pack("<I", 8) + ifd + make_tail + dt_tail


def exif_meta(data: bytes) -> tuple:
    """Parse ``(orientation, datetime, make, valid)`` from a
    little-endian TIFF/EXIF blob — walks IFD0, resolves out-of-line
    ASCII values, tolerates unknown tags, returns ``(None, None,
    None, False)`` on any malformed structure instead of raising
    (a crawl sees arbitrary junk in image payloads).
    """
    import struct

    try:
        if not data or len(data) < 14 or data[:4] != _TIFF_II:
            return (None, None, None, False)
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (count,) = struct.unpack_from("<H", data, ifd_off)
        orient = dt = make = None
        for i in range(count):
            base = ifd_off + 2 + 12 * i
            tag, typ, n, val = struct.unpack_from("<HHII", data, base)
            if tag == _TAG_ORIENT and typ == 3:
                orient = val & 0xFFFF
            elif typ == 2 and tag in (_TAG_MAKE, _TAG_DATETIME):
                raw = (data[base + 8:base + 12] if n <= 4
                       else data[val:val + n])
                if len(raw) < n:
                    return (None, None, None, False)
                text = raw[:n].split(b"\x00")[0].decode(
                    "ascii", "replace")
                if tag == _TAG_MAKE:
                    make = text
                else:
                    dt = text
        return (orient, dt, make, True)
    except (struct.error, IndexError):
        return (None, None, None, False)


# GPS IFD pointer (EXIF 2.3 §4.6.6) and the four GPS sub-IFD tags the
# scrubber/parsers care about
_TAG_GPS_IFD = 34853
# sub-IFD pointer tags whose pointed-to trees the generic scrubber
# does not relocate (they contain their own internal offsets): the
# Exif IFD and the Interoperability IFD.  Copying the pointer entry
# verbatim while the layout shifts would leave a dangling offset —
# corrupt output masquerading as valid — so the scrubber drops them
# along with GPS (privacy-conservative: only entries it can relocate
# correctly survive).
_SUBIFD_POINTER_TAGS = frozenset({_TAG_GPS_IFD, 34665, 40965})
_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 1, 2, 3, 4
# TIFF 6.0 §2: bytes per element for each field type
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1,
                   8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _gps_rationals(abs_e6: int) -> bytes:
    """Micro-degrees → the 3-RATIONAL (deg, min, sec) EXIF encoding,
    EXACT: degrees/1, 0/1 minutes, and the sub-degree remainder as
    ``(rem*3600)/10^6`` seconds, so parse-back recovers the integer
    micro-degree value with no float anywhere."""
    import struct

    return struct.pack("<6I", abs_e6 // 10**6, 1, 0, 1,
                       (abs_e6 % 10**6) * 3600, 10**6)


def exif_bytes_gps(orientation: int, datetime: str, make: str,
                   lat_e6: int, lon_e6: int) -> bytes:
    """:func:`exif_bytes` plus a real GPS sub-IFD: IFD0 gains the
    GPSInfo LONG pointer (tag 34853), which addresses a 4-entry GPS
    IFD (LatitudeRef/Latitude/LongitudeRef/Longitude, EXIF 2.3 §4.6.6)
    with out-of-line RATIONAL triplets.  Coordinates are signed
    micro-degrees; the byte layout is the one camera firmware writes.
    """
    import struct

    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"
    # header(8) + count(2) + 4*12 + next(4) = 62; then any out-of-line
    # make/datetime, the 54-byte GPS IFD, and its two 24-byte rational
    # triplets (≤4-byte ASCII inlines per spec, as in exif_bytes)
    off = 62
    make_e, make_tail, off = _ascii_entry(_TAG_MAKE, make_b, off)
    dt_e, dt_tail, off = _ascii_entry(_TAG_DATETIME, dt_b, off)
    gps_off = off
    lat_off = gps_off + 54
    lon_off = lat_off + 24
    ifd = struct.pack("<H", 4)
    ifd += make_e
    ifd += struct.pack("<HHII", _TAG_ORIENT, 3, 1,
                       orientation & 0xFFFF)
    ifd += dt_e
    ifd += struct.pack("<HHII", _TAG_GPS_IFD, 4, 1, gps_off)
    ifd += struct.pack("<I", 0)
    lat_ref = b"N\x00\x00\x00" if lat_e6 >= 0 else b"S\x00\x00\x00"
    lon_ref = b"E\x00\x00\x00" if lon_e6 >= 0 else b"W\x00\x00\x00"
    gps = struct.pack("<H", 4)
    gps += struct.pack("<HHI", _GPS_LAT_REF, 2, 2) + lat_ref
    gps += struct.pack("<HHII", _GPS_LAT, 5, 3, lat_off)
    gps += struct.pack("<HHI", _GPS_LON_REF, 2, 2) + lon_ref
    gps += struct.pack("<HHII", _GPS_LON, 5, 3, lon_off)
    gps += struct.pack("<I", 0)
    return (_TIFF_II + struct.pack("<I", 8) + ifd + make_tail
            + dt_tail + gps + _gps_rationals(abs(lat_e6))
            + _gps_rationals(abs(lon_e6)))


def _rational3_e6(data: bytes, off: int) -> int:
    """(deg, min, sec) RATIONAL triplet at ``off`` → micro-degrees,
    integer arithmetic (exact for the encoding above; floors on
    arbitrary camera rationals)."""
    import struct

    dn, dd, mn, md, sn, sd = struct.unpack_from("<6I", data, off)
    if not (dd and md and sd):
        raise ValueError("zero denominator")
    return ((dn * 10**6) // dd + (mn * 10**6) // (md * 60)
            + (sn * 10**6) // (sd * 3600))


def exif_gps(data: bytes) -> tuple:
    """Parse ``(lat_e6, lon_e6, has_gps, valid)`` from a little-endian
    TIFF/EXIF blob: follow IFD0's GPSInfo pointer, read the ref/value
    tag pairs, return signed micro-degrees.  Malformed structure →
    ``(None, None, False, False)``; a valid blob without GPS →
    ``(None, None, False, True)``.
    """
    import struct

    try:
        if not data or len(data) < 14 or data[:4] != _TIFF_II:
            return (None, None, False, False)
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (count,) = struct.unpack_from("<H", data, ifd_off)
        gps_off = None
        for i in range(count):
            base = ifd_off + 2 + 12 * i
            tag, typ, n, val = struct.unpack_from("<HHII", data, base)
            if tag == _TAG_GPS_IFD and typ == 4:
                gps_off = val
        if gps_off is None:
            return (None, None, False, True)
        (gcount,) = struct.unpack_from("<H", data, gps_off)
        lat = lon = None
        lat_sign = lon_sign = 1
        for i in range(gcount):
            base = gps_off + 2 + 12 * i
            tag, typ, n, val = struct.unpack_from("<HHII", data, base)
            if typ == 2 and tag in (_GPS_LAT_REF, _GPS_LON_REF):
                ref = data[base + 8:base + 9]
                if tag == _GPS_LAT_REF:
                    lat_sign = -1 if ref == b"S" else 1
                else:
                    lon_sign = -1 if ref == b"W" else 1
            elif typ == 5 and n == 3 and tag in (_GPS_LAT, _GPS_LON):
                e6 = _rational3_e6(data, val)
                if tag == _GPS_LAT:
                    lat = e6
                else:
                    lon = e6
        if lat is None or lon is None:
            return (None, None, False, True)
        return (lat_sign * lat, lon_sign * lon, True, True)
    except (struct.error, IndexError, ValueError):
        return (None, None, False, False)


def exif_gps_scrub(data: bytes) -> bytes | None:
    """Rewrite a TIFF/EXIF blob WITHOUT its GPS sub-IFD (tag 34853).

    Generic IFD0 re-serialization: every surviving entry keeps its
    order, inline values are copied verbatim, out-of-line payloads are
    re-packed immediately after the IFD with recomputed offsets — so a
    blob of relocatable entries round-trips byte-identically through
    the scrubber (tested), and GPS loses the pointer AND the orphaned
    sub-IFD bytes (no data remnant an attacker could carve).  The
    other sub-IFD pointer tags (:data:`_SUBIFD_POINTER_TAGS` — Exif
    IFD, Interop IFD) are dropped too: their trees carry internal
    offsets this generic walk does not relocate, and a verbatim
    pointer over a shifted layout would be corrupt output flagged
    valid — dropping is the privacy-conservative total behavior.
    Returns ``None`` for malformed blobs — the caller decides whether
    to drop or quarantine; silently passing junk through a PII scrub
    would be the one unacceptable behavior.
    """
    import struct

    try:
        if not data or len(data) < 14 or data[:4] != _TIFF_II:
            return None
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (count,) = struct.unpack_from("<H", data, ifd_off)
        entries = []
        for i in range(count):
            base = ifd_off + 2 + 12 * i
            tag, typ, n, _ = struct.unpack_from("<HHII", data, base)
            size = _TIFF_TYPE_SIZE.get(typ)
            if size is None:
                return None
            raw4 = data[base + 8:base + 12]
            if len(raw4) < 4:
                return None
            if size * n <= 4:
                entries.append((tag, typ, n, raw4, None))
            else:
                (off,) = struct.unpack_from("<I", raw4)
                payload = data[off:off + size * n]
                if len(payload) < size * n:
                    return None
                entries.append((tag, typ, n, None, payload))
        entries = [e for e in entries
                   if e[0] not in _SUBIFD_POINTER_TAGS]
        head_len = 8 + 2 + 12 * len(entries) + 4
        out_ifd = struct.pack("<H", len(entries))
        tail = b""
        for tag, typ, n, raw4, payload in entries:
            if payload is None:
                out_ifd += struct.pack("<HHI", tag, typ, n) + raw4
            else:
                out_ifd += struct.pack("<HHII", tag, typ, n,
                                       head_len + len(tail))
                tail += payload
        out_ifd += struct.pack("<I", 0)
        return _TIFF_II + struct.pack("<I", 8) + out_ifd + tail
    except (struct.error, IndexError):
        return None


def jpeg_sof(data: bytes) -> tuple:
    """Parse ``(w, h, progressive, n_components, valid)`` from a JPEG
    payload by walking its segment stream (ISO/IEC 10918-1 §B).

    Dimensions in JPEG live behind a VARIABLE-offset marker walk — each
    segment is ``FF marker len16`` with the frame header (SOF0 baseline
    / SOF1 extended / SOF2 progressive / SOF3 lossless) somewhere after
    APPn/COM/DQT/DHT segments of arbitrary length.  The walk handles
    fill bytes (repeated FF before a marker), standalone markers
    (TEM, RSTn — no length field), and bails ``(None, None, None,
    None, False)`` on truncation, junk, EOI/SOS before any SOF, or a
    segment length that overruns the payload — a crawl sees all of
    those; none may become an executor exception.
    """
    inv = (None, None, None, None, False)
    if not data:  # NULL/empty blob: flagged, never an executor raise
        return inv
    try:
        n = len(data)
        if n < 4 or data[0] != 0xFF or data[1] != 0xD8:
            return inv
        i = 2
        while i + 1 < n:
            if data[i] != 0xFF:
                return inv
            j = i
            while j < n and data[j] == 0xFF:      # fill bytes
                j += 1
            if j >= n:
                return inv
            m = data[j]
            i = j + 1
            if m == 0x01 or 0xD0 <= m <= 0xD7:    # TEM / RSTn
                continue
            if m in (0xD9, 0xDA):                 # EOI / SOS, no SOF
                return inv
            if i + 2 > n:
                return inv
            seglen = (data[i] << 8) | data[i + 1]
            if seglen < 2 or i + seglen > n:
                return inv
            if m in (0xC0, 0xC1, 0xC2, 0xC3):     # SOF0..SOF3
                if seglen < 8:
                    return inv
                h = (data[i + 3] << 8) | data[i + 4]
                w = (data[i + 5] << 8) | data[i + 6]
                ncomp = data[i + 7]
                return (w, h, m == 0xC2, ncomp, True)
            i += seglen
        return inv
    except IndexError:
        return inv


# --------------------------------------------------------------- WebP

def webp_bytes(w: int, h: int, kind: str = "vp8",
               alpha: bool = False) -> bytes:
    """Build a REAL WebP container header (RFC 9649 framing): RIFF
    header + one of the three bitstream chunks — ``vp8`` (lossy: frame
    tag, 9D 01 2A start code, 14-bit dimensions), ``vp8l`` (lossless:
    2F signature, width-1/height-1 packed into a 28-bit little-endian
    field with the alpha bit), ``vp8x`` (extended: flags byte +
    24-bit canvas-minus-one dimensions).  Chunk payloads are padded to
    even length per RIFF.  Enough of the format for any header parser
    to read dimensions; pixel data is out of scope by design.
    """
    import struct

    if kind == "vp8":
        payload = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                   + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF))
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    elif kind == "vp8l":
        v = ((w - 1) & 0x3FFF) | (((h - 1) & 0x3FFF) << 14) \
            | ((1 if alpha else 0) << 28)
        payload = b"\x2f" + struct.pack("<I", v)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunk += b"\x00"
    elif kind == "vp8x":
        payload = (bytes([0x10 if alpha else 0]) + b"\x00\x00\x00"
                   + struct.pack("<I", w - 1)[:3]
                   + struct.pack("<I", h - 1)[:3])
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    else:
        raise ValueError("kind must be vp8|vp8l|vp8x")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_features(data: bytes) -> tuple:
    """Parse ``(w, h, kind, alpha, valid)`` from a WebP payload by
    walking the RIFF framing to the first bitstream chunk.

    Dimensions live in three different encodings depending on the
    chunk — 14-bit little-endian u16s after the VP8 start code,
    a packed 28-bit field after the VP8L signature byte, or 24-bit
    canvas fields in VP8X — so like JPEG this is a real walk, not
    fixed-offset substring arithmetic.  Truncation, bad magics, a
    wrong start code/signature, a nonzero VP8L version or a chunk
    size overrunning the payload all return ``(None, None, None,
    None, False)``; a crawl sees every one of those.
    """
    import struct

    inv = (None, None, None, None, False)
    try:
        if (not data or len(data) < 20 or data[:4] != b"RIFF"
                or data[8:12] != b"WEBP"):
            return inv
        (riff_size,) = struct.unpack_from("<I", data, 4)
        if riff_size + 8 > len(data) or riff_size < 12:
            return inv
        fourcc = data[12:16]
        (csize,) = struct.unpack_from("<I", data, 16)
        body = data[20:20 + csize]
        if len(body) < csize:
            return inv
        if fourcc == b"VP8 ":
            if csize < 10 or body[3:6] != b"\x9d\x01\x2a":
                return inv
            wr, hr = struct.unpack_from("<HH", body, 6)
            return (wr & 0x3FFF, hr & 0x3FFF, "vp8", False, True)
        if fourcc == b"VP8L":
            if csize < 5 or body[0] != 0x2F:
                return inv
            (v,) = struct.unpack_from("<I", body, 1)
            if v >> 29:
                return inv
            return ((v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1,
                    "vp8l", bool((v >> 28) & 1), True)
        if fourcc == b"VP8X":
            if csize < 10:
                return inv
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return (w, h, "vp8x", bool(body[0] & 0x10), True)
        return inv
    except (struct.error, IndexError):
        return inv


# ---------------------------------------------------------------- GIF

def gif_bytes(w: int, h: int, n_frames: int = 1,
              loop_count: int | None = None) -> bytes:
    """Build a REAL GIF89a block stream: header + logical screen
    descriptor, an optional NETSCAPE2.0 looping application extension,
    ``n_frames`` image descriptors each carrying a (structurally
    complete, minimal) LZW data section, and the 0x3B trailer.  Enough
    of the format for any block walker to count frames; pixel payloads
    are not meant to decode to anything in particular.
    """
    import struct

    out = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
    if loop_count is not None:
        out += (b"\x21\xff\x0bNETSCAPE2.0"
                + b"\x03\x01" + struct.pack("<H", loop_count)
                + b"\x00")
    frame = (b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
             + b"\x02" + b"\x02\x4c\x01" + b"\x00")
    out += frame * n_frames
    return out + b"\x3b"


def gif_frames(data: bytes) -> tuple:
    """Parse ``(w, h, n_frames, loop_count, valid)`` from a GIF
    payload by walking its block stream (GIF89a spec §§18-26).

    Frame count lives NOWHERE in the header — it is the number of
    image descriptors (0x2C) found by walking extensions (0x21 +
    label + length-prefixed sub-blocks), color tables (size encoded
    in packed bits) and image data sections to the 0x3B trailer.
    The NETSCAPE2.0 application extension carries the loop count
    (0 = forever); absent means play once (``loop_count`` NULL).
    Junk, truncation mid-sub-block, or a missing trailer return
    ``(None, None, None, None, False)``.
    """
    import struct

    inv = (None, None, None, None, False)
    try:
        if not data or len(data) < 14 \
                or data[:6] not in (b"GIF89a", b"GIF87a"):
            return inv
        w, h = struct.unpack_from("<HH", data, 6)
        packed = data[10]
        pos = 13
        if packed & 0x80:                      # global color table
            pos += 3 * (2 << (packed & 0x07))
        n_frames = 0
        loop_count = None

        def sub_blocks(p):
            while True:
                if p >= len(data):
                    raise IndexError
                ln = data[p]
                p += 1
                if ln == 0:
                    return p
                if p + ln > len(data):
                    raise IndexError
                p += ln

        while True:
            if pos >= len(data):
                return inv                     # ran out before trailer
            block = data[pos]
            pos += 1
            if block == 0x3B:                  # trailer
                return (w, h, n_frames, loop_count, True)
            if block == 0x21:                  # extension
                if pos >= len(data):
                    return inv
                label = data[pos]
                pos += 1
                if (label == 0xFF and pos < len(data)
                        and data[pos] == 11
                        and data[pos + 1:pos + 12] == b"NETSCAPE2.0"):
                    sub = data[pos + 12]
                    if sub >= 3 and pos + 13 + 3 <= len(data) \
                            and data[pos + 13] == 0x01:
                        (loop_count,) = struct.unpack_from(
                            "<H", data, pos + 14)
                pos = sub_blocks(pos)
            elif block == 0x2C:                # image descriptor
                if pos + 9 > len(data):
                    return inv
                ipacked = data[pos + 8]
                pos += 9
                if ipacked & 0x80:             # local color table
                    pos += 3 * (2 << (ipacked & 0x07))
                if pos >= len(data):
                    return inv
                pos += 1                       # LZW min code size
                pos = sub_blocks(pos)
                n_frames += 1
            else:
                return inv                     # unknown block type
    except (struct.error, IndexError):
        return inv


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(w: int, h: int, bit_depth: int = 8, color_type: int = 6,
              interlaced: bool = False,
              n_frames: int | None = None) -> bytes:
    """Build a REAL PNG chunk stream (RFC 2083 framing): signature,
    IHDR, an optional APNG ``acTL`` animation-control chunk, one
    minimal IDAT, IEND — each chunk CRC-32'd over type+data as the
    spec requires, so any conforming chunk walker accepts it.
    """
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)
                              & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type,
                       0, 0, 1 if interlaced else 0)
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if n_frames is not None:
        out += chunk(b"acTL", struct.pack(">II", n_frames, 0))
    out += chunk(b"IDAT", b"\x00")
    return out + chunk(b"IEND", b"")


def png_meta(data: bytes) -> tuple:
    """Parse ``(w, h, bit_depth, color_type, interlaced, n_frames,
    valid)`` from a PNG payload by walking its chunk stream.

    Goes beyond the fixed-offset IHDR read (multimodal.header_dims):
    the walk validates per-chunk CRC-32 and finds the APNG ``acTL``
    chunk, whose frame count is what routes animated PNGs to the
    frame-sampling path exactly like multi-frame GIFs.  ``n_frames``
    is 1 for still PNGs.  Junk, truncation, a bad signature, a bad
    CRC or a stream that ends without IEND return all-NULL invalid.
    """
    import struct
    import zlib

    inv = (None, None, None, None, None, None, False)
    try:
        if not data or len(data) < 8 + 25 or data[:8] != _PNG_SIG:
            return inv
        pos = 8
        w = h = depth = ctype_v = None
        interlaced = None
        n_frames = 1
        first = True
        while pos + 8 <= len(data):
            (clen,) = struct.unpack_from(">I", data, pos)
            ctype = data[pos + 4:pos + 8]
            body = data[pos + 8:pos + 8 + clen]
            if len(body) < clen or pos + 12 + clen > len(data):
                return inv
            (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
            if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
                return inv
            if first:
                if ctype != b"IHDR" or clen != 13:
                    return inv                 # IHDR must be first
                w, h, depth, ctype_v, _, _, il = struct.unpack(
                    ">IIBBBBB", body)
                interlaced = bool(il)
                first = False
            elif ctype == b"acTL" and clen >= 8:
                (n_frames,) = struct.unpack_from(">I", body)
            elif ctype == b"IEND":
                return (w, h, depth, ctype_v, interlaced,
                        n_frames, True)
            pos += 12 + clen
        return inv                             # ran out without IEND
    except (struct.error, IndexError):
        return inv


# --------------------------------------------------------- AVIF/HEIC

def avif_bytes(w: int, h: int, brand: str = "avif") -> bytes:
    """Build a REAL ISOBMFF header for an AVIF/HEIC image: ``ftyp``
    (major brand + compatible brands), then a ``meta`` fullbox
    containing the property container chain ``iprp`` → ``ipco`` →
    ``ispe`` (image spatial extents fullbox with u32be
    width/height) — the exact nesting libavif writes and any ISOBMFF
    dimension reader walks.  Codestream boxes are out of scope.
    """
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ispe = box(b"ispe", b"\x00\x00\x00\x00"
               + struct.pack(">II", w, h))
    ipco = box(b"ipco", ispe)
    iprp = box(b"iprp", ipco)
    meta = box(b"meta", b"\x00\x00\x00\x00" + iprp)
    ftyp = box(b"ftyp", brand.encode("ascii").ljust(4)[:4]
               + b"\x00\x00\x00\x00" + b"mif1")
    return ftyp + meta


def avif_dims(data: bytes) -> tuple:
    """Parse ``(w, h, brand, valid)`` from an AVIF/HEIC payload by
    walking ISOBMFF boxes to the first ``ispe`` property.

    Dimensions live four boxes deep (``meta``/``iprp``/``ipco``/
    ``ispe``), each a length-prefixed container and two of them
    fullboxes with a version/flags word — a real recursive walk, with
    box sizes validated against the enclosing extent so a hostile
    length can neither overrun the payload nor loop forever.  Junk,
    truncation, a missing ftyp or a stream without ``ispe`` return
    ``(None, None, None, False)``.
    """
    import struct

    inv = (None, None, None, False)

    def find_ispe(buf: bytes, depth: int = 0):
        pos = 0
        while pos + 8 <= len(buf) and depth < 8:
            (size,) = struct.unpack_from(">I", buf, pos)
            btype = buf[pos + 4:pos + 8]
            if size < 8 or pos + size > len(buf):
                raise IndexError
            body = buf[pos + 8:pos + size]
            if btype == b"ispe":
                if len(body) < 12:
                    raise IndexError
                return struct.unpack_from(">II", body, 4)
            if btype in (b"meta",):            # fullbox container
                got = find_ispe(body[4:], depth + 1)
                if got:
                    return got
            elif btype in (b"iprp", b"ipco"):  # plain containers
                got = find_ispe(body, depth + 1)
                if got:
                    return got
            pos += size
        return None

    try:
        if not data or len(data) < 16:
            return inv
        (fsize,) = struct.unpack_from(">I", data, 0)
        if data[4:8] != b"ftyp" or fsize < 16 or fsize > len(data):
            return inv
        brand = data[8:12].decode("ascii", "replace").strip()
        got = find_ispe(data[fsize:])
        if not got:
            return inv
        return (got[0], got[1], brand, True)
    except (struct.error, IndexError):
        return inv
