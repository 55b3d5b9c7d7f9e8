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
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    # interpret as signed int64 for BIGINT columns
    return value - (1 << 64) if value >= (1 << 63) else value


# --------------------------------------------------------------- EXIF

_TIFF_II = b"II*\x00"
_TAG_MAKE, _TAG_ORIENT, _TAG_DATETIME = 271, 274, 306


def exif_bytes(orientation: int, datetime: str, make: str) -> bytes:
    """Build a REAL little-endian TIFF/EXIF IFD0 blob (ISO 12234-2 /
    TIFF 6.0 layout): header, 3-entry IFD (Make ASCII via offset,
    Orientation SHORT in-place, DateTime ASCII via offset), zero next-
    IFD pointer, then the out-of-line ASCII data.  Unlike the pixel
    codec there is nothing stubbed here — this is the actual on-disk
    byte layout camera JPEGs embed, parseable by any EXIF reader.
    """
    import struct

    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"
    # header(8) + count(2) + 3*12 + next(4) = 50; data follows
    make_off = 50
    dt_off = make_off + len(make_b)
    ifd = struct.pack("<H", 3)
    ifd += struct.pack("<HHII", _TAG_MAKE, 2, len(make_b), make_off)
    ifd += struct.pack("<HHII", _TAG_ORIENT, 3, 1, orientation & 0xFFFF)
    ifd += struct.pack("<HHII", _TAG_DATETIME, 2, len(dt_b), dt_off)
    ifd += struct.pack("<I", 0)
    return _TIFF_II + struct.pack("<I", 8) + ifd + make_b + dt_b


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
