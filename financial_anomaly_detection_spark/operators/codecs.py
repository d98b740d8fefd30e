"""Pure-stdlib media codecs for the multimodal column path.

The container ships no media libraries (PIL / av / soundfile), but two
formats are fully decodable with the standard library alone, so the
multimodal decode tier can be REAL rather than stubbed:

- **PNG** (RFC 2083 / W3C PNG spec): chunk parsing + zlib inflate +
  per-row unfiltering (all five filter types) in numpy. Supports 8-bit
  greyscale, grey+alpha, RGB and RGBA, non-interlaced — the shapes a
  training-data pipeline generates for itself. The matching encoder
  exists so tests can round-trip arbitrary arrays through real bytes.
- **WAV** (RIFF PCM): stdlib ``wave`` handles the container; samples
  decode to int16 numpy arrays.
- **AVI** (RIFF 'AVI ' form, Microsoft AVI RIFF File Reference —
  public): chunk walker + MainAVIHeader/BITMAPINFOHEADER parsing +
  uncompressed 24-bit DIB frame decode ('00db' chunks, BGR rows
  stored bottom-up, 4-byte row padding). Compressed streams raise
  ValueError so callers fall through to the stub tier — honest about
  what a stdlib-only decoder can do.

These run inside Arrow ``mapInPandas`` batches (operators/multimodal.py).
They are the *fallback* tier: when native codec libs are present they
win (C-speed), but the pipeline no longer degrades to a fake decode
without them. Per-row Python unfiltering is O(bytes) with numpy
vectorization for filters 0/2; acceptable for thumbnail-scale assets,
and the tier tag lets downstream audit which decoder produced a row.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# colour type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a pixel's bytes."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(raw: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a uint8 array.

    Returns shape (H, W) for greyscale, else (H, W, channels).
    Raises ValueError on non-PNG bytes or unsupported variants
    (palette, 16-bit, interlaced) so callers can fall through to the
    next decoder tier.
    """
    if raw[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = colour = interlace = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, colour, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if bit_depth != 8 or colour not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant: depth={bit_depth} colour={colour} "
            f"interlace={interlace}"
        )
    channels = _CHANNELS[colour]
    stride = width * channels
    decomp = zlib.decompress(bytes(idat))
    expected = height * (stride + 1)
    if len(decomp) < expected:
        raise ValueError("truncated IDAT stream")

    rows = np.frombuffer(decomp[:expected], dtype=np.uint8).reshape(
        height, stride + 1
    )
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = cur
        elif ftype == 1:  # Sub — sequential in x, vectorize across bytes of a pixel
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(cur[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up — fully vectorized
            out[y] = cur + prev  # uint8 wraps mod 256, per spec
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                out[y, x] = (
                    int(cur[x])
                    + int(_paeth(np.uint8(a), np.uint8(b), np.uint8(c)))
                ) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def _apply_filter(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Forward filter (encoder side), inverse of the unfilter above."""
    stride = cur.shape[0]
    cur32 = cur.astype(np.int32)
    if ftype == 0:
        return cur.copy()
    if ftype == 2:
        return (cur32 - prev.astype(np.int32)).astype(np.uint8)
    left = np.zeros(stride, dtype=np.int32)
    left[bpp:] = cur32[:stride - bpp]
    if ftype == 1:
        return (cur32 - left).astype(np.uint8)
    prev32 = prev.astype(np.int32)
    if ftype == 3:
        return (cur32 - ((left + prev32) >> 1)).astype(np.uint8)
    if ftype == 4:
        upleft = np.zeros(stride, dtype=np.int32)
        upleft[bpp:] = prev32[:stride - bpp]
        pred = _paeth(
            left.astype(np.uint8), prev.astype(np.uint8), upleft.astype(np.uint8)
        )
        return (cur32 - pred.astype(np.int32)).astype(np.uint8)
    raise ValueError(f"bad filter type {ftype}")


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array as a real PNG.

    (H, W) → greyscale; (H, W, 2|3|4) → grey+alpha / RGB / RGBA.
    ``filter_type`` picks the per-row filter (0-4) so tests can exercise
    every unfilter branch of :func:`decode_png`.
    """
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    colour = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    flat = arr.reshape(height, stride)
    lines = bytearray()
    for y in range(height):
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        lines.append(filter_type)
        lines.extend(_apply_filter(filter_type, flat[y], prev, channels).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colour, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """Decode RIFF/PCM WAV bytes → (sample_rate, int16 array (n, channels))."""
    with wave.open(io.BytesIO(raw), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got {w.getsampwidth()*8}-bit")
        rate = w.getframerate()
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), dtype="<i2")
        return rate, data.reshape(-1, w.getnchannels())


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16 array (n,) or (n, channels) as real WAV bytes."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


# --- AVI (RIFF video container) -------------------------------------------

RIFF_SIGNATURE = b"RIFF"


def _walk_riff(raw: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, data_start, data_len) for each
    chunk in [pos, end); RIFF chunks are word-aligned (odd lengths get
    one pad byte)."""
    while pos + 8 <= end:
        fourcc = raw[pos : pos + 4]
        (length,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        data_start = pos + 8
        if data_start + length > len(raw):
            raise ValueError("truncated RIFF chunk")
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, raw[data_start : data_start + 4], data_start + 4, length - 4
        else:
            yield fourcc, None, data_start, length
        pos = data_start + length + (length & 1)


def decode_avi(raw: bytes) -> tuple[float, np.ndarray]:
    """Decode an uncompressed-DIB AVI to (fps, frames).

    ``frames`` is uint8 of shape (n_frames, H, W, 3) in RGB order.
    Raises ValueError on non-AVI bytes, compressed video streams, or
    bit depths other than 24 — callers fall through to the next
    decoder tier, exactly like :func:`decode_png`.
    """
    if raw[:4] != RIFF_SIGNATURE or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature/form")
    width = height = None
    usec_per_frame = 0
    bit_count = compression = None
    frames_raw: list[bytes] = []

    def _scan(pos: int, end: int) -> None:
        nonlocal width, height, usec_per_frame, bit_count, compression
        for fourcc, ltype, dstart, dlen in _walk_riff(raw, pos, end):
            if fourcc == b"LIST":
                _scan(dstart, dstart + dlen)
            elif fourcc == b"avih" and dlen >= 40:
                vals = struct.unpack("<10I", raw[dstart : dstart + 40])
                usec_per_frame = vals[0]
                width, height = vals[8], vals[9]
            elif fourcc == b"strf" and dlen >= 20:
                # BITMAPINFOHEADER: biSize, biWidth, biHeight, planes/
                # bitcount (u16 x2), biCompression
                _, _bw, _bh, _pl, bc, comp = struct.unpack(
                    "<iiiHHI", raw[dstart : dstart + 20]
                )
                bit_count, compression = bc, comp
            elif len(fourcc) == 4 and fourcc[2:4] in (b"db", b"dc"):
                frames_raw.append(raw[dstart : dstart + dlen])

    _scan(12, len(raw))
    if width is None or not frames_raw:
        raise ValueError("no avih header / no frame chunks")
    if compression not in (0, None):
        raise ValueError(f"compressed AVI stream (biCompression={compression})")
    if bit_count not in (24, None):
        raise ValueError(f"unsupported bit depth {bit_count}")
    stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    frames = np.empty((len(frames_raw), height, width, 3), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        if len(fb) < stride * height:
            raise ValueError("truncated frame chunk")
        rows = np.frombuffer(fb[: stride * height], dtype=np.uint8).reshape(
            height, stride
        )
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        frames[i] = bgr[::-1, :, ::-1]  # bottom-up rows, BGR -> RGB
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return fps, frames


def encode_avi(frames: np.ndarray, fps: float = 8.0) -> bytes:
    """Encode uint8 RGB frames (n, H, W, 3) as a real uncompressed AVI
    ('DIB ' fourcc, 24-bit BI_RGB, bottom-up BGR rows, 4-byte row
    padding) so tests can round-trip arbitrary arrays through real
    container bytes."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    n, height, width, _ = arr.shape
    stride = (width * 3 + 3) & ~3
    usec = int(round(1e6 / fps))

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def list_chunk(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    frame_bytes = []
    for f in arr:
        bgr_bottom_up = f[::-1, :, ::-1]
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, : width * 3] = bgr_bottom_up.reshape(height, width * 3)
        frame_bytes.append(rows.tobytes())
    frame_size = stride * height

    avih = struct.pack(
        "<10I16x",
        usec, frame_size * int(fps), 0, 0x10, n, 0, 1, frame_size, width, height,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, int(fps), 0, n, frame_size, -1, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<iiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
