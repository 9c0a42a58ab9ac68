"""Pure-stdlib PNG codec (zlib + struct): the executable slice of the
multimodal decode path.

Scope: non-interlaced, 8-bit-per-sample PNG, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA) — the dominant shapes in a scraped
image corpus. Everything runs on the Python worker inside Arrow-batched
``mapInPandas`` (see functions/multimodal.py); no image library needed.

Why hand-rolled: this container has no PIL/torchvision, and the point of
the multimodal surface is that the SPARK-side plumbing (binary columns,
typed metadata, batch iteration, partitioning) is real. With this codec
the per-item decode is real too — zlib inflate + per-row unfilter is the
actual PNG algorithm (RFC 2083 §6), not a simulation. Deployment swaps
in libvips/PIL for JPEG/WebP; PNG continues to work as-is.

The encoder exists for fixtures and round-trip tests; it deliberately
CYCLES the five scanline filter types (None/Sub/Up/Average/Paeth) so
every decoder unfilter branch is exercised by every image taller than
four rows.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 => bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Serialize raw interleaved samples to a PNG, cycling filter types
    row-by-row (row r uses filter r % 5) so decoders face all five.

    ``pixels`` is row-major, ``width * height * channels`` bytes."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels
    stride = width * bpp
    if width == 0 or height == 0:
        raise ValueError(f"invalid zero dimension {width}x{height}")
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} pixel bytes, got {len(pixels)}")

    # Encoding filters read ORIGINAL row bytes (not filtered output), so
    # every filter — Paeth included — vectorizes with numpy shifts of the
    # original arrays; the stdlib loop below is the fallback + reference.
    try:
        import numpy as np

        px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
        left = np.zeros_like(px)
        left[:, bpp:] = px[:, :-bpp]
        up = np.zeros_like(px)
        up[1:] = px[:-1]
        upleft = np.zeros_like(px)
        upleft[1:, bpp:] = px[:-1, :-bpp]
        # Paeth predictor, elementwise in int16 (p - a/b/c stays in range)
        a16 = left.astype(np.int16)
        b16 = up.astype(np.int16)
        c16 = upleft.astype(np.int16)
        p = a16 + b16 - c16
        pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filtered = {
            0: px,
            1: px - left,
            2: px - up,
            3: px - ((a16 + b16) // 2).astype(np.uint8),
            4: px - paeth,
        }
        raw = bytearray()
        for r in range(height):
            ftype = r % 5
            raw.append(ftype)
            raw += filtered[ftype][r].tobytes()
    except ImportError:  # pragma: no cover - numpy is baked into this env
        raw = bytearray()
        prev = bytes(stride)
        for r in range(height):
            row = pixels[r * stride : (r + 1) * stride]
            ftype = r % 5
            raw.append(ftype)
            if ftype == 0:  # None
                raw += row
            elif ftype == 1:  # Sub
                raw += bytes(
                    (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                    for i in range(stride)
                )
            elif ftype == 2:  # Up
                raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
            elif ftype == 3:  # Average
                raw += bytes(
                    (row[i] - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2)
                    & 0xFF
                    for i in range(stride)
                )
            else:  # Paeth
                raw += bytes(
                    (
                        row[i]
                        - _paeth(
                            row[i - bpp] if i >= bpp else 0,
                            prev[i],
                            prev[i - bpp] if i >= bpp else 0,
                        )
                    )
                    & 0xFF
                    for i in range(stride)
                )
            prev = row

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse + inflate + unfilter a PNG; returns
    ``(width, height, channels, pixels)`` with pixels row-major
    interleaved 8-bit samples.

    Raises ValueError on a bad signature, CRC mismatch, or an
    unsupported shape (interlaced, bit depth != 8, palette) — corrupt
    media must be LOUD so the pipeline can quarantine it (same contract
    as the JSONL corrupt rail in sinks/corpus_io.py)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")

    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos < len(payload):
        # bounds-check before each unpack: a payload truncated mid
        # chunk-header or mid-CRC must raise ValueError (the documented
        # quarantine contract), not struct.error
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            if len(body) != 13:
                # a CRC-consistent but wrong-length IHDR must be a
                # ValueError (the quarantine contract), not struct.error
                raise ValueError(f"IHDR length {len(body)} != 13")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if width == 0 or height == 0:
                # PNG spec (RFC 2083 §4.1.1): zero width/height is invalid.
                # Rejecting here keeps downstream per-pixel math (e.g.
                # image_stats' sum/n) free of zero-division guards.
                raise ValueError(f"invalid zero dimension {width}x{height}")
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("Adam7 interlacing not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # garbage IDAT whose CRC was computed over the garbage (a buggy
        # encoder) reaches inflate — still a ValueError, never zlib.error
        raise ValueError(f"corrupt deflate stream: {e}") from e
    bpp = channels
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != {(stride + 1) * height} for {width}x{height}x{channels}"
        )

    # numpy fast paths for the filters with vectorizable recurrences
    # (None; Up = elementwise add; Sub = per-lane cumulative sum, exact
    # in uint8 wraparound). Average/Paeth have floor/conditional
    # sequential dependencies and keep the reference loop. All paths
    # produce identical bytes (round-trip + hypothesis tests pin this).
    try:
        import numpy as _np
    except ImportError:  # pragma: no cover - numpy is baked into this env
        _np = None

    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        row_bytes = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        if _np is not None and ftype in (0, 1, 2):
            arr = _np.frombuffer(row_bytes, dtype=_np.uint8).copy()
            if ftype == 1:  # Sub: cumsum per channel lane, mod-256 exact
                lanes = arr.reshape(-1, bpp)
                _np.cumsum(lanes, axis=0, dtype=_np.uint8, out=lanes)
            elif ftype == 2:  # Up
                arr += _np.frombuffer(prev, dtype=_np.uint8)
            line = bytearray(arr.tobytes())
        else:
            line = bytearray(row_bytes)
            if ftype == 0:
                pass
            elif ftype == 1:  # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    c = prev[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ftype} on row {r}")
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
