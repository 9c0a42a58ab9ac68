"""Pure-stdlib WAV (RIFF/PCM) codec: the executable audio slice of the
multimodal path, sibling of png_codec.py.

Scope: canonical RIFF WAVE with 16-bit signed little-endian PCM
(format tag 1), 1..8 channels — the dominant shape of scraped speech
corpora before feature extraction. Parsing is chunk-walking per the
RIFF spec (Microsoft/IBM 1991, public): ``RIFF<size>WAVE`` header, an
``fmt `` chunk describing the stream, a ``data`` chunk of interleaved
frames. Anything else (float PCM, ADPCM, extensible) raises loudly —
corrupt/unsupported media must hit the quarantine rail, never decode to
garbage. Deployment swaps in soundfile/ffmpeg for compressed formats;
PCM WAV keeps working as-is.
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, channels: int, samples: list[int] | bytes) -> bytes:
    """Serialize interleaved 16-bit PCM samples to a RIFF WAVE file.

    ``samples`` is either raw little-endian int16 bytes or a list of
    ints in [-32768, 32767]; its length must be a multiple of
    ``channels`` (whole frames)."""
    if not isinstance(samples, (bytes, bytearray)):
        samples = struct.pack(f"<{len(samples)}h", *samples)
    if len(samples) % (2 * channels):
        raise ValueError("sample byte length is not whole frames")
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + bytes(samples)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a RIFF WAVE payload; returns
    ``(sample_rate, channels, n_frames, pcm_bytes)`` with pcm_bytes the
    interleaved little-endian int16 frames.

    Raises ValueError on a non-RIFF payload, a truncated chunk, or a
    non-PCM-16 stream — same loud-failure contract as png_codec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("RIFF size exceeds payload")

    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")

    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format}, bits={bits}); "
            "16-bit PCM only — swap in soundfile/ffmpeg in deployment"
        )
    if channels < 1 or channels > 8 or block_align != channels * 2:
        raise ValueError(f"bad channel layout (channels={channels})")
    if len(data) % block_align:
        raise ValueError("data chunk is not whole frames")
    return sample_rate, channels, len(data) // block_align, data
