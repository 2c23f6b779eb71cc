"""Deterministic audio/video codec stand-ins (same role as codec.py for
images: real decoders aren't in this container, so opaque ``binary``
payloads get a clearly-marked deterministic container format whose
Ray-side plumbing — schemas, actor signatures, batch sizes, violation
shapes — is identical to what libsndfile/ffmpeg-backed stages would
need; swap the encode/decode pair and nothing else changes).

Audio: ``FAUD`` + sample_rate u32 + n_samples u32 + channels u8 +
zlib(int16 PCM, channel-interleaved).

Video: ``FVID`` + fps u16 + n_frames u16, then per frame a u32 length
prefix + an image-codec payload (sources/codec.py) — i.e. an MJPEG-like
container over the existing image stand-in.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import codec

AUDIO_MAGIC = b"FAUD"
VIDEO_MAGIC = b"FVID"
_AHEADER = struct.Struct("<4sIIB")
_VHEADER = struct.Struct("<4sHH")


class AVCodecError(ValueError):
    """Undecodable / truncated / unknown audio-video payloads."""


# ------------------------------------------------------------------ audio
def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: (n,) or (n, channels) int16."""
    if samples.dtype != np.int16:
        raise AVCodecError("samples must be int16")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    head = _AHEADER.pack(AUDIO_MAGIC, sample_rate, n, ch)
    return head + zlib.compress(samples.tobytes(), level=1)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) int16, sample_rate). Raises AVCodecError."""
    if data is None or len(data) < _AHEADER.size:
        raise AVCodecError("truncated header")
    magic, sr, n, ch = _AHEADER.unpack_from(bytes(data))
    if magic != AUDIO_MAGIC:
        raise AVCodecError(f"bad magic {magic!r}")
    try:
        raw = zlib.decompress(bytes(data)[_AHEADER.size:])
    except zlib.error as e:
        raise AVCodecError(f"corrupt payload: {e}") from None
    if len(raw) != n * ch * 2:
        raise AVCodecError("payload size mismatch")
    return np.frombuffer(raw, dtype=np.int16).reshape(n, ch), sr


def synth_audio(seed: int, *, sample_rate: int = 8000,
                duration_s: float = 0.5, channels: int = 1) -> np.ndarray:
    """Deterministic test tone mix (a few sinusoids + noise), int16."""
    rng = np.random.default_rng([seed, sample_rate])
    n = int(sample_rate * duration_s)
    t = np.arange(n) / sample_rate
    sig = np.zeros(n)
    for _ in range(3):
        f = rng.uniform(100, sample_rate / 2 * 0.8)
        sig += rng.uniform(0.1, 0.5) * np.sin(2 * np.pi * f * t)
    sig += rng.normal(0, 0.02, n)
    sig = (sig / max(1e-9, np.abs(sig).max()) * 20000).astype(np.int16)
    return np.repeat(sig[:, None], channels, axis=1)


# ------------------------------------------------------------------ video
def encode_video(frames: list[np.ndarray], fps: int = 10,
                 fmt: str = "jpeg") -> bytes:
    if len(frames) > 0xFFFF:
        raise AVCodecError("too many frames")
    out = [_VHEADER.pack(VIDEO_MAGIC, fps, len(frames))]
    for px in frames:
        payload = codec.encode(px, fmt)
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    return b"".join(out)


def decode_video_header(data: bytes) -> tuple[int, int]:
    """-> (fps, n_frames) without decoding any frame."""
    if data is None or len(data) < _VHEADER.size:
        raise AVCodecError("truncated header")
    magic, fps, n_frames = _VHEADER.unpack_from(bytes(data))
    if magic != VIDEO_MAGIC:
        raise AVCodecError(f"bad magic {magic!r}")
    return fps, n_frames


def iter_video_frames(data: bytes, *, every_k: int = 1):
    """Yield (frame_idx, pixels, fmt) for every k-th frame; frames are
    length-prefixed so skipped frames cost a seek, not a decode."""
    fps, n_frames = decode_video_header(data)
    buf = bytes(data)
    off = _VHEADER.size
    for i in range(n_frames):
        if off + 4 > len(buf):
            raise AVCodecError("truncated frame table")
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        if off + ln > len(buf):
            raise AVCodecError("truncated frame payload")
        if i % every_k == 0:
            yield i, *codec.decode(buf[off:off + ln])
        off += ln
