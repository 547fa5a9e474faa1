"""Pure-stdlib image/audio codecs — REAL decode without optional deps.

The container ships neither PIL nor soundfile, but the formats the
multimodal fixtures use need nothing beyond the standard library:

* PNG — zlib + struct. Encoder writes 8-bit gray/RGB, filter type 0.
  Decoder handles non-interlaced 8-bit gray / gray+alpha / RGB / RGBA with
  all five scanline filters (spec §9): None/Up are fully vectorized, Sub is
  a per-channel-stride cumulative sum, Average/Paeth fall back to a
  per-scanline loop (PNG's spec makes those inherently sequential; synthetic
  fixtures emit filter 0, so the hot path never loops).
* WAV — the stdlib ``wave`` module, 8/16-bit PCM.

These are honest decoders, not stubs: bytes in, pixel/sample arrays out.
PIL/soundfile remain the preferred path for other formats when installed
(stages.multimodal falls back to them by magic-number dispatch).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> PNG bytes (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, ct, ch = arr.shape[0], arr.shape[1], 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, ct, ch = arr.shape[0], arr.shape[1], 2, 3
    else:
        raise ValueError("encode_png takes (h,w) gray or (h,w,3) RGB uint8")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y, 1:].astype(np.int64)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 1:  # Sub: per-stride-channel cumulative sum mod 256
            rec = cur.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(cur[c::bpp]) % 256
        else:  # Average (3) / Paeth (4): inherently sequential per byte
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                if f == 3:
                    rec[i] = (cur[i] + (a + b) // 2) % 256
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                    rec[i] = (cur[i] + pred) % 256
        out[y] = (rec % 256).astype(np.uint8)
        prev = out[y]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) or (h, w, channels) uint8 array.

    Non-interlaced, 8-bit depth, color types 0/2/4/6."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ct = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            if ct not in _CHANNELS:
                raise ValueError(f"unsupported color type {ct}")
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    ch = _CHANNELS[ct]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG data length mismatch")
    out = _unfilter(raw, h, stride, ch)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM mono WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes):
    """WAV bytes -> (float32 samples in [-1, 1] mono-mixed, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, width, rate, nframes = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        raw = f.readframes(nframes)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate
