"""Pure-numpy codecs for UNCOMPRESSED media containers (PCM WAV audio,
24-bit BMP images) — real decode without external libraries.

The multimodal stage family treats payloads as opaque binary columns
(reference: ``Frame.value: bytes``, ``api/proto/v1/frame.proto:37``); the
decode kernels for COMPRESSED formats (JPEG/MP4/...) are honestly gated on
codec libs that this environment lacks. Uncompressed containers, however,
are just headers + raw sample/pixel arrays, so their decoders are a few
``np.frombuffer`` calls — these are real, round-trip-tested parsers, which
lets the actor-pool decode/feature/resize stages run END-TO-END on genuine
media bytes (``MediaFeatureExtractor(mode="real")``).

Writers exist to synthesize deterministic fixtures (a data pipeline needs
only decode; encode is test scaffolding).
"""

from __future__ import annotations

import struct

import numpy as np

# --- WAV (RIFF / PCM16) -------------------------------------------------------


def write_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 RIFF/WAVE container around ``samples`` (int16)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def read_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM16 RIFF/WAVE buffer.

    Walks the chunk list (not fixed offsets): real-world WAVs interleave
    LIST/fact chunks before ``data``."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, sr, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return sr, samples


def wav_features(buf: bytes) -> dict:
    """Classic audio descriptors from a decoded WAV: duration, RMS, peak,
    zero-crossing rate, FFT spectral centroid — all numpy on the sample
    array."""
    sr, s = read_wav(buf)
    x = s.astype(np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return dict(sample_rate=sr, n_samples=0, duration_ms=0.0, rms=0.0,
                    peak=0.0, zcr=0.0, centroid_hz=0.0)
    zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    power = mag * mag
    tot = power.sum()
    return dict(
        sample_rate=sr,
        n_samples=n,
        duration_ms=1000.0 * n / sr,
        rms=float(np.sqrt(np.mean(x * x))),
        peak=float(np.abs(x).max()),
        zcr=float(zc * sr / max(n - 1, 1)),  # crossings per second
        centroid_hz=float((freqs * power).sum() / tot) if tot > 0 else 0.0,
    )


# --- BMP (24-bit uncompressed, bottom-up) -------------------------------------


def write_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an (H, W, 3) uint8 RGB array."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    size = 14 + 40 + stride * h
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return hdr + info + body


def read_bmp(buf: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a 24-bit uncompressed BMP buffer."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP buffer")
    data_off = struct.unpack("<I", buf[10:14])[0]
    w, h = struct.unpack("<ii", buf[18:26])
    bits, comp = struct.unpack("<HI", buf[28:34])
    if bits != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed supported (bits={bits})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def block_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize to (out_h, out_w, C) float64 — the thumbnail /
    model-input-prep kernel, pure numpy (bin rows/cols by target index and
    average via two reduceat passes)."""
    h, w = img.shape[:2]
    ri = np.minimum(np.arange(h) * out_h // h, out_h - 1)
    ci = np.minimum(np.arange(w) * out_w // w, out_w - 1)
    racc = np.add.reduceat(img.astype(np.float64), np.searchsorted(ri, np.arange(out_h)), axis=0)
    rcnt = np.bincount(ri, minlength=out_h)[:, None, None]
    rows = racc / rcnt
    cacc = np.add.reduceat(rows, np.searchsorted(ci, np.arange(out_w)), axis=1)
    ccnt = np.bincount(ci, minlength=out_w)[None, :, None]
    return cacc / ccnt


def bmp_features(buf: bytes, thumb: int = 4) -> dict:
    """Image descriptors from a decoded BMP: dimensions, per-channel
    mean/std, luminance stats, and a ``thumb`` x ``thumb`` area-average
    thumbnail (the resize kernel exercised for real)."""
    img = read_bmp(buf)
    h, w, _ = img.shape
    f = img.astype(np.float64)
    lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    tb = block_resize(img, thumb, thumb)
    return dict(
        width=w,
        height=h,
        mean_r=float(f[:, :, 0].mean()),
        mean_g=float(f[:, :, 1].mean()),
        mean_b=float(f[:, :, 2].mean()),
        std_lum=float(lum.std()),
        mean_lum=float(lum.mean()),
        thumbnail=tb.reshape(-1).astype(np.float32),  # thumb*thumb*3
    )
