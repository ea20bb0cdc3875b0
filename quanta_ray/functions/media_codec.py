"""Pure-numpy codecs for UNCOMPRESSED media containers (PCM WAV audio,
24-bit BMP images, YUV4MPEG2/C420 video) — real decode without external
libraries.

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


# --- Y4M (YUV4MPEG2, C420) ----------------------------------------------------


def write_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """YUV4MPEG2 C420 container from (N, H, W, 3) uint8 RGB frames.

    RGB -> BT.601 full-range YUV; U/V subsampled 2x2 by area average
    (H and W must be even, the C420 constraint)."""
    n, h, w, _ = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 requires even dimensions")
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    out = [hdr]
    f = frames.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    u = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    v = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(np.clip(np.round(y[i]), 0, 255).astype(np.uint8).tobytes())
        for plane in (u[i], v[i]):
            sub = plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            out.append(np.clip(np.round(sub), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def read_y4m(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, fps, Y planes as (N, H, W) uint8) from a YUV4MPEG2
    C420 buffer. Returns luma only (what frame features need); chroma
    planes are skipped by stride. Frame access is O(1) per frame —
    ``np.frombuffer`` views, no copy of the whole stream."""
    nl = buf.index(b"\n")
    head = buf[:nl].decode()
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 buffer")
    w = h = fps = None
    colorspace = "C420"
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            colorspace = tok
    if not colorspace.startswith("C420"):
        raise ValueError(f"only C420 supported, got {colorspace}")
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frame_sz = ysz + 2 * csz
    pos, lumas = nl + 1, []
    marker = b"FRAME"
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos : pos + 5] != marker:
            raise ValueError(f"bad frame marker at {pos}")
        pos = fnl + 1
        lumas.append(
            np.frombuffer(buf, dtype=np.uint8, count=ysz, offset=pos).reshape(h, w)
        )
        pos += frame_sz
    return w, h, fps or 25, np.stack(lumas) if lumas else np.empty((0, h, w), np.uint8)


def y4m_frame_features(buf: bytes, every: int = 1) -> list[dict]:
    """Per-sampled-frame luma descriptors: mean/std luminance and mean
    absolute difference vs the previous sampled frame (the scene-change /
    motion signal a real frame sampler keys on)."""
    w, h, fps, lum = read_y4m(buf)
    out = []
    prev = None
    for i in range(0, len(lum), max(1, every)):
        f = lum[i].astype(np.float64)
        d = float(np.abs(f - prev).mean()) if prev is not None else 0.0
        out.append(
            dict(frame_idx=i, offset_ms=int(1000 * i / fps),
                 mean_lum=float(f.mean()), std_lum=float(f.std()), motion=d)
        )
        prev = f
    return out
