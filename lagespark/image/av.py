"""LAV1 — a from-scratch seekable audio/video container (stdlib + numpy).

The sandbox has no AV codec libraries (no ffmpeg/soundfile/PyAV), but the
repo already owns a real lossy image codec (qdct, codecs.py) — so multimodal
decode does not need to be faked: a container of qdct-encoded frames plus a
unit index makes `decode_av_features` / `sample_av_frames` decode ACTUAL
bytes, with the per-frame "PSNR ≥ 40 dB for lossy media" invariant
(BASELINE.json:6,15) exercised end-to-end. On a real cluster the same
operators swap this parser for ffmpeg/soundfile behind the `real_codecs`
seam in image_ops.

Layout (big-endian):

    magic   b"LAV1"                      4 bytes
    mtype   u8                           0 = video, 1 = audio
    video:  u16 w, u16 h, f32 fps
    audio:  u32 sample_rate, u16 window  (samples per unit)
    n_units u32
    index   n_units × (u32 offset, u32 length)   offsets into the body
    body    concatenated units
              video unit: one qdct-encoded RGB frame (lossy, PSNR ≥ 40)
              audio unit: zlib-deflated s16 PCM window (lossless)

The index is the point: sampling at timestamp t seeks straight to ONE unit
and decodes only it (the `ffmpeg -ss` analogue) — a 100 TB frame-sampling
pass never touches the unsampled bytes of a payload.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import codecs

MAGIC = b"LAV1"
VIDEO, AUDIO = 0, 1


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _with_index(head: bytes, units: list[bytes]) -> bytes:
    idx = bytearray()
    off = 0
    for u in units:
        idx += struct.pack(">II", off, len(u))
        off += len(u)
    return head + struct.pack(">I", len(units)) + bytes(idx) + b"".join(units)


def encode_video(frames: list[np.ndarray], fps: float) -> bytes:
    """Container of qdct-encoded frames. All frames must share (h, w)."""
    if not frames:
        raise ValueError("encode_video: at least one frame required")
    h, w = frames[0].shape[:2]
    units = [codecs.encode_qdct(f) for f in frames]
    head = MAGIC + struct.pack(">BHHf", VIDEO, w, h, float(fps))
    return _with_index(head, units)


def encode_audio(samples: np.ndarray, sample_rate: int, window: int = 256) -> bytes:
    """Container of zlib-deflated s16 windows (last window zero-padded)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.size == 0:
        raise ValueError("encode_audio: at least one sample required")
    n_units = (s.size + window - 1) // window
    pad = np.zeros(n_units * window, dtype=np.int16)
    pad[: s.size] = s
    units = [
        zlib.compress(pad[u * window : (u + 1) * window].tobytes(), 6)
        for u in range(n_units)
    ]
    head = MAGIC + struct.pack(">BIH", AUDIO, int(sample_rate), int(window))
    return _with_index(head, units)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def read_header(data: bytes) -> dict:
    """Parse magic + media header + unit index (no unit is decoded)."""
    if data[:4] != MAGIC:
        raise ValueError("not a LAV1 container")
    mtype = data[4]
    if mtype == VIDEO:
        w, h, fps = struct.unpack(">HHf", data[5:13])
        pos = 13
        hdr = {"mtype": "video", "w": w, "h": h, "fps": fps}
    elif mtype == AUDIO:
        rate, window = struct.unpack(">IH", data[5:11])
        pos = 11
        hdr = {"mtype": "audio", "rate": rate, "window": window}
    else:
        raise ValueError(f"unknown LAV1 media type {mtype}")
    (n_units,) = struct.unpack(">I", data[pos : pos + 4])
    pos += 4
    idx = struct.unpack(f">{2 * n_units}I", data[pos : pos + 8 * n_units])
    hdr["n_units"] = n_units
    hdr["index"] = [(idx[2 * i], idx[2 * i + 1]) for i in range(n_units)]
    hdr["body_off"] = pos + 8 * n_units
    return hdr


def decode_unit(data: bytes, hdr: dict, u: int) -> np.ndarray:
    """Decode ONE unit via the index — the seek path sampling relies on.
    Returns (h, w, 3) uint8 for video, (window,) int16 for audio."""
    off, length = hdr["index"][u]
    raw = data[hdr["body_off"] + off : hdr["body_off"] + off + length]
    if hdr["mtype"] == "video":
        return codecs.decode_qdct(raw)
    return np.frombuffer(zlib.decompress(raw), dtype=np.int16)


def decode_all(data: bytes) -> tuple[dict, list[np.ndarray]]:
    hdr = read_header(data)
    return hdr, [decode_unit(data, hdr, u) for u in range(hdr["n_units"])]


def unit_at(hdr: dict, ts_ms: int) -> int:
    """Unit index covering timestamp ts_ms (clamped to the last unit)."""
    if hdr["mtype"] == "video":
        u = int(ts_ms * hdr["fps"] / 1000.0)
    else:
        u = int(ts_ms * hdr["rate"] / 1000.0 / hdr["window"])
    return max(0, min(hdr["n_units"] - 1, u))


# ---------------------------------------------------------------------------
# deterministic procedural content (fixtures + generators)
# ---------------------------------------------------------------------------


def procedural_frames(i: int, n_frames: int, w: int = 16, h: int = 16) -> list[np.ndarray]:
    """Deterministic smooth video: the procedural still keyed on `i`, panned
    by 1 px per frame with a mild brightness ramp. Smooth content keeps the
    qdct roundtrip comfortably above the 40 dB PSNR bar while every frame
    stays distinct (roll + ramp)."""
    base = codecs.procedural_image(i, w, h).astype(np.int16)
    out = []
    for f in range(n_frames):
        px = np.roll(base, shift=(f % h, (2 * f) % w), axis=(0, 1)) + (f % 7)
        out.append(np.clip(px, 0, 255).astype(np.uint8))
    return out


def procedural_audio(i: int, n_samples: int, rate: int) -> np.ndarray:
    """Deterministic two-tone s16 signal keyed on `i`."""
    t = np.arange(n_samples, dtype=np.float64) / rate
    f1 = 200.0 + (i % 17) * 40.0
    f2 = 900.0 + (i % 11) * 60.0
    sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    return np.round(sig * 20000.0).astype(np.int16)
