"""Frame sinks: PNG/NPY writers (dependency-free).

The reference presents frames to a canvas; the engine's equivalent frame
sink writes images/arrays to disk (SURVEY.md §7 layer 5).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["to_uint8", "write_png", "write_npy"]


def to_uint8(img) -> np.ndarray:
    """float image in [0, 1] (H, W, 3|4) → uint8, NaN-safe."""
    a = np.asarray(img, dtype=np.float32)
    a = np.nan_to_num(a, nan=0.0, posinf=1.0, neginf=0.0)
    return (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img) -> None:
    """Write an (H, W, 3|4) float [0,1] or uint8 image as PNG."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = to_uint8(a)
    if a.ndim == 2:
        a = np.repeat(a[..., None], 3, axis=-1)
    h, w, c = a.shape
    if c == 3:
        color_type = 2
    elif c == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported channel count {c}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[row].tobytes() for row in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_npy(path: str, img) -> None:
    np.save(path, np.asarray(img))
