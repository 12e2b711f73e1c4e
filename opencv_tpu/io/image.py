"""Image I/O (imgcodecs analog).

The reference bundles libjpeg/libpng/etc. (modules/imgcodecs, 3rdparty
codecs). Decoding stays on host (PIL-backed where available, plus a
dependency-free PGM/PPM path); arrays land as float32 grayscale ready
for device upload.
"""

from __future__ import annotations

import os

import numpy as np


def imread(path: str, grayscale: bool = True) -> np.ndarray:
    """Read an image file -> f32 [H,W] (grayscale) or [H,W,3] RGB.
    (cv::imread analog, modules/imgcodecs/src/loadsave.cpp.)"""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pgm", ".ppm", ".pnm"):
        arr = _read_pnm(path)
    else:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.float32)
    if grayscale and arr.ndim == 3:
        arr = arr @ np.array([0.299, 0.587, 0.114], np.float32)
    return arr.astype(np.float32)


def imwrite(path: str, img: np.ndarray) -> None:
    """Write an image (u8 conversion with clipping)."""
    from PIL import Image

    arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _read_pnm(path: str) -> np.ndarray:
    """Minimal binary PGM (P5) / PPM (P6) reader (KITTI ships PNG, TUM
    PGM depth; keeps io importable without PIL)."""
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, width, height, maxval separated by whitespace/comments
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    i += 1  # single whitespace after maxval
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    if magic == b"P5":
        arr = np.frombuffer(data, dtype, count=w * h, offset=i).reshape(h, w)
    elif magic == b"P6":
        arr = np.frombuffer(data, dtype, count=w * h * 3, offset=i).reshape(h, w, 3)
    else:
        raise ValueError(f"unsupported PNM magic {magic!r}")
    return arr.astype(np.float32)
