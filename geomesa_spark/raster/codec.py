"""Deterministic numpy image codecs.

The container has no imaging library, so the engine ships three numpy-native
formats and gates real PNG/JPEG behind an import-try (the Spark-side
plumbing — schema, batch shape, UDF signatures — is identical either way):

- ``raw``  : uncompressed C-order RGB uint8, lossless, byte-stable.
- ``rawz`` : zlib(raw), lossless. Stands in for PNG in fixtures.
- ``q5``   : per-channel uniform quantization to 5 bits (step 8, mid-rise
  reconstruction) then zlib. Deterministic lossy codec standing in for JPEG;
  worst-case quantization noise std = 8/sqrt(12) = 2.31 LSB, so
  PSNR >= 20*log10(255/2.31) ~= 40.9 dB — above the 40 dB gate the
  per-row invariant requires for lossy formats.

All functions are pure (no wall-clock, no RNG) so encode(decode(x)) is
reproducible across executors — required for the per-row pixel invariant.
"""

from __future__ import annotations

import zlib

import numpy as np

try:  # real codecs, if an imaging library is ever present
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_Q5_STEP = 8  # 256 / 2^5


def supported_formats() -> tuple[str, ...]:
    base = ("raw", "rawz", "q5")
    return base + (("png", "jpeg") if _HAVE_PIL else ())


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array into payload bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.dtype}{pixels.shape}")
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "rawz":
        return zlib.compress(pixels.tobytes(), level=6)
    if fmt == "q5":
        q = (pixels // _Q5_STEP).astype(np.uint8)
        return zlib.compress(q.tobytes(), level=6)
    if fmt in ("png", "jpeg"):
        if not _HAVE_PIL:
            raise NotImplementedError(
                f"format {fmt!r} needs an imaging library not present in this "
                "environment; use raw/rawz/q5 (deterministic numpy codecs)")
        import io
        buf = io.BytesIO()
        Image.fromarray(pixels).save(buf, format=fmt.upper())
        return buf.getvalue()
    raise ValueError(f"unknown image format {fmt!r}")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode payload bytes back into an (h, w, 3) uint8 array."""
    shape = (h, w, 3)
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(shape)
    if fmt == "rawz":
        return np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(shape)
    if fmt == "q5":
        q = np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(shape)
        # mid-rise reconstruction: bin center, clipped to uint8 range
        return np.minimum(q.astype(np.uint16) * _Q5_STEP + _Q5_STEP // 2, 255) \
            .astype(np.uint8)
    if fmt in ("png", "jpeg"):
        if not _HAVE_PIL:
            raise NotImplementedError(
                f"format {fmt!r} needs an imaging library not present in this "
                "environment")
        import io
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError(f"unknown image format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def mean_pool(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized area-style downsample of (h, w, 3) uint8 to (out_h, out_w, 3).

    Nearest-bin mean pooling: each output pixel averages the input pixels
    whose floor-binned coordinates land in it (same floor-bin + clamp
    convention as the cell kernels). Pure numpy, no per-pixel Python.
    """
    h, w, _ = pixels.shape
    ys = np.minimum((np.arange(h) * out_h) // h, out_h - 1)
    xs = np.minimum((np.arange(w) * out_w) // w, out_w - 1)
    flat = (ys[:, None] * out_w + xs[None, :]).ravel()
    acc = np.zeros((out_h * out_w, 3), dtype=np.float64)
    cnt = np.bincount(flat, minlength=out_h * out_w).astype(np.float64)
    for c in range(3):
        acc[:, c] = np.bincount(flat, weights=pixels[:, :, c].ravel(),
                                minlength=out_h * out_w)
    cnt = np.maximum(cnt, 1.0)
    return (acc / cnt[:, None]).round().astype(np.uint8).reshape(out_h, out_w, 3)
