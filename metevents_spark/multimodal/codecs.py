"""Minimal vendored image codecs: binary PPM (P6) and uncompressed
24-bit BMP, implemented from the public format specifications.

Purpose: the container has no PIL/av, so without these the real-codec
branch of the multimodal kernels could never execute and the
decode→embed swap point would stay unproven. These two formats are
simple enough to decode in ~40 lines of numpy each, which lets one
pytest drive decode → resize → embed → near-dup on REAL image bytes
(two containers of the same pixels: different payload hashes, same
decoded content). Real deployments swap in PIL/ffmpeg at
``metevents_spark.multimodal.media._decode_real`` — the kernel
signatures, Arrow batch flow, and schemas are identical.

Driver-side cost: none. These run inside mapInPandas workers on
payloads that never shuffle.
"""

from __future__ import annotations

import numpy as np


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a P6 PPM or uncompressed 24-bit BMP payload to an
    (height, width, 3) uint8 RGB array. Raises ValueError for any
    other container."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError("unsupported image container (want P6 PPM or BMP)")


def _decode_ppm(payload: bytes) -> np.ndarray:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    # '#' comments may appear between tokens (netpbm spec)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (want 255)")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    def u32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], "little")

    def i32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], "little", signed=True)

    pix_off = u32(10)
    w, h = i32(18), i32(22)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = u32(30)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (bottom-up, row-padded) — exists so tests can plant the SAME
    pixels in two different containers."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    raster = body.tobytes()
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + raster


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (target_h, target_w, 3)."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]
