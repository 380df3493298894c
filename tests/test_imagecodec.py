"""Stdlib image codec (PPM P6 / 24-bit BMP): known-value and round-trip pins.

No Spark here — these pin the pure kernels that decode_image/resize_image
run inside Arrow batches, against hand-assembled fixture bytes so a codec
regression shows up as a pixel-value diff, not a downstream hash change.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_clickstream_processor_msk_spark.operators import imagecodec as ic

# 3x2 test image (top-down RGB): distinct pixel per position
PIX_3X2 = bytes(
    [10, 20, 30, 40, 50, 60, 70, 80, 90,
     110, 120, 130, 140, 150, 160, 170, 180, 190]
)


def test_ppm_roundtrip_known_values():
    payload = ic.encode_ppm(3, 2, PIX_3X2)
    assert payload.startswith(b"P6\n3 2\n255\n")
    assert ic.sniff(payload) == "ppm"
    w, h, rgb = ic.decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert rgb == PIX_3X2


def test_ppm_hand_written_header_variants():
    # comments + arbitrary whitespace are legal Netpbm headers
    payload = b"P6 # inline\n# full line comment\n 3\t2 # dims\n255\n" + PIX_3X2
    assert ic.decode_ppm(payload) == (3, 2, PIX_3X2)
    # raster may legally begin with a whitespace-looking byte: only ONE
    # header whitespace byte is consumed after maxval
    first_byte_space = bytes([0x20]) + PIX_3X2[1:]
    assert ic.decode_ppm(b"P6\n3 2\n255\n" + first_byte_space) == (
        3, 2, first_byte_space
    )


@pytest.mark.parametrize(
    "payload,err",
    [
        (b"P5\n3 2\n255\n" + PIX_3X2, "not a P6"),
        (b"P6\n3 2\n65535\n" + PIX_3X2 * 2, "maxval"),
        (b"P6\n3 2\n255\n" + PIX_3X2[:-1], "truncated"),
        (b"P6\n3 2", "truncated PPM header"),
        (b"P6\n0 2\n255\n", "dimensions"),
    ],
)
def test_ppm_rejects_malformed(payload, err):
    with pytest.raises(ValueError, match=err):
        ic.decode_ppm(payload)


def test_bmp_roundtrip_known_values_with_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    payload = ic.encode_bmp(3, 2, PIX_3X2)
    assert ic.sniff(payload) == "bmp"
    assert ic.decode_bmp(payload) == (3, 2, PIX_3X2)


def test_bmp_hand_assembled_bottom_up_bgr():
    """Build the BMP byte-by-byte (independent of encode_bmp) so the
    decoder is pinned against the FORMAT, not against our own encoder:
    2x2, bottom-up rows, BGR order, no padding needed (w*3=6... pad to 8)."""
    # target top-down RGB: (1,2,3) (4,5,6) / (7,8,9) (10,11,12)
    want = bytes(range(1, 13))
    # bottom-up: second row first; BGR per pixel; rows padded to 8 bytes
    row_bottom = bytes([9, 8, 7, 12, 11, 10, 0, 0])
    row_top = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    raster = row_bottom + row_top
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    assert ic.decode_bmp(header + dib + raster) == (2, 2, want)


def test_bmp_top_down_negative_height():
    want = bytes(range(1, 13))
    row_top = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    row_bottom = bytes([9, 8, 7, 12, 11, 10, 0, 0])
    raster = row_top + row_bottom  # top-down storage order
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    assert ic.decode_bmp(header + dib + raster) == (2, 2, want)


@pytest.mark.parametrize(
    "mutate,err",
    [
        (lambda p: b"XX" + p[2:], "not a BMP"),
        (lambda p: p[:28] + struct.pack("<H", 32) + p[30:], "bit depth"),
        (lambda p: p[:30] + struct.pack("<I", 1) + p[34:], "compression"),
        (lambda p: p[:-1], "truncated"),
    ],
)
def test_bmp_rejects_malformed(mutate, err):
    payload = ic.encode_bmp(3, 2, PIX_3X2)
    with pytest.raises(ValueError, match=err):
        ic.decode_bmp(mutate(payload))


def test_decode_dispatch_and_cross_format_agreement():
    ppm = ic.decode(ic.encode_ppm(3, 2, PIX_3X2))
    bmp = ic.decode(ic.encode_bmp(3, 2, PIX_3X2))
    assert ppm == ("ppm", 3, 2, PIX_3X2)
    assert bmp == ("bmp", 3, 2, PIX_3X2)
    with pytest.raises(ValueError, match="unsupported image payload"):
        ic.decode(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_resize_nearest_upscale_replicates_blocks():
    # 2x2 -> 4x4: floor mapping replicates each pixel into a 2x2 block
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    out = ic.resize_nearest(2, 2, rgb, 4, 4)
    assert len(out) == 4 * 4 * 3
    assert out[0:3] == out[3:6] == bytes([255, 0, 0])  # top-left block
    assert out[6:9] == out[9:12] == bytes([0, 255, 0])  # top-right block
    assert out[36:39] == bytes([0, 0, 255])  # row 3 left
    assert out[45:48] == bytes([9, 9, 9])  # bottom-right


def test_resize_nearest_downscale_identity_cases():
    rgb = bytes(range(1, 13))  # 2x2
    assert ic.resize_nearest(2, 2, rgb, 2, 2) == rgb  # no-op
    assert ic.resize_nearest(2, 2, rgb, 1, 1) == rgb[:3]  # floor -> top-left


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 17),
    nw=st.integers(1, 23),
    nh=st.integers(1, 23),
    data=st.data(),
)
def test_roundtrip_and_resize_properties(w, h, nw, nh, data):
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert ic.decode_ppm(ic.encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert ic.decode_bmp(ic.encode_bmp(w, h, rgb)) == (w, h, rgb)
    out = ic.resize_nearest(w, h, rgb, nw, nh)
    assert len(out) == nw * nh * 3
    # every output pixel is SOME input pixel (nearest neighbor invariant)
    pixels = {rgb[i : i + 3] for i in range(0, len(rgb), 3)}
    assert all(out[i : i + 3] in pixels for i in range(0, len(out), 3))
