"""Multimodal column plumbing tests (binary payloads, Arrow-batched UDFs)."""

from __future__ import annotations

import hashlib

import pytest

from flink_clickstream_processor_msk_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "a" * 200), (2, "spark engine")],
        "doc_id long, text string",
    )
    return multimodal.attach_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta_fields = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_fields == [
        "media_type", "format", "width", "height", "sample_rate", "duration_ms",
    ]


def test_byte_stats(media):
    rows = {r["doc_id"]: r for r in multimodal.byte_stats(media).collect()}
    assert rows[0]["n_bytes"] == len(b"hello world")
    assert rows[1]["n_bytes"] == 200
    assert rows[1]["n_distinct_bytes"] == 1
    assert rows[0]["payload_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_media_features_are_normalized_histograms(media):
    rows = {r["vec_id"]: r["embedding"] for r in multimodal.media_features(media).collect()}
    for vec in rows.values():
        assert len(vec) == multimodal.N_FEATURES
        assert abs(sum(vec) - 1.0) < 1e-9
    # 'aaaa...' has a single byte value -> one-hot histogram
    assert max(rows[1]) == 1.0


def test_fake_decode_fills_dimensions(media):
    rows = multimodal.fake_decode_meta(media).select("meta.width", "meta.height").collect()
    for r in rows:
        assert 1 <= r["width"] <= 1920
        assert 1 <= r["height"] <= 1080


def test_default_decode_gates_non_stdlib_formats_on_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gated path not reachable")
    except ImportError:
        pass
    # not PPM/BMP and no PIL -> NotImplementedError naming the seam
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.default_decode(b"\x89PNG\r\n\x1a\nrest-of-a-png")


# --- real decode path: stdlib PPM/BMP fixtures with known pixel values ---

# 2x2 image: red, green / blue, white (top-down RGB)
RGB_2X2 = bytes(
    [255, 0, 0, 0, 255, 0,
     0, 0, 255, 255, 255, 255]
)


@pytest.fixture(scope="module")
def image_media(spark):
    from flink_clickstream_processor_msk_spark.operators import imagecodec

    rows = [
        (10, imagecodec.encode_ppm(2, 2, RGB_2X2), ("image", "ppm")),
        (11, imagecodec.encode_bmp(2, 2, RGB_2X2), ("image", "bmp")),
    ]
    return spark.createDataFrame(
        [
            (doc_id, payload,
             (mt, fmt, None, None, None, None))
            for doc_id, payload, (mt, fmt) in rows
        ],
        multimodal.MEDIA_SCHEMA,
    )


def test_decode_image_real_stdlib_branch(image_media):
    rows = {r["doc_id"]: r for r in multimodal.decode_image(image_media).collect()}
    assert rows[10]["format"] == "ppm"
    assert rows[11]["format"] == "bmp"
    for r in rows.values():
        assert (r["width"], r["height"]) == (2, 2)
        assert bytes(r["rgb"]) == RGB_2X2  # exact known pixels, both formats


def test_decode_image_decoder_injection_seam(image_media):
    def fake(payload):
        return ("injected", 1, 1, b"\x01\x02\x03")

    rows = multimodal.decode_image(image_media, decoder=fake).collect()
    assert all(r["format"] == "injected" for r in rows)
    assert all(bytes(r["rgb"]) == b"\x01\x02\x03" for r in rows)


def test_fake_resize_constant_size_and_composes(media):
    """Resize clamps every payload to exactly width*height bytes, stamps
    the dimensions into meta, keeps the (doc_id, payload, meta) shape so
    it composes with the rest of the media suite, and is deterministic
    (stride-sampled from the source bytes, cycling short payloads)."""
    out = multimodal.fake_resize(media, width=4, height=8)
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "meta"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(len(r["payload"]) == 32 for r in rows.values())
    assert all(
        (r["meta"]["width"], r["meta"]["height"]) == (4, 8) for r in rows.values()
    )
    # deterministic: stride-sampling "a"*200 yields all 'a' bytes
    assert rows[1]["payload"] == b"a" * 32
    # short payload cycles, never truncates to less than full size
    assert len(rows[0]["payload"]) == 32
    # composes: byte_stats and features run on the resized table
    assert multimodal.byte_stats(out).count() == 3
    feats = multimodal.media_features(out).collect()
    assert all(len(r["embedding"]) == multimodal.N_FEATURES for r in feats)
    # run-to-run determinism
    again = {r["doc_id"]: r["payload"] for r in multimodal.fake_resize(
        media, width=4, height=8).collect()}
    assert {k: bytes(v) for k, v in again.items()} == {
        k: bytes(r["payload"]) for k, r in rows.items()
    }


def test_resize_image_real_stdlib_branch(image_media):
    """2x2 -> 4x4 nearest-neighbor = each source pixel replicated into a
    2x2 block, re-encoded in the SAME container format, meta stamped."""
    from flink_clickstream_processor_msk_spark.operators import imagecodec

    out = multimodal.resize_image(image_media, width=4, height=4)
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "meta"]
    rows = {r["doc_id"]: r for r in out.collect()}
    # format preserved per payload
    assert imagecodec.sniff(bytes(rows[10]["payload"])) == "ppm"
    assert imagecodec.sniff(bytes(rows[11]["payload"])) == "bmp"

    def px(rgb, w, x, y):
        i = (y * w + x) * 3
        return tuple(rgb[i : i + 3])

    expect = {
        (0, 0): (255, 0, 0), (1, 0): (255, 0, 0),
        (2, 0): (0, 255, 0), (3, 0): (0, 255, 0),
        (0, 2): (0, 0, 255), (3, 3): (255, 255, 255),
    }
    for r in rows.values():
        assert (r["meta"]["width"], r["meta"]["height"]) == (4, 4)
        fmt, w, h, rgb = imagecodec.decode(bytes(r["payload"]))
        assert (w, h) == (4, 4)
        for (x, y), want in expect.items():
            assert px(rgb, 4, x, y) == want, (fmt, x, y)


def test_resize_image_rejects_non_image_payloads_at_execution(media):
    """The raw-text media fixture is not decodable: the error surfaces at
    execution (inside the Arrow batch), naming the injection seam."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gated path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="PIL|NotImplementedError"):
        multimodal.resize_image(media).collect()


def test_frame_sample_shapes(media):
    frames = multimodal.frame_sample(media, frame_bytes=50, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 200-byte payload -> 4 frames of 50 -> sampled idx 0, 2
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 2]
    assert all(len(r["frame"]) == 50 for r in by_doc[1])
    # 11-byte payload -> 1 frame
    assert [r["frame_idx"] for r in by_doc[0]] == [0]
