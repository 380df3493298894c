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


def test_decode_image_is_gated(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image(media)


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


def test_resize_image_is_gated(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.resize_image(media)


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
