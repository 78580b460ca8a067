"""Multimodal plumbing tests: schema, batch shape, determinism. The codec
is the documented deterministic fake; LibraryCodec raises at the real
decode plug-in point."""

from __future__ import annotations

import numpy as np
import pytest

from tfidf_spark.operators.multimodal import (
    DeterministicFakeCodec,
    LibraryCodec,
    extract_features,
    media_repartition,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 48).cache()


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,mime:string,n_bytes:bigint,"
        "width:int,height:int,duration_ms:int,payload:binary>"
    )
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_library_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        LibraryCodec().decode_image(b"png...")


def test_features_shape_and_determinism(spark, media):
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    f2 = {
        r["media_id"]: r["feature"]
        for r in extract_features(media.repartition(5)).collect()
    }
    assert len(f1) == 48
    assert all(len(v) == 64 for v in f1.values())
    for k in f1:
        assert np.allclose(f1[k], f2[k])  # partitioning-independent


def test_media_repartition_targets_bytes(media):
    df = media_repartition(media, target_bytes=2048)
    assert df.rdd.getNumPartitions() >= 5  # 48 rows * ~450B / 2KB


def test_fake_codec_depends_only_on_payload():
    c = DeterministicFakeCodec()
    a = c.decode_image(b"same-bytes")
    b = c.decode_image(b"same-bytes")
    d = c.decode_image(b"other-bytes")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, d)


def test_resize_nearest_goldens():
    import numpy as np

    from tfidf_spark.operators.multimodal import resize_nearest

    # 4x4 gradient downsampled 2x: pixel-center sampling picks (1,1),(1,3),...
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = resize_nearest(arr, 2, 2)
    assert small.tolist() == [[5, 7], [13, 15]]
    # upscale duplicates neighbors, shape-exact, dtype preserved
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8) and up.dtype == arr.dtype
    assert up[0, 0] == arr[0, 0] and up[7, 7] == arr[3, 3]
    # channels ride along
    rgb = np.stack([arr] * 3, axis=-1)
    assert resize_nearest(rgb, 2, 2).shape == (2, 2, 3)


def test_resize_images_spark_path(spark):
    from tfidf_spark.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, n_rows=9)
    out = resize_images(media, out_h=4, out_w=4).collect()
    assert len(out) == 3  # image rows only (ids 0, 3, 6)
    for r in out:
        assert r["height"] == 4 and r["width"] == 4
        assert len(r["pixels"]) == 4 * 4 * 3  # RGB
        assert all(0 <= p <= 255 for p in r["pixels"])
    # deterministic across partitionings (real decode + index arithmetic)
    again = resize_images(synth_media(spark, n_rows=9).repartition(4), 4, 4)
    a = {r["media_id"]: r["pixels"] for r in out}
    b = {r["media_id"]: r["pixels"] for r in again.collect()}
    assert a == b
