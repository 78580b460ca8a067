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
