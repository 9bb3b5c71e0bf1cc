"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, frame-sampling fan-out."""

from __future__ import annotations

import pytest

from sneller_spark.operators.multimodal import (
    image_features,
    resize_images,
    sample_video_frames,
    synth_assets_df,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synth_assets_df(spark, n=30)


def test_asset_schema_and_partitioning(spark, assets):
    assert assets.count() == 30
    mods = {r["modality"] for r in assets.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}
    # repartitioning must not change content (stateless plumbing)
    a = sorted(r["asset_id"] for r in assets.repartition(7).collect())
    b = sorted(r["asset_id"] for r in assets.coalesce(1).collect())
    assert a == b


def test_image_features_deterministic(spark, assets):
    f1 = image_features(assets, dim=16).toPandas().set_index("asset_id").sort_index()
    f2 = (
        image_features(assets.repartition(5), dim=16)
        .toPandas()
        .set_index("asset_id")
        .sort_index()
    )
    assert len(f1) == 10  # n=30, one third are images
    for aid in f1.index:
        assert list(f1.loc[aid, "features"]) == list(f2.loc[aid, "features"])
        assert len(f1.loc[aid, "features"]) == 16


def test_resize_updates_meta(spark, assets):
    out = resize_images(assets, 64, 64).select("meta.width", "meta.height").distinct()
    assert out.collect() == [(64, 64)] or [tuple(r) for r in out.collect()] == [(64, 64)]


def test_video_frame_sampling(spark, assets):
    frames = sample_video_frames(assets, every_n=8).toPandas()
    vids = assets.filter("modality = 'video'").select("asset_id", "meta.n_frames").toPandas()
    expected = sum((int(n) + 7) // 8 for n in vids["n_frames"])
    assert len(frames) == expected
    assert (frames["frame_idx"] % 8 == 0).all()


def test_ppm_codec_roundtrip():
    import numpy as np

    from sneller_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.Generator(np.random.PCG64(1))
    img = rng.integers(0, 256, size=(13, 7, 3)).astype(np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # header comments tolerated
    data = encode_ppm(img)
    commented = data[:3] + b"# a comment\n" + data[3:]
    assert (decode_ppm(commented) == img).all()


def test_ppm_features_real_decode(spark):
    """REAL decode path (no stub): a constant-color image's features
    are exactly the known channel means with zero std."""
    import numpy as np

    from sneller_spark.operators.multimodal import (
        ASSET_SCHEMA,
        encode_ppm,
        ppm_image_features,
        synth_ppm_assets_df,
    )

    solid = np.zeros((10, 10, 3), dtype=np.uint8)
    solid[:, :, 0] = 255  # pure red
    rows = [("solid-red", "image", bytearray(encode_ppm(solid)),
             {"width": 10, "height": 10, "sample_rate": None,
              "n_frames": None, "codec": "ppm"})]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = ppm_image_features(df, grid=2).toPandas().iloc[0]["features"]
    assert len(feats) == 6 + 3 * 4
    np.testing.assert_allclose(feats[0:3], [1.0, 0.0, 0.0], atol=1e-6)  # means
    np.testing.assert_allclose(feats[3:6], [0.0, 0.0, 0.0], atol=1e-6)  # stds
    # every grid block of a solid image has the same mean
    np.testing.assert_allclose(feats[6::3], [1.0] * 4, atol=1e-6)

    # determinism across partitionings on the synthetic corpus
    assets = synth_ppm_assets_df(spark, n=12)
    a = ppm_image_features(assets).toPandas().set_index("asset_id").sort_index()
    b = ppm_image_features(assets.repartition(5)).toPandas().set_index("asset_id").sort_index()
    for k in a.index:
        np.testing.assert_allclose(a.loc[k, "features"], b.loc[k, "features"])


def test_ppm_resize_real(spark):
    import numpy as np

    from sneller_spark.operators.multimodal import (
        decode_ppm,
        resize_ppm_images,
        synth_ppm_assets_df,
    )

    assets = synth_ppm_assets_df(spark, n=6)
    out = resize_ppm_images(assets, 8, 8).toPandas()
    assert len(out) == 6
    for _, row in out.iterrows():
        img = decode_ppm(bytes(row["payload"]))
        assert img.shape == (8, 8, 3)
    assert all(
        (m["width"], m["height"]) == (8, 8) for m in out["meta"]
    )
