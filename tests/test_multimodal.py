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
