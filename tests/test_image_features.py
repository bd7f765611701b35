"""Multimodal feature-extraction plumbing: decode -> resize -> embed
(mapInPandas), and embedding-cosine near-dup over the result."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stop_sync_osm_atlas_spark.functions.image import image_features, synth_pixels
from stop_sync_osm_atlas_spark.operators.similarity import cosine_pairs
from stop_sync_osm_atlas_spark.schemas import PAIRS_SCHEMA


@pytest.fixture(scope="module")
def feats(spark, fixture_paths):
    pairs = spark.read.schema(PAIRS_SCHEMA).parquet(fixture_paths["pairs"])
    return image_features(pairs).toPandas(), pairs.count()


def test_feature_shapes(feats):
    pdf, n = feats
    assert len(pdf) == n
    good = pdf[pdf["ok"]]
    assert len(good) > 0
    assert good["embedding"].map(len).eq(64).all()
    bad = pdf[~pdf["ok"]]
    assert len(bad) > 0  # planted corrupt rows
    assert bad["embedding"].isna().all()


def test_feature_values_match_numpy(feats, fixture_1k):
    """Spot-check one decodable row against a direct numpy computation."""
    pdf, _ = feats
    row = pdf[pdf["ok"]].iloc[0]
    src = fixture_1k.pairs.set_index("image_id").loc[row["image_id"]]
    import struct as st

    from stop_sync_osm_atlas_spark.functions.image import MAGIC, decode_image

    px, w, h, fmt, err = decode_image(src["bytes"])
    assert err is None
    assert abs(px.astype(float).mean(axis=(0, 1))[0] - row["mean_r"]) < 1e-9
    gray = px.astype(float).mean(axis=2)
    assert abs(gray.std() - row["std_gray"]) < 1e-9


def test_pixel_embedding_neardup(spark):
    """Near-identical images (same seed, jpeg vs png) land at cosine ~1;
    unrelated seeds do not."""
    from stop_sync_osm_atlas_spark.functions.image import encode_image

    rows = [
        ("a", encode_image(1, 64, 64, "png")),
        ("b", encode_image(1, 64, 64, "jpeg")),  # lossy twin of a
        ("c", encode_image(2**40 + 5, 64, 64, "png")),
    ]
    pdf = pd.DataFrame(
        [
            dict(image_id=i, bytes=b, w=64, h=64, fmt="png", caption="x", phash=0)
            for i, b in rows
        ]
    )
    pairs = spark.createDataFrame(pdf, PAIRS_SCHEMA)
    emb = image_features(pairs).where(F.col("ok")).select(
        F.col("image_id").alias("vec_id"), "embedding"
    )
    out = cosine_pairs(emb, threshold=0.999).toPandas()
    got = set(zip(out["a_id"], out["b_id"]))
    assert ("a", "b") in got
    assert ("a", "c") not in got and ("b", "c") not in got
