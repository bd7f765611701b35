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


def test_video_frame_sampling(spark):
    """Multimodal frame-sample plumbing: stride explode, corrupt guard,
    deterministic frames (functions/video.py)."""
    import pandas as pd

    from stop_sync_osm_atlas_spark.functions.video import (
        decode_video_header,
        encode_video,
        sample_frames,
    )

    rows = [
        ("v1", encode_video(seed=7, w=16, h=8, n_frames=25)),
        ("v2", encode_video(seed=9, w=8, h=8, n_frames=3)),
        ("bad", b"\x00\x01garbage"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["video_id", "bytes"]))
    out = sample_frames(df, stride=10).toPandas()
    v1 = out[out.video_id == "v1"].sort_values("frame_idx")
    assert list(v1.frame_idx) == [0, 10, 20] and v1.ok.all()
    v2 = out[out.video_id == "v2"]
    assert list(v2.frame_idx) == [0]
    bad = out[out.video_id == "bad"]
    assert len(bad) == 1 and not bad.ok.iloc[0]
    # determinism: same container decodes to the same frame statistic
    out2 = sample_frames(df, stride=10).toPandas()
    m1 = out.sort_values(["video_id", "frame_idx"]).mean_gray.fillna(-1).tolist()
    m2 = out2.sort_values(["video_id", "frame_idx"]).mean_gray.fillna(-1).tolist()
    assert m1 == m2
    assert decode_video_header(rows[0][1])[0] == 25


def test_audio_features(spark):
    """Multimodal audio plumbing: windowed features, corrupt guard
    (functions/audio.py)."""
    import pandas as pd

    from stop_sync_osm_atlas_spark.functions.audio import (
        audio_features,
        encode_audio,
    )

    rows = [
        ("a1", encode_audio(seed=3, sample_rate=8000, n_samples=16000)),
        ("a2", encode_audio(seed=5, sample_rate=4000, n_samples=2000)),
        ("bad", b"RIFFnope"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))
    out = audio_features(df, window_s=0.5).toPandas().set_index("audio_id")
    assert out.loc["a1", "ok"] and out.loc["a1", "duration_s"] == 2.0
    assert out.loc["a1", "n_windows"] == 4
    assert 0.1 < out.loc["a1", "rms"] < 0.9  # tone+noise, not silence/clipping
    assert 0 < out.loc["a1", "zero_cross_rate"] < 1
    assert out.loc["a2", "n_windows"] == 1
    assert not out.loc["bad", "ok"]
