"""Video frame sampling over opaque binary columns (multimodal plumbing).

Same design contract as functions/image.py: videos are opaque ``binary``
cells with typed metadata; the frame decoder is swappable. Real codecs
(PyAV / OpenCV) are not in this container, so the decode step uses the
repo's deterministic fake container — the Spark-side plumbing (schema,
mapInPandas batch shape, one-row-per-sampled-frame explode, stride
semantics) is real and tested, and ``_decode_frame`` is the single seam
where a real codec plugs in.

Container layout (deterministic, seeded):
  MAGIC | n_frames:u32 | w:u32 | h:u32 | seed:u64
Frame ``i``'s pixels are ``synth_pixels(seed + i, w, h)`` — every frame
is reproducible from the header alone, like a keyframe-only stream.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .image import MAX_DECODE_PIXELS, synth_pixels

VIDEO_MAGIC = b"SGV1"
_HDR = struct.Struct("<4sIIIQ")

# decode-bomb budget for the frame COUNT (the video-specific
# amplification axis on top of image.MAX_DECODE_PIXELS): a corrupt
# 24-byte header claiming 2^32-1 frames of 65535x65535 would otherwise
# loop ~4e8 times allocating ~12 GB per frame inside a mapInPandas
# worker — the exact DoS image.py's pixel budget guards, reintroduced
# via the header. A real keyframe-only stream at 30 fps is bounded by
# clip length; 1M frames ≈ 9 h of video.
MAX_VIDEO_FRAMES = 1_000_000

FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, n_frames int, w int, h int, "
    "mean_gray double, ok boolean"
)


def encode_video(seed: int, w: int, h: int, n_frames: int) -> bytes:
    return _HDR.pack(VIDEO_MAGIC, n_frames, w, h, seed)


def decode_video_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(n_frames, w, h, seed) or None if not a valid container.

    Enforces the decode-bomb budgets BEFORE any allocation: header
    dims above ``image.MAX_DECODE_PIXELS`` or a frame count above
    ``MAX_VIDEO_FRAMES`` reject the cell (ok=false row downstream),
    the same stance as the image codecs."""
    if b is None or len(b) < _HDR.size:
        return None
    magic, n_frames, w, h, seed = _HDR.unpack_from(b)
    if magic != VIDEO_MAGIC or n_frames <= 0 or w <= 0 or h <= 0:
        return None
    if w * h > MAX_DECODE_PIXELS or n_frames > MAX_VIDEO_FRAMES:
        return None
    return n_frames, w, h, seed


def _decode_frame(seed: int, idx: int, w: int, h: int) -> np.ndarray:
    """The codec seam: replace with PyAV/OpenCV frame extraction."""
    return synth_pixels(seed + idx, w, h)


def sample_frames(videos: DataFrame, stride: int = 10) -> DataFrame:
    """(video_id, bytes) -> one row per sampled frame (idx % stride == 0).

    Arrow-batched explode: each input batch yields a frame-level frame;
    bytes never reach the driver. At corpus scale the row amplification
    is n_frames/stride, so stride is the cost dial — downstream feature
    extraction (image.image_features contract) runs per sampled frame.
    Corrupt/undecodable containers yield one ok=false row (same
    convention as image.decode_stats), never an exception.
    """

    def _op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "video_id": [], "frame_idx": [], "n_frames": [],
                "w": [], "h": [], "mean_gray": [], "ok": [],
            }
            for vid, b in zip(pdf["video_id"], pdf["bytes"]):
                hdr = decode_video_header(b)
                if hdr is None:
                    rows["video_id"].append(vid)
                    rows["frame_idx"].append(-1)
                    rows["n_frames"].append(0)
                    rows["w"].append(0)
                    rows["h"].append(0)
                    rows["mean_gray"].append(float("nan"))
                    rows["ok"].append(False)
                    continue
                n_frames, w, h, seed = hdr
                for idx in range(0, n_frames, stride):
                    px = _decode_frame(seed, idx, w, h)
                    rows["video_id"].append(vid)
                    rows["frame_idx"].append(idx)
                    rows["n_frames"].append(n_frames)
                    rows["w"].append(w)
                    rows["h"].append(h)
                    rows["mean_gray"].append(
                        float(px.astype(np.float64).mean())
                    )
                    rows["ok"].append(True)
            yield pd.DataFrame(rows)

    return videos.select("video_id", "bytes").mapInPandas(
        _op, schema=FRAME_SAMPLE_SCHEMA
    )
