"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The real codecs (Pillow/ffmpeg/torchaudio) are
NOT in this container, so the decode core is STUBBED: ``_decode_image``
raises NotImplementedError when a real codec is requested and the
deterministic fake decoder (header-derived dims + byte-statistics
features) stands in so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image|audio|video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source_url", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # 8-dim byte-stat embedding
])


def _decode_image(payload: bytes, real_codec: bool = False):
    """STUB: a real deployment decodes with Pillow here."""
    if real_codec:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode requires Pillow; container has no codecs") from exc
        raise NotImplementedError("real codec path not wired in this sandbox")
    # deterministic fake: dims from the first 4 bytes, features from
    # byte statistics over 8 equal chunks
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size < 4:
        return None
    h = int(arr[0]) * 256 + int(arr[1])
    w = int(arr[2]) * 256 + int(arr[3])
    chunks = np.array_split(arr[4:], 8) if arr.size > 4 else [np.array([0])] * 8
    feat = [float(round(float(c.mean()) if c.size else 0.0, 4)) for c in chunks]
    return h, w, feat


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-item feature rows (Arrow-batched)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                got = _decode_image(bytes(r["payload"]))
                if got is None:
                    continue
                h, w, feat = got
                rows.append({"media_id": r["media_id"], "kind": r["kind"],
                             "height": h, "width": w,
                             "n_bytes": len(r["payload"]), "feature": feat})
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return (media.repartition(F.col("media_id"))
            .mapInPandas(run, schema=FEATURE_SCHEMA))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = bytes([(i >> 8) & 255, i & 255, (i * 3) & 255, (i * 7) & 255]) \
                    + bytes([(i * j) % 251 for j in range(64)])
                rows.append({"media_id": i, "kind": "image", "payload": payload,
                             "meta": {"mime": "image/fake", "n_bytes": len(payload),
                                      "source_url": f"https://m.fixture/{i}"}})
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
