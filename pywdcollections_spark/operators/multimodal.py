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


def _pillow():
    """Import-time codec probe: Pillow when the environment has it,
    None in this container (no codecs baked in). The probe — not an
    edit — is what switches extract_media_features(real_codec=True)
    from failing fast to real decodes in production."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _decode_image(payload: bytes, real_codec: bool = False):
    """Decode core. real_codec=True decodes with Pillow (grayscale
    pixel statistics over 8 equal chunks — the same 8-dim feature
    contract as the fake path, so downstream schemas are identical);
    without Pillow it raises rather than silently returning fake
    features for a real image. real_codec=False is the deterministic
    stand-in (dims from the first 4 header bytes, features from raw
    byte statistics) that keeps the plumbing testable in-sandbox."""
    if real_codec:
        Image = _pillow()
        if Image is None:
            raise NotImplementedError(
                "real image decode requires Pillow; container has no codecs")
        import io
        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        px = np.asarray(img.convert("L"), dtype=np.uint8).ravel()
        chunks = np.array_split(px, 8) if px.size else [np.array([])] * 8
        feat = [float(round(float(c.mean()) if c.size else 0.0, 4)) for c in chunks]
        return h, w, feat
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


def extract_media_features(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """media table -> per-item feature rows (Arrow-batched).

    ``real_codec=True`` routes every payload through the Pillow decode
    seam (_decode_image): decoding a real image is inherently per-item,
    so that path loops rows inside the Arrow batch — the batching still
    amortizes the Python crossing, which is where the cost sits at
    scale. The default fake decoder is vectorized with numpy over the
    batch: payloads are grouped by byte length and each group decodes
    as one stacked 2-D uint8 matrix (header slice + chunked column
    means), so the Python work per batch is O(groups), not O(rows)."""
    cols = [f.name for f in FEATURE_SCHEMA]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            if real_codec:
                rows = []
                for mid, kind, p in zip(pdf["media_id"], pdf["kind"],
                                        pdf["payload"]):
                    got = _decode_image(bytes(p), real_codec=True)
                    if got is None:
                        continue
                    h, w, feat = got
                    rows.append({"media_id": int(mid), "kind": kind,
                                 "height": np.int32(h), "width": np.int32(w),
                                 "n_bytes": np.int64(len(bytes(p))),
                                 "feature": np.asarray(feat, dtype=np.float32)})
                yield (pd.DataFrame(rows, columns=cols) if rows
                       else pd.DataFrame(columns=cols))
                continue
            arrs = [np.frombuffer(bytes(p), dtype=np.uint8) for p in pdf["payload"]]
            by_len: dict[int, list[int]] = {}
            for row_i, a in enumerate(arrs):
                if a.size >= 4:               # same skip rule as _decode_image
                    by_len.setdefault(a.size, []).append(row_i)
            frames = []
            for size, idxs in by_len.items():
                m = np.stack([arrs[i] for i in idxs]).astype(np.int64)
                body = m[:, 4:]
                # np.array_split(…, 8) semantics: first (size-4)%8 chunks
                # get the extra column; empty chunks contribute 0.0
                chunk_means = [
                    c.mean(axis=1) if c.shape[1] else np.zeros(len(idxs))
                    for c in np.array_split(body, 8, axis=1)]
                feat = np.round(np.stack(chunk_means, axis=1), 4)
                sub = pdf.iloc[idxs]
                frames.append(pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "kind": sub["kind"].to_numpy(),
                    "height": (m[:, 0] * 256 + m[:, 1]).astype(np.int32),
                    "width": (m[:, 2] * 256 + m[:, 3]).astype(np.int32),
                    "n_bytes": np.int64(size),
                    "feature": list(feat.astype(np.float32)),
                }))
            yield (pd.concat(frames, ignore_index=True)[cols] if frames
                   else pd.DataFrame(columns=cols))

    return (media.repartition(F.col("media_id"))
            .mapInPandas(run, schema=FEATURE_SCHEMA))


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("offset", T.LongType()),       # byte offset into payload
    T.StructField("frame_bytes", T.IntegerType()),
    T.StructField("mean", T.DoubleType()),       # per-frame byte mean
])


def sample_frames(media: DataFrame, frame_bytes: int = 8, stride: int = 2,
                  header: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: the body after
    ``header`` is treated as fixed-size frame records and every
    ``stride``-th frame is emitted with its byte statistics. A real
    deployment decodes frames with ffmpeg here (not in this container —
    same stub policy as _decode_image); the Spark side — schema, Arrow
    batching, vectorized numpy slicing, per-media partitioning — is
    real and oracle-checked (queries.multimodal_frame_sample)."""
    cols = [f.name for f in FRAME_SCHEMA]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames_out = []
            by_len: dict[int, list[int]] = {}
            arrs = [np.frombuffer(bytes(p), dtype=np.uint8) for p in pdf["payload"]]
            for row_i, a in enumerate(arrs):
                if a.size >= header + frame_bytes:
                    by_len.setdefault(a.size, []).append(row_i)
            for size, idxs in by_len.items():
                m = np.stack([arrs[i] for i in idxs]).astype(np.int64)
                body = m[:, header:]
                n_frames = body.shape[1] // frame_bytes
                fr = body[:, :n_frames * frame_bytes] \
                    .reshape(len(idxs), n_frames, frame_bytes)
                means = np.round(fr.mean(axis=2), 4)       # (g, n_frames)
                sel = np.arange(0, n_frames, stride)
                mids = pdf["media_id"].to_numpy()[idxs]
                for k in sel:
                    frames_out.append(pd.DataFrame({
                        "media_id": mids,
                        "frame_idx": np.int32(k),
                        "offset": np.int64(header + k * frame_bytes),
                        "frame_bytes": np.int32(frame_bytes),
                        "mean": means[:, k],
                    }))
            yield (pd.concat(frames_out, ignore_index=True)[cols] if frames_out
                   else pd.DataFrame(columns=cols))

    return (media.repartition(F.col("media_id"))
            .mapInPandas(run, schema=FRAME_SCHEMA))


def resize_media(media: DataFrame, max_body_bytes: int = 16,
                 header: int = 4) -> DataFrame:
    """Resize/decimate plumbing: the payload body is downsampled to at
    most ``max_body_bytes`` by taking every k-th byte (k =
    ceil(body/max)) — the deterministic stand-in for a real image
    resize (Pillow, stubbed per module policy). Output keeps the
    MEDIA_SCHEMA shape so it composes with extract_media_features.

    Vectorized like its siblings: payloads group by byte length, each
    group decimates as ONE stacked matrix slice (``[:, ::k]`` — every
    row of a group shares k), so numpy work per batch is O(groups);
    the only per-row Python left is re-materializing the payload bytes
    and the constant-size meta struct."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            arrs = [np.frombuffer(bytes(p), dtype=np.uint8) for p in pdf["payload"]]
            by_len: dict[int, list[int]] = {}
            for row_i, a in enumerate(arrs):
                by_len.setdefault(a.size, []).append(row_i)
            outs: list[bytes | None] = [None] * len(pdf)
            for size, idxs in by_len.items():
                m = np.stack([arrs[i] for i in idxs])          # (g, size)
                head, body = m[:, :header], m[:, header:]
                if body.shape[1] > max_body_bytes:
                    k = int(np.ceil(body.shape[1] / max_body_bytes))
                    body = body[:, ::k]
                resized = np.concatenate([head, body], axis=1)
                for j, i in enumerate(idxs):
                    outs[i] = resized[j].tobytes()
            out = pdf.copy()
            out["payload"] = outs
            out["meta"] = [{**m, "n_bytes": len(b)}
                           for m, b in zip(pdf["meta"], outs)]
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


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
