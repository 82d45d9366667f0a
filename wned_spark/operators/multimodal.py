"""Multimodal column plumbing: binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as mapInPandas stages.

The container has no image/audio codecs, so the DECODE KERNELS are
deterministic fakes clearly marked below; everything Spark-side —
schemas, batch iteration, partition sizing, UDF signatures — is real
and tested. Swapping ``_fake_decode_*`` for PIL/ffmpeg calls is the
only change a production deployment makes.

Scale notes: binary columns ride Parquet as-is; ``mapInPandas`` streams
Arrow batches so one task never holds more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; decode
stages should run after a repartition sized so (batch_rows x payload)
fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload = seeded bytes."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState(seed + i)
                kind = ["image", "audio", "video"][i % 3]
                payload = rng.bytes(256 + (i % 128))
                rows.append({
                    "media_id": i,
                    "kind": kind,
                    "payload": payload,
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 + i % 64 if kind != "audio" else None,
                    "height": 48 + i % 48 if kind != "audio" else None,
                    "duration_ms": 1000 + i * 10 if kind != "image" else None,
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    # STUB: deterministic fake decode — replace with PIL.Image.open in
    # production. Produces a (h, w) uint8 array derived from the bytes.
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    tiled = np.tile(arr, need // len(arr) + 1)[:need]
    return tiled.reshape(height, width)


FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.
    Feature = per-stripe means of the decoded plane (image), byte-chunk
    means (audio/video) — a stand-in for a real embedding model with
    identical Spark-side shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["kind"].to_numpy(dtype=object)
            payloads = pdf["payload"].to_numpy(dtype=object)
            widths = pdf["width"].to_numpy(dtype=object)
            heights = pdf["height"].to_numpy(dtype=object)
            # decode is inherently per-payload (ragged bytes → plane);
            # everything downstream is batch-vectorized
            planes = [
                _fake_decode_image(p, int(w), int(h)).ravel()
                if k == "image" and w and h
                else np.frombuffer(p, dtype=np.uint8)
                for k, p, w, h in zip(kinds, payloads, widths, heights)
            ]
            n = len(planes)
            if n == 0:
                continue
            lens = np.fromiter((a.size for a in planes), dtype=np.int64, count=n)
            flat = np.concatenate(planes).astype(np.int64)
            row_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # np.array_split boundaries for ALL rows at once: chunk c of
            # a length-L row starts at c*(L//d) + min(c, L%d)
            c = np.arange(feat_dim)
            starts = (
                row_start[:, None]
                + c[None, :] * (lens // feat_dim)[:, None]
                + np.minimum(c[None, :], (lens % feat_dim)[:, None])
            ).ravel()
            total = int(lens.sum())
            chunk_lens = np.diff(starts, append=total)
            if total == 0:
                # every payload empty: np.array_split semantics = all-NaN
                feats = np.full((n, feat_dim), np.nan)
            else:
                # segment sums via prefix-sum differences: exact for
                # zero-length chunks (payloads shorter than feat_dim
                # repeat their boundary index → sum 0) and for boundary
                # indices at len(flat) (trailing empty payload), both of
                # which np.add.reduceat mishandles — a clamped reduceat
                # was measured to truncate the last non-empty chunk's
                # sum whenever the batch ended in an empty payload.
                csum = np.concatenate(([0], np.cumsum(flat)))
                ends = np.append(starts[1:], total)
                sums = csum[ends] - csum[starts]
                with np.errstate(invalid="ignore", divide="ignore"):
                    feats = np.where(
                        chunk_lens > 0, sums / np.maximum(chunk_lens, 1), np.nan
                    ).reshape(n, feat_dim)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": kinds,
                "feature": list(feats),
                "n_bytes": np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n),
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, payload binary"


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 24) -> DataFrame:
    """Resize stage (images only): fake nearest-neighbor downsample of
    the fake-decoded plane; real deployments swap in PIL.resize."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            # column-wise numpy (no per-row pandas): decode + gather
            # per payload — decode-bound by nature, the index grids are
            # shared across every row of the same dimensions via memo
            grid_memo: dict = {}

            def _grid(h: int, w: int):
                g = grid_memo.get((h, w))
                if g is None:
                    ys = np.linspace(0, h - 1, out_h).astype(int)
                    xs = np.linspace(0, w - 1, out_w).astype(int)
                    g = np.ix_(ys, xs)
                    grid_memo[(h, w)] = g
                return g

            out = [
                _fake_decode_image(p, int(w), int(h))[_grid(int(h), int(w))].tobytes()
                for p, w, h in zip(
                    pdf["payload"].to_numpy(dtype=object),
                    pdf["width"].to_numpy(dtype=object),
                    pdf["height"].to_numpy(dtype=object),
                )
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "out_width": out_w,
                "out_height": out_h,
                "payload": out,
            })

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_offset_ms int"


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plan for video rows: emits (frame_idx, offset)
    rows — pure expressions, no decode needed for the plan itself."""
    vids = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int"))
        ).alias("frame_idx"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_offset_ms"))
