"""Multimodal column support (SURVEY.md §2.13 X5; BASELINE.json
north_star): image/audio/video as opaque `binary` payload columns with
typed metadata, processed by Arrow-batched pandas transforms.

Real codecs (PIL/ffmpeg/librosa) are not in this container, so the
*decode* steps are deterministic fakes clearly marked as stubs: payload
bytes are generated / interpreted through md5-based byte streams, and
`decode_real` raises NotImplementedError where a codec would plug in.
Everything Spark-side — schemas, mapInPandas signatures, batch shapes,
partitioning — is real and tested (tests/test_multimodal.py).

Scale notes: payloads stay opaque binary end-to-end (no base64, no
per-row Python round trips outside Arrow batches); metadata lives in a
struct column so pruning works; decode/feature stages are mapInPandas so
each task processes whole Arrow batches and the 100 TB form is
"partition by content hash, decode once, write features columnar".
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def decode_real(payload: bytes, kind: str):
    """The codec seam. In production: PIL.Image.open / av.open / soundfile.
    Not available in this environment."""
    raise NotImplementedError(
        "real media codecs (PIL/av/soundfile) are not installed; "
        "use the deterministic fake decoders"
    )


def _fake_bytes(seed: bytes, n: int) -> bytes:
    """Deterministic byte stream: md5 in counter mode."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(seed + i.to_bytes(4, "big")).digest())
        i += 1
    return bytes(out[:n])


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: payload bytes are
    a deterministic function of the text (STUB for reading real files via
    spark.read.format('binaryFile'))."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                kind = kinds[doc_id % 3]
                seed = hashlib.md5(text.encode()).digest()
                w = 16 + (seed[0] % 16)
                h = 16 + (seed[1] % 16)
                dur = 1000 + seed[2] * 100
                payload = _fake_bytes(seed, 256)
                rows.append(
                    (
                        int(doc_id),
                        kind,
                        payload,
                        {
                            "width": w if kind == "image" else None,
                            "height": h if kind == "image" else None,
                            "duration_ms": dur if kind != "image" else None,
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_and_featurize(media: DataFrame, n_features: int = 4) -> DataFrame:
    """Decode (fake) + feature-extract: payload -> fixed-width feature
    vector. Feature i = hex digest slice of the payload — stands in for a
    pooled embedding; the Arrow batch shape and output schema are exactly
    what a real encoder stage would use."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("n_bytes", T.IntegerType(), False),
            T.StructField("features", T.ArrayType(T.StringType()), False),
        ]
    )

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": [
                        [d[8 * i : 8 * i + 8] for i in range(n_features)] for d in digests
                    ],
                }
            )

    return media.mapInPandas(feat, schema=out_schema)


def resize_images(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Resize stage (images only): rewrites metadata and (fake-)re-encodes
    the payload to the target size; non-images pass through untouched —
    the filter happens Spark-side so the Python stage only sees images."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = dict(r["meta"])
                w, h = m.get("width"), m.get("height")
                # integer scaling ((w*max)//mx), not float-then-truncate:
                # bit-exact, so the SQL oracle can replay the geometry
                if w and h and max(w, h) > max_side:
                    mx = max(w, h)
                    nw, nh = (w * max_side) // mx, (h * max_side) // mx
                else:
                    nw, nh = w, h
                payload = _fake_bytes(bytes(r["payload"][:16]), nw * nh)
                rows.append((int(r["media_id"]), "image", payload, {"width": nw, "height": nh, "duration_ms": None}))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    images = media.where(F.col("kind") == "image")
    others = media.where(F.col("kind") != "image")
    return images.mapInPandas(rs, schema=MEDIA_SCHEMA).unionByName(others)


def window_audio(
    media: DataFrame, window_ms: int = 500, hop_ms: int = 250
) -> DataFrame:
    """Audio windowing stage (the spectrogram/ASR-prep shape): each audio
    payload expands to overlapping fixed-length windows — starts at
    0, hop, 2·hop, … while start + window ≤ duration. 1→N mapInPandas
    like sample_frames; the (fake) chunk bytes stand in for the PCM
    slice a real decoder would emit."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("win_idx", T.IntegerType(), False),
            T.StructField("start_ms", T.IntegerType(), False),
            T.StructField("duration_ms", T.IntegerType(), False),
            T.StructField("chunk", T.BinaryType(), False),
        ]
    )

    def wa(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = dict(r["meta"]).get("duration_ms") or 0
                for i, start in enumerate(range(0, dur - window_ms + 1, hop_ms)):
                    chunk = _fake_bytes(
                        bytes(r["payload"][:16]) + start.to_bytes(4, "big"), 128
                    )
                    rows.append((int(r["media_id"]), i, start, dur, chunk))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "win_idx", "start_ms", "duration_ms", "chunk"],
            )

    return media.where(F.col("kind") == "audio").mapInPandas(wa, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage (videos): 1→N expansion, one row per sampled
    frame — the UDTF shape (S1 decoder) applied to time media."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = dict(r["meta"]).get("duration_ms") or 0
                for i, ts in enumerate(range(0, dur, every_ms)):
                    frame = _fake_bytes(bytes(r["payload"][:16]) + ts.to_bytes(4, "big"), 64)
                    rows.append((int(r["media_id"]), i, ts, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"])

    return media.where(F.col("kind") == "video").mapInPandas(fs, schema=out_schema)


def patchify_images(media: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch extraction (images only): split each image into a
    ceil(w/p) x ceil(h/p) grid and emit one row per patch with its
    geometry (edge patches are clipped) and a patch signature derived
    from the image seed + grid position — the 1->N Arrow expansion a
    real patch embedder performs before batching patches to the model.
    The non-image filter happens Spark-side so the Python stage only
    sees images (the resize_images discipline)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("patch_row", T.IntegerType(), False),
            T.StructField("patch_col", T.IntegerType(), False),
            T.StructField("patch_w", T.IntegerType(), False),
            T.StructField("patch_h", T.IntegerType(), False),
            T.StructField("patch_sig", T.StringType(), False),
        ]
    )

    def pf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, sig_seed, meta in zip(
                pdf["media_id"], pdf["sig_seed"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                for r in range((h + patch - 1) // patch):
                    for c in range((w + patch - 1) // patch):
                        rows.append(
                            (
                                int(media_id),
                                r,
                                c,
                                min(patch, w - c * patch),
                                min(patch, h - r * patch),
                                hashlib.md5(
                                    f"{sig_seed}:{r}:{c}".encode()
                                ).hexdigest()[:8],
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "patch_row",
                    "patch_col",
                    "patch_w",
                    "patch_h",
                    "patch_sig",
                ],
            )

    return media.where(F.col("kind") == "image").mapInPandas(pf, schema=out_schema)
