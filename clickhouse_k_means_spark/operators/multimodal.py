"""Multimodal columns: images/audio/video as opaque binary + metadata.

Design (the 100 TB-pipeline shape):
- A multimodal table is ``(id bigint, modality string, payload binary,
  meta map<string,string>)`` — payloads stay opaque bytes end-to-end;
  typed metadata travels alongside for pruning/filtering without
  touching bytes.
- Decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow-batched, one Python worker per
  partition, no per-row pickling. The Spark-side plumbing (schemas,
  batch iteration, partitioning) is real and tested.
- The actual media codecs are NOT in this container: ``decode_payload``
  raises ``NotImplementedError`` unless ``deterministic_fake=True``,
  which derives features/frames from the payload bytes' digest — a
  clearly-marked stand-in with the same shapes and dtypes a real
  decoder would produce.

Scale notes: mapInPandas is a narrow transformation — partitioning of
the source is preserved, no shuffle; Arrow transfer is the only
serialization cost. Feature vectors come back as ``array<double>``
ready for the similarity/k-means operators in this engine.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MULTIMODAL_SCHEMA = (
    "id bigint, modality string, payload binary, meta map<string,string>"
)

FEATURE_SCHEMA = "id bigint, modality string, features array<double>"
FRAME_SCHEMA = "id bigint, frame_idx int, frame binary"


def synth_multimodal(
    spark: SparkSession, n: int = 100, payload_bytes: int = 256
) -> DataFrame:
    """Deterministic fake multimodal table for exercising the plumbing.

    Payload = chained md5 digests of (id, chunk_no), concatenated as
    BINARY (string ops like repeat/substring would silently degrade
    the column to string and mangle non-UTF8 bytes). Length rounds up
    to a multiple of 16. Distributed generation via ``spark.range`` —
    no driver-side data.
    """
    reps = (payload_bytes + 15) // 16
    chunks = [
        F.unhex(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{r}"))))
        for r in range(reps)
    ]
    return spark.range(n).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.concat(*chunks).alias("payload"),
        F.create_map(
            F.lit("width"), (F.col("id") % 640 + 32).cast("string"),
            F.lit("height"), (F.col("id") % 480 + 32).cast("string"),
            F.lit("codec"), F.lit("fake/v0"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str, deterministic_fake: bool = False):
    """Decode one payload. STUB: real image/audio/video codecs are not
    available in this container.

    With ``deterministic_fake`` it returns the payload's md5 digest
    bytes — a stand-in decoded buffer that is stable across runs so
    tests can assert end-to-end determinism.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            f"no {modality} codec in this environment; pass "
            "deterministic_fake=True for the test stand-in"
        )
    return hashlib.md5(payload or b"").digest()


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-features in [-1, 1]: bytes of iterated md5
    over the payload's lowercase HEX string (not the raw bytes — DuckDB
    md5 only accepts VARCHAR, and hashing the hex form makes the whole
    chain reproducible in the correctness oracle)."""
    out: list[float] = []
    buf = (payload or b"").hex()
    while len(out) < dim:
        digest = hashlib.md5(buf.encode("ascii")).digest()
        out.extend(b / 127.5 - 1.0 for b in digest)
        buf = digest.hex()
    return out[:dim]


def extract_features(
    df: DataFrame, dim: int = 8, deterministic_fake: bool = True
) -> DataFrame:
    """payload → ``features array<double>`` via Arrow-batched mapInPandas.

    The real pipeline would run the model/codec inside ``_batches``;
    the fake path keeps identical schema, batching, and determinism.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                # fail loudly per batch, same as decode_payload
                raise NotImplementedError("no codecs in this environment")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "features": [
                        _fake_features(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 4, n_frames: int = 3, deterministic_fake: bool = True
) -> DataFrame:
    """video payload → sampled frame rows (1:N explode via mapInPandas).

    Each input row yields ``n_frames`` rows (frame_idx = 0, every_n,
    2·every_n, …); fake frames are digest slices of the payload. Shows
    the row-multiplying UDTF shape (video → frames) with bounded
    batch memory.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                for k in range(n_frames):
                    if not deterministic_fake:
                        raise NotImplementedError("no codecs in this environment")
                    fidx = k * every_n
                    # hex-string hash (not raw bytes) so the oracle can
                    # recompute the frame digest — see _fake_features
                    frame = hashlib.md5(
                        ((payload or b"").hex() + str(fidx)).encode("ascii")
                    ).digest()
                    ids.append(rid)
                    idxs.append(fidx)
                    frames.append(frame)
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.filter(F.col("modality") == "video").mapInPandas(
        _batches, schema=FRAME_SCHEMA
    )


def resize_meta(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Pure-SQL metadata transform: clamp width/height preserving aspect.

    Demonstrates that metadata math needs NO Python: it's a codegen'd
    projection over the map column (the bytes would be resized in a
    mapInPandas stage like ``extract_features`` when codecs exist).
    """
    w = F.col("meta")["width"].cast("double")
    h = F.col("meta")["height"].cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return df.select(
        "id",
        "modality",
        "payload",
        "meta",
        F.round(w * scale).cast("int").alias("resized_w"),
        F.round(h * scale).cast("int").alias("resized_h"),
    )
