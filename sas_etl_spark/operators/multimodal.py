"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.9 #56; driver-mandated).

Model: a modality is a struct column
    struct(payload: binary, mime: string, meta: map<string,string>)
carried alongside relational columns. Decode / feature-extraction run
as Arrow-batched pandas iterators (mapInPandas) — the ONLY sanctioned
Python hot path in the engine (SURVEY.md §2.11) — so each task
processes whole record batches, never rows.

The container image has no image/audio codecs, so ``decode`` is
STUBBED: real decoding raises NotImplementedError behind an
import-try (PIL/soundfile), and the deterministic fake path
(hash-derived features) keeps the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

#: Gated real decoders: absent in this image by design.
try:  # pragma: no cover - exercised only where codecs exist
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_fake_payload(df: DataFrame, key_col: str, mime: str = "image/fake") -> DataFrame:
    """Deterministic stand-in binary payload per row (sha256 stream of
    the key) + modality struct. Real pipelines replace this with
    sources.read_binary_dir output joined on the key."""
    payload = F.sha2(F.col(key_col).cast("string"), 256).cast("binary")
    return df.withColumn(
        "media",
        F.struct(
            payload.alias("payload"),
            F.lit(mime).alias("mime"),
            F.create_map(F.lit("origin"), F.lit("synthetic")).alias("meta"),
        ),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — requires a codec library the v1 image lacks."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; v1 container ships no codecs — "
            "use extract_features (deterministic fake) for plumbing tests"
        )
    raise NotImplementedError("PIL present but decode intentionally deferred")


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic hash-derived feature vector (stub for the model
    forward pass). Stable across runs, partitions, and engines."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    df: DataFrame, media_col: str = "media", out_col: str = "features", dim: int = FEATURE_DIM
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Batch shape contract: the iterator yields pandas DataFrames whose
    rows align with the input batch; we append an array<double> column
    and pass every other column through untouched.

    The batch closure is deliberately self-contained (imports inside,
    no module-level references): cloudpickle then ships it by value,
    so executors never need sas_etl_spark importable — the engine may
    be driven from any cwd (session.configure additionally ships the
    package zip for UDFs that do close over module code).
    """
    out_schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out_col} array<double>"

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def feats(p: bytes) -> list[float]:
            h = _hashlib.sha256(p).digest()
            return [b / 255.0 for b in h[:dim]]

        for pdf in batches:
            payloads = pdf[media_col].map(lambda m: bytes(m["payload"]))
            pdf = pdf.copy()
            pdf[out_col] = payloads.map(feats)
            yield pdf

    return df.mapInPandas(per_batch, schema=out_schema)
