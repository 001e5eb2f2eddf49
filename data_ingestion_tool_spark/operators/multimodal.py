"""Multimodal columns (EXT tier): image/audio/video as opaque binary
payloads + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched stages.

Design for 100 TB of media:

- A media table is ``(media_id, media_type, payload binary, meta
  struct)`` — payloads stay columnar in parquet, metadata is queryable
  without touching bytes (column pruning skips the payload entirely for
  metadata-only queries).
- Byte-touching stages run in ``mapInPandas`` (Arrow batches, executor-
  parallel, bounded by ``maxRecordsPerBatch``); nothing ever collects
  payloads to the driver.
- The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container,
  so decoding is **stubbed**: with ``strict=True`` the stage raises
  ``MediaCodecMissing``; by default it produces a deterministic fake
  decode derived from the payload bytes (stable across runs/executors),
  so the plumbing — schema, batching, partitioning — is fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, payload binary, "
    "meta struct<source:string, width:int, height:int, duration_ms:int, "
    "sample_rate:int>"
)


class MediaCodecMissing(NotImplementedError):
    pass


def media_table_from_files(
    spark: SparkSession, path_glob: str, media_type: str
) -> DataFrame:
    """binaryFile scan → canonical media table. At scale the source is
    a parquet/Delta table with the same schema; this is the landing
    path for raw files."""
    binary = spark.read.format("binaryFile").load(path_glob)
    return binary.select(
        F.col("path").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _try_real_image_decode(payload: bytes):
    try:
        from PIL import Image  # type: ignore
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    except Exception:
        # missing Pillow OR undecodable payload — caller falls back to
        # the deterministic fake (or raises in strict mode)
        return None


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: pixels seeded by payload digest.
    Stable across executors/runs — good enough to exercise schema,
    batch shapes, and downstream math."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_images(
    df: DataFrame,
    *,
    height: int = 32,
    width: int = 32,
    strict: bool = False,
) -> DataFrame:
    """payload → (media_id, height, width, channels, pixels
    array<int>). Real decode if PIL is available; deterministic fake
    otherwise (raises in ``strict`` mode)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column zip, not iterrows: no per-row Series construction
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(raw)
                arr = _try_real_image_decode(payload)
                if arr is None:
                    if strict:
                        raise MediaCodecMissing(
                            "image decoding requires Pillow, which is not "
                            "installed in this environment"
                        )
                    arr = _fake_decode(payload, height, width)
                rows.append(
                    {
                        "media_id": mid,
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "channels": arr.shape[2] if arr.ndim == 3 else 1,
                        "pixels": arr.ravel().astype(np.int32).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "height", "width", "channels", "pixels"],
            )

    return df.select("media_id", "payload").mapInPandas(
        stage,
        "media_id string, height int, width int, channels int, pixels array<int>",
    )


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """payload → unit-norm feature vector array<float>.

    Stub featurizer (payload-digest-seeded gaussian, L2-normalized);
    the real one swaps the inner function for a model forward pass —
    the Spark contract (Arrow batches in, fixed-dim float arrays out)
    is identical.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(raw)
                seed = int.from_bytes(
                    hashlib.sha256(payload).digest()[4:8], "little"
                )
                v = np.random.RandomState(seed).standard_normal(dim)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                ids.append(mid)
                vecs.append(v.tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return df.select("media_id", "payload").mapInPandas(
        stage, "media_id string, embedding array<float>"
    )


def resize_images(
    df: DataFrame,
    *,
    src_height: int = 32,
    src_width: int = 32,
    out_height: int = 8,
    out_width: int = 8,
    strict: bool = False,
) -> DataFrame:
    """payload → decoded (stub) → nearest-neighbor resize →
    (media_id, height, width, channels, pixels). Same Arrow-batched
    shape contract as decode; the real path swaps the interpolation
    kernel, not the Spark plumbing."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = (np.arange(out_height) * src_height) // out_height
        xs = (np.arange(out_width) * src_width) // out_width
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(raw)
                arr = _try_real_image_decode(payload)
                if arr is None:
                    if strict:
                        raise MediaCodecMissing(
                            "image decoding requires Pillow, which is not "
                            "installed in this environment"
                        )
                    arr = _fake_decode(payload, src_height, src_width)
                small = arr[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": mid,
                        "height": small.shape[0],
                        "width": small.shape[1],
                        "channels": small.shape[2] if small.ndim == 3 else 1,
                        "pixels": small.ravel().astype(np.int32).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "height", "width", "channels", "pixels"],
            )

    return df.select("media_id", "payload").mapInPandas(
        stage,
        "media_id string, height int, width int, channels int, pixels array<int>",
    )


def decode_audio(
    df: DataFrame, *, sample_rate: int = 16000, strict: bool = False
) -> DataFrame:
    """audio payload → (media_id, sample_rate, n_samples, rms, zcr).

    Stubbed codec (no soundfile/ffmpeg in this container): a
    deterministic payload-seeded waveform whose length follows
    meta.duration_ms, so sample counts are checkable in SQL while the
    waveform statistics (RMS, zero-crossing rate) exercise the real
    Arrow-batched numerics path.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw, raw_duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if strict:
                    raise MediaCodecMissing(
                        "audio decoding requires soundfile/ffmpeg, not "
                        "installed in this environment"
                    )
                duration = 3000 if pd.isna(raw_duration) else int(raw_duration)
                n = (duration * sample_rate) // 1000
                payload = bytes(raw)
                seed = int.from_bytes(
                    hashlib.sha256(payload).digest()[8:12], "little"
                )
                wave = np.random.RandomState(seed).standard_normal(n)
                rms = float(np.sqrt(np.mean(wave**2))) if n else 0.0
                zcr = (
                    float(np.mean(np.diff(np.signbit(wave)) != 0)) if n > 1 else 0.0
                )
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": sample_rate,
                        "n_samples": n,
                        "rms": round(rms, 6),
                        "zcr": round(zcr, 6),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "rms", "zcr"],
            )

    return df.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(
        stage,
        "media_id string, sample_rate int, n_samples long, rms double, zcr double",
    )


def sample_frames(
    df: DataFrame, *, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """video payload → one row per sampled frame (frame_idx, ts_ms,
    payload hash as the stand-in frame handle). Stubbed timing model:
    duration from meta, frames at ``every_ms`` intervals."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw, raw_duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if strict:
                    raise MediaCodecMissing(
                        "video frame sampling requires ffmpeg bindings, "
                        "not installed in this environment"
                    )
                duration = 3000 if pd.isna(raw_duration) else raw_duration
                payload = bytes(raw)
                digest = hashlib.sha256(payload).hexdigest()
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame_ref": f"{digest[:16]}:{i}",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_ref"]
            )

    return df.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(
        stage,
        "media_id string, frame_idx int, ts_ms int, frame_ref string",
    )


# --------------------------------------------------------------------------
# Registry queries: the driver testdata has no raw media files, so the
# media table is synthesized from ``documents`` (text bytes as payload,
# duration derived from n_chars). The shape/timing columns of every
# stage ARE SQL-expressible, so the DuckDB oracle checks the full
# mapInPandas plumbing row-for-row; only the byte-derived columns
# (pixels, embeddings, frame digests) fall back to rows-only checks.
# --------------------------------------------------------------------------

#: duration model for the synthetic video payloads (ms)
_DUR_BASE = 500
_DUR_MOD = 3000
_FRAME_EVERY_MS = 1000


def media_table_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → canonical media table: text bytes as the opaque
    payload, duration derived deterministically from n_chars."""
    from data_ingestion_tool_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.lit(_DUR_BASE) + F.col("n_chars") % _DUR_MOD)
            .cast("int")
            .alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def media_decode_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every payload (stub codec), return the per-media shape
    row — verifies one-output-row-per-media and the batch schema."""
    media = media_table_from_documents(spark, sf_dir)
    return decode_images(media).select("media_id", "height", "width", "channels")


MEDIA_DECODE_SHAPES_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(32 AS INT) AS height,
       CAST(32 AS INT) AS width,
       CAST(3 AS INT) AS channels
FROM documents
"""


def media_feature_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Featurize every payload, return (media_id, dim, l2_norm): the
    featurizer contract is fixed-dim unit-norm vectors, both checkable
    in SQL even though the vector values aren't."""
    media = media_table_from_documents(spark, sf_dir)
    feats = extract_features(media, dim=64)
    v = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(dot), 3).alias("l2_norm"),
    )


MEDIA_FEATURE_NORMS_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(64 AS INT) AS dim,
       CAST(1.0 AS DOUBLE) AS l2_norm
FROM documents
"""


def media_resize_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize to 8×8; the shape contract is
    the oracle-checked surface."""
    media = media_table_from_documents(spark, sf_dir)
    return resize_images(media).select(
        "media_id", "height", "width", "channels"
    )


MEDIA_RESIZE_SHAPES_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(8 AS INT) AS height,
       CAST(8 AS INT) AS width,
       CAST(3 AS INT) AS channels
FROM documents
"""


def media_audio_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every synthetic audio payload; the sample-count grid
    (duration model × sample rate) is the oracle-checked surface, the
    waveform stats are rows-only by nature."""
    media = media_table_from_documents(spark, sf_dir)
    return decode_audio(media, sample_rate=16000).select(
        "media_id", "sample_rate", "n_samples"
    )


MEDIA_AUDIO_SAMPLES_SQL = f"""
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(16000 AS INT) AS sample_rate,
       CAST((({_DUR_BASE} + n_chars % {_DUR_MOD}) * 16000) // 1000 AS BIGINT)
           AS n_samples
FROM documents
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample frames at a fixed interval from every synthetic video;
    the (media_id, frame_idx, ts_ms) timing grid is the oracle-checked
    surface (frame_ref digests are rows-only)."""
    media = media_table_from_documents(spark, sf_dir)
    return sample_frames(media, every_ms=_FRAME_EVERY_MS).select(
        "media_id", "frame_idx", "ts_ms"
    )


MEDIA_FRAME_SAMPLE_SQL = f"""
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(ts / {_FRAME_EVERY_MS} AS INT) AS frame_idx,
       CAST(ts AS INT) AS ts_ms
FROM (
  SELECT doc_id,
         unnest(generate_series(
           0, {_DUR_BASE} + n_chars % {_DUR_MOD} - 1, {_FRAME_EVERY_MS}
         )) AS ts
  FROM documents
)
"""


def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media rollup: per-type counts and duration stats
    WITHOUT touching payload bytes — the reason the media table keeps
    typed metadata beside the opaque payload. Plan-asserted: the
    parquet ReadSchema excludes ``payload``, so at 100 TB of video
    this scans kilobytes of metadata, not the corpus."""
    m = media_table_from_documents(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("meta.duration_ms").cast("long")).alias("total_ms"),
        F.max("meta.duration_ms").alias("max_ms"),
    )


MEDIA_METADATA_STATS_SQL = f"""
SELECT 'video' AS media_type,
       COUNT(*) AS n_items,
       CAST(SUM({_DUR_BASE} + n_chars % {_DUR_MOD}) AS BIGINT) AS total_ms,
       CAST(MAX({_DUR_BASE} + n_chars % {_DUR_MOD}) AS INT) AS max_ms
FROM documents
"""


def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: md5 over the raw payload BYTES — duplicates
    are found without ever decoding (the first pass every multimodal
    corpus pipeline runs; decode-free means the codec tier never sees
    redundant bytes). Canonical member = lexicographically-lowest
    media_id per digest (media ids are opaque strings at scale, so
    string order IS the deterministic choice; mirrored in the oracle).

    Scale shape: one hash-aggregate on the 16-byte digest — the
    payload column is read once, the shuffle carries digests + ids
    only, never payload bytes."""
    m = media_table_from_documents(spark, sf_dir)
    return (
        m.select("media_id", F.md5(F.col("payload")).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


MEDIA_DEDUP_EXACT_SQL = """
SELECT md5(text) AS digest,
       MIN(CAST(doc_id AS VARCHAR)) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


#: Feature-space near-dup threshold: the stub featurizer maps equal
#: payloads to identical unit vectors and distinct payloads to
#: independent gaussians (cosine ~N(0, 1/√d)), so the bar can sit
#: high; a real model's threshold would be tuned on labeled pairs.
_MEDIA_NEAR_DUP_COSINE = 0.98


def media_near_dup_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection for media: payload →
    feature embedding (the Arrow-batched featurizer stage — a
    deterministic stub here, a model forward pass in production) →
    exact cosine pairs via the SAME grid-blocked BLAS kernel as the
    embedding and activity-profile near-dups
    (:func:`~data_ingestion_tool_spark.operators.similarity.blocked_cosine_pairs`).

    This is the second pass of a multimodal dedup pipeline:
    :func:`media_dedup_exact` removes byte-identical copies without
    decoding; THIS operator catches re-encoded/resized variants that
    hash differently but embed nearby. Feature bytes never shuffle
    raw payloads — the featurizer projects each payload to d floats
    map-side, and only (id, vector) rows enter the pair search.

    media ids here are numeric doc ids; at scale an opaque string id
    takes an ``xxhash64`` surrogate for the kernel's block arithmetic.
    Rows-only driver check (the stub featurizer is not
    SQL-expressible); planted-duplicate pytest."""
    from data_ingestion_tool_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    media = media_table_from_documents(spark, sf_dir)
    feats = extract_features(media).select(
        F.col("media_id").cast("long").alias("mid"), "embedding"
    )
    pairs = blocked_cosine_pairs(
        feats,
        id_col="mid",
        vec_col="embedding",
        threshold=_MEDIA_NEAR_DUP_COSINE,
    )
    return pairs.select(
        F.col("id_a").alias("media_a"), F.col("id_b").alias("media_b")
    )


def multimodal_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed multimodal curation flagship — the media twin of
    ``corpus_prep_pipeline``, one lazy plan end to end:

    1. exact dedup WITHOUT decoding (md5 digest keep-lowest — raw
       payload bytes never shuffle);
    2. feature-space near-dup on the survivors (Arrow featurizer +
       the shared blocked GEMM kernel), keep-lowest drop rule (a
       member pairing with ANY smaller id is dropped — the same
       non-iterative rule ``semantic_dedup`` uses, deliberately not
       transitive-closure);
    3. curated output rows with the metadata a training manifest
       needs (id, type, duration).

    Deterministic end to end (digest min, stub featurizer, id-ordered
    drop rule) → stable row set; rows-only driver check (the
    featurizer is not SQL-expressible), planted-corpus pytest."""
    m = media_table_from_documents(spark, sf_dir)
    canonical = (
        m.select("media_id", F.md5(F.col("payload")).alias("digest"))
        .groupBy("digest")
        .agg(F.min("media_id").alias("media_id"))
        .select("media_id")
    )
    survivors = m.join(canonical, "media_id", "left_semi")
    # feature near-dup over the exact-dedup survivors
    from data_ingestion_tool_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    feats = extract_features(survivors).select(
        F.col("media_id").cast("long").alias("mid"), "embedding"
    )
    drops = (
        blocked_cosine_pairs(
            feats,
            id_col="mid",
            vec_col="embedding",
            threshold=_MEDIA_NEAR_DUP_COSINE,
        )
        .select(F.col("id_b").cast("string").alias("media_id"))
        .distinct()
    )
    return (
        survivors.join(drops, "media_id", "left_anti")
        .select(
            "media_id",
            "media_type",
            F.col("meta.duration_ms").alias("duration_ms"),
        )
    )


def _specs():
    from data_ingestion_tool_spark.operators.base import QuerySpec

    return [
        QuerySpec("media_metadata_stats", media_metadata_stats,
                  MEDIA_METADATA_STATS_SQL,
                  "metadata-only media rollup (payload column never read)",
                  ("multimodal", "agg")),
        QuerySpec("media_dedup_exact", media_dedup_exact,
                  MEDIA_DEDUP_EXACT_SQL,
                  "decode-free exact payload dedup (md5 digest hash-agg)",
                  ("multimodal", "dedup")),
        QuerySpec("media_decode_shapes", media_decode_shapes,
                  MEDIA_DECODE_SHAPES_SQL,
                  "binary payload → decoded image shape (mapInPandas stub codec)",
                  ("multimodal",)),
        QuerySpec("media_feature_norms", media_feature_norms,
                  MEDIA_FEATURE_NORMS_SQL,
                  "payload → unit-norm feature vector contract",
                  ("multimodal",)),
        QuerySpec("media_audio_samples", media_audio_samples,
                  MEDIA_AUDIO_SAMPLES_SQL,
                  "audio decode: sample-count grid contract",
                  ("multimodal",)),
        QuerySpec("media_resize_shapes", media_resize_shapes,
                  MEDIA_RESIZE_SHAPES_SQL,
                  "decode + nearest-neighbor resize shape contract",
                  ("multimodal",)),
        QuerySpec("media_frame_sample", media_frame_sample,
                  MEDIA_FRAME_SAMPLE_SQL,
                  "video payload → fixed-interval frame grid",
                  ("multimodal",)),
        QuerySpec("media_near_dup_features", media_near_dup_features, None,
                  "feature-space media near-dup via the blocked kernel",
                  ("multimodal", "dedup", "similarity")),
        QuerySpec("multimodal_prep_pipeline", multimodal_prep_pipeline, None,
                  "composed media curation: exact dedup → feature "
                  "near-dup → manifest rows, one plan",
                  ("multimodal", "dedup", "flagship")),
    ]


SPECS = _specs()
