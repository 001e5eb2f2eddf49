"""Multimodal plumbing tests: binary ingestion, stubbed decode /
featurize / frame-sample — schema and determinism, no real codecs."""

from __future__ import annotations

from data_ingestion_tool_spark.operators.multimodal import (
    decode_images,
    extract_features,
    media_table_from_files,
    resize_images,
    sample_frames,
)


def _media(spark, tmp_path, n=4):
    for i in range(n):
        (tmp_path / f"img_{i}.bin").write_bytes(bytes([i]) * (100 + i))
    return media_table_from_files(spark, str(tmp_path / "*.bin"), "image")


def test_media_table_schema(spark, tmp_path):
    m = _media(spark, tmp_path)
    assert m.count() == 4
    assert set(m.columns) == {"media_id", "media_type", "payload", "meta"}
    row = m.orderBy("media_id").first()
    assert row["media_type"] == "image"
    assert row["meta"]["source"] == row["media_id"]
    assert len(bytes(row["payload"])) == 100


def test_decode_images_stub_deterministic(spark, tmp_path):
    m = _media(spark, tmp_path)
    a = decode_images(m, height=8, width=8).orderBy("media_id").collect()
    b = decode_images(m, height=8, width=8).orderBy("media_id").collect()
    assert [r["pixels"] for r in a] == [r["pixels"] for r in b]
    assert all(r["height"] == 8 and r["channels"] == 3 for r in a)
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in a)
    # different payloads → different fake pixels
    assert a[0]["pixels"] != a[1]["pixels"]


def test_extract_features_unit_norm(spark, tmp_path):
    import math

    m = _media(spark, tmp_path)
    feats = extract_features(m, dim=16).collect()
    assert all(len(r["embedding"]) == 16 for r in feats)
    for r in feats:
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(norm - 1.0) < 1e-3


def test_resize_images_downsamples_decode(spark, tmp_path):
    m = _media(spark, tmp_path)
    full = {r["media_id"]: r for r in decode_images(m, height=32, width=32).collect()}
    small = {r["media_id"]: r for r in resize_images(m, out_height=8, out_width=8).collect()}
    assert small.keys() == full.keys()
    for mid, r in small.items():
        assert (r["height"], r["width"], r["channels"]) == (8, 8, 3)
        # nearest-neighbor: resized (0,0) pixel == source (0,0) pixel
        assert r["pixels"][:3] == full[mid]["pixels"][:3]


def test_sample_frames_timing(spark, tmp_path):
    m = _media(spark, tmp_path, n=2)
    frames = sample_frames(m, every_ms=1000).collect()
    # stub duration 3000ms → 3 frames per media
    assert len(frames) == 6
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["ts_ms"])
    assert all(sorted(v) == [0, 1000, 2000] for v in per.values())


def test_media_near_dup_features_finds_planted_duplicates(spark, tmp_path):
    """Duplicate payloads embed to identical vectors → must pair;
    distinct payloads (independent gaussian features) must not."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.multimodal import (
        extract_features,
    )
    from data_ingestion_tool_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    rows = [
        (0, b"payload-alpha" * 10),
        (1, b"payload-beta" * 10),
        (2, b"payload-alpha" * 10),   # dup of 0
        (3, b"payload-gamma" * 10),
        (4, b"payload-beta" * 10),    # dup of 1
    ]
    media = spark.createDataFrame(
        [(str(i), p) for i, p in rows], "media_id string, payload binary"
    )
    feats = extract_features(media).select(
        F.col("media_id").cast("long").alias("mid"), "embedding"
    )
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in blocked_cosine_pairs(
            feats, id_col="mid", vec_col="embedding", threshold=0.98
        ).collect()
    )
    assert pairs == [(0, 2), (1, 4)]


def test_media_near_dup_features_runs_on_testdata(spark):
    from data_ingestion_tool_spark.operators.multimodal import (
        media_near_dup_features,
    )

    df = media_near_dup_features(spark, "/root/testdata/sf0.01")
    assert set(df.columns) == {"media_a", "media_b"}
    assert df.count() >= 0


def test_multimodal_prep_pipeline_planted_corpus(spark, tmp_path):
    """Exact dup drops first (keep-lowest digest member), then feature
    near-dups (identical payloads embed identically) — distinct
    payloads all survive."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.multimodal import (
        multimodal_prep_pipeline,
    )

    rows = [
        (0, "alpha doc " * 5),
        (1, "beta doc " * 5),
        (2, "alpha doc " * 5),   # exact dup of 0 → dropped at step 1
        (3, "gamma doc " * 5),
        (4, "beta doc " * 5),    # exact dup of 1 → dropped at step 1
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out = multimodal_prep_pipeline(spark, sf_dir)
    assert set(out.columns) == {"media_id", "media_type", "duration_ms"}
    assert sorted(r["media_id"] for r in out.collect()) == ["0", "1", "3"]


def test_multimodal_prep_pipeline_runs_on_testdata(spark):
    from data_ingestion_tool_spark.operators.multimodal import (
        media_table_from_documents,
        multimodal_prep_pipeline,
    )

    n_in = media_table_from_documents(spark, "/root/testdata/sf0.01").count()
    out = multimodal_prep_pipeline(spark, "/root/testdata/sf0.01")
    n_out = out.count()
    assert 0 < n_out <= n_in
