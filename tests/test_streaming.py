"""Structured Streaming tests: file source → watermark windowed agg →
sink, with availableNow (bounded) triggers; late-data eviction
semantics; streaming/batch result equivalence."""

from __future__ import annotations

import json

import pytest

try:  # transformWithState's state-server protocol dependency
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

from data_ingestion_tool_spark.streaming import (
    dedup_events_stream,
    purchases_after_clicks_stream,
    running_user_totals_stream,
    sessionized_counts_stream,
    stream_events_from_directory,
    stream_ingest,
    windowed_counts_stream,
    write_stream_append,
)


def _write_events(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    p = dirpath / f"batch_{len(list(dirpath.iterdir()))}.json"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EVENTS = [
    {"event_id": 1, "ts": "2024-01-01 10:05:00", "user_id": 1,
     "event_type": "click", "value": 1.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01 10:20:00", "user_id": 1,
     "event_type": "click", "value": 2.0, "props": "{}"},
    {"event_id": 3, "ts": "2024-01-01 11:05:00", "user_id": 2,
     "event_type": "view", "value": 3.0, "props": "{}"},
]

#: Far-future event that pushes the watermark past every window the
#: tests assert on. In append mode a windowed agg only EMITS a window
#: once watermark > window end — without this, availableNow finishes
#: with the asserted windows still open and the sink empty.
SENTINEL = {"event_id": 99, "ts": "2024-01-01 23:59:00", "user_id": 99,
            "event_type": "sentinel", "value": 0.0, "props": "{}"}


def test_windowed_counts_stream(spark, tmp_path):
    src = tmp_path / "stream_src"
    _write_events(src, EVENTS + [SENTINEL])
    stream = stream_events_from_directory(spark, str(src))
    assert stream.isStreaming
    agg = windowed_counts_stream(stream, window="1 hour", watermark="2 hours")
    q = write_stream_append(
        agg,
        checkpoint_dir=str(tmp_path / "ckpt"),
        memory_name="win_counts",
        available_now=True,
    )
    q.awaitTermination(120)
    out = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert out[("2024-01-01 10:00:00", "click")] == 2
    assert out[("2024-01-01 11:00:00", "view")] == 1
    # the sentinel's own window (23:00) is still open at stream end —
    # append mode withholds it: watermark eviction semantics.
    assert ("2024-01-01 23:00:00", "sentinel") not in out


def test_incremental_microbatches_to_table(spark, tmp_path):
    """Two availableNow runs over a growing directory: second run picks
    up ONLY the new file (checkpointed progress), appends to a table."""
    src = tmp_path / "inc_src"
    ckpt = str(tmp_path / "inc_ckpt")
    _write_events(src, EVENTS[:2])
    stream = stream_events_from_directory(spark, str(src))

    def run():
        q = write_stream_append(
            stream.select("event_id", "ts", "event_type"),
            checkpoint_dir=ckpt,
            table_name="stream_events_sink",
            available_now=True,
        )
        q.awaitTermination(120)

    run()
    first = spark.table("stream_events_sink").count()
    assert first == 2
    _write_events(src, EVENTS[2:])
    run()
    assert spark.table("stream_events_sink").count() == 3  # +1, no reprocess


def test_stream_ingest_validates_incrementally(spark, tmp_path):
    """Files stream through the compiled validation into table +
    error table; a second run ingests only the new file."""
    src = tmp_path / "ing_src"
    src.mkdir()
    ckpt = str(tmp_path / "ing_ckpt")
    (src / "f1.csv").write_text("id,amount\n1,10.5\n2,abc\n")
    metadata = {"id": "int", "amount": "float"}

    def run():
        q = stream_ingest(
            spark, str(src), "stream_ingested", metadata,
            checkpoint_dir=ckpt, schema="id string, amount string",
        )
        q.awaitTermination(120)

    run()
    assert spark.table("stream_ingested").count() == 1  # id=1 valid
    assert spark.table("stream_ingested_error").count() == 1  # "abc"
    (src / "f2.csv").write_text("id,amount\n3,7.25\n")
    run()
    ok = {r["id"] for r in spark.table("stream_ingested").collect()}
    assert ok == {1, 3}  # incremental: f1 not reprocessed
    assert spark.table("stream_ingested_error").count() == 1


def test_stream_stream_interval_join(spark, tmp_path):
    """Clicks joined to same-user purchases within 1 hour after."""
    src = tmp_path / "ssj_src"
    rows = [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1,
         "event_type": "click", "value": 0.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 10:30:00", "user_id": 1,
         "event_type": "purchase", "value": 9.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01 13:00:00", "user_id": 1,
         "event_type": "purchase", "value": 9.0, "props": "{}"},  # too late
        {"event_id": 4, "ts": "2024-01-01 10:10:00", "user_id": 2,
         "event_type": "click", "value": 0.0, "props": "{}"},  # no purchase
    ]
    _write_events(src, rows)
    stream = stream_events_from_directory(spark, str(src))
    joined = purchases_after_clicks_stream(stream, within="1 hour")
    q = write_stream_append(
        joined,
        checkpoint_dir=str(tmp_path / "ssj_ckpt"),
        memory_name="ssj_out",
        available_now=True,
    )
    q.awaitTermination(120)
    out = [
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    ]
    assert out == [(1, 1, 2)]


def test_streaming_dedup_drops_watermark_window_dupes(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids inside one
    availableNow run are emitted once."""
    src = tmp_path / "dedup_src"
    dupes = EVENTS + [dict(EVENTS[0], value=99.0)]  # event_id 1 again
    _write_events(src, dupes)
    stream = stream_events_from_directory(spark, str(src))
    deduped = dedup_events_stream(stream, watermark="1 hour")
    q = write_stream_append(
        deduped.select("event_id", "ts", "event_type"),
        checkpoint_dir=str(tmp_path / "dedup_ckpt"),
        memory_name="dedup_out",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]  # the duplicate id-1 row was dropped


def test_stateful_running_totals_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-user running totals survive a query
    restart (checkpointed state), accumulating across availableNow
    runs in update mode."""
    src = tmp_path / "state_src"
    ckpt = str(tmp_path / "state_ckpt")
    _write_events(src, EVENTS[:2])  # user 1: values 1.0, 2.0
    stream = stream_events_from_directory(spark, str(src))
    totals = running_user_totals_stream(stream)

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can,
        # and on local mode it runs in-process so a closure collects
        rows = []
        q = (
            totals.writeStream.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("update")
            .foreachBatch(lambda bdf, _id: rows.extend(bdf.collect()))
            .start()
        )
        q.awaitTermination(120)
        return {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows}

    first = run()
    assert first[1] == (2, 3.0)

    _write_events(src, EVENTS[2:])  # user 2: value 3.0 — new batch
    _write_events(src, [dict(EVENTS[0], event_id=10, value=5.0)])  # user 1 again
    second = run()
    # user 1's state carried over the restart: 2 prior + 1 new
    assert second[1] == (3, 8.0)
    assert second[2] == (1, 3.0)


def test_sessionized_stream_matches_batch_semantics(spark, tmp_path):
    src = tmp_path / "sess_src"
    _write_events(src, EVENTS + [SENTINEL])
    stream = stream_events_from_directory(spark, str(src))
    agg = sessionized_counts_stream(stream, gap="30 minutes")
    q = write_stream_append(
        agg,
        checkpoint_dir=str(tmp_path / "sess_ckpt"),
        memory_name="sessions_out",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    by_user = {r["user_id"]: r["n_events"] for r in rows}
    # user 1: events 15min apart merge into one session of 2
    assert by_user == {1: 2, 2: 1}


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas state protocol needs google.protobuf "
    "(absent in this sandbox); operator gated on the same import",
)
def test_transform_with_state_high_watermark(spark, tmp_path):
    """transformWithStateInPandas (Spark-4 typed-state API): alerts
    fire only on new per-user maxima, and the ValueState survives a
    checkpointed restart."""
    from data_ingestion_tool_spark.streaming.streams import (
        high_watermark_alerts_stream,
    )

    src = tmp_path / "hwm_src"
    ckpt = str(tmp_path / "hwm_ckpt")
    _write_events(src, EVENTS[:2])  # user 1: 1.0 then 2.0 (same batch)
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_events_from_directory(spark, str(src))
        alerts = high_watermark_alerts_stream(stream)

        def run():
            rows = []
            q = (
                alerts.writeStream.option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .outputMode("update")
                .foreachBatch(lambda bdf, _id: rows.extend(bdf.collect()))
                .start()
            )
            q.awaitTermination(120)
            return rows

        first = run()
        assert {(r["user_id"], r["high_value"]) for r in first} == {(1, 2.0)}

        # lower value -> no alert; higher value -> alert (state recovered)
        _write_events(src, [dict(EVENTS[0], event_id=11, value=1.5)])
        _write_events(src, [dict(EVENTS[0], event_id=12, value=9.0)])
        second = run()
        out = {(r["user_id"], r["high_value"]) for r in second}
        assert (1, 9.0) in out
        assert not any(hv < 9.0 for (_u, hv) in out)
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: stateless per-micro-batch broadcast against
    a static dimension; unmatched users keep null attributes (left)."""
    from data_ingestion_tool_spark.streaming import enriched_events_stream

    src = tmp_path / "enrich_src"
    _write_events(src, EVENTS)
    dim = spark.createDataFrame(
        [(1, "gold"), (3, "silver")], "user_id long, tier string"
    )
    stream = stream_events_from_directory(spark, str(src))
    enriched = enriched_events_stream(stream, dim)
    assert enriched.isStreaming
    q = write_stream_append(
        enriched,
        checkpoint_dir=str(tmp_path / "enrich_ckpt"),
        memory_name="enriched_events",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = {
        r["event_id"]: r["tier"]
        for r in spark.sql("SELECT * FROM enriched_events").collect()
    }
    assert rows == {1: "gold", 2: "gold", 3: None}


def test_incremental_sketch_reach_across_batches(spark, tmp_path):
    """Sketch-state streaming: micro-batches merge per-type HLL
    sketches into a persisted KB-scale state table; estimates equal
    exact distincts at these cardinalities, overlapping users are NOT
    double-counted across batches, and a second availableNow run
    (new data landing later) keeps converging."""
    from data_ingestion_tool_spark.streaming import (
        incremental_reach_stream,
        read_reach_state,
    )

    src = tmp_path / "reach_src"
    state = str(tmp_path / "reach_state")
    ck = str(tmp_path / "reach_ck")
    _write_events(src, EVENTS)  # users: click {1}, view {2}
    stream = stream_events_from_directory(spark, str(src))
    q = incremental_reach_stream(
        stream, checkpoint_dir=ck, state_dir=state
    )
    q.awaitTermination(60)
    est = {r["event_type"]: r["est_users"] for r in read_reach_state(spark, state).collect()}
    assert est == {"click": 1, "view": 1}

    # second wave: user 1 clicks AGAIN (overlap — must not double
    # count), user 3 clicks for the first time
    _write_events(
        src,
        [
            {"event_id": 10, "ts": "2024-01-01 12:00:00", "user_id": 1,
             "event_type": "click", "value": 1.0, "props": "{}"},
            {"event_id": 11, "ts": "2024-01-01 12:01:00", "user_id": 3,
             "event_type": "click", "value": 1.0, "props": "{}"},
        ],
    )
    stream2 = stream_events_from_directory(spark, str(src))
    q2 = incremental_reach_stream(
        stream2, checkpoint_dir=ck, state_dir=state
    )
    q2.awaitTermination(60)
    est2 = {r["event_type"]: r["est_users"] for r in read_reach_state(spark, state).collect()}
    assert est2 == {"click": 2, "view": 1}


def test_vector_index_stream_keeps_index_fresh(spark, tmp_path):
    """Streaming IVF maintenance: vectors arriving as files are
    appended into the partitioned index per micro-batch; after the
    stream drains, the index equals a from-scratch assignment of the
    full corpus with the original quantizer."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        _ivf_assign,
        build_ivf_index,
        load_ivf_centroids,
    )
    from data_ingestion_tool_spark.sources.tables import load_table
    from data_ingestion_tool_spark.streaming.streams import (
        vector_index_stream,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, "/root/testdata/sf0.001", idx)
    cents = load_ivf_centroids(spark, idx)
    base = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    new1 = base.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                       "embedding")
    new2 = base.select((F.col("vec_id") + 2_000_000).alias("vec_id"),
                       "embedding")
    new1.write.parquet(str(inbox / "batch1"))
    new2.write.parquet(str(inbox / "batch2"))

    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).option("recursiveFileLookup", "true").parquet(str(inbox))
    q = vector_index_stream(
        stream,
        index_path=idx,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    grown = {
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    }
    union = base.unionByName(new1).unionByName(new2)
    expected = {
        (r["vec_id"], r["list_id"])
        for r in _ivf_assign(spark, union, cents).collect()
    }
    assert grown == expected
