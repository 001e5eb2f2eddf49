"""Temporal-join APIs: asof_join differential-tested against pandas
merge_asof (the semantics oracle), bucketed_range_join against a
nested-loop reference; plan contracts assert neither enumerates
pairs."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.rangejoin import (
    asof_join,
    bucketed_range_join,
)
from data_ingestion_tool_spark.plans import plan_report
from data_ingestion_tool_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT

SF_SMALL = "/root/testdata/sf0.001"


def _sides(spark, sf):
    e = load_table(spark, sf, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    right = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_join_matches_pandas_merge_asof(spark, direction, exact):
    left, right = _sides(spark, SF_SMALL)
    got = (
        asof_join(
            left,
            right,
            on="ts",
            by=["user_id"],
            value_cols=["click_id"],
            direction=direction,
            allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )

    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = (
        right.toPandas()
        .sort_values(["ts", "click_id"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="user_id",
        direction=direction,
        allow_exact_matches=exact,
    ).sort_values("purchase_id").reset_index(drop=True)

    assert len(got) == len(want)
    merged = got.merge(
        want, on="purchase_id", suffixes=("_spark", "_pandas")
    )
    # merge_asof picks the LAST right row among equal timestamps
    # (positional); our window picks a deterministic one too — compare
    # the matched timestamps, which are unique per (user, instant) in
    # this dataset, via the click ids
    same = merged["click_id_spark"].fillna(-1) == merged[
        "click_id_pandas"
    ].fillna(-1)
    assert same.all(), merged[~same].head()


def test_asof_join_is_single_shuffle_no_pair_join(spark):
    left, right = _sides(spark, SF_CORRECT)
    df = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["click_id"]
    )
    rep = plan_report(df)
    assert rep.nested_loop_joins == 0
    assert rep.sort_merge_joins == 0
    assert rep.broadcast_hash_joins == 0
    assert rep.exchanges == 1  # the by-key window shuffle


def test_bucketed_range_join_equals_nested_loop(spark):
    left, right = _sides(spark, SF_SMALL)
    left = left.drop("user_id")
    right = right.drop("user_id")
    got = bucketed_range_join(
        left.withColumnRenamed("ts", "lts"),
        right.withColumnRenamed("ts", "rts"),
        left_ts="lts",
        right_ts="rts",
        lower_s=-120,
        upper_s=120,
    ).select("purchase_id", "click_id")
    lp = left.toPandas()
    rp = right.toPandas()
    want = {
        (p.purchase_id, c.click_id)
        for p in lp.itertuples()
        for c in rp.itertuples()
        if p.ts + pd.Timedelta(seconds=-120)
        <= c.ts
        <= p.ts + pd.Timedelta(seconds=120)
    }
    assert {(r["purchase_id"], r["click_id"]) for r in got.collect()} == want


def test_keyless_range_join_has_no_nested_loop(spark):
    from data_ingestion_tool_spark.operators.rangejoin import (
        global_click_purchase_pairs,
    )

    rep = plan_report(global_click_purchase_pairs(spark, SF_CORRECT))
    assert rep.nested_loop_joins == 0
    assert rep.generates == 1  # the bounded 2-bucket fanout


def test_asof_join_tiebreak_is_deterministic(spark):
    """Round-2 advice regression: several right rows at one identical
    (key, ts) instant must resolve deterministically — backward keeps
    the HIGHEST tiebreak row, forward the LOWEST — instead of
    partition-order luck."""
    from datetime import datetime

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 13, 0, 0)
    left = spark.createDataFrame([(1, t1)], "k int, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, t0, "a", 10), (1, t0, "b", 30), (1, t0, "c", 20)],
        "k int, ts timestamp_ntz, val string, rid int",
    )
    back = asof_join(
        left, right, on="ts", by=["k"], value_cols=["val"],
        direction="backward", tiebreak="rid",
    ).collect()
    assert [r["val"] for r in back] == ["b"]  # rid 30 wins
    fwd = asof_join(
        spark.createDataFrame([(1, t0)], "k int, ts timestamp_ntz"),
        right, on="ts", by=["k"], value_cols=["val"],
        direction="forward", tiebreak="rid",
    ).collect()
    assert [r["val"] for r in fwd] == ["a"]  # rid 10 wins

    with pytest.raises(ValueError, match="collides"):
        asof_join(
            left.withColumnRenamed("k", "rid").withColumn("k", F.lit(1)),
            right, on="ts", by=["k"], value_cols=["val"], tiebreak="rid",
        )


def test_concurrent_sessions_output_is_width_invariant(spark):
    """Exactly-once across ANY bucket width (r06 verdict item 5): the
    first-shared-bucket emission rule makes the pair set — and so the
    counts — identical for the 1-hour default, a narrow 61 s width,
    and an awkward prime width that never aligns with session
    boundaries."""
    from data_ingestion_tool_spark.operators.rangejoin import (
        concurrent_sessions,
    )

    base = sorted(
        map(tuple, concurrent_sessions(spark, SF_CORRECT).collect())
    )
    assert base, "no sessions produced"
    for width in (61_000_000, 977_777_777):
        alt = sorted(
            map(
                tuple,
                concurrent_sessions(
                    spark, SF_CORRECT, bucket_width_us=width
                ).collect(),
            )
        )
        assert alt == base, f"width {width} changed the output"


def test_concurrent_sessions_auto_width_probe_is_bounded(spark):
    """The auto-width formula: sparse corpora (every tested SF) keep
    the 1-hour ceiling; dense corpora shrink width ∝ 1/density and
    respect the clamp. Width only redraws sweep/G-join bucket
    boundaries — output invariance is the previous test's job."""
    from data_ingestion_tool_spark.operators import rangejoin as RJ

    # formula check, no Spark needed: span×target/n, clamped
    span = 30 * 24 * 3600 * 1_000_000  # 30 days in µs
    width = lambda n: RJ._conc_auto_width(n, span)  # noqa: E731

    # 100×-audit density (10M sessions / 30 d): ~531 s buckets
    assert width(10_000_000) == span * RJ._CONC_TARGET_EVENTS // 10_000_000
    assert RJ._CONC_MIN_BUCKET_US < width(10_000_000) < RJ._CONC_BUCKET_US
    # pathological density clamps at the 1-minute floor
    assert width(10**12) == RJ._CONC_MIN_BUCKET_US
    # dense-ish but sparse per bucket: ceiling holds
    assert width(1_400_000) == RJ._CONC_BUCKET_US
    # width shrinks monotonically with density
    assert width(10_000_000) > width(100_000_000)


def test_concurrent_sessions_matches_pairwise_reference(spark, tmp_path):
    """The round-7 sweep-line decomposition (starts_leq − ends_lt −
    contained_gaps − 1) must reproduce the pairwise COUNT(DISTINCT)
    overlap join row for row — on the real corpus AND on a dense
    constructed one exercising every term: multi-session users whose
    several sessions overlap one long interval (the gap correction),
    boundary-equal timestamps (closed-interval ≤/< tie rules), point
    sessions, and sessions longer than the 10-minute gap floor (the
    G-join's replicated side)."""
    import random

    from data_ingestion_tool_spark.operators.rangejoin import (
        _concurrent_sessions_pairs,
        concurrent_sessions,
    )

    ref = sorted(
        map(tuple, _concurrent_sessions_pairs(spark, SF_CORRECT).collect())
    )
    got = sorted(map(tuple, concurrent_sessions(spark, SF_CORRECT).collect()))
    assert got == ref

    rng = random.Random(11)
    rows, eid = [], 0
    for u in range(12):
        t = rng.randint(0, 40)
        for _ in range(rng.randint(2, 12)):
            for _ in range(rng.randint(1, 5)):
                rows.append((eid, u, t))
                eid += 1
                t += rng.choice([0, 1, 120, 599])  # same session
            t += rng.choice([600, 900, 5000, 30000])  # new session
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "event_id long, user_id long, sec long"
    ).selectExpr(
        "event_id",
        "timestamp_seconds(sec) AS ts",
        "user_id",
        "'x' AS event_type",
        "0.0 AS value",
        "'{}' AS props",
    ).coalesce(2).write.parquet(d + "/events.parquet")
    for width in (None, 61_000_000, 977_777_777):
        ref = sorted(
            map(
                tuple,
                _concurrent_sessions_pairs(
                    spark, d, bucket_width_us=width
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                concurrent_sessions(
                    spark, d, bucket_width_us=width
                ).collect(),
            )
        )
        assert got == ref, f"width {width} diverged from pairwise"


def test_concurrent_sessions_adversarial_shapes(spark, tmp_path):
    """Differential corner shapes a random corpus rarely produces:
    (a) 30 users sharing ONE identical interval (every rank tie at
    once), (b) corpus-spanning long sessions whose interval contains
    every other user's inter-session gaps plus a point session inside
    all spans, (c) sessions that touch end-to-start at exact
    boundaries (the ≤ vs < tie rules carry the whole answer)."""
    from data_ingestion_tool_spark.operators.rangejoin import (
        _concurrent_sessions_pairs,
        concurrent_sessions,
    )

    corpora = {
        "identical": [(u * 2 + k, u, 1000 + 500 * k)
                      for u in range(30) for k in (0, 1)],
        "spanning": (
            # users 0-5: one long session [0, 3850] each (G-join side)
            [(100 * u + i, u, 550 * i) for u in range(6) for i in range(8)]
            # users 50-52: four short sessions inside that span — their
            # three inter-session gaps are contained by every long one
            + [(10_000 + 100 * u + k, 50 + u, 200 * u + 900 * k)
               for u in range(3) for k in range(4)]
            + [(9000, 99, 1234)]  # point session inside all spans
        ),
        "boundary": [
            (0, 1, 100), (1, 1, 400),   # u1 [100,400]
            (2, 2, 400), (3, 2, 700),   # u2 starts AT u1's end
            (4, 3, 700),                # u3 point at u2's end
            (5, 4, 99), (6, 4, 100),    # u4 ends AT u1's start
            (7, 5, 0), (8, 5, 2000),    # u5: two single-event sessions
        ],
    }
    for label, rows in corpora.items():
        d = str(tmp_path / label)
        spark.createDataFrame(
            rows, "event_id long, user_id long, sec long"
        ).selectExpr(
            "event_id",
            "timestamp_seconds(sec) AS ts",
            "user_id",
            "'x' AS event_type",
            "0.0 AS value",
            "'{}' AS props",
        ).coalesce(2).write.parquet(d + "/events.parquet")
        ref = sorted(
            map(tuple, _concurrent_sessions_pairs(spark, d).collect())
        )
        got = sorted(map(tuple, concurrent_sessions(spark, d).collect()))
        assert got == ref, f"{label} corpus diverged from pairwise"
