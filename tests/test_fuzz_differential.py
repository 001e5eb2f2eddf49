"""Differential query fuzzing: hypothesis draws random filter/agg and
window-top-k specs, each spec is compiled BOTH to a DataFrame plan and
to ANSI SQL, and Spark must match DuckDB exactly — the property-based
complement to the fixed oracle registry (any expression-compilation or
null/decimal/date-semantics divergence in the agg and window paths
shows up here without hand-writing a query per case).

Fuzzed on sf0.001 to keep each example sub-second; the fixed registry
covers the big scales.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_tool_spark.functions import dec
from data_ingestion_tool_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE, make_duck
from tests.parity import compare

#: (name, spark Column factory, SQL expression) — decimal-cast sums per
#: the repo convention so value hashes are order-independent.
_AGGS = {
    "n_rows": (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "COUNT(*) AS n_rows",
    ),
    "sum_qty": (
        lambda: F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty",
    ),
    "min_price": (
        lambda: F.min("l_extendedprice").alias("min_price"),
        "MIN(l_extendedprice) AS min_price",
    ),
    "max_price": (
        lambda: F.max("l_extendedprice").alias("max_price"),
        "MAX(l_extendedprice) AS max_price",
    ),
    "n_orders": (
        lambda: F.countDistinct("l_orderkey").alias("n_orders"),
        "COUNT(DISTINCT l_orderkey) AS n_orders",
    ),
}

_GROUP_COLS = ["l_returnflag", "l_linestatus"]

_FLAGS = ["A", "N", "R"]
_DATES = ["1996-01-01", "1997-06-01", "1999-01-01"]


@st.composite
def agg_specs(draw):
    group_cols = draw(
        st.lists(st.sampled_from(_GROUP_COLS), unique=True, max_size=2)
    )
    aggs = draw(
        st.lists(
            st.sampled_from(sorted(_AGGS)), unique=True, min_size=1, max_size=3
        )
    )
    filters = []
    if draw(st.booleans()):
        q = draw(st.integers(min_value=1, max_value=50))
        filters.append(("qty_le", q))
    if draw(st.booleans()):
        filters.append(("ship_lt", draw(st.sampled_from(_DATES))))
    if draw(st.booleans()):
        filters.append(("flag_eq", draw(st.sampled_from(_FLAGS))))
    return {"group": group_cols, "aggs": aggs, "filters": filters}


def _spark_filter(df, filters):
    for kind, v in filters:
        if kind == "qty_le":
            df = df.filter(F.col("l_quantity") <= v)
        elif kind == "ship_lt":
            df = df.filter(
                F.col("l_shipdate") < F.lit(v).cast("timestamp_ntz")
            )
        elif kind == "flag_eq":
            df = df.filter(F.col("l_returnflag") == v)
    return df


def _sql_where(filters) -> str:
    preds = []
    for kind, v in filters:
        if kind == "qty_le":
            preds.append(f"l_quantity <= {v}")
        elif kind == "ship_lt":
            preds.append(f"l_shipdate < TIMESTAMP '{v}'")
        elif kind == "flag_eq":
            preds.append(f"l_returnflag = '{v}'")
    return (" WHERE " + " AND ".join(preds)) if preds else ""


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=agg_specs())
def test_fuzzed_filter_agg_matches_duckdb(spark, spec):
    li = _spark_filter(load_table(spark, SF_SMOKE, "lineitem"), spec["filters"])
    cols = [_AGGS[a][0]() for a in spec["aggs"]]
    if spec["group"]:
        sdf = li.groupBy(*spec["group"]).agg(*cols)
    else:
        sdf = li.agg(*cols)
    select = ", ".join(
        spec["group"] + [_AGGS[a][1] for a in spec["aggs"]]
    )
    sql = f"SELECT {select} FROM lineitem{_sql_where(spec['filters'])}"
    if spec["group"]:
        sql += " GROUP BY " + ", ".join(spec["group"])
    con = make_duck(SF_SMOKE)
    try:
        ddf = con.execute(sql).df()
    finally:
        con.close()
    problems = compare(sdf, ddf)
    assert not problems, f"{spec}: " + "; ".join(problems)


@st.composite
def topk_specs(draw):
    return {
        "part": draw(st.sampled_from(["o_orderstatus", "o_orderpriority"])),
        "k": draw(st.integers(min_value=1, max_value=5)),
        "desc": draw(st.booleans()),
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=topk_specs())
def test_fuzzed_window_topk_matches_duckdb(spark, spec):
    """Per-group top-k with a deterministic total tie-break: the
    window path (rank + filter) fuzz-checked against DuckDB."""
    o = load_table(spark, SF_SMOKE, "orders")
    order = (
        [F.desc("o_totalprice"), F.asc("o_orderkey")]
        if spec["desc"]
        else [F.asc("o_totalprice"), F.asc("o_orderkey")]
    )
    w = Window.partitionBy(spec["part"]).orderBy(*order)
    sdf = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= spec["k"])
        .select(spec["part"], "o_orderkey", "o_totalprice", "rn")
    )
    direction = "DESC" if spec["desc"] else "ASC"
    sql = f"""
    SELECT {spec['part']}, o_orderkey, o_totalprice, rn FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {spec['part']}
        ORDER BY o_totalprice {direction}, o_orderkey
      ) AS rn FROM orders
    ) WHERE rn <= {spec['k']}
    """
    con = make_duck(SF_SMOKE)
    try:
        ddf = con.execute(sql).df()
    finally:
        con.close()
    problems = compare(sdf, ddf)
    assert not problems, f"{spec}: " + "; ".join(problems)


@st.composite
def frame_specs(draw):
    mode = draw(st.sampled_from(["rows", "range"]))
    # start must not be after end: draw start from {unbounded, k
    # preceding}, end from {current row, m following}
    start = draw(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5))
    )  # None = UNBOUNDED PRECEDING, k = k PRECEDING
    end = draw(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5))
    )  # None = CURRENT ROW, m = m FOLLOWING
    agg = draw(st.sampled_from(["sum", "min", "max", "count"]))
    return {"mode": mode, "start": start, "end": end, "agg": agg}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=frame_specs())
def test_fuzzed_window_frame_matches_duckdb(spark, spec):
    """Random ROWS/RANGE window frames over lineitem: frame-boundary
    semantics (peer rows in RANGE, physical offsets in ROWS, empty
    frames when the window slides off the partition) are a classic
    cross-engine divergence spot. ROWS frames order by (l_orderkey,
    l_linenumber, l_extendedprice): the synthetic lineitem PLANTS
    duplicate (orderkey, linenumber) keys (see
    ``dq_duplicate_linenumbers``), and a ROWS frame whose sort ties
    differ in the aggregated column is nondeterministic by definition
    — including the aggregated column in the order makes any residual
    ties interchangeable for every aggregate over it. RANGE frames
    order by l_quantity where ties are peers (value-based,
    deterministic) but RANGE requires the single sort key."""
    li = load_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_orderkey") <= 1000  # keep each example sub-second
    )
    lo = (
        Window.unboundedPreceding if spec["start"] is None else -spec["start"]
    )
    hi = Window.currentRow if spec["end"] is None else spec["end"]
    if spec["mode"] == "rows":
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
            .rowsBetween(lo, hi)
        )
        order_sql = "l_orderkey, l_linenumber, l_extendedprice"
        frame_kw = "ROWS"
    else:
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy("l_quantity")
            .rangeBetween(lo, hi)
        )
        order_sql = "l_quantity"
        frame_kw = "RANGE"
    wcol = {
        # cast AFTER .over(): casting the aggregate first detaches the
        # window spec from the aggregate function
        "sum": F.sum(dec("l_extendedprice")).over(w).cast("double"),
        "min": F.min("l_extendedprice").over(w),
        "max": F.max("l_extendedprice").over(w),
        "count": F.count(F.lit(1)).over(w),
    }[spec["agg"]]
    sdf = li.select("l_orderkey", "l_linenumber", wcol.alias("wv"))
    start_sql = (
        "UNBOUNDED PRECEDING"
        if spec["start"] is None
        else f"{spec['start']} PRECEDING"
    )
    end_sql = (
        "CURRENT ROW" if spec["end"] is None else f"{spec['end']} FOLLOWING"
    )
    over_sql = (
        f"OVER (PARTITION BY l_returnflag ORDER BY {order_sql} "
        f"{frame_kw} BETWEEN {start_sql} AND {end_sql})"
    )
    agg_sql = {
        # the cast wraps the windowed aggregate, mirroring the Spark side
        "sum": "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) "
               f"{over_sql} AS DOUBLE)",
        "min": f"MIN(l_extendedprice) {over_sql}",
        "max": f"MAX(l_extendedprice) {over_sql}",
        "count": f"COUNT(*) {over_sql}",
    }[spec["agg"]]
    sql = f"""
    SELECT l_orderkey, l_linenumber, {agg_sql} AS wv
    FROM lineitem WHERE l_orderkey <= 1000
    """
    con = make_duck(SF_SMOKE)
    try:
        ddf = con.execute(sql).df()
    finally:
        con.close()
    problems = compare(sdf, ddf)
    assert not problems, f"{spec}: " + "; ".join(problems)


@st.composite
def join_specs(draw):
    return {
        "how": draw(st.sampled_from(["inner", "left", "right"])),
        "group": draw(
            st.sampled_from(["o_orderstatus", "l_returnflag"])
        ),
        "qty_le": draw(st.integers(min_value=0, max_value=50))
        if draw(st.booleans())
        else None,
        "status_eq": draw(st.sampled_from(["F", "O", "P"]))
        if draw(st.booleans())
        else None,
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=join_specs())
def test_fuzzed_join_agg_matches_duckdb(spark, spec):
    """Random orders⋈lineitem join type + side filters + grouped
    count: outer-join null semantics fuzz-checked against DuckDB."""
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    o_pred = l_pred = ""
    if spec["status_eq"] is not None:
        o = o.filter(F.col("o_orderstatus") == spec["status_eq"])
        o_pred = f" WHERE o_orderstatus = '{spec['status_eq']}'"
    if spec["qty_le"] is not None:
        li = li.filter(F.col("l_quantity") <= spec["qty_le"])
        l_pred = f" WHERE l_quantity <= {spec['qty_le']}"
    joined = o.join(
        li, F.col("o_orderkey") == F.col("l_orderkey"), spec["how"]
    )
    sdf = joined.groupBy(spec["group"]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_orderkey").alias("n_lines"),
        F.count("o_orderkey").alias("n_order_side"),
    )
    how_sql = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN"}
    sql = f"""
    SELECT {spec['group']}, COUNT(*) AS n_rows,
           COUNT(l_orderkey) AS n_lines,
           COUNT(o_orderkey) AS n_order_side
    FROM (SELECT * FROM orders{o_pred}) o
    {how_sql[spec['how']]} (SELECT * FROM lineitem{l_pred}) l
      ON o.o_orderkey = l.l_orderkey
    GROUP BY {spec['group']}
    """
    con = make_duck(SF_SMOKE)
    try:
        ddf = con.execute(sql).df()
    finally:
        con.close()
    problems = compare(sdf, ddf)
    assert not problems, f"{spec}: " + "; ".join(problems)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """The distributed two-phase skyline equals brute-force dominance
    on random point sets (including duplicates-on-one-axis, ties, and
    anti-correlated shapes hypothesis finds)."""
    from data_ingestion_tool_spark.operators.relational import (
        pareto_frontier,
    )

    df = spark.createDataFrame(pts, "x long, y long").distinct()
    got = {(r["x"], r["y"]) for r in pareto_frontier(df, "x", "y").collect()}
    want = {
        (x, y)
        for x, y in pts
        if not any(
            (qx >= x and qy >= y and (qx > x or qy > y)) for qx, qy in pts
        )
    }
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=4),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_rolling_fingerprint_matches_pure_python(spark, docs):
    """The Rabin–Karp fold (md5-derived token values under a Mersenne
    modulus) equals a pure-Python reference on random token streams."""
    import hashlib

    from data_ingestion_tool_spark.operators.text import (
        _RH_B,
        _RH_M,
        doc_rolling_fingerprints,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = None  # operator reads documents from sf_dir; call inner logic

    # reuse the operator expression via a temp parquet dir
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            r["doc_id"]: r["fingerprint"]
            for r in doc_rolling_fingerprints(spark, td).collect()
        }

    def ref(tokens: list[str]) -> int:
        h = 0
        for t in tokens:
            v = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % _RH_M
            h = (h * _RH_B + v) % _RH_M
        return h

    for i, toks in enumerate(docs):
        assert got[i] == ref(toks), (i, toks)


_SETOPS = {
    # name -> (spark combiner, SQL keyword)
    "union_all": (lambda a, b: a.unionAll(b), "UNION ALL"),
    "union": (lambda a, b: a.union(b).distinct(), "UNION"),
    "intersect": (lambda a, b: a.intersect(b), "INTERSECT"),
    "intersect_all": (lambda a, b: a.intersectAll(b), "INTERSECT ALL"),
    "except": (lambda a, b: a.subtract(b), "EXCEPT"),
    "except_all": (lambda a, b: a.exceptAll(b), "EXCEPT ALL"),
}

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@st.composite
def setop_specs(draw):
    return {
        "op": draw(st.sampled_from(sorted(_SETOPS))),
        "prio_a": draw(st.sampled_from(_PRIOS)),
        "price_b": draw(st.integers(min_value=1, max_value=300)) * 1000,
        "k": draw(st.integers(min_value=1, max_value=50)),
    }


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=setop_specs())
def test_fuzzed_setop_pipeline_matches_duckdb(spark, spec):
    """Random set-op pipelines: two filtered projections of orders
    combined via every UNION/INTERSECT/EXCEPT [ALL] variant, then a
    deterministic ORDER BY + LIMIT — exercising bag-vs-set semantics,
    duplicate multiplicity, and the sort/limit compilation path with
    one property instead of six hand-written oracle queries."""
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    a = o.filter(F.col("o_orderpriority") == spec["prio_a"])
    b = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_totalprice") <= spec["price_b"])
        .select("o_orderkey", "o_orderpriority")
    )
    combine, kw = _SETOPS[spec["op"]]
    sdf = (
        combine(a, b).orderBy("o_orderkey", "o_orderpriority").limit(spec["k"])
    )
    sql = f"""
    SELECT * FROM (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderpriority = '{spec["prio_a"]}'
      {kw}
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_totalprice <= {spec["price_b"]}
    ) ORDER BY o_orderkey, o_orderpriority LIMIT {spec["k"]}
    """
    con = make_duck(SF_SMOKE)
    try:
        ddf = con.execute(sql).df()
    finally:
        con.close()
    problems = compare(sdf, ddf)
    assert not problems, f"{spec}: " + "; ".join(problems)


@st.composite
def nullkey_join_specs(draw):
    key = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
    side = st.lists(
        st.tuples(key, st.integers(min_value=0, max_value=99)),
        min_size=0,
        max_size=12,
    )
    return {
        "a": draw(side),
        "b": draw(side),
        "how": draw(
            st.sampled_from(["inner", "left", "full", "semi", "anti"])
        ),
    }


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=nullkey_join_specs())
def test_fuzzed_nullkey_join_matches_duckdb(spark, spec):
    """Join semantics on NULL-laden keys — the gap the clean-key join
    fuzz can't see: NULL keys must never match (including NULL = NULL),
    FULL OUTER must still emit both sides' unmatched NULL-key rows,
    and SEMI/ANTI must keep each probe row at most/exactly once
    regardless of build-side duplicate multiplicity. Constructed
    frames, tiny key domain (collisions + duplicates guaranteed);
    every output column cast to DOUBLE on both engines so the value
    canonicalization is dtype-stable under mixed nullability."""
    import pandas as pd

    a = spark.createDataFrame(spec["a"], "k int, av int")
    b = spark.createDataFrame(spec["b"], "k int, bv int")
    pa = pd.DataFrame(
        {
            "k": pd.array([r[0] for r in spec["a"]], dtype="Int64"),
            "av": pd.array([r[1] for r in spec["a"]], dtype="Int64"),
        }
    )
    pb = pd.DataFrame(
        {
            "k": pd.array([r[0] for r in spec["b"]], dtype="Int64"),
            "bv": pd.array([r[1] for r in spec["b"]], dtype="Int64"),
        }
    )
    cond = a["k"] == b["k"]
    if spec["how"] in ("semi", "anti"):
        sdf = a.join(b, cond, "left_" + spec["how"]).select(
            F.col("k").cast("double").alias("k"),
            F.col("av").cast("double").alias("av"),
        )
        op = "EXISTS" if spec["how"] == "semi" else "NOT EXISTS"
        sql = f"""
        SELECT CAST(k AS DOUBLE) AS k, CAST(av AS DOUBLE) AS av
        FROM ta WHERE {op} (SELECT 1 FROM tb WHERE tb.k = ta.k)
        """
    else:
        sdf = a.join(b, cond, spec["how"]).select(
            a["k"].cast("double").alias("a_k"),
            F.col("av").cast("double").alias("av"),
            b["k"].cast("double").alias("b_k"),
            F.col("bv").cast("double").alias("bv"),
        )
        how_sql = {
            "inner": "JOIN",
            "left": "LEFT JOIN",
            "full": "FULL JOIN",
        }[spec["how"]]
        sql = f"""
        SELECT CAST(ta.k AS DOUBLE) AS a_k, CAST(av AS DOUBLE) AS av,
               CAST(tb.k AS DOUBLE) AS b_k, CAST(bv AS DOUBLE) AS bv
        FROM ta {how_sql} tb ON ta.k = tb.k
        """
    import duckdb

    con = duckdb.connect()
    try:
        con.register("ta", pa)
        con.register("tb", pb)
        ddf = con.execute(sql).df()
    finally:
        con.close()
    problems = compare(sdf, ddf)
    assert not problems, f"{spec}: " + "; ".join(problems)
