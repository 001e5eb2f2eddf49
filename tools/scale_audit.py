"""Scale-up audit: does the engine's per-query cost grow ~linearly
when the data grows 10x / 100x?

    python tools/scale_audit.py [--factor N] [--base sf_dir] [--out dir]
                                [--queries a,b,c] [--with-text]

Builds a FACTOR-x replica of the relational/events tables under
``--out`` by unioning key-remapped copies (every FK column shifted by
replica * 10^9, so the join web stays consistent — replica r's orders
reference replica r's customers; nation/region stay single-copy dims;
events keep their real timestamps, so time-window densities grow with
the data like a busier production stream). The text/vector tables are
not replicated by default: duplicating documents verbatim manufactures
a pathological duplicate-heavy corpus (every doc gains FACTOR-1 exact
copies), which is a robustness scenario — covered by the planted
hot-bucket tests — not a realistic corpus scale-up. ``--with-text``
replicates them HONESTLY instead: per-replica token suffixes give
disjoint vocabularies (within-replica shingle/near-dup structure
preserved exactly, cross-replica Jaccard 0), and embeddings get a
per-replica orthogonal transform (cyclic dimension shift + hash-
patterned sign flips — norms and within-replica cosines exact,
cross-replica cosines decorrelated).

Then times each query at the base SF and at FACTOR-x (noop-write
terminal action, min of 2 runs, same session) and prints a per-query
ratio table plus one JSON line. A ratio near FACTOR = linear scaling;
well under FACTOR = fixed overhead still dominates; well over FACTOR
= a superlinear stage that 100 TB would punish.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_tool_spark import get_spark  # noqa: E402
from data_ingestion_tool_spark.operators import registry  # noqa: E402

#: key columns to shift per table (FK-consistent remap)
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
#: single-copy dimensions (shared across replicas)
COPY_TABLES = ["nation", "region"]

KEY_BASE = 1_000_000_000

#: text/vector replication is OPT-IN (--with-text) and perturbs each
#: replica so the scaled corpus is NOT duplicate-heavy: every token
#: gets a per-replica suffix (replica vocabularies are disjoint — the
#: within-replica near-dup/shingle structure is preserved exactly,
#: cross-replica Jaccard is 0), and every embedding is cyclically
#: dimension-shifted + alternating-sign-flipped per replica (norms and
#: intra-replica geometry preserved; cross-replica cosines decorrelate)
TEXT_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}

#: shuffle-heavy relational/events/tpch headliners that touch ONLY the
#: replicated tables (no documents/embeddings)
DEFAULT_QUERIES = [
    "validate_lineitem",
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
    "customer_order_stats",
    "agg_distinct",
    "agg_rollup",
    "window_rank_orders",
    "topk_orders_per_customer",
    "scalar_json_events",
    "tumbling_hourly",
    "session_windows",
    "multires_rollup",
    "asof_last_event",
    "events_gap_fill",
    "winsorized_prices",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q21_last_shipper",
    "tpch_q2_min_cost_supplier",
    "rolling_weekly_active_users",
    "frequent_event_sequences",
    "time_weighted_avg_value",
    "self_join_blowup_estimate",
    "skyline_orders",
    "concurrent_sessions",
    "seasonal_value_anomalies",
    "event_attribution_last_touch",
    "grouped_price_elasticity",
    "market_basket_brand_pairs",
    "cumulative_unique_users",
    "exact_user_reach",
    "salted_revenue_by_priority",
    "join_key_skew_profile",
    "user_funnel",
    "purchases_after_clicks",
]


#: --production-dims synthetic embedding width: the d=64 test vectors
#: put the τ=0.45 near-dup cutoff only 3.6σ from the random-cosine
#: null, so at 100× the audit's wall clock is dominated by O(n²)
#: CHANCE-pair output, not kernel compute. d=384 puts the same τ at
#: 8.8σ (chance mass nil), so the ratio measures the kernel.
_PROD_DIM = 384


def build_scaled(
    spark,
    base: str,
    out: str,
    factor: int,
    with_text: bool = False,
    production_dims: bool = False,
) -> None:
    # Write every replicated table at session parallelism: the base
    # tables are single parquet files, and a narrow explode keeps that
    # layout — a 76 MB 100x documents table otherwise lands as ONE
    # scan split, serializing every scan→Python stage into one task
    # and misattributing the audit's ratios to the operator (a real
    # table at this size has many splits; single-file layout is a
    # test artifact, caught in round 6). The count derives from the
    # LIVE session's parallelism (r06 ADVICE: a hard-coded 32 could
    # diverge from e.g. local[8] and reintroduce a milder layout
    # artifact); SPARK_GRAFT_CPUS stays as an explicit override only.
    env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    n_files = (
        int(env_cpus) if env_cpus else spark.sparkContext.defaultParallelism
    )
    os.makedirs(out, exist_ok=True)
    for t, keys in KEY_COLS.items():
        src = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        # one pass: explode a replica index, shift every key column
        rep = src.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        for k in keys:
            rep = rep.withColumn(
                k, F.col(k) + F.col("_r").cast("long") * KEY_BASE
            )
        rep.drop("_r").repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    for t in COPY_TABLES:
        spark.read.parquet(os.path.join(base, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    if not with_text:
        return
    for t, key in TEXT_TABLES.items():
        src = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        if production_dims and t == "embeddings":
            # replace the d=64 test vectors with DETERMINISTIC
            # production-width synthetics: element j of vec v is a
            # hash-derived uniform in [-1, 1] — pairwise cosines
            # concentrate at ~N(0, 1/d) (the independence null), so
            # the only pairs the near-dup tier emits are the planted
            # within-replica ones (none), and the timing isolates
            # kernel compute from chance-pair output materialization.
            # The per-replica orthogonal transform below still
            # applies — same transform discipline as the d=64 run.
            src = src.withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(0), F.lit(_PROD_DIM - 1)),
                    lambda j: (
                        (
                            F.pmod(
                                F.xxhash64(F.col(key), j),
                                F.lit(2_000_001),
                            )
                            - F.lit(1_000_000)
                        ).cast("double")
                        / F.lit(1_000_000.0)
                    ),
                ),
            )
        rep = src.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        ).withColumn(key, F.col(key) + F.col("_r").cast("long") * KEY_BASE)
        if "text" in rep.columns:
            # replica 0 keeps the original text verbatim; replicas
            # r>0 suffix every token with "xr" (disjoint vocabularies)
            toks = F.split(F.trim(F.col("text")), r"\s+")
            suffixed = F.concat_ws(
                " ",
                F.transform(
                    toks,
                    lambda tk: F.concat(
                        tk, F.lit("x"), F.col("_r").cast("string")
                    ),
                ),
            )
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(suffixed),
            )
        if "embedding" in rep.columns:
            # cyclic dimension shift by 7r (mod d) + a hash-patterned
            # sign flip per (element, replica): both are orthogonal
            # transforms, so norms and within-replica cosines are
            # EXACTLY preserved while cross-replica cosines
            # decorrelate (any two replicas differ by a rotation times
            # a pseudo-random ±1 diagonal). Replica 0 stays verbatim.
            d = len(
                src.select("embedding").limit(1).collect()[0][0]
            )
            shift = F.pmod(F.col("_r") * 7, F.lit(d))
            rotated = F.concat(
                F.slice(F.col("embedding"), shift + 1, F.lit(d) - shift),
                F.slice(F.col("embedding"), F.lit(1), shift),
            )
            flipped = F.transform(
                rotated,
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(i, F.col("_r")), F.lit(2)) == 1, -x
                ).otherwise(x),
            )
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("_r") == 0, F.col("embedding")).otherwise(
                    flipped
                ),
            )
        rep.drop("_r").repartition(n_files).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))


#: text/vector-tier headliners for --with-text runs (documents and
#: embeddings replicated with the perturbations above)
TEXT_QUERIES = [
    "text_quality",
    "text_stats",
    "token_counts",
    "lang_id",
    "doc_fingerprints",
    "tfidf_top_terms",
    "bm25_search",
    "repetition_score",
    "quality_score_linear",
    "unigram_logprob_scores",
    "doc_quality_ensemble",
    "exact_top_terms",
    "heavy_hitter_terms",
    "embed_documents",
    "token_ngram_novelty",
    "linewise_dedup",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fuzzy_title_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_exact_rerank",
    "embedding_near_dup",
    "embedding_dimension_stats",
    "embedding_covariance",
    "semantic_dedup",
    "kmeans_labels",
]


#: Per-query audit-protocol overrides (r09 verdict item 5). The r09
#: winsorized episode prescribed "min-of-4 from a warm replica" in
#: PERF.md prose only — the tool now applies it, so the reproduction
#: is one command and the protocol can't drift. ``runs``: timed shots
#: (min reported; successive shots keep improving through shot 4 on
#: this query — 1.1 GB page-cache + codegen warm-in, PERF.md r09);
#: ``warmup``: additional untimed warm-in shots before the timed ones.
QUERY_PROTOCOL: dict[str, dict[str, int]] = {
    "winsorized_prices": {"runs": 4},
}


def _probe_entry(pre: dict, post: dict) -> dict:
    """One audit probe record: the shared bench axes bracketing a
    timed block, plus the band verdict — the single shape every
    audit mode stamps (r11 verdict item 6)."""
    from bench import _probe_healthy

    return {
        "sched_pre": pre["sched_sec"],
        "gemm_pre": pre["gemm_sec"],
        "sched_post": post["sched_sec"],
        "gemm_post": post["gemm_sec"],
        "healthy": _probe_healthy(pre) and _probe_healthy(post),
    }


def time_queries(
    spark,
    reg,
    names,
    sf_dir: str,
    runs: int = 2,
    probe_log: dict | None = None,
):
    """Time each query (min of ``runs`` noop-write shots). When
    ``probe_log`` is a dict, stamp the shared bench health probes
    before and after each query's shots, keyed ``name@sf_dir`` — a
    100x audit row then adjudicates itself the way bench rows do (r11
    verdict item 6). Consecutive queries share a reading (N's post is
    N+1's pre; only a cache drop separates them)."""
    if probe_log is not None:
        from bench import _sweep_probe
    out = {}
    prev_post = None
    for name in names:
        proto = QUERY_PROTOCOL.get(name, {})
        n_runs = proto.get("runs", runs)
        pre = None
        if probe_log is not None:
            pre = prev_post if prev_post is not None else _sweep_probe(spark)
        for _ in range(proto.get("warmup", 0)):
            reg[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        shots = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            reg[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            shots.append(time.perf_counter() - t0)
        best = min(shots)
        out[name] = round(best, 3)
        seq = (
            " shots=[" + ", ".join(f"{s:.2f}" for s in shots) + "]"
            if proto
            else ""
        )
        probe_note = ""
        if probe_log is not None:
            post = _sweep_probe(spark)
            prev_post = post
            entry = _probe_entry(pre, post)
            probe_log[f"{name}@{sf_dir}"] = entry
            probe_note = (
                f" probes sched {entry['sched_pre']:.3f}/"
                f"{entry['sched_post']:.3f} gemm {entry['gemm_pre']:.3f}/"
                f"{entry['gemm_post']:.3f}"
                f" healthy={entry['healthy']}"
            )
        print(f"  timed {name} @ {sf_dir}: {best:.3f}s{seq}{probe_note}",
              flush=True)
        # several operators persist intermediates as part of their
        # plan (a cost the timing above counts); drop them so block
        # storage doesn't accumulate across the 2·|names| timings and
        # perturb later entries with GC pressure
        spark.catalog.clearCache()
    return out


#: --production-dims headliners: the embedding-kernel tier only (the
#: queries whose cost profile the dimension changes)
EMBED_QUERIES = [
    "embedding_near_dup",
    "embedding_near_dup_blocked",
    "semantic_dedup",
    "ann_bruteforce_topk",
    "ann_ivf_exact_rerank",
    "embedding_dimension_stats",
]


def ivf_index_audit(spark, base: str, out: str, factor: int) -> int:
    """--ivf-index (r08 verdict item 4): the prior 100x audits priced
    the AD-HOC IVF operator, whose cost is dominated by the per-call
    O(N·nlist·d) assignment GEMM; the documented 100 TB deployment
    path is build-once/probe-many (``build_ivf_index`` →
    ``ann_ivf_topk_indexed`` with list_id partition pruning). This
    mode times the build ONCE (the amortized cost), then probes alone
    (min of 3) at both scales, prices the ad-hoc operator at the
    audit scale for comparison, and plan-asserts partition pruning on
    the AUDIT-scale index (the pytest pin covers sf0.01 only)."""
    from data_ingestion_tool_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivf_topk_indexed,
        build_ivf_index,
        compact_ivf_index,
        ivf_index_upsert,
    )
    from data_ingestion_tool_spark.plans import formatted_plan

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # same self-adjudication as time_queries (r11 verdict item 6):
    # bracket each scale's timed block with the shared bench health
    # probes so an index-audit row names its own window
    from bench import _sweep_probe

    report: dict[str, object] = {"mode": "ivf_index", "factor": factor}
    probe_log: dict[str, dict] = {}
    rows = []
    for label, sf_dir in (("1x", base), (f"{factor}x", out)):
        idx = os.path.join(sf_dir, "_ivf_index_audit")
        pre = _sweep_probe(spark)
        build_sec = timed(lambda: build_ivf_index(spark, sf_dir, idx))
        probe_sec = min(
            timed(lambda: noop(ann_ivf_topk_indexed(spark, sf_dir, idx)))
            for _ in range(3)
        )
        plan = formatted_plan(ann_ivf_topk_indexed(spark, sf_dir, idx))
        pruned = (
            "PartitionFilters" in plan
            and "list_id" in plan.split("PartitionFilters", 1)[1][:200]
        )
        adhoc_sec = min(
            timed(lambda: noop(ann_ivf_topk(spark, sf_dir)))
            for _ in range(2)
        )
        post = _sweep_probe(spark)
        probe_log[label] = _probe_entry(pre, post)
        rows.append((label, build_sec, probe_sec, adhoc_sec, pruned))
        print(
            f"  {label}: build {build_sec:.2f}s, probe {probe_sec:.2f}s "
            f"(min of 3), ad-hoc {adhoc_sec:.2f}s, "
            f"partition-pruned={pruned}, "
            f"health probes sched {pre['sched_sec']:.3f}/"
            f"{post['sched_sec']:.3f} gemm {pre['gemm_sec']:.3f}/"
            f"{post['gemm_sec']:.3f} healthy={probe_log[label]['healthy']}",
            flush=True,
        )
    report["probes"] = probe_log

    print(f"\n{'scale':8s} {'build':>8s} {'probe':>8s} {'ad-hoc':>8s} {'pruned':>7s}")
    for label, b, p, a, pr in rows:
        print(f"{label:8s} {b:8.2f} {p:8.2f} {a:8.2f} {str(pr):>7s}")
    (_, b1, p1, a1, pr1), (_, bN, pN, aN, prN) = rows

    # Fragmentation pricing (r09 verdict item 3): K tiny upserts model
    # streaming micro-batches — rows barely grow, but every touched
    # list gains a part file per batch, so the pruned probe's cost
    # drifts from scan to file listing/open overhead.
    # compact_ivf_index restores the layout; the probe is re-priced on
    # IDENTICAL content both sides (compaction moves bytes, not rows).
    idx = os.path.join(out, "_ivf_index_audit")
    emb = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    n_upserts, batch_rows = 16, 2000
    t0 = time.perf_counter()
    for k in range(1, n_upserts + 1):
        batch = (
            emb.select(
                (F.col("vec_id") + 50_000_000 * k).alias("vec_id"),
                "embedding",
            ).limit(batch_rows)
        )
        ivf_index_upsert(spark, idx, batch)
    upsert_sec = time.perf_counter() - t0

    def max_files_per_list() -> int:
        return max(
            len([f for f in os.listdir(os.path.join(idx, d))
                 if f.endswith(".parquet")])
            for d in os.listdir(idx)
            if d.startswith("list_id=")
        )

    frag_files = max_files_per_list()
    # stamp the fragmented-vs-compacted pair too: the readings sit
    # minutes apart, and the r12 night run's window swung enough in
    # that gap to INVERT them (16.2 vs 6.6 s) — unstamped, that reads
    # as a code regression instead of a window artifact
    h_frag = _sweep_probe(spark)
    frag_probe = min(
        timed(lambda: noop(ann_ivf_topk_indexed(spark, out, idx)))
        for _ in range(3)
    )
    t0 = time.perf_counter()
    stats = compact_ivf_index(spark, idx)
    compact_sec = time.perf_counter() - t0
    h_comp = _sweep_probe(spark)
    comp_probe = min(
        timed(lambda: noop(ann_ivf_topk_indexed(spark, out, idx)))
        for _ in range(3)
    )
    h_end = _sweep_probe(spark)
    probe_log["fragmented_probe"] = _probe_entry(h_frag, h_comp)
    probe_log["compacted_probe"] = _probe_entry(h_comp, h_end)
    print(
        f"  fragmentation: {n_upserts} micro-upserts ({upsert_sec:.1f}s) "
        f"-> max {frag_files} files/list, probe {frag_probe:.2f}s; "
        f"compacted ({compact_sec:.1f}s, {stats['lists_compacted']} "
        f"lists, {stats['files_before']}->{stats['files_after']} files) "
        f"-> max {max_files_per_list()} files/list, "
        f"probe {comp_probe:.2f}s",
        flush=True,
    )
    report["fragmentation"] = {
        "n_upserts": n_upserts,
        "max_files_per_list_fragmented": frag_files,
        "probe_fragmented_sec": round(frag_probe, 2),
        "compact_sec": round(compact_sec, 2),
        "lists_compacted": stats["lists_compacted"],
        "max_files_per_list_compacted": max_files_per_list(),
        "probe_compacted_sec": round(comp_probe, 2),
    }
    report.update(
        {
            "build_sec": {"1x": round(b1, 2), f"{factor}x": round(bN, 2)},
            "probe_sec": {"1x": round(p1, 2), f"{factor}x": round(pN, 2)},
            "adhoc_sec": {"1x": round(a1, 2), f"{factor}x": round(aN, 2)},
            "probe_ratio": round(pN / p1, 2) if p1 > 0 else None,
            "probe_vs_adhoc_at_scale": round(pN / aN, 2) if aN > 0 else None,
            "partition_pruned": {"1x": pr1, f"{factor}x": prN},
        }
    )
    print(json.dumps(report))
    # the audit's contract: pruning holds at scale and probes beat the
    # per-call assignment GEMM they exist to amortize
    return 0 if (prN and pN < aN) else 1


def main() -> int:
    factor = 10
    base = "/root/testdata/sf0.1"
    out_root = "/tmp/scale_audit"
    names = None
    with_text = "--with-text" in sys.argv
    prod_dims = "--production-dims" in sys.argv
    ivf_index = "--ivf-index" in sys.argv
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--factor":
            factor = int(argv[i + 1])
        elif a == "--base":
            base = argv[i + 1]
        elif a == "--out":
            out_root = argv[i + 1]
        elif a == "--queries":
            names = argv[i + 1].split(",")
    if ivf_index:
        # the index audit runs on the production-dims replica — same
        # corpus discipline as the ad-hoc embedding-tier audits
        prod_dims = True
    if prod_dims:
        with_text = True
        names = names or EMBED_QUERIES
    names = names or (TEXT_QUERIES if with_text else DEFAULT_QUERIES)
    suffix = "p" if prod_dims else ("t" if with_text else "")
    out = os.path.join(out_root, f"x{factor}{suffix}")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # the scaled input needs a real heap: local[N] runs all N task
    # threads in ONE JVM (see session.py) — 1g is a GC wall at 10x
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "48g")
    spark = get_spark(
        "scale-audit",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(out, "_SUCCESS_AUDIT")):
        print(f"building {factor}x replica under {out} ...", flush=True)
        t0 = time.time()
        build_scaled(
            spark, base, out, factor,
            with_text=with_text, production_dims=prod_dims,
        )
        open(os.path.join(out, "_SUCCESS_AUDIT"), "w").close()
        print(f"built in {time.time() - t0:.0f}s", flush=True)

    if prod_dims:
        # the 1× side must carry the SAME d=384 synthetics, or the
        # ratio would compare different kernels — build an x1 replica
        base_prod = os.path.join(out_root, "x1p")
        if not os.path.exists(os.path.join(base_prod, "_SUCCESS_AUDIT")):
            print(f"building 1x production-dims base under {base_prod} ...",
                  flush=True)
            build_scaled(
                spark, base, base_prod, 1,
                with_text=True, production_dims=True,
            )
            open(os.path.join(base_prod, "_SUCCESS_AUDIT"), "w").close()
        base = base_prod

    if ivf_index:
        rc = ivf_index_audit(spark, base, out, factor)
        spark.stop()
        return rc

    reg = registry()
    names = [n for n in names if n in reg]
    # Oracle ANCHORS (tagged in the registry, round 8) keep COMPLETE
    # band self-joins so DuckDB can replay them — running one on a
    # saturated/scaled corpus measures the anchor contract, not the
    # engine. Surface the capped production twin (named in the
    # anchor's doc) so a sweep never mistakes anchor cost for a
    # scale problem.
    for n in names:
        if "anchor" in reg[n].tags:
            twins = [
                m for m in reg
                if m != n and m in reg[n].doc and "anchor" not in reg[m].tags
            ]
            print(
                f"note: {n} is a correctness ANCHOR (complete band join "
                f"by contract); the production scale path is: "
                f"{', '.join(twins) or 'see its docstring'}",
                flush=True,
            )
    # warmup both dirs
    reg[names[0]].builder(spark, base).limit(1).collect()
    reg[names[0]].builder(spark, out).limit(1).collect()
    probe_log: dict = {}
    base_t = time_queries(spark, reg, names, base, probe_log=probe_log)
    scaled_t = time_queries(spark, reg, names, out, probe_log=probe_log)

    rows = []
    for n in names:
        ratio = scaled_t[n] / base_t[n] if base_t[n] > 0 else float("nan")
        rows.append((n, base_t[n], scaled_t[n], ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"\n{'query':36s} {'1x':>8s} {f'{factor}x':>8s} {'ratio':>7s}")
    for n, b, s, r in rows:
        print(f"{n:36s} {b:8.3f} {s:8.3f} {r:7.2f}")
    total_b = sum(base_t.values())
    total_s = sum(scaled_t.values())
    print(
        f"{'TOTAL':36s} {total_b:8.3f} {total_s:8.3f} "
        f"{total_s / total_b:7.2f}"
    )
    print(
        json.dumps(
            {
                "factor": factor,
                "production_dims": prod_dims,
                "n_queries": len(names),
                "total_base_sec": round(total_b, 2),
                "total_scaled_sec": round(total_s, 2),
                "total_ratio": round(total_s / total_b, 2),
                "worst": [
                    {"query": n, "ratio": round(r, 2)} for n, _, _, r in rows[:5]
                ],
                "probes_all_healthy": all(
                    e["healthy"] for e in probe_log.values()
                ),
                "probes": probe_log,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
