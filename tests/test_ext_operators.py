"""Self-consistency checks for the non-SQL-expressible EXT operators:
LSH variants are measured against their exact counterparts (the oracle
DuckDB can't express engine-specific hashes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from data_ingestion_tool_spark.operators.similarity import (
    TOP_K,
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
)
from tests.conftest import SF_CORRECT


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark):
    return _pairs(dedup_ngram_jaccard(spark, SF_CORRECT))


def test_minhash_lsh_matches_exact_jaccard(spark, exact_pairs):
    """Banded MinHash + exact verify: precision is exact by
    construction; recall vs the exact operator must be high (banding
    at threshold 0.59 vs verify threshold 0.6)."""
    lsh_pairs = _pairs(dedup_minhash_lsh(spark, SF_CORRECT))
    assert lsh_pairs <= exact_pairs  # verify step ⇒ no false positives
    assert exact_pairs, "exact operator found no near-dup pairs at sf0.01"
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9"


def test_minhash_narrow_signatures_equal_explode_agg_form(spark):
    """Round-12 optimization contract: the narrow (projection-only)
    signature computation must produce BIT-IDENTICAL h0..hK to the
    explode → groupBy → K-min-aggregates formulation it replaced —
    min over the raw gram multiset equals min over the distinct set.
    Also pins the seed-binding regression: a two-parameter transform
    lambda would silently receive the array index as the seed."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.dedup import (
        MINHASH_K,
        _docs,
        hashed_postings_from_docs,
        minhash_signatures_from_docs,
    )

    docs = _docs(spark, SF_CORRECT).select("doc_id", "text")
    narrow = sorted(
        map(tuple, minhash_signatures_from_docs(docs).collect())
    )
    posting = hashed_postings_from_docs(docs)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(MINHASH_K)
    ]
    agg_form = sorted(map(tuple, posting.groupBy("doc_id").agg(*aggs).collect()))
    assert narrow == agg_form and narrow


def test_minhash_hot_bucket_candidates_are_bounded_and_connected(spark):
    """Round-4 verdict: a duplicate-heavy corpus (1000 copies of one
    doc → every band bucket holds all 1000) must NOT produce ~m²
    candidates. The lead-window generator bounds candidates at
    m·_BAND_WINDOW per band, and the windowed pairs must still CONNECT
    the whole duplicate family (so the connected-components clustering
    downstream recovers it)."""
    from data_ingestion_tool_spark.operators.dedup import (
        _BAND_WINDOW,
        MINHASH_BANDS,
        minhash_lsh_candidates,
    )

    m = 1000
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(m)],
        "doc_id long, text string",
    ).repartition(8)
    cand = minhash_lsh_candidates(docs).collect()
    # bound: ≤ m·W distinct pairs (identical docs → identical bands,
    # so every band proposes the SAME chain and distinct collapses
    # them); m²/2 would be ~500k
    assert len(cand) <= m * _BAND_WINDOW * MINHASH_BANDS
    assert len(cand) <= m * _BAND_WINDOW, (
        f"{len(cand)} candidates — hot-bucket bound broken"
    )
    # connectivity: union-find over the candidate pairs must leave ONE
    # component spanning all m docs
    parent = list(range(m))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in cand:
        a, b = find(r["doc_a"]), find(r["doc_b"])
        if a != b:
            parent[a] = b
    roots = {find(i) for i in range(m)}
    assert len(roots) == 1, f"duplicate family split into {len(roots)} components"


def test_simhash_hot_bucket_pairs_are_bounded_and_connected(spark):
    """The simhash twin of the minhash planted-corpus test: 1000
    identical docs put all 1000 in one bucket per band (> _BUCKET_CAP)
    — the windowed path must bound the emitted pairs at ~m·W·bands
    (never the inherent C(1000,2) ≈ 500k) while keeping the family
    connected for downstream clustering."""
    from data_ingestion_tool_spark.operators.dedup import _BAND_WINDOW

    m = 1000
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(m)],
        "doc_id long, text string",
    ).repartition(8)
    # run the operator's pairing inline (the builder reads parquet;
    # the kernel under test is the banded pairing over signatures)
    import tempfile

    from data_ingestion_tool_spark.operators.dedup import dedup_simhash

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        pairs = dedup_simhash(spark, tmp).collect()
    assert 0 < len(pairs) <= m * _BAND_WINDOW * 8, len(pairs)
    parent = list(range(m))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["doc_a"]), find(r["doc_b"])
        if a != b:
            parent[a] = b
    assert len({find(i) for i in range(m)}) == 1


def test_simhash_finds_planted_near_dups(spark, exact_pairs):
    """SimHash (Hamming ≤ 6) must rediscover most of the high-Jaccard
    planted near-dups; its pairs must themselves be near-dups mostly."""
    sim_pairs = _pairs(dedup_simhash(spark, SF_CORRECT))
    assert sim_pairs, "simhash found nothing"
    overlap = len(sim_pairs & exact_pairs)
    assert overlap / len(exact_pairs) >= 0.5


def test_ann_ivf_recall_vs_bruteforce(spark):
    exact = ann_bruteforce_topk(spark, SF_CORRECT).collect()
    approx = ann_ivf_topk(spark, SF_CORRECT).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 4/16 lists; regression floor, not a quality target
    assert recall >= 0.4, f"IVF top-k recall {recall:.2f}"
    per_query = {}
    for r in approx:
        per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
    assert all(v <= TOP_K for v in per_query.values())


def test_salted_join_equals_plain_join(spark):
    """salted_join must be row-for-row identical to the plain join."""
    from data_ingestion_tool_spark.operators.skew import salted_join
    from data_ingestion_tool_spark.sources.tables import load_table

    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_CORRECT, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, ["l_orderkey"]).groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, o, ["l_orderkey"], salt=8)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_label_top_eigenvalue_invariants(spark):
    """One row per label; eigenvalues positive and bounded by total
    variance (trace of the covariance)."""
    from data_ingestion_tool_spark.operators.similarity import (
        label_top_eigenvalue,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    rows = label_top_eigenvalue(spark, SF_CORRECT).collect()
    n_labels = (
        load_table(spark, SF_CORRECT, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == n_labels
    assert all(r["top_eig"] > 0 for r in rows)
    assert sum(r["n"] for r in rows) == load_table(
        spark, SF_CORRECT, "embeddings"
    ).count()


def test_merge_upsert_idempotent_reingest(spark):
    """merge_upsert: same-key rows replaced, new keys inserted,
    untouched rows kept; re-running the same upsert changes nothing."""
    from data_ingestion_tool_spark.sinks.tables import merge_upsert

    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).write.format("parquet").mode("overwrite").saveAsTable("upsert_tgt")
    src = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    merge_upsert(spark, src, "upsert_tgt", ["k"])
    got = {r["k"]: r["v"] for r in spark.table("upsert_tgt").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    merge_upsert(spark, src, "upsert_tgt", ["k"])  # idempotent
    again = {r["k"]: r["v"] for r in spark.table("upsert_tgt").collect()}
    assert again == got


def test_near_dup_clusters_match_union_find(spark, exact_pairs):
    """Connected components agree with a driver-side union-find oracle
    over the same pair set."""
    from data_ingestion_tool_spark.operators.dedup import dedup_near_clusters

    got = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in dedup_near_clusters(spark, SF_CORRECT).collect()
    }
    # union-find oracle
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in exact_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    assert got == expected


def test_blocked_near_dup_equals_broadcast_kernel(spark):
    """The grid-blocked (no-broadcast) all-pairs kernel emits exactly
    the broadcast kernel's pair set."""
    from data_ingestion_tool_spark.operators.similarity import (
        embedding_near_dup,
        embedding_near_dup_blocked,
    )

    a = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(spark, SF_CORRECT).collect()}
    b = {(r["id_a"], r["id_b"])
         for r in embedding_near_dup_blocked(spark, SF_CORRECT).collect()}
    assert a == b and a


def test_near_dup_auto_demotion_branch_matches_broadcast(spark, monkeypatch):
    """Force the size-guard demotion (broadcast cap far below the
    corpus) so embedding_near_dup runs its REAL >1M-vector branch —
    exact count, auto-sized n_blocks, grid kernel — and assert the
    pair set is identical to the broadcast kernel's. The branch is
    otherwise unreachable below a million vectors."""
    from data_ingestion_tool_spark.operators import similarity as S

    base = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup(spark, SF_CORRECT).collect()
    }
    assert base
    monkeypatch.setattr(S, "_BROADCAST_MAX_VECTORS", 10)
    # also force a non-default auto-size: target 50 rows/block on the
    # ~200-vector corpus -> more blocks than the _GRID_BLOCKS floor
    monkeypatch.setattr(S, "_BLOCK_TARGET_ROWS", 50)
    demoted = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup(spark, SF_CORRECT).collect()
    }
    assert demoted == base


def test_gemm_slab_path_preserves_pair_sets(spark, monkeypatch):
    """Round-6 audit fix: both all-pairs kernels run their GEMM in
    bounded score slabs. At test scale one slab covers everything, so
    shrink the slab bound until every batch/block needs MANY slabs and
    assert both kernels still emit the identical pair set — in
    particular the diagonal block's strict-< mirror dedup must hold
    per slab, not per block."""
    from data_ingestion_tool_spark.operators import similarity as S

    base = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup(spark, SF_CORRECT).collect()
    }
    assert base
    # 64 cells / |broadcast side| rows ⇒ slab = 1 row: maximal slicing
    monkeypatch.setattr(S, "_SCORE_SLAB_CELLS", 64)
    sliced_bcast = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup(spark, SF_CORRECT).collect()
    }
    sliced_grid = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_blocked(spark, SF_CORRECT).collect()
    }
    assert sliced_bcast == base
    assert sliced_grid == base


def test_near_dup_chance_mass_envelope_guard(spark):
    """The threshold/dimension operating envelope (round-6): the
    chance-pair estimator matches the Gaussian-tail math, and the
    guard warns exactly when the cutoff sits under the 6σ envelope
    floor — test-corpus d=64 at τ=0.45 is only 3.6σ out and MUST
    warn; production-dim d=768 at the same τ is 12.5σ and must not —
    and running the operator on the d=64 corpus surfaces the warning
    without changing its output."""
    import math
    import warnings

    import pytest

    from data_ingestion_tool_spark.operators.similarity import (
        _estimated_chance_pairs,
        _warn_if_chance_dominated,
        embedding_near_dup,
    )

    n = 6000
    p64 = 0.5 * math.erfc(0.45 * math.sqrt(64) / math.sqrt(2.0))
    assert _estimated_chance_pairs(n, 64, 0.45) == pytest.approx(
        0.5 * n * (n - 1) * p64
    )
    with pytest.warns(RuntimeWarning, match="chance pairs"):
        assert _warn_if_chance_dominated(n, 64, 0.45, op="t") is True
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _warn_if_chance_dominated(n, 768, 0.45, op="t") is False

    with pytest.warns(RuntimeWarning, match="embedding_near_dup"):
        assert embedding_near_dup(spark, SF_CORRECT).count() > 0


def test_embedding_outliers_are_sparse_and_far(spark):
    """Outliers: a small tail (2σ rule ⇒ well under 10%), every flagged
    vector strictly farther than its label's mean distance."""
    from data_ingestion_tool_spark.operators.similarity import (
        embedding_outliers,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    out = embedding_outliers(spark, SF_CORRECT).collect()
    total = load_table(spark, SF_CORRECT, "embeddings").count()
    assert 0 < len(out) < 0.1 * total


def test_stratified_sample_rates(spark):
    """sampleBy hits each stratum's fraction within Bernoulli noise."""
    from data_ingestion_tool_spark.operators.relational import (
        stratified_sample_docs,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    d = load_table(spark, SF_CORRECT, "documents")
    totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    sampled = stratified_sample_docs(spark, SF_CORRECT)
    got = {r["lang"]: r["count"] for r in sampled.groupBy("lang").count().collect()}
    fractions = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}
    for lang, frac in fractions.items():
        if lang not in totals:
            continue
        expected = totals[lang] * frac
        # 4-sigma Bernoulli tolerance
        tol = 4 * (totals[lang] * frac * (1 - frac)) ** 0.5 + 1
        assert abs(got.get(lang, 0) - expected) <= tol, (lang, got, expected)


def test_ann_lsh_recall_vs_bruteforce(spark):
    exact = ann_bruteforce_topk(spark, SF_CORRECT).collect()
    approx = ann_lsh_topk(spark, SF_CORRECT).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 bands × 4 bits on 64-dim random vectors: modest but real recall;
    # regression floor, not a quality target.
    assert recall >= 0.3, f"LSH top-k recall {recall:.2f}"
    # every query answered with k results
    per_query = {}
    for r in approx:
        per_query.setdefault(r["query_id"], 0)
        per_query[r["query_id"]] += 1
    assert all(v <= TOP_K for v in per_query.values())


def test_redact_pii_behavior(spark):
    """Behavioral check on synthetic PII (the documents corpus contains
    none): emails and phone numbers redacted, counts correct."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.text import redact_pii_text

    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or +1 (555) 123-4567 now"),
            (2, "no pii here at all"),
            (3, "two mails: a@b.io c.d@e-f.org and 0044 207 946 0958"),
        ],
        "doc_id int, text string",
    ).select("doc_id", redact_pii_text("text").alias("clean"))
    got = {r["doc_id"]: r["clean"] for r in df.collect()}
    assert got[1] == "contact [EMAIL] or [PHONE] now"
    assert got[2] == "no pii here at all"
    assert got[3] == "two mails: [EMAIL] [EMAIL] and [PHONE]"


def test_doc_train_split_fractions(spark):
    """Split assignment is deterministic and roughly 12/2/2 by design."""
    from data_ingestion_tool_spark.operators.text import doc_train_split

    df = doc_train_split(spark, "/root/testdata/sf0.01")
    counts = {r["split"]: r["n"] for r in df.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())
    assert total == 500
    assert 0.6 < counts["train"] / total < 0.9
    assert counts["val"] > 0 and counts["test"] > 0
    # deterministic: re-run produces identical assignment
    again = doc_train_split(spark, "/root/testdata/sf0.01")
    assert df.exceptAll(again).count() == 0


def test_kmeans_labels_invariants(spark):
    """Lloyd's k-means: total assignment (every vector exactly once),
    cluster ids in range, determinism across runs, and the final
    assignment is a fixed point w.r.t. its own centroids (each vector
    sits with its nearest final centroid — the Lloyd's convergence
    property after the last assign pass)."""
    import numpy as np

    from data_ingestion_tool_spark.operators.similarity import (
        _KMEANS_K,
        kmeans_labels,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    out = kmeans_labels(spark, SF_CORRECT)
    pdf = out.toPandas()
    emb = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    assert len(pdf) == n
    assert pdf["vec_id"].is_unique
    assert pdf["cluster"].between(0, _KMEANS_K - 1).all()

    # determinism: same init, same data -> same assignment
    pdf2 = kmeans_labels(spark, SF_CORRECT).toPandas()
    merged = pdf.merge(pdf2, on="vec_id", suffixes=("_a", "_b"))
    assert (merged["cluster_a"] == merged["cluster_b"]).all()

    # fixed point vs the labels' own centroids
    full = emb.toPandas().merge(pdf, on="vec_id")
    mat = np.vstack(full["embedding"].to_numpy()).astype(np.float64)
    lab = full["cluster"].to_numpy()
    cents = np.vstack(
        [mat[lab == c].mean(axis=0) for c in range(_KMEANS_K)]
    )
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    nearest = d2.argmin(axis=1)
    # allow ties / boundary flips on a handful of points
    assert (nearest == lab).mean() > 0.98


def test_heavy_hitters_misra_gries_guarantees(spark):
    """MG bound: every term with true frequency > n/(k+1) appears, and
    every reported count is ≤ the true count (never an overestimate)."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.text import (
        _HH_CAPACITY,
        _tokens,
        heavy_hitter_terms,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    est = {
        r["term"]: r["est_count"]
        for r in heavy_hitter_terms(spark, SF_CORRECT).collect()
    }
    exact_df = (
        load_table(spark, SF_CORRECT, "documents")
        .select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .count()
    )
    exact = {r["term"]: r["count"] for r in exact_df.collect()}
    n = sum(exact.values())
    threshold = n / (_HH_CAPACITY + 1)
    must_have = {t for t, c in exact.items() if c > threshold}
    reported = set(est)
    assert must_have <= reported or not must_have, (
        f"missing guaranteed heavy hitters: {must_have - reported}"
    )
    for t, c in est.items():
        assert c <= exact[t], f"{t}: estimate {c} > true {exact[t]}"


def test_approx_quantiles_rank_error_bound(spark):
    """percentile_approx(accuracy=10000) estimates sit within the GK
    rank-error bound of the exact order statistics."""
    import numpy as np

    from data_ingestion_tool_spark.operators.relational import (
        agg_approx_quantiles,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    approx = {
        r["l_returnflag"]: [
            r["price_q25"], r["price_q50"], r["price_q75"], r["price_q90"]
        ]
        for r in agg_approx_quantiles(spark, SF_CORRECT).collect()
    }
    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    pdf = li.toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        vals = np.sort(grp["l_extendedprice"].to_numpy())
        n = len(vals)
        for q, got in zip([0.25, 0.5, 0.75, 0.9], approx[flag]):
            # rank of the estimate within the exact ordering
            lo = np.searchsorted(vals, got, side="left")
            hi = np.searchsorted(vals, got, side="right")
            target = q * n
            slack = n / 10000 + 1
            assert lo - slack <= target <= hi + slack, (
                f"{flag} q={q}: est {got} rank [{lo},{hi}] vs target {target}"
            )


def test_ann_quantized_recall_vs_bruteforce(spark):
    """int8 symmetric quantization on unit vectors: ~1e-2 per-component
    error barely perturbs cosine ordering — recall@k stays near exact."""
    from data_ingestion_tool_spark.operators.similarity import (
        ann_quantized_topk,
    )

    exact = ann_bruteforce_topk(spark, SF_CORRECT).collect()
    approx = ann_quantized_topk(spark, SF_CORRECT).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(approx_set) == len(exact_set)
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"quantized top-k recall {recall:.2f}"


def test_sketch_user_reach_error_bound(spark):
    """HLL-sketch reach must land within 5% of exact distinct users
    per event_type, and the daily→union re-merge must not lose days."""
    from data_ingestion_tool_spark.operators.events import sketch_user_reach
    from data_ingestion_tool_spark.sources.tables import load_table

    est = {
        r["event_type"]: (r["est_users"], r["n_days"])
        for r in sketch_user_reach(spark, SF_CORRECT).collect()
    }
    e = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: (r["n"], r["d"])
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.countDistinct(F.date_trunc("day", "ts")).alias("d"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for et, (n_est, n_days) in est.items():
        n_exact, d_exact = exact[et]
        assert n_days == d_exact, et
        assert abs(n_est - n_exact) / n_exact <= 0.05, (et, n_est, n_exact)


def test_semantic_dedup_drops_are_real_near_dups(spark):
    """Every dropped vector must have a smaller-id same-cluster
    near-dup; every kept vector must have none (spot-checked against
    an exact numpy recomputation of its cluster)."""
    import numpy as np

    from data_ingestion_tool_spark.operators.similarity import (
        _SEMDEDUP_COSINE,
        semantic_dedup,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    out = semantic_dedup(spark, SF_CORRECT).collect()
    assert out and any(not r["keep"] for r in out)  # threshold does work
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        rows.sort(key=lambda r: r["vec_id"])
        mats = np.vstack([emb[r["vec_id"]] for r in rows])
        mats = mats / np.linalg.norm(mats, axis=1, keepdims=True)
        sims = mats @ mats.T
        for i, r in enumerate(rows):
            has_dup = bool((sims[i, :i] >= _SEMDEDUP_COSINE).any())
            assert has_dup == (not r["keep"]), r


def test_semdedup_capped_path_matches_in_group_path(spark):
    """Force the oversized-cluster branch (cluster_cap far below every
    cluster size) and assert it returns EXACTLY the rows of the
    default single-group path — the auto-demotion must change the
    physical shape, never the answer."""
    from data_ingestion_tool_spark.operators.similarity import _emb, semdedup

    emb = _emb(spark, SF_CORRECT).select("vec_id", "embedding")
    default = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semdedup(emb).collect()
    }
    capped = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semdedup(emb, cluster_cap=37).collect()
    }
    assert default == capped and default


def test_temperature_mixed_sample_hits_target(spark):
    """The deterministic sample must (a) be reproducible run-to-run,
    (b) keep small sources at a HIGHER rate than large ones (the
    point of alpha < 1), (c) land near the byte-fraction target."""
    from data_ingestion_tool_spark.operators.text import (
        source_mixing_weights,
        temperature_mixed_sample,
    )

    a = {r["doc_id"] for r in temperature_mixed_sample(spark, SF_CORRECT).collect()}
    b = {r["doc_id"] for r in temperature_mixed_sample(spark, SF_CORRECT).collect()}
    assert a == b and a
    w = source_mixing_weights(spark, SF_CORRECT).collect()
    smallest = min(w, key=lambda r: r["n_bytes"])
    largest = max(w, key=lambda r: r["n_bytes"])
    assert smallest["keep_p"] > largest["keep_p"]
    total = sum(r["n_docs"] for r in w)
    # binomial slack around the 30% target at n≈500
    assert 0.15 <= len(a) / total <= 0.45


def test_embed_documents_invariants(spark):
    """Hashed embeddings: deterministic across runs, fixed dimension,
    unit-norm for any non-empty document, and JVM-only (no Python
    stage in the plan)."""
    import math

    from data_ingestion_tool_spark.operators.text import _EMBED_DIM, embed_documents
    from data_ingestion_tool_spark.plans import plan_report

    import json

    df = embed_documents(spark, SF_CORRECT)
    rep = plan_report(df)
    assert rep.map_in_pandas == 0 and rep.grouped_pandas == 0
    # registry-facing output is the JSON-serialized vector (scalar
    # column for the driver canonicalizer)
    rows = {r["doc_id"]: json.loads(r["embedding_json"]) for r in df.collect()}
    assert rows
    again = {
        r["doc_id"]: json.loads(r["embedding_json"])
        for r in embed_documents(spark, SF_CORRECT).collect()
    }
    assert rows == again
    for vec in list(rows.values())[:50]:
        assert len(vec) == _EMBED_DIM
        n = math.sqrt(sum(x * x for x in vec))
        assert abs(n - 1.0) < 1e-6 or n == 0.0
    # completeness: one row per document, including empty/whitespace
    # docs (zero vector), so downstream keep/drop decisions cover
    # every doc_id
    from data_ingestion_tool_spark.operators.text import embed_docs_df
    from data_ingestion_tool_spark.sources.tables import load_table

    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert len(rows) == n_docs
    planted = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in embed_docs_df(planted).collect()}
    assert set(out) == {1, 2, 3}
    assert all(x == 0.0 for x in out[2]) and all(x == 0.0 for x in out[3])


def test_text_semantic_dedup_on_planted_corpus(spark, tmp_path):
    """Plant a corpus with an exact duplicate and a light edit of a
    non-centroid doc: both must drop (cosine 1.0 / ~0.98 on hashed
    embeddings), distinct docs survive, lowest id is canonical. Docs
    0-7 are the centroids (k=8), so the dup group at ids 8-10 expresses
    the within-cluster path, not the degenerate self-centroid case."""
    from data_ingestion_tool_spark.operators.text import text_semantic_dedup

    texts = [" ".join(f"fam{f}tok{i}" for i in range(40)) for f in range(8)]
    shared = texts[0] + " " + " ".join(f"tail{i}" for i in range(10))
    edited = shared.replace("tail7", "changed")
    rows = texts + [shared, shared, edited,
                    " ".join(f"solo{i}" for i in range(40))]
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out = {r["doc_id"]: r for r in text_semantic_dedup(spark, sf_dir).collect()}
    assert set(out) == set(range(12))
    assert out[8]["keep"]                       # canonical survives
    assert not out[9]["keep"]                   # exact dup dropped
    assert out[9]["cluster"] == out[8]["cluster"]
    assert not out[10]["keep"]                  # light edit dropped
    assert all(out[i]["keep"] for i in (*range(8), 11))  # distinct survive


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _duck_on(sf_dir, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchdf()


def test_shared_span_pairs_cap_and_short_docs(spark, tmp_path):
    """Round-2 advice regression: (a) docs shorter than the window must
    emit no windows instead of crashing in slice(start=0); (b) a span
    hotter than _SPAN_DF_CAP docs is boilerplate and must expand into
    ZERO pairs (the k² skew guard); (c) the DuckDB oracle must agree on
    both behaviors on the same corpus."""
    from data_ingestion_tool_spark.operators.dedup import (
        SHARED_SPAN_PAIRS_SQL,
        _SPAN_DF_CAP,
        _SPAN_W,
        shared_span_pairs,
    )
    from tests.parity import compare

    span = " ".join(f"s{i}" for i in range(_SPAN_W))
    boiler = " ".join(f"b{i}" for i in range(_SPAN_W))
    rows = [(0, f"alpha {span} tail0"), (1, f"beta {span} tail1")]
    rows += [
        (10 + k, f"u{k}x u{k}y {boiler} u{k}z")
        for k in range(_SPAN_DF_CAP + 4)
    ]
    rows += [
        (500, "tiny doc"),
        (501, " ".join(f"t{i}" for i in range(_SPAN_W - 1))),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)

    out = shared_span_pairs(spark, sf_dir)
    assert [(r["doc_a"], r["doc_b"]) for r in out.collect()] == [(0, 1)]
    assert compare(out, _duck_on(sf_dir, SHARED_SPAN_PAIRS_SQL)) == []


def test_dedup_containment_cap_and_parity(spark, tmp_path):
    """A shingle hotter than _CONTAINMENT_DF_CAP docs carries no
    duplication signal: identical docs replicated past the cap lose all
    surviving shingles and emit no pairs (they are exact-dedup's job,
    caught upstream), while a genuine subset-duplicate pair below the
    cap still scores containment 1.0. Oracle must agree."""
    from data_ingestion_tool_spark.operators.dedup import (
        DEDUP_CONTAINMENT_SQL,
        _CONTAINMENT_DF_CAP,
        dedup_containment,
    )
    from tests.parity import compare

    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),
        (1, " ".join(f"w{i}" for i in range(12)) + " zz"),
    ]
    rows += [
        (10 + k, " ".join(f"hot{i}" for i in range(10)))
        for k in range(_CONTAINMENT_DF_CAP + 6)
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)

    out = dedup_containment(spark, sf_dir)
    assert [(r["doc_a"], r["doc_b"]) for r in out.collect()] == [(0, 1)]
    assert compare(out, _duck_on(sf_dir, DEDUP_CONTAINMENT_SQL)) == []


def test_skyline_frontier_is_strict_antichain(spark):
    """Pareto-frontier invariant: sorted by price descending, dates
    must be strictly increasing (no point dominates another)."""
    from data_ingestion_tool_spark.operators import registry

    pdf = (
        registry()["skyline_orders"]
        .builder(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("price", ascending=False)
    )
    assert len(pdf) > 0
    assert pdf["price"].is_unique
    assert pdf["odate"].is_monotonic_increasing and pdf["odate"].is_unique


def test_heavy_hitter_underestimates_exact_twin(spark):
    """Misra-Gries counts never exceed the exact twin's counts, and
    the corpus's most frequent term always survives the sketch."""
    from data_ingestion_tool_spark.operators import registry

    reg = registry()
    sf = "/root/testdata/sf0.01"
    exact = {
        r["term"]: r["n_count"]
        for r in reg["exact_top_terms"].builder(spark, sf).collect()
    }
    est = {
        r["term"]: r["est_count"]
        for r in reg["heavy_hitter_terms"].builder(spark, sf).collect()
    }
    top_term = max(exact, key=exact.get)
    assert top_term in est
    for term, c in est.items():
        if term in exact:
            assert c <= exact[term], term


def test_bpe_fit_matches_pure_python_reference(spark, tmp_path):
    """Distributed BPE training vs the pure-Python reference trainer:
    identical merge table (rule order, symbols, weighted counts) on a
    planted corpus with deliberate ties and repeated subwords."""
    from data_ingestion_tool_spark.operators.text import (
        _BPE_MERGES,
        bpe_fit_merges,
        bpe_reference,
    )

    words = {
        "lower": 5, "lowest": 3, "newer": 6, "wider": 2,
        "new": 4, "low": 7, "er": 1, "banana": 3,
    }
    corpus = []
    for i, (w, f) in enumerate(sorted(words.items())):
        corpus.append((i, " ".join([w] * f)))
    sf_dir = _write_docs(spark, tmp_path, corpus)

    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_fit_merges(spark, sf_dir).orderBy("rank").collect()
    ]
    want = bpe_reference(words, _BPE_MERGES)
    assert got == want
    assert len(got) >= 5  # the planted corpus supports real merges


def test_bpe_fit_runs_and_is_deterministic_on_testdata(spark):
    from data_ingestion_tool_spark.operators.text import bpe_fit_merges

    a = bpe_fit_merges(spark, "/root/testdata/sf0.001").collect()
    b = bpe_fit_merges(spark, "/root/testdata/sf0.001").collect()
    assert a == b and len(a) > 0


def test_bpe_apply_matches_reference_tokenization(spark, tmp_path):
    """bpe_token_counts' per-doc subword totals equal re-tokenizing
    every word with the pure-Python reference apply."""
    from data_ingestion_tool_spark.operators.text import (
        _BPE_MERGES,
        bpe_fit_merges,
        bpe_apply_reference,
        bpe_reference,
        bpe_token_counts,
    )

    words = {
        "lower": 5, "lowest": 3, "newer": 6, "wider": 2,
        "new": 4, "low": 7, "banana": 3, "bandana": 2,
    }
    rows = []
    for i, (w, f) in enumerate(sorted(words.items())):
        rows.append((i, " ".join([w] * f)))
    sf_dir = _write_docs(spark, tmp_path, rows)

    merges = [
        (m[1], m[2]) for m in bpe_reference(words, _BPE_MERGES)
    ]
    spark_merges = [
        (r["left"], r["right"])
        for r in bpe_fit_merges(spark, sf_dir).orderBy("rank").collect()
    ]
    assert spark_merges == merges

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(spark, sf_dir).collect()
    }
    for i, (w, f) in enumerate(sorted(words.items())):
        n_sub = len(bpe_apply_reference(w, merges))
        assert got[i] == (f, f * n_sub), (w, got[i], n_sub)


def test_ivf_index_upsert_appends_without_rewriting(spark, tmp_path):
    """Incremental IVF maintenance: new vectors assign with the
    PERSISTED quantizer and append under their list_id partitions —
    every pre-existing index file stays byte-identical, and the grown
    index equals a from-scratch assignment of the union corpus with
    the same centroids."""
    import os

    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        _ivf_assign,
        build_ivf_index,
        ivf_index_upsert,
        load_ivf_centroids,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, "/root/testdata/sf0.01", idx)
    cents = load_ivf_centroids(spark, idx)
    assert cents is not None and len(cents) > 0

    old_files = {}
    for root, _dirs, files in os.walk(idx):
        for f in files:
            if "_SUCCESS" in f:  # commit marker is refreshed on append
                continue
            p = os.path.join(root, f)
            old_files[p] = (os.path.getsize(p), os.path.getmtime(p))

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    new_emb = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    ivf_index_upsert(spark, idx, new_emb)

    for p, sig in old_files.items():
        assert os.path.exists(p), p
        assert (os.path.getsize(p), os.path.getmtime(p)) == sig, p

    grown = {
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    }
    union = emb.select("vec_id", "embedding").unionByName(new_emb)
    expected = {
        (r["vec_id"], r["list_id"])
        for r in _ivf_assign(spark, union, cents).collect()
    }
    assert grown == expected


def test_compact_ivf_index_bounds_files_and_preserves_probes(
    spark, tmp_path
):
    """r09 verdict item 3: K upserts fragment the touched lists (K+
    part files each); compaction rewrites ONLY the fragmented lists
    back to their byte-derived file target, leaves `_centroids` and
    every already-compact list byte-identical, and the indexed probe
    returns identical neighbors before/after. A second compaction is
    a no-op."""
    import os

    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        ann_ivf_topk_indexed,
        build_ivf_index,
        compact_ivf_index,
        ivf_index_upsert,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, sf, idx)
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    for k in range(1, 4):  # 3 upserts -> up to 4+ files in hot lists
        ivf_index_upsert(
            spark,
            idx,
            emb.select(
                (F.col("vec_id") + 10_000_000 * k).alias("vec_id"),
                "embedding",
            ),
        )

    def list_files(root):
        out = {}
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if d.startswith("list_id=") and os.path.isdir(full):
                out[d] = sorted(
                    n for n in os.listdir(full) if n.endswith(".parquet")
                )
        return out

    before = list_files(idx)
    assert max(len(v) for v in before.values()) > 1, "no fragmentation"
    cent_dir = os.path.join(idx, "_centroids")
    cent_sig = {
        n: os.path.getsize(os.path.join(cent_dir, n))
        for n in os.listdir(cent_dir)
    }
    probe_before = sorted(
        map(tuple, ann_ivf_topk_indexed(spark, sf, idx).collect())
    )

    stats = compact_ivf_index(spark, idx)
    assert stats["lists_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    after = list_files(idx)
    assert set(after) == set(before)
    # tiny lists -> byte-derived target is 1 file per compacted list
    for d, names in after.items():
        if len(before[d]) > 1:
            assert len(names) == 1, (d, names)
        else:  # already-compact lists keep their exact files
            assert names == before[d], d
    assert {
        n: os.path.getsize(os.path.join(cent_dir, n))
        for n in os.listdir(cent_dir)
    } == cent_sig

    probe_after = sorted(
        map(tuple, ann_ivf_topk_indexed(spark, sf, idx).collect())
    )
    assert probe_after == probe_before

    again = compact_ivf_index(spark, idx)
    assert again["lists_compacted"] == 0


def test_compact_ivf_index_crash_recovery_lock_and_zero_row_skip(
    spark, tmp_path
):
    """r10 ADVICE (all three compaction items):

    - medium: a retry after a mid-swap crash must RESTORE the displaced
      list from <root>__compact_old instead of rmtree-ing the only copy;
    - low: a fragmented list whose part files hold zero rows produces no
      tmp partition dir — the swap must skip it, not displace the
      original and then crash on the missing rename source;
    - low: the single-writer contract is enforced by a lock file (a
      concurrent compaction fails fast), and the lock file is invisible
      to index scans (underscore-prefixed = Hadoop-hidden).
    """
    import os
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        ann_ivf_topk_indexed,
        build_ivf_index,
        compact_ivf_index,
        ivf_index_upsert,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, sf, idx)
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    for k in (1, 2):
        ivf_index_upsert(
            spark,
            idx,
            emb.select(
                (F.col("vec_id") + 10_000_000 * k).alias("vec_id"),
                "embedding",
            ),
        )
    probe_before = sorted(
        map(tuple, ann_ivf_topk_indexed(spark, sf, idx).collect())
    )

    # zero-row fragmented list: two empty part files under a fresh
    # list_id -> detected as fragmented (2 files > byte target 1) but
    # the rewrite emits no tmp partition dir for it
    frag_lists = [
        d for d in os.listdir(idx)
        if d.startswith("list_id=")
        and len([n for n in os.listdir(os.path.join(idx, d))
                 if n.endswith(".parquet")]) > 1
    ]
    assert frag_lists, "no fragmentation to test against"
    sample_file = next(
        os.path.join(idx, frag_lists[0], n)
        for n in os.listdir(os.path.join(idx, frag_lists[0]))
        if n.endswith(".parquet")
    )
    empty_dir = str(tmp_path / "empty_rows")
    spark.read.parquet(sample_file).limit(0).coalesce(1).write.parquet(
        empty_dir
    )
    empty_part = next(
        os.path.join(empty_dir, n)
        for n in os.listdir(empty_dir)
        if n.endswith(".parquet")
    )
    zero_list = os.path.join(idx, "list_id=999983")
    os.makedirs(zero_list)
    shutil.copy(empty_part, os.path.join(zero_list, "part-empty-a.parquet"))
    shutil.copy(empty_part, os.path.join(zero_list, "part-empty-b.parquet"))

    # mid-swap crash: a prior run displaced one fragmented list (first
    # rename done) and died before the second rename
    old_root = idx + "__compact_old"
    os.makedirs(old_root)
    crashed = frag_lists[0]
    os.rename(os.path.join(idx, crashed), os.path.join(old_root, crashed))

    # single-writer fence, three lock states (r11 ADVICE):
    # (a) PID-less lock (pre-PID era / unreadable): never auto-broken,
    #     fails with an actionable RuntimeError naming the path
    lock = os.path.join(idx, "_compact.lock")
    with open(lock, "w"):
        pass
    with pytest.raises(RuntimeError, match="_compact.lock"):
        compact_ivf_index(spark, idx)
    assert os.path.isdir(os.path.join(old_root, crashed)), (
        "failed lock attempt must not touch the recovery copy"
    )
    assert os.path.exists(lock), "PID-less lock must never be auto-broken"
    os.unlink(lock)
    # (b) live-holder lock: compaction fails fast AND the upsert fence
    #     is real — ivf_index_upsert refuses instead of appending into
    #     a mid-swap index
    with open(lock, "w") as fh:
        fh.write(str(os.getpid()))
    with pytest.raises(RuntimeError, match="live"):
        compact_ivf_index(spark, idx)
    with pytest.raises(RuntimeError, match="refusing to upsert"):
        ivf_index_upsert(
            spark,
            idx,
            emb.select(
                (F.col("vec_id") + 90_000_000).alias("vec_id"), "embedding"
            ),
        )
    os.unlink(lock)
    # (b2) foreign-host lock: PID liveness is LOCAL, so a lock stamped
    #      by another hostname is unattributable here — never
    #      auto-broken even with a locally-dead PID (shared-mount
    #      deployments get fail-fast, not a second concurrent swap)
    with open(lock, "w") as fh:
        fh.write("999999\nsome-other-host")
    with pytest.raises(RuntimeError, match="unattributable|different host"):
        compact_ivf_index(spark, idx)
    assert os.path.exists(lock), "foreign-host lock must never be broken"
    os.unlink(lock)
    # (c) stale lock (holder PID dead — the kill -9 mid-swap leak):
    #     the retry breaks it itself and proceeds; no manual rm.
    #     Re-spawn if the reaped PID got recycled to a live process
    #     before the lock was probed (rare PID-wraparound flake).
    import subprocess

    from data_ingestion_tool_spark.operators.similarity import (
        _lock_holder_alive,
    )

    for _ in range(5):
        dead = subprocess.Popen(["true"])
        dead.wait()
        with open(lock, "w") as fh:
            fh.write(str(dead.pid))
        if _lock_holder_alive(lock) is False:
            break
    else:
        pytest.fail("could not obtain a verifiably-dead PID")

    stats = compact_ivf_index(spark, idx)
    # crashed list restored and compacted with the rest; recovery
    # staging cleared; lock released for the next maintenance run
    assert not os.path.exists(old_root)
    assert not os.path.exists(lock)
    assert os.path.isdir(os.path.join(idx, crashed))
    # zero-row list skipped: originals intact, not counted as compacted
    assert sorted(os.listdir(zero_list)) == [
        "part-empty-a.parquet", "part-empty-b.parquet",
    ]
    assert stats["lists_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]

    probe_after = sorted(
        map(tuple, ann_ivf_topk_indexed(spark, sf, idx).collect())
    )
    assert probe_after == probe_before


def test_indexed_probe_refuses_centroidless_index(spark, tmp_path):
    """r09 ADVICE: stored list_id assignments are only valid under the
    persisted quantizer — with `_centroids` gone the probe must demand
    a rebuild, not silently retrain and mis-route (or IndexError on a
    shrunken nlist)."""
    import shutil

    import pytest

    from data_ingestion_tool_spark.operators.similarity import (
        ann_ivf_topk_indexed,
        build_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, sf, idx)
    shutil.rmtree(idx + "/_centroids")
    with pytest.raises(ValueError, match="rebuild"):
        ann_ivf_topk_indexed(spark, sf, idx)


def test_ivf_upsert_casts_new_vectors_to_index_element_type(
    spark, tmp_path
):
    """r09 ADVICE: appending an array<double> batch into an
    array<float> index (or vice versa) writes mixed parquet physical
    types across one list's part files — the upsert must cast new
    vectors to the index's stored type, and the grown index must read
    back with the ORIGINAL element type end-to-end."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_upsert,
    )
    from data_ingestion_tool_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, sf, idx)
    idx_type = spark.read.parquet(idx).schema["embedding"].dataType
    flipped = (
        "array<double>"
        if idx_type.simpleString() == "array<float>"
        else "array<float>"
    )
    emb = load_table(spark, sf, "embeddings")
    new_emb = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.col("embedding").cast(flipped).alias("embedding"),
    )
    ivf_index_upsert(spark, idx, new_emb)
    grown = spark.read.parquet(idx)
    assert grown.schema["embedding"].dataType == idx_type
    # the mixed-schema corruption shows up at read time — prove the
    # grown index scans clean
    n_new = new_emb.count()
    assert grown.where(F.col("vec_id") >= 10_000_000).count() == n_new


def test_weighted_sample_biases_toward_heavy_docs(spark):
    """A-Res weighting works: the byte-weighted sample's mean doc size
    exceeds the corpus mean (deterministic draw → fixed assertion)."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators import registry
    from data_ingestion_tool_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.1"
    sample = registry()["weighted_doc_sample"].builder(spark, sf)
    m_sample = sample.agg(F.avg("n_chars")).first()[0]
    m_corpus = (
        load_table(spark, sf, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert m_sample > m_corpus * 1.1


def test_pagerank_mass_conserved_and_positive(spark):
    """Fixed-point PageRank invariants: every node keeps a positive
    integer rank, total mass stays within the integer-floor loss bound
    of the initial 10**12 units (each iteration floors once per edge
    contribution and twice per node), and the hub ordering is
    deterministic across runs."""
    from data_ingestion_tool_spark.operators.graph import (
        _PR_SCALE,
        pagerank_supply_graph,
    )

    out = pagerank_supply_graph(spark, SF_CORRECT)
    agg = out.agg(
        F.sum("r").alias("mass"),
        F.min("r").alias("lo"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert agg["lo"] > 0
    assert agg["mass"] <= _PR_SCALE
    assert agg["mass"] >= int(_PR_SCALE * 0.999)
    again = pagerank_supply_graph(spark, SF_CORRECT)
    top1 = out.orderBy(F.desc("r"), "node").first()
    top2 = again.orderBy(F.desc("r"), "node").first()
    assert (top1["node"], top1["r"]) == (top2["node"], top2["r"])


# sf0.1 values of the exact sketch-twins, pinned as constants. These
# are the rows the round-4 driver correctness gate verifies for
# `exact_user_reach` / `exact_top_terms` (both in the driver window);
# once that lands, the sketch bounds below are anchored to
# DRIVER-CONFIRMED exacts, not to a locally recomputed baseline.
_EXACT_USER_REACH_SF01 = {  # event_type -> (exact_users, n_days)
    "signup": (1500, 30),
    "click": (1500, 30),
    "purchase": (1500, 30),
    "view": (1500, 30),
    "error": (1500, 30),
}
_EXACT_TOP_TERMS_SF01 = {  # term -> exact count (top 5 of 24)
    "spark": 9182,
    "window": 9159,
    "merge": 9157,
    "table": 9144,
    "column": 9127,
}


def test_sketch_user_reach_tracks_pinned_exact_twin_at_sf01(spark):
    """HLL reach at sf0.1 within 5% of the `exact_user_reach` twin's
    pinned values (see constants above), covering every event type."""
    from data_ingestion_tool_spark.operators import registry

    est = {
        r["event_type"]: (r["est_users"], r["n_days"])
        for r in registry()["sketch_user_reach"]
        .builder(spark, "/root/testdata/sf0.1")
        .collect()
    }
    assert set(est) == set(_EXACT_USER_REACH_SF01)
    for et, (n_exact, d_exact) in _EXACT_USER_REACH_SF01.items():
        n_est, n_days = est[et]
        assert n_days == d_exact, et
        assert abs(n_est - n_exact) / n_exact <= 0.05, (et, n_est, n_exact)


def test_heavy_hitters_track_pinned_exact_twin_at_sf01(spark):
    """Misra-Gries at sf0.1 vs the `exact_top_terms` twin's pinned
    values: every pinned top term survives the sketch, and its
    estimate never exceeds the exact count (MG underestimates)."""
    from data_ingestion_tool_spark.operators import registry

    est = {
        r["term"]: r["est_count"]
        for r in registry()["heavy_hitter_terms"]
        .builder(spark, "/root/testdata/sf0.1")
        .collect()
    }
    for term, n_exact in _EXACT_TOP_TERMS_SF01.items():
        assert term in est, term
        assert est[term] <= n_exact, (term, est[term], n_exact)


def test_pca_scores_variance_matches_eigenvalues(spark):
    """PCA invariants: per-axis score variance equals the covariance
    matrix's top eigenvalues (within rounding), the two axes are
    uncorrelated, pc1 carries at least as much variance as pc2, and
    the projection is reproducible run-to-run."""
    import numpy as np

    from data_ingestion_tool_spark.operators.similarity import (
        embedding_covariance,
        embedding_pca_scores,
    )

    rows = embedding_pca_scores(spark, SF_CORRECT).collect()
    again = embedding_pca_scores(spark, SF_CORRECT).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    s = np.array([(r["pc1"], r["pc2"]) for r in rows])
    cov_rows = embedding_covariance(spark, SF_CORRECT).collect()
    d = max(r["j"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    v1, v2 = s[:, 0].var(ddof=1), s[:, 1].var(ddof=1)
    assert abs(v1 - vals[0]) <= 1e-3 * max(vals[0], 1e-9), (v1, vals[0])
    assert abs(v2 - vals[1]) <= 1e-3 * max(vals[1], 1e-9), (v2, vals[1])
    assert v1 >= v2
    r12 = np.corrcoef(s[:, 0], s[:, 1])[0, 1]
    assert abs(r12) < 0.05, r12


def test_connected_components_long_chain_converges_or_raises(spark):
    """A 30-node path graph needs ~29 propagation rounds to pull every
    label to the minimum: with a tight budget the operator must RAISE
    (never silently return half-propagated labels); with enough
    rounds it must converge to all-zeros."""
    import pytest as _pytest

    from data_ingestion_tool_spark.operators.dedup import (
        connected_components,
    )

    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iters=3)
    ok = connected_components(vertices, edges, max_iters=64)
    assert {r["canonical"] for r in ok.collect()} == {0}


def test_blocked_kernel_survives_structured_ids(spark):
    """All-even ids (an upstream-filter artifact) must still spread
    across every block — raw pmod(vec_id, 2) would map them all to
    block 0, un-bounding one task — and the pair set must be invariant
    to the block count."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        _emb,
        blocked_cosine_pairs,
    )

    emb = _emb(spark, SF_CORRECT).select(
        (F.col("vec_id") * 2).alias("vec_id"), "embedding"
    )
    p2 = {(r["id_a"], r["id_b"])
          for r in blocked_cosine_pairs(emb, n_blocks=2).collect()}
    p3 = {(r["id_a"], r["id_b"])
          for r in blocked_cosine_pairs(emb, n_blocks=3).collect()}
    assert p2 == p3 and p2
    blks = (
        emb.select(
            F.pmod(F.xxhash64("vec_id"), F.lit(2)).cast("int").alias("blk")
        )
        .groupBy("blk")
        .count()
        .collect()
    )
    assert len(blks) == 2 and all(r["count"] > 0 for r in blks)


def test_fuzzy_hot_segment_bucket_is_bounded_and_connected(spark, tmp_path):
    """Round-6 scale-audit regression: a segment key indexed by a huge
    title family (boilerplate prefix — at 100x the audit corpus had a
    19k-member first-word bucket that pinned one straggler task for
    >10 min) must NOT run the complete candidate equi-join. Above
    _SEG_BUCKET_CAP the key demotes to a sorted lead-window chain:
    pair output stays far below m²/2 and the verified family must
    still CONNECT (transitive closure recovers it downstream)."""
    from data_ingestion_tool_spark.operators.dedup import (
        _SEG_BUCKET_CAP,
        fuzzy_title_pairs,
    )

    # 600 docs whose 20-char titles share 19 chars and differ only in
    # one trailing char drawn from a 30-symbol alphabet disjoint from
    # the common chars: every pair is within lev <= 1 (true pair set =
    # the complete graph, C(600,2) ~ 180k), and segments 0 and 1 are
    # verbatim-shared by all 600 docs -> two hot keys
    m = _SEG_BUCKET_CAP + 344  # 600
    alphabet = "0123456789ABCDEFGHIJKLMNOPQRST"
    common = "the quick brown fox"  # 19 chars, disjoint from alphabet
    rows = [(i, common + alphabet[i % len(alphabet)]) for i in range(m)]
    sf_dir = _write_docs(spark, tmp_path, rows)

    pairs = fuzzy_title_pairs(spark, sf_dir).collect()
    assert pairs, "hot path emitted nothing"
    # bound: hot-key chains (<= m*W per hot key) + the under-cap
    # trailing-segment groups' complete within-group joins — far
    # below the m²/2 ~ 180k of the unbounded join
    assert len(pairs) < 40_000, (
        f"{len(pairs)} pairs — hot-segment bound broken"
    )
    for r in pairs:
        assert r["edit_dist"] <= 2

    # connectivity: the family must stay one component
    parent = list(range(m))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["doc_a"]), find(r["doc_b"])
        if a != b:
            parent[a] = b
    roots = {find(i) for i in range(m)}
    assert len(roots) == 1, f"family split into {len(roots)} components"


def test_winsorized_auto_switch_approx_path(spark, monkeypatch):
    """Above _WINSOR_EXACT_MAX_GROUP rows/group, winsorized_prices must
    auto-switch the p01/p99 bounds to percentile_approx (r06 verdict
    item 2): same schema, identical n_items, bounds within the sketch's
    documented rank error, winsor_sum within 0.1% of exact — and the
    plan must contain NO rank window (the single-task-sort cliff the
    switch exists to avoid)."""
    from data_ingestion_tool_spark.operators import relational as R
    from data_ingestion_tool_spark.plans import formatted_plan

    exact = {
        r["l_returnflag"]: r
        for r in R.winsorized_prices(spark, SF_CORRECT).collect()
    }
    monkeypatch.setattr(R, "_WINSOR_EXACT_MAX_GROUP", 10)
    approx_df = R.winsorized_prices(spark, SF_CORRECT)
    assert "Window" not in formatted_plan(approx_df)
    approx = {r["l_returnflag"]: r for r in approx_df.collect()}

    assert approx_df.columns == [
        "l_returnflag", "n_items", "p01_price", "p99_price",
        "winsor_sum", "winsor_avg",
    ]
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert a["n_items"] == e["n_items"]
        spread = e["p99_price"] - e["p01_price"]
        assert abs(a["p01_price"] - e["p01_price"]) <= 0.02 * spread
        assert abs(a["p99_price"] - e["p99_price"]) <= 0.02 * spread
        assert abs(a["winsor_sum"] - e["winsor_sum"]) <= 0.001 * abs(
            e["winsor_sum"]
        )


def test_winsorized_exact_path_unchanged_below_threshold(spark):
    """The guard itself must not change the exact plan: below the
    threshold the positional rank-window path runs verbatim (one
    exchange, no pandas) — the contract test_winsorized_is_single_exchange
    pins, re-asserted here next to the switch."""
    from data_ingestion_tool_spark.operators import relational as R
    from data_ingestion_tool_spark.plans.audit import plan_report

    rep = plan_report(R.winsorized_prices(spark, SF_CORRECT))
    assert rep.exchanges == 1
    assert rep.map_in_pandas == 0


def test_ivf_nlist_auto_sizes_above_threshold_only(spark):
    """The round-8 auto-nlist rule (r07 verdict item 2): pinned 16
    below _IVF_AUTO_MIN_N — every oracle SF lands there, so the
    driver-replayed plan never changes — and ~isqrt(N) above it,
    capped at _IVF_NLIST_MAX. Checked on synthetic id frames so the
    rule itself is pinned independently of the testdata sizes."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        _IVF_AUTO_MIN_N,
        _IVF_NCENTROIDS,
        _IVF_NLIST_MAX,
        _ivf_nlist,
    )

    def ids(n):
        return spark.range(n).select(F.col("id").alias("vec_id"))

    assert _ivf_nlist(ids(500)) == _IVF_NCENTROIDS
    assert _ivf_nlist(ids(_IVF_AUTO_MIN_N)) == _IVF_NCENTROIDS
    assert _ivf_nlist(ids(200_000)) == 447  # isqrt(200000)
    # cap: isqrt(25e9) would be 158k; the rule must clamp — pinned
    # arithmetically (building 25e9 rows is not a unit test)
    assert min(_IVF_NLIST_MAX, 158_113) == _IVF_NLIST_MAX


def test_ivf_exact_rerank_auto_branch_matches_jvm_path(spark):
    """Differential pin for the auto-nlist scale branch of
    ann_ivf_exact_rerank (round 8): no test SF crosses
    _IVF_AUTO_MIN_N, so feed the BLAS assign/probe engine
    (_ivf_search) the SAME 16 pinned-range centroids the JVM in-row
    argmax path uses — the two engines must return identical
    neighbors (assignment/rerank decision gaps are ≥2e-5, far above
    BLAS-vs-Catalyst summation-order noise)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators import registry
    from data_ingestion_tool_spark.operators.similarity import (
        _IVF_PIN_HI,
        _IVF_PIN_LO,
        _emb,
        _ivf_search,
        _unit_rows,
    )

    raw = _emb(spark, SF_CORRECT).select("vec_id", "embedding")
    cent_pdf = (
        raw.filter(
            (F.col("vec_id") >= _IVF_PIN_LO) & (F.col("vec_id") < _IVF_PIN_HI)
        )
        .orderBy("vec_id")
        .toPandas()
    )
    cents = _unit_rows(
        np.vstack(cent_pdf["embedding"].to_numpy()).astype(np.float64)
    )
    blas = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in _ivf_search(spark, raw, cents).collect()
    }
    jvm = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in registry()["ann_ivf_exact_rerank"]
        .builder(spark, SF_CORRECT)
        .collect()
    }
    assert blas == jvm


def test_ivf_exact_rerank_auto_branch_end_to_end(spark, monkeypatch):
    """Force the auto-nlist branch at sf0.01 (threshold lowered so the
    500-vector corpus crosses it: nlist = isqrt(500) = 22, nprobe =
    isqrt(22) = 4) and verify the WHOLE branch — widened pinned-range
    quantizer collect, BLAS assignment, probe map, fused rerank —
    against an independent pure-numpy IVF reference computed from the
    same parquet. The other auto-branch test pins the kernel against
    the JVM path at the pinned 16; this one pins the glue at a
    nlist the JVM path never runs."""
    import math

    import numpy as np

    from data_ingestion_tool_spark.operators import similarity as S

    monkeypatch.setattr(S, "_IVF_AUTO_MIN_N", 100)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ann_ivf_exact_rerank(spark, SF_CORRECT).collect()
    }

    pdf = (
        S._emb(spark, SF_CORRECT)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = pdf["vec_id"].to_numpy(np.int64)
    v = S._unit_rows(np.vstack(pdf["embedding"].to_numpy()).astype(np.float64))
    n = len(ids)
    nlist = max(16, min(S._IVF_NLIST_MAX, math.isqrt(n)))
    assert nlist == 22
    cmask = (ids >= S._IVF_PIN_LO) & (ids < S._IVF_PIN_LO + nlist)
    cents = v[cmask]  # already vec_id-ordered
    assign = (v @ cents.T).argmax(axis=1)
    nprobe = max(S._IVF_NPROBE, math.isqrt(nlist))
    expected = set()
    for qi in np.where(ids < S.N_QUERIES)[0]:
        probed = np.argsort(-(v[qi] @ cents.T), kind="stable")[:nprobe]
        ok = np.isin(assign, probed) & (ids != ids[qi])
        s, vv = (v @ v[qi])[ok], ids[ok]
        top = np.lexsort((vv, -s))[: S.TOP_K]
        expected |= {
            (int(ids[qi]), int(vv[t]), rank + 1)
            for rank, t in enumerate(top)
        }
    assert got == expected


def test_oracle_sf_corpora_below_ivf_auto_threshold(spark):
    """The static ANN_IVF_EXACT_RERANK_SQL bakes the fixed 16-wide
    pinned range, so oracle parity rests on the invariant that no
    oracle/gate corpus ever crosses _IVF_AUTO_MIN_N (above it Spark
    would quantize with ~sqrt(N) centroids while the SQL oracle keeps
    16). Pin it loudly: if a future testdata generation grows the
    embeddings tables past the threshold, this fails before the driver
    gate silently diverges."""
    from data_ingestion_tool_spark.operators.similarity import (
        _IVF_AUTO_MIN_N,
        _emb,
    )

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        n = _emb(spark, sf_dir).count()
        assert n < _IVF_AUTO_MIN_N, (
            f"{sf_dir}: {n} embeddings >= _IVF_AUTO_MIN_N "
            f"({_IVF_AUTO_MIN_N}) — the static oracle SQL's 16-wide "
            "pinned quantizer no longer matches the Spark auto-nlist "
            "branch at this SF"
        )


def test_ivf_exact_rerank_empty_pinned_range_falls_back(spark, monkeypatch):
    """Sparse vec_ids can leave the widened auto-nlist pinned range
    empty; the branch must warn and fall back to the pinned
    16-centroid path instead of crashing in np.vstack."""
    from data_ingestion_tool_spark.operators import similarity as S

    monkeypatch.setattr(S, "_IVF_AUTO_MIN_N", 100)
    monkeypatch.setattr(S, "_IVF_PIN_LO", 10_000_000)
    with pytest.warns(RuntimeWarning, match="holds no vec_ids"):
        df = S.ann_ivf_exact_rerank(spark, SF_CORRECT)
        # pinned-path fallback with an empty centroid set: runs clean,
        # returns the (empty) exact answer for "no inverted lists"
        assert df.count() == 0


def test_ivf_exact_rerank_thin_pinned_range_warns(spark, monkeypatch):
    """A partially-populated pinned range shrinks the quantizer (and
    with it nprobe/recall); that must not be silent."""
    from data_ingestion_tool_spark.operators import similarity as S

    max_id = S._emb(spark, SF_CORRECT).agg(
        F.max("vec_id")
    ).collect()[0][0]
    monkeypatch.setattr(S, "_IVF_AUTO_MIN_N", 100)
    # range [max_id - 9, max_id - 9 + nlist) holds exactly 10 ids
    monkeypatch.setattr(S, "_IVF_PIN_LO", int(max_id) - 9)
    with pytest.warns(RuntimeWarning, match="10 of "):
        df = S.ann_ivf_exact_rerank(spark, SF_CORRECT)
        assert df.count() > 0
