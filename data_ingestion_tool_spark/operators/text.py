"""Text-analysis operators over ``documents`` (EXT tier, SURVEY.md
§2.11): token statistics, quality scoring, language-ID, token counting,
fingerprinting — the per-document stages of an LLM training-data
pipeline.

All operators are pure Column expressions (no Python in the hot path):
at 100 TB these run inside whole-stage codegen, partition-parallel,
with the text column pruned at the parquet scan when untouched.
Cross-engine parity: integer counts + one final double division, which
is IEEE-exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.base import QuerySpec
from data_ingestion_tool_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _tokens():
    return F.split(F.trim(F.col("text")), r"\s+")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics (whitespace tokenization)."""
    d = _docs(spark, sf_dir)
    n_tokens = F.size(_tokens())
    n_chars = F.length("text")
    n_spaces = n_chars - F.length(F.regexp_replace("text", r"\s", ""))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        ((n_chars - n_spaces).cast("double") / n_tokens).alias("avg_token_len"),
    )


TEXT_STATS_SQL = r"""
SELECT doc_id, lang,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars_measured,
       CAST(length(text) - (length(text) - length(regexp_replace(text, '\s', '', 'g')))
            AS DOUBLE) / len(string_split_regex(trim(text), '\s+')) AS avg_token_len
FROM documents
"""


#: Tiny stopword inventory for quality scoring — deliberately fixed so
#: the oracle can restate it.
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: stopword ratio, alphabetic ratio, mean
    token length — the classic cheap quality filters (C4-style),
    combined into one score with a keep/drop flag."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS))
    )
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    stop_ratio = stop_hits.cast("double") / n_tokens
    alpha_ratio = alpha_chars.cast("double") / n_chars
    score = stop_ratio * 0.5 + alpha_ratio * 0.5
    return d.select(
        "doc_id",
        stop_hits.alias("stopword_hits"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
        (score >= 0.45).alias("keep"),
    )


_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)

TEXT_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
  FROM documents
), scored AS (
  SELECT doc_id,
         len(list_filter(toks, t -> t IN ({_SW_LIST}))) AS stopword_hits,
         CAST(len(list_filter(toks, t -> t IN ({_SW_LIST}))) AS DOUBLE)
           / len(toks) AS stopword_ratio,
         CAST(alpha_chars AS DOUBLE) / n_chars AS alpha_ratio
  FROM base
)
SELECT doc_id, stopword_hits, stopword_ratio, alpha_ratio,
       stopword_ratio * 0.5 + alpha_ratio * 0.5 AS quality_score,
       (stopword_ratio * 0.5 + alpha_ratio * 0.5) >= 0.45 AS keep
FROM scored
"""


#: Marker words per language for the n-gram/stopword language-ID
#: heuristic. Scoring is deterministic; ties resolve in this order.
_LANG_MARKERS = {
    "en": ("the", "a", "is", "and"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "una", "que"),
    "fr": ("le", "les", "une", "est"),
    "zh": ("的", "是", "不", "了"),
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language ID: score = marker-token hits per
    language; prediction = argmax with fixed tie order. (On this
    synthetic corpus every language shares one vocabulary, so the
    predictions skew 'en' — the operator contract is the scoring.)"""
    d = _docs(spark, sf_dir)
    toks = _tokens()

    def marker_hits(markers: tuple) -> F.Column:
        # one-arg lambda: higher-order functions pass a Column per
        # declared parameter, so extra params must come via closure
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {
        lang: marker_hits(markers) for lang, markers in _LANG_MARKERS.items()
    }
    # argmax with first-wins tie order en > de > es > fr > zh
    langs = list(_LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return d.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        best.alias("predicted_lang"),
        (best == F.col("lang")).alias("correct"),
    )


def _lang_sql() -> str:
    score_exprs = []
    for lang, markers in _LANG_MARKERS.items():
        mlist = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(toks, t -> t IN ({mlist}))) AS score_{lang}"
        )
    langs = list(_LANG_MARKERS)
    # same first-wins argmax, unrolled
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = (
            f"CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END"
        )
    return rf"""
WITH base AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang, {', '.join(score_exprs)} FROM base
)
SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
       {pred} AS predicted_lang,
       ({pred} = lang) AS correct
FROM scored
"""


LANG_ID_SQL = _lang_sql()

#: BPE-ish pre-tokenizer: words | digits | single punctuation marks.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document, plus the
    corpus total — the 'how many training tokens is this' operator."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN)).alias("bpe_tokens"),
    )


TOKEN_COUNTS_SQL = rf"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS bpe_tokens
FROM documents
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content fingerprint (md5 of normalized text) —
    the join key for exact dedup across shards/snapshots."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.length("text").alias("n_chars_measured"),
    )


DOC_FINGERPRINTS_SQL = """
SELECT doc_id,
       md5(lower(trim(text))) AS fingerprint,
       length(text) AS n_chars_measured
FROM documents
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF top-3 terms per document (SURVEY §2.11 tf-idf).

    Expressed as three aggregations over one exploded token table —
    term frequency, document length, document frequency — joined and
    window-ranked. All shuffles key on doc_id or term; document
    frequency is a broadcast-sized side at any corpus size with a
    bounded vocabulary. Deterministic tie-break: (score desc, term).
    """
    d = _docs(spark, sf_dir)
    # n_docs as a broadcast 1-row aggregate INSIDE the plan — no
    # separate driver-side count() job
    ndocs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    terms = d.select("doc_id", F.explode(_tokens()).alias("term"))
    # doclen and dfreq both re-aggregate tf — the raw token table is
    # exploded and shuffled exactly once
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("k").alias("len"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = (F.col("k").cast("double") / F.col("len")) * F.log(
        F.col("n_docs") / F.col("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "rank")
    )


TFIDF_TOP_TERMS_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS k FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY 1),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, rank FROM (
  SELECT tf.doc_id, tf.term,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY (CAST(k AS DOUBLE) / len)
                    * ln(CAST(n_docs AS DOUBLE) / df) DESC, tf.term
         ) AS rank
  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n
) WHERE rank <= 3
"""


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-dedup/pre-fingerprint
    step): lowercase, strip punctuation, collapse whitespace, trim —
    all JVM-side regexp/string expressions, with the canonical form's
    fingerprint alongside."""
    d = _docs(spark, sf_dir)
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^\w\s]", ""), r"\s+", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(canon).alias("n_canon_chars"),
        F.md5(canon).alias("canon_fingerprint"),
    )


NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       length(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                  '\s+', ' ', 'g'))) AS n_canon_chars,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS canon_fingerprint
FROM documents
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking via a Python UDTF (the generator/table-function
    surface): each document expands to fixed-size token chunks with
    overlap — the standard pre-embedding splitter for RAG/training
    pipelines. One row in, N rows out, lateral-joined per input row.

    Deterministic splitting (whitespace tokens, size 32, overlap 8), so
    the DuckDB oracle reproduces it with generate_series arithmetic.
    """
    from pyspark.sql.functions import udtf

    CHUNK, OVERLAP = 32, 8

    @udtf(returnType="chunk_idx int, start_tok int, n_toks int")
    class Chunker:
        def eval(self, text: str):
            toks = text.strip().split() if text else []
            step = CHUNK - OVERLAP
            i = 0
            idx = 0
            while i < len(toks):
                n = min(CHUNK, len(toks) - i)
                yield idx, i, n
                if i + CHUNK >= len(toks):
                    break
                i += step
                idx += 1

    spark.udtf.register("doc_chunker", Chunker)
    d = _docs(spark, sf_dir)
    d.createOrReplaceTempView("docs_for_chunking")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.start_tok, c.n_toks
        FROM docs_for_chunking, LATERAL doc_chunker(text) AS c
        """
    )


DOC_CHUNKS_SQL = r"""
WITH lens AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n
  FROM documents
),
idx AS (
  SELECT doc_id, n,
         unnest(generate_series(0, CAST(CEIL(GREATEST(n - 8, 1) / 24.0) AS BIGINT) - 1)) AS chunk_idx
  FROM lens WHERE n > 0
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_idx * 24 AS INT) AS start_tok,
       CAST(LEAST(32, n - chunk_idx * 24) AS INT) AS n_toks
FROM idx
"""


def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in one plan: length + lang
    filters → exact dedup (keep min doc_id per content fingerprint) →
    per-source corpus stats. Every stage is the operator the suite
    tests individually; this query proves they compose without a
    driver round-trip — filters reach the scan, dedup is one window,
    stats are one agg.
    """
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    filtered = d.filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000)
    )
    w = Window.partitionBy(
        F.md5(F.lower(F.trim(F.col("text"))))
    ).orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens())).alias("total_tokens"),
    )


TRAINING_DATA_PIPELINE_SQL = r"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                               ORDER BY doc_id) AS rn
  FROM documents
  WHERE lang = 'en' AND n_chars BETWEEN 100 AND 2000
) WHERE rn = 1
GROUP BY source
"""


SPECS: list[QuerySpec] = [
    QuerySpec("tfidf_top_terms", tfidf_top_terms, TFIDF_TOP_TERMS_SQL,
              "exact TF-IDF top-3 terms per document", ("text",)),
    QuerySpec("normalize_text", normalize_text, NORMALIZE_TEXT_SQL,
              "canonical normalization + fingerprint (pre-dedup step)",
              ("text", "dedup")),
    QuerySpec("doc_chunks", doc_chunks, DOC_CHUNKS_SQL,
              "Python UDTF document chunking (lateral table function)",
              ("text",)),
    QuerySpec("training_data_pipeline", training_data_pipeline,
              TRAINING_DATA_PIPELINE_SQL,
              "filter → dedup → corpus stats, composed in one plan",
              ("text", "dedup", "flagship")),
    QuerySpec("text_stats", text_stats, TEXT_STATS_SQL,
              "per-doc token/char statistics", ("text",)),
    QuerySpec("text_quality", text_quality, TEXT_QUALITY_SQL,
              "heuristic quality score + keep flag", ("text",)),
    QuerySpec("lang_id", lang_id, LANG_ID_SQL,
              "marker-based language identification", ("text",)),
    QuerySpec("token_counts", token_counts, TOKEN_COUNTS_SQL,
              "whitespace + BPE-ish token counting", ("text",)),
    QuerySpec("doc_fingerprints", doc_fingerprints, DOC_FINGERPRINTS_SQL,
              "md5 content fingerprint", ("text",)),
]
