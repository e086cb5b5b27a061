"""Corpus-level term statistics — TF-IDF and BM25 over the documents
table (scale additions: the retrieval/ranking signals an LLM
training-data pipeline computes corpus-wide, next to the scan-local
quality filters in ``operators/text.py``).

Reference lineage: the reference computes only per-record features; these
are the cross-record analog of its per-signal summary statistics
(QRS_features.py per-beat aggregation), re-expressed as corpus
aggregations: tokenize -> explode -> two hash aggregations (term df,
doc length) + one broadcast of the tiny corpus-constant row.

100 TB shape: everything is groupBy on (doc, term) / term — no self-join,
no collect. Corpus constants (N docs, total token count) ride a 1-row
broadcast crossJoin; the term-df table joined back to doc-terms is a
plain equi-join on term (AQE broadcasts it while the vocabulary is small;
at web-scale vocabularies it becomes a sane shuffle join on the term
key — the same plan retrieval systems run).

Hash-stability contract (CLAUDE.md float laws):
- selection/ranking is on EXACT integers only — (tf DESC, df ASC, term)
  — never on a float score, so the emitted row SET is deterministic;
- every float score is FLOOR-quantized onto a 1e-6 grid and emitted as a
  BIGINT micro-unit value (``*_micro``), so cross-engine ln()/division
  last-ulp noise flips a value only within ~ulp of a grid boundary
  (P ~ 1e-9/value, the accepted fft_features class) instead of breaking
  the row set;
- BM25 per-term contributions are quantized to BIGINT BEFORE the per-doc
  sum: a float sum's result depends on partition visit order (non-
  associative), an integer sum does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecg_feature_engineering_spark.operators.text import words

MICRO = 1_000_000.0
"""Fixed FLOOR grid (1e-6) for float scores; emitted as BIGINT micros."""


def doc_terms(df: DataFrame, text_col: str = "text",
              doc_id: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf): lowercased whitespace-tokenized term
    frequencies, one row per distinct (doc, term).

    Null/empty text yields no rows (the doc still counts toward corpus
    N in the callers below). Tokenizer is the canonical ``text.words``
    (split-then-filter — one spelling to keep in sync with the oracles).
    The token array is BOUND to a column before the explode, and the
    explode is ``explode_outer`` + notNull filter — the two CLAUDE.md
    plan traps (per-element outer-expression re-eval;
    InferFiltersFromGenerate re-expanding the pipeline into a synthesized
    ``size(arr) > 0`` filter)."""
    out = (df.select(F.col(doc_id).alias("doc_id"),
                     words(F.lower(F.col(text_col))).alias("__toks"))
           .select("doc_id", F.explode_outer("__toks").alias("term"))
           .where(F.col("term").isNotNull())
           .groupBy("doc_id", "term")
           .agg(F.count(F.lit(1)).alias("tf")))
    return out


def _corpus_n(df: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """1-row (n_docs) corpus constant — broadcast-crossJoined by callers
    (no collect: the constant stays inside the lazy plan)."""
    return df.agg(F.count(F.lit(1)).alias("n_docs"))


def tfidf_terms(df: DataFrame, text_col: str = "text",
                doc_id: str = "doc_id") -> DataFrame:
    """Per (doc, term): tf, df, and the TF-IDF weight
    ``tf * ln(N / df)`` FLOOR-quantized to BIGINT micros.

    N counts EVERY input row (a null-text doc dilutes idf like any
    other corpus member); df counts docs containing the term."""
    terms = doc_terms(df, text_col, doc_id)
    term_df = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = _corpus_n(df, doc_id)
    scored = (terms.join(term_df, "term")
              .crossJoin(F.broadcast(n)))
    tfidf = (F.col("tf").cast("double")
             * F.log(F.col("n_docs").cast("double")
                     / F.col("df").cast("double")))
    return scored.select(
        "doc_id", "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.floor(tfidf * F.lit(MICRO)).cast("long").alias("tfidf_micro"))


def tfidf_top_terms(df: DataFrame, k: int = 5, text_col: str = "text",
                    doc_id: str = "doc_id",
                    min_tf: int = 2) -> DataFrame:
    """Top-k most-frequent terms per doc annotated with their TF-IDF
    weight. Selection is the EXACT integer tuple (tf DESC, df ASC, term
    ASC) — frequency first, rarer-in-corpus breaking ties — never the
    float score (see module contract: float ranking would make the
    emitted row SET flip on cross-engine ulp noise; integer ranking
    confines noise to the value column). ``min_tf`` drops hapax noise."""
    scored = tfidf_terms(df, text_col, doc_id).where(F.col("tf") >= min_tf)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf", "df", "tfidf_micro"))


def bm25_scores(df: DataFrame, query_terms: list[str],
                text_col: str = "text", doc_id: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 of every document against a fixed query-term list.

    score(d) = sum over matched terms of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln((N - df + 0.5) / (df + 0.5))  (can go negative for
    terms in more than half the corpus — kept, per Robertson-Sparck
    Jones; no max(0,.) clamp).

    Exactness: dl (doc token count) and tf are ints; avgdl is ONE
    division of two exact longs (bit-identical across engines); each
    term's contribution is FLOOR-quantized to BIGINT micros BEFORE the
    per-doc sum so the sum is order-independent. Docs matching no query
    term are emitted with score 0 (left join from the corpus side —
    a ranking over the corpus must rank every doc)."""
    dl_col = F.size(words(F.lower(F.col(text_col))))
    docs = df.select(F.col(doc_id).alias("doc_id"),
                     F.coalesce(dl_col, F.lit(0)).cast("long").alias("dl"))

    terms = doc_terms(df, text_col, doc_id)
    qlits = [t.lower() for t in query_terms]
    qterms = terms.where(F.col("term").isin(qlits))
    term_df = qterms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # corpus constants in one 1-row broadcast: N and avgdl — aggregated
    # from the docs projection above (one tokenizer spelling, one plan)
    consts = docs.agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("dl").alias("dl_sum"))

    j = (qterms.join(term_df, "term")
         .join(docs, "doc_id")
         .crossJoin(F.broadcast(consts)))
    n_d = F.col("n_docs").cast("double")
    avgdl = F.col("dl_sum").cast("double") / n_d
    idf = F.log((n_d - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_d = F.col("tf").cast("double")
    denom = tf_d + k1 * (1.0 - b + b * (F.col("dl").cast("double") / avgdl))
    contrib = idf * tf_d * (k1 + 1.0) / denom
    per_term = j.select(
        "doc_id",
        F.floor(contrib * F.lit(MICRO)).cast("long").alias("c_micro"))
    scored = per_term.groupBy("doc_id").agg(
        F.sum("c_micro").alias("bm25_micro"),
        F.count(F.lit(1)).alias("n_terms_matched"))
    return (docs.select("doc_id", "dl").join(scored, "doc_id", "left")
            .select("doc_id", "dl",
                    F.coalesce(F.col("n_terms_matched"), F.lit(0))
                    .cast("long").alias("n_terms_matched"),
                    F.coalesce(F.col("bm25_micro"), F.lit(0))
                    .cast("long").alias("bm25_micro")))
