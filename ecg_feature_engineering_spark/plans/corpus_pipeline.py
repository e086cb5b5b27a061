"""End-to-end corpus curation plan — the documents-table counterpart of
``plans/flagship.py``: the standard web-corpus curation sequence
(RefinedWeb / Dolma stage order) composed into ONE lazy Catalyst plan,

  1. hold out the benchmark split entirely (doc_id % bench_mod == 0);
  2. Gopher quality filter (published thresholds, operators/text.py);
  3. PII scrub — URLs then emails redacted in place (C4 rule);
  4. exact dedup on the normalized-scrubbed-text fingerprint
     (min-doc_id representative, operators/dedup.py);
  5. benchmark decontamination — drop candidates whose distinct word
     3-grams are >= 80% covered by the benchmark (operators/corpus.py);
  6. temperature downsampling to the alpha=0.5 source mixture, rates
     computed on the SURVIVOR token mass (the mixture actually trained
     on), membership a pure hash of doc_id (resumable / rerun-stable);
  7. GPT-style token-stream packing of the survivors into fixed
     ctx-token context windows.

Reference lineage: the reference's whole preprocessing story is the
serial blacklist-filter + per-record loop (preprocess-300hz.py:93-186);
this is that fault-tolerant curation idea at web-pipeline scope, one
declarative plan end to end — every stage is an already-certified
operator, and the COMPOSITION is itself oracle-certified
(contract.py `corpus_curate`: the full chain replayed as one DuckDB
CTE pipeline).

100 TB shape: stages 2-3 are scan-local; stage 4 is one fingerprint
shuffle; stage 5 joins grams against the (small) benchmark gram set;
stage 6 is one tiny agg + a broadcast-rate scan filter; stage 7 is the
per-shard packing window. Nothing materializes between stages unless
the caller checkpoints (jobs may checkpoint after stage 5 the way
flagship_job checkpoints its quarantine table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecg_feature_engineering_spark.operators import corpus, dedup, text


def survivors(docs: DataFrame, bench_mod: int = 50,
              text_col: str = "text", doc_id: str = "doc_id",
              shard_col: str = "source") -> DataFrame:
    """Stages 1-5 (the expensive half): benchmark holdout, Gopher
    filter, PII scrub, exact dedup, decontamination. Returns the clean
    survivor table (doc_id, shard_col, scrubbed text) — the natural
    CHECKPOINT boundary: everything above is re-derived per consumer in
    a single lazy plan (contract `corpus_curate` pins 13 exchanges
    un-checkpointed), so a production run materializes this once
    (jobs/corpus_job.py) and the downstream mixture/packing read it
    back."""
    did = F.col(doc_id)
    bench = docs.where(F.pmod(did, F.lit(bench_mod)) == 0)
    cand = docs.where(F.pmod(did, F.lit(bench_mod)) != 0)

    passed = (text.gopher_quality(cand, text_col)
              .where(F.col("passes_gopher"))
              .select(doc_id, shard_col, text_col))

    # URLs before emails: an email pattern can match inside a URL's
    # userinfo but not vice versa (the pii_scrub rule)
    scrubbed = passed.withColumn(
        text_col,
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), text.URL_PATTERN, "<PII>"),
            text.EMAIL_PATTERN, "<PII>"))

    deduped = dedup.dedup_exact(scrubbed, text_col, doc_id)

    # anti-join the SMALL contaminated-id set (AQE broadcasts it)
    # instead of semi-joining the ~corpus-sized clean-id set: equal
    # output (every candidate appears exactly once in the report with a
    # non-null flag; pinned in tests/test_round3_ops.py), one fewer
    # consumption of the deduped subtree and no doc_id shuffle of the
    # survivor mass. 2M-doc profile: survivors 137 s -> the contaminated
    # branch was the worst 4->16 scaler of the whole pipeline.
    bad_ids = corpus.contaminated_ids(deduped, bench, text_col, doc_id,
                                      n=3, threshold_pct=80)
    return deduped.join(bad_ids, doc_id, "left_anti")


def pack_survivors(clean: DataFrame, ctx: int = 512,
                   text_col: str = "text", doc_id: str = "doc_id",
                   shard_col: str = "source") -> DataFrame:
    """Stages 6-7: temperature downsample (rates on the survivor token
    mass) + token-stream packing."""
    sampled = corpus.sample_to_mixture(clean, text_col, doc_id,
                                       shard_col)
    return corpus.pack_token_stream(
        sampled.select(doc_id, shard_col, text_col),
        ctx=ctx, text_col=text_col, doc_id=doc_id, shard_col=shard_col)


def curate(docs: DataFrame, bench_mod: int = 50, ctx: int = 512,
           text_col: str = "text", doc_id: str = "doc_id",
           shard_col: str = "source") -> DataFrame:
    """Run the full curation sequence as one lazy plan; returns the
    packed token-stream table (doc_id, shard, n_tokens, start_off,
    chunk_first, chunk_last, n_chunks) of the surviving documents."""
    return pack_survivors(
        survivors(docs, bench_mod, text_col, doc_id, shard_col),
        ctx=ctx, text_col=text_col, doc_id=doc_id, shard_col=shard_col)
