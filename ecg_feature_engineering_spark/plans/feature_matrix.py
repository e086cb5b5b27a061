"""E3 — the reference's end-to-end model pipeline as one Spark job.

Reference flow (xgboost_clf.py:7-27 + 215-260): join the per-record
HRV / LONG / SHORT / QRS / DEEP feature CSVs column-wise into one matrix,
StandardScaler it, train/test split, score with the trained model, grade
with compute_beta_score / compute_auc. The engine reproduces every stage
Spark-first:

  feature_matrix  — one wide row per entity: HRV family + QRS basic-stat
                    family + the full LONG block, joined on
                    the entity key (the CSV data.join(data1)... analog;
                    each side is one row per entity so the joins shuffle
                    only entity-count rows).
  standardize     — two-pass broadcast z-scoring (the StandardScaler
                    analog): one tiny agg of per-column mean/std,
                    broadcast back, (x - mu) / sigma with zero-std guard.
  e3_pipeline     — matrix -> standardize -> deterministic hash split ->
                    stand-in linear scorer (broadcast seeded weights: the
                    trained-XGB stand-in — same join-the-scores plumbing,
                    no training dependency) -> held-out multi-class
                    predictions -> challenge metrics (operators/metrics).

The scorer weights are fixed-seed, so the whole pipeline is deterministic
end to end — reruns produce identical metric rows (tested).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecg_feature_engineering_spark.operators import (
    metrics,
    splits,
    stats,
    windows,
)
from ecg_feature_engineering_spark.plans import long_block


def feature_matrix(events: DataFrame, by: str = "user_id",
                   value: str = "value",
                   order=("ts", "event_id")) -> DataFrame:
    """One wide feature row per entity (the E3 column-join,
    xgboost_clf.py:7-15)."""
    order = list(order)
    d = windows.with_lag_diff(events, value, by, order, 1, "d1")
    hrv = d.groupBy(by).agg(*stats.hrv_aggs(value, "d1"))
    basic = stats.with_group_mean(events, value, by) \
        .groupBy(by).agg(*stats.basic_stat_aggs(value, "qrs_"))
    lng = long_block.long_features(events, by=by, value=value, order=order,
                                   fs=1.0, parity=False)
    return hrv.join(basic, by).join(lng, by)


def standardize(df: DataFrame, cols: list[str],
                by_cols: list[str] | None = None) -> DataFrame:
    """StandardScaler analog: z-score the given columns with population
    mean/std from ONE tiny aggregate broadcast back (two-pass, no window
    over the whole table). Zero-variance columns pass through as 0."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"__mu_{c}"))
        aggs.append(stats.std_pop(F.col(c)).alias(f"__sd_{c}"))
    st = df.agg(*aggs)
    out = df.join(F.broadcast(st))
    scaled = [
        F.when(F.col(f"__sd_{c}") > 0,
               (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"))
        .otherwise(F.lit(0.0)).alias(c)
        for c in cols
    ]
    keep = [c for c in df.columns if c not in cols]
    return out.select(*keep, *scaled)


def e3_pipeline(events: DataFrame, by: str = "user_id",
                n_classes: int = 5, seed: int = 11,
                test_frac: float = 0.3) -> DataFrame:
    """The full E3 run; returns the per-class challenge metrics on the
    held-out split (accuracy / F-measure / Fbeta / Gbeta / AUROC / AUPRC
    per class — the reference's final printout, xgboost_clf.py:215-260).

    Deterministic by construction: labels come from a keyed hash (the
    stand-in for the reference's SNOMED label column), the scorer weights
    from a fixed-seed Xavier init, the split from splits.hash_split."""
    # persist: standardize() consumes the matrix TWICE (mean/std agg +
    # the scaled output join). Without a persist the whole kernel-bearing
    # feature_matrix subtree re-executes per consumer — measured: the
    # executed plan held 27 Python stages / 151 exchanges (~5x re-runs of
    # every FFT/wavelet kernel), a genuine scale bug at any input size.
    # One row per entity × ~100 doubles, so the persisted footprint is
    # entity-count-bounded, not event-count-bounded.
    m = feature_matrix(events, by=by).persist()
    feat_cols = [c for c in m.columns if c != by]
    m = standardize(m, feat_cols)
    m = m.na.fill(0.0, feat_cols)  # degenerate entities (null corr etc.)

    # deterministic multi-class label per entity
    label_cls = F.pmod(F.xxhash64(F.col(by), F.lit(seed)),
                       F.lit(n_classes))
    m = m.withColumn("__label", label_cls)

    # stand-in model: seeded linear scorer -> softmax over n_classes.
    # Arrow-batched matmul with broadcast weights (the U8 predict_batch
    # pattern) — a column-expression dot product over ~90 features x 5
    # classes compiles a 400+-term codegen stage; one numpy matmul per
    # batch is the scale-correct shape for model scoring.
    rng = np.random.default_rng(seed)
    w = rng.normal(0, (2.0 / (len(feat_cols) + n_classes)) ** 0.5,
                   (len(feat_cols), n_classes))
    bc = m.sparkSession.sparkContext.broadcast(w)
    by_type = {f.name: f.dataType.simpleString()
               for f in m.schema.fields}[by]
    m = m.select(by, "__label", F.array(*feat_cols).alias("__f"))

    def score(batches):
        ww = bc.value
        for b in batches:
            x = np.stack(b["__f"].to_numpy())
            logits = x @ ww
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            p = e / e.sum(axis=1, keepdims=True)
            out = b[[by, "__label"]].copy()
            for k in range(n_classes):
                out[f"__p{k}"] = p[:, k]
            yield out

    m = m.mapInPandas(
        score,
        schema=(f"{by} {by_type}, __label long, "
                + ", ".join(f"__p{k} double" for k in range(n_classes))))

    # held-out split, long-format predictions, challenge metrics
    test = splits.hash_split(
        m, by, {"train": 1 - test_frac, "test": test_frac},
        seed=seed).where(F.col("split") == "test")
    preds = test.select(
        F.col(by).alias("rec_id"), "__label",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("class_idx"),
                     F.col(f"__p{k}").alias("prob"))
            for k in range(n_classes)
        ])).alias("pc"),
    ).select(
        "rec_id",
        F.col("pc.class_idx").alias("class_idx"),
        (F.col("__label") == F.col("pc.class_idx")).cast("int")
        .alias("label"),
        (F.col("pc.prob") >= 1.0 / n_classes).cast("int").alias("output"),
        F.col("pc.prob").alias("prob"),
    )
    # persist: preds feeds BOTH metric families below
    preds = preds.persist()
    beta = metrics.beta_scores(preds, beta=2.0)
    auc = metrics.auc_scores(preds)
    out = beta.join(auc, "class_idx").orderBy("class_idx")
    # materialize the (n_classes-row) result eagerly, then release both
    # cached inputs — otherwise every invocation in a shared session pins
    # two dead cached DataFrames for the session's lifetime
    out = out.localCheckpoint(eager=True)
    m.unpersist()
    preds.unpersist()
    return out
