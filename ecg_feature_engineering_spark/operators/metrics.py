"""U11 — evaluation-metric suite as joins + windows (SURVEY.md §2.9).

Reference analogs: the PhysioNet/CinC-challenge scoring functions the
reference uses as its only end-to-end check — ``compute_beta_score``
(xgboost_clf.py:29-101: per-class contingency weighted by 1/num_labels,
Fbeta/Gbeta/F-measure/accuracy, macro-averaged) and ``compute_auc``
(xgboost_clf.py:104-209: threshold-sweep AUROC as the trapezoid under
TPR/TNR and AUPRC as the step area under TPR/PPV). The reference loops
records per class in Python; here each metric is one grouped aggregate
(beta) or one window cumsum over distinct thresholds (AUC) — fully
relational, shuffle count independent of record count.

Input shape (long format, one row per record x class):
    (rec_id, class_idx, label int 0/1, output int 0/1, prob double)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def beta_scores(preds: DataFrame, beta: float = 2.0,
                rec: str = "rec_id", cls: str = "class_idx",
                label: str = "label", output: str = "output") -> DataFrame:
    """Per-class accuracy / F-measure / Fbeta / Gbeta with the reference's
    1/num_labels record weighting (xgboost_clf.py:38-90). Contingency
    contributions are 1/num_labels — dyadic for num_labels in {1,2,4},
    so the sums are order-independent there; guards mirror the
    reference's empty-denominator -> 1.0 convention.

    Plan: one window (num_labels per record) + one grouped aggregate per
    class. Macro averages are a second tiny aggregate over num_classes
    rows (``macro_beta_scores``)."""
    w = Window.partitionBy(rec)
    p = preds.withColumn("__nl", F.sum(label).over(w))
    l, o = F.col(label), F.col(output)
    # a record with NO positive labels has num_labels 0 — the reference
    # crashes there (1/0); the engine excludes such records from the
    # contingency (weight 0) instead of poisoning the sums with inf
    contrib = F.when(F.col("__nl") > 0, 1.0 / F.col("__nl")) \
        .otherwise(F.lit(0.0))
    tp = F.sum(F.when((l == 1) & (o == 1), contrib).otherwise(0.0))
    fp = F.sum(F.when((l == 0) & (o == 1), contrib).otherwise(0.0))
    fn = F.sum(F.when((l == 1) & (o == 0), contrib).otherwise(0.0))
    tn = F.sum(F.when((l == 0) & (o == 0), contrib).otherwise(0.0))
    b2 = beta * beta
    out = p.groupBy(cls).agg(
        tp.alias("tp"), fp.alias("fp"), fn.alias("fn"), tn.alias("tn"))
    tpc, fpc, fnc, tnc = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    fbeta_den = (1 + b2) * tpc + fnc * b2 + fpc
    gbeta_den = tpc + fpc + beta * fnc
    acc_den = tpc + fpc + fnc + tnc
    fmeas_den = 2 * tpc + fpc + fnc
    return out.select(
        cls, "tp", "fp", "fn", "tn",
        F.when(fbeta_den != 0, (1 + b2) * tpc / fbeta_den)
        .otherwise(1.0).alias("fbeta"),
        F.when(gbeta_den != 0, tpc / gbeta_den).otherwise(1.0).alias("gbeta"),
        F.when(acc_den != 0, (tpc + tnc) / acc_den)
        .otherwise(1.0).alias("accuracy"),
        F.when(fmeas_den != 0, 2 * tpc / fmeas_den)
        .otherwise(1.0).alias("fmeasure"),
    )


def macro_beta_scores(preds: DataFrame, beta: float = 2.0,
                      **kw) -> DataFrame:
    """Class-averaged accuracy/F-measure/Fbeta/Gbeta — the reference's
    return tuple (xgboost_clf.py:92-101, unit class weights C_l)."""
    per = beta_scores(preds, beta, **kw)
    return per.agg(
        F.avg("accuracy").alias("accuracy"),
        F.avg("fmeasure").alias("f_measure"),
        F.avg("fbeta").alias("f_beta"),
        F.avg("gbeta").alias("g_beta"),
    )


def auc_scores(preds: DataFrame, rec: str = "rec_id", cls: str = "class_idx",
               label: str = "label", prob: str = "prob") -> DataFrame:
    """Per-class AUROC / AUPRC by the reference's threshold sweep
    (xgboost_clf.py:104-209): thresholds are the distinct probabilities
    (descending, with a virtual leading threshold 1 and threshold 0
    dropped), AUROC is the trapezoid area under (TPR, TNR), AUPRC the
    right-step area under (TPR, PPV); empty denominators -> 1.

    Plan: NaN-scrub -> group by (class, distinct prob > 0) -> one window
    cumsum ordered by prob desc (tp/fp at each threshold) -> lag for the
    piecewise segments -> one grouped sum per class. No per-record Python,
    no O(n * thresholds) loop — the sweep is a single sort per class
    partition."""
    p = preds.withColumn(
        "__p", F.when(F.isnan(F.col(prob)), F.lit(0.0)).otherwise(F.col(prob)))
    totals = p.groupBy(cls).agg(
        F.sum(label).alias("__tot_p"),
        F.sum(1 - F.col(label)).alias("__tot_n"))
    g = (p.where(F.col("__p") > 0)
         .groupBy(cls, "__p")
         .agg(F.sum(label).alias("__pos"),
              F.sum(1 - F.col(label)).alias("__neg")))
    w = Window.partitionBy(cls).orderBy(F.col("__p").desc())
    cum = (g.withColumn("tp", F.sum("__pos").over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("fp", F.sum("__neg").over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(F.broadcast(totals), cls))
    P, N = F.col("__tot_p"), F.col("__tot_n")
    tp, fp = F.col("tp"), F.col("fp")
    tpr = F.when(P > 0, tp / P).otherwise(F.lit(1.0))
    tnr = F.when(N > 0, (N - fp) / N).otherwise(F.lit(1.0))
    ppv = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(1.0))
    r = (cum.withColumn("__tpr", tpr).withColumn("__tnr", tnr)
            .withColumn("__ppv", ppv)
            .withColumn("__rn", F.row_number().over(w)))
    # virtual leading threshold 1 — inserted ONLY when the top threshold
    # isn't already 1 (the reference's `if thresholds[0] != 1` insert). At
    # the virtual row tp=fp=0, so with the empty-denominator->1 convention
    # its tpr is 0 for P>0 but 1 for a zero-positive class, and tnr is 1;
    # when the top prob IS 1 the first row contributes no segment.
    virt_tpr = F.when(P > 0, F.lit(0.0)).otherwise(F.lit(1.0))
    first = F.col("__rn") == 1
    top_is_one = first & (F.col("__p") == 1.0)
    prev_tpr = F.when(first, virt_tpr).otherwise(F.lag("__tpr").over(w))
    prev_tnr = F.when(first, F.lit(1.0)).otherwise(F.lag("__tnr").over(w))
    seg = r.select(
        cls,
        F.when(top_is_one, F.lit(0.0)).otherwise(
            0.5 * (F.col("__tpr") - prev_tpr)
            * (F.col("__tnr") + prev_tnr)).alias("__roc"),
        F.when(top_is_one, F.lit(0.0)).otherwise(
            (F.col("__tpr") - prev_tpr) * F.col("__ppv")).alias("__prc"),
    )
    return seg.groupBy(cls).agg(
        F.sum("__roc").alias("auroc"),
        F.sum("__prc").alias("auprc"),
    )
