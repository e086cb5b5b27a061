"""Two-parallelism-level scaling probe for the CORPUS curation family
(the image-kernel arm lives in bench.py; this evidences the round-4
text-pipeline operators with the same methodology): the composed
`plans/corpus_pipeline.curate` end to end over a replicated documents
corpus, interleaved fresh-session samples at N and 4N cores, min-based
efficiency. Replicas get a per-replica text suffix so exact dedup does
NOT collapse them (a naive copy stage would shrink every downstream
stage and measure a different job per scale).

    python scripts/corpus_scaling_probe.py [replicas] [pairs]

Prints one JSON line; numbers are recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/corpus_scale_stage"
CORES = (4, 16)


def stage_corpus(replicas: int) -> int:
    from pyspark.sql import functions as F

    from ecg_feature_engineering_spark.session import get_spark, stop_spark

    spark = get_spark(app_name="corpus-scale-stage", cores=16)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    want = n_base * replicas
    marker = os.path.join(STAGE, "_STAGED_OK")
    if os.path.exists(marker):
        have = spark.read.parquet(STAGE).count()
        if have == want:
            stop_spark()
            return want
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    out = base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"))
    out.repartition(max(64, replicas // 2)) \
        .write.mode("overwrite").parquet(STAGE)
    with open(marker, "w") as f:
        f.write(str(want))
    stop_spark()
    return want


def sample(cores: int) -> float:
    from ecg_feature_engineering_spark import contract
    from ecg_feature_engineering_spark.plans import corpus_pipeline
    from ecg_feature_engineering_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(
        app_name=f"corpus-scale-{cores}", cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"})
    contract.ensure_workers_can_import(spark)
    docs = spark.read.parquet(STAGE)
    # warm-up: same plan shape over a slice (Catalyst/codegen JIT —
    # the bench.py rationale), then the timed full-size run
    corpus_pipeline.curate(docs.limit(512)).count()
    t0 = time.time()
    corpus_pipeline.curate(docs).count()
    dt = time.time() - t0
    stop_spark()
    return dt


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_docs = stage_corpus(replicas)
    lo, hi = [], []
    for _ in range(pairs):           # interleaved N,4N,N,4N,...
        lo.append(round(sample(CORES[0]), 2))
        hi.append(round(sample(CORES[1]), 2))
    eff_min = min(lo) / (4 * min(hi))
    print(json.dumps({
        "job": "corpus_pipeline.curate end-to-end (replicated docs)",
        "n_docs": n_docs, "cores_n": CORES[0], "cores_4n": CORES[1],
        "sec_n_samples": lo, "sec_4n_samples": hi,
        "scaling_efficiency": round(eff_min, 3),
        "pair_efficiencies": [round(a / (4 * b), 3)
                              for a, b in zip(lo, hi)],
        "docs_per_sec_n": round(n_docs / min(lo), 1),
        "docs_per_sec_4n": round(n_docs / min(hi), 1),
    }))


if __name__ == "__main__":
    main()
