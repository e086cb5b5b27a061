"""Production corpus-curation job — run via spark-submit --py-files:

    scripts/package.sh                       # builds dist/engine.zip
    spark-submit --master <cluster> \\
      --py-files dist/engine.zip jobs/corpus_job.py \\
      --documents /root/testdata/sf0.001/documents.parquet \\
      --output /tmp/corpus_out --checkpoint-root /tmp/corpus_ckpt

Runs plans/corpus_pipeline in two checkpointed stages:

  survivors    benchmark holdout -> Gopher filter -> PII scrub ->
               exact dedup -> decontamination (the expensive half —
               materialized ONCE; the single-plan spelling re-derives
               this subtree per downstream consumer)
  packed       temperature downsample + token-stream packing over the
               READ-BACK survivor table

Resumable exactly like flagship_job: every stage writes through
StageCheckpointer (atomic manifest + per-partition lineage +
row-count/latency metrics); re-running with the same --checkpoint-root
restarts at the first incomplete stage, and only data-affecting params
(--documents, --bench-mod, --ctx) hash into the manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True,
                    help="documents parquet path (doc_id, source, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--bench-mod", type=int, default=50,
                    help="benchmark holdout: doc_id %% bench_mod == 0")
    ap.add_argument("--ctx", type=int, default=512,
                    help="context-window token length for packing")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ecg_feature_engineering_spark.checkpoint import StageCheckpointer
    from ecg_feature_engineering_spark.plans import corpus_pipeline
    from ecg_feature_engineering_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("corpus-job")
    from ecg_feature_engineering_spark import contract as _c
    _c.ensure_workers_can_import(spark)

    data_params = {k: v for k, v in vars(args).items()
                   if k in ("documents", "bench_mod", "ctx")}
    cp = StageCheckpointer(spark, args.checkpoint_root, params=data_params)

    clean = cp.run(
        "survivors",
        lambda: corpus_pipeline.survivors(
            spark.read.parquet(args.documents), bench_mod=args.bench_mod))
    packed = cp.run(
        "packed",
        lambda: corpus_pipeline.pack_survivors(clean, ctx=args.ctx))
    packed.write.mode("overwrite").parquet(args.output)

    metrics = cp.metrics()
    n_in = spark.read.parquet(args.documents).count()
    print(json.dumps({"stages": metrics,
                      "input_rows": n_in,
                      "survivor_rows": clean.count(),
                      "output_rows": packed.count(),
                      "output": args.output}))
    with open(os.path.join(args.checkpoint_root, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)


if __name__ == "__main__":
    main()
