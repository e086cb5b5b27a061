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

    # per-stage param hashes: --ctx affects ONLY the packed stage, so a
    # repack at a different context length must not invalidate (and
    # recompute) the expensive survivors half
    cp_surv = StageCheckpointer(
        spark, args.checkpoint_root,
        params={"documents": args.documents, "bench_mod": args.bench_mod})
    cp_pack = StageCheckpointer(
        spark, args.checkpoint_root,
        params={"documents": args.documents, "bench_mod": args.bench_mod,
                "ctx": args.ctx})

    clean = cp_surv.run(
        "survivors",
        lambda: corpus_pipeline.survivors(
            spark.read.parquet(args.documents), bench_mod=args.bench_mod))
    packed = cp_pack.run(
        "packed",
        lambda: corpus_pipeline.pack_survivors(clean, ctx=args.ctx))
    packed.write.mode("overwrite").parquet(args.output)

    # each checkpointer reports only its own params_hash's stages —
    # union the two (dedup by stage name, survivors' hash wins)
    seen = set()
    metrics = []
    for m in cp_surv.metrics() + cp_pack.metrics():
        if m["stage"] not in seen:
            seen.add(m["stage"])
            metrics.append(m)
    n_in = spark.read.parquet(args.documents).count()
    print(json.dumps({"stages": metrics,
                      "input_rows": n_in,
                      "survivor_rows": clean.count(),
                      "output_rows": packed.count(),
                      "output": args.output}))
    # through the Hadoop FS API, not open(): --checkpoint-root may be a
    # non-local URI on a real cluster (the StageCheckpointer contract)
    cp_surv.fs.write_text_atomic(
        os.path.join(args.checkpoint_root, "metrics.json"),
        json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
