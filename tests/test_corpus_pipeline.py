"""Structural invariants of the composed curation pipeline
(plans/corpus_pipeline.py) — the oracle parity (contract
`corpus_curate`) certifies the VALUES; this pins the properties a
curation run is trusted for: benchmark holdout, dedup uniqueness,
stream-offset consistency, and rerun determinism."""

from __future__ import annotations

import pandas as pd

from ecg_feature_engineering_spark import contract
from ecg_feature_engineering_spark.operators import text
from ecg_feature_engineering_spark.plans import corpus_pipeline

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_curate_invariants(spark):
    contract.ensure_workers_can_import(spark)
    docs = _docs(spark)
    out = corpus_pipeline.curate(docs, bench_mod=50, ctx=512).toPandas()
    assert len(out) > 0

    # 1. benchmark holdout: no doc_id % 50 == 0 ever reaches the output
    assert (out["doc_id"] % 50 != 0).all()
    # 2. survivors are a subset of the input
    all_ids = set(docs.select("doc_id").toPandas()["doc_id"])
    assert set(out["doc_id"]) <= all_ids

    # 3. per-shard stream offsets are exactly the running token sum in
    # doc_id order (no gaps, no overlaps)
    for shard, g in out.sort_values("doc_id").groupby("shard"):
        cum = 0
        for _, r in g.iterrows():
            assert int(r["start_off"]) == cum
            cum += int(r["n_tokens"])

    # 4. every surviving doc passes the Gopher filter (stage 2 really
    # gates stage 7's output)
    gq = (text.gopher_quality(docs, "text")
          .select("doc_id", "passes_gopher").toPandas()
          .set_index("doc_id")["passes_gopher"])
    assert gq.loc[list(out["doc_id"])].all()

    # 5. no two survivors share a normalized scrubbed-text fingerprint
    # (stage 4 really deduped what stage 7 emits)
    from pyspark.sql import functions as F
    scrubbed = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), text.URL_PATTERN, "<PII>"),
            text.EMAIL_PATTERN, "<PII>"))
    fps = (text.fingerprint(scrubbed, "text")
           .select("doc_id", "fingerprint").toPandas()
           .set_index("doc_id")["fingerprint"])
    out_fps = fps.loc[list(out["doc_id"])]
    assert out_fps.nunique() == len(out_fps)

    # 6. rerun determinism: the membership + offsets are a pure
    # function of the input (hash sampling, no RNG)
    again = (corpus_pipeline.curate(docs, bench_mod=50, ctx=512)
             .toPandas())
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_corpus_job_resume_e2e(spark, tmp_path):
    """The spark-submit surface end to end from a FOREIGN cwd
    (zip-shipped imports): corpus_job runs the two checkpointed stages,
    and a rerun under a DIFFERENT --output serves both stages from the
    checkpoint (identical outputs, no recompute of the survivor set)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    r = subprocess.run(
        [sys.executable, "/root/repo/jobs/corpus_job.py",
         "--documents", f"{SF_DIR}/documents.parquet",
         "--output", str(out), "--checkpoint-root", str(ckpt)],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"survivors", "packed"} <= {s["stage"] for s in summary["stages"]}
    assert 0 < summary["output_rows"] <= summary["survivor_rows"]
    assert summary["survivor_rows"] < summary["input_rows"]

    # the job's output equals the library plan run in-process (the
    # checkpointed two-stage split is semantics-preserving)
    lib = corpus_pipeline.curate(_docs(spark)).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    job = spark.read.parquet(str(out)).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        job[lib.columns.tolist()], lib)

    r2 = subprocess.run(
        [sys.executable, "/root/repo/jobs/corpus_job.py",
         "--documents", f"{SF_DIR}/documents.parquet",
         "--output", str(tmp_path / "out2"), "--checkpoint-root", str(ckpt)],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["output_rows"] == summary["output_rows"]
    assert s2["survivor_rows"] == summary["survivor_rows"]

    # repack at a different --ctx: ctx hashes only into the packed
    # stage, so the expensive survivors half must be SERVED, not
    # recomputed (its data files untouched on disk)
    import os

    def surv_mtimes():
        d = ckpt / "survivors" / "data"
        return {p: os.path.getmtime(os.path.join(d, p))
                for p in os.listdir(d)}
    before = surv_mtimes()
    r3 = subprocess.run(
        [sys.executable, "/root/repo/jobs/corpus_job.py",
         "--documents", f"{SF_DIR}/documents.parquet",
         "--output", str(tmp_path / "out3"),
         "--checkpoint-root", str(ckpt), "--ctx", "256"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-3000:]
    s3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert s3["survivor_rows"] == summary["survivor_rows"]
    assert surv_mtimes() == before
