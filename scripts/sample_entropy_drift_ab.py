"""VERDICT r4 next-round #6: attribute the sample_entropy headline delta
(driver r3 1.57 s -> r4 1.88 s) to drift vs regression.

Code A/B is settled by git, not timing: the SampEn path (kernels.py
sampen region + operators/stats.py gate) is byte-identical between the
r3 driver commit (875badb) and HEAD — `git diff 875badb..HEAD` touches
only the FFT functions in kernels.py — so there is no r3 "arm" to race;
both arms would execute the same bytecode. What remains to show is that
the +19% sits inside this VM's documented drift band: N interleaved
fresh-measurement samples of the exact headline timing (same query
builder, same sf0.1 corpus, local[32], best-of reduction like bench.py)
bracketed by a Spark-free numpy control per sample so slow windows are
visible.

Usage: python scripts/sample_entropy_drift_ab.py [n_samples]
Prints one JSON line; summarized as a BENCH.md note.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ecg_feature_engineering_spark import contract  # noqa: E402
from ecg_feature_engineering_spark.session import get_spark  # noqa: E402


def _control() -> float:
    """Spark-free CPU probe (~0.2 s nominal): a fixed numpy workload whose
    wall time exposes the box's drift window for the adjacent sample."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2_000_000)
    t0 = time.time()
    for _ in range(3):
        np.sort(x).cumsum().std()
    return round(time.time() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sampen-drift-ab", cores=32)
    contract.ensure_workers_can_import(spark)
    build = contract.QUERY_BUILDERS["sample_entropy"]
    # warm-up: page cache + codegen, like bench.py pass 1
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples, controls = [], []
    for _ in range(n):
        controls.append(_control())
        t0 = time.time()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({
        "query": "sample_entropy",
        "sf_dir": sf_dir,
        "code_delta_r3_to_head": "none (git diff 875badb..HEAD touches only FFT)",
        "samples_sec": samples,
        "min_sec": min(samples),
        "median_sec": sorted(samples)[n // 2],
        "max_sec": max(samples),
        "control_sec": controls,
        "driver_r3_sec": 1.57,
        "driver_r4_sec": 1.875,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
