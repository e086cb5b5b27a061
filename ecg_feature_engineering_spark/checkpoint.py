"""Checkpoint / resume / lineage layer (north rule: "resumable from
Iceberg-snapshot checkpoints with per-partition lineage and row-count/latency
metrics").

This container has no Iceberg jars, so the same contract is implemented
over parquet stage directories with an atomic _SUCCESS + manifest protocol;
on a cluster with the Iceberg runtime, pass ``data_format="iceberg"`` to
write stages as Iceberg tables (snapshots then add time-travel on top of
this layer's manifests).

Reference analog: stage outputs to CSV/MAT/pickle as coarse checkpoints
(resample.py:29, preprocess-300hz.py:444-470) — here made atomic, resumable,
and metered.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class StageCheckpointer:
    """Write/read named pipeline stages with manifests + per-partition lineage.

    Layout:  <root>/<stage>/data/          parquet (or iceberg table)
             <root>/<stage>/manifest.json  row counts, wall time, schema,
                                           per-partition row counts (lineage)
    ``run(stage, fn)`` skips recompute when a valid manifest exists — the
    resume contract: a killed job rerun with the same root restarts at the
    first incomplete stage.
    """

    def __init__(self, spark: SparkSession, root: str,
                 params: dict | None = None,
                 data_format: str = "parquet"):
        """``params``: the job inputs this run depends on (arg values,
        input paths, corpus sizes). Their hash is stamped into every stage
        manifest; a resume under DIFFERENT params invalidates the stage
        instead of silently serving the previous run's data."""
        self.spark = spark
        self.root = root
        self.data_format = data_format
        self.params_hash = self._hash_params(params or {})
        os.makedirs(root, exist_ok=True)

    @staticmethod
    def _hash_params(params: dict) -> str:
        import hashlib

        blob = json.dumps(params, sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.root, stage)
        return os.path.join(d, "data"), os.path.join(d, "manifest.json")

    def is_complete(self, stage: str) -> bool:
        _, manifest = self._paths(stage)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as f:
                m = json.load(f)
            return (m.get("status") == "complete"
                    and m.get("params_hash") == self.params_hash)
        except (json.JSONDecodeError, OSError):
            return False

    def write(self, stage: str, df: DataFrame,
              partition_by: list[str] | None = None) -> dict:
        data_dir, manifest = self._paths(stage)
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(self.data_format).save(data_dir)
        out = self.spark.read.format(self.data_format).load(data_dir)
        # per-partition lineage = the written FILES (name + bytes) plus a
        # metadata-only row count — no second full scan of the stage data
        # (parquet count() reads footers; the old groupBy(partition_id)
        # re-scanned every byte just written, doubling stage I/O)
        rows = out.count()
        # file-level lineage only works where os.walk can see the files: a
        # remote root (hdfs:// s3a:// ...) would silently walk nothing and
        # record n_partitions=0 on a "complete" stage (ADVICE r2). For
        # remote roots, fall back to a metadata-only lineage entry.
        scheme = data_dir.split("://", 1)[0] if "://" in data_dir else "file"
        lineage = []
        if scheme == "file":
            local_dir = data_dir.split("://", 1)[-1]
            for dirpath, _dirs, files in os.walk(local_dir):
                for f in sorted(files):
                    if f.endswith((".parquet", ".orc", ".avro")):
                        full = os.path.join(dirpath, f)
                        lineage.append({
                            "file": os.path.relpath(full, local_dir),
                            "bytes": os.path.getsize(full)})
        meta = {
            "status": "complete",
            "stage": stage,
            "run_id": str(uuid.uuid4()),
            "params_hash": self.params_hash,
            "rows": rows,
            "lineage_mode": "files" if scheme == "file" else "metadata-only",
            "n_partitions": len(lineage) if scheme == "file" else None,
            "partitions": lineage,
            "schema": out.schema.jsonValue(),
            "wall_seconds": round(time.time() - t0, 3),
            "written_at_unix": int(time.time()),
            "format": "parquet",
        }
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, manifest)  # atomic commit of the stage
        return meta

    def read(self, stage: str) -> DataFrame:
        data_dir, _ = self._paths(stage)
        return self.spark.read.format(self.data_format).load(data_dir)

    def run(self, stage: str, fn, partition_by: list[str] | None = None
            ) -> DataFrame:
        """Compute-or-resume: if the stage manifest is complete, read it back
        instead of recomputing."""
        if self.is_complete(stage):
            return self.read(stage)
        self.write(stage, fn(), partition_by=partition_by)
        return self.read(stage)

    def metrics(self) -> list[dict]:
        """Per-stage metrics for THIS run's params only — a manifest left
        by a previous run with different inputs is stale, not a metric."""
        out = []
        for stage in sorted(os.listdir(self.root)):
            _, manifest = self._paths(stage)
            if os.path.exists(manifest):
                with open(manifest) as f:
                    m = json.load(f)
                if (m.get("status") != "complete"
                        or m.get("params_hash") != self.params_hash):
                    continue
                out.append({k: m[k] for k in
                            ("stage", "rows", "n_partitions", "wall_seconds",
                             "status") if k in m})
        return out
