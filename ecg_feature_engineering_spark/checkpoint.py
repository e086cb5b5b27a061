"""Checkpoint / resume / lineage layer (north rule: "resumable from
Iceberg-snapshot checkpoints with per-partition lineage and row-count/latency
metrics").

This container has no Iceberg jars, so the same contract is implemented
over parquet stage directories with an atomic manifest protocol; on a
cluster with the Iceberg runtime, pass ``data_format="iceberg"`` to write
stages as Iceberg tables (snapshots then add time-travel on top of this
layer's manifests).

ALL metadata I/O (mkdirs, manifest read/write/commit, lineage listing)
goes through the Hadoop FileSystem API resolved from the root's scheme —
a plain local path, ``file://``, ``hdfs://`` and ``s3a://`` roots all
behave identically. (The first cut used ``os`` I/O, which on a remote
root silently wrote the "complete" manifest into a literal local
``./hdfs:/...`` directory while the data went to HDFS — a resume from
another driver would recompute everything, and a same-machine resume
would trust a manifest for data that may no longer exist.) The manifest
commit is create-temp + rename — atomic on HDFS and on local posix.

Reference analog: stage outputs to CSV/MAT/pickle as coarse checkpoints
(resample.py:29, preprocess-300hz.py:444-470) — here made atomic, resumable,
and metered.
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class _HadoopFs:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem for the
    small-metadata operations the checkpointer needs."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration())
        self._jvm = jvm

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._Path(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        """create temp + rename: atomic manifest commit on HDFS and local."""
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        out = self._fs.create(self._Path(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        final = self._Path(path)
        if self._fs.exists(final):  # rename refuses existing targets
            self._fs.delete(final, False)
        if not self._fs.rename(self._Path(tmp), final):
            raise OSError(f"manifest rename failed: {tmp} -> {path}")

    def list_files_recursive(self, path: str) -> list[tuple[str, int]]:
        """(path-relative-to-root, bytes) for every file under ``path``."""
        base = str(self._fs.makeQualified(self._Path(path)).toString())
        out = []
        it = self._fs.listFiles(self._Path(path), True)
        while it.hasNext():
            st = it.next()
            full = str(st.getPath().toString())
            rel = full[len(base):].lstrip("/") if full.startswith(base) \
                else full
            out.append((rel, int(st.getLen())))
        return out

    def list_dir_names(self, path: str) -> list[str]:
        if not self.exists(path):
            return []
        return sorted(str(s.getPath().getName())
                      for s in self._fs.listStatus(self._Path(path)))


class StageCheckpointer:
    """Write/read named pipeline stages with manifests + per-partition lineage.

    Layout:  <root>/<stage>/data/          parquet (or iceberg table)
             <root>/<stage>/manifest.json  row counts, wall time, schema,
                                           per-file lineage (name + bytes)
    ``run(stage, fn)`` skips recompute when a valid manifest exists — the
    resume contract: a killed job rerun with the same root restarts at the
    first incomplete stage. The root may be any Hadoop-FS URI.
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
        self.fs = _HadoopFs(spark, root)
        self.fs.mkdirs(root)

    @staticmethod
    def _hash_params(params: dict) -> str:
        import hashlib

        blob = json.dumps(params, sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    def _paths(self, stage: str) -> tuple[str, str]:
        d = posixpath.join(self.root, stage)
        return posixpath.join(d, "data"), posixpath.join(d, "manifest.json")

    def is_complete(self, stage: str) -> bool:
        _, manifest = self._paths(stage)
        if not self.fs.exists(manifest):
            return False
        try:
            m = json.loads(self.fs.read_text(manifest))
            return (m.get("status") == "complete"
                    and m.get("params_hash") == self.params_hash)
        except Exception:  # corrupt manifest / racing writer / FS error
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
        lineage = [
            {"file": rel, "bytes": size}
            for rel, size in self.fs.list_files_recursive(data_dir)
            if rel.endswith((".parquet", ".orc", ".avro"))
        ]
        meta = {
            "status": "complete",
            "stage": stage,
            "run_id": str(uuid.uuid4()),
            "params_hash": self.params_hash,
            "rows": rows,
            "lineage_mode": "files",
            "n_partitions": len(lineage),
            "partitions": sorted(lineage, key=lambda p: p["file"]),
            "schema": out.schema.jsonValue(),
            "wall_seconds": round(time.time() - t0, 3),
            "written_at_unix": int(time.time()),
            "format": self.data_format,
        }
        self.fs.write_text_atomic(manifest, json.dumps(meta, indent=1))
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
        for stage in self.fs.list_dir_names(self.root):
            _, manifest = self._paths(stage)
            if self.fs.exists(manifest):
                m = json.loads(self.fs.read_text(manifest))
                if (m.get("status") != "complete"
                        or m.get("params_hash") != self.params_hash):
                    continue
                out.append({k: m[k] for k in
                            ("stage", "rows", "n_partitions", "wall_seconds",
                             "status") if k in m})
        return out
