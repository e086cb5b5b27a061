"""Sources & sinks — SURVEY.md §2.1 S1-S10 re-expressed on Spark's
connector surface.

| reference                         | here                                   |
|-----------------------------------|----------------------------------------|
| dir listing + .mat filter (S1)    | table scan; catalog owns file listing  |
| scio.loadmat payload (S3)         | binaryFile ingest -> bytes column      |
| csv.reader / pd.read_csv (S4/S5)  | read_csv (schema-locked, pushdown)     |
| df.to_csv sink (S6)               | write_csv                              |
| HDF5/MAT/pickle sinks (S7-S9)     | partitioned parquet (+ checkpoint.py   |
|                                   | manifests for the resume contract)     |
| split-list text files (S10)       | split column written with the table    |

Iceberg note: this container has no Iceberg jars; `write_table` uses the
parquet path-layout with `partitionBy`, which is the layout Iceberg's
partition transforms produce. On a cluster with Iceberg on the classpath,
`format("iceberg")` is a one-line swap (checkpoint.py already probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             header: bool = True) -> DataFrame:
    """Schema-locked CSV scan (S4/S5). Never infer on big data: inference
    is an extra full pass over 100 TB before the real one."""
    return spark.read.csv(path, schema=schema, header=header, mode="PERMISSIVE")


def write_csv(df: DataFrame, path: str, header: bool = True,
              single_file: bool = False) -> None:
    """CSV sink (S6). ``single_file`` coalesces to one part — only for
    small result tables (the reference's feature CSVs); large outputs keep
    their partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").csv(path, header=header)


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None,
                      recursive: bool = False) -> DataFrame:
    """Raw payload ingest (S3 analog): one row per file with
    (path, modificationTime, length, content:binary) — the bootstrap step
    that turns a directory of image files into the input_hint table.
    ``recursive`` descends into subdirectories (ids stay unique because
    the payload table keys on the full path, not the stem)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def binary_files_to_payload_table(files: DataFrame) -> DataFrame:
    """binaryFile rows -> input_hint-shaped skeleton: id from the file
    PATH minus scheme and extension (the reference keys on filename stems,
    extract_HRV.py:29 — but a bare stem collides for same-named files in
    different directories, so the directory part stays in the id), bytes
    payload, fmt from the extension (null for extensionless files — filter
    or map those BEFORE the decode kernel); w/h/caption/phash left to the
    decode kernels."""
    # scheme can be single-slash URI form (file:/tmp/x) or double (s3a://)
    no_scheme = F.regexp_replace(F.col("path"), r"^[a-zA-Z][\w+.-]*:/+", "/")
    stem = F.regexp_replace(no_scheme, r"\.[^./]+$", "")
    ext = F.lower(F.nullif(
        F.regexp_extract(F.col("path"), r"\.([^./]+)$", 1), F.lit("")))
    return files.select(
        stem.alias("image_id"),
        F.col("content").alias("bytes"),
        F.col("length").alias("n_bytes"),
        ext.alias("fmt"),
        F.col("modificationTime").alias("ts"),
    )


def write_table(df: DataFrame, path: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    """Partitioned parquet sink (S6-S9 replacement). Partition columns
    should be low-cardinality (entity *range* buckets, dates) — never the
    raw entity id at 10^12 scale (small-files explosion)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | str) -> DataFrame:
    """Schema-locked JSON-lines scan (the interchange format LLM data
    pipelines actually exchange). Same rule as CSV: never infer — JSON
    inference is a full extra pass, and absent keys must deserialize to
    typed NULLs, not drop columns."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink. Spark omits null fields per line (standard JSONL
    producer behavior); a schema-locked read restores them as typed NULLs,
    so write->read roundtrips exactly — including control characters,
    which JSON string escaping preserves byte-for-byte."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning surface as parquet (predicate
    pushdown, column pruning, partition pruning all apply)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str,
              partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
    """ORC sink — for warehouses standardized on ORC (Hive-lineage
    clusters). Identical partitioning contract to `write_table`."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def with_entity_bucket(df: DataFrame, entity: str = "entity_id",
                       n_buckets: int = 256,
                       out: str = "entity_bucket") -> DataFrame:
    """Stable hash bucket for partition layout / co-located joins: two
    tables written with the same bucketing join without a shuffle when read
    back bucketed (or prune to one bucket for point lookups)."""
    return df.withColumn(out, F.pmod(F.xxhash64(entity), F.lit(n_buckets)))
