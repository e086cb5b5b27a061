"""Arrow-level schema compatibility between engine output and oracles.

The round driver hashes query results at the Arrow level, so two results
with identical VALUES can still mismatch when their Arrow types differ in
kind — the round-2 root cause was DuckDB ``SUM(int)`` returning HUGEINT
(Arrow ``decimal128(38,0)``) against Spark's ``int64``. pandas coercion
hides that class entirely, so every local parity harness compares coarse
Arrow kinds BEFORE converting to pandas.
"""

from __future__ import annotations


def arrow_kind(t) -> str:
    """Coarse Arrow type class: int width differences are fine (values
    hash alike), decimal-vs-int is not."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def compare_arrow_kinds(spark_tbl, oracle_tbl) -> list[str]:
    """Kind mismatches between two Arrow tables' shared columns."""
    skinds = {f.name: arrow_kind(f.type) for f in spark_tbl.schema}
    dkinds = {f.name: arrow_kind(f.type) for f in oracle_tbl.schema}
    errs = []
    for c in sorted(set(skinds) & set(dkinds)):
        if skinds[c] != dkinds[c]:
            errs.append(
                f"col {c}: Arrow kind differs: spark={skinds[c]} "
                f"oracle={dkinds[c]} (driver hashes Arrow values — this "
                f"mismatches even with identical values; CAST the oracle)")
    return errs
