"""Local stand-in for the driver's correctness gate: run every
queries()[name] on Spark and the matching oracle_sql()[name] on DuckDB at a
given sf dir, compare row count, column names, and (rounded) values
order-insensitively. Usage:

    python scripts/check_parity.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


from ecg_feature_engineering_spark.arrow_compat import (  # noqa: E402
    compare_arrow_kinds,
)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        errs.append(f"columns differ: spark={sorted(spark_df.columns)} "
                    f"duck={sorted(duck_df.columns)}")
        return errs
    if len(spark_df) != len(duck_df):
        errs.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
    cols = sorted(spark_df.columns)
    a = spark_df[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    b = duck_df[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    if len(a) != len(b):
        return errs
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)[:3]
                errs.append(
                    f"col {c}: {len(np.flatnonzero(~eq))} mismatches, e.g. "
                    + "; ".join(f"[{i}] spark={af[i]!r} duck={bf[i]!r}"
                                for i in bad))
        else:
            eq = (av.astype(object).where(pd.notna(av), None)
                  == bv.astype(object).where(pd.notna(bv), None))
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:3]
                errs.append(
                    f"col {c}: mismatches e.g. "
                    + "; ".join(f"[{i}] spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                                for i in bad))
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]

    import __spark_entry__ as e
    from ecg_feature_engineering_spark.session import get_spark

    spark = get_spark(cores=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    from ecg_feature_engineering_spark import contract as _c
    _c.ensure_workers_can_import(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            stbl = fn(spark, sf_dir).toArrow()
            sdf = stbl.to_pandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            dtbl = con.execute(oracles[name]).fetch_arrow_table()
            ddf = dtbl.to_pandas()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        try:
            errs = compare_arrow_kinds(stbl, dtbl)
            errs += compare(name, sdf, ddf)
        except Exception as ex:  # comparison itself must not kill the gate
            errs = [f"compare error: {type(ex).__name__}: {ex}"]
        if errs:
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for er in errs:
                print(f"     {er}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed at {sf_dir}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
