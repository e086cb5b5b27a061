"""Property-based fuzz of the as-of join against pd.merge_asof: random
entity layouts, duplicate timestamps, empty sides, single-row groups."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ecg_feature_engineering_spark.operators import asof

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from ecg_feature_engineering_spark.session import get_spark
        _spark = get_spark(app_name="fuzz", cores=4, shuffle_partitions=4)
    return _spark


@st.composite
def frames(draw):
    n_ent = draw(st.integers(1, 4))
    base = pd.Timestamp("2024-01-01")

    def side(n_rows, col):
        ents = draw(st.lists(st.integers(0, n_ent - 1), min_size=n_rows,
                             max_size=n_rows))
        # coarse second grid -> plenty of duplicate/equal-ts collisions
        secs = draw(st.lists(st.integers(0, 50), min_size=n_rows,
                             max_size=n_rows))
        # distinct values, with random NULLs (the matched row's NULL must
        # survive — regression for the per-column ignorenulls backfill bug)
        null_at = draw(st.lists(st.booleans(), min_size=n_rows,
                                max_size=n_rows))
        vals = [None if (null_at[i] and i > 0) else round(i * 0.5, 1)
                for i in range(n_rows)]  # row 0 non-null: keeps the
        #                                   column's inferred type stable
        return pd.DataFrame({
            "entity_id": [f"e{e}" for e in ents],
            "ts": [base + pd.Timedelta(seconds=s) for s in secs],
            col: vals})

    nl = draw(st.integers(1, 12))
    nr = draw(st.integers(0, 12))
    left, right = side(nl, "lval"), side(nr, "rval")
    # the engine's tie contract leaves duplicate (entity, ts) RIGHT rows
    # unspecified (documented in asof_join) — fuzz over unique right keys
    right = right.drop_duplicates(["entity_id", "ts"], keep="last")
    return left, right


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(frames(), st.sampled_from(["backward", "forward"]),
       st.sampled_from(["union_window", "union_window_bucketed"]))
def test_asof_fuzz_matches_pandas(fr, direction, strategy):
    left, right = fr
    spark = _get_spark()
    ldf = spark.createDataFrame(left)
    rdf = (spark.createDataFrame(right) if len(right) else
           spark.createDataFrame([], "entity_id string, ts timestamp,"
                                 " rval double"))
    got = (asof.asof_join(ldf, rdf, on="ts", by="entity_id",
                          direction=direction, strategy=strategy,
                          bucket_seconds=7.0)
           .toPandas())

    outs = []
    for ent, lg in left.groupby("entity_id"):
        rg = right[right.entity_id == ent]
        if rg.empty:
            m = lg.copy()
            m["rval"] = np.nan
        else:
            # pandas merge_asof needs a deterministic tie order on equal
            # right ts; engine takes the LAST right row in (ts) order,
            # matching merge_asof's keep-last-duplicate behavior
            m = pd.merge_asof(
                lg.sort_values(["ts", "lval"], kind="mergesort"),
                rg.sort_values("ts", kind="mergesort")[["ts", "rval"]],
                on="ts", direction=direction, allow_exact_matches=True)
        outs.append(m)
    want = (pd.concat(outs)
            .sort_values(["entity_id", "ts", "lval"], kind="mergesort")
            .reset_index(drop=True))
    got = got.sort_values(["entity_id", "ts", "lval"],
                          kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(got["rval"].to_numpy(float),
                               want["rval"].to_numpy(float),
                               rtol=0, atol=0, equal_nan=True)
