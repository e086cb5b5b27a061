"""As-of (point-in-time) join — the engine's centerpiece operator.

Reference analog: resampling every record onto a common clock + positional
alignment of per-record feature rows (resample.py:22-28, xgboost_clf.py:12-15)
— SURVEY.md §2.3 J5. Spark has no SQL as-of join builtin, so this module ships
two interchangeable strategies behind one API:

``strategy="union_window"`` (default, fully JVM-side):
    union the tagged left (probe) and right (state) rows, sort within an
    entity-partitioned window by (ts, side), and fill the right payload with
    ``last(ignorenulls)`` over an unbounded-preceding frame (backward) or
    ``first(ignorenulls)`` over an unbounded-following frame (forward).
    One shuffle on the ``by`` key; whole-stage codegen end-to-end; no Python.

``strategy="merge_asof"`` (Arrow path):
    ``left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas`` running
    ``pd.merge_asof`` per entity group. Useful when the right payload is wide
    (window fill materializes every fill column) or when tolerance/nearest
    semantics get complex.

Zero temporal leakage (north rule): backward matches satisfy
``right.ts <= left.ts`` strictly by construction of the sort order — a right
row with ts > as_of can never precede the probe row in the frame. The leakage
test perturbs future rows and asserts bit-identical output (tests/test_asof.py).

Scale notes (100 TB): both strategies shuffle once on ``by``. Hot entities
(FIXTURES.md: ~10% of rows on one entity) are ordered scans within a partition
— O(n) per entity, no quadratic blowup; AQE cannot split a window partition,
so for pathological single-entity skew use ``coalesce_hot_entities`` guidance
in operators/skew.py (time-bucketed two-pass fill planned for round 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"
_RTS = "__asof_right_ts"


def _right_value_cols(left: DataFrame, right: DataFrame, by: list[str],
                      right_on: str, suffix: str) -> list[tuple[str, str]]:
    """(right_col, output_name) pairs; collisions with left get the suffix."""
    left_names = set(left.columns)
    out = []
    for c in right.columns:
        if c in by or c == right_on:
            continue
        out.append((c, c + suffix if c in left_names else c))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "entity_id",
    right_on: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_r",
    strategy: str = "union_window",
    keep_match_ts: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row that is latest with
    ``right.ts <= left.ts`` (backward) or earliest with ``right.ts >= left.ts``
    (forward) within the same ``by`` group; unmatched -> nulls.

    ``tolerance``: optional Column interval (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    — matches farther than it are nulled.
    ``keep_match_ts``: if set, expose the matched right timestamp under this
    output column name (lineage/debug).
    """
    by = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if strategy == "union_window":
        out = _asof_union_window(left, right, on, by, right_on, direction,
                                 tolerance, suffix)
    elif strategy == "merge_asof":
        out = _asof_merge_pandas(left, right, on, by, right_on, direction,
                                 tolerance, suffix)
    else:
        raise ValueError(f"unknown strategy {strategy}")
    if keep_match_ts:
        out = out.withColumnRenamed(_RTS, keep_match_ts)
    else:
        out = out.drop(_RTS)
    return out


def _asof_union_window(left, right, on, by, right_on, direction, tolerance,
                       suffix) -> DataFrame:
    vcols = _right_value_cols(left, right, by, right_on, suffix)
    left_cols = left.columns

    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(left.schema[on].dataType).alias(_RTS),
        *[F.lit(None).cast(right.schema[rc].dataType).alias(oc)
          for rc, oc in vcols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by and c != on],
        F.col(right_on).cast(left.schema[on].dataType).alias(on),
        F.lit(0).alias(_SIDE),
        F.col(right_on).alias(_RTS),
        *[F.col(rc).alias(oc) for rc, oc in vcols],
    ).select(*l_tagged.columns)  # align union order

    u = l_tagged.unionByName(r_tagged)

    fill_cols = [_RTS] + [oc for _, oc in vcols]
    if direction == "backward":
        # right rows sort BEFORE probe rows at equal ts -> inclusive <=
        w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = [F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols]
    else:
        # probe rows sort BEFORE right rows at equal ts -> inclusive >=
        w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        filled = [F.first(c, ignorenulls=True).over(w).alias(c) for c in fill_cols]

    keep = [c for c in u.columns if c not in fill_cols and c != _SIDE]
    out = (u.select(*keep, F.col(_SIDE), *filled)
            .where(F.col(_SIDE) == 1)
            .drop(_SIDE))

    if tolerance is not None:
        gap_ok = (
            F.col(on) - F.col(_RTS) <= tolerance
            if direction == "backward"
            else F.col(_RTS) - F.col(on) <= tolerance
        )
        out = out.select(
            *[c for c in out.columns if c not in {*(oc for _, oc in vcols), _RTS}],
            *[F.when(gap_ok, F.col(oc)).alias(oc) for _, oc in vcols],
            F.when(gap_ok, F.col(_RTS)).alias(_RTS),
        )
    return out


def _asof_merge_pandas(left, right, on, by, right_on, direction, tolerance,
                       suffix) -> DataFrame:
    import pandas as pd  # executor-side import
    from pyspark.sql.types import StructField, StructType

    vcols = _right_value_cols(left, right, by, right_on, suffix)
    # build a fresh StructType: StructType.add mutates in place and would
    # corrupt the input DataFrame's cached schema
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(_RTS, left.schema[on].dataType)]
        + [StructField(oc, right.schema[rc].dataType) for rc, oc in vcols]
    )

    tol_pd = None
    if tolerance is not None:
        # Column intervals aren't shippable; accept pd.Timedelta-compatible str
        raise NotImplementedError(
            "merge_asof strategy takes tolerance via functools.partial at the "
            "call site for now; use union_window for tolerance semantics"
        )

    left_names = list(left.columns)

    def join_group(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        l_sorted = l_pdf.sort_values(on, kind="mergesort")
        r_small = r_pdf[[right_on] + [rc for rc, _ in vcols]].copy()
        r_small.columns = [_RTS] + [oc for _, oc in vcols]
        r_sorted = r_small.sort_values(_RTS, kind="mergesort")
        merged = pd.merge_asof(
            l_sorted, r_sorted, left_on=on, right_on=_RTS,
            direction=direction, tolerance=tol_pd, allow_exact_matches=True,
        )
        return merged[[*left_names, _RTS, *[oc for _, oc in vcols]]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(join_group, schema=out_schema)
    )
