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
— O(n) per entity, no quadratic blowup — but AQE cannot split a window
partition, so a single pathological entity serializes into one task. For that
case ``strategy="union_window_bucketed"`` cuts time into buckets and fills in
two passes (within-bucket + tiny carry summaries), spreading a hot entity
over #buckets tasks at the cost of one extra small shuffle
(equivalence-tested against union_window in tests/test_asof.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"
_RTS = "__asof_right_ts"


def _right_value_cols(left: DataFrame, right: DataFrame, by: list[str],
                      right_on: str, suffix: str) -> list[tuple[str, str]]:
    """(right_col, output_name) pairs; collisions with left get the suffix."""
    used = set(left.columns)
    out = []
    for c in right.columns:
        if c in by or c == right_on:
            continue
        oc = c + suffix if c in used else c
        while oc in used:          # suffixed name may ALSO collide (e.g.
            oc = oc + suffix       # right has both 'x' and 'x_r')
        used.add(oc)
        out.append((c, oc))
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
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """For every left row, attach the right row that is latest with
    ``right.ts <= left.ts`` (backward) or earliest with ``right.ts >= left.ts``
    (forward) within the same ``by`` group; unmatched -> nulls.

    ``tolerance``: optional Column interval (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    — matches farther than it are nulled.
    ``keep_match_ts``: if set, expose the matched right timestamp under this
    output column name (lineage/debug).

    Tie contract: if the right side has MULTIPLE rows at the same
    (by, ts), which one wins is unspecified (found by fuzzing,
    tests/test_asof_fuzz.py). pandas resolves such ties by physical row
    position, which has no distributed equivalent. Deduplicate the right
    side on (by, ts) first (e.g. ``max_by`` per key) when duplicate
    event timestamps are possible; all strategies then agree exactly.
    """
    by = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if strategy == "union_window":
        out = _asof_union_window(left, right, on, by, right_on, direction,
                                 tolerance, suffix)
    elif strategy == "union_window_bucketed":
        out = _asof_union_window_bucketed(left, right, on, by, right_on,
                                          direction, tolerance, suffix,
                                          bucket_seconds)
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


def asof_join_many(
    left: DataFrame,
    rights: list[dict],
    on: str = "ts",
    by: str | list[str] = "entity_id",
) -> DataFrame:
    """Backward as-of join of SEVERAL right tables to one probe table in a
    single union + window pass — one shuffle and one sort total, however
    many right sides there are (vs one shuffle+sort per ``asof_join`` call).

    ``rights``: each ``{"df": DataFrame, "on": ts_col (default ``on``),
    "suffix": str, "match_ts": output name for the matched right ts or
    None}``. Each right table's payload is packed into ONE struct and the
    struct is filled (``last(ignorenulls)``) — per-source exact matches,
    and a NULL inside the matched row stays NULL (a column-by-column fill
    would backfill it from an older row).

    This is the flagship-plan shape (plans/flagship.py): image features and
    event features both as-of joined to the snapshot grid — at 10^12 rows
    the saved exchange+sort is a full extra pass over the biggest table in
    the plan. Leak-free like ``asof_join``: right rows sort before probe
    rows at equal ts, frames end at currentRow.
    """
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns
    ts_type = left.schema[on].dataType
    used = set(left_cols)
    specs = []  # (rdf, r_on, [(right_col, out_col)], match_ts_out)
    for i, spec in enumerate(rights):
        rdf, r_on = spec["df"], spec.get("on", on)
        if r_on not in rdf.columns:
            raise ValueError(
                f"rights[{i}]: ts column {r_on!r} not in right columns "
                f"{rdf.columns}; pass 'on' in the spec")
        sfx = spec.get("suffix", f"_r{i}")
        vcols = []
        for c in rdf.columns:
            if c in by or c == r_on:
                continue
            oc = c + sfx if c in used else c
            used.add(oc)
            vcols.append((c, oc))
        mts = spec.get("match_ts")
        if mts:
            used.add(mts)
        specs.append((rdf, r_on, vcols, mts))

    # (out_col, owning_source_idx, right_col_or_None_for_match_ts, dtype)
    fill = []
    for i, (rdf, r_on, vcols, mts) in enumerate(specs):
        for rc, oc in vcols:
            fill.append((oc, i, rc, rdf.schema[rc].dataType))
        if mts:
            fill.append((mts, i, None, ts_type))

    l_tagged = left.select(
        *left_cols, F.lit(1).alias(_SIDE), F.lit(-1).alias("__src"),
        *[F.lit(None).cast(dt).alias(oc) for oc, _, _, dt in fill])
    parts = [l_tagged]
    for i, (rdf, r_on, vcols, mts) in enumerate(specs):
        sel = []
        for c in left_cols:
            if c in by:
                sel.append(F.col(c))
            elif c == on:
                sel.append(F.col(r_on).cast(ts_type).alias(c))
            else:
                sel.append(F.lit(None).cast(left.schema[c].dataType).alias(c))
        sel.append(F.lit(0).alias(_SIDE))
        sel.append(F.lit(i).alias("__src"))
        for oc, si, rc, dt in fill:
            if si != i:
                sel.append(F.lit(None).cast(dt).alias(oc))
            elif rc is None:
                sel.append(F.col(r_on).cast(ts_type).alias(oc))
            else:
                sel.append(F.col(rc).alias(oc))
        parts.append(rdf.select(*sel).select(*l_tagged.columns))

    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    # one struct pack PER SOURCE (see _asof_union_window: column-by-column
    # fill would replace a matched row's NULL value with an older row's)
    src_cols: dict[int, list[str]] = {}
    for oc, si, _, _ in fill:
        src_cols.setdefault(si, []).append(oc)
    for i, cols in src_cols.items():
        u = u.withColumn(
            f"__pack{i}",
            F.when((F.col("__src") == i) & F.col(on).isNotNull(),
                   F.struct(*[F.col(c).alias(c) for c in cols])))

    out_cols = [oc for oc, _, _, _ in fill]
    w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    keep = [c for c in u.columns
            if c not in out_cols and c not in (_SIDE, "__src")
            and not c.startswith("__pack")]
    filled = u.select(
        *keep, F.col(_SIDE),
        *[F.last(f"__pack{i}", ignorenulls=True).over(w)
          .alias(f"__pf{i}") for i in src_cols])
    extract = []
    for oc, si, _, _ in fill:
        extract.append(
            F.when(F.col(on).isNotNull(),
                   F.col(f"__pf{si}").getField(oc)).alias(oc))
    return (
        filled.where(F.col(_SIDE) == 1)
        .select(*keep, *extract)
    )


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
    # fill the right payload as ONE struct, not column-by-column: the
    # struct is non-null for every right row even when its members are
    # null, so a NULL value in the matched row stays NULL instead of being
    # back-filled from an older row — (match_ts, values) always come from
    # the SAME matched right row (and the tolerance gate below therefore
    # nulls values that belong to the ts it checks)
    # a NULL-ts right row must never match (it would sort first and act
    # as an infinitely-old match); a NULL-ts probe gets all-null fills
    pack = F.when((F.col(_SIDE) == 0) & F.col(on).isNotNull(),
                  F.struct(*[F.col(c).alias(c) for c in fill_cols]))
    u = u.withColumn("__pack", pack)
    if direction == "backward":
        # right rows sort BEFORE probe rows at equal ts -> inclusive <=
        w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = F.last("__pack", ignorenulls=True).over(w)
    else:
        # probe rows sort BEFORE right rows at equal ts -> inclusive >=
        w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        filled = F.first("__pack", ignorenulls=True).over(w)

    keep = [c for c in u.columns
            if c not in fill_cols and c not in (_SIDE, "__pack")]
    out = (u.select(*keep, F.col(_SIDE), F.col(on).alias("__on"),
                    filled.alias("__pf"))
            .where(F.col(_SIDE) == 1)
            .select(*keep,
                    *[F.when(F.col("__on").isNotNull(),
                             F.col("__pf").getField(c)).alias(c)
                      for c in fill_cols]))

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


def _asof_union_window_bucketed(left, right, on, by, right_on, direction,
                                tolerance, suffix,
                                bucket_seconds: float) -> DataFrame:
    """Hot-entity-safe as-of: the plain union-window sorts ALL of an
    entity's rows in one task (window partitions can't split — the 10%-hot
    entity in FIXTURES.md becomes a straggler at 10^12 rows). Here time is
    cut into buckets and the fill runs in two passes:

      1. within-(entity, time-bucket) running fill — parallel across
         buckets, so a hot entity spreads over #buckets tasks;
      2. per-bucket "carry" summaries (last non-null value per bucket —
         a tiny table) filled across buckets per entity, joined back;
         final value = coalesce(within-bucket fill, carry from the most
         recent earlier bucket).

    Same semantics as union_window (equivalence-tested); one extra shuffle
    over the small summary table is the price for unbounded entity skew
    tolerance. Forward direction mirrors with following-frames.
    """
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
    ).select(*l_tagged.columns)

    # ntz-safe epoch seconds for the bucket id: a cast-through-timestamp is
    # session-tz-dependent for NTZ inputs (bucket semantics survive either
    # way — buckets stay contiguous and the carry pass crosses them — but
    # the engine's tz-independence rule applies everywhere)
    from ecg_feature_engineering_spark.operators import windows as _w
    on_type = dict(zip(l_tagged.schema.names,
                       (f.dataType.simpleString()
                        for f in l_tagged.schema.fields)))[on]
    sec = (_w.ntz_epoch_seconds(F.col(on)) if on_type == "timestamp_ntz"
           else F.col(on).cast("timestamp").cast("double"))
    u = (l_tagged.unionByName(r_tagged)
         .withColumn("__bkt", F.floor(sec / F.lit(bucket_seconds))
                     .cast("long")))

    fill_cols = [_RTS] + [oc for _, oc in vcols]
    backward = direction == "backward"
    # single struct pack (see _asof_union_window: per-column fill would
    # backfill a matched row's NULL members from older rows)
    u = u.withColumn(
        "__pack",
        F.when((F.col(_SIDE) == 0) & F.col(on).isNotNull(),
               F.struct(*[F.col(c).alias(c) for c in fill_cols])))
    side_order = F.col(_SIDE).asc() if backward else F.col(_SIDE).desc()
    w_in = Window.partitionBy(*by, "__bkt").orderBy(F.col(on).asc(),
                                                    side_order)
    w_in = (w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            if backward else
            w_in.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    fill_in = (F.last if backward else F.first)

    within = u.select(
        "*", fill_in("__pack", ignorenulls=True).over(w_in).alias("__in"))

    # per-bucket summaries: the pack a later (earlier, for forward) bucket
    # would inherit — i.e. the bucket's last (first) right pack
    pick = F.max_by if backward else F.min_by
    order_key = F.struct(sec.alias("s"), F.col(_SIDE).alias("d"))
    summaries = u.groupBy(*by, "__bkt").agg(
        pick(F.col("__pack"),
             F.when(F.col("__pack").isNotNull(), order_key)).alias("__b"))
    w_carry = Window.partitionBy(*by).orderBy(
        F.col("__bkt").asc() if backward else F.col("__bkt").desc())
    w_carry = w_carry.rowsBetween(Window.unboundedPreceding, -1)
    carries = summaries.select(
        *by, "__bkt",
        F.last("__b", ignorenulls=True).over(w_carry).alias("__carry"))

    out = (
        within.where(F.col(_SIDE) == 1)
        .join(carries, on=[*by, "__bkt"], how="left")
        .withColumn("__pf", F.coalesce(F.col("__in"), F.col("__carry")))
        .select(
            *[c for c in left_cols],
            *[F.when(F.col(on).isNotNull(),
                     F.col("__pf").getField(c)).alias(c)
              for c in fill_cols],
        )
    )

    if tolerance is not None:
        gap_ok = (
            F.col(on) - F.col(_RTS) <= tolerance
            if backward else F.col(_RTS) - F.col(on) <= tolerance
        )
        out = out.select(
            *[c for c in out.columns
              if c not in {*(oc for _, oc in vcols), _RTS}],
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
        out_cols = [*left_names, _RTS, *[oc for _, oc in vcols]]
        # NULL-ts rows don't participate: null-ts right rows can't match
        # (and would crash merge_asof's sortedness check), null-ts probes
        # get all-null fills
        l_ok = l_pdf[l_pdf[on].notna()]
        l_null = l_pdf[l_pdf[on].isna()]
        r_small = r_pdf[r_pdf[right_on].notna()][
            [right_on] + [rc for rc, _ in vcols]].copy()
        r_small.columns = [_RTS] + [oc for _, oc in vcols]
        parts = []
        if len(l_ok):
            l_sorted = l_ok.sort_values(on, kind="mergesort")
            r_sorted = r_small.sort_values(_RTS, kind="mergesort")
            merged = pd.merge_asof(
                l_sorted, r_sorted, left_on=on, right_on=_RTS,
                direction=direction, tolerance=tol_pd,
                allow_exact_matches=True,
            )
            parts.append(merged[out_cols])
        if len(l_null):
            nn = l_null.copy()
            for c in [_RTS] + [oc for _, oc in vcols]:
                nn[c] = None
            parts.append(nn[out_cols])
        return pd.concat(parts, ignore_index=True)

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(join_group, schema=out_schema)
    )
