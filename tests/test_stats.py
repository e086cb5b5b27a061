"""Statistical feature families vs numpy oracles — population-moment
conventions (np ddof=0, scipy bias=True, Fisher kurtosis) per SURVEY.md §4.2
"the #1 allclose trap"."""

from __future__ import annotations

import numpy as np

from ecg_feature_engineering_spark.operators import stats, windows


def _np_skew(x):  # scipy.stats.skew(bias=True)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    return m3 / m2**1.5 if m2 > 0 else np.nan


def _np_kurt(x):  # scipy.stats.kurtosis(bias=True, fisher=True)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m4 = ((x - m) ** 4).mean()
    return m4 / m2**2 - 3 if m2 > 0 else np.nan


def test_population_moments(spark, sf_dir, events_pdf):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (stats.with_group_mean(ev, "value", "user_id")
           .groupBy("user_id")
           .agg(*stats.basic_stat_aggs("value", "s_"))
           .toPandas().set_index("user_id").sort_index())
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp["value"].to_numpy()
        row = got.loc[uid]
        assert np.isclose(row["s_mean"], x.mean())
        assert np.isclose(row["s_var"], x.var(ddof=0))
        assert np.isclose(row["s_skew"], _np_skew(x))
        assert np.isclose(row["s_kurt"], _np_kurt(x))
        assert np.isclose(row["s_median"], np.percentile(x, 50))
        for p in (5, 25, 75, 95):
            assert np.isclose(row[f"s_p{p}"], np.percentile(x, p)), (uid, p)
        assert row["s_cnt"] == len(x)
        assert np.isclose(row["s_range"], x.max() - x.min())
        assert np.isclose(row["s_hr"], 1.0 / x.mean())


def test_hrv_aggs(spark, sf_dir, events_pdf):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = windows.with_lag_diff(ev, "value", "user_id", ["ts", "event_id"],
                               1, "d1")
    got = (ev.groupBy("user_id").agg(*stats.hrv_aggs("value", "d1", 15.0))
           .toPandas().set_index("user_id"))
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp.sort_values(["ts", "event_id"])["value"].to_numpy()
        d = np.diff(x)
        row = got.loc[uid]
        assert np.isclose(row["sdnn"], x.std(ddof=0))
        assert np.isclose(row["mean_rr"], x.mean())
        assert np.isclose(row["pnn50"], (np.abs(d) >= 15).sum() / len(x))
        assert np.isclose(row["rmssd"], np.sqrt((d**2).mean()))


def test_first_match_bin():
    thresholds = [150.0, 100.0, 50.0]

    def oracle(v):  # reference first-match descending scan
        for j, th in enumerate(thresholds):
            if v > th:
                return j
        return len(thresholds)

    import pandas as pd
    from ecg_feature_engineering_spark.session import get_spark
    spark = get_spark(cores=4)
    vals = [0.0, 50.0, 50.1, 100.0, 149.9, 150.0, 151.0, 1e6, -3.0]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = df.select(stats.first_match_bin("v", thresholds).alias("b")) \
            .toPandas()["b"].tolist()
    assert got == [oracle(v) for v in vals]


def test_mad(spark, sf_dir, events_pdf):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = stats.mad(ev, "value", "user_id").toPandas().set_index("user_id")
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp["value"].to_numpy()
        want = np.median(np.abs(x - np.median(x)))
        assert np.isclose(got.loc[uid, "mad"], want)


def test_autocorr(spark, sf_dir, events_pdf):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (stats.autocorr(ev, "value", [1, 2], "user_id", ["ts", "event_id"])
           .toPandas().set_index("user_id"))
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp.sort_values(["ts", "event_id"])["value"].to_numpy()
        for k in (1, 2):
            want = np.corrcoef(x[k:], x[:-k])[0, 1]
            assert np.isclose(got.loc[uid, f"acf{k}"], want), (uid, k)


def test_crossing_and_zigzag(spark, sf_dir, events_pdf):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got_c = (stats.crossing_count(ev, "value", 100.0, "user_id",
                                  ["ts", "event_id"])
             .toPandas().set_index("user_id")["n_crossings"])
    got_z = (stats.zigzag(ev, "value", "user_id", ["ts", "event_id"])
             .toPandas().set_index("user_id")["zigzag"])
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp.sort_values(["ts", "event_id"])["value"].to_numpy()
        want_c = int(((x[:-1] - 100.0) * (x[1:] - 100.0) < 0).sum())
        want_z = int(((x[1:-1] - x[:-2]) * (x[2:] - x[1:-1]) < 0).sum()) + 1
        assert got_c[uid] == want_c
        assert got_z[uid] == want_z


def test_with_group_mean_preserves_null_keys(spark):
    """groupBy treats NULL as a group, so the pass-1 mean join-back must
    too (review finding: a plain equi-join silently dropped NULL-keyed
    groups from basic/long stats)."""
    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (None, 10.0), (None, 30.0)],
        "user_id int, value double")
    out = stats.with_group_mean(df, "value", "user_id").toPandas()
    assert len(out) == 4
    null_rows = out[out["user_id"].isna()]
    assert len(null_rows) == 2
    assert (null_rows[stats.GROUP_MEAN_COL] == 20.0).all()
    assert (out[out["user_id"] == 1][stats.GROUP_MEAN_COL] == 3.0).all()
