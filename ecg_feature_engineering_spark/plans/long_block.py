"""The reference's complete LONG feature block per entity/lead —
``get_long_feature`` (LONG_features.py:265-281): LongBasicStat,
LongZeroCrossing(0), the FFT family (band power / total power / entropy /
SNR), autocorr, zigzag, LongThresCrossing (mean threshold + paired widths),
WaveletStat.

The reference recomputes ``LongFFTBandPower`` THREE times and
``long_zigzag`` TWICE per lead (LONG_features.py:270-281 — a quirk:
identical values, duplicated CSV columns, ~102 cols/lead). The engine
computes each family ONCE (shared periodogram pass, one aggregate each)
and, with ``parity=True``, replicates the duplicated outputs as
``*_dup1``/``*_dup2`` columns so output ARITY matches the reference's
LONG_FEATURE.csv column-for-column (DataFrame column names must be unique,
so the dup columns are suffixed; values are byte-identical copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecg_feature_engineering_spark.functions import kernels
from ecg_feature_engineering_spark.operators import stats

# the three identical LongFFTBandPower emissions (LONG_features.py:270,274,276)
_FFT_BAND_COLS = [f"band{i}" for i in range(6)]
# the two identical long_zigzag emissions (:278, :281)
_ZIGZAG_COL = "zigzag"


def long_features(events: DataFrame, by: str = "user_id",
                  value: str = "value", order=("ts", "event_id"),
                  fs: float = 1.0, parity: bool = False) -> DataFrame:
    """One row per entity with the full LONG block. All relational
    families share the same (by, order) sort; the FFT + wavelet families
    are Arrow kernels (one applyInPandas each). Components are joined on
    the entity key — each side is one row per entity, so the joins are
    trivially shuffle-light (and broadcastable at any realistic entity
    count per partition)."""
    order = list(order) if not isinstance(order, str) else [order]

    basic = stats.with_group_mean(events, value, by).groupBy(by).agg(
        *stats.long_stat_aggs(value, prefix="lb_"))
    zcross = stats.crossing_count(events, value, 0.0, by=by, order=order,
                                  out="zero_cross_cnt")
    fft = kernels.fft_features_agg(events, value, by, order, fs=fs,
                                   snr_cut_hz=0.1)
    ac = stats.autocorr(events, value, [1, 3], by=by, order=order)
    zz = stats.zigzag(events, value, by=by, order=order, out=_ZIGZAG_COL)
    thres = stats.crossing_width_stats(events, value, by=by, order=order) \
        .withColumnRenamed("n_crossings", "thres_cross_cnt") \
        .withColumnRenamed("mean_width", "thres_cross_mean_width")
    wav = kernels.wavelet_stat_agg(events, value, by, order)

    out = (basic.join(zcross, by).join(fft, by).join(ac, by)
           .join(zz, by).join(thres, by).join(wav, by))

    if parity:
        dup_cols = []
        for d in (1, 2):
            dup_cols += [F.col(c).alias(f"{c}_dup{d}")
                         for c in _FFT_BAND_COLS]
        dup_cols.append(F.col(_ZIGZAG_COL).alias(f"{_ZIGZAG_COL}_dup1"))
        out = out.select("*", *dup_cols)
    return out


def expected_columns(by: str = "user_id", parity: bool = False) -> list[str]:
    """The column contract (pytest asserts this list; COVERAGE.md cites
    it for the LONG arity-parity row)."""
    cols = [by]
    cols += ["lb_range", "lb_var", "lb_skew", "lb_kurt", "lb_median"]
    cols += [f"lb_p{q}" for q in (1, 5, 10, 25, 75, 90, 95, 99)]
    cols += ["lb_ipr_99_1", "lb_ipr_95_5", "lb_ipr_90_10", "lb_ipr_75_25"]
    cols += ["zero_cross_cnt"]
    cols += _FFT_BAND_COLS + ["total_power", "band_entropy", "snr"]
    cols += ["acf1", "acf3", _ZIGZAG_COL,
             "thres_cross_cnt", "thres_cross_mean_width"]
    cols += [f"wv{i}" for i in range(48)]  # 8 bands x 6 stats
    if parity:
        cols += [f"{c}_dup1" for c in _FFT_BAND_COLS]
        cols += [f"{c}_dup2" for c in _FFT_BAND_COLS]
        cols += [f"{_ZIGZAG_COL}_dup1"]
    return cols
