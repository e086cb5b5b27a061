"""Adversarial-corpus oracle parity: the driver's testdata contains no
duplicate timestamps, no exotic whitespace, and no tiny entities — three
input classes where engine and oracle can be 'wrong together' or diverge
invisibly. These fixtures force each class and re-run the REGISTERED
queries against their REGISTERED DuckDB oracles directly (the same
comparison the driver's correctness gate performs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ecg_feature_engineering_spark import contract


def _compare(spark, con, names, sf_dir):
    # Arrow-kind gate first: the driver hashes Arrow-level values, so a
    # DuckDB SUM(int)->decimal128 (HUGEINT) column vs Spark int64 fails
    # its hash even with identical values (VERDICT r2 root cause) —
    # pandas coercion below would mask exactly that.
    from ecg_feature_engineering_spark.arrow_compat import (
        compare_arrow_kinds,
    )

    bad = []
    for name in names:
        stbl = contract.QUERY_BUILDERS[name](spark, sf_dir).toArrow()
        sdf = stbl.to_pandas()
        otbl = con.execute(contract.ORACLES[name]).fetch_arrow_table()
        odf = otbl.to_pandas()
        for err in compare_arrow_kinds(stbl, otbl):
            bad.append(f"{name}: {err}")
        cols = sorted(sdf.columns)
        a = sdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        if len(a) != len(b):
            bad.append(f"{name}: rows {len(a)} vs {len(b)}")
            continue
        for c in cols:
            av, bv = a[c], b[c]
            try:
                eq = (np.isclose(av.astype(float), bv.astype(float))
                      | (av.isna() & bv.isna()))
            except (ValueError, TypeError):
                eq = (av.astype(str) == bv.astype(str))
            if not eq.all():
                bad.append(f"{name}.{c}")
                break
    assert not bad, bad


@pytest.fixture(scope="module")
def duck():
    import duckdb

    return duckdb.connect()


@pytest.fixture(scope="module")
def ties_dir(spark, tmp_path_factory):
    """Events with many duplicate (user, ts) pairs — the tie-order class."""
    root = tmp_path_factory.mktemp("ties")
    rng = np.random.default_rng(9)
    rows, eid = [], 0
    for u in range(1, 7):
        t = 0
        for _ in range(40):
            t += int(rng.integers(0, 2))  # ~half the steps are 0: ties
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=t), u,
                         ["view", "click"][eid % 2],
                         round(float(rng.uniform(1, 500)), 2)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(f"{root}/events.parquet")
    return str(root)


@pytest.fixture(scope="module")
def tiny_dir(spark, tmp_path_factory):
    """Entities with 1/3/7/50 events — the short-series-guard class."""
    root = tmp_path_factory.mktemp("tiny")
    rng = np.random.default_rng(2)
    rows, eid = [], 0
    for u, n in ((1, 1), (2, 3), (3, 7), (4, 50)):
        for _ in range(n):
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=eid), u, "view",
                         round(float(rng.uniform(1, 500)), 2)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(f"{root}/events.parquet")
    return str(root)


@pytest.fixture(scope="module")
def hostile_docs_dir(spark, tmp_path_factory):
    """Documents with tabs, vertical tabs, form feeds, blank docs, NULL
    text, Unicode NBSP (must NOT split under the pinned ASCII-whitespace
    contract), and a 3-doc near-dup COMPONENT (docs 10-12:
    dup_clusters must propagate the min label across the whole component
    and report cluster_size 3, not stop at pairwise output)."""
    root = tmp_path_factory.mktemp("hostile")
    chain = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame({
        "doc_id": range(13),
        "text": ["hello world", "\thello\tworld\n",
                 "the quick\x0bbrown fox", "the quick brown\ffox",
                 "", "\t\n", "a,b, c", "the the the and of is",
                 None, "café latte café latte",
                 chain + " iota", chain + " kappa", chain + " iota kappa"],
        "lang": ["en"] * 13,
    })
    # source/n_chars: the quality/sketch/roundtrip queries group and
    # checksum on these; doc 8 (NULL text) gets NULL n_chars
    docs["source"] = [f"s{i % 3}" for i in range(13)]
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_tie_order_parity(spark, duck, ties_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW events AS SELECT * FROM "
                 f"'{ties_dir}/events.parquet/*.parquet'")
    _compare(spark, duck, [
        "lag_diffs", "variability", "variability_full", "sessionize",
        "session_aggs", "rolling_median3", "trim_endpoints",
        "crossing_count", "zigzag", "qrs_yuxi", "crossing_widths",
        "sample_entropy", "sample_entropy_qrs", "fft_band_power",
        "fft_features", "autocorr",
        # tie-heavy duplicate timestamps: calendar features must be a
        # pure function of ts (row-identical for tied rows), and the
        # winsorize quantile grid hits repeated order statistics
        "time_features", "winsorize_events",
        # ewma's (ts, event_id) lag order and rank peers both hinge on
        # the tie-break contract; the PIT pair's strictly-before /
        # up-to-current frames walk the same tied order
        "ewma_events", "rank_features", "target_encoding_pit",
        "expanding_zscore",
        # FULL OUTER day matching over tied/duplicated timestamps
        "daily_type_rollup_outer", "quantile_buckets",
        # open/close picked by the tied (ts, event_id) rank — tie-break
        # contract is the whole point of min_by/max_by on row_number
        "ohlc_time_bars",
    ], ties_dir)


def test_short_series_guard_parity(spark, duck, tiny_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW events AS SELECT * FROM "
                 f"'{tiny_dir}/events.parquet/*.parquet'")
    _compare(spark, duck, [
        "sample_entropy", "sample_entropy_qrs", "fft_band_power",
        "fft_features", "variability", "rdensity", "rolling_median3",
    ], tiny_dir)


def test_hostile_whitespace_parity(spark, duck, hostile_docs_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{hostile_docs_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, [
        "token_counts", "quality_features", "word_explode", "langid",
        "dedup_exact", "exact_dup_groups", "ngram_jaccard",
        "simhash_fingerprints", "simhash_near_dups", "minhash_lsh",
        "hash_split", "dup_clusters",
        # late-r3 batch 2: quality filters, sketches, roundtrips — the
        # whitespace/NULL/empty classes are exactly where their
        # tokenizer/regex/count-skipping contracts can diverge
        "gopher_quality", "pii_scrub", "dup_ngram_fraction",
        "approx_distinct_docs", "doc_quantiles", "jsonl_roundtrip",
        "orc_roundtrip", "stratified_sample",
        # winnowing: NULL/empty text -> empty fingerprint (checksum 0,
        # NULL density); sub-k and sub-w docs hit the degenerate
        # global-min branch; the near-dup component exercises matching
        "winnow_fingerprints", "winnow_match_pairs",
        # corpus stats under NULL/empty/exotic-whitespace text: N counts
        # every doc (nulls dilute idf), no query term matches -> every
        # bm25 score is exactly 0, tfidf rank ties ("the the the...")
        # break on the integer (tf, df, term) tuple
        "tfidf_top_terms", "bm25_scores",
        # contamination/packing under the same hostile classes: the
        # benchmark split here is just doc 0 ("hello world"), whose one
        # short-doc shingle must catch the tab-padded near-twin doc 1;
        # zero-token and NULL docs must flow through packing as
        # zero-width stream segments
        "benchmark_contamination", "pack_token_stream",
        # repetition/mixing under NULL/blank/exotic-whitespace docs:
        # NBSP must NOT split a line or token, NULL text = 0 lines /
        # 0 tokens, and a source whose docs are all blank contributes
        # sqrt_micro 0 (structure pinned in test_repetition_mixture_*)
        "line_repetition", "top_ngram_stats",
        "pack_efficiency", "source_mixture",
        # cross-doc paragraph dedup: NULL/blank docs listed with zeros;
        # single-line docs are 1-para docs (planted structure lives in
        # test_paragraph_dedup_parity's dedicated fixture)
        "paragraph_dedup",
        # DSIR under NULL/blank raw docs (listed, score exactly 0) and
        # a 1-token target (no bigrams; hand-computed pins live in
        # test_dsir_importance_parity's dedicated fixture)
        "dsir_importance",
        # domain extraction fires on the deterministic augmentation
        # (NULL text stays NULL through concat on both engines);
        # mixture sampling over the 3 near-equal hostile sources
        "domain_mix", "mixture_sample",
        # the composed pipeline: NULL/blank/short docs must die at the
        # Gopher stage identically in both engines before any later
        # stage can see them
        "corpus_curate",
        # C4 line removal: NULL/blank docs fingerprint the empty
        # string; no hostile line spans 3 docs (removal structure is
        # pinned in test_c4_line_dedup_parity's dedicated fixture)
        "c4_line_dedup",
        # overlap chunking under NULL/blank/NBSP docs: zero-token docs
        # emit no chunk, NBSP must not split a token on either engine
        "chunk_overlap_spans",
    ], hostile_docs_dir)
    # parity alone would pass vacuously if LSH never fired on the planted
    # component — pin the structure: docs 10-12 form ONE cluster of 3
    # labeled by the min member id
    comp = contract.QUERY_BUILDERS["dup_clusters"](
        spark, hostile_docs_dir).toPandas()
    c3 = comp[comp["doc_id"].isin([10, 11, 12])]
    assert len(c3) == 3 and set(c3["component"]) == {10}
    assert (c3["cluster_size"] == 3).all()


@pytest.fixture(scope="module")
def nulls_dir(spark, tmp_path_factory):
    """Events with ~12% null values — the null-count-semantics class
    (engine contract: null values are excluded from counts/ratios, like
    both engines' sums)."""
    root = tmp_path_factory.mktemp("nulls")
    rng = np.random.default_rng(4)
    rows, eid = [], 0
    for u in range(1, 7):
        t = 0
        for _ in range(40):
            t += int(rng.integers(1, 5))
            v = (None if rng.random() < 0.12
                 else round(float(rng.uniform(1, 500)), 2))
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=t), u,
                         ["view", "click"][eid % 2], v))
            eid += 1
    # an ALL-null-value entity: count(value)=0 while counting-CASE sums
    # stay non-null 0 — the LONG/LONG 0/0 ANSI-abort class that random
    # 12% nulls never produce (ADVICE r2: variability_full pnn50)
    for _ in range(8):
        rows.append((eid, pd.Timestamp("2024-01-01")
                     + pd.Timedelta(minutes=eid), 9, "view", None))
        eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(f"{root}/events.parquet")
    return str(root)


def test_null_value_parity(spark, duck, nulls_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW events AS SELECT * FROM "
                 f"'{nulls_dir}/events.parquet/*.parquet'")
    _compare(spark, duck, [
        "variability", "variability_full", "qrs_yuxi", "hrv_features",
        "basic_stats", "mad", "autocorr", "cdf_density", "nan_scrub",
        "rolling_median3", "session_aggs", "scale_input", "lag_diffs",
        "ffill", "crossing_count", "zigzag",
        # salted two-phase agg: NULL values must vanish from the cents
        # sum identically in both phases and in the plain-SQL oracle
        "salted_skew_counts",
        # winsorize: NULL values must stay NULL through the guarded
        # clamp (least/greatest silently skip NULLs in both engines)
        "winsorize_events",
        # ewma renormalizes over null holes; rank pins NULLS FIRST
        # (Spark's asc default) against DuckDB's nulls-LAST default;
        # the PIT pair's count(qv) must skip null targets identically
        "ewma_events", "rank_features", "target_encoding_pit",
        "expanding_zscore",
        # outer-join zero-fill with null values in the aggregated column
        "daily_type_rollup_outer",
        # NULL values keep NULL buckets; cut points skip them
        "quantile_buckets",
        # NULL values excluded up front; the all-NULL entity's bars
        # must VANISH (never emit a NULL-open bar)
        "ohlc_time_bars",
    ], nulls_dir)


@pytest.fixture(scope="module")
def const_dir(spark, tmp_path_factory):
    """Exactly-constant and near-constant entities — the zero-variance /
    catastrophic-cancellation class (sqrt of a tiny negative variance,
    zero std z-scores, zero-denominator Poincare terms)."""
    root = tmp_path_factory.mktemp("const")
    rows, eid = [], 0
    for u, vals in ((1, [7.77] * 30), (2, [1.23] * 3),
                    (3, [round(1 + 8 * i / 29, 2) for i in range(30)]),
                    (4, [5.0] * 29 + [5.01]),
                    # genuine variation on a huge offset: raw power-sum
                    # float moments are cancellation garbage here
                    # (m2r ~ 1e12, c2 ~ 18); centered two-pass is exact.
                    # 1e6 stays inside the integer-quantization domain of
                    # the hash-hardened queries (|value| <= ~3e6, see
                    # q_variability docstring) — 1e8 overflows their
                    # int64 power sums under ANSI
                    (5, [1e6 + i * 0.5 for i in range(30)])):
        for v in vals:
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=eid), u, "view", float(v)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(f"{root}/events.parquet")
    return str(root)


@pytest.fixture(scope="module")
def barties_dir(spark, tmp_path_factory):
    """Bar-boundary-tie corpus for the time-bar family (VERDICT r3 #7):
    events landing EXACTLY on 6-hour (21600 s) bar boundaries — the
    ohlc_time_bars alignment class where a double-rounded epoch division
    would misplace a boundary event — plus duplicate-(ts) pairs AT a
    boundary (open/close rank tie-break exactly where bar membership
    changes) and +/-1 s straddles.
    2024-01-01 00:00:00 epoch (1704067200) is divisible by 21600, so
    offset k*21600 s sits ON a bar edge."""
    root = tmp_path_factory.mktemp("barties")
    base = pd.Timestamp("2024-01-01")
    rows, eid = [], 0

    def add(u, sec_off, val):
        nonlocal eid
        rows.append((eid, base + pd.Timedelta(seconds=sec_off), u,
                     ["view", "click"][eid % 2], val))
        eid += 1

    # u1: two events at each exact boundary (tied ts, event_id breaks) —
    # open must be the lower event_id's value, close the higher's
    for k in range(5):
        add(1, k * 21600, 100.25 + k)
        add(1, k * 21600, 200.75 + k)
    # u2: straddles — 1 s before, exactly on, 1 s after three boundaries
    for k in range(1, 4):
        add(2, k * 21600 - 1, 10.5 * k)
        add(2, k * 21600, 20.25 * k)
        add(2, k * 21600 + 1, 30.75 * k)
    # u3: one bar with an interior duplicate-ts TRIPLE (rank must order
    # all three) and min/max away from open/close
    for off, v in ((100, 50.0), (7200, 499.99), (7200, 1.01),
                   (7200, 250.5), (21599, 75.25)):
        add(3, off, v)
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(f"{root}/events.parquet")
    return str(root)


def test_bar_boundary_parity(spark, duck, barties_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW events AS SELECT * FROM "
                 f"'{barties_dir}/events.parquet/*.parquet'")
    _compare(spark, duck, [
        "ohlc_time_bars", "tumbling_time_windows", "sliding_time_windows",
        "sessionize", "session_aggs",
    ], barties_dir)
    # structure pin (parity alone could be 'wrong together'): u1's five
    # boundary bars each hold exactly their 2 tied events, open from the
    # lower event_id, close from the higher
    bars = contract.QUERY_BUILDERS["ohlc_time_bars"](
        spark, barties_dir).toPandas()
    u1 = bars[bars["user_id"] == 1].sort_values("bar_start_s")
    assert len(u1) == 5 and (u1["n_events"] == 2).all()
    assert (u1["open_value"].to_numpy()
            == [100.25 + k for k in range(5)]).all()
    assert (u1["close_value"].to_numpy()
            == [200.75 + k for k in range(5)]).all()
    # u2: the on-boundary event belongs to the NEW bar (floor semantics)
    # bar0: {21599}; bar1: {21600, 21601, 43199}; bar2: {43200, 43201,
    # 64799}; bar3: {64800, 64801}
    u2 = bars[bars["user_id"] == 2].sort_values("bar_start_s")
    assert (u2["n_events"].to_numpy() == [1, 3, 3, 2]).all()
    assert (u2["bar_start_s"].to_numpy()
            == [1704067200 + k * 21600 for k in range(4)]).all()


@pytest.fixture(scope="module")
def fftedge_dir(spark, tmp_path_factory):
    """Engineered FFT rounding-boundary corpus (VERDICT r3 #1): series
    built to maximize rfft-vs-naive-DFT divergence inside the floor-grid
    domain and to sit ON every frequency/index partition boundary.
    - user 1: n=600 with a large DC offset (DC bin ~ (sum x)^2/n ~ 1e7,
      near the testdata ceiling) + pure tones placed EXACTLY at the
      f=0.05/0.1/0.2/0.3/0.4 band edges and at the SNR cut 0.1 (k = edge*n
      integral by construction) — the [lo, hi) half-open contract and the
      f = k*(1/n) ulp-match both bind on every edge.
    - user 2: n=512 power-of-two (radix-2 fastpath) white-ish series —
      hundreds of O(1e0-1e2) bins where round(sum,2)-class contracts are
      most flip-prone.
    - user 3: n=5 minimal non-guard series (one bin per band boundary
      cliff at trunc(1.5*n)=7 > n//2: degenerate empty high bands)."""
    root = tmp_path_factory.mktemp("fftedge")
    rng = np.random.default_rng(7)
    rows, eid = [], 0

    n1 = 600
    t = np.arange(n1)
    x1 = (180.0
          + 40.0 * np.cos(2 * np.pi * 0.05 * t)
          + 30.0 * np.cos(2 * np.pi * 0.10 * t + 0.3)
          + 20.0 * np.cos(2 * np.pi * 0.20 * t + 1.1)
          + 10.0 * np.cos(2 * np.pi * 0.30 * t + 2.2)
          + 5.0 * np.cos(2 * np.pi * 0.40 * t + 0.7)
          + rng.normal(0, 3.0, n1))
    n2 = 512
    x2 = rng.uniform(1, 500, n2)
    x3 = np.array([10.0, 400.0, 30.0, 250.0, 90.0])
    for u, xs in ((1, x1), (2, x2), (3, x3)):
        for v in xs:
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=eid), u, "view", float(v)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(f"{root}/events.parquet")
    return str(root)


def test_fft_boundary_parity(spark, duck, fftedge_dir):
    """The floor-grid contract must hash-match EXACTLY (the _compare
    float path is exact-equality via isclose on identical values; the
    real assertion is the bit-exact band/snr check below) on a corpus
    where the old round(raw_sum, 2) contract measurably diverges between
    rfft and the naive DFT."""
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW events AS SELECT * FROM "
                 f"'{fftedge_dir}/events.parquet/*.parquet'")
    _compare(spark, duck, ["fft_band_power", "fft_features"], fftedge_dir)
    # bit-exactness, not closeness: bands/total/snr must be IDENTICAL
    # float64 (exact integers / exact-int quotients) — the driver hashes
    # bits, and isclose would mask a last-ulp regression
    sdf = contract.QUERY_BUILDERS["fft_features"](
        spark, fftedge_dir).toPandas().sort_values("user_id")
    odf = duck.execute(contract.ORACLES["fft_features"]).df() \
        .sort_values("user_id")
    for c in ("band0", "band1", "band2", "band3", "band4", "band5",
              "total_power", "snr"):
        sa = sdf[c].to_numpy()
        ob = odf[c].to_numpy()
        assert (sa == ob).all(), (c, sa, ob)
    for c in ("band0", "band1", "band2", "band3", "band4", "band5",
              "total_power"):
        assert (sdf[c] == np.floor(sdf[c])).all(), f"{c} not on unit grid"
    # sharpness: the engineered tones must actually land power in the
    # edge bands (a vacuously-zero band certifies nothing)
    bp = contract.QUERY_BUILDERS["fft_band_power"](
        spark, fftedge_dir).toPandas()
    u1 = bp[bp["user_id"] == 1].iloc[0]
    assert all(u1[f"band{i}"] > 1000 for i in range(6)), u1.to_dict()


def test_constant_series_parity(spark, duck, const_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW events AS SELECT * FROM "
                 f"'{const_dir}/events.parquet/*.parquet'")
    _compare(spark, duck, [
        "hrv_features", "basic_stats", "variability", "variability_full",
        "coeff_of_variation", "per_lead_summary", "sample_entropy",
        "sample_entropy_qrs", "qrs_yuxi", "long_stats", "scale_input",
        "mad", "cdf_density",
        # zero-variance is expanding_zscore's guard class (var_num = 0
        # -> NULL, never a divide); constant series also collapse the
        # winsorize quantile grid (lo == hi) and the rank peer groups
        "expanding_zscore", "winsorize_events", "rank_features",
        "ewma_events", "target_encoding_pit",
        # constant series: every cut equals the value -> bucket 0 for all
        "quantile_buckets",
    ], const_dir)


@pytest.fixture(scope="module")
def corpusstats_dir(spark, tmp_path_factory):
    """Documents engineered for the corpus-stats (TF-IDF / BM25) edge
    classes: a query term in MORE than half the corpus (negative BM25
    idf -> floor of a negative contribution), a doc that is one term
    repeated many times (tf saturation), docs with zero query-term
    matches (left-join zero-score arm), exact (tf, df) rank ties
    resolved only by the term string, and a single-token doc (dl=1)."""
    root = tmp_path_factory.mktemp("corpusstats")
    docs = pd.DataFrame({
        "doc_id": range(10),
        "text": [
            # 'data' in 6 of 10 docs -> df=6 > N/2 -> idf < 0
            "data systems need data and more data",
            "data pipelines move data",
            "the data lake",
            "data quality checks guard the data lake",
            "model training uses data",
            "big data",
            # tf saturation: one term repeated
            "model model model model model model model model",
            # zero query-term matches
            "the quick brown fox jumps over the lazy dog",
            # (tf, df) tie: 'alpha' and 'beta' both tf=2 here and df=1
            # corpus-wide -> rank decided by the term string alone
            "alpha beta alpha beta",
            # dl=1
            "training",
        ],
        "lang": ["en"] * 10,
    })
    docs["source"] = [f"s{i % 2}" for i in range(10)]
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_corpus_stats_parity(spark, duck, corpusstats_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{corpusstats_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["tfidf_top_terms", "bm25_scores"],
             corpusstats_dir)
    # _compare's np.isclose (rtol 1e-5) is ~46 micros of slack on a
    # 4.6e6 micro value — far looser than the driver's bitwise hash.
    # The *_micro columns are exact integers BY CONTRACT
    # (operators/corpus.py): assert them bit-equal, like the FFT
    # boundary test does for its floor-grid bands.
    for name, keys in (("tfidf_top_terms", ["doc_id", "rank"]),
                       ("bm25_scores", ["doc_id"])):
        s = (contract.QUERY_BUILDERS[name](spark, corpusstats_dir)
             .toPandas().sort_values(keys).reset_index(drop=True))
        o = (duck.execute(contract.ORACLES[name]).fetchdf()
             .sort_values(keys).reset_index(drop=True))
        for c in [c for c in s.columns if c.endswith("_micro")]:
            assert (s[c].to_numpy() == o[c].to_numpy()).all(), (name, c)
    # parity could be 'wrong together' — pin the structure the fixture
    # plants. BM25: 'data' df=6 of N=10 -> idf = ln(4.5/6.5) < 0, so doc
    # 5 ('big data', nothing else) must score NEGATIVE; doc 7 (no query
    # terms) exactly 0; doc 6 matches only 'model'.
    bm = contract.QUERY_BUILDERS["bm25_scores"](
        spark, corpusstats_dir).toPandas().set_index("doc_id")
    assert bm.loc[5, "bm25_micro"] < 0
    assert bm.loc[7, "bm25_micro"] == 0 and bm.loc[7, "n_terms_matched"] == 0
    assert bm.loc[6, "n_terms_matched"] == 1
    assert bm.loc[9, "dl"] == 1
    # TF-IDF: doc 8's alpha/beta tie on (tf=2, df=1) -> term string
    # breaks it: alpha ranks 1, beta ranks 2; equal integer inputs give
    # BIT-identical micro scores
    tt = contract.QUERY_BUILDERS["tfidf_top_terms"](
        spark, corpusstats_dir).toPandas()
    d8 = tt[tt["doc_id"] == 8].sort_values("rank")
    assert list(d8["term"]) == ["alpha", "beta"]
    assert d8["tfidf_micro"].nunique() == 1


@pytest.fixture(scope="module")
def packing_dir(spark, tmp_path_factory):
    """Documents engineered for the packing/contamination edge classes:
    zero-token doc at a shard HEAD (cum-1 = -1, the floor(-1/512) = -1
    clamp), a doc that fills a 512-token chunk EXACTLY, a zero-token doc
    sitting exactly ON a chunk boundary (interior clamp), straddling
    docs (1024 and 513 tokens), a NULL-text doc mid-stream, an exact
    80%-threshold contamination tie (4 of 5 grams), and a short-doc
    full-join shingle hit (2-token candidate vs 2-token benchmark)."""
    root = tmp_path_factory.mktemp("packing")

    def toks(prefix, k):
        return " ".join(f"{prefix}{i}" for i in range(k))

    rows = [
        # (doc_id, source/shard, text) — ids 0/50/150 are benchmark
        (0, "a", ""),                 # zero-token shard head (benchmark)
        (1, "a", toks("a", 512)),     # fills chunk 0 exactly
        (2, "a", "solo"),             # starts exactly at offset 512
        (3, "a", toks("b", 1024)),    # straddles chunks 1-3
        (4, "a", None),               # NULL mid-stream
        (9, "a", "w1 w2 w3 w4 w5 w6 x"),  # 5 grams, 4 contaminated: tie
        (5, "b", toks("c", 511)),
        (6, "b", "cap"),              # ends exactly at offset 512
        (7, "b", "\t\n"),             # zero tokens ON the 512 boundary
        (8, "b", toks("d", 513)),     # straddles chunks 1-2
        (10, "b", "p q"),             # short-doc shingle hit
        (50, "b", "w1 w2 w3 w4 w5 w6"),   # benchmark: 4 grams
        (150, "b", "p q"),            # benchmark: short-doc shingle
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_pack_contamination_boundary_parity(spark, duck, packing_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{packing_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["benchmark_contamination", "pack_token_stream",
                           "pack_efficiency"], packing_dir)
    # parity could be 'wrong together' — pin the planted structure.
    pk = (contract.QUERY_BUILDERS["pack_token_stream"](spark, packing_dir)
          .toPandas().set_index("doc_id"))

    def chunks(i):
        r = pk.loc[i]
        return (int(r["start_off"]), int(r["chunk_first"]),
                int(r["chunk_last"]), int(r["n_chunks"]))

    assert chunks(0) == (0, 0, 0, 1)       # head clamp: floor(-1/512)
    assert chunks(1) == (0, 0, 0, 1)       # exact fill stays one chunk
    assert chunks(2) == (512, 1, 1, 1)     # starts exactly at boundary
    assert chunks(3) == (513, 1, 3, 3)     # 1024-token straddle
    assert chunks(4) == (1537, 3, 3, 1)    # NULL text = zero-width seg
    assert chunks(6) == (511, 0, 0, 1)     # ends exactly at boundary
    assert chunks(7) == (512, 1, 1, 1)     # interior zero-width clamp
    assert chunks(8) == (512, 1, 2, 2)     # 513-token straddle
    cm = (contract.QUERY_BUILDERS["benchmark_contamination"](
        spark, packing_dir).toPandas().set_index("doc_id"))
    assert 0 not in cm.index and 50 not in cm.index   # benchmark excluded
    r9 = cm.loc[9]
    assert (int(r9["n_grams"]), int(r9["n_contam"])) == (5, 4)
    assert bool(r9["contaminated"])        # 400 >= 400: the integer tie
    r10 = cm.loc[10]
    assert (int(r10["n_grams"]), int(r10["n_contam"])) == (1, 1)
    assert bool(r10["contaminated"])       # full-join shingle path
    r4 = cm.loc[4]
    assert int(r4["n_grams"]) == 0 and pd.isna(r4["contam_frac"])
    assert not bool(r4["contaminated"])    # NULL text: listed, not flagged
    # whitespace-only candidate vs empty benchmark doc: both normalize to
    # the single "" shingle -> 100% contaminated (degenerate but
    # deterministic on both engines; an empty benchmark doc is the
    # caller's bug, not silent corruption here)
    r7 = cm.loc[7]
    assert (int(r7["n_grams"]), int(r7["n_contam"])) == (1, 1)
    assert int(cm.loc[1, "n_contam"]) == 0 and not bool(
        cm.loc[1, "contaminated"])
    # packing-efficiency ledger over the same engineered streams:
    # shard a = docs {0,1,2,3,4,9} -> 0+512+1+1024+0+7 = 1544 tokens,
    # one straddler (doc 3); ceil(1544/512) = 4 chunks, 504 pad
    pe = (contract.QUERY_BUILDERS["pack_efficiency"](spark, packing_dir)
          .toPandas().set_index("shard"))
    ra = pe.loc["a"]
    assert (int(ra["n_docs"]), int(ra["total_tokens"]),
            int(ra["max_doc_tokens"]), int(ra["n_straddlers"])) \
        == (6, 1544, 1024, 1)
    assert (int(ra["n_chunks"]), int(ra["pad_tokens"])) == (4, 504)
    assert ra["fill_frac"] == 1544.0 / 2048.0   # exact: /2^11


@pytest.fixture(scope="module")
def repetition_dir(spark, tmp_path_factory):
    """Documents engineered for the line/n-gram repetition edge classes:
    CRLF and space-padded duplicate-line twins (a raw compare would
    never match them), an overlapping-n-gram doc whose top-gram char
    fraction legitimately exceeds 1.0, an exactly-2-token doc (emits
    the n=2 row only), a 1-token doc (emits NO top-gram row), and a
    source whose docs are all NULL/blank (sqrt_micro 0 in the mixing
    report)."""
    root = tmp_path_factory.mktemp("repetition")
    rows = [
        (0, "z", None),                       # NULL: 0 lines, 0 tokens
        (1, "z", "\t\r\n \x0c"),              # blank: source z sums to 0
        (2, "a", "foo\r\nfoo\n foo \nbar"),   # CRLF/padded twins
        (3, "a", "the the the the"),          # overlap: char_frac > 1
        (4, "a", "x y x y x y"),
        (5, "b", "line one\nline two\n" * 3),
        (6, "b", "a b"),                      # exactly n=2 tokens
        (7, "b", "solo"),                     # no n-gram row at all
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_repetition_mixture_parity(spark, duck, repetition_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{repetition_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["line_repetition", "top_ngram_stats",
                           "source_mixture", "pack_token_stream",
                           "pack_efficiency"], repetition_dir)
    # parity could be 'wrong together' — pin the planted structure.
    lr = (contract.QUERY_BUILDERS["line_repetition"](spark, repetition_dir)
          .toPandas().set_index("doc_id"))
    r2 = lr.loc[2]   # [foo\r, foo, ' foo ', bar] -> [foo x3, bar]
    assert (int(r2["n_lines"]), int(r2["n_uniq_lines"]),
            int(r2["n_dup_lines"])) == (4, 2, 2)
    assert (int(r2["line_chars"]), int(r2["dup_line_chars"])) == (12, 6)
    assert r2["dup_line_frac"] == 0.5 and r2["dup_line_char_frac"] == 0.5
    r5 = lr.loc[5]   # trailing-\n empty segment dropped
    assert (int(r5["n_lines"]), int(r5["n_uniq_lines"]),
            int(r5["line_chars"]), int(r5["dup_line_chars"])) \
        == (6, 2, 48, 32)
    for i in (0, 1):  # NULL and blank: 0 lines, fractions 0.0 not NULL
        assert int(lr.loc[i, "n_lines"]) == 0
        assert lr.loc[i, "dup_line_frac"] == 0.0
    tg = (contract.QUERY_BUILDERS["top_ngram_stats"](spark, repetition_dir)
          .toPandas().set_index(["doc_id", "n"]).sort_index())
    r32 = tg.loc[(3, 2)]  # 'the the' x3 overlapping, denom 15 chars
    assert r32["top_gram"] == "the the"
    assert (int(r32["cnt"]), int(r32["gram_chars"]),
            int(r32["denom_chars"])) == (3, 21, 15)
    assert r32["char_frac"] == 21.0 / 15.0      # > 1.0: documented
    assert tg.loc[(3, 4)]["char_frac"] == 1.0   # whole doc is the gram
    assert tg.loc[(6, 2)]["top_gram"] == "a b"  # k == n edge
    docs_in = set(tg.index.get_level_values("doc_id"))
    assert 7 not in docs_in and 0 not in docs_in and 1 not in docs_in
    assert set(tg.loc[6].index) == {2}          # no n=3/4 row for 2 toks
    mx = (contract.QUERY_BUILDERS["source_mixture"](spark, repetition_dir)
          .toPandas().set_index("source"))
    rz = mx.loc["z"]  # all-blank source: zero mass, weight exactly 0
    assert (int(rz["n_tokens"]), int(rz["sqrt_micro"]),
            int(rz["w_alpha_micro"])) == (0, 0, 0)
    assert rz["prop"] == 0.0
    assert int(mx["w_alpha_micro"].sum()) <= 1_000_000  # floor'd shares
    assert abs(mx["prop"].sum() - 1.0) < 1e-12  # shares of the total


@pytest.fixture(scope="module")
def paragraphs_dir(spark, tmp_path_factory):
    """Documents engineered for cross-doc paragraph dedup — the driver
    corpus has NO multi-paragraph docs (max n_paras = 1 at sf0.01), so
    sf parity alone would certify nothing: a boilerplate paragraph
    shared by 3 docs (one CRLF-separated, one whitespace-padded — both
    must normalize equal), a doc whose paragraph repeats only WITHIN
    itself (must NOT count: the signal is cross-doc), paragraphs with
    internal newlines (kept), and NULL/blank-only docs (listed, zeros).
    """
    root = tmp_path_factory.mktemp("paragraphs")
    rows = [
        (0, "a", None),
        (1, "a", "\n\n \n"),                      # blank-only: 0 paras
        (2, "a", "intro two\n\nCOMMON FOOTER\n\nbody a"),
        (3, "b", "other doc\r\n\r\n  COMMON FOOTER  "),  # CRLF + padded
        (4, "b", "COMMON FOOTER"),
        (5, "b", "self\n\nself"),                 # within-doc only
        (6, "c", "multi\nline\npara\n\nmulti\nline\npara2"),
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_paragraph_dedup_parity(spark, duck, paragraphs_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{paragraphs_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["paragraph_dedup"], paragraphs_dir)
    # parity could be 'wrong together' — pin the planted structure.
    pr = (contract.QUERY_BUILDERS["paragraph_dedup"](spark, paragraphs_dir)
          .toPandas().set_index("doc_id"))

    def row(i):
        r = pr.loc[i]
        return (int(r["n_paras"]), int(r["n_dup_paras"]),
                int(r["para_chars"]), int(r["dup_para_chars"]))

    assert row(2) == (3, 1, 28, 13)   # FOOTER shared with docs 3 and 4
    assert row(3) == (2, 1, 22, 13)   # CRLF split + btrim'd twin matched
    assert row(4) == (1, 1, 13, 13)
    assert pr.loc[4, "dup_para_frac"] == 1.0
    assert row(5) == (2, 0, 8, 0)     # within-doc repeat does NOT count
    assert row(6) == (2, 0, 31, 0)    # internal newlines kept in paras
    for i in (0, 1):                  # NULL/blank: listed with zeros
        assert row(i) == (0, 0, 0, 0)
        assert pr.loc[i, "dup_para_frac"] == 0.0
        assert pr.loc[i, "dup_para_char_frac"] == 0.0


@pytest.fixture(scope="module")
def dsir_dir(spark, tmp_path_factory):
    """Micro-corpus with hand-computable DSIR weights: target (doc_id
    % 50 == 0) is one 3-token doc; raw doc 1 is its exact copy (must
    score POSITIVE — more target-like than the smoothed prior), raw
    doc 2 is vocabulary-disjoint (negative), docs 3/4 NULL/empty
    (listed, score exactly 0). The 8 planted grams land in 8 distinct
    md5 buckets (verified offline), so the expected micro scores are
    exact closed forms the test recomputes."""
    root = tmp_path_factory.mktemp("dsir")
    rows = [
        (0, "t", "apple banana apple"),    # target: T = 2*3-1 = 5
        (1, "r", "apple banana apple"),    # identical -> positive
        (2, "r", "zeta yotta zeta"),       # disjoint -> negative
        (3, "r", None),
        (4, "r", ""),
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_dsir_importance_parity(spark, duck, dsir_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{dsir_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["dsir_importance"], dsir_dir)
    # parity could be 'wrong together' — recompute the expected micro
    # scores from the published formula (T=5 target / Q=10 raw
    # occurrences, B=10000, Laplace-smoothed):
    #   lr(nt, nq) = floor(ln(((nt+1)(Q+B)) / ((nq+1)(T+B))) * 1e6)
    import math

    def lr(nt, nq):
        return math.floor(math.log(((nt + 1) * (10 + 10_000))
                                   / ((nq + 1) * (5 + 10_000))) * 1e6)

    ds = (contract.QUERY_BUILDERS["dsir_importance"](spark, dsir_dir)
          .toPandas().set_index("doc_id"))
    # doc 1 = exact target copy: buckets {apple: nt2/nq2, banana 1/1,
    # 'apple banana' 1/1, 'banana apple' 1/1} -> 2*lr(2,2) + 3*lr(1,1)
    assert int(ds.loc[1, "n_grams"]) == 5
    assert int(ds.loc[1, "dsir_logw_micro"]) == 2 * lr(2, 2) + 3 * lr(1, 1)
    assert int(ds.loc[1, "dsir_logw_micro"]) > 0
    # doc 2 = disjoint: 2*lr(0,2) + 3*lr(0,1) < 0
    assert int(ds.loc[2, "n_grams"]) == 5
    assert int(ds.loc[2, "dsir_logw_micro"]) == 2 * lr(0, 2) + 3 * lr(0, 1)
    assert int(ds.loc[2, "dsir_logw_micro"]) < 0
    assert int(ds.loc[1, "dsir_logw_micro"]) > int(
        ds.loc[2, "dsir_logw_micro"])
    for i in (3, 4):                   # NULL/empty raw: listed, 0
        assert (int(ds.loc[i, "n_grams"]),
                int(ds.loc[i, "dsir_logw_micro"])) == (0, 0)
    assert 0 not in ds.index           # target docs are not scored


@pytest.fixture(scope="module")
def mixture_dir(spark, tmp_path_factory):
    """Sources with a 100:1 token-mass skew — the driver corpus's
    near-equal sources keep ~91% everywhere, certifying little: 'small'
    (8 tokens) must keep 100%, 'big' (800 tokens) ~10% = sqrt(8/800),
    'zero' (NULL + empty docs) must keep NOTHING; membership is
    recomputed from the md5 rule doc-by-doc."""
    root = tmp_path_factory.mktemp("mixture")
    rows = ([(i, "small", "a b c d") for i in range(2)]
            + [(100 + i, "big", " ".join(f"w{j}" for j in range(40)))
               for i in range(20)]
            + [(200, "zero", None), (201, "zero", "")])
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_mixture_sample_parity(spark, duck, mixture_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{mixture_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["mixture_sample", "source_mixture"],
             mixture_dir)
    # parity could be 'wrong together' — recompute the integer rate
    # derivation and the md5 membership rule doc-by-doc.
    import hashlib
    import math

    def ratio(n_tokens):
        return (math.floor(math.sqrt(n_tokens) * 1e6)
                * 1_000_000) // n_tokens

    mx_ratio = ratio(8)                      # smallest source owns max
    keep = {"small": (ratio(8) * 1_000_000) // mx_ratio,
            "big": (ratio(800) * 1_000_000) // mx_ratio,
            "zero": 0}
    assert keep["small"] == 1_000_000        # keeps everything
    assert 90_000 < keep["big"] < 110_000    # ~ sqrt(8/800) = 10%

    def bucket(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return int(h, 16) % 1_000_000

    ms = (contract.QUERY_BUILDERS["mixture_sample"](spark, mixture_dir)
          .toPandas().set_index("doc_id").sort_index())
    expected = {i: "small" for i in range(2)
                if bucket(i) < keep["small"]}
    expected.update({100 + i: "big" for i in range(20)
                     if bucket(100 + i) < keep["big"]})
    assert dict(ms["source"]) == expected    # exact membership
    assert set(ms.index).isdisjoint({200, 201})   # zero source: nothing
    for i, r in ms.iterrows():
        assert int(r["keep_micro"]) == keep[r["source"]]
        assert int(r["sample_bucket"]) == bucket(i)


@pytest.fixture(scope="module")
def c4_dir(spark, tmp_path_factory):
    """Documents engineered for C4 cross-corpus line removal — the
    driver corpus removes NOTHING (no line spans 3 docs), so sf parity
    certifies only the all-kept path: a banner line in 3 docs (one a
    CRLF/space-padded twin — must match after btrim), a line in exactly
    2 docs (BOUNDARY: kept), a within-doc-thrice line (distinct-doc
    rule: kept), and NULL/blank docs (empty-string fingerprint)."""
    root = tmp_path_factory.mktemp("c4")
    rows = [
        (0, "a", "BANNER\nunique zero"),
        (1, "a", "BANNER\nunique one"),
        (2, "a", " BANNER \r\nunique two"),    # padded + CRLF twin
        (3, "b", "twice\nunique three"),       # nd=2: kept
        (4, "b", "twice\nunique four"),
        (5, "b", "self\nself\nself\nunique five"),  # within-doc only
        (6, "c", None),
        (7, "c", "\n \n"),
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_c4_line_dedup_parity(spark, duck, c4_dir):
    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{c4_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["c4_line_dedup"], c4_dir)
    # parity could be 'wrong together' — pin the rewrite byte-for-byte
    # via independently recomputed md5s.
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    c4 = (contract.QUERY_BUILDERS["c4_line_dedup"](spark, c4_dir)
          .toPandas().set_index("doc_id"))

    def row(i):
        r = c4.loc[i]
        return (int(r["n_lines"]), int(r["n_lines_removed"]),
                int(r["kept_chars"]), r["cleaned_fingerprint"])

    # BANNER spans 3 docs (via the btrim'd CRLF twin) -> removed
    assert row(0) == (2, 1, 11, h("unique zero"))
    assert row(2) == (2, 1, 10, h("unique two"))
    # exactly-2-doc line sits UNDER the threshold -> kept
    assert row(3) == (2, 0, 17, h("twice\nunique three"))
    # within-doc-thrice counts ONE distinct doc -> kept, order intact
    assert row(5) == (4, 0, 23, h("self\nself\nself\nunique five"))
    for i in (6, 7):                   # NULL/blank -> empty rewrite
        assert row(i) == (0, 0, 0, h(""))


@pytest.fixture(scope="module")
def skewed_shard_dir(spark, tmp_path_factory):
    """90%-one-shard corpus — the pack_token_stream skew cliff (VERDICT
    r4 #3): without mitigation the 'big' shard's cumsum serializes
    through ONE reducer; with ``sub_shard`` active the stream is cut
    into doc_id ranges and offsets are stitched by addition. Token
    counts are deterministic-seeded and include zero-token docs at
    sub-shard BOUNDARIES (ids 16/32: a sub-stream head whose cum-1
    clamp must come from the STITCHED offset, not a local -1)."""
    root = tmp_path_factory.mktemp("skewed")
    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        shard = "big" if i % 10 else f"side{i % 4}"
        k = 0 if i in (16, 32) else int(rng.integers(0, 60))
        rows.append((i, shard, " ".join(f"w{i}x{j}" for j in range(k))))
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_pack_subshard_skew_parity(spark, duck, skewed_shard_dir):
    """The sub-sharded spelling must be BIT-IDENTICAL to both the
    registered single-stream oracle and the single-stream engine
    spelling (offsets compose by addition — the stitching contract),
    on a corpus where one shard holds 90% of the rows."""
    from pyspark.sql import functions as F

    from ecg_feature_engineering_spark.operators import corpus

    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{skewed_shard_dir}/documents.parquet/*.parquet'")
    d = spark.read.parquet(f"{skewed_shard_dir}/documents.parquet")
    # mitigation active: doc_id ranges of 32 docs per sub-stream
    sub = corpus.pack_token_stream(
        d, ctx=512, shard_col="source",
        sub_shard=F.expr("doc_id div 32"))
    cols = ["doc_id", "shard", "n_tokens", "start_off",
            "chunk_first", "chunk_last", "n_chunks"]
    a = sub.toPandas()[cols].sort_values("doc_id").reset_index(drop=True)
    o = (duck.execute(contract.ORACLES["pack_token_stream"]).df()[cols]
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        a.astype("int64", errors="ignore").drop(columns=["shard"]),
        o.astype("int64", errors="ignore").drop(columns=["shard"]))
    assert list(a["shard"]) == list(o["shard"])
    b = (corpus.pack_token_stream(d, ctx=512, shard_col="source")
         .toPandas()[cols].sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # the skew is real: the big shard holds 90% of rows
    assert (a["shard"] == "big").mean() == 0.9


@pytest.fixture(scope="module")
def curate_order_dir(spark, tmp_path_factory):
    """Corpus engineered so each adjacent stage pair of corpus_curate is
    ORDER-PINNED (VERDICT r4 #7) — a doc survives/dies differently if
    any two stages were swapped:

    - holdout-before-Gopher: benchmark doc 50 FAILS Gopher (symbol
      spam) yet its grams must still decontaminate; doc 150 likewise.
    - Gopher-before-scrub: doc 2 passes mean-word-length ONLY because
      its long URL counts pre-scrub (post-scrub mean 16/6 < 3).
    - scrub-before-dedup: docs 3/4 differ only in their URL; they
      collapse to one fingerprint only AFTER scrubbing (keep id 3).
    - dedup-drops-what-decontam-keeps: doc 4 (uncontaminated) dies at
      stage 4 only; docs 1 and 5 (contaminated) die at stage 5 only.
    - rates-on-SURVIVOR-mass: shard sB contains one huge contaminated
      doc (id 5, 32k tokens, 100% benchmark-covered) that dies at
      stage 5; sB's stage-6 keep rate must be computed WITHOUT it
      (raw-mass rates would drop sB survivors that survivor-mass
      rates keep — asserted via the exact integer mirror below)."""
    root = tmp_path_factory.mktemp("curate_order")
    cycle = "the alpha beta gamma delta epsilon zeta of"
    rows = [
        # benchmark (id % 50 == 0), both Gopher-FAILING
        (50, "sA", cycle + " " + "# " * 10),
        (150, "sA", "zeta of the alpha beta of " + "# " * 10),
        # sA candidates
        (1, "sA", cycle),                               # contaminated
        (2, "sA", "the of http://example-host.com/aaaa aa bb cc"),
        (3, "sA", "the fox of http://url-one.example.com runs far"),
        (4, "sA", "the fox of http://url-two.example.com runs far"),
        # sB: huge contaminated doc + small survivors
        (5, "sB", (cycle + " ") * 4000),
    ]
    for j in range(10):                 # sB survivors: 30 tokens each
        i = 6 + j
        rows.append((i, "sB", "the of " + " ".join(
            f"bword{i}x{k}" for k in range(28))))
    for j in range(5):                  # sC survivors: 100 tokens each
        i = 30 + j
        rows.append((i, "sC", "the of " + " ".join(
            f"cword{i}x{k}" for k in range(98))))
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["lang"] = "en"
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{root}/documents.parquet")
    return str(root)


def test_corpus_curate_stage_order_parity(spark, duck, curate_order_dir):
    import hashlib
    import math

    contract.ensure_workers_can_import(spark)
    duck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                 f"'{curate_order_dir}/documents.parquet/*.parquet'")
    _compare(spark, duck, ["corpus_curate"], curate_order_dir)

    out = (contract.QUERY_BUILDERS["corpus_curate"](
        spark, curate_order_dir).toPandas().set_index("doc_id"))
    got = set(out.index)

    # ---- exact integer mirror of stages 1-6 (documented semantics) --
    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) % 1_000_000

    def keep_micro(masses):
        sq = {s: math.floor(math.sqrt(float(n)) * 1e6)
              for s, n in masses.items()}
        ratio = {s: (sq[s] * 1_000_000) // n if n > 0 else 0
                 for s, n in masses.items()}
        mx = max(ratio.values())
        return {s: (ratio[s] * 1_000_000) // mx if mx else 0
                for s in masses}

    # survivors of stages 1-5 and their scrubbed token counts
    surv = {2: ("sA", 6), 3: ("sA", 6)}
    surv.update({6 + j: ("sB", 30) for j in range(10)})
    surv.update({30 + j: ("sC", 100) for j in range(5)})
    surv_mass = {"sA": 12, "sB": 300, "sC": 500}
    keep = keep_micro(surv_mass)
    expected = {i for i, (s, _) in surv.items() if bucket(i) < keep[s]}
    assert got == expected

    # stage-order pins (each would flip if two stages were swapped)
    assert {1, 4, 5, 50, 150}.isdisjoint(got)
    assert 2 in expected and 3 in expected      # sA keeps 100% (smallest)
    assert 2 in got and 3 in got
    # fixture validity: RAW-mass rates (the wrong semantics) must
    # actually discriminate — at least one sB survivor flips
    raw_mass = {"sA": 26, "sB": 300 + 32000, "sC": 500}
    wrong = {i for i, (s, _) in surv.items()
             if bucket(i) < keep_micro(raw_mass)[s]}
    assert wrong != expected
    flipped = expected - wrong
    assert any(surv[i][0] == "sB" for i in flipped), flipped
