"""Late-r3 batch-2 operators vs independent pure-Python oracles:
Gopher quality filter, PII scrub, duplicate-n-gram fraction, sketches
with exactness certificates, JSONL/ORC roundtrips, salted aggregation.

The corpus is deliberately hostile: exotic whitespace, empty/NULL text,
planted PII, planted repetition — the classes the driver's testdata
never exercises (see tests/test_adversarial_parity.py for the
engine-vs-DuckDB replays of the same queries)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ecg_feature_engineering_spark.operators import sketches, skew, text

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

DOCS = [
    (0, "the cat and the dog sat on a mat for fun", "en", "s0"),
    (1, "spark spark spark spark spark spark", "en", "s0"),  # repetitive
    (2, "", "en", "s0"),
    (3, None, "en", "s0"),
    (4, "\tthe\x0bquick\fbrown\nfox is of it\r", "en", "s1"),
    (5, "### ### ...... #", "en", "s1"),  # symbol-heavy
    (6, "mail me at a.b+c@ex-ample.org now", "en", "s1"),
    (7, "see https://ex.org/a_b%2c and http://e.co/x", "en", "s1"),
    (8, "a b c a b c a b c d e f", "en", "s2"),  # dup 3-grams
    (9, "12 34 56 78 90 11 22 33", "en", "s2"),  # no alpha words
    (10, "the and of to a in is it for on words here", "en", "s2"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, t, lang, src, len(t) if t is not None else None)
            for i, t, lang, src in DOCS]
    return spark.createDataFrame(rows, DOC_SCHEMA).cache()


def _words(t):
    return [w for w in re.split(r"[ \t\n\x0B\f\r]+", t) if w] if t else []


def test_gopher_quality_matches_python(docs_df):
    got = text.gopher_quality(docs_df).toPandas().set_index("doc_id")
    for i, t, _, _ in DOCS:
        ws = _words(t)
        n = len(ws)
        row = got.loc[i]
        if t is None:
            assert pd.isna(row["n_words_g"])
        else:
            assert row["n_words_g"] == n
        mwl = sum(map(len, ws)) / n if n else 0.0
        sym = len(re.findall(r"#|\.\.\.", t)) / n if n else 0.0
        alpha = (sum(bool(re.search("[A-Za-z]", w)) for w in ws) / n
                 if n else 0.0)
        nstop = len({w.lower() for w in ws} & set(text.STOPWORDS_EN))
        passes = (3 <= n <= 100_000 and 3.0 <= mwl <= 10.0 and sym <= 0.1
                  and alpha >= 0.8 and nstop >= 2)
        assert np.isclose(row["mean_word_len_g"], mwl)
        assert np.isclose(row["symbol_word_ratio"], sym)
        assert np.isclose(row["alpha_word_frac"], alpha)
        assert row["n_stop_distinct"] == nstop
        assert bool(row["passes_gopher"]) == passes, (i, t)
    # the corpus must exercise BOTH flag outcomes
    assert got["passes_gopher"].any() and not got["passes_gopher"].all()


def test_pii_scrub_counts_and_redaction(docs_df):
    got = text.pii_scrub(docs_df).toPandas().set_index("doc_id")
    em, ur = re.compile(text.EMAIL_PATTERN), re.compile(text.URL_PATTERN)
    import hashlib

    for i, t, _, _ in DOCS:
        row = got.loc[i]
        if t is None:
            assert pd.isna(row["scrubbed_fingerprint"])
            continue
        assert row["n_emails"] == len(em.findall(t)), (i, t)
        assert row["n_urls"] == len(ur.findall(t)), (i, t)
        scrubbed = em.sub("<PII>", ur.sub("<PII>", t))
        assert row["scrubbed_fingerprint"] == hashlib.md5(
            scrubbed.encode()).hexdigest()
    assert got.loc[6, "n_emails"] == 1 and got.loc[7, "n_urls"] == 2


def test_dup_ngram_fraction_matches_python(docs_df):
    got = text.dup_ngram_stats(docs_df).toPandas().set_index("doc_id")
    assert len(got) == len(DOCS)  # short/NULL docs survive the join back
    for i, t, _, _ in DOCS:
        ws = _words(t.lower() if t else t)
        grams = [" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)]
        from collections import Counter

        cnt = Counter(grams)
        tot = sum(c * len(g) for g, c in cnt.items())
        dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
        row = got.loc[i]
        assert row["n_grams"] == len(grams)
        assert np.isclose(row["dup_ngram_char_frac"],
                          dup / tot if tot else 0.0), (i, t)
    # planted repetition must rank above natural text
    assert got.loc[1, "dup_ngram_char_frac"] == 1.0
    assert got.loc[8, "dup_ngram_char_frac"] > 0.5
    assert got.loc[0, "dup_ngram_char_frac"] == 0.0


def test_distinct_certificate(docs_df):
    out = sketches.distinct_with_certificate(
        docs_df, "source", "text").toPandas().set_index("source")
    # exact arm: NULL text excluded, '' still counts, duplicates collapse
    expect = {"s0": 3, "s1": 4, "s2": 3}
    for src, n in expect.items():
        assert out.loc[src, "n_exact"] == n
    assert out["within_rel_err"].all()


def test_quantiles_exact_type7(docs_df):
    out = sketches.quantiles_exact(
        docs_df, "source", "n_chars").toPandas().set_index("source")
    for src in ("s0", "s1", "s2"):
        vals = [len(t) for _, t, _, s in DOCS if s == src and t is not None]
        want = np.quantile(np.array(vals, dtype=float), [0.25, 0.5, 0.75])
        assert np.allclose(
            out.loc[src, ["p25", "p50", "p75"]].astype(float), want), src
    assert out["approx_p50_is_element"].all()
    # count(col) skips the NULL n_chars row in s0
    assert {s: int(out.loc[s, "n"]) for s in ("s0", "s1", "s2")} \
        == {"s0": 3, "s1": 4, "s2": 3}


def test_quantiles_rejects_non_binary_prob(docs_df):
    with pytest.raises(ValueError):
        sketches.quantiles_exact(docs_df, "source", "n_chars",
                                 probs=(0.1,))


def test_jsonl_roundtrip_exact(spark, docs_df, tmp_path):
    from ecg_feature_engineering_spark.sources import io as eio

    p = str(tmp_path / "docs_jsonl")
    eio.write_jsonl(docs_df, p)
    back = eio.read_jsonl(spark, p, docs_df.schema)
    a = docs_df.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_orc_roundtrip_exact(spark, docs_df, tmp_path):
    from ecg_feature_engineering_spark.sources import io as eio

    p = str(tmp_path / "docs_orc")
    eio.write_orc(docs_df, p)
    back = eio.read_orc(spark, p)
    a = docs_df.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_salted_count_matches_plain(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = skew.salted_count(ev, ["event_type"], unique_col="event_id") \
        .toPandas().set_index("event_type")["n"]
    want = ev.groupBy("event_type").count().toPandas() \
        .set_index("event_type")["count"]
    assert got.sort_index().equals(want.sort_index())


def test_time_features_known_timestamps(spark):
    from ecg_feature_engineering_spark.operators import windows as W

    from datetime import datetime

    rows = [
        (1, datetime(1970, 1, 1, 0, 0, 0)),     # Thu, day 0
        (2, datetime(2024, 6, 15, 13, 37, 42)),  # Saturday
        (3, datetime(2024, 6, 17, 0, 0, 0)),     # Monday midnight
        (4, datetime(1999, 12, 31, 23, 59, 59)),  # Friday
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = W.time_features(df, "ts").toPandas().set_index("event_id")
    assert got.loc[1, ["epoch_day", "hour_of_day", "dow_iso"]].tolist() \
        == [0, 0, 4]
    assert got.loc[1, ["year", "month", "day_of_month"]].tolist() \
        == [1970, 1, 1]
    assert got.loc[2, ["year", "month", "day_of_month"]].tolist() \
        == [2024, 6, 15]
    assert got.loc[4, ["year", "month", "day_of_month"]].tolist() \
        == [1999, 12, 31]
    assert got.loc[2, ["hour_of_day", "minute_of_hour", "dow_iso"]] \
        .tolist() == [13, 37, 6]
    assert bool(got.loc[2, "is_weekend"]) is True
    assert got.loc[3, ["hour_of_day", "dow_iso"]].tolist() == [0, 1]
    assert bool(got.loc[3, "is_weekend"]) is False
    assert got.loc[4, ["hour_of_day", "minute_of_hour", "dow_iso"]] \
        .tolist() == [23, 59, 5]


def test_winsorize_matches_numpy(spark, sf_dir, events_pdf):
    from ecg_feature_engineering_spark.operators import stats as S

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value")
    got = S.winsorize(ev, "value", by="user_id").toPandas() \
        .set_index("event_id")
    for uid, grp in events_pdf.groupby("user_id"):
        cents = np.round(grp["value"].to_numpy() * 100)
        lo, hi = np.quantile(cents, [0.125, 0.875])
        for eid, v in zip(grp["event_id"], cents):
            w = got.loc[eid, "value_winsorized"]
            assert np.isclose(w, np.clip(v, lo, hi) / 100.0), (uid, eid)
    # clipping must actually fire somewhere
    assert (got["value_winsorized"] * 100
            != got["value_q"]).sum() > 0


def test_winsorize_rejects_non_binary_prob(spark, sf_dir):
    from ecg_feature_engineering_spark.operators import stats as S

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        S.winsorize(ev, "value", by="user_id", lo_p=0.05)


def test_ewma_matches_python_loop(spark, sf_dir, events_pdf):
    from ecg_feature_engineering_spark.operators import windows as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "value")
    got = W.ewma(ev, "value", by="user_id", order=("ts", "event_id"),
                 alpha=0.5, window=8).toPandas().set_index("event_id")
    wts = [0.5 * 0.5 ** j for j in range(8)]
    for _, grp in events_pdf.groupby("user_id"):
        vals = grp["value"].tolist()
        for t, eid in enumerate(grp["event_id"]):
            num = den = 0.0
            for j, w in enumerate(wts):
                if t - j >= 0 and vals[t - j] is not None \
                        and not pd.isna(vals[t - j]):
                    num += vals[t - j] * w
                    den += w
            want = num / den if den > 0 else None
            if want is None:
                assert pd.isna(got.loc[eid, "ewma"])
            else:
                assert np.isclose(got.loc[eid, "ewma"], want), eid


def test_ewma_rejects_bad_alpha(spark, sf_dir):
    from ecg_feature_engineering_spark.operators import windows as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        W.ewma(ev, "value", alpha=0.3)
    with pytest.raises(ValueError):
        W.ewma(ev, "value", alpha=0.0)


def test_rank_transform_matches_pandas(spark, sf_dir, events_pdf):
    from ecg_feature_engineering_spark.operators import windows as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value")
    got = W.rank_transform(ev, "value", by="user_id") \
        .toPandas().set_index("event_id")
    for _, grp in events_pdf.groupby("user_id"):
        n = len(grp)
        # cume_dist = (# peers <=)/n; percent_rank = (rank-1)/(n-1)
        cume = grp["value"].rank(method="max") / n
        prank = (grp["value"].rank(method="min") - 1) / max(n - 1, 1)
        for eid, c, p in zip(grp["event_id"], cume, prank):
            assert np.isclose(got.loc[eid, "value_cume"], c), eid
            assert np.isclose(got.loc[eid, "value_pct_rank"], p), eid


def test_embedding_centroids_match_numpy(spark, sf_dir):
    from ecg_feature_engineering_spark import contract

    got = contract.QUERY_BUILDERS["embedding_centroids"](
        spark, sf_dir).toPandas().set_index(["label", "dim"])
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    for lbl, grp in pdf.groupby("label"):
        M = np.stack([np.asarray(e, dtype=np.float32)
                      for e in grp["embedding"]]).astype(np.float64)
        q = np.floor(M * 1e6).astype(np.int64).sum(axis=0)
        for d in range(M.shape[1]):
            row = got.loc[(lbl, d)]
            assert row["qsum"] == q[d], (lbl, d)
            assert row["n"] == len(M)
            assert np.isclose(row["centroid"], q[d] / (len(M) * 1e6))


def test_target_encoding_pit_matches_loop_and_never_leaks(
        spark, sf_dir, events_pdf):
    from ecg_feature_engineering_spark.operators import windows as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value")
    got = W.target_encode_pit(ev, "event_type", "value") \
        .toPandas().set_index("event_id")["target_enc"]
    pdf = events_pdf.sort_values(["event_type", "ts", "event_id"])
    for _, grp in pdf.groupby("event_type"):
        run_sum = 0
        run_n = 0
        for eid, v in zip(grp["event_id"], grp["value"]):
            if run_n == 0:
                assert pd.isna(got.loc[eid]), eid  # cold start is NULL
            else:
                want = run_sum / (run_n * 100.0)
                assert np.isclose(got.loc[eid], want), eid
            if not pd.isna(v):
                run_sum += round(v * 100)
                run_n += 1
    # structural leakage check: perturbing a row's OWN target must not
    # change its encoding (the frame ends strictly before the row)
    first = ev.orderBy("ts", "event_id").limit(1).collect()[0]
    from pyspark.sql import functions as SF
    poisoned = ev.withColumn(
        "value", SF.when(SF.col("event_id") == first.event_id,
                         SF.lit(9.9e5)).otherwise(SF.col("value")))
    enc0 = W.target_encode_pit(ev, "event_type", "value") \
        .where(SF.col("event_id") == first.event_id) \
        .collect()[0]["target_enc"]
    enc1 = W.target_encode_pit(poisoned, "event_type", "value") \
        .where(SF.col("event_id") == first.event_id) \
        .collect()[0]["target_enc"]
    assert (enc0 is None and enc1 is None) or enc0 == enc1


def test_expanding_zscore_matches_loop(spark, sf_dir, events_pdf):
    from ecg_feature_engineering_spark.operators import windows as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "value")
    got = W.expanding_zscore(ev, "value", by="user_id") \
        .toPandas().set_index("event_id")["zscore_pit"]
    for _, grp in events_pdf.groupby("user_id"):
        hist = []
        for eid, v in zip(grp["event_id"], grp["value"]):
            if not pd.isna(v):
                hist.append(round(v * 100))
            a = np.array(hist, dtype=np.float64)
            if pd.isna(v) or len(a) < 2 or a.std() == 0:
                assert pd.isna(got.loc[eid]), eid
            else:
                want = (round(v * 100) - a.mean()) / a.std()
                assert np.isclose(got.loc[eid], want), eid


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from ecg_feature_engineering_spark.operators import splits as SP

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept1 = SP.stratified_sample(d, "doc_id", "lang", {"en": 0.5},
                                 default_rate=0.2).toPandas()
    kept2 = SP.stratified_sample(d, "doc_id", "lang", {"en": 0.5},
                                 default_rate=0.2).toPandas()
    # deterministic: identical draw on rerun (resume contract)
    assert sorted(kept1["doc_id"]) == sorted(kept2["doc_id"])
    full = d.toPandas()
    for lang, grp in full.groupby("lang"):
        rate = 0.5 if lang == "en" else 0.2
        got = (kept1["lang"] == lang).sum() / len(grp)
        assert abs(got - rate) < 0.15, (lang, got)
    # portable (md5) and production (xxhash64) modes draw ~the same rate
    pk = SP.stratified_sample(d, "doc_id", "lang", {"en": 0.5},
                              default_rate=0.2, portable=True).count()
    assert abs(pk - len(kept1)) / len(full) < 0.1


def test_quantile_discretize_matches_numpy(spark, sf_dir, events_pdf):
    from ecg_feature_engineering_spark.operators import stats as S

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value")
    got = S.quantile_discretize(ev, "value", by="user_id") \
        .toPandas().set_index("event_id")["value_qbucket"]
    for _, grp in events_pdf.groupby("user_id"):
        cents = np.round(grp["value"].to_numpy() * 100)
        cuts = np.quantile(cents, [0.25, 0.5, 0.75])
        for eid, v in zip(grp["event_id"], cents):
            assert got.loc[eid] == int((v > cuts).sum()), eid
    # all four buckets must be populated somewhere
    assert set(got.unique()) == {0, 1, 2, 3}


# ---------------------------------------------------------------- winnowing
def _winnow_ref(t: str | None, k: int = 5, w: int = 4):
    """Independent Python oracle for value-set winnowing (SIGMOD'03)."""
    import hashlib

    if t is None:
        return 0, set()
    norm = re.sub(r"[ \t\n\x0B\f\r]+", " ", t.lower()).strip()
    grams = ([norm[i:i + k] for i in range(len(norm) - k + 1)]
             if len(norm) >= k else [])
    h = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if len(h) >= w:
        sel = {min(h[j:j + w]) for j in range(len(h) - w + 1)}
    elif h:
        sel = {min(h)}
    else:
        sel = set()
    return len(h), sel


def test_winnow_fingerprints_match_python_oracle(docs_df):
    out = {r["doc_id"]: r for r in
           text.winnow_fingerprints(docs_df).select(
               "doc_id", "n_kgrams", "n_selected", "winnow_checksum",
               "winnow_density").collect()}
    for doc_id, t, _, _ in DOCS:
        m, sel = _winnow_ref(t)
        r = out[doc_id]
        assert r["n_kgrams"] == m, doc_id
        assert r["n_selected"] == len(sel), doc_id
        assert r["winnow_checksum"] == sum(x % 1_000_000_007
                                           for x in sel), doc_id
        if m > 0:
            assert r["winnow_density"] == len(sel) / m
        else:
            assert r["winnow_density"] is None


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= k+w-1 must yield a common
    selected hash (the SIGMOD'03 winnowing guarantee), position-robustly."""
    core = "zebra quantum fjord sphinx jackdaws love my big quartz"
    rows = [(0, "PREFIX AAA " + core + " other tail words", "en", "s", 1),
            (1, core + " totally different continuation here", "en", "s", 1),
            (2, "no overlap with anything else at all qqq", "en", "s", 1)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    pairs = text.winnow_match_pairs(df, min_shared=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found
    assert all(2 not in p for p in found)
    # selected sets genuinely intersect at the match-query k
    _, s0 = _winnow_ref(rows[0][1], k=12)
    _, s1 = _winnow_ref(rows[1][1], k=12)
    assert len(s0 & s1) >= 3


def test_winnow_density_bounds(docs_df):
    """n_selected in [1, m-w+1] for m >= w (winnowing guarantees one
    selection per window, dedup can only shrink)."""
    for r in text.winnow_fingerprints(docs_df).collect():
        m, ns = r["n_kgrams"], r["n_selected"]
        if m >= 4:
            assert 1 <= ns <= m - 3, r
        elif m > 0:
            assert ns == 1
        else:
            assert ns == 0
