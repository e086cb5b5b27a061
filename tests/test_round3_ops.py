"""Round-3 additions: SampEn path auto-gating, the seeded digest corpus,
and the planted-copy ANN invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ecg_feature_engineering_spark import contract
from ecg_feature_engineering_spark.datagen import events as ev_gen
from ecg_feature_engineering_spark.operators import stats


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sample_entropy_auto_gate_kernel_path(spark):
    """Above the crossover the auto path must engage the tiled Arrow
    kernel (FlatMapGroupsInPandas), not the n^2/2-row self-join
    (VERDICT r2 #8)."""
    contract.ensure_workers_can_import(spark)
    n = 5000
    pdf = pd.DataFrame({
        "entity_id": ["big"] * n,
        "ts": np.arange(n),
        "value": np.round(np.sin(np.arange(n) * 0.37) * 10, 2),
    })
    d = spark.createDataFrame(pdf)
    out = stats.sample_entropy_auto(d, "value", "entity_id", "ts",
                                    m_max=2)
    assert "FlatMapGroupsInPandas" in _plan(out)
    row = out.collect()[0]
    assert np.isfinite(row["sampen1"]) and np.isfinite(row["sampen2"])


def test_sample_entropy_auto_gate_relational_path(spark):
    """Below the crossover the auto path stays the pure-JVM self-join
    (3-4x faster at testdata entity sizes) — no Python in the plan."""
    contract.ensure_workers_can_import(spark)
    pdf = pd.DataFrame({
        "entity_id": ["a"] * 80 + ["b"] * 60,
        "ts": list(range(80)) + list(range(60)),
        "value": np.round(np.cos(np.arange(140) * 0.51) * 5, 2),
    })
    d = spark.createDataFrame(pdf)
    out = stats.sample_entropy_auto(d, "value", "entity_id", "ts",
                                    m_max=2)
    p = _plan(out)
    assert "FlatMapGroupsInPandas" not in p
    assert "Join" in p
    # and it agrees with the kernel on the same corpus
    from ecg_feature_engineering_spark.functions import kernels
    rel = out.toPandas().set_index("entity_id").sort_index()
    ker = (kernels.sample_entropy_agg(d, "value", "entity_id", "ts", 2)
           .toPandas().set_index("entity_id").sort_index())
    np.testing.assert_allclose(rel[["sampen1", "sampen2"]],
                               ker[["sampen1", "sampen2"]], atol=2e-6)


def test_events_datagen_deterministic(spark):
    """The seeded digest corpus is a pure function of the row id — two
    builds are row-identical and schema-compatible with the driver's
    events table (pinned digest oracles depend on this)."""
    a = ev_gen.events_df(spark).toPandas().sort_values("event_id")
    b = ev_gen.events_df(spark).toPandas().sort_values("event_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert list(a.columns) == ["event_id", "ts", "user_id", "event_type",
                               "value"]
    assert a["user_id"].nunique() == 50
    assert len(a) == 4000
    # strict per-user timestamp order (windows assume it)
    for _, g in a.groupby("user_id"):
        ts = g.sort_values("event_id")["ts"].to_numpy()
        assert (np.diff(ts.astype("datetime64[s]").astype(np.int64))
                > 0).all()
    # 2-decimal value contract, range like the testdata
    assert ((a["value"] * 100).round() - a["value"] * 100).abs().max() < 1e-9
    assert a["value"].between(-50, 50).all()


def test_planted_copy_lands_in_same_buckets(spark):
    """The scaled copy underpinning the ANN digests must share every
    sign-LSH bucket with its source vector (the digest's core premise)."""
    from ecg_feature_engineering_spark.operators import similarity
    from pyspark.sql import functions as F

    contract.ensure_workers_can_import(spark)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8)
    corpus = contract._with_planted_copies(emb, q)
    b = similarity.with_lsh_buckets_multi(corpus, dim=64, n_planes=8,
                                          tables=4)
    flat = b.select("vec_id", F.col("__tb.t").alias("t"),
                    F.col("__tb.b").alias("bkt"))
    orig = flat.where(F.col("vec_id") < 8)
    copy = (flat.where(F.col("vec_id") >= 1_000_000)
            .select((F.col("vec_id") - 1_000_000).alias("vec_id"),
                    "t", F.col("bkt").alias("bkt_copy")))
    j = orig.join(copy, ["vec_id", "t"])
    assert j.count() == 8 * 4
    assert j.where(F.col("bkt") != F.col("bkt_copy")).count() == 0


def test_simhash_kernel_null_text_matches_relational(spark):
    """Null text must fingerprint to 0 in BOTH twins — the kernel used to
    tokenize str(None) as the word 'none' (ADVICE r2)."""
    import pandas as pd
    from ecg_feature_engineering_spark.operators import dedup

    contract.ensure_workers_can_import(spark)
    d = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [None, "none", "hello world"],
    }))
    rel = (dedup.simhash64_relational(d).toPandas()
           .set_index("doc_id")["simhash"].sort_index())
    ker = (dedup.simhash64(d).toPandas()
           .set_index("doc_id")["simhash"].sort_index())
    assert (rel == ker).all()
    assert rel.loc[1] == 0
    assert rel.loc[2] != 0  # the literal word 'none' must NOT collide


def test_checkpoint_lineage_mode_local(spark, tmp_path):
    """Local roots record file-level lineage; the manifest carries the
    lineage_mode marker so a remote-root metadata-only manifest (where
    os.walk sees nothing) is distinguishable from a genuinely empty
    stage (ADVICE r2)."""
    from ecg_feature_engineering_spark.checkpoint import StageCheckpointer

    cp = StageCheckpointer(spark, str(tmp_path))
    meta = cp.write("s1", spark.range(100).toDF("id"))
    assert meta["lineage_mode"] == "files"
    assert meta["n_partitions"] == len(meta["partitions"]) > 0
    assert all(p["bytes"] > 0 for p in meta["partitions"])


def test_certification_window_composition():
    """The driver certifies exactly the first 50 queries() entries
    (VERDICT r2): the window must contain only oracle-backed queries and
    QUERY_ORDER must stay in bijection with the registry."""
    q = contract.ordered_queries()
    o = contract.ordered_oracles()
    names = list(q)
    assert len(names) == len(set(names)) == len(contract.QUERY_BUILDERS)
    window = names[:50]
    missing_oracle = [n for n in window if n not in o]
    assert not missing_oracle, missing_oracle
    # every query past slot 50 is oracle-backed too — after the r4
    # rotation NOTHING registered is oracle-less
    assert all(n in o for n in names[50:])
    # the r5 window must lead with the 16 r4 corpus-module queries — the
    # only never-driver-run queries left (VERDICT r4 next-round #1)
    corpus_r4 = [
        "tfidf_top_terms", "bm25_scores", "benchmark_contamination",
        "pack_token_stream", "line_repetition", "top_ngram_stats",
        "pack_efficiency", "source_mixture", "paragraph_dedup",
        "dsir_importance", "domain_mix", "mixture_sample", "corpus_curate",
        "c4_line_dedup", "semdedup", "chunk_overlap_spans",
    ]
    assert window[:16] == corpus_r4
    # the r5 window is FROZEN — position-pinned so registry edits cannot
    # silently displace what the driver will certify (COVERAGE.md ledger)
    assert window == corpus_r4 + [
        "tpch_pricing_summary", "asof_backward", "anchor_window_aggs",
        "hrv_features", "basic_stats", "sliding_segments", "langid",
        "quality_features", "dedup_exact", "minhash_lsh",
        "simhash_near_dups", "cosine_topk", "lsh_topk",
        "image_decode_stats", "image_psnr_roundtrip", "flagship",
        "wavelet_stats", "hash_split", "auc_scores",
        "fft_features", "audio_decode_stats", "video_stats",
        "time_features", "ohlc_time_bars", "winnow_match_pairs",
        "decode_quarantine", "gopher_quality", "pii_scrub",
        "salted_skew_counts", "target_encoding_pit", "sample_entropy",
        "sessionize", "dup_ngram_fraction", "embedding_centroids",
    ]


def test_entry_smoke(spark):
    """The driver's entry() contract: runs at sf0.001 and returns a
    non-empty DataFrame with a stable schema."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 5


def test_checkpoint_uri_root_roundtrip(spark, tmp_path):
    """Checkpoint metadata goes through the Hadoop FileSystem API, so a
    scheme-qualified root (here file://) must behave exactly like a plain
    local path — manifest commit, resume skip, lineage, metrics. (The os-
    I/O implementation wrote manifests into a literal local './hdfs:/...'
    directory for remote roots.)"""
    from ecg_feature_engineering_spark.checkpoint import StageCheckpointer

    root = f"file://{tmp_path}/ckpt"
    cp = StageCheckpointer(spark, root, params={"x": 1})
    calls = []

    def build():
        calls.append(1)
        return spark.range(50).toDF("id")

    a = cp.run("s1", build)
    assert a.count() == 50 and calls == [1]
    b = cp.run("s1", build)  # resume: must NOT recompute
    assert b.count() == 50 and calls == [1]
    ms = cp.metrics()
    assert len(ms) == 1 and ms[0]["rows"] == 50
    assert ms[0]["n_partitions"] > 0
    # different params invalidate the stage
    cp2 = StageCheckpointer(spark, root, params={"x": 2})
    cp2.run("s1", build)
    assert calls == [1, 1]


def test_sample_entropy_auto_composite_key_kernel_path(spark):
    """Composite-key grouping must survive the kernel path too (the agg
    previously accepted only a scalar `by`, so the auto-gate worked small
    and crashed exactly when it mattered)."""
    contract.ensure_workers_can_import(spark)
    n = 2500
    pdf = pd.DataFrame({
        "rec": ["r1"] * n + ["r1"] * 40,
        "lead": ["I"] * n + ["II"] * 40,
        "ts": list(range(n)) + list(range(40)),
        "value": np.round(np.sin(np.arange(n + 40) * 0.29) * 8, 2),
    })
    d = spark.createDataFrame(pdf)
    out = stats.sample_entropy_auto(
        d, "value", ["rec", "lead"], "ts", m_max=2,
        max_relational=1000)
    assert "FlatMapGroupsInPandas" in _plan(out)
    rows = {(r["rec"], r["lead"]): r for r in out.collect()}
    assert set(rows) == {("r1", "I"), ("r1", "II")}
    assert np.isfinite(rows[("r1", "I")]["sampen1"])


def test_flagship_digest_session_tz_invariant(spark):
    """The flagship digest mixes naive-datetime inputs (image/snapshot
    grid — session-TZ-local instants) with epoch-built event timestamps;
    the contract query rebases the events through the SAME session-TZ
    parse so every event<->snapshot alignment — and therefore the pinned
    digest — survives any driver timezone. Chatham (+12:45) exercises a
    fractional offset."""
    contract.ensure_workers_can_import(spark)
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        rows = {}
        for tz in ("UTC", "Pacific/Chatham"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            rows[tz] = contract.QUERY_BUILDERS["flagship"](
                spark, "/root/testdata/sf0.001").collect()[0].asDict()
        assert rows["UTC"] == rows["Pacific/Chatham"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_connected_components_chain_and_cliques(spark):
    """Hash-min propagation: a 4-edge path (needs >1 round), a triangle
    with a redundant edge, and an isolated pair — labels must equal the
    min id of each component, and only pair-graph vertices are emitted."""
    from ecg_feature_engineering_spark.operators import dedup
    pairs = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1),       # path, reversed ids
         (20, 21), (20, 22), (21, 22),          # triangle + redundancy
         (10, 11)],                              # isolated pair
        "id_a long, id_b long")
    got = sorted((r["doc_id"], r["component"])
                 for r in dedup.connected_components(pairs).collect())
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
                   (10, 10), (11, 10), (20, 20), (21, 20), (22, 20)]
    assert dedup.connected_components(pairs.limit(0)).count() == 0


def test_connected_components_matches_union_find(spark):
    """Randomized cross-check vs a literal python union-find."""
    import numpy as np
    from ecg_feature_engineering_spark.operators import dedup
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2))
             if a != b]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for v in parent:
        want[v] = find(v)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == want


def test_connected_components_nonconvergence_raises(spark):
    from ecg_feature_engineering_spark.operators import dedup
    pairs = spark.createDataFrame([(5, 4), (4, 3), (3, 2), (2, 1)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1)


def test_drop_near_dups_keeps_canonical_and_singletons(spark):
    from ecg_feature_engineering_spark.operators import dedup
    docs = spark.range(6).toDF("doc_id")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r["doc_id"]
                  for r in dedup.drop_near_dups(docs, pairs).collect())
    assert kept == [0, 1, 4, 5]  # 1 = cluster canonical; 0/4/5 singletons


def test_contaminated_ids_equals_report_filter(spark, sf_dir):
    """The pipeline spelling (corpus.contaminated_ids -> left_anti in
    corpus_pipeline.survivors) must equal the public report filtered to
    contaminated=true — and semi(clean) == anti(contaminated) holds
    because the report lists every candidate exactly once with a
    non-null flag. Pinned on a corpus with a NULL-text doc (absent from
    the one-pass counts table) and a custom id column name (the
    double-alias regression)."""
    from pyspark.sql import functions as F

    from ecg_feature_engineering_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.select(F.col("doc_id").alias("my_id"), "text").unionAll(
        spark.createDataFrame([(10 ** 9, None)], "my_id long, text string"))
    bench = docs.where(F.pmod(F.col("my_id"), F.lit(7)) == 0)
    cand = docs.where(F.pmod(F.col("my_id"), F.lit(7)) != 0)

    report = corpus.benchmark_contamination(
        cand, bench, "text", "my_id", n=3, threshold_pct=80)
    # every candidate listed exactly once, flag never null
    assert report.count() == cand.count()
    assert report.where(F.col("contaminated").isNull()).count() == 0
    # the null-text doc is listed with zero grams and NULL fraction
    nullrow = report.where(F.col("doc_id") == 10 ** 9).collect()
    assert len(nullrow) == 1 and nullrow[0].n_grams == 0
    assert nullrow[0].contam_frac is None and not nullrow[0].contaminated

    via_report = sorted(
        r.doc_id for r in
        report.where(F.col("contaminated")).select("doc_id").collect())
    via_ids = sorted(
        r.my_id for r in
        corpus.contaminated_ids(cand, bench, "text", "my_id",
                                n=3, threshold_pct=80).collect())
    assert via_ids == via_report and len(via_ids) > 0

    # semi(clean) == anti(contaminated) on the survivor mass
    clean = (report.where(~F.col("contaminated"))
             .select(F.col("doc_id").alias("my_id")))
    semi = cand.join(clean, "my_id", "left_semi")
    anti = cand.join(
        corpus.contaminated_ids(cand, bench, "text", "my_id",
                                n=3, threshold_pct=80),
        "my_id", "left_anti")
    assert (sorted(r.my_id for r in semi.select("my_id").collect())
            == sorted(r.my_id for r in anti.select("my_id").collect()))
