"""Property-based fuzz for the text-analysis operators (hypothesis):
arbitrary strings over a hostile alphabet (ASCII whitespace variants,
NBSP, unicode letters, PII-ish glyphs) must match an independent pure
Python implementation of the pinned tokenizer/regex contracts — the
input class where engine-vs-oracle divergence hides (three review
rounds found real bugs only on such corpora).

Each example ships ONE batched DataFrame through Spark (not one job per
string), keeping the property run inside a practical budget."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ecg_feature_engineering_spark.operators import text

ALPHABET = (
    "abcdefgh STUVWXyz0123456789"
    " \t\n\x0b\f\r\xa0"          # pinned-class whitespace + NBSP
    ".,!?;:#@/-_%+"              # punctuation, symbol, PII glyphs
    "é漢"
)

texts = st.one_of(st.none(), st.text(alphabet=ALPHABET, max_size=60))


def _words(t):
    return [w for w in re.split(r"[ \t\n\x0B\f\r]+", t) if w] if t else []


def _py_gopher(t):
    ws = _words(t)
    n = len(ws)
    mwl = sum(map(len, ws)) / n if n else 0.0
    sym = len(re.findall(r"#|\.\.\.", t)) / n if n and t else 0.0
    alpha = (sum(bool(re.search("[A-Za-z]", w)) for w in ws) / n
             if n else 0.0)
    nstop = len({w.lower() for w in ws} & set(text.STOPWORDS_EN))
    passes = (3 <= n <= 100_000 and 3.0 <= mwl <= 10.0 and sym <= 0.1
              and alpha >= 0.8 and nstop >= 2)
    return n, mwl, sym, alpha, nstop, passes


def _py_pii(t):
    em, ur = re.compile(text.EMAIL_PATTERN), re.compile(text.URL_PATTERN)
    scrubbed = em.sub("<PII>", ur.sub("<PII>", t))
    return (len(em.findall(t)), len(ur.findall(t)),
            hashlib.md5(scrubbed.encode()).hexdigest())


def _py_dup_ngram(t, n=3):
    ws = _words(t.lower() if t else t)
    grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
    cnt = Counter(grams)
    tot = sum(c * len(g) for g, c in cnt.items())
    dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
    return len(grams), (dup / tot if tot else 0.0)


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(texts, min_size=1, max_size=20))
def test_text_ops_match_python_on_arbitrary_strings(spark, batch):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string")
    g = text.gopher_quality(df).toPandas().set_index("doc_id")
    p = text.pii_scrub(df).toPandas().set_index("doc_id")
    d = text.dup_ngram_stats(df).toPandas().set_index("doc_id")
    tc = text.with_token_counts(df).toPandas().set_index("doc_id")
    for i, t in enumerate(batch):
        if t is None:
            assert pd.isna(g.loc[i, "n_words_g"])
            assert pd.isna(p.loc[i, "scrubbed_fingerprint"])
            assert d.loc[i, "n_grams"] == 0
            assert pd.isna(tc.loc[i, "n_tokens_ws"])
            continue
        n, mwl, sym, alpha, nstop, passes = _py_gopher(t)
        assert g.loc[i, "n_words_g"] == n, (i, t)
        assert np.isclose(g.loc[i, "mean_word_len_g"], mwl), (i, t)
        assert np.isclose(g.loc[i, "symbol_word_ratio"], sym), (i, t)
        assert np.isclose(g.loc[i, "alpha_word_frac"], alpha), (i, t)
        assert g.loc[i, "n_stop_distinct"] == nstop, (i, t)
        assert bool(g.loc[i, "passes_gopher"]) == passes, (i, t)
        ne, nu, fp = _py_pii(t)
        assert p.loc[i, "n_emails"] == ne, (i, t)
        assert p.loc[i, "n_urls"] == nu, (i, t)
        assert p.loc[i, "scrubbed_fingerprint"] == fp, (i, t)
        ng, frac = _py_dup_ngram(t)
        assert d.loc[i, "n_grams"] == ng, (i, t)
        assert np.isclose(d.loc[i, "dup_ngram_char_frac"], frac), (i, t)
        assert tc.loc[i, "n_tokens_ws"] == len(_words(t)), (i, t)


_LINE_TRIM = " \t\x0b\x0c\r"
_PARA_TRIM = " \t\n\x0b\x0c\r"
_PARA_RE = re.compile(r"\n[ \t\x0B\f\r]*\n")


def _py_lines(t):
    t = t or ""
    return [x for x in (s.strip(_LINE_TRIM) for s in t.split("\n")) if x]


def _py_line_rep(t):
    ls = _py_lines(t)
    n, uniq = len(ls), list(dict.fromkeys(ls))
    nu = len(uniq)
    lc, lcu = sum(map(len, ls)), sum(map(len, uniq))
    return (n, nu, n - nu, (n - nu) / n if n else 0.0,
            lc, lc - lcu, (lc - lcu) / lc if lc else 0.0)


def _py_paras(t):
    t = t or ""
    return [x for x in (s.strip(_PARA_TRIM) for s in _PARA_RE.split(t))
            if x]


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(texts, min_size=1, max_size=16))
def test_repetition_dedup_ops_match_python(spark, batch):
    """line_repetition / top_ngram / paragraph_dedup / c4_line_dedup vs
    independent pure-Python twins of their pinned contracts, including
    the CROSS-DOC frequency semantics (paragraph/c4) computed over the
    whole generated batch."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string")
    lr = text.line_repetition_stats(df).toPandas().set_index("doc_id")
    c4 = text.c4_line_dedup(df, min_docs=3).toPandas().set_index("doc_id")
    from ecg_feature_engineering_spark.operators import corpus, dedup
    tg = (corpus.top_ngram_char_fraction(df)
          .toPandas().set_index(["doc_id", "n"]).sort_index())
    pg = dedup.paragraph_dup_stats(df).toPandas().set_index("doc_id")

    # cross-doc frequency maps over the whole batch
    line_docs, para_docs = {}, {}
    for i, t in enumerate(batch):
        for ln in set(_py_lines(t)):
            line_docs.setdefault(ln, set()).add(i)
        for p in set(_py_paras(t)):
            para_docs.setdefault(p, set()).add(i)

    for i, t in enumerate(batch):
        n, nu, nd, dlf, lc, dlc, dlcf = _py_line_rep(t)
        r = lr.loc[i]
        assert (r["n_lines"], r["n_uniq_lines"], r["n_dup_lines"],
                r["line_chars"], r["dup_line_chars"]) == (n, nu, nd, lc,
                                                          dlc), (i, t)
        assert r["dup_line_frac"] == dlf and \
            r["dup_line_char_frac"] == dlcf, (i, t)

        lines = _py_lines(t)
        kept = [x for x in lines if len(line_docs[x]) < 3]
        rc = c4.loc[i]
        assert (rc["n_lines"], rc["n_lines_removed"],
                rc["kept_chars"]) == (len(lines), len(lines) - len(kept),
                                      sum(map(len, kept))), (i, t)
        assert rc["cleaned_fingerprint"] == hashlib.md5(
            "\n".join(kept).encode()).hexdigest(), (i, t)

        paras = _py_paras(t)
        dup_p = [p for p in paras if len(para_docs[p]) >= 2]
        rp = pg.loc[i]
        assert (rp["n_paras"], rp["n_dup_paras"], rp["para_chars"],
                rp["dup_para_chars"]) == (
            len(paras), len(dup_p), sum(map(len, paras)),
            sum(map(len, dup_p))), (i, t)

        ws = _words(t.lower() if t else t)
        denom = len(" ".join(ws))
        for nn in (2, 3, 4):
            if len(ws) < nn:
                assert (i, nn) not in tg.index, (i, t)
                continue
            cnt = Counter(" ".join(ws[j:j + nn])
                          for j in range(len(ws) - nn + 1))
            gram, c = sorted(cnt.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0]
            rt = tg.loc[(i, nn)]
            assert rt["top_gram"] == gram and rt["cnt"] == c, (i, t)
            assert (rt["gram_chars"], rt["denom_chars"]) == (
                c * len(gram), denom), (i, t)
            assert rt["char_frac"] == c * len(gram) / denom, (i, t)


def _py_norm_tokens(t):
    """The contamination/fingerprint normalization: lower, collapse the
    pinned ws class to single spaces, trim, split on ' ' — yields ['']
    for empty/blank text (the degenerate shingle both engines emit)."""
    norm = re.sub(r"[ \t\n\x0B\f\r]+", " ", t.lower()).strip()
    return norm.split(" ")


def _py_shingles(t):
    ws = _py_norm_tokens(t)
    return {" ".join(ws[i:i + 3]) for i in range(max(len(ws) - 2, 1))}


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(texts, min_size=2, max_size=16))
def test_packing_contamination_match_python(spark, batch):
    """pack_token_stream / pack_efficiency / benchmark_contamination vs
    pure-Python twins on arbitrary hostile corpora: the shard cumsum +
    chunk clamp arithmetic, the ceil/padding ledger, and the short-doc
    shingle fallback + 80% integer-tie rule."""
    from ecg_feature_engineering_spark.operators import corpus

    rows = [(i, f"s{i % 3}", t) for i, t in enumerate(batch)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    pk = (corpus.pack_token_stream(df, ctx=512).toPandas()
          .set_index("doc_id"))
    pe = (corpus.pack_efficiency(df, ctx=512).toPandas()
          .set_index("shard"))

    # overlap chunking twin (ctx=8/stride=4 so tiny fuzz docs still
    # produce multi-chunk output): chunk k = [4k, min(4k+8, n))
    ov = (corpus.chunk_overlap_spans(df, ctx=8, stride=4).toPandas()
          .set_index(["doc_id", "chunk_idx"]).sort_index())
    for i, _, t in rows:
        n = len(_words(t.lower() if t else t))
        if n == 0:
            assert i not in ov.index.get_level_values("doc_id"), (i, t)
            continue
        k_max = 0 if n <= 8 else -((-(n - 8)) // 4)
        assert set(ov.loc[i].index) == set(range(k_max + 1)), (i, t)
        for k in range(k_max + 1):
            r = ov.loc[(i, k)]
            assert (r["tok_start"], r["tok_end"]) == (
                4 * k, min(4 * k + 8, n)), (i, t)

    # python twin: per-shard doc_id-ordered cumsum + chunk clamp
    shards = {}
    for i, src, t in rows:
        n = len(_words(t.lower() if t else t))
        shards.setdefault(src, []).append((i, n))
    exp_eff = {}
    for src, docs in shards.items():
        cum, straddlers, total, mx = 0, 0, 0, 0
        for i, n in sorted(docs):
            start = cum
            cum += n
            first = start // 512
            last = max((cum - 1) // 512, first)
            r = pk.loc[i]
            assert (r["shard"], r["n_tokens"], r["start_off"],
                    r["chunk_first"], r["chunk_last"], r["n_chunks"]) \
                == (src, n, start, first, last, last - first + 1), (i, t)
            straddlers += int(last > first)
            total += n
            mx = max(mx, n)
        n_chunks = (total + 511) // 512
        exp_eff[src] = (len(docs), total, mx, straddlers, n_chunks,
                        n_chunks * 512 - total)
    for src, (nd, tot, mx, strad, nch, pad) in exp_eff.items():
        r = pe.loc[src]
        assert (r["n_docs"], r["total_tokens"], r["max_doc_tokens"],
                r["n_straddlers"], r["n_chunks"], r["pad_tokens"]) \
            == (nd, tot, mx, strad, nch, pad), src
        if tot:
            assert r["fill_frac"] == tot / (nch * 512), src

    # contamination: doc 0 is the benchmark split (doc_id % 50 == 0 and
    # batch size <= 16), the rest are candidates
    cand = df.where("doc_id % 50 <> 0")
    bench = df.where("doc_id % 50 = 0")
    cm = (corpus.benchmark_contamination(cand, bench).toPandas()
          .set_index("doc_id"))
    bench_grams = set().union(*[
        _py_shingles(t) for i, _, t in rows
        if i % 50 == 0 and t is not None]) if any(
        t is not None for i, _, t in rows if i % 50 == 0) else set()
    for i, _, t in rows:
        if i % 50 == 0:
            assert i not in cm.index
            continue
        r = cm.loc[i]
        if t is None:
            assert r["n_grams"] == 0 and not bool(r["contaminated"])
            continue
        sh = _py_shingles(t)
        hits = len(sh & bench_grams)
        assert (r["n_grams"], r["n_contam"]) == (len(sh), hits), (i, t)
        assert bool(r["contaminated"]) == (
            len(sh) > 0 and hits * 100 >= len(sh) * 80), (i, t)
