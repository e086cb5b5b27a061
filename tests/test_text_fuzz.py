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
