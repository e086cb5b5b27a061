"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These are the caption/metadata analogs of the reference's string projections
(SURVEY.md §2.8 F1-F7: substring/strip/split parsing of header comments,
extract_HRV.py:37-49) widened to the operations a web-scale training-data
pipeline needs. Everything is built-in `pyspark.sql.functions` — JVM-side,
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenization contract: one EXPLICIT ASCII whitespace class, identical
# bytes in Java regex (Spark split), RE2 (DuckDB oracles), and Python
# re — bare \\s means a DIFFERENT set in each (Java \\s has \\x0B, RE2
# \\s does not), so engine-vs-oracle token counts would silently
# diverge on exotic whitespace.
WS_PATTERN = "[ \\t\\n\\x0B\\f\\r]+"

STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "les", "et", "une"),
    "de": ("der", "die", "und", "ist"),
}


def words(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array (not ['']).
    Split-then-filter, NOT trim-then-split: F.trim strips only ASCII
    spaces, so tab/newline-padded text would produce phantom empty tokens
    (and the blank guard would miss a bare tab)."""
    return F.filter(F.split(text, WS_PATTERN), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(words(text))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (~chars/4, the public
    rule-of-thumb) + character count."""
    t = F.col(text_col)
    return df.withColumns({
        "n_tokens_ws": token_count(t),
        "n_tokens_bpe_est": F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        "n_chars_computed": F.length(t),
    })


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring signals: length, word count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio, digit ratio.
    All closed-form column expressions (oracle-parity safe)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    ws = words(t)
    n_words = F.size(ws)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_stop = F.size(F.filter(ws, lambda x: x.isin(*STOPWORDS_EN)))
    nz = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    return df.withColumns({
        "n_chars_q": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        # true mean token length (the old n_chars-(n_words-1) form
        # assumed exactly one separator char between words — wrong
        # for whitespace runs/padding, which the tokenizer collapses)
        "mean_word_len": nz(
            F.aggregate(F.transform(ws, lambda x: F.length(x)),
                        F.lit(0), lambda acc, v: acc + v)
            .cast("double"), n_words),
        "punct_ratio": nz(n_punct.cast("double"), n_chars),
        "stopword_ratio": nz(n_stop.cast("double"), n_words),
        "upper_ratio": nz(n_upper.cast("double"), n_chars),
        "digit_ratio": nz(n_digit.cast("double"), n_chars),
    })


def langid_heuristic(df: DataFrame, text_col: str = "text",
                     out: str = "lang_pred") -> DataFrame:
    """Marker-stopword language ID: count per-language marker words, argmax
    with deterministic tie-break on language code order. An n-gram heuristic,
    not a model — the point is the distributed shape (scan-local, no shuffle).
    """
    ws = words(F.lower(F.col(text_col)))

    def marker_count(markers: tuple[str, ...]) -> Column:
        # single-arg lambda: PySpark inspects arity, so the marker list must
        # be closed over, not passed as a defaulted second parameter
        return F.size(F.filter(ws, lambda x: x.isin(*markers)))

    scores = {lang: marker_count(markers)
              for lang, markers in _LANG_MARKERS.items()}
    langs = sorted(_LANG_MARKERS)
    # deterministic argmax: max over (score, -lang_index) struct tuples
    arr = F.array(*[
        F.struct(scores[lang].alias("s"),
                 F.lit(-i).alias("prio"),
                 F.lit(lang).alias("lang"))
        for i, lang in enumerate(langs)
    ])
    top = F.array_max(arr)
    pred = F.when(top["s"] > 0, top["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out, pred)


def fingerprint(df: DataFrame, text_col: str = "text",
                out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text.
    md5 is engine-portable (same string in Spark and DuckDB) — unlike
    xxhash64 — so fingerprints survive cross-engine pipelines."""
    # normalize FIRST, trim second: trim only strips ASCII spaces, so a
    # tab-padded doc would otherwise fingerprint differently from its
    # space-padded twin
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   WS_PATTERN, " "))
    return df.withColumn(out, F.md5(norm))
