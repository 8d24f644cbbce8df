"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All built-in column expressions (whole-stage codegen), each with an exact
DuckDB twin for the oracle. Stopword lists are tiny in-query literals —
at scale they compile into the task binary, no broadcast needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import h60, words

# minimal function-word lists per language — enough signal for a heuristic
# n-gram/stopword language ID over clean text
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"],
}

BPE_ISH_TOKEN_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: letter runs are one token, each digit and each
    punctuation mark its own token — a cheap upper-bound proxy for real BPE
    vocab tokenization."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_TOKEN_RE), 0))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of non-space chars that are neither letters nor digits."""
    non_space = F.length(F.regexp_replace(col, r"\s+", ""))
    punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    return F.when(non_space > 0, punct.cast("double") / non_space) \
            .otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    ws = words(col)
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws)) \
            .otherwise(F.lit(0.0))


def mean_word_len(col: Column) -> Column:
    ws = words(col)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)) \
            .otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards
    reasonable length and word shape, penalizes punctuation soup.
    (The exact formula matters less than its determinism — it is the
    filter-threshold input of a cleaning pipeline.)"""
    length_term = F.least(char_count(col).cast("double") / 500.0, F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    wl = mean_word_len(col)
    shape_term = F.when((wl >= 3.0) & (wl <= 8.0), F.lit(1.0)) \
        .otherwise(F.lit(0.5))
    return F.round((length_term + punct_term + shape_term) / 3.0, 6)


def alpha_word_ratio(col: Column) -> Column:
    """Fraction of tokens containing at least one letter (Gopher's
    "80% of words contain an alphabetic character" rule — our tokenizer
    already restricts to [a-z0-9], so this separates digit-runs)."""
    ws = words(col)
    hits = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws)) \
            .otherwise(F.lit(0.0))


def stopword_count(col: Column, lang: str = "en") -> Column:
    """Stopword occurrences WITH multiplicity (Gopher's "at least two
    distinct-ish function words" rule uses a raw count)."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(words(col), lambda w: F.array_contains(sw, w)))


# Gopher-rule thresholds (Rae et al. 2021, Table A1-flavored, adapted to
# this corpus's scale): word-count bounds, mean-word-length band, minimum
# alphabetic-word share, minimum stopword hits, maximum symbol ratio.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 30, 90
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MIN_ALPHA = 0.7
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_PUNCT = 0.25


def gopher_passes(n_words: Column, mwl: Column, alpha: Column,
                  n_stop: Column, punct: Column) -> Column:
    """The composite Gopher quality gate as one boolean expression over
    the five pre-computed signal columns (kept separate so callers can
    report the signals alongside the verdict)."""
    return ((n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
            & (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
            & (alpha >= GOPHER_MIN_ALPHA)
            & (n_stop >= GOPHER_MIN_STOPWORDS)
            & (punct <= GOPHER_MAX_PUNCT))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: the language whose function words cover the
    largest fraction of the doc's tokens; 'und' (undetermined) when nothing
    scores above zero. Deterministic tie-break by language code order."""
    scores = [(lang, stopword_ratio(col, lang)) for lang in sorted(LANG_STOPWORDS)]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so earlier languages win ties (when() chains keep first match)
    expr = None
    for lang, score in scores:
        cond = (score == best_score) & (best_score > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None \
            else expr.when(cond, F.lit(lang))
    return expr.otherwise(out)


def doc_fingerprint(col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — robust to shuffling/whitespace, cheap to group on."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words(col))), " "))


def rolling_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprint: minimum h60 over word
    ``window``-grams — a single representative shingle hash per doc, the
    building block of locality-aware clustering.

    Shaped so the shingle array is evaluated ONCE: `array_min` over an empty
    array is NULL, so the short-doc fallback is a `coalesce`, not a `when`
    whose predicate would duplicate the whole shingle subtree (higher-order
    functions run interpreted — no codegen CSE to save us)."""
    from .hashing import shingles
    sh = shingles(words(col), window)
    return F.coalesce(F.array_min(F.transform(sh, h60)), h60(col))
