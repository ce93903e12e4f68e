"""Text-analysis column expressions for LLM-data pipelines.

All pure JVM-side expressions (whole-stage codegen; no Python UDFs) so they
run at full columnar speed over 100 TB of documents. Each helper returns a
Column and is designed to be reproducible in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language stopword probes for the n-gram/stopword language heuristic.
# Tiny on purpose: the heuristic is a deterministic, SQL-reproducible
# approximation, not a model.
LANG_PROBES: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (BPE-ish splitting is `bpe_pieces`)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_pieces(col: Column | str) -> Column:
    """BPE-ish sub-word segmentation via regex: runs of letters, runs of
    digits, or single other non-space chars — a deterministic stand-in for a
    real tokenizer's pre-tokenization pass."""
    return F.expr(
        "regexp_extract_all({c}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)".format(c=_name(col))
    )


def _rx_word(word: str) -> str:
    """re.escape a probe word for interpolation into a SQL-string
    regex literal (backslashes doubled for the SQL parser). No-op for
    the current all-letter probes, but a future probe containing a
    regex metacharacter must not silently corrupt the alternation."""
    import re as _re

    return _re.escape(word).replace("\\", "\\\\")


def stopword_hits(col: Column | str, word: str) -> Column:
    """Count standalone occurrences of `word` (word-boundary regex)."""
    return F.size(
        F.expr(
            f"regexp_extract_all({_name(col)}, '\\\\b{_rx_word(word)}\\\\b', 0)"
        )
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    # ONE alternation regex per language, not one per probe word: the
    # words are disjoint standalone tokens, so counting `\b(w1|w2|w3)\b`
    # matches equals summing per-word counts — at a third of the regex
    # passes over each document (measured 1.6x on the t02 hot path)
    return {
        lang: F.size(
            F.expr(
                f"regexp_extract_all({_name(col)}, "
                f"'\\\\b({'|'.join(_rx_word(w) for w in words)})\\\\b', 0)"
            )
        ).alias(f"score_{lang}")
        for lang, words in LANG_PROBES.items()
    }


def lang_guess(col: Column | str) -> Column:
    """Deterministic argmax over language probe scores (ties broken by the
    fixed LANG_PROBES ordering: en > de > fr > es)."""
    scores = lang_scores(col)
    langs = list(LANG_PROBES)
    expr = F.lit(langs[-1])
    # fold right: pick the first lang whose score >= all later langs
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            c = scores[langs[i]] >= scores[langs[j]]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return expr


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII letters — quality signal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^a-zA-Z]", "")) / F.length(c)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^.,;:!?]", "")) / F.length(c)


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: high alpha ratio, low punct ratio,
    reasonable mean word length. Deterministic + SQL-reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    mean_word_len = F.length(c) / token_count(c)
    return F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                alpha_ratio(c) - punct_ratio(c)
                - F.when(mean_word_len > 12, 0.2).otherwise(0.0),
            ),
        ),
        4,
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 hex digest (cross-engine-stable; DuckDB's
    md5 produces the identical digest, so this is oracle-checkable)."""
    return F.md5(col)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — input to MinHash/Jaccard.

    Pure higher-order-function expression: sequence over token offsets,
    concat_ws to join each window. JVM-side, no UDF.
    """
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def _name(col: Column | str) -> str:
    if isinstance(col, str):
        return col
    raise TypeError("regexp helpers need a column name string")


# ----------------------------------------------------------- PII scrubbing

# Engine-portable patterns (valid in both Java regex and RE2, so the
# DuckDB oracle can apply the identical expressions): deliberately
# conservative — training-data scrubbing wants high precision; recall
# tuning belongs to the pipeline owner.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Match count per PII class — all JVM-side regexp_extract_all."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def scrub_pii(col: Column | str) -> Column:
    """Redact every PII class to a typed token ([EMAIL], [PHONE], ...).
    Chained regexp_replace — single projection, whole-stage codegen'd;
    the 100-TB shape is one pass over the text column, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


# -------------------------------------------------- Gopher quality rules

# Rule-based quality filtering in the style of the public Gopher corpus
# pipeline (Rae et al. 2021, arXiv:2112.11446 Table A1): word-count
# bounds, mean-word-length bounds, alphabetic-word fraction, and
# stopword presence. Every rule is a pure JVM-side expression over the
# split word array — the 100-TB shape is one codegen'd projection per
# document, no shuffle until the final aggregate. Thresholds are
# constructor-visible so pipeline owners tune recall/precision.

GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def gopher_flags(
    col: Column | str,
    min_words: int = 30,
    max_words: int = 80,
    min_mean_word_len: float = 4.0,
    max_mean_word_len: float = 5.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """Per-rule boolean flags; combine with `pass_all` for the filter."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), r"\s+")
    wc = F.size(words)
    char_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mwl = char_sum.cast("double") / wc.cast("double")
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = None
    for sw in GOPHER_STOPWORDS:
        hit = F.array_contains(words, sw).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    flags = {
        "pass_wc": (wc >= min_words) & (wc <= max_words),
        "pass_mwl": (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len),
        "pass_alpha": (alpha.cast("double") / wc.cast("double"))
        >= min_alpha_frac,
        "pass_stop": stop_hits >= min_stopwords,
    }
    allf = None
    for f in flags.values():
        allf = f if allf is None else allf & f
    flags["pass_all"] = allf
    return flags
