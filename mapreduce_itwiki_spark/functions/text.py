"""Text-analysis column expressions (north-star ⊕ operators, SURVEY.md §2).

All JVM-side built-ins — no Python UDFs — so they whole-stage-codegen and
scale linearly: at 100 TB these run inside the parquet scan stage with
zero extra shuffles. Every function here has an exact ANSI-SQL twin used
by the DuckDB oracle (plans/llm_pipeline.py), which is why the hash
functions are md5-based (identical bytes in any engine) rather than
engine-native hashes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny English stopword list for the language-ID / quality heuristics;
#: deliberately small + frozen so the oracle SQL can inline it.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
#: non-space symbol — a cheap stand-in for byte-pair pre-tokenization.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split, matching the synthetic corpus)."""
    return F.split(text, " ")


def ws_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).cast("long")


def stopword_regex(words: tuple[str, ...] = STOPWORDS) -> str:
    """Token-boundary alternation over ``words``: a token is a maximal
    run between single-space separators, so ' word' with a '(?= )'
    lookahead on space-padded text matches exactly the split-token
    occurrences — the lookahead does not consume the trailing space, so
    adjacent stopwords ("a a a") all match. Every word is re.escape'd:
    the current list is plain ASCII words (escape is a no-op), but an
    unescaped metacharacter added on edit would silently corrupt the
    alternation; re.escape only ever backslashes non-alphanumerics,
    which Java regex (the engine running this via regexp_count) reads
    as the same literals Python does."""
    import re

    return " (?:" + "|".join(re.escape(w) for w in words) + ")(?= )"


_STOPWORD_RE = stopword_regex()


def stopword_count(text: Column) -> Column:
    """Number of whitespace tokens that are stopwords (occurrences, not
    distinct) — via one regexp_count pass over the padded text instead
    of a higher-order filter: HOF lambdas evaluate INTERPRETED per
    token (a 10-way isin expression-tree walk each), which an sf5 soak
    measured as the dominant cost of the quality family; the regex is
    compiled once and runs as a single JVM scan per document."""
    return F.regexp_count(F.concat(F.lit(" "), text, F.lit(" ")), F.lit(_STOPWORD_RE))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    return stopword_count(text).cast("double") / F.size(tokens(text)).cast("double")


#: every char regexp's [a-zA-Z0-9 ] matches, for translate()-deletion
_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ].

    Counted by DELETING the alphanumeric+space alphabet with
    translate() — a plain per-char table lookup — rather than
    regexp_replace: the regex build-a-replaced-string path measured
    37 s for a 250 k-doc pass at sf5 vs ~1 s for translate (the char
    class is fixed, so the two are exactly equivalent)."""
    return (
        F.length(F.translate(text, _ALNUM_SPACE, ""))
    ).cast("double") / F.length(text).cast("double")


def mean_token_len(text: Column) -> Column:
    # Σ len(token) == len(text) − n_separators, and splitting on a
    # single char always yields n_tokens − 1 separators (empty tokens
    # included) — an exact identity that replaces the interpreted
    # per-token aggregate() lambda with three codegen'd scalars.
    n = F.size(tokens(text))
    total = F.length(text) - (n - F.lit(1))
    return total.cast("double") / n.cast("double")


def quality_score(text: Column) -> Column:
    """Composite doc-quality heuristic in [0, ~1]: long enough, some
    stopwords, little punctuation. Mirrors the usual pretraining-filter
    shape (length/stopword/punct terms)."""
    len_term = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 10.0, F.lit(1.0))
    return (len_term + stop_term + punct_term) / F.lit(3.0)


def fingerprint(text: Column) -> Column:
    """Exact document fingerprint: md5 of lower(trim(text)). md5 (not
    xxhash/murmur) so the oracle can reproduce it byte-for-byte."""
    return F.md5(F.lower(F.trim(text)))


def shingle_fingerprint(text: Column, k: int = 5) -> Column:
    """Rolling-hash-style fingerprint: min md5 over all k-token shingles
    (winnowing's min-hash-of-window idea collapsed to one window size).
    Robust to local edits unlike :func:`fingerprint`."""
    toks = tokens(text)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingles = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_min(F.transform(shingles, F.md5))


def stopword_lang_score(text: Column) -> Column:
    """N-gram-free language-ID heuristic: an English-likeness score =
    stopword hit ratio. (The synthetic corpus is English word soup for
    every `lang` label, so the score — not the argmax — is the tested
    surface; a real deployment would score one stopword set per language
    and argmax.)"""
    return stopword_ratio(text)
