"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference capability (SURVEY.md §7 phase 6): the reference's
closest surface is tsvector/tsquery full-text (tsvector.c, tsrank.c) and
string/regex functions; these operators extend that into the
LLM-data-pipeline territory: tokenization, quality scoring, language
heuristics, fingerprinting.

Everything here is built from JVM-side column expressions (split/
transform/aggregate/regexp) — no Python in the row path — so the plans
whole-stage-codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small: the discriminator is relative hit-rate.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
    "zh": ["de", "shi", "le", "bu", "wo", "you", "he", "ren", "zai"],
}


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization (the reference's default parser's word
    class — tsvector.c's prsd_* via ts_parse)."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def bpe_ish_tokens(text: Column | str) -> Column:
    """A BPE-ish regex tokenizer: words, numbers, punctuation runs —
    approximates LLM-tokenizer pre-splitting for token counting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda x: (x != "") & (x != " "),
    )


def token_count(text: Column | str) -> Column:
    return F.array_size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.array_size(F.array_distinct(tokens(text)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, type-token
    ratio, punctuation/digit/uppercase ratios, mean word length.

    These are the standard pre-training corpus filters (length heuristics,
    symbol ratios) computed without leaving the JVM.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.array_size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("n_distinct_tokens", F.array_size(F.array_distinct(toks)))
        .withColumn(
            "type_token_ratio",
            F.round(
                F.array_size(F.array_distinct(toks)).cast("double")
                / F.greatest(n_tok, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "mean_word_len",
            F.round(
                F.aggregate(
                    toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
                ).cast("double")
                / F.greatest(n_tok, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "digit_ratio",
            F.round(n_digit.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "upper_ratio",
            F.round(n_upper.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        )
    )


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.array_size(F.array_intersect(F.array_distinct(toks), sw))
    in_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    _ = hits  # distinct-hit variant available; ratio uses token occurrences
    return F.round(
        in_sw.cast("double") / F.greatest(F.array_size(toks), F.lit(1)), 6
    )


def langid_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword hit-rate per candidate language;
    predicted language = argmax (deterministic tiebreak on language code).

    The real-world version would use character n-gram profiles; the
    Spark-side plumbing (one score column per language, argmax via
    greatest/when chain) is identical.
    """
    out = df
    for code in sorted(STOPWORDS):
        out = out.withColumn(f"score_{code}", stopword_ratio(F.col(text_col), code))
    scores = [F.col(f"score_{c}") for c in sorted(STOPWORDS)]
    best = F.greatest(*scores)
    pred = F.lit(None).cast("string")
    for code in sorted(STOPWORDS, reverse=True):
        pred = F.when(F.col(f"score_{code}") == best, F.lit(code)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set — the canonical-form dedup key (a cheap stand-in for the
    reference's tsvector canonicalization)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def rolling_hash_fingerprint(text: Column | str, window: int = 4) -> Column:
    """Winnowing-style fingerprint: min polynomial rolling hash over
    ``window``-token shingles (deterministic, JVM-side)."""
    toks = tokens(text)
    n = F.array_size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    shingle_hash = F.transform(
        idx,
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i, window), " ")),
    )
    return F.array_min(shingle_hash)


# ---------------------------------------------------------------------------
# within-document repetition (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def ngrams(text: Column | str, n: int) -> Column:
    """Word n-grams as strings, from the whitespace tokenization.

    r11 (guide §1.2 per-task work): built by zipping n shifted slices of
    the token array (arrays_zip + one transform whose lambda touches only
    the zipped struct), NOT by a transform over an index sequence whose
    lambda closes over the token array — Spark does not hoist invariant
    subtrees out of higher-order-function lambda bodies, so the old shape
    re-evaluated the whole tokenize per ELEMENT: O(tokens²) splits per
    row (measured 20x on 200-token docs). Values are identical: slice
    k of length sz-n+1 exists for every k <= n, and concat_ws over
    non-null tokens equals array_join."""
    return _ngrams_of(tokens(text), n)


def _ngrams_of(t: Column, n: int) -> Column:
    """N-grams from an (ideally already-materialized) token array column.
    Hot operators should project ``tokens(text)`` once and call this on
    the materialized column so the tokenize runs once per row total."""
    sz = F.array_size(t)
    length = sz - n + 1
    z = F.arrays_zip(*[F.slice(t, k, length) for k in range(1, n + 1)])
    return F.when(
        sz >= n,
        F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_fraction(text: Column | str, n: int) -> Column:
    """Fraction of n-grams that are repeats of an earlier occurrence:
    1 - distinct/total (0.0 for docs shorter than n tokens). The
    'repeated n-gram fraction' family from the Gopher data-quality
    filters — high values flag boilerplate/spam for pipeline removal."""
    g = ngrams(text, n)
    total = F.array_size(g)
    return F.when(total > 0, 1.0 - F.array_size(F.array_distinct(g)) / total).otherwise(0.0)


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of non-empty lines that are duplicates of another line —
    the duplicate-line Gopher signal (terms-of-service boilerplate…)."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.filter(F.split(c, r"\n"), lambda x: F.trim(x) != "")
    total = F.array_size(lines)
    return F.when(
        total > 0, 1.0 - F.array_size(F.array_distinct(lines)) / total
    ).otherwise(0.0)


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement) — applied in order, JVM regexp_replace
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ssn_like", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
]


def redact_pii(text: Column | str) -> Column:
    """Scrub common PII shapes (emails, IPv4s, phone-number and SSN-like
    digit patterns) with typed placeholder tags. A chain of JVM
    regexp_replace calls — one codegen stage, no Python, order of
    patterns fixed so overlapping matches resolve deterministically."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_hit_count(text: Column | str, pattern_name: str) -> Column:
    """Number of matches of one named PII pattern (audit metric)."""
    c = F.col(text) if isinstance(text, str) else text
    pat = dict((n, p) for n, p, _ in PII_PATTERNS)[pattern_name]
    return F.regexp_count(c, F.lit(pat))
