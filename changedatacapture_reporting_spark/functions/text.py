"""Text-analysis column builders (BASELINE.json extension surface).

All pure Spark built-in expressions — no Python UDFs — so at 100 TB the
whole text pipeline stays in whole-stage codegen and parallelizes with the
scan. Higher-order functions (transform/aggregate/filter) do the per-token
work JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "on", "for",
)


def _nn(text: Column | str) -> Column:
    """NULL text folds to '' at the tokenization boundary: a NULL-text
    document behaves EXACTLY like an empty one everywhere (token
    counts, sampling weights, packing, shingles) — never the legacy
    sizeOfNull -1. Note the invariant is NULL ≡ '', not "count is 0":
    split('') is [''] so tokens('') has size 1, the same +1 an empty
    string contributes (pinned by test_llm_ops); lm._clean_tokens
    filters empties where a true 0 is required (ADVICE r10/r11)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(c, F.lit(""))


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (null text ≡ empty text)."""
    return F.split(F.trim(_nn(text)), r"\s+")


def word_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization: word pieces OR digit runs OR single
    punctuation — closer to how LLM tokenizers pre-split. Null text ≡
    empty text."""
    return F.regexp_extract_all(
        _nn(text), F.lit(r"([a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9])"), 1
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles (the unit for MinHash/Jaccard dedup).

    Built by zipping the token array with its shifted selves — O(tokens)
    per row. (The naive ``transform(sequence(…), i -> slice(t, i, n))``
    form re-slices per index = O(tokens²) per row; on long documents that
    dominated the whole dedup pipeline.) Positions past the last full
    shingle null out through ``concat`` and are filtered."""
    t = tokens(text)
    acc = t
    for i in range(1, n):
        shifted = F.slice(t, i + 1, F.greatest(F.size(t) - i, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(F.filter(acc, lambda s: s.isNotNull()))


def fingerprint_md5(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the whitespace-normalized,
    lower-cased text. Stable across engines (pure MD5 hex)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def rolling_fingerprints(text: Column | str, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: md5 per w-token window —
    the document-fingerprinting primitive for partial-overlap detection."""
    t = tokens(text)
    return F.when(
        F.size(t) < window, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (window - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, window))),
        )
    )


def quality_columns(text: Column | str) -> dict[str, Column]:
    """Heuristic quality signals (length / punctuation / stopword ratios —
    the standard pre-training corpus filters)."""
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    stop_hits = F.size(
        F.filter(t, lambda w: F.lower(w).isin(*DEFAULT_STOPWORDS))
    )
    n_tokens = F.size(t)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": (n_alpha.cast("double") / n_tokens),
        "alpha_ratio": (n_alpha.cast("double") / n_chars),
        "punct_ratio": (n_punct.cast("double") / n_chars),
        "stopword_ratio": (stop_hits.cast("double") / n_tokens),
    }


# Tiny per-language marker profiles for the n-gram/stopword language-ID
# heuristic. Real deployments would ship full character-trigram profiles;
# the operator shape (score per language via JVM-side set intersection,
# argmax) is what matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with", "that"),
    "es": ("el", "la", "de", "que", "los", "una", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "zh": (),  # detected by CJK codepoints, not stopwords
}


def langid_scores(text: Column | str) -> Column:
    """Language-ID heuristic → struct<lang: string, score: double>.

    CJK codepoint ratio decides zh; otherwise the language whose stopword
    markers cover the largest share of tokens wins (ties break by language
    code so the result is deterministic).
    """
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    n_tokens = F.greatest(F.size(t), F.lit(1))
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    scores = F.array(
        *[
            F.struct(
                (
                    F.size(F.filter(t, lambda w: F.lower(w).isin(*marks)))
                    .cast("double")
                    / n_tokens
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, marks in LANG_MARKERS.items()
            if marks
        ]
    )
    best = F.array_max(scores)  # struct compare: score first, then lang
    return F.when(
        cjk.cast("double") / F.greatest(F.length(c), F.lit(1)) > 0.2,
        F.struct(F.lit("zh").alias("lang"), F.lit(1.0).alias("score")),
    ).otherwise(
        F.struct(best["lang"].alias("lang"), best["score"].alias("score"))
    )


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens.

    Classic Charikar construction: each token hashes to 64 bits; bit i of
    the signature is the sign of Σ_tokens (2·bit_i − 1). Near-duplicates
    have small Hamming distance. Entirely JVM-side via nested higher-order
    functions — per-row work is O(tokens × 64) with no shuffle.
    """
    t = tokens(text)
    hashes = F.transform(t, lambda w: F.xxhash64(w))

    def vote(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.bit_get(h, F.lit(i)) == 1, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for i in range(64):
        # bit 63 of a signed long is the sign bit → its literal is MIN_LONG
        bit_val = F.lit(-(2**63) if i == 63 else (1 << i)).cast("long")
        sig = sig.bitwiseOR(
            F.when(vote(i) > 0, bit_val).otherwise(F.lit(0).cast("long"))
        )
    return sig


# Demo lexicon for the dictionary-join scoring operator; a real
# deployment swaps in a full sentiment lexicon (VADER/AFINN-sized, 10⁴
# terms) — the join pattern is what matters, not the word list.
DEFAULT_SENTIMENT_LEXICON: dict[str, float] = {
    "fast": 1.0,
    "good": 1.0,
    "great": 2.0,
    "efficient": 1.0,
    "slow": -1.0,
    "bad": -1.0,
    "poor": -2.0,
    "big": 0.5,
    "small": -0.5,
}


def sentiment_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    lexicon: dict[str, float] | None = None,
):
    """Dictionary-join scoring (SURVEY §2.13 "sentiment-ish scoring"):
    explode lowered tokens → broadcast-join the lexicon → per-document
    hit count and length-normalized score.

    An ``isin`` expression (the stopword-ratio approach) compiles the
    word list into the plan — fine for 11 stopwords, not for a 10⁴-term
    lexicon. The broadcast join is the shape that scales: the lexicon
    ships once per executor, the token explosion never shuffles (map-side
    join), and the per-doc aggregation combines map-side before the only
    shuffle (by id). Returns (id, n_tokens, n_hits, sentiment)."""
    lex = lexicon if lexicon is not None else DEFAULT_SENTIMENT_LEXICON
    spark = df.sparkSession
    lex_df = spark.createDataFrame(
        list(lex.items()), "term string, weight double"
    )
    t = tokens(text_col)
    exploded = df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.explode_outer(t).alias("_tok"),
    ).withColumn("term", F.lower(F.col("_tok")))
    joined = exploded.join(F.broadcast(lex_df), "term", "left")
    return joined.groupBy(id_col, "n_tokens").agg(
        F.count("weight").alias("n_hits"),
        F.round(
            F.coalesce(F.sum("weight"), F.lit(0.0)) / F.col("n_tokens"), 6
        ).alias("sentiment"),
    )


PII_PATTERNS = [
    # order matters: emails before phones (an email's digits must not be
    # half-eaten by the phone pattern)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # A digit run is a phone only when it is SHAPED like one: either a
    # leading + (international: 7-15 total digits with optional single
    # space/hyphen separators) or explicit 3-3-4 grouping, optionally
    # with a parenthesized area code. A plain \d[\d -]{7,}\d run-matcher
    # redacts ISO-date pairs and bare numeric IDs — corpus-damaging
    # false positives that an engine-parity contract can never catch,
    # because both engines replay the same mistake.
    (
        r"\+\d{1,3}(?:[ -]?\d){6,12}\b"
        r"|\(\d{3}\)[ -]?\d{3}[ -]\d{4}\b"
        r"|\b\d{3}[ -]\d{3}[ -]\d{4}\b",
        "<PHONE>",
    ),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column | str) -> Column:
    """PII redaction for training corpora: emails, phone numbers, IPv4
    addresses → typed placeholder tokens. Chained ``regexp_replace`` —
    pure JVM expressions, whole-stage-codegen-resident, no Python. The
    patterns use only RE2-portable syntax so the DuckDB oracle replays
    them verbatim."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_scores(text: Column | str) -> dict[str, Column]:
    """Gopher-style repetition signals (expression-only):

    - ``dup_3gram_frac`` — fraction of 3-gram occurrences that are
      repeats of an earlier occurrence (1 − distinct/total); boilerplate
      and degenerate generations score high;
    - ``n_3grams`` — total 3-gram occurrences (the denominator, exposed
      for thresholding at corpus scale).
    """
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    total = F.greatest(F.size(t) - 2, F.lit(0))
    distinct = F.size(shingles(c, 3))
    return {
        "n_3grams": total.cast("long"),
        "dup_3gram_frac": F.when(total > 0,
            F.lit(1.0) - distinct.cast("double") / total.cast("double")
        ).otherwise(F.lit(0.0)),
    }


def normalize_text(text: Column | str) -> Column:
    """Corpus canonicalization — the step that runs BEFORE fingerprinting
    and dedup so cosmetic variants (smart quotes, unicode dashes, NBSP,
    stray control chars, ragged whitespace, case) hash identically:

    1. lowercase;
    2. unicode punctuation → ASCII (' ' " " – — → ASCII quotes/dashes,
       NBSP → space, … → ...);
    3. control characters stripped;
    4. whitespace collapsed to single spaces, trimmed.

    Pure ``translate``/``regexp_replace`` expressions — codegen-resident,
    RE2-portable, and exactly replayable in any SQL engine (the contract
    hash-checks normalized text + fingerprints through injected-unicode
    inputs).
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.translate(c, "‘’“”–— ", "''\"\"-- ")
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
