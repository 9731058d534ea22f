"""Distributed BPE tokenizer training — learn merge rules from a corpus
the way sentencepiece/GPT-2 BPE does, but with the corpus staying
distributed end to end.

BPE trains on the WORD HISTOGRAM, not the raw corpus: the first (and
only corpus-sized) step collapses documents to distinct words with
counts — at 100 TB that's one hash aggregation down to vocabulary scale
(10⁷–10⁸ rows), after which every merge iteration touches only the
histogram. Each iteration is:

1. pair counting — explode adjacent symbol pairs per word, weighted by
   the word's corpus frequency; ONE hash aggregation (map-side combine
   collapses the heavy pairs early);
2. argmax — `orderBy(count desc, pair).limit(1)`: a TakeOrdered of one
   row (per-partition heads + driver pick), with a LEXICOGRAPHIC
   tie-break so the learned merge sequence is deterministic across
   partitionings and engines;
3. greedy merge — a pure-expression left-to-right array fold rewrites
   each word's symbol sequence (``a b a b`` → ``ab ab``; ``a a a`` →
   ``aa a`` — the classic BPE greedy semantics), no Python, no shuffle;
   the histogram is ``localCheckpoint``-ed every ``checkpoint_every``
   rounds so plans never nest more than a few folds while avoiding a
   per-round materialization job.

Driver traffic is one (pair, count) row per iteration. The reference
semantics are pinned by a pure-Python BPE in tests/test_bpe.py — merge
sequence and final vocabulary must match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_histogram(
    df: DataFrame, text_col: str, lowercase: bool
) -> DataFrame:
    from changedatacapture_reporting_spark.functions.text import tokens

    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    words = df.select(F.explode(tokens(c)).alias("word")).filter(
        F.col("word") != ""
    )
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _initial_symbols(word: Column) -> Column:
    """word → [c1, c2, …, cn</w>]: characters, end-of-word marker fused
    onto the last one (the GPT-2/sentencepiece convention that lets BPE
    distinguish word-final units)."""
    chars = F.split(word, "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END_OF_WORD))),
    )


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) inside one symbol
    array — the expression fold that replaces Python in the hot loop."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    lowercase: bool = True,
    min_pair_freq: int = 2,
    checkpoint_every: int = 4,
    merges_per_round: int = 1,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``: ``merges`` is the ordered list of
    ``(left, right, weighted_count)`` rules (stops early when no pair
    reaches ``min_pair_freq``); ``vocab`` is the post-merge symbol
    inventory as a DataFrame (symbol, freq = total weighted occurrences)
    — the unit inventory a tokenizer ships.

    ``merges_per_round > 1`` is the BATCHED variant: each round takes
    the top-M pairs whose SYMBOLS are pairwise disjoint (a pair sharing
    a symbol with a higher-ranked pick defers to the next round, since
    applying the winner changes its counts) and applies them together —
    ~M× fewer driver round-trips for a slightly different (and
    well-defined) merge schedule. Strict classic BPE is the default
    (M=1); the counts recorded for later picks in a batched round are
    their PRE-round counts.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    hist = _word_histogram(df, text_col, lowercase).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    hist = hist.localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        # over-fetch: disjointness filtering may reject some of the top
        # ranks; 4x covers heavy symbol overlap without a second query
        pairs = (
            hist.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(
                            x.alias("a"), y.alias("b")
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .filter(F.col("n") >= min_pair_freq)
            .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
            .limit(4 * want)
            .collect()
        )
        if not pairs:
            break
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in pairs:
            a, b = r.p.a, r.p.b
            if a in used or b in used or a + b in used:
                continue
            chosen.append((a, b, int(r.n)))
            used.update((a, b, a + b))
            if len(chosen) >= want:
                break
        merges.extend(chosen)
        for a, b, _ in chosen:
            hist = hist.select(
                _merge_expr(F.col("syms"), a, b).alias("syms"), "freq"
            )
        # checkpoint every few rounds, not every round: a handful of
        # nested merge folds optimizes fine, and each materialization
        # costs a full job — this roughly halves the per-merge latency
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            hist = hist.localCheckpoint()
            since_ckpt = 0

    vocab = (
        hist.select(F.explode("syms").alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize documents with a TRAINED merge table — the serving half
    of :func:`bpe_train` (a tokenizer is trained once per corpus epoch
    and applied to every later batch).

    The merge chain runs once per DISTINCT word, not per occurrence:
    the corpus collapses to a per-(doc, word) count aggregation, the
    distinct-word side is encoded through the same pure-expression
    greedy fold the trainer uses (`_merge_expr` — no Python in the
    encode path), and a join on ``word`` carries unit counts back.
    At 100 TB the encode table is vocabulary-scale (10⁷–10⁸ rows), so
    the expensive |merges|-deep expression chain runs over ~10⁻⁵ of the
    corpus rows; the word join is AQE's call (broadcast for shipped
    vocabularies, shuffle otherwise) and the heaviest key ("the") is
    bounded by n_docs because the left side is pre-aggregated distinct
    (doc, word). Every ``checkpoint_every`` merges the chain is cut with
    a localCheckpoint so Catalyst never optimizes a |merges|-deep
    nested-lambda tree at once.

    Output: one row per document — (id_col, n_words, n_bpe_units),
    where n_bpe_units is the post-merge symbol count (Σ words' units).
    """
    from changedatacapture_reporting_spark.functions.text import tokens

    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    doc_words = (
        df.select(F.col(id_col), F.explode(tokens(c)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("n_occ"))
    )
    encode = doc_words.select("word").distinct().select(
        "word", _initial_symbols(F.col("word")).alias("syms")
    )
    since_ckpt = 0
    for a, b in [(m[0], m[1]) for m in merges]:
        encode = encode.select(
            "word", _merge_expr(F.col("syms"), a, b).alias("syms")
        )
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            encode = encode.localCheckpoint()
            since_ckpt = 0
    units = encode.select("word", F.size("syms").alias("n_units"))
    return (
        doc_words.join(units, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_units"))
            .cast("long")
            .alias("n_bpe_units"),
        )
    )
