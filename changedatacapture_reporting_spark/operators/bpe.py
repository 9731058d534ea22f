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
