"""N-gram language-model scoring — perplexity-proxy quality filtering.

The standard corpus-curation stage this package lacked: score every
document by how surprising its token sequence is under an n-gram LM
trained on a reference corpus (CCNet-style "LM perplexity" filtering —
documents whose bigrams are mostly unseen in the reference are noise,
boilerplate, or a different register than the training target). Extension
surface (SURVEY.md §2.13 text-analysis quality scoring); no reference-repo
counterpart.

Everything is built-in Spark expressions + two corpus-level aggregations —
no Python UDFs, so the whole path stays inside whole-stage codegen.

Scale posture at 100 TB:

- tokenize ONCE per document; bigrams come from a zip_with over the same
  token array (no self-join on position);
- the bigram/unigram count tables are VOCABULARY-scale (≪ corpus scale —
  token positions collapse by key with map-side combine before the
  shuffle);
- scoring joins corpus-scale positions to vocabulary-scale counts on the
  bigram key: a plain shuffled equi-join whose build side is the small
  count table (AQE picks broadcast when it fits, sort-merge otherwise);
- the per-document roll-up is one hash aggregate on doc_id.

Exactness: every diagnostic column is integer arithmetic (counts and
count-sums), so an independent SQL engine replays them bit-exactly; the
float ``avg_logprob`` / ``ppl_proxy`` columns are provided for production
filtering but are NOT part of the hash-checked contract surface (the r9
de-flake lesson: never hash engine-computed doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _clean_tokens(text_col: Column, lowercase: bool) -> Column:
    # NULL text folds to '' so downstream F.size() is 0, never the legacy
    # sizeOfNull -1 — null-text docs must be zero-filled like empty docs
    # (ADVICE r10)
    c = F.coalesce(text_col, F.lit(""))
    c = F.lower(c) if lowercase else c
    t = F.split(F.trim(c), r"\s+")
    return F.filter(t, lambda x: x != "")


def _bigrams(t: Column) -> Column:
    """Positional bigrams "w1 w2" (repeats kept — counts need them)."""
    shifted = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    joined = F.zip_with(t, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(joined, 1, F.greatest(F.size(t) - 1, F.lit(0)))


def lm_counts(
    reference: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Train the model: (bigram counts, unigram counts) over ``reference``.

    Both frames are vocabulary-scale mergeable summaries — persist them
    once per reference snapshot and reuse across scoring batches (the
    same persisted-index shape as the incremental dedup operators).

    Returns ``(bigrams(w1, w2, c), unigrams(w1, c))``.
    """
    toks = _clean_tokens(F.col(text_col), lowercase)
    exploded = reference.select(F.explode(_bigrams(toks)).alias("bg"))
    bg = (
        exploded.groupBy("bg")
        .agg(F.count("*").cast("long").alias("c"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "c",
        )
    )
    uni = (
        reference.select(F.explode(toks).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return bg, uni


def lm_surprisal_scores(
    df: DataFrame,
    reference: DataFrame | None = None,
    counts: tuple[DataFrame, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: int = 3,
    flag_rare_fraction: float = 0.25,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document LM-surprisal quality diagnostics.

    Model: add-one-smoothed bigram LM trained on ``reference`` (default:
    ``df`` itself — self-scoring, which flags documents atypical for the
    corpus they sit in). Pass ``counts`` (from :func:`lm_counts`,
    possibly parquet-persisted) to score a batch against a fixed epoch
    model without retraining — the steady-state ingestion shape.

    Output, one row per input document (docs with < 2 tokens included,
    zero-filled):

    - ``n_tokens``, ``n_bigrams`` — exact sizes;
    - ``sum_bigram_freq`` — Σ reference-count over the document's bigram
      positions (high = the document walks well-trodden paths);
    - ``n_hapax_bigrams`` — positions whose bigram occurs exactly once in
      the reference (for self-scoring: unique to this document);
    - ``n_rare_bigrams`` — positions with reference count ≤
      ``rare_threshold``;
    - ``flagged`` — ``n_rare_bigrams > flag_rare_fraction · n_bigrams``
      (the curation decision a pipeline actually gates on);
    - ``avg_logprob`` / ``ppl_proxy`` — float add-one bigram log-likelihood
      per position and its exp(−·) perplexity form (production columns;
      excluded from hash-checked contracts — see module docstring).

    Unseen bigrams (zero reference count — only possible when ``reference``
    ≠ ``df``) count toward ``n_rare_bigrams`` and score log(1/(c(w1)+V)).
    """
    if counts is None:
        bg_counts, uni_counts = lm_counts(
            reference if reference is not None else df, text_col, lowercase
        )
    else:
        bg_counts, uni_counts = counts
    # |V| for add-one smoothing: a one-row aggregate, broadcast as a
    # scalar via crossJoin-free literal? It must stay a lazy plan (counts
    # may be a stream of an epoch snapshot), so carry it as a one-row
    # broadcast join — the allowlisted scalar-broadcast shape.
    vocab = uni_counts.agg(F.count("*").cast("long").alias("_v"))

    toks = _clean_tokens(F.col(text_col), lowercase)
    positions = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(_bigrams(toks)).alias("bg"),
    ).select(
        "_doc",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    joined = (
        positions.join(
            bg_counts.withColumnRenamed("c", "_c_bg"), ["w1", "w2"], "left"
        )
        .join(uni_counts.withColumnRenamed("c", "_c_w1"), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    c_bg = F.coalesce(F.col("_c_bg"), F.lit(0))
    c_w1 = F.coalesce(F.col("_c_w1"), F.lit(0))
    logprob = F.log((c_bg + 1).cast("double")) - F.log(
        (c_w1 + F.col("_v")).cast("double")
    )
    per_doc = joined.groupBy("_doc").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(c_bg).cast("long").alias("sum_bigram_freq"),
        F.sum((c_bg == 1).cast("long")).cast("long").alias("n_hapax_bigrams"),
        F.sum((c_bg <= rare_threshold).cast("long"))
        .cast("long")
        .alias("n_rare_bigrams"),
        F.sum(logprob).alias("_sum_logprob"),
    )
    base = df.select(
        F.col(id_col).alias("_doc"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    out = base.join(per_doc, "_doc", "left")
    zl = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    n_bg = zl("n_bigrams")
    avg_lp = F.when(
        n_bg > 0, F.col("_sum_logprob") / n_bg.cast("double")
    )
    return out.select(
        F.col("_doc").alias(id_col),
        "n_tokens",
        n_bg.alias("n_bigrams"),
        zl("sum_bigram_freq").alias("sum_bigram_freq"),
        zl("n_hapax_bigrams").alias("n_hapax_bigrams"),
        zl("n_rare_bigrams").alias("n_rare_bigrams"),
        (
            zl("n_rare_bigrams").cast("double")
            > F.lit(float(flag_rare_fraction)) * n_bg.cast("double")
        ).alias("flagged"),
        avg_lp.alias("avg_logprob"),
        F.when(avg_lp.isNotNull(), F.exp(-avg_lp)).alias("ppl_proxy"),
    )


def lm_merge_counts(
    counts_a: tuple[DataFrame, DataFrame],
    counts_b: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Merge two trained models (from :func:`lm_counts`) into one.

    N-gram counts are mergeable summaries — sum by key — so an epoch
    model is maintained incrementally: train on each ingestion batch,
    merge into the persisted model, never re-scan the corpus. The merge
    is two vocabulary-scale aggregations (map-side combinable); at
    100 TB the corpus never participates.
    """

    def _merge(a: DataFrame, b: DataFrame) -> DataFrame:
        keys = [c for c in a.columns if c != "c"]
        return (
            a.unionByName(b)
            .groupBy(*keys)
            .agg(F.sum("c").cast("long").alias("c"))
        )

    return _merge(counts_a[0], counts_b[0]), _merge(counts_a[1], counts_b[1])


__all__ = ["lm_counts", "lm_merge_counts", "lm_surprisal_scores"]
