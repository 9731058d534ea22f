"""Deterministic stratified sampling — corpus balancing for training-data
pipelines.

Rebalancing a multi-source / multi-language corpus ("cap English at 30%,
keep at most 10k docs per source") is a standard step between cleaning
and packing. Both operators here are HASH-deterministic, not RNG-based:
``df.sample()`` draws from a per-partition XORShift stream, so its output
changes under repartition/cluster layout and no other engine can replay
it; a content-hash rule is stable under any physical plan and exactly
replayable by the DuckDB oracle (same md5), which is what makes these
contract-checkable.

- :func:`stratified_sample` — per-stratum Bernoulli fraction by hash
  threshold. NO shuffle: the per-stratum threshold is a small broadcast
  map and the filter runs in the scan stage. Sample size per stratum is
  binomial around fraction·n (exact expectation, not exact count).
- :func:`quota_sample` — exactly min(quota, n) rows per stratum: hash-
  rank rows within each stratum and keep the quota smallest. One shuffle
  (hash-partition by stratum) + in-partition sort. At 100 TB prefer the
  fraction form when a ±√n tolerance is fine — it never shuffles; use
  quotas when hard caps matter. Skewed strata (one giant language) sort
  within their own partitions only — no global sort.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.functions.text import tokens


def fraction_to_hex_threshold(fraction: float) -> str:
    """fraction ∈ [0, 1] → threshold over the first 4 md5 chars: a row
    is kept iff ``substring(md5(key), 1, 4) < threshold`` (resolution
    1/65536). The comparison is LEXICOGRAPHIC on equal-length lowercase
    hex — identical to numeric order — so it is exactly replayable in
    any engine with md5, with no base-16→int conversion whose overflow/
    signedness varies. Fraction 1.0 returns ``'g'``: 'g' sorts above
    every hex digit at position 1, so every row passes — a FIVE-char
    '10000' would NOT (lexicographic '4ccc' > '10000' because '4' > '1';
    caught by test_sampling.py before it shipped, and invisible to the
    oracle contract because both engines would replay the same mistake)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction not in [0, 1]: {fraction}")
    v = int(fraction * (1 << 16))
    return "g" if v >= (1 << 16) else format(v, "04x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash(key) falls under its stratum's fraction.
    Strata absent from ``fractions`` use ``default_fraction`` (0.0 =
    drop — explicit opt-in per stratum, the usual corpus-mix posture)."""
    thresholds = F.create_map(
        *chain.from_iterable(
            (F.lit(s), F.lit(fraction_to_hex_threshold(f)))
            for s, f in fractions.items()
        )
    )
    limit = F.coalesce(
        thresholds[F.col(strata_col)],
        F.lit(fraction_to_hex_threshold(default_fraction)),
    )
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.substring(F.md5(key), 1, 4) < limit)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_cols: list[str],
) -> DataFrame:
    """Exactly min(quota, n) rows per stratum: rank by md5(key) inside
    each stratum (an unbiased, replayable shuffle order) and keep the
    ``quota`` smallest. Emits the input columns unchanged."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    w = Window.partitionBy(strata_col).orderBy(F.md5(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def budget_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    token_budget: int,
    key_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Sample to ≈``token_budget`` total whitespace tokens with the given
    mixture ``weights`` — "give me 1B tokens, half English, a fifth
    German…", the step that turns a cleaned multi-source corpus into a
    training mix. Per stratum:

        fraction = min(1, token_budget · weight / stratum_tokens)

    (weights are normalized; a stratum too small for its allocation is
    taken whole and UNDER-delivers rather than silently borrowing from
    the others — renormalize and rerun if exact totals matter). Strata
    absent from ``weights`` drop.

    Deterministic like everything in this module: the keep-rule is the
    same md5-hex-threshold as :func:`stratified_sample`, but the
    threshold is COMPUTED IN THE PLAN from a per-stratum token aggregate
    (a handful of rows) broadcast back onto the scan — no driver-side
    collect, no RNG, stable under any partitioning, exactly replayable
    by a SQL oracle. Expected sample size per stratum is binomial around
    fraction · n (token counts concentrate tightly for large corpora).
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    wmap = F.create_map(
        *chain.from_iterable(
            (F.lit(s), F.lit(w / total_w)) for s, w in weights.items()
        )
    )
    toks = F.size(tokens(text_col)).cast("long")
    per_stratum = (
        df.select(F.col(strata_col).alias("_st"), toks.alias("_t"))
        .groupBy("_st")
        .agg(F.sum("_t").alias("_stratum_tokens"))
    )
    w = wmap[F.col("_st")]
    # guard the null before least(): Spark's least SKIPS nulls, so an
    # unweighted stratum would silently get fraction 1.0 instead of 0
    frac = F.when(
        w.isNotNull(),
        F.least(
            F.lit(1.0),
            F.lit(float(token_budget)) * w / F.col("_stratum_tokens"),
        ),
    )
    v = F.floor(frac * (1 << 16)).cast("int")
    thr = F.when(v >= (1 << 16), F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(v), 4, "0"))
    )
    limits = F.broadcast(per_stratum.select("_st", thr.alias("_thr")))
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    return (
        df.join(limits, df[strata_col] == limits["_st"])
        .filter(F.substring(F.md5(key), 1, 4) < F.col("_thr"))
        .drop("_st", "_thr")
    )


def pps_sample(
    df: DataFrame,
    weight_col: str,
    expected_k: int,
    key_cols: list[str],
) -> DataFrame:
    """Probability-proportional-to-size Bernoulli sample: row kept with
    probability min(1, k·w/W), so the expected sample size is ≤ k and
    heavy rows (long documents, big transactions) are proportionally
    favored — the standard first stage of weighted corpus subsampling
    ("sample 100k documents by token mass").

    Deterministic and integer-exact like the rest of this module: the
    keep rule is ``hex4(md5(key)) < hex4((min(k·w, W)·65536) div W)``
    with W the total weight — all-integer arithmetic both engines
    replay bit-for-bit (no float probability anywhere), resolution
    1/65536. W comes from a one-row aggregate broadcast back onto the
    scan (no driver collect); rows with NULL or ≤ 0 weight are never
    sampled and contribute nothing to W. Weights must be integers
    (token/char counts — the natural corpus weights); k·w·65536 must
    fit a BIGINT, which holds through ~2^31 weights at k ≤ 2^16.
    """
    if expected_k < 1:
        raise ValueError(f"expected_k must be >= 1, got {expected_k}")
    w = F.when(F.col(weight_col) > 0, F.col(weight_col).cast("long"))
    # ONE-ROW total broadcast into the keep rule — the q11 scalar shape
    # (no equi key exists for a global threshold; a literal join key
    # constant-folds straight back to the nested-loop form anyway).
    # O(n × 1), allowlisted in tools/audit_plans.py with the others.
    total = df.select(w.alias("_w")).agg(F.sum("_w").alias("_W"))
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    # guard the null before least(): Spark's least SKIPS nulls (same
    # trap budget_mix documents), so an unweighted row would silently
    # get certain inclusion instead of exclusion
    with_tot = df.join(F.broadcast(total)).withColumn(
        "_num",
        F.when(
            w.isNotNull(),
            F.least(F.lit(expected_k) * w, F.col("_W")) * (1 << 16),
        ),
    )
    v = F.expr("_num div _W")
    keep = F.when(v >= (1 << 16), F.lit(True)).otherwise(
        F.substring(F.md5(key), 1, 4)
        < F.lower(F.lpad(F.hex(v), 4, "0"))
    )
    return with_tot.filter(keep).drop("_W", "_num")


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment that near-duplicates can
    never leak across: documents are split by NEAR-DUP CLUSTER, not
    individually — every member of a connected near-dup group lands in
    the same split, so a test document's twin cannot sit in train (the
    standard eval-contamination failure of naive row-wise splitting).

    ``pairs`` is any near-dup pair frame (MinHash-LSH at scale; exact
    Jaccard as the oracle tier); documents in no pair form singleton
    clusters. Assignment hashes the CLUSTER id through the same
    md5-threshold rule as :func:`stratified_sample` with cumulative
    boundaries, so it is RNG-free, stable under partitioning, and
    exactly replayable by a SQL oracle. The last split absorbs hash
    rounding, so fractions need not sum to exactly 1.

    Output: one row per document — (id, split).
    """
    from changedatacapture_reporting_spark.operators.dedup import (
        neardup_clusters,
    )

    names = list(splits)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    cum = 0.0
    bounds = []  # (name, upper-threshold) for all but the last split
    for n in names[:-1]:
        cum += splits[n]
        bounds.append((n, fraction_to_hex_threshold(cum)))

    clusters = neardup_clusters(pairs)
    labeled = (
        df.select(F.col(id_col))
        .join(
            clusters.withColumnRenamed("member_id", id_col), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("_cluster"),
        )
    )
    h = F.substring(F.md5(F.col("_cluster").cast("string")), 1, 4)
    split = F.lit(names[-1])
    for name, thr in reversed(bounds):
        split = F.when(h < F.lit(thr), F.lit(name)).otherwise(split)
    return labeled.select(id_col, split.alias("split"))


def rank_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Exact equal-population curriculum buckets WITHOUT a global sort:
    bucket b = ⌊k·(rank−1)/n⌋ where rank is the row's position under the
    total order (score, id) — NTILE-adjacent semantics (equal-size
    buckets in score order, deterministic tie-break by id) but computed
    in two partitionable steps instead of one all-rows-to-one-partition
    window:

    1. per-score counts → a cumulative base rank per distinct score
       (window over the SCORE-cardinality frame, which for an integer
       quality score — token/char counts, rounded scores — is orders of
       magnitude smaller than the corpus; documented assumption);
    2. within-score position by a window PARTITIONED on score (shuffle
       ∝ corpus on score, groups are per-score — never one partition),
       plus the broadcast base.

    Length-ordered curriculum ("train short→long") and quality-tier
    mixes both consume this frame. ``score_col`` should be integer-typed
    so ordering is engine-exact (doubles rank-flip at the ulp across
    engines; the caller rounds first if needed).

    Output: (id, score, rank, bucket) — rank ∈ [1, n], bucket ∈ [0, k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    per_score = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count("*").alias("cnt")
    )
    # cumulative count of rows with strictly smaller score + total n.
    # The unpartitioned window runs over the distinct-score frame only.
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = per_score.select(
        "score",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("base_rank"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    within = F.row_number().over(
        Window.partitionBy(F.col(score_col)).orderBy(F.col(id_col))
    )
    ranked = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(score_col).alias("score"),
            within.alias("within"),
        )
        .join(F.broadcast(base), "score")
        .select(
            "id",
            "score",
            (F.col("base_rank") + F.col("within")).alias("rank"),
            "n_total",
        )
    )
    return ranked.select(
        "id",
        "score",
        "rank",
        F.floor(
            (F.col("rank") - 1) * F.lit(k) / F.col("n_total")
        ).cast("int").alias("bucket"),
    )
