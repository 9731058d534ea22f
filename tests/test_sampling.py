"""Deterministic stratified sampling (operators.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.sampling import (
    fraction_to_hex_threshold,
    quota_sample,
    stratified_sample,
)


def _docs(spark, n=400):
    rows = [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hex_thresholds():
    assert fraction_to_hex_threshold(0.0) == "0000"
    assert fraction_to_hex_threshold(1.0) == "g"
    assert fraction_to_hex_threshold(0.5) == "8000"
    with pytest.raises(ValueError):
        fraction_to_hex_threshold(1.5)


def test_stratified_sample_fractions_and_default(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, "lang", {"en": 1.0, "de": 0.5}, ["doc_id"], default_fraction=0.0
    )
    by_lang = {
        r.lang: r.n for r in out.groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_lang.get("en") == 100            # fraction 1.0 keeps all
    assert 20 <= by_lang.get("de", 0) <= 80    # binomial around 50
    assert "fr" not in by_lang and "zh" not in by_lang  # default 0 drops


def test_stratified_sample_stable_under_repartition(spark):
    """The whole point vs df.sample(): identical rows regardless of the
    physical layout."""
    d = _docs(spark)
    pick = lambda df: {  # noqa: E731
        r.doc_id
        for r in stratified_sample(
            df, "lang", {"en": 0.4, "de": 0.4, "fr": 0.4, "zh": 0.4},
            ["doc_id"],
        ).collect()
    }
    assert pick(d) == pick(d.repartition(13)) == pick(d.coalesce(1))


def test_quota_sample_exact_counts_and_determinism(spark):
    d = _docs(spark)
    out = quota_sample(d, "lang", 30, ["doc_id"])
    counts = {r.lang: r.n for r in out.groupBy("lang").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts == {"en": 30, "de": 30, "fr": 30, "zh": 30}
    # quota above stratum size keeps the whole stratum
    full = quota_sample(d, "lang", 1000, ["doc_id"])
    assert full.count() == d.count()
    # same rows on every run / layout
    ids = lambda df: {r.doc_id for r in df.collect()}  # noqa: E731
    assert ids(out) == ids(quota_sample(d.repartition(7), "lang", 30, ["doc_id"]))
    with pytest.raises(ValueError):
        quota_sample(d, "lang", 0, ["doc_id"])


def test_budget_mix_hits_budget_and_mix(spark, sf_dir):
    """Sampled token totals per stratum land near budget·weight (binomial
    tolerance); a stratum smaller than its allocation is taken whole;
    absent strata drop; repartition-stable."""
    from changedatacapture_reporting_spark.operators.sampling import budget_mix
    from changedatacapture_reporting_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    weights = {"en": 0.6, "de": 0.4}
    budget = 600
    out = budget_mix(d, "lang", weights, budget, ["doc_id"])
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    got = {
        r.lang: r.t
        for r in out.groupBy("lang").agg(F.sum(toks).alias("t")).collect()
    }
    assert set(got) <= {"en", "de"}  # es/fr/zh have no weight -> dropped
    for lang, w in weights.items():
        target = budget * w
        assert got.get(lang, 0) < 3 * target  # loose binomial envelope
    assert sum(got.values()) > 0.2 * budget

    # huge budget -> fraction caps at 1: every weighted doc kept
    all_kept = budget_mix(d, "lang", weights, 10_000_000, ["doc_id"])
    assert (
        all_kept.count()
        == d.filter(F.col("lang").isin(*weights)).count()
    )

    # (repartition stability follows from construction — the keep rule is
    # the same md5 threshold test_stratified proves layout-stable, and the
    # threshold comes from an aggregate, which is partitioning-independent)


@pytest.mark.soak  # randomized/exhaustive sweep - pre-commit gate only
def test_leakage_safe_splits_no_cross_split_pairs(spark, sf_dir):
    """Every near-dup pair lands in ONE split; coverage is total and
    proportions are sane; singletons split independently."""
    from changedatacapture_reporting_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from changedatacapture_reporting_spark.operators.sampling import (
        leakage_safe_splits,
    )
    from changedatacapture_reporting_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", None, n=3, threshold=0.5)
    out = leakage_safe_splits(d, pairs, {"train": 0.8, "val": 0.1, "test": 0.1})
    split_of = {r.doc_id: r.split for r in out.collect()}

    assert len(split_of) == d.count()  # total coverage, one row per doc
    crossers = [
        (r.doc_a, r.doc_b)
        for r in pairs.collect()
        if split_of[r.doc_a] != split_of[r.doc_b]
    ]
    assert crossers == []  # the leakage guarantee

    from collections import Counter

    sizes = Counter(split_of.values())
    assert set(sizes) == {"train", "val", "test"}
    assert sizes["train"] > sizes["val"] and sizes["train"] > sizes["test"]

    with pytest.raises(ValueError):
        leakage_safe_splits(d, pairs, {"all": 1.0})


def test_pps_sample_weighted_inclusion(spark):
    """Heavy rows are favored ∝ weight, certain-inclusion rows (k·w ≥ W)
    always survive, NULL/zero/negative weights never do, and the sample
    is stable under repartition (hash rule, no RNG)."""
    from changedatacapture_reporting_spark.operators.sampling import (
        pps_sample,
    )

    rows = [(i, 10) for i in range(500)] + [(1000, 100_000)] + [
        (2000, None), (2001, 0), (2002, -5),
    ]
    df = spark.createDataFrame(rows, "id long, w long")
    out = pps_sample(df, "w", 50, ["id"])
    got = {r.id for r in out.collect()}
    # W = 105000; k·w for the heavy row = 50·100000 ≥ W → certain
    assert 1000 in got
    assert got.isdisjoint({2000, 2001, 2002})
    # light rows keep with p = 50·10/105000 ≈ 0.48% → expect ~2-3 of 500
    n_light = len(got) - 1
    assert 0 <= n_light <= 20
    got2 = {r.id for r in pps_sample(df.repartition(7), "w", 50, ["id"]).collect()}
    assert got == got2

    with pytest.raises(ValueError):
        pps_sample(df, "w", 0, ["id"])


def test_pps_sample_matches_python_rule(spark):
    """Random integer weights: the kept-row set equals a pure-Python
    replication of the hex4(md5) < hex4((min(k*w, W)*65536) div W)
    rule — bit-for-bit, no tolerance."""
    import hashlib
    import random

    from changedatacapture_reporting_spark.operators.sampling import (
        pps_sample,
    )

    rng = random.Random(88)
    rows = [(i, rng.randint(1, 5000)) for i in range(800)]
    W = sum(w for _, w in rows)
    k = 60

    def keep(i, w):
        num = min(k * w, W) * 65536
        v = num // W
        if v >= 65536:
            return True
        return hashlib.md5(str(i).encode()).hexdigest()[:4] < format(v, "04x")

    want = {i for i, w in rows if keep(i, w)}
    df = spark.createDataFrame(rows, "id long, w long")
    got = {r.id for r in pps_sample(df, "w", k, ["id"]).collect()}
    assert got == want and 0 < len(got) < len(rows)


def test_rank_buckets_exact_and_partition_stable(spark):
    from changedatacapture_reporting_spark.operators.sampling import (
        rank_buckets,
    )

    # scores with heavy ties — rank must follow the (score, id) total
    # order exactly, buckets the floor(k*(rank-1)/n) formula
    rows = [(i, [5, 5, 5, 1, 1, 9, 3, 3, 3, 3][i]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, s long")
    got = {
        r.id: (r.rank, r.bucket)
        for r in rank_buckets(df, "s", "doc_id", k=4).collect()
    }
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    for rank0, (i, _) in enumerate(order):
        assert got[i] == (rank0 + 1, (rank0 * 4) // 10), i

    # physical-layout independence
    got2 = {
        r.id: (r.rank, r.bucket)
        for r in rank_buckets(
            df.repartition(7), "s", "doc_id", k=4
        ).collect()
    }
    assert got == got2

    # k > n: every row its own bucket prefix, buckets still in [0, k)
    wide = {
        r.id: r.bucket
        for r in rank_buckets(df, "s", "doc_id", k=100).collect()
    }
    assert sorted(wide.values()) == [i * 100 // 10 for i in range(10)]

    # k = 1: single bucket
    one = rank_buckets(df, "s", "doc_id", k=1).collect()
    assert {r.bucket for r in one} == {0}

    import pytest

    with pytest.raises(ValueError):
        rank_buckets(df, "s", "doc_id", k=0)
