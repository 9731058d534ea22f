"""LM-surprisal scoring (operators/lm.py) — semantics and edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.lm import (
    lm_counts,
    lm_surprisal_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_self_scoring_counts_exact(spark):
    # corpus: "a b" appears 3x (docs 1,2,2), "b c" 1x, "c a" 1x
    d = _docs(
        spark,
        [(1, "a b"), (2, "a b a b c"), (3, "c a")],
    )
    out = {
        r["doc_id"]: r
        for r in lm_surprisal_scores(d, rare_threshold=1).collect()
    }
    # doc 2 bigrams: (a b), (b a), (a b), (b c) -> counts 3,1,3,1
    assert out[2]["n_tokens"] == 5
    assert out[2]["n_bigrams"] == 4
    assert out[2]["sum_bigram_freq"] == 3 + 1 + 3 + 1
    assert out[2]["n_hapax_bigrams"] == 2  # (b a), (b c)
    assert out[2]["n_rare_bigrams"] == 2  # threshold 1 == hapax here
    assert out[1]["n_bigrams"] == 1 and out[1]["sum_bigram_freq"] == 3
    assert out[3]["n_hapax_bigrams"] == 1


def test_short_and_empty_docs_zero_filled(spark):
    d = _docs(spark, [(1, "solo"), (2, ""), (3, "  "), (4, "x y")])
    out = {r["doc_id"]: r for r in lm_surprisal_scores(d).collect()}
    assert len(out) == 4  # every input doc present
    for doc in (1, 2, 3):
        assert out[doc]["n_bigrams"] == 0
        assert out[doc]["sum_bigram_freq"] == 0
        assert out[doc]["flagged"] is False
        assert out[doc]["avg_logprob"] is None
    assert out[1]["n_tokens"] == 1
    assert out[2]["n_tokens"] == 0 and out[3]["n_tokens"] == 0
    assert out[4]["n_bigrams"] == 1


def test_avg_logprob_add_one_exact(spark):
    # single-doc corpus "a b b": bigrams (a b), (b b); V = {a, b}
    # c(a b)=1, c(b b)=1, c(a)=1, c(b)=2
    d = _docs(spark, [(1, "a b b")])
    row = lm_surprisal_scores(d).collect()[0]
    expect = (
        math.log((1 + 1) / (1 + 2)) + math.log((1 + 1) / (2 + 2))
    ) / 2.0
    assert abs(row["avg_logprob"] - expect) < 1e-12
    assert abs(row["ppl_proxy"] - math.exp(-expect)) < 1e-12


def test_external_reference_and_unseen_bigrams(spark):
    ref = _docs(spark, [(10, "the cat sat"), (11, "the cat ran")])
    batch = _docs(spark, [(1, "the cat sat"), (2, "purple monkey dishwasher")])
    out = {
        r["doc_id"]: r
        for r in lm_surprisal_scores(
            batch, reference=ref, flag_rare_fraction=0.5
        ).collect()
    }
    # doc 1: (the cat) c=2, (cat sat) c=1
    assert out[1]["sum_bigram_freq"] == 3
    assert out[1]["n_hapax_bigrams"] == 1
    # doc 2: both bigrams unseen in ref -> freq 0, rare, flagged
    assert out[2]["sum_bigram_freq"] == 0
    assert out[2]["n_hapax_bigrams"] == 0
    assert out[2]["n_rare_bigrams"] == 2
    assert out[2]["flagged"] is True
    # unseen bigram logprob = log(1 / (0 + V)), V = 4 ref unigrams
    # ({the, cat, sat, ran})
    expect = math.log(1.0 / 4.0)
    assert abs(out[2]["avg_logprob"] - expect) < 1e-12


def test_persisted_counts_path_identical(spark, tmp_path):
    d = _docs(
        spark,
        [(i, f"w{i % 3} common common w{i % 5} tail") for i in range(40)],
    )
    bg, uni = lm_counts(d)
    bg.write.parquet(str(tmp_path / "bg"))
    uni.write.parquet(str(tmp_path / "uni"))
    counts = (
        spark.read.parquet(str(tmp_path / "bg")),
        spark.read.parquet(str(tmp_path / "uni")),
    )
    cols = ["doc_id", "n_bigrams", "sum_bigram_freq", "n_rare_bigrams"]
    live = sorted(
        lm_surprisal_scores(d).select(cols).collect()
    )
    steady = sorted(
        lm_surprisal_scores(d, counts=counts).select(cols).collect()
    )
    assert live == steady


def test_flag_fraction_boundary(spark):
    # 4 bigrams, 1 rare -> 1 > 0.25*4 is FALSE (strict inequality)
    d = _docs(spark, [(1, "a b a b a b a c")])
    # bigrams: ab,ba,ab,ba,ab,ba,ac -> 7 bigrams; rare(<=3): ba appears 3 (<=3), ac 1
    row = lm_surprisal_scores(d, rare_threshold=1).collect()[0]
    assert row["n_bigrams"] == 7
    assert row["n_rare_bigrams"] == 1  # only (a c)
    assert row["flagged"] is False  # 1 > 1.75 is false


def test_merge_counts_equals_full_train(spark):
    from changedatacapture_reporting_spark.operators.lm import lm_merge_counts

    half_a = _docs(spark, [(i, f"a b c w{i}") for i in range(10)])
    half_b = _docs(spark, [(i + 10, f"b c d w{i}") for i in range(10)])
    full = half_a.unionByName(half_b)
    merged = lm_merge_counts(lm_counts(half_a), lm_counts(half_b))
    direct = lm_counts(full)
    for m, d in zip(merged, direct):
        assert sorted(map(tuple, m.collect())) == sorted(
            map(tuple, d.collect())
        )
    # and scoring through the merged model == self-scoring the full corpus
    cols = ["doc_id", "sum_bigram_freq", "n_rare_bigrams"]
    via_merged = sorted(
        lm_surprisal_scores(full, counts=merged).select(cols).collect()
    )
    via_full = sorted(lm_surprisal_scores(full).select(cols).collect())
    assert via_merged == via_full


def test_null_text_zero_filled_like_empty(spark):
    """NULL text must behave exactly like '' (ADVICE r10): without the
    coalesce in _clean_tokens, F.size(split(NULL)) is the legacy
    sizeOfNull -1 and n_tokens came back -1 instead of 0."""
    d = _docs(spark, [(1, None), (2, ""), (3, "x y")])
    out = {r["doc_id"]: r for r in lm_surprisal_scores(d).collect()}
    assert len(out) == 3
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    assert out[1]["n_bigrams"] == 0 and out[1]["avg_logprob"] is None
    assert out[1]["flagged"] is False
    assert out[3]["n_bigrams"] == 1
