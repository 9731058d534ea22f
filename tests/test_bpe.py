"""Distributed BPE trainer vs a pure-Python reference implementation:
the merge SEQUENCE (order, pairs, weighted counts) and the final symbol
vocabulary must match exactly — including lexicographic tie-breaks and
the greedy adjacent-merge semantics ('a a a' → 'aa a')."""

from __future__ import annotations

from collections import Counter

import pytest

from changedatacapture_reporting_spark.operators.bpe import (
    END_OF_WORD,
    bpe_train,
)


def _ref_bpe(texts, n_merges, min_pair_freq=2, lowercase=True):
    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w.lower() if lowercase else w] += 1
    hist = {
        tuple(list(w[:-1]) + [w[-1] + END_OF_WORD]): f
        for w, f in words.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in hist.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < min_pair_freq:
            break
        merges.append((a, b, n))
        new_hist = {}
        for syms, f in hist.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_hist[tuple(out)] = new_hist.get(tuple(out), 0) + f
        hist = new_hist
    vocab = Counter()
    for syms, f in hist.items():
        for s in syms:
            vocab[s] += f
    return merges, dict(vocab)


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    from changedatacapture_reporting_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(120)
    texts = [r.text for r in d.collect()]
    want_merges, want_vocab = _ref_bpe(texts, n_merges=25)

    merges, vocab = bpe_train(d, n_merges=25)
    assert merges == want_merges
    got_vocab = {r.symbol: r.freq for r in vocab.collect()}
    assert got_vocab == want_vocab
    # merges actually build multi-char units ending in the EOW marker
    assert any(len(a + b) > 3 for a, b, _ in merges)
    assert any((a + b).endswith(END_OF_WORD) for a, b, _ in merges)


def test_bpe_greedy_and_ties(spark):
    """'a a a' merges greedily left-to-right; ties break
    lexicographically; early stop below min_pair_freq."""
    df = spark.createDataFrame(
        [("aaa aaa zz zz",)], "text string"
    )
    want_merges, want_vocab = _ref_bpe(["aaa aaa zz zz"], n_merges=10)
    merges, vocab = bpe_train(df, n_merges=10)
    assert merges == want_merges
    assert {r.symbol: r.freq for r in vocab.collect()} == want_vocab

    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def test_bpe_batched_rounds(spark, sf_dir):
    """merges_per_round > 1: still produces valid disjoint merge sets,
    the FIRST merge of every round equals strict BPE's next pick, and
    the batched run covers the strict merge set on this corpus (the
    schedule may reorder); M=1 path unchanged."""
    from changedatacapture_reporting_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(120)
    strict, _ = bpe_train(d, n_merges=12)
    batched, vocab = bpe_train(d, n_merges=12, merges_per_round=4)
    assert len(batched) == 12
    # per-round disjointness: no symbol reused inside a window of 4
    for i in range(0, 12, 4):
        seen = set()
        for a, b, _ in batched[i : i + 4]:
            assert a not in seen and b not in seen
            seen.update((a, b, a + b))
    # round leaders match strict order's leaders
    assert batched[0] == strict[0]
    assert vocab.count() > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_train(d, n_merges=5, merges_per_round=0)


def _ref_encode(text, merges, lowercase=True):
    """Per-doc (n_words, n_bpe_units) with the trained merges applied
    greedily left-to-right in rank order — mirrors bpe_encode."""
    words = [
        (w.lower() if lowercase else w) for w in text.split() if w
    ]
    n_units = 0
    for w in words:
        syms = list(w[:-1]) + [w[-1] + END_OF_WORD]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n_units += len(syms)
    return len(words), n_units


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Serving path: encode with the merges trained on the same corpus;
    per-doc word and unit counts must equal the pure-Python reference,
    and zero-word docs must be absent."""
    from changedatacapture_reporting_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "low lower lowest low"),
            (3, "   "),  # zero words -> absent from output
            (4, "newer newest new er"),
            (5, "the the the"),
        ],
        "doc_id long, text string",
    )
    merges_full, _ = _ref_bpe(
        [r.text for r in docs.collect()], n_merges=12, min_pair_freq=2
    )
    merges = [(a, b) for a, b, _ in merges_full]
    got = {
        r.doc_id: (r.n_words, r.n_bpe_units)
        for r in bpe_encode(docs, merges, checkpoint_every=5).collect()
    }
    assert 3 not in got
    for r in docs.collect():
        if r.doc_id == 3:
            continue
        assert got[r.doc_id] == _ref_encode(r.text, merges), r.doc_id

    # zero merges: unit count is character count + end-of-word fusion
    raw = {
        r.doc_id: r.n_bpe_units
        for r in bpe_encode(docs, []).collect()
    }
    assert raw[5] == 3 * 3  # "the" -> t, h, e</w>


@pytest.mark.soak  # heaviest property test - pre-commit gate only
def test_bpe_distributed_path_bit_identical(spark, sf_dir):
    """VERDICT r09 item 1: the distributed incremental pair-delta loop
    (driver_vocab_limit=0) and the in-memory incremental loop produce
    bit-identical merge sequences and vocabularies — both matching the
    naive full-recount reference."""
    from changedatacapture_reporting_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(120)
    texts = [r.text for r in d.collect()]
    want_merges, want_vocab = _ref_bpe(texts, n_merges=15)

    fast_merges, fast_vocab = bpe_train(d, n_merges=15)
    dist_merges, dist_vocab = bpe_train(d, n_merges=15, driver_vocab_limit=0)
    assert fast_merges == want_merges
    assert dist_merges == want_merges
    assert {r.symbol: r.freq for r in fast_vocab.collect()} == want_vocab
    assert {r.symbol: r.freq for r in dist_vocab.collect()} == want_vocab

    # batched variant too: the candidate-window + disjointness schedule
    # must agree between the two paths
    fb, _ = bpe_train(d, n_merges=12, merges_per_round=4)
    db, _ = bpe_train(
        d, n_merges=12, merges_per_round=4, driver_vocab_limit=0
    )
    assert fb == db
