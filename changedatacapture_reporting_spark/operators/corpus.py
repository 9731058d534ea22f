"""End-to-end training-corpus preparation — the composition the LLM-data
mandate exists for (SURVEY.md §2.13): quality filtering, near-duplicate
removal and context-window sequence packing as single operators over the
``documents`` table.

Not in the reference (a CDC reporting engine stops at the changelog);
this is the downstream consumer a 100 TB deployment actually feeds.

Scale posture:

- :func:`prepare_corpus` — quality signals are pure codegen'd column
  expressions (one scan); near-dup detection is MinHash-LSH banding
  (candidates ∝ true collisions, never n²) + exact-Jaccard verification;
  canonicalization is the pointer-jumping connected-components operator
  (:func:`..dedup.neardup_clusters`, O(log n) rounds). No step is
  quadratic, no step collects to the driver.
- :func:`pack_sequences` — a global greedy packing is inherently
  sequential, so packing is SHARDED: documents hash to ``n_shards``
  independent streams, each packed by a per-shard window cumsum (shuffle
  by shard, sort within — Spark's window machinery, fully parallel
  across shards). Choose ``n_shards`` ≈ cluster cores at scale; packs
  never cross shards, which is exactly how multi-worker training data
  loaders shard anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.functions.text import (
    quality_columns,
    tokens,
)
from changedatacapture_reporting_spark.operators.dedup import (
    minhash_lsh_pairs,
    neardup_clusters,
)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 80,
    min_alpha_ratio: float = 0.8,
    min_stopword_ratio: float = 0.02,
    lang_col: str = "lang",
) -> DataFrame:
    """Gopher-style heuristic quality gate: token-count band, alphabetic
    ratio, and (for English only — the stopword list is English) a
    minimum stopword ratio. Appends the signal columns and keeps passing
    rows; pure built-in expressions, single scan."""
    q = quality_columns(text_col)
    scored = df.withColumns(
        {
            "n_tokens": q["n_tokens"],
            "alpha_ratio": q["alpha_ratio"],
            "stopword_ratio": q["stopword_ratio"],
        }
    )
    keep = (
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (
            (F.col(lang_col) != "en")
            | (F.col("stopword_ratio") >= min_stopword_ratio)
        )
    )
    return scored.filter(keep)


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 80,
    min_alpha_ratio: float = 0.8,
    min_stopword_ratio: float = 0.02,
    neardup_threshold: float = 0.8,
) -> DataFrame:
    """The standard pre-training data pipeline as ONE operator:
    quality-filter → MinHash-LSH near-dup clusters (exact-verified) →
    keep the canonical head (min id) of every cluster.

    Returns the surviving documents with their quality signals and
    ``n_neardups`` (cluster size − 1; 0 for unique docs). Deterministic
    end-to-end, so the whole pipeline is oracle-checkable (the DuckDB
    replay uses exact all-pairs Jaccard + a recursive-CTE component
    search — quadratic, oracle-only; THIS path is the scale path)."""
    kept = quality_filter(
        df,
        text_col,
        min_tokens,
        max_tokens,
        min_alpha_ratio,
        min_stopword_ratio,
    )
    pairs = minhash_lsh_pairs(
        kept, text_col, id_col, threshold=neardup_threshold
    )
    clusters = neardup_clusters(pairs)  # (member_id, cluster_id)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("_cluster_n")
    )
    heads = (
        clusters.filter(F.col("member_id") == F.col("cluster_id"))
        .join(sizes, "cluster_id")
        .select(
            F.col("member_id").alias(id_col),
            (F.col("_cluster_n") - 1).alias("n_neardups"),
        )
    )
    members = clusters.filter(
        F.col("member_id") != F.col("cluster_id")
    ).select(F.col("member_id").alias(id_col))
    return (
        kept.join(members, id_col, "left_anti")
        .join(heads, id_col, "left")
        .fillna(0, ["n_neardups"])
    )


def pack_sequences(
    df: DataFrame,
    max_pack_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    token_count: Column | None = None,
) -> DataFrame:
    """Deterministic sharded sequence packing: concatenate documents (in
    id order within each shard) into packs of ~``max_pack_tokens``
    whitespace tokens — a document belongs to the pack its STARTING
    token offset falls in, the chunked-concat scheme streaming loaders
    use. Shard = ``id mod n_shards`` so the assignment is reproducible
    across engines and runs.

    Returns one row per document: (shard, pack_id, doc, n_tokens,
    token_offset). Aggregate per (shard, pack_id) for pack manifests.
    Per-shard window cumsum — shuffles once on shard, no global sort."""
    n_tok = (
        token_count if token_count is not None else F.size(tokens(text_col))
    ).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(w)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("token_offset"),
        F.floor((cum - F.col("n_tokens")) / max_pack_tokens)
        .cast("long")
        .alias("pack_id"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking with overlap — the step between a
    cleaned corpus and sequence packing when documents exceed the model
    context. Expression-only (split → sequence of starts → posexplode →
    slice): no Python in the row path, one generator, no shuffle at all —
    chunking is embarrassingly parallel and stays inside whole-stage
    codegen.

    Output: (id, chunk_id, n_tokens, chunk_text); chunk_id is 0-based in
    document order, consecutive chunks share ``overlap`` tokens.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    # Generate start s only while the PREVIOUS chunk did not already
    # reach the document end (s - stride + chunk_tokens < size, i.e.
    # s < size - overlap): otherwise the tail start yields a chunk fully
    # contained in its predecessor (e.g. 25 tokens, chunk 16, stride 12
    # → a 1-token chunk duplicating covered text).
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(piece).cast("long").alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def chunk_exact_dedup(
    chunks: DataFrame,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Exact SUB-document dedup — the pass between chunking and packing
    that removes repeated spans (licence headers, navigation boilerplate,
    quoted reposts) which survive document-level dedup because the HOST
    documents differ. Key = md5 of the chunk text (chunk_documents
    already whitespace-normalizes); keeper = lexicographically smallest
    (doc, chunk_id) occurrence, so the decision is deterministic and
    layout-independent.

    ONE shuffle: keeper and multiplicity come from per-key window
    aggregates (partitioned on the hash key — group sizes are duplicate
    multiplicities, never corpus-sized), not a groupBy + join-back,
    which would shuffle the chunk set twice. Output is one row per
    input chunk: (doc, chunk_id, chunk_key, is_kept, keeper_doc,
    keeper_chunk_id, n_copies); ``filter(is_kept)`` feeds the packer.
    """
    key = F.md5(F.col(text_col))
    w = Window.partitionBy("chunk_key")
    keeper = F.min(F.struct(F.col(id_col), F.col(chunk_id_col))).over(w)
    return (
        chunks.select(
            F.col(id_col), F.col(chunk_id_col), key.alias("chunk_key")
        )
        .select(
            id_col,
            chunk_id_col,
            "chunk_key",
            keeper.alias("_keeper"),
            F.count("*").over(w).alias("n_copies"),
        )
        .select(
            id_col,
            chunk_id_col,
            "chunk_key",
            (
                (F.col(id_col) == F.col(f"_keeper.{id_col}"))
                & (F.col(chunk_id_col) == F.col(f"_keeper.{chunk_id_col}"))
            ).alias("is_kept"),
            F.col(f"_keeper.{id_col}").alias("keeper_doc_id"),
            F.col(f"_keeper.{chunk_id_col}").alias("keeper_chunk_id"),
            "n_copies",
        )
    )


def ngram_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    top_k: int = 1000,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-level n-gram vocabulary statistics — the input a tokenizer
    training run (BPE/unigram) or a stopword/boilerplate analysis starts
    from: the ``top_k`` n-grams by total occurrences, with document
    frequency alongside.

    Output: (ngram, n_occurrences, n_docs), ordered by
    (n_occurrences DESC, ngram) — the tie-break makes the cut
    deterministic, so two runs (or two engines) pick the same top-k.

    Scale posture: explode n-grams once; ``count + approx-free distinct
    doc count`` come from ONE (ngram, doc) pre-aggregation (map-side
    combine collapses within-document repeats first, which is where the
    volume is) followed by one ngram-level aggregation; the top-k is a
    TakeOrdered (per-partition heaps + merge), never a global sort of
    the vocabulary.
    """
    from changedatacapture_reporting_spark.functions.text import tokens

    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    t = tokens(c)
    if n > 1:
        # positional n-grams (with repeats — occurrence counts need them;
        # functions.text.shingles dedups, which is right for Jaccard but
        # wrong here)
        acc = t
        for i in range(1, n):
            shifted = F.slice(t, i + 1, F.greatest(F.size(t) - i, F.lit(0)))
            acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
        grams = F.slice(
            acc, 1, F.greatest(F.size(t) - (n - 1), F.lit(0))
        )
    else:
        grams = t
    per_doc = (
        df.select(F.col(id_col).alias("_doc"), F.explode(grams).alias("ngram"))
        .filter(F.col("ngram") != "")
        .groupBy("ngram", "_doc")
        .agg(F.count("*").alias("_n"))
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("_n").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(top_k)
    )


def token_frequency_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: int = 3,
    lowercase: bool = True,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Unigram-LM-style document scoring against CORPUS statistics — the
    second family of quality signal a pretraining pipeline runs after the
    per-document heuristics (functions.text.quality_columns): how typical
    is each document's vocabulary of the corpus it sits in? Documents
    dominated by singleton/rare tokens are OCR garbage, hex dumps, or
    boilerplate IDs; documents of only ultra-common tokens are low-content
    filler. Both tails get filtered or downweighted before training.

    Two aggregations over one tokenization:

    1. vocab: corpus-wide token → occurrence count;
    2. per-doc fold of each token's corpus frequency.

    Scores are kept RATIONAL on purpose (no log/exp): sums of exact
    int64 counts and a single final division are bit-identical across
    engines, so the whole output is oracle-hashable — a log-space
    perplexity differs in last-ulp between libm implementations and
    would turn the contract into an approximate one.

    Scale posture: the token explode feeds a (doc, token) pre-aggregation
    (map-side combine absorbs within-doc repeats — the volume — before
    any shuffle); the vocab is Zipf-shaped and orders of magnitude
    smaller than the corpus, so ``broadcast_vocab=True`` (default) makes
    the frequency lookup a broadcast hash join and the only remaining
    shuffle is the per-doc re-aggregation. Set it False when the vocab
    genuinely exceeds executor memory (web-scale garbage tokens) — the
    join falls back to a shuffle on the token with AQE skew handling.

    Output: one row per document — (id, n_tokens, n_rare_tokens,
    min_token_freq, mean_token_freq). Documents with no tokens (empty /
    whitespace text) emit n_tokens = 0 and NULL frequency stats.
    """
    from changedatacapture_reporting_spark.functions.text import tokens

    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = df.select(F.col(id_col).alias("_doc"), F.explode(tokens(c)).alias("tok")).filter(
        F.col("tok") != ""
    )
    per_doc_tok = toks.groupBy("_doc", "tok").agg(F.count("*").alias("_c"))
    vocab = per_doc_tok.groupBy("tok").agg(
        F.sum("_c").cast("long").alias("_freq")
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = (
        per_doc_tok.join(vocab, "tok")
        .groupBy("_doc")
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_freq") < rare_threshold, F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_rare_tokens"),
            F.min("_freq").alias("min_token_freq"),
            (
                F.sum(F.col("_c") * F.col("_freq")).cast("double")
                / F.sum("_c")
            ).alias("mean_token_freq"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored.withColumnRenamed("_doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            "n_rare_tokens",
            "min_token_freq",
            "mean_token_freq",
        )
    )


def pack_sequences_bfd(
    df: DataFrame,
    max_pack_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    token_count: Column | None = None,
) -> DataFrame:
    """NO-SPLIT sequence packing, best-fit-decreasing: every document
    lands whole in exactly one pack of capacity ``max_pack_tokens`` —
    the packing used when a training sequence must not cross document
    boundaries and padding waste is the cost to minimize. (The
    chunked-concat scheme above lets documents straddle packs; this one
    trades a harder assignment for self-contained packs.)

    Per shard (same reproducible ``id mod n_shards`` sharding): sort by
    (n_tokens DESC, id) and place each document into the open pack with
    the LEAST remaining capacity that still fits, else open a new pack —
    classic BFD, ≤ 11/9·OPT + 1 packs. A document longer than the cap
    gets its own (oversized) pack rather than failing the batch.

    The assignment is inherently sequential per shard, so this is one of
    the few deliberate Python paths: ``applyInPandas`` over shards,
    shipping ONLY (id, n_tokens) metadata per Arrow batch — bytes per
    document, never text. Deterministic: pure function of the (id,
    n_tokens) multiset.

    Returns one row per document: (id, shard, n_tokens, pack_id).
    """
    import bisect

    import pandas as pd

    n_tok = (
        token_count if token_count is not None else F.size(tokens(text_col))
    ).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    meta = df.select(
        F.col(id_col).alias("id"), shard.alias("shard"), n_tok.alias("n_tokens")
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []   # sorted remaining capacities
        pack_of: list[int] = []     # pack id parallel to `remaining`
        next_pack = 0
        assigned = []
        for n in pdf["n_tokens"].to_list():
            if n > max_pack_tokens:
                assigned.append(next_pack)  # oversized: own pack, never reused
                next_pack += 1
                continue
            i = bisect.bisect_left(remaining, n)
            if i < len(remaining):
                pid = pack_of.pop(i)
                rem = remaining.pop(i) - n
            else:
                pid = next_pack
                next_pack += 1
                rem = max_pack_tokens - n
            j = bisect.bisect_left(remaining, rem)
            remaining.insert(j, rem)
            pack_of.insert(j, pid)
            assigned.append(pid)
        pdf["pack_id"] = pd.Series(assigned, dtype="int64")
        return pdf

    return meta.groupBy("shard").applyInPandas(
        _pack, "id long, shard int, n_tokens long, pack_id long"
    ).withColumnRenamed("id", id_col)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document top-k characteristic terms by BM25-style tf-idf —
    the keyword/topic signal a corpus pipeline derives for clustering,
    domain tagging, and mixture labeling.

    The score is kept RATIONAL (the token_frequency_scores policy): the
    BM25 idf (N - df + ½)/(df + ½) is doubled into integers, so
    ``score = tf · (2(N−df)+1) / (2·df+1)`` is carried as an exact
    int64 numerator/denominator pair. Ranking happens on the single
    IEEE-exact division (one rounding, bit-identical across engines,
    ties broken by term) — the whole output stays oracle-hashable where
    a log-idf would differ in last-ulp between libm implementations.

    Scale posture: tokenization explodes into ONE (doc, token)
    aggregation (map-side combine absorbs within-doc repeats before the
    shuffle); document frequency comes from a window count over that
    same aggregate — NOT a self-join, which would re-run the tokenize
    subtree a second time over the whole corpus; the corpus document
    count rides in as a broadcast 1-row frame (no driver collect, and
    its scan prunes to the id column); the final top-k is one per-doc
    window. Net: the heavy explode is evaluated once, then two
    re-shuffles (term, doc) of the much smaller (doc, term, tf) frame.

    Output: (id, term, tf, df, score_num, score_den, rank), rank 1..k
    per document by score desc, term asc.
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = df.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(c)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_doc", "term").agg(F.count("*").alias("tf"))
    dfreq = F.count("*").over(Window.partitionBy("term"))
    # one-row corpus count broadcast-crossJoined (the q11 scalar shape:
    # no equi key exists for a global scalar; O(n x 1) at any scale)
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("_n_docs"))
    scored = (
        tf.withColumn("df", dfreq.cast("long"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("_doc").alias(id_col),
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (2 * (F.col("_n_docs") - F.col("df")) + 1)
            ).cast("long").alias("score_num"),
            (2 * F.col("df") + 1).cast("long").alias("score_den"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        (F.col("score_num").cast("double") / F.col("score_den")).desc(),
        F.col("term").asc(),
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def boilerplate_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Corpus-boilerplate fraction per document — the RefinedWeb/CCNet
    quality signal "how much of this document is phrasing that recurs
    across the corpus" (navigation chrome, license headers, templated
    spans): the share of a document's DISTINCT n-gram shingles whose
    corpus document-frequency is ≥ ``min_df``. High fraction → templated
    page; filter or down-weight before training.

    Output: (id, n_shingles, n_boiler, boiler_frac). Two hash
    aggregations + ONE broadcast join: the df aggregation reuses the
    per-doc-distinct shingle explode (map-side combine collapses
    within-partition repeats), and the "boilerplate" shingle set is
    df-FILTERED before joining back — its size is bounded by
    total_shingle_instances / min_df, which is what makes the broadcast
    safe at corpus scale where the full vocabulary is not. With
    ``hashed=True`` (production) shingles travel as xxhash64 keys —
    8 bytes through both shuffles instead of strings; ``hashed=False``
    keeps raw strings so an external oracle replays exactly
    (test_llm_ops proves the two select identical documents). Documents
    shorter than ``n`` tokens have no shingles and are ABSENT from the
    output — left-join back against the corpus if every id must appear.
    """
    from changedatacapture_reporting_spark.functions.text import shingles

    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    ).filter(F.col("g") != "")
    key = F.xxhash64("g") if hashed else F.col("g")
    per = sh.select("_id", key.alias("k"))
    # shingles() is distinct-per-document, so count == document frequency
    boiler = (
        per.groupBy("k")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("k", F.lit(1).alias("_b"))
    )
    flagged = per.join(F.broadcast(boiler), "k", "left")
    return flagged.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.count("_b").cast("long").alias("n_boiler"),
        (F.count("_b") / F.count("*")).alias("boiler_frac"),
    ).select(
        F.col("_id").alias(id_col), "n_shingles", "n_boiler", "boiler_frac"
    )


def corpus_datasheet(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The dataset card a corpus PUBLISHES — headline facts in one tiny
    long-form frame (metric, value): document/word/char volume, language
    spread, exact-duplicate load. All-integer values (engine-exact, no
    doubles); ratios derive downstream. Three aggregation passes, each
    map-side-combinable (volume aggregates; per-language counts to
    language scale; per-fingerprint counts to distinct-text scale),
    folded through one-row scalar broadcasts and melted with stack —
    output is ~7 rows at ANY corpus size.
    """
    from changedatacapture_reporting_spark.functions.text import (
        fingerprint_md5,
        tokens,
    )

    t = F.col(text_col)
    vol = df.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.sum(F.size(tokens(t))).cast("long").alias("n_words"),
        F.sum(F.length(t)).cast("long").alias("n_chars"),
    )
    lang_max = (
        df.groupBy(lang_col)
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("max_lang_docs"))
    )
    dup = (
        df.groupBy(fingerprint_md5(t).alias("fp"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_dup_docs"),
            F.count("*").alias("n_dup_groups"),
        )
    )
    one = vol.crossJoin(F.broadcast(lang_max)).crossJoin(F.broadcast(dup))
    metrics = [
        "n_docs", "n_langs", "n_words", "n_chars",
        "max_lang_docs", "n_dup_docs", "n_dup_groups",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return one.select(
        F.expr(f"stack({len(metrics)}, {stack}) as (metric, value)")
    )
