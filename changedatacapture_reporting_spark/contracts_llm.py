"""LLM-data-pipeline contract queries (BASELINE.json north-star surface):
dedup, similarity search, text analysis, multimodal columns.

Oracle-matched where SQL-expressible (MD5 fingerprints, shingle Jaccard,
decimal-exact dot products, byte metadata). Hash-seeded operators
(MinHash-LSH, SimHash, hyperplane LSH) can't be replayed in DuckDB —
xxhash64 isn't portable — so they are rows-only here and verified against
their exact counterparts in tests/test_llm_ops.py (LSH vs brute force,
MinHash vs exact Jaccard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.functions.text import (
    fingerprint_md5,
    langid_scores,
    quality_columns,
    rolling_fingerprints,
    tokens,
    word_tokens,
)
from changedatacapture_reporting_spark.operators.dedup import (
    benchmark_overlap,
    embedding_neardup_bucketed,
    neardup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from changedatacapture_reporting_spark.operators.multimodal import (
    attach_blob,
    extract_features,
)
from changedatacapture_reporting_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from changedatacapture_reporting_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.size(word_tokens("text")).cast("long").alias("n_word_tokens"),
        F.size(F.array_distinct(tokens("text")))
        .cast("long")
        .alias("n_unique_tokens"),
    )


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS n_word_tokens,
       len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_unique_tokens
FROM documents
"""


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = quality_columns("text")
    return d.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
    )


SQL_QUALITY = r"""
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         / length(text) AS alpha_ratio,
       CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                t -> lower(t) IN ('the','a','an','of','and','to','in','is','it','on','for'))) AS DOUBLE)
         / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio
FROM documents
"""


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document + rolling (winnowing-style) fingerprints — both pure
    MD5, so engine-portable."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint_md5("text").alias("doc_fp"),
        F.size(F.array_distinct(rolling_fingerprints("text", 8))).alias(
            "n_rolling_fps"
        ),
    )


SQL_FINGERPRINTS = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS doc_fp,
       CASE WHEN len(string_split_regex(trim(text), '\s+')) < 8 THEN 0
            ELSE len(list_distinct(list_transform(
                   range(1, len(string_split_regex(trim(text), '\s+')) - 6),
                   i -> md5(array_to_string(string_split_regex(trim(text), '\s+')[i:i+7], ' ')))))
       END AS n_rolling_fps
FROM documents
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang × predicted lang."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", langid_scores("text").alias("pred"))
        .groupBy("lang", F.col("pred.lang").alias("lang_pred"))
        .agg(F.count("*").alias("n_docs"))
    )


# mirrors langid_scores: per-language marker coverage, argmax with the same
# (score, lang-string) tie-break; no CJK in fixtures so the zh branch is
# the same constant-false in both engines
SQL_LANGID = r"""
WITH toks AS (
  SELECT lang, string_split_regex(trim(text), '\s+') AS t,
         greatest(len(string_split_regex(trim(text), '\s+')), 1) AS n
  FROM documents
),
scores AS (
  SELECT lang,
    CAST(len(list_filter(t, w -> lower(w) IN ('the','and','of','to','is','with','that'))) AS DOUBLE) / n AS s_en,
    CAST(len(list_filter(t, w -> lower(w) IN ('el','la','de','que','los','una','por'))) AS DOUBLE) / n AS s_es,
    CAST(len(list_filter(t, w -> lower(w) IN ('le','la','les','des','est','une','dans'))) AS DOUBLE) / n AS s_fr,
    CAST(len(list_filter(t, w -> lower(w) IN ('der','die','das','und','ist','nicht','mit'))) AS DOUBLE) / n AS s_de
  FROM toks
)
SELECT lang,
       CASE greatest(s_en, s_es, s_fr, s_de)
            WHEN s_fr THEN 'fr' WHEN s_es THEN 'es'
            WHEN s_en THEN 'en' ELSE 'de' END AS lang_pred,
       COUNT(*) AS n_docs
FROM scores
GROUP BY 1, 2
"""


def text_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency analytics: top-5 non-stopword terms per language
    (explode → count → windowed top-k, the classic text-aggregation
    shape)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    stop = list(
        ("the", "a", "an", "of", "and", "to", "in", "is", "it", "on", "for")
    )
    terms = d.select(
        "lang", F.explode(tokens("text")).alias("term")
    ).filter(~F.lower(F.col("term")).isin(*stop))
    counts = terms.groupBy("lang", "term").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


SQL_TOP_TERMS = r"""
WITH terms AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
counts AS (
  SELECT lang, term, COUNT(*) AS n
  FROM terms
  WHERE lower(term) NOT IN ('the','a','an','of','and','to','in','is','it','on','for')
  GROUP BY lang, term
)
SELECT lang, term, n, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term ASC) AS rank
      FROM counts)
WHERE rank <= 5
"""


def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregate: per-label mean embedding, long form
    (label, dim, centroid component). posexplode → groupBy — the fully
    distributed array-column aggregation; decimal-exact so the mean is
    engine-identical.

    Grid scale is 1e-6, not finer: Spark rounds double→decimal via the
    double's shortest string (can land ON a tie for float32-origin values
    at a 1e-10 grid) while DuckDB rounds the binary value — no IEEE double
    under 10^4 sits exactly on a 1e-6 tie, so both engines agree there."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(16,6)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
    )


SQL_CENTROIDS = """
WITH comps AS (
  SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
)
SELECT label, dim,
       CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*) AS centroid,
       COUNT(*) AS n_vectors
FROM comps
GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups keyed on (lang, n_chars) — deterministic keeper
    (min doc_id) + multiplicity."""
    d = load_table(spark, sf_dir, "documents")
    key = F.concat_ws(":", F.col("lang"), F.col("n_chars").cast("string"))
    return exact_dedup(d, key, "doc_id").withColumnRenamed(
        "keeper_id", "keeper_doc_id"
    )


SQL_DEDUP_EXACT = """
SELECT lang || ':' || CAST(n_chars AS VARCHAR) AS dedup_key,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram-shingle Jaccard near-dups (threshold 0.8,
    lang-blocked). O(n²)-per-block verification path for MinHash-LSH."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", "lang", n=3, threshold=0.8)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


SQL_NGRAM_JACCARD = r"""
WITH sh AS (
  SELECT doc_id, lang,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (canonical keeper per
    transitive group). Oracle replays the same jaccard-0.5 pair graph
    through a recursive CTE."""
    from changedatacapture_reporting_spark.operators.dedup import neardup_clusters

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", None, n=3, threshold=0.5)
    return neardup_clusters(pairs)


SQL_CLUSTERS = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(node, root) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS member_id, MIN(root) AS cluster_id
FROM reach
GROUP BY node
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (32 hashes, 8 bands × 4) with exact
    Jaccard verification — the 100 TB dedup path. The xxhash64 seeds
    aren't replayable in DuckDB, but the VERIFIED output is: candidates
    are re-checked with exact shingle Jaccard, so the final pair set
    equals the exact all-pairs jaccard-0.8 result whenever banding
    recall is 1 — which it deterministically is on this data (P[miss]
    ≤ 0.014 per pair at j=0.8; the pytest asserts it and the oracle
    below now hash-checks it pair-by-pair)."""
    d = load_table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(d, threshold=0.8)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


SQL_MINHASH_LSH = r"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash recall contract. Candidate membership (hamming ≤ 7 over
    xxhash64-derived 64-bit signatures) is engine-specific, so the
    hash-checked property is RECALL at pair granularity: every exact
    jaccard-0.8 near-dup pair must be recovered by the SimHash bands
    (``simhash_found`` true per pair; the oracle recomputes the exact
    pairs and expects true). The raw candidate list stays available via
    ``operators.dedup.simhash_pairs``."""
    d = load_table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(
        d, "text", "doc_id", None, n=3, threshold=0.8
    ).select("doc_a", "doc_b")
    sim = (
        simhash_pairs(d, "text", "doc_id", max_hamming=7)
        .select("doc_a", "doc_b")
        .withColumn("_hit", F.lit(1))
    )
    return (
        exact.join(sim, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a", "doc_b", F.col("_hit").isNotNull().alias("simhash_found")
        )
    )


SQL_SIMHASH = r"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, TRUE AS simhash_found
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
"""


def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: normalized dot ≥ 0.45, via the PRODUCTION
    LSH-bucketed path (48 hyperplane tables × 4 planes, candidates from a
    (table, bucket) equi-join, exact-cosine re-verify) — mirroring the
    minhash pattern. The all-pairs ``embedding_neardup_pairs`` remains the
    oracle tier; the DuckDB SQL below replays it, so this contract
    hash-checks that banding recall is exactly 1 on the fixture."""
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_bucketed(e, "embedding", "vec_id", threshold=0.45)


SQL_EMB_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 neighbors by decimal-grid dot product for the first 10
    vectors — the ANN baseline, bit-stable across engines."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = brute_force_topk(e, q, k=10, exact_decimal=True)
    # sim is decimal(38,12) — rank on it, but OUTPUT it as a string: both
    # engines render "0.123400000000" identically, while a decimal-typed
    # column normalizes differently across driver harnesses
    return out.select(
        "query_id", "neighbor_id", F.col("sim").cast("string").alias("sim"), "rank"
    )


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
dots AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         -- REAL must promote to DOUBLE before the decimal cast: DuckDB's
         -- direct REAL→DECIMAL scales in float precision and collapses
         -- onto .5 ties (rounded half-even), diverging from value-based
         -- rounding
         CAST(SUM(CAST(CAST(a.x AS DOUBLE) AS DECIMAL(10,6))
                  * CAST(CAST(b.x AS DOUBLE) AS DECIMAL(10,6))) AS DECIMAL(38,12)) AS sim
  FROM q, embeddings e,
       LATERAL (SELECT unnest(q.qe) AS x, generate_subscripts(q.qe, 1) AS i) a,
       LATERAL (SELECT unnest(e.embedding) AS x, generate_subscripts(e.embedding, 1) AS i) b
  WHERE a.i = b.i AND e.vec_id != q.qid
  GROUP BY q.qid, e.vec_id
)
SELECT query_id, neighbor_id, CAST(sim AS VARCHAR) AS sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM dots)
WHERE rank <= 10
"""


def _ann_recall_contract(
    spark: SparkSession, sf_dir: str, topk_fn, bound: float
) -> DataFrame:
    """Shared shape of the ANN accuracy contracts: the approximate
    result set is engine-specific (xxhash64 hyperplanes / k-means
    assignment order), so the hash-checked property is per-query
    recall@10 against the exact brute-force top-10 computed in the same
    query — the oracle lists the query ids and expects the bound to
    hold. Deterministic: both sides are seed-fixed, so the booleans are
    stable run-to-run."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(e, q, k=10, exact_decimal=True).select(
        "query_id", "neighbor_id"
    )
    approx = topk_fn(e, q, k=10).select(
        "query_id", F.col("neighbor_id").alias("approx_neighbor_id")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.approx_neighbor_id),
        "left",
    ).groupBy(exact.query_id.alias("query_id")).agg(
        (
            F.count(approx.approx_neighbor_id) / F.count(F.lit(1)) >= bound
        ).alias("recall_ok")
    )
    return hits


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN accuracy contract (16 deterministic k-means centroids,
    nprobe=4) — the cluster-pruned scale path. Emits per-query
    recall@10 ≥ 0.7 vs exact brute force (measured 0.8–1.0 on this
    data, deterministic); full approximate results stay available via
    ``operators.similarity.ivf_topk``."""
    from changedatacapture_reporting_spark.operators.similarity import ivf_topk

    return _ann_recall_contract(spark, sf_dir, ivf_topk, bound=0.7)


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN accuracy contract (8 tables × 8 planes) — the
    bucketed scale path. Emits per-query recall@10 ≥ 0.4 vs exact brute
    force (measured 0.4–1.0 on this data, deterministic); full
    approximate results stay available via
    ``operators.similarity.lsh_topk``."""
    return _ann_recall_contract(spark, sf_dir, lsh_topk, bound=0.4)


def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN accuracy contract (m=16 subspaces,
    32 codes → 16 bytes/vector instead of 256; ADC shortlist of 5k
    candidates, exact rerank of only those). Emits per-query recall@10
    ≥ 0.7 vs exact brute force (measured min 0.8 / avg 0.96 on this
    data, deterministic — seeded codebooks, distributed Lloyd). Full
    results via ``operators.similarity.pq_topk``; the encoded corpus
    (``pq_index``) is the billion-vector storage tier between int8
    (4×) and raw floats."""
    from changedatacapture_reporting_spark.operators.similarity import (
        pq_topk,
    )

    def _pq(corpus, queries, k):
        return pq_topk(
            corpus, queries, k=k, m=16, k_codes=32, rerank_factor=5
        )

    return _ann_recall_contract(spark, sf_dir, _pq, bound=0.7)


def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN accuracy contract (operators.similarity.
    ivfpq_topk): coarse pruning to 6 of 16 probed clusters × 16-byte PQ
    codes × exact rerank of a 3k shortlist — the multiplied savings of
    the billion-scale layout. Emits per-query recall@10 ≥ 0.7 vs exact
    brute force (measured min 0.8 / avg 0.87 on this data,
    deterministic — seeded centroids AND codebooks)."""
    from changedatacapture_reporting_spark.operators.similarity import (
        ivfpq_topk,
    )

    def _ivfpq(corpus, queries, k):
        return ivfpq_topk(
            corpus, queries, k=k, n_centroids=16, nprobe=6,
            m=16, k_codes=32, rerank_factor=3,
        )

    return _ann_recall_contract(spark, sf_dir, _ivfpq, bound=0.7)


def ann_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper (operators.similarity.ivfpq_topk(residual=True)):
    the PQ codebook is trained on and encodes v − centroid[cluster] —
    residuals concentrate near the origin, so the same 16 codes × 32
    codewords quantize a tighter ball and ADC fidelity rises BEFORE any
    rerank (measured on this fixture: pre-rerank recall@10 0.53 raw →
    0.60 residual). The inner-product score decomposes exactly
    (q·v = q·centroid + q·residual; the first term is a per-(query,
    probed cluster) scalar), so the ADC pass costs the same. Same
    recall ≥ 0.7 accuracy contract as the raw-encoding entry."""
    from changedatacapture_reporting_spark.operators.similarity import (
        ivfpq_topk,
    )

    def _ivfpq_res(corpus, queries, k):
        return ivfpq_topk(
            corpus, queries, k=k, n_centroids=16, nprobe=6,
            m=16, k_codes=32, rerank_factor=3, residual=True,
        )

    return _ann_recall_contract(spark, sf_dir, _ivfpq_res, bound=0.7)


SQL_ANN_RECALL = """
SELECT vec_id AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
"""


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def multimodal_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata (schema plumbing is the
    operator; payload stays opaque)."""
    d = attach_blob(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("blob_meta.n_bytes").alias("n_bytes"),
        F.col("blob_meta.checksum_md5").alias("checksum_md5"),
        F.lower(F.hex(F.substring(F.col("blob"), 1, 8))).alias("head_hex"),
    )


SQL_BLOB_META = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum_md5,
       lower(hex(encode(substring(text, 1, 8)))) AS head_hex
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the blob column, pinned to
    the deterministic byte-histogram decoder (``decoder="fake"``) so the
    contract is environment-stable. The float features are converted
    back to exact integer bin counts (count = feature × n_bytes, exact
    under float32 for corpus-sized documents) and serialized — the
    oracle recomputes the byte%8 histogram directly, making the decode
    CONTENT hash-checked, not just the plumbing. The production
    capability-probed path (PIL when present) is pytest-covered."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        FEATURE_DIM,
    )

    d = attach_blob(load_table(spark, sf_dir, "documents"))
    feats = extract_features(d, decoder="fake")
    counts = F.transform(
        "features",
        lambda x: F.round(x * F.col("n_bytes")).cast("long"),
    )
    return feats.select(
        "doc_id",
        "n_bytes",
        (F.size("features") == F.lit(FEATURE_DIM)).alias("dim_ok"),
        F.array_join(counts, ",").alias("byte_hist"),
    )


SQL_MM_FEATURES = """
WITH c AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         list_transform(range(1, length(text) + 1),
                        i -> ascii(substring(text, i, 1)) % 8) AS bins
  FROM documents
)
SELECT doc_id, n_bytes, TRUE AS dim_ok,
       array_to_string(
         list_transform(range(0, 8),
                        b -> len(list_filter(bins, x -> x = b))), ',') AS byte_hist
FROM c
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampling (operators.multimodal.sample_frames):
    every 4th 16-byte "frame" per document, fingerprinted. The oracle
    replays the chunking in SQL — valid because the document fixtures
    are pure ASCII (checked for every SF), so character positions equal
    byte positions; the operator itself is byte-general and its binary
    behaviour is differentially verified in tests/test_llm_ops.py."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        sample_frames,
    )

    d = attach_blob(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(d, frame_bytes=16, every_nth=4)
    return frames.select("doc_id", "frame_idx", F.md5("frame").alias("frame_md5"))


SQL_FRAME_SAMPLE = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       md5(substring(text, CAST(i * 16 + 1 AS BIGINT), 16)) AS frame_md5
FROM documents,
     LATERAL (SELECT unnest(range(0,
                CAST(ceil(length(text) / 16.0) AS BIGINT))) AS i) t
WHERE i % 4 = 0
"""


def text_sentiment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-join sentiment scoring (functions.text.sentiment_scores):
    broadcast-lexicon join over exploded tokens — the scale pattern for
    real 10⁴-term lexicons; oracle replays the same join in SQL."""
    from changedatacapture_reporting_spark.functions.text import (
        sentiment_scores,
    )

    d = load_table(spark, sf_dir, "documents")
    return sentiment_scores(d)


SQL_SENTIMENT = r"""
WITH lex(term, weight) AS (
  VALUES ('fast', CAST(1.0 AS DOUBLE)), ('good', 1.0), ('great', 2.0),
         ('efficient', 1.0), ('slow', -1.0), ('bad', -1.0), ('poor', -2.0),
         ('big', 0.5), ('small', -0.5)
),
tok AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents
)
SELECT doc_id, n_tokens,
       count(l.weight) AS n_hits,
       round(coalesce(sum(l.weight), 0) / n_tokens, 6) AS sentiment
FROM tok LEFT JOIN lex l USING (term)
GROUP BY doc_id, n_tokens
"""


# ---------------------------------------------------------------------------
# corpus pipeline (composition)
# ---------------------------------------------------------------------------


def corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pre-training data pipeline as one operator
    (operators.corpus.prepare_corpus): Gopher-style quality gate →
    MinHash-LSH near-dup clusters → keep each cluster's canonical head.
    Deterministic end-to-end; the oracle replays it with exact all-pairs
    Jaccard + a recursive-CTE component search (quadratic, oracle-only)."""
    from changedatacapture_reporting_spark.operators.corpus import (
        prepare_corpus,
    )

    d = load_table(spark, sf_dir, "documents")
    out = prepare_corpus(d)
    return out.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.col("n_neardups").cast("long").alias("n_neardups"),
    )


SQL_CORPUS_PREPARE = r"""
WITH RECURSIVE scored AS (
  SELECT doc_id, lang, text,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> lower(t) IN ('the','a','an','of','and','to','in','is','it','on','for'))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN 20 AND 80
    AND alpha_ratio >= 0.8
    AND (lang <> 'en' OR stopword_ratio >= 0.02)
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM kept
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(node, root) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, MIN(root) AS root FROM reach GROUP BY node),
sizes AS (SELECT root, COUNT(*) AS c FROM comp GROUP BY root)
SELECT k.doc_id, k.lang, k.n_tokens,
       round(k.alpha_ratio, 6) AS alpha_ratio,
       round(k.stopword_ratio, 6) AS stopword_ratio,
       CAST(CASE WHEN comp.node IS NULL THEN 0 ELSE s.c - 1 END AS BIGINT)
         AS n_neardups
FROM kept k
LEFT JOIN comp ON k.doc_id = comp.node
LEFT JOIN sizes s ON s.root = k.doc_id
WHERE comp.node IS NULL OR comp.root = k.doc_id
"""


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded deterministic sequence packing
    (operators.corpus.pack_sequences): documents hash to 8 independent
    shards, each packed into ~512-token packs by starting offset —
    per-shard window cumsum, one shuffle, no global sort."""
    from changedatacapture_reporting_spark.operators.corpus import (
        pack_sequences,
    )

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, max_pack_tokens=512, n_shards=8)


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS token_offset
  FROM t
)
SELECT doc_id, shard, n_tokens, token_offset,
       CAST(floor(token_offset / 512.0) AS BIGINT) AS pack_id
FROM c
"""


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions.text.redact_pii): every document is
    decorated with deterministic synthetic PII (an email, a phone, an
    IPv4 — derived from doc_id so both engines build the identical
    string), then redacted. The contract hash-checks the per-type match
    counts and the MD5 of the redacted text — proving byte-identical
    redaction without shipping the text."""
    from changedatacapture_reporting_spark.functions.text import (
        PII_PATTERNS,
        redact_pii,
    )

    d = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id").cast("string")
    decorated = F.concat(
        F.col("text"),
        F.lit(" contact user"), k, F.lit("@example.com or +1 555 010 "),
        k, F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    counts = [
        F.size(F.regexp_extract_all(decorated, F.lit(pat), 0))
        .cast("long")
        .alias(f"n_{name.strip('<>').lower()}")
        for pat, name in PII_PATTERNS
    ]
    return d.select(
        "doc_id", *counts, F.md5(redact_pii(decorated)).alias("redacted_fp")
    )


SQL_PII = r"""
WITH dec AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 555 010 ' || CAST(doc_id AS VARCHAR)
              || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '\+\d{1,3}(?:[ -]?\d){6,12}\b|\(\d{3}\)[ -]?\d{3}[ -]\d{4}\b|\b\d{3}[ -]\d{3}[ -]\d{4}\b')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+\d{1,3}(?:[ -]?\d){6,12}\b|\(\d{3}\)[ -]?\d{3}[ -]\d{4}\b|\b\d{3}[ -]\d{3}[ -]\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_fp
FROM dec
"""


def corpus_ngram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram vocabulary (operators.corpus.ngram_vocab): top-100
    bigrams by total occurrences with document frequency — the input a
    BPE/unigram tokenizer training run starts from. Deterministic
    tie-break makes the top-k cut engine-stable."""
    from changedatacapture_reporting_spark.operators.corpus import ngram_vocab

    d = load_table(spark, sf_dir, "documents")
    return ngram_vocab(d, "text", "doc_id", n=2, top_k=100)


SQL_NGRAM_VOCAB = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks
),
grams AS (
  SELECT doc_id, list_extract(t, i) || ' ' || list_extract(t, i + 1) AS ngram
  FROM pos
),
perdoc AS (
  SELECT ngram, doc_id, COUNT(*) AS n
  FROM grams WHERE ngram <> '' GROUP BY 1, 2
)
SELECT ngram,
       CAST(SUM(n) AS BIGINT) AS n_occurrences,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM perdoc
GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 100
"""


def corpus_sampled_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing (operators.sampling): hash-deterministic
    per-language Bernoulli fractions (scan-stage filter, zero shuffle)
    UNION a hard per-language quota (hash-rank top-40 per stratum, one
    shuffle) — both exactly replayable by the oracle because the sampling
    rule is a content-hash comparison, not an RNG stream."""
    from changedatacapture_reporting_spark.operators.sampling import (
        quota_sample,
        stratified_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    frac = stratified_sample(
        d,
        "lang",
        {"en": 0.3, "zh": 1.0, "es": 0.5},
        ["doc_id"],
        default_fraction=0.25,
    ).select(F.lit("frac").alias("method"), "doc_id", "lang")
    quota = quota_sample(d, "lang", 40, ["doc_id"]).select(
        F.lit("quota").alias("method"), "doc_id", "lang"
    )
    return frac.unionByName(quota)


SQL_SAMPLED_MIX = """
SELECT 'frac' AS method, doc_id, lang
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE lang WHEN 'en' THEN '4ccc' WHEN 'zh' THEN 'g'
                WHEN 'es' THEN '8000' ELSE '4000' END
UNION ALL
SELECT 'quota' AS method, doc_id, lang
FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
) WHERE rk <= 40
"""


def corpus_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PPS sampling (operators.sampling.pps_sample): documents
    kept with probability ∝ n_chars (expected ≈100 rows), via the
    all-integer hash-threshold rule — W comes from a broadcast one-row
    aggregate, the keep test runs in the scan stage, and the oracle
    replays the identical (min(k·w, W)·65536) div W arithmetic."""
    from changedatacapture_reporting_spark.operators.sampling import (
        pps_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return pps_sample(d, "n_chars", 100, ["doc_id"]).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


SQL_PPS_SAMPLE = """
WITH tot AS (
  SELECT CAST(SUM(CASE WHEN n_chars > 0 THEN n_chars END) AS BIGINT) AS w
  FROM documents
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d, tot
WHERE d.n_chars > 0
  AND CASE WHEN CAST(100 AS BIGINT) * d.n_chars >= tot.w THEN TRUE
      ELSE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
           < printf('%04x',
                    (CAST(100 AS BIGINT) * d.n_chars * 65536) // tot.w)
      END
"""


def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal
    (functions.text.repetition_scores): duplicate-3-gram fraction per
    document, expression-only."""
    from changedatacapture_reporting_spark.functions.text import (
        repetition_scores,
    )

    d = load_table(spark, sf_dir, "documents")
    r = repetition_scores("text")
    return d.select(
        "doc_id",
        r["n_3grams"].alias("n_3grams"),
        r["dup_3gram_frac"].alias("dup_3gram_frac"),
    )


SQL_REPETITION = r"""
WITH t AS (
  SELECT doc_id,
         greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) AS total,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3 THEN 0
              ELSE len(list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' '))))
         END AS n_distinct
  FROM documents
)
SELECT doc_id, CAST(total AS BIGINT) AS n_3grams,
       CASE WHEN total > 0
            THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(total AS DOUBLE)
            ELSE 0.0 END AS dup_3gram_frac
FROM t
"""


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.dedup.benchmark_overlap):
    corpus docs (doc_id % 7 != 0) sharing ≥3 distinct 3-gram shingles
    with any 'benchmark' doc (doc_id % 7 == 0). hashed=False here so the
    join key replays in DuckDB; test_llm_ops asserts the xxhash64-keyed
    production path selects identical pairs."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    bench = d.filter(F.col("doc_id") % 7 == 0)
    return benchmark_overlap(
        corpus, bench, "text", "doc_id", n=3, min_shared=3, hashed=False
    )


SQL_DECONTAM = r"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
),
c AS (SELECT doc_id AS corpus_id, unnest(sh) AS s FROM sh WHERE doc_id % 7 <> 0),
b AS (SELECT doc_id AS bench_id, unnest(sh) AS s FROM sh WHERE doc_id % 7 = 0)
SELECT corpus_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM c JOIN b USING (s)
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""


def corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators.corpus.chunk_documents):
    16-token chunks with 4-token overlap over every document —
    expression-only, no shuffle."""
    from changedatacapture_reporting_spark.operators.corpus import (
        chunk_documents,
    )

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, "text", "doc_id", chunk_tokens=16, overlap=4)


SQL_CHUNKS = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
  FROM documents
),
ex AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(len(t) - 4 - 1, 0) + 1, 12)) AS start
  FROM toks
)
SELECT doc_id, CAST(start // 12 AS INTEGER) AS chunk_id,
       CAST(len(t[start + 1 : start + 16]) AS BIGINT) AS n_tokens,
       array_to_string(t[start + 1 : start + 16], ' ') AS chunk_text
FROM ex
"""


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (operators.dedup.incremental_dedup):
    the batch (doc_id % 3 == 0) deduplicates against the already-ingested
    corpus (the rest) through the corpus's persisted MinHash band index —
    the corpus text is touched only for exact verification of candidate
    collisions. The duplicate rule (corpus match, or smaller-id batch
    match, exact shingle Jaccard ≥ 0.8) is fully replayed by the oracle,
    so this hash-checks end-to-end recall = 1 on the fixture, like
    dedup_minhash_lsh."""
    from changedatacapture_reporting_spark.operators.dedup import (
        incremental_dedup,
        minhash_band_index,
    )

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 3 == 0)
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    index = minhash_band_index(corpus)
    return incremental_dedup(new, corpus, corpus_index=index, threshold=0.8)


SQL_DEDUP_INCREMENTAL = r"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
),
m AS (
  SELECT n.doc_id, MIN(o.doc_id) AS dup_of
  FROM sh n JOIN sh o
    ON n.doc_id % 3 = 0
   AND (o.doc_id % 3 != 0 OR o.doc_id < n.doc_id)
   AND o.doc_id != n.doc_id
  WHERE CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(n.sh, o.sh))) >= 0.8
  GROUP BY n.doc_id
)
SELECT d.doc_id, m.dup_of IS NOT NULL AS is_dup, m.dup_of
FROM documents d LEFT JOIN m USING (doc_id)
WHERE d.doc_id % 3 = 0
"""


def corpus_token_freq_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring against corpus statistics
    (operators.corpus.token_frequency_scores): rare-token counts and
    mean corpus frequency per document, broadcast-vocab join. Scores are
    rational (int sums + one division), so the contract hash-checks them
    exactly."""
    from changedatacapture_reporting_spark.operators.corpus import (
        token_frequency_scores,
    )

    d = load_table(spark, sf_dir, "documents")
    return token_frequency_scores(d, rare_threshold=3)


SQL_TOKEN_FREQ = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents)
  WHERE tok != ''
),
pdt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
vocab AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS freq FROM pdt GROUP BY tok),
sc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN freq < 3 THEN c ELSE 0 END) AS BIGINT) AS n_rare_tokens,
         MIN(freq) AS min_token_freq,
         CAST(SUM(c * freq) AS DOUBLE) / SUM(c) AS mean_token_freq
  FROM pdt JOIN vocab USING (tok) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(sc.n_tokens, 0) AS n_tokens, sc.n_rare_tokens,
       sc.min_token_freq, sc.mean_token_freq
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def corpus_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic export sharding (operators.export): md5-derived
    shard assignment over 16 shards with the per-shard manifest stats
    (docs / tokens / bytes). The assignment is a pure function of the
    key, so the oracle replays it exactly ('0x'||md5-prefix cast)."""
    from changedatacapture_reporting_spark.operators.export import shard_stats

    d = load_table(spark, sf_dir, "documents")
    return shard_stats(d, n_shards=16)


SQL_SHARD_STATS = r"""
SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
       CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes
FROM documents
GROUP BY 1
"""


# one dict feeds BOTH engines: the operator normalizes w/sum(w) in this
# iteration order, and the oracle inlines the identical Python doubles —
# any divergence in normalization arithmetic would hash-mismatch
_MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}
_MIX_BUDGET = 10_000


def corpus_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (operators.sampling.budget_mix):
    per-language fractions computed IN THE PLAN from a token aggregate
    (fraction = min(1, budget·w / lang_tokens)), md5-threshold keep rule
    — deterministic, collect-free, exactly oracle-replayable."""
    from changedatacapture_reporting_spark.operators.sampling import (
        budget_mix,
    )

    d = load_table(spark, sf_dir, "documents")
    out = budget_mix(d, "lang", _MIX_WEIGHTS, _MIX_BUDGET, ["doc_id"])
    return out.select("doc_id", "lang", "source")


def _build_sql_budget_mix() -> str:
    total = sum(_MIX_WEIGHTS.values())
    cases = " ".join(
        f"WHEN '{s}' THEN {w / total!r}" for s, w in _MIX_WEIGHTS.items()
    )
    return rf"""
WITH t AS (
  SELECT lang,
         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS st
  FROM documents GROUP BY 1
),
lim AS (
  SELECT lang,
         CASE WHEN v >= 65536 THEN 'g'
              ELSE lower(lpad(to_hex(v), 4, '0')) END AS thr
  FROM (
    SELECT lang,
           CAST(FLOOR(LEAST(1.0,
                {float(_MIX_BUDGET)!r} * (CASE lang {cases} END) / st)
                * 65536) AS INT) AS v
    FROM t
    WHERE lang IN ({", ".join(f"'{s}'" for s in _MIX_WEIGHTS)})
  )
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN lim ON d.lang = lim.lang
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < lim.thr
"""


SQL_BUDGET_MIX = _build_sql_budget_mix()


def dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding dedup (operators.dedup.
    incremental_embedding_dedup): the batch (vec_id % 3 == 0) dedups
    against the rest through the corpus's persisted hyperplane bucket
    index. The oracle replays the exact cosine rule all-pairs — the
    contract hash-checks end-to-end recall 1 at the 0.45 threshold, like
    dedup_embedding_neardup."""
    from changedatacapture_reporting_spark.operators.dedup import (
        embedding_index,
        incremental_embedding_dedup,
    )

    e = load_table(spark, sf_dir, "embeddings")
    new = e.filter(F.col("vec_id") % 3 == 0)
    corpus = e.filter(F.col("vec_id") % 3 != 0)
    idx = embedding_index(corpus, with_vectors=True)
    return incremental_embedding_dedup(
        new, corpus, threshold=0.45, corpus_index=idx
    )


SQL_EMB_INCREMENTAL = """
WITH m AS (
  SELECT n.vec_id, MIN(o.vec_id) AS dup_of
  FROM embeddings n JOIN embeddings o
    ON n.vec_id % 3 = 0
   AND (o.vec_id % 3 != 0 OR o.vec_id < n.vec_id)
   AND o.vec_id != n.vec_id
  WHERE round(list_dot_product(CAST(n.embedding AS DOUBLE[]),
                               CAST(o.embedding AS DOUBLE[])), 6) >= 0.45
  GROUP BY n.vec_id
)
SELECT e.vec_id, m.dup_of IS NOT NULL AS is_dup, m.dup_of
FROM embeddings e LEFT JOIN m USING (vec_id)
WHERE e.vec_id % 3 = 0
"""


def corpus_pack_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split best-fit-decreasing packing (operators.corpus.
    pack_sequences_bfd, cap 64, 4 shards). The assignment is sequential
    per shard (not SQL-expressible), so this is the accuracy-contract
    form: exact per-shard totals the oracle recomputes, plus booleans
    asserting every pack obeys the cap (oversized docs isolated) and the
    pack count meets the any-fit guarantee
    count <= max(1, ceil(2*total/cap)) (the max(1, …) covers the
    all-empty-documents shard, which still occupies one pack):
    any-fit algorithms (BFD included) leave at most one bin half-empty,
    so count-1 bins exceed cap/2. Unlike 11/9*ceil(total/cap)+1 (which
    substitutes a lower bound for OPT and can be tighter than BFD's
    actual 11/9*OPT+1 guarantee), this holds for every distribution."""
    from changedatacapture_reporting_spark.operators.corpus import (
        pack_sequences_bfd,
    )

    cap = 64
    d = load_table(spark, sf_dir, "documents")
    out = pack_sequences_bfd(d, cap, n_shards=4)
    per_pack = out.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.count("*").alias("n"),
        F.max("n_tokens").alias("mx"),
    )
    pack_ok = (F.col("tot") <= cap) | (
        (F.col("n") == 1) & (F.col("mx") > cap)
    )
    return (
        per_pack.groupBy("shard")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum("tot").cast("long").alias("total_tokens"),
            F.sum((F.col("mx") > cap).cast("long"))
            .cast("long")
            .alias("n_oversized"),
            F.min(pack_ok).alias("packs_ok"),
            # oversized single-doc packs carry load > cap > cap/2, so
            # they participate in the any-fit count bound unmodified;
            # greatest(1, …) keeps the bound valid when a shard's total
            # token count is 0 (all-empty docs still occupy one pack)
            (
                F.count("*")
                <= F.greatest(F.lit(1), F.ceil(F.sum("tot") * 2 / cap))
            ).alias("bound_ok"),
        )
    )


SQL_PACK_BFD = r"""
SELECT CAST(doc_id % 4 AS INTEGER) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
         AS total_tokens,
       CAST(SUM(CASE WHEN len(string_split_regex(trim(text), '\s+')) > 64
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
       TRUE AS packs_ok,
       TRUE AS bound_ok
FROM documents
GROUP BY 1
"""


def corpus_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment (operators.sampling.
    leakage_safe_splits): split by near-dup CLUSTER (exact jaccard-0.5
    pairs — the oracle tier pair graph SQL_CLUSTERS already replays), so
    no near-duplicate pair ever straddles a split boundary. The md5
    thresholds are the shared Python-computed hex strings, so the oracle
    replays the assignment bit-for-bit."""
    from changedatacapture_reporting_spark.operators.sampling import (
        leakage_safe_splits,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", None, n=3, threshold=0.5)
    return leakage_safe_splits(
        d, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


def _build_sql_splits() -> str:
    from changedatacapture_reporting_spark.operators.sampling import (
        fraction_to_hex_threshold,
    )

    t_train = fraction_to_hex_threshold(0.8)
    t_val = fraction_to_hex_threshold(0.8 + 0.1)
    return rf"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(node, root) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
),
cl AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id,
       CASE WHEN substr(md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 4)
                 < '{t_train}' THEN 'train'
            WHEN substr(md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 4)
                 < '{t_val}' THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN cl USING (doc_id)
"""


SQL_SPLITS = _build_sql_splits()


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (functions.vectors.quantize_int8):
    per-vector symmetric scale, floor-arithmetic rounding so BOTH
    engines produce bit-identical q arrays and scales — the contract
    hash-checks the quantized representation itself, not a property of
    it. Top-k recall on the dequantized vectors is pytest-verified.

    The q array is serialized to a comma-joined string for the driver
    harness: its pandas canonicalizer sorts result columns, and
    list-valued cells are unhashable there. The serialization is
    lossless (int8 values, no commas inside elements), so this is
    still a bit-exact check of the quantized representation."""
    from changedatacapture_reporting_spark.functions.vectors import (
        quantize_int8,
    )

    e = load_table(spark, sf_dir, "embeddings")
    qz = quantize_int8(F.col("embedding"))
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(qz["q"], lambda x: x.cast("string")), ","
        ).alias("q_csv"),
        qz["scale"].alias("scale"),
    )


SQL_QUANTIZE = """
SELECT vec_id,
       array_to_string(
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> CASE WHEN mx = 0 THEN 0
                     ELSE CAST(FLOOR(x * 127.0 / mx + 0.5) AS INTEGER) END),
         ',') AS q_csv,
       mx / 127.0 AS scale
FROM (
  SELECT vec_id, embedding,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS mx
  FROM embeddings
)
"""


def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators.bpe.bpe_train):
    30 merge rules learned from the documents corpus — iterative
    (pair-count argmax per round), so no single SQL computes it; but
    the merge sequence is DETERMINISTIC (lexicographic tie-break, no
    RNG), so the oracle is a committed GOLDEN MERGE TABLE generated by
    an independent pure-Python BPE (tools/make_bpe_golden.py) over the
    sf0.01 documents fixture — the driver hash-checks the full sequence
    rows-exactly (r9; previously rows-only). The same pure-Python
    semantics are additionally pinned subset-wise by tests/test_bpe.py
    (merge sequence AND final vocabulary, tie-breaks included).
    NOTE: the golden table is the sf0.01 sequence — the sf the driver's
    correctness gate runs at; at any other sf this contract fails
    loudly rather than silently passing."""
    from changedatacapture_reporting_spark.operators.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, n_merges=30)
    return spark.createDataFrame(
        [(i, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, left string, right string, merged string, n long",
    )


def _bpe_golden_sql() -> str:
    """VALUES-literal oracle from the committed golden merge table."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "bpe_golden_sf001.json",
    )
    with open(path) as f:
        rows = json.load(f)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ",\n".join(
        f"({r['rank']}, {q(r['left'])}, {q(r['right'])}, "
        f"{q(r['merged'])}, {r['n']})"
        for r in rows
    )
    return (
        "SELECT * FROM (VALUES\n"
        + values
        + '\n) AS t(rank, "left", "right", merged, n)'
    )


SQL_BPE_GOLDEN = _bpe_golden_sql()


def corpus_boilerplate_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-boilerplate fraction (operators.corpus.boilerplate_scores,
    hashed=False so the shingle keys replay in DuckDB): share of each
    document's distinct 3-gram shingles with corpus df ≥ 3 — the
    RefinedWeb-style templated-content signal. The xxhash64-keyed
    production path is pytest-proven identical
    (test_llm_ops::test_boilerplate_hashed_equals_string_key)."""
    from changedatacapture_reporting_spark.operators.corpus import (
        boilerplate_scores,
    )

    d = load_table(spark, sf_dir, "documents")
    return boilerplate_scores(d, "text", "doc_id", n=3, min_df=3, hashed=False)


SQL_BOILERPLATE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
dfc AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY 1)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       COUNT(*) FILTER (dfc.df >= 3) AS n_boiler,
       CAST(COUNT(*) FILTER (dfc.df >= 3) AS DOUBLE) / COUNT(*)
         AS boiler_frac
FROM sh JOIN dfc USING (g)
GROUP BY 1
"""


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64→8 (functions.vectors.random_projection):
    all-BIGINT fixed-point arithmetic on a 1e-6 lattice, so the projected
    vectors are bit-identical in any engine — the contract hash-checks
    the projection itself (serialized to CSV for the driver harness, the
    embedding_quantization precedent). The ±1 matrix comes from the
    shared md5 derivation (projection_signs), embedded as literals in
    BOTH plans by the same Python. Distance-preservation / ANN-recall
    behavior is pytest-verified (test_llm_ops)."""
    from changedatacapture_reporting_spark.functions.vectors import (
        projection_signs,
        random_projection,
    )

    e = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(
        F.col("embedding"), projection_signs(64, 8, seed=8)
    )
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(proj, lambda x: x.cast("string")), ","
        ).alias("proj_csv"),
    )


def _build_sql_projection() -> str:
    from changedatacapture_reporting_spark.functions.vectors import (
        projection_signs,
    )

    terms = []
    for row in projection_signs(64, 8, seed=8):
        lst = "[" + ",".join(str(s) for s in row) + "]"
        terms.append(
            "list_sum(list_transform(range(1, 65), i -> "
            "CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) "
            f"AS BIGINT) * ({lst}[i])))"
        )
    cols = ",\n         ".join(terms)
    return f"""
SELECT vec_id,
       array_to_string([{cols}], ',') AS proj_csv
FROM embeddings
"""


SQL_PROJECTION = _build_sql_projection()


def text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus canonicalization (functions.text.normalize_text): every
    document is decorated with smart quotes, an en-dash, NBSP, a tab, an
    ellipsis, and a control char, then normalized — both engines must
    produce byte-identical canonical text and md5 fingerprints."""
    from changedatacapture_reporting_spark.functions.text import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    decorated = F.concat(
        F.lit("“"),
        F.col("text"),
        F.lit("” –\tEnd…\x07"),
    )
    return d.select(
        "doc_id",
        normalize_text(decorated).alias("norm"),
    ).select("doc_id", "norm", F.md5("norm").alias("fp"))


def _build_sql_normalize() -> str:
    from_ch = "‘’“”–— "
    to_ch = "''\"\"-- ".replace("'", "''")
    deco_pre = "“"
    deco_post = "” –"
    return rf"""
SELECT doc_id, norm, md5(norm) AS fp FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(regexp_replace(
           translate(
             lower('{deco_pre}' || text || '{deco_post}' || chr(9)
                   || 'End' || '…' || chr(7)),
             '{from_ch}', '{to_ch}'),
           '…', '...', 'g'),
           '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
           '\s+', ' ', 'g')) AS norm
  FROM documents)
"""


SQL_NORMALIZE = _build_sql_normalize()


def corpus_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 characteristic terms
    (operators.corpus.tfidf_top_terms): BM25-style rational tf-idf —
    exact int64 numerator/denominator, ranked on the single IEEE-exact
    division with term tie-break, so the contract hash-checks scores and
    ranks bit-exactly."""
    from changedatacapture_reporting_spark.operators.corpus import (
        tfidf_top_terms,
    )

    d = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=5)


SQL_TFIDF = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents)
  WHERE tok != ''
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, tok),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tok AS term, t.tf, d.df,
         CAST(t.tf * (2 * (n.n_docs - d.df) + 1) AS BIGINT) AS score_num,
         CAST(2 * d.df + 1 AS BIGINT) AS score_den
  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id
    ORDER BY CAST(score_num AS DOUBLE) / score_den DESC, term ASC
  ) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, score_num, score_den, rank
FROM ranked WHERE rank <= 5
"""


def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer SERVING (operators.bpe.bpe_encode): apply the trained
    merge table — the committed golden merges, i.e. exactly what
    corpus_bpe_merges learns — to the documents corpus and report
    per-language token totals (the number a data pipeline actually
    bills by). The merge chain runs once per DISTINCT word (vocabulary
    scale), pure expressions end to end. Like the trainer, encoding is
    iterative (|merges| rewrite passes), so the oracle is a committed
    golden table from an independent pure-Python encoder
    (tools/make_bpe_encode_golden.py) over the sf0.01 fixture; at any
    other sf this contract fails loudly rather than silently passing."""
    import json as _json
    import os as _os

    from changedatacapture_reporting_spark.operators.bpe import bpe_encode

    merges_path = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "fixtures",
        "bpe_golden_sf001.json",
    )
    merges = [
        (r["left"], r["right"]) for r in _json.load(open(merges_path))
    ]
    d = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(d, merges)
    return (
        enc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_units").cast("long").alias("n_bpe_units"),
        )
    )


def _bpe_encode_golden_sql() -> str:
    """VALUES-literal oracle from the committed per-lang encode table."""
    import json as _json
    import os as _os

    path = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "fixtures",
        "bpe_encode_golden_sf001.json",
    )
    rows = _json.load(open(path))
    values = ",\n".join(
        f"('{r['lang']}', {r['n_docs']}, {r['n_words']}, {r['n_bpe_units']})"
        for r in rows
    )
    return (
        "SELECT * FROM (VALUES\n"
        + values
        + "\n) AS t(lang, n_docs, n_words, n_bpe_units)"
    )


SQL_BPE_ENCODE_GOLDEN = _bpe_encode_golden_sql()


def corpus_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing (operators.sampling.rank_buckets): 8 exact
    equal-population buckets over the (n_chars, doc_id) total order —
    train-short-to-long curricula and quality-tier mixes consume this.
    Computed WITHOUT a global sort: per-score cumulative base ranks
    (window over the distinct-score frame) + a score-PARTITIONED
    within-rank window. The oracle replays the NTILE-free formula
    bucket = ⌊k·(rank−1)/n⌋ through one ROW_NUMBER."""
    from changedatacapture_reporting_spark.operators.sampling import (
        rank_buckets,
    )

    d = load_table(spark, sf_dir, "documents")
    return rank_buckets(d, "n_chars", "doc_id", k=8).withColumnRenamed(
        "id", "doc_id"
    )


SQL_QUALITY_BUCKETS = """
WITH r AS (
  SELECT doc_id, n_chars AS score,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rank,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT doc_id, score, rank,
       CAST(FLOOR((rank - 1) * 8.0 / n) AS INT) AS bucket
FROM r
"""


def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP/DROP decision a dedup pipeline actually executes
    (operators.dedup.cluster_representatives): MinHash-LSH verified
    pairs at jaccard 0.8 → connected components → per transitive group
    keep the longest member (ties → smallest doc_id), singletons keep
    themselves. One row per document: (doc_id, cluster_id, rep_id,
    is_kept, n_members). The production path end to end — banded
    candidates, min-label-propagation components, aggregate-max
    representative (no corpus-wide window). Oracle replays the exact
    jaccard-0.8 pair graph through a recursive CTE."""
    from changedatacapture_reporting_spark.operators.dedup import (
        cluster_representatives,
        neardup_clusters,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.8)
    clusters = neardup_clusters(pairs)
    return cluster_representatives(d, clusters)


SQL_CLUSTER_REPS = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 3
              THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     range(1, len(string_split_regex(trim(text), '\s+')) - 1),
                     i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
         END AS sh
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(node, root) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
assigned AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         d.n_chars
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
reps AS (
  SELECT cluster_id,
         FIRST(doc_id ORDER BY n_chars DESC, doc_id) AS rep_id,
         COUNT(*) AS n_members
  FROM assigned GROUP BY cluster_id
)
SELECT a.doc_id, a.cluster_id, r.rep_id,
       a.doc_id = r.rep_id AS is_kept, r.n_members
FROM assigned a JOIN reps r USING (cluster_id)
"""


def corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (operators.corpus.chunk_exact_dedup)
    over the standard chunking (16-token windows, overlap 4): repeated
    spans — licence headers, boilerplate, quoted reposts — get one
    keeper (lexicographically smallest (doc, chunk) occurrence) and the
    copies are marked for drop. One shuffle on the chunk hash; the
    oracle replays chunking + md5 keying + the keeper rule."""
    from changedatacapture_reporting_spark.operators.corpus import (
        chunk_documents,
        chunk_exact_dedup,
    )

    d = load_table(spark, sf_dir, "documents")
    return chunk_exact_dedup(
        chunk_documents(d, chunk_tokens=16, overlap=4)
    )


SQL_CHUNK_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
  FROM documents
),
ex AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(len(t) - 4 - 1, 0) + 1, 12)) AS start
  FROM toks
),
ch AS (
  SELECT doc_id, CAST(start // 12 AS INTEGER) AS chunk_id,
         md5(array_to_string(t[start + 1 : start + 16], ' ')) AS chunk_key
  FROM ex
),
g AS (
  SELECT chunk_key,
         FIRST(doc_id ORDER BY doc_id, chunk_id) AS keeper_doc_id,
         FIRST(chunk_id ORDER BY doc_id, chunk_id) AS keeper_chunk_id,
         COUNT(*) AS n_copies
  FROM ch GROUP BY chunk_key
)
SELECT c.doc_id, c.chunk_id, c.chunk_key,
       c.doc_id = g.keeper_doc_id AND c.chunk_id = g.keeper_chunk_id
         AS is_kept,
       g.keeper_doc_id, g.keeper_chunk_id, g.n_copies
FROM ch c JOIN g USING (chunk_key)
"""


def text_mixed_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level language consistency — the multilingual-corpus DQ
    check doc-level language-ID can't do: a document whose CHUNKS
    predict different languages is mixed-language content (embedded
    quotes, concatenated crawls, template wrappers) that a per-doc
    label hides. Runs the same langid heuristic at both granularities
    over the standard chunking; one join on doc_id, one aggregation.
    Output per doc: (doc_id, doc_lang, n_chunks, n_disagree)."""
    from changedatacapture_reporting_spark.operators.corpus import (
        chunk_documents,
    )

    d = load_table(spark, sf_dir, "documents")
    doc = d.select(
        "doc_id", langid_scores("text")["lang"].alias("doc_lang")
    )
    ch = chunk_documents(d, chunk_tokens=16, overlap=4).select(
        "doc_id", langid_scores("chunk_text")["lang"].alias("chunk_lang")
    )
    return (
        ch.join(doc, "doc_id")
        .groupBy("doc_id", "doc_lang")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                (F.col("chunk_lang") != F.col("doc_lang")).cast("long")
            ).alias("n_disagree"),
        )
    )


def _mixed_language_sql() -> str:
    """Oracle generated FROM LANG_MARKERS so the marker lists can never
    drift between the Spark heuristic and the SQL replay. The argmax
    tie-break (score, then language code) is mirrored by the CASE order
    fr > es > en > de — identical to langid_scores' struct array_max."""
    from changedatacapture_reporting_spark.functions.text import LANG_MARKERS

    def score(col: str, lang: str) -> str:
        marks = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"CAST(len(list_filter({col}, w -> lower(w) IN ({marks}))) "
            f"AS DOUBLE) / greatest(len({col}), 1) AS s_{lang}"
        )

    pick = (
        "CASE greatest(s_en, s_es, s_fr, s_de) "
        "WHEN s_fr THEN 'fr' WHEN s_es THEN 'es' "
        "WHEN s_en THEN 'en' ELSE 'de' END"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
  FROM documents
),
doc_pred AS (
  SELECT doc_id, {pick} AS doc_lang FROM (
    SELECT doc_id, {score('t', 'en')}, {score('t', 'es')},
           {score('t', 'fr')}, {score('t', 'de')}
    FROM toks
  )
),
ex AS (
  SELECT doc_id, t[start + 1 : start + 16] AS ct
  FROM (
    SELECT doc_id, t,
           unnest(range(0, greatest(len(t) - 4 - 1, 0) + 1, 12)) AS start
    FROM toks
  )
),
chunk_pred AS (
  SELECT doc_id, {pick} AS chunk_lang FROM (
    SELECT doc_id, {score('ct', 'en')}, {score('ct', 'es')},
           {score('ct', 'fr')}, {score('ct', 'de')}
    FROM ex
  )
)
SELECT c.doc_id, d.doc_lang, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN c.chunk_lang != d.doc_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_disagree
FROM chunk_pred c JOIN doc_pred d USING (doc_id)
GROUP BY c.doc_id, d.doc_lang
"""


SQL_MIXED_LANGUAGE = _mixed_language_sql()


def corpus_datasheet_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card (operators.corpus.corpus_datasheet): the headline
    facts a corpus publishes — volume, language spread, exact-duplicate
    load — as ~7 all-integer (metric, value) rows at any corpus size.
    The sf0.01 fixture has zero exact-dup groups, so the dup metrics
    verify as exact zeros here; the counting logic itself is pinned on
    crafted duplicates in pytest."""
    from changedatacapture_reporting_spark.operators.corpus import (
        corpus_datasheet,
    )

    return corpus_datasheet(load_table(spark, sf_dir, "documents"))


SQL_DATASHEET = r"""
WITH fp AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
         COUNT(*) AS c
  FROM documents GROUP BY 1 HAVING COUNT(*) > 1
),
d AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT lang) AS n_langs,
         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS n_words,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars
  FROM documents
),
lm AS (
  SELECT MAX(c) AS max_lang_docs
  FROM (SELECT COUNT(*) AS c FROM documents GROUP BY lang)
),
dd AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_dup_docs,
         COUNT(*) AS n_dup_groups
  FROM fp
)
SELECT 'n_docs' AS metric, n_docs AS value FROM d
UNION ALL SELECT 'n_langs', n_langs FROM d
UNION ALL SELECT 'n_words', n_words FROM d
UNION ALL SELECT 'n_chars', n_chars FROM d
UNION ALL SELECT 'max_lang_docs', max_lang_docs FROM lm
UNION ALL SELECT 'n_dup_docs', n_dup_docs FROM dd
UNION ALL SELECT 'n_dup_groups', n_dup_groups FROM dd
"""


def corpus_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-surprisal quality scoring (operators.lm.lm_surprisal_scores):
    add-one bigram LM, self-scored — the CCNet-style "perplexity filter"
    stage of a training-data pipeline. The hash-checked surface is the
    exact-integer diagnostic columns (bigram counts, corpus-frequency
    sums, hapax/rare position counts) plus the boolean curation flag;
    the float avg_logprob/ppl_proxy production columns are excluded
    (never hash engine doubles — r9 de-flake rule)."""
    from changedatacapture_reporting_spark.operators.lm import (
        lm_surprisal_scores,
    )

    d = load_table(spark, sf_dir, "documents")
    return lm_surprisal_scores(d).select(
        "doc_id",
        "n_tokens",
        "n_bigrams",
        "sum_bigram_freq",
        "n_hapax_bigrams",
        "n_rare_bigrams",
        "flagged",
    )


SQL_LM_SURPRISAL = r"""
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord)
           AS bg
  FROM (SELECT doc_id, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS ord
        FROM arr)
),
bgpos AS (SELECT doc_id, bg FROM pos WHERE bg IS NOT NULL),
bgc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM bgpos GROUP BY bg),
perdoc AS (
  SELECT p.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(b.c) AS BIGINT) AS sum_bigram_freq,
         CAST(SUM(CASE WHEN b.c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax_bigrams,
         CAST(SUM(CASE WHEN b.c <= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare_bigrams
  FROM bgpos p JOIN bgc b USING (bg)
  GROUP BY p.doc_id
)
SELECT a.doc_id,
       CAST(len(a.toks) AS BIGINT) AS n_tokens,
       COALESCE(p.n_bigrams, 0) AS n_bigrams,
       COALESCE(p.sum_bigram_freq, 0) AS sum_bigram_freq,
       COALESCE(p.n_hapax_bigrams, 0) AS n_hapax_bigrams,
       COALESCE(p.n_rare_bigrams, 0) AS n_rare_bigrams,
       CAST(COALESCE(p.n_rare_bigrams, 0) AS DOUBLE)
         > 0.25 * CAST(COALESCE(p.n_bigrams, 0) AS DOUBLE) AS flagged
FROM arr a LEFT JOIN perdoc p USING (doc_id)
"""


REGISTRY_LLM = {
    "corpus_lm_surprisal": (corpus_lm_surprisal, SQL_LM_SURPRISAL),
    "corpus_datasheet": (corpus_datasheet_report, SQL_DATASHEET),
    "text_mixed_language": (text_mixed_language, SQL_MIXED_LANGUAGE),
    "corpus_chunk_dedup": (corpus_chunk_dedup, SQL_CHUNK_DEDUP),
    "corpus_bpe_encode": (corpus_bpe_encode, SQL_BPE_ENCODE_GOLDEN),
    "corpus_quality_buckets": (corpus_quality_buckets, SQL_QUALITY_BUCKETS),
    "dedup_cluster_representatives": (
        dedup_cluster_representatives,
        SQL_CLUSTER_REPS,
    ),
    "dedup_incremental_batch": (dedup_incremental_batch, SQL_DEDUP_INCREMENTAL),
    "text_normalization": (text_normalization, SQL_NORMALIZE),
    "embedding_quantization": (embedding_quantization, SQL_QUANTIZE),
    "embedding_random_projection": (embedding_random_projection, SQL_PROJECTION),
    "corpus_boilerplate_scores": (corpus_boilerplate_scores, SQL_BOILERPLATE),
    "corpus_bpe_merges": (corpus_bpe_merges, SQL_BPE_GOLDEN),
    "corpus_leakage_safe_splits": (corpus_leakage_safe_splits, SQL_SPLITS),
    "dedup_embedding_incremental": (dedup_embedding_incremental, SQL_EMB_INCREMENTAL),
    "corpus_pack_bfd": (corpus_pack_bfd, SQL_PACK_BFD),
    "corpus_token_freq_scores": (corpus_token_freq_scores, SQL_TOKEN_FREQ),
    "corpus_shard_stats": (corpus_shard_stats, SQL_SHARD_STATS),
    "corpus_budget_mix": (corpus_budget_mix, SQL_BUDGET_MIX),
    "text_token_stats": (text_token_stats, SQL_TOKEN_STATS),
    "text_quality_scores": (text_quality_scores, SQL_QUALITY),
    "text_fingerprints": (text_fingerprints, SQL_FINGERPRINTS),
    "text_langid": (text_langid, SQL_LANGID),
    "text_top_terms_per_lang": (text_top_terms_per_lang, SQL_TOP_TERMS),
    "text_sentiment_scores": (text_sentiment_scores, SQL_SENTIMENT),
    "embedding_centroids_by_label": (embedding_centroids_by_label, SQL_CENTROIDS),
    "dedup_exact_groups": (dedup_exact_groups, SQL_DEDUP_EXACT),
    "dedup_clusters": (dedup_clusters, SQL_CLUSTERS),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, SQL_NGRAM_JACCARD),
    "dedup_minhash_lsh": (dedup_minhash_lsh, SQL_MINHASH_LSH),
    "dedup_simhash": (dedup_simhash, SQL_SIMHASH),
    "dedup_embedding_neardup": (dedup_embedding_neardup, SQL_EMB_NEARDUP),
    "ann_topk_bruteforce": (ann_topk_bruteforce, SQL_ANN_TOPK),
    "ann_topk_lsh": (ann_topk_lsh, SQL_ANN_RECALL),
    "ann_topk_ivf": (ann_topk_ivf, SQL_ANN_RECALL),
    "ann_topk_ivfpq": (ann_topk_ivfpq, SQL_ANN_RECALL),
    "ann_topk_ivfpq_residual": (ann_topk_ivfpq_residual, SQL_ANN_RECALL),
    "ann_topk_pq": (ann_topk_pq, SQL_ANN_RECALL),
    "multimodal_blob_metadata": (multimodal_blob_metadata, SQL_BLOB_META),
    "multimodal_features": (multimodal_features, SQL_MM_FEATURES),
    "multimodal_frame_sample": (multimodal_frame_sample, SQL_FRAME_SAMPLE),
    "corpus_prepare": (corpus_prepare, SQL_CORPUS_PREPARE),
    "corpus_pack_sequences": (corpus_pack_sequences, SQL_PACK_SEQUENCES),
    "corpus_decontaminate": (corpus_decontaminate, SQL_DECONTAM),
    "corpus_chunks": (corpus_chunks, SQL_CHUNKS),
    "corpus_sampled_mix": (corpus_sampled_mix, SQL_SAMPLED_MIX),
    "corpus_pps_sample": (corpus_pps_sample, SQL_PPS_SAMPLE),
    "corpus_ngram_vocab": (corpus_ngram_vocab, SQL_NGRAM_VOCAB),
    "corpus_tfidf_terms": (corpus_tfidf_terms, SQL_TFIDF),
    "text_pii_redaction": (text_pii_redaction, SQL_PII),
    "text_repetition_scores": (text_repetition_scores, SQL_REPETITION),
}
