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
    word_tokens,
)
from changedatacapture_reporting_spark.operators.dedup import (
    embedding_neardup_pairs,
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
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.size(word_tokens("text")).cast("long").alias("n_word_tokens"),
        F.size(F.array_distinct(F.split(F.trim("text"), r"\s+")))
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
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
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
    Jaccard verification — the 100 TB dedup path. xxhash64 seeds aren't
    replayable in DuckDB → rows-only; equivalence to exact Jaccard is
    pytest-verified."""
    d = load_table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(d, threshold=0.8)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 7 over 64-bit signatures,
    8-band pigeonhole candidates). rows-only (xxhash64)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=7)


def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: normalized dot ≥ 0.45."""
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, "embedding", "vec_id", threshold=0.45)


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


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 (16 deterministic k-means centroids, nprobe=4) — the
    cluster-pruned scale path. rows-only; recall vs brute force is
    pytest-asserted."""
    from changedatacapture_reporting_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(e, q, k=10).select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank"
    )


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-10 (8 tables × 8 planes) — the scale path.
    rows-only; recall vs brute force is pytest-asserted."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return lsh_topk(e, q, k=10).select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank"
    )


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
    """Arrow-batched feature extraction over the blob column (decode
    stubbed with a deterministic byte-histogram — media libs absent).
    rows-only: mapInPandas is not SQL-expressible."""
    d = attach_blob(load_table(spark, sf_dir, "documents"))
    return extract_features(d)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampling (operators.multimodal.sample_frames):
    every 4th 16-byte "frame" per document, fingerprinted. rows-only:
    content is differentially verified against a Python reference in
    tests/test_llm_ops.py."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        sample_frames,
    )

    d = attach_blob(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(d, frame_bytes=16, every_nth=4)
    return frames.select("doc_id", "frame_idx", F.md5("frame").alias("frame_md5"))


REGISTRY_LLM = {
    "text_token_stats": (text_token_stats, SQL_TOKEN_STATS),
    "text_quality_scores": (text_quality_scores, SQL_QUALITY),
    "text_fingerprints": (text_fingerprints, SQL_FINGERPRINTS),
    "text_langid": (text_langid, SQL_LANGID),
    "text_top_terms_per_lang": (text_top_terms_per_lang, SQL_TOP_TERMS),
    "embedding_centroids_by_label": (embedding_centroids_by_label, SQL_CENTROIDS),
    "dedup_exact_groups": (dedup_exact_groups, SQL_DEDUP_EXACT),
    "dedup_clusters": (dedup_clusters, SQL_CLUSTERS),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, SQL_NGRAM_JACCARD),
    "dedup_minhash_lsh": (dedup_minhash_lsh, None),
    "dedup_simhash": (dedup_simhash, None),
    "dedup_embedding_neardup": (dedup_embedding_neardup, SQL_EMB_NEARDUP),
    "ann_topk_bruteforce": (ann_topk_bruteforce, SQL_ANN_TOPK),
    "ann_topk_lsh": (ann_topk_lsh, None),
    "ann_topk_ivf": (ann_topk_ivf, None),
    "multimodal_blob_metadata": (multimodal_blob_metadata, SQL_BLOB_META),
    "multimodal_features": (multimodal_features, None),
    "multimodal_frame_sample": (multimodal_frame_sample, None),
}
