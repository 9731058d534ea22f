"""End-to-end walkthrough of the engine — the full lifecycle a migrating
user of the reference would run, in one script:

    simulate CDC events → incremental populate (twice: proves exact
    resume) → time-range report + freshness → per-row audit →
    point-in-time reconstruction → compaction (logical + physical) →
    training-corpus pipeline over the documents table.

Run:  python examples/end_to_end.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from changedatacapture_reporting_spark import get_spark
from changedatacapture_reporting_spark.operators import (
    compact_changelog,
    freshness,
    populate_changelog,
    query_changelog,
    reconstruct_state,
)
from changedatacapture_reporting_spark.sources.cdc_simulator import (
    SIM_PK,
    simulate_cdc_events,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("end_to_end_demo")
    sink = tempfile.mkdtemp(prefix="changelog_") + "/sink"

    events = simulate_cdc_events(spark, sf_dir)

    # 1. incremental populate: first half, then the rest — exact resume
    mid = events.agg(F.expr("percentile(lsn, 0.5)")).head()[0]
    r1 = populate_changelog(spark, events, sink, SIM_PK, to_lsn=int(mid))
    r2 = populate_changelog(spark, events, sink, SIM_PK)
    print(f"populate: run1={r1.rows_changed} rows, run2={r2.rows_changed} rows")
    r3 = populate_changelog(spark, events, sink, SIM_PK)
    print(f"populate re-run: {r3.rows_changed} rows (exact watermark, no dupes)")

    log = spark.read.parquet(sink)

    # 2. reporting: freshness banner + day-truncated slice + maintained rollup
    from changedatacapture_reporting_spark.operators import read_rollup

    print(freshness(log, ts_col="commit_time").head().message)
    daily = read_rollup(spark, sink)
    print(f"rollup: {daily.count()} (table, day) aggregate rows maintained")
    window = query_changelog(log, "1996-01-01", "1996-12-31")
    print(f"changes in 1996: {window.count()}")

    # 3. audit trail for one row
    some_key = log.agg(F.min("o_orderkey")).head()[0]
    trail = log.filter(F.col("o_orderkey") == some_key).orderBy(
        "commit_time", "column_name"
    )
    trail.show(truncate=False)

    # 4. point-in-time state + SCD2 dimension + compaction
    from changedatacapture_reporting_spark.operators import scd2_history

    state = reconstruct_state(log, SIM_PK, ["status", "priority", "total", "note"])
    scd2 = scd2_history(log, SIM_PK, ["status", "priority", "total", "note"])
    compacted = compact_changelog(log, SIM_PK)
    print(
        f"live rows: {state.count()}; SCD2 versions: {scd2.count()}; "
        f"changelog {log.count()} rows → compacted {compacted.count()}"
    )

    # 5. physical sink maintenance: merge small files in place (atomic
    # swap, crash-recovered), then drop months past retention
    from changedatacapture_reporting_spark.operators import (
        compact_sink_files,
        expire_changelog_months,
    )

    stats = compact_sink_files(spark, sink, SIM_PK, max_files=1)
    print(
        f"sink compaction: {stats['files_before']} files → "
        f"{stats['files_after']} in {stats['partitions_compacted']} partitions"
    )
    kept = expire_changelog_months(spark, sink, "1995-01-01")
    print(f"retention: dropped {kept['months_dropped']} months, kept {kept['months_kept']}")

    # 6. training-corpus pipeline over the documents fixture: quality
    # gate → near-dup removal → sharded ~512-token sequence packing
    from changedatacapture_reporting_spark.operators.corpus import (
        pack_sequences,
        prepare_corpus,
    )
    from changedatacapture_reporting_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = prepare_corpus(docs)
    packs = pack_sequences(corpus, max_pack_tokens=512)
    n_in, n_kept = docs.count(), corpus.count()
    n_packs = packs.select("shard", "pack_id").distinct().count()
    print(f"corpus: {n_in} docs → {n_kept} kept → {n_packs} packs")

    # 7. the round-6 additions: net-changes window collapse, corpus
    # rebalancing, and vocabulary stats
    from changedatacapture_reporting_spark.operators.corpus import ngram_vocab
    from changedatacapture_reporting_spark.operators.net_changes import (
        net_changes,
    )
    from changedatacapture_reporting_spark.operators.sampling import (
        quota_sample,
        stratified_sample,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        simulate_cdc_events_multi,
    )

    net = net_changes(simulate_cdc_events_multi(spark, sf_dir), SIM_PK)
    by_op = {r.net_op: r.n for r in net.groupBy("net_op").count()
             .withColumnRenamed("count", "n").collect()}
    print(f"net changes per op: {by_op}")

    balanced = stratified_sample(
        docs, "lang", {"en": 0.3}, ["doc_id"], default_fraction=1.0
    )
    capped = quota_sample(docs, "lang", 40, ["doc_id"])
    vocab = ngram_vocab(docs, n=2, top_k=5)
    top = [r.ngram for r in vocab.collect()]
    print(
        f"rebalanced: {balanced.count()} docs (en downsampled); "
        f"quota-capped: {capped.count()}; top bigrams: {top}"
    )

    # 8. the late-round-6 additions, CDC side: merge the net changes into
    # a snapshot (consumer-side MERGE), fold a fresh changelog batch into
    # an SCD2 history incrementally, reconstruct at an LSN boundary, and
    # profile which columns actually churn
    from changedatacapture_reporting_spark.operators.apply import apply_changes
    from changedatacapture_reporting_spark.operators.changelog import (
        build_changelog,
    )
    from changedatacapture_reporting_spark.operators.profile import column_churn
    from changedatacapture_reporting_spark.operators.scd import (
        scd2_history,
        scd2_merge,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_UPDATE,
    )

    ev_multi = simulate_cdc_events_multi(spark, sf_dir)
    vcols = ["status", "priority", "total", "note"]

    def log_of(e):
        return build_changelog(
            e, SIM_PK, with_audit_cols=False, carry_cols=["lsn", "seq"],
            record_insert_images=True,
        )

    base = ev_multi.filter(F.col("lsn") < MULTI_OFF_UPDATE)
    tail = ev_multi.filter(F.col("lsn") >= MULTI_OFF_UPDATE)
    target = reconstruct_state(log_of(base), SIM_PK, vcols)
    merged = apply_changes(
        target, net_changes(ev_multi, SIM_PK, from_lsn=MULTI_OFF_UPDATE),
        SIM_PK, vcols, broadcast_net=True,
    )
    hist = scd2_merge(scd2_history(log_of(base), SIM_PK, vcols),
                      log_of(tail), SIM_PK, vcols)
    at_lsn = reconstruct_state(
        log_of(ev_multi), SIM_PK, vcols, as_of_lsn=150_000_000
    )
    churn = {r.column_name: r.n_changes
             for r in column_churn(log_of(ev_multi), SIM_PK).collect()}
    print(
        f"merge-applied state: {merged.count()} rows; SCD2 versions: "
        f"{hist.count()}; state@lsn150M: {at_lsn.count()}; churn: {churn}"
    )

    # 9. the late-round-6 additions, pipeline side: dedup a new batch
    # against the corpus index, score docs against corpus statistics,
    # mix to a token budget, and export deterministic shards
    from changedatacapture_reporting_spark.operators.corpus import (
        token_frequency_scores,
    )
    from changedatacapture_reporting_spark.operators.dedup import (
        incremental_dedup,
        minhash_band_index,
    )
    from changedatacapture_reporting_spark.operators.export import export_shards
    from changedatacapture_reporting_spark.operators.sampling import budget_mix

    new_batch = docs.filter(F.col("doc_id") % 3 == 0)
    old_corpus = docs.filter(F.col("doc_id") % 3 != 0)
    verdicts = incremental_dedup(
        new_batch, old_corpus,
        corpus_index=minhash_band_index(old_corpus),
    )
    n_dup = verdicts.filter(F.col("is_dup")).count()
    rare = token_frequency_scores(docs).filter(F.col("n_rare_tokens") > 5)
    mixed = budget_mix(
        docs, "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}, 5_000, ["doc_id"]
    )
    out_dir = tempfile.mkdtemp(prefix="shards_") + "/export"
    manifest = export_shards(spark, mixed, out_dir, n_shards=4)
    shard_sizes = {r.shard: r.n_docs for r in manifest.collect()}
    print(
        f"incremental dedup: {n_dup}/{verdicts.count()} new docs are dups; "
        f"rare-heavy docs: {rare.count()}; budget mix → shards: {shard_sizes}"
    )

    # 10. cross-table consistent snapshot + int8 embedding quantization
    from changedatacapture_reporting_spark.functions.vectors import (
        quantize_int8,
    )
    from changedatacapture_reporting_spark.operators.reconstruct import (
        snapshot_tables_at_lsn,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        simulate_cdc_events_cross_table,
    )

    base_t, tax_t = simulate_cdc_events_cross_table(spark, sf_dir)
    cross_log = log_of(base_t).unionByName(log_of(tax_t))
    snap = snapshot_tables_at_lsn(
        cross_log,
        {"orders": (SIM_PK, vcols), "orders_tax": (SIM_PK, ["rate", "fee"])},
        as_of_lsn=700,
    )
    per_table = {r.table_name: r.n for r in snap.groupBy("table_name")
                 .count().withColumnRenamed("count", "n").collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    qz = quantize_int8(F.col("embedding"))
    n_q = emb.select(qz["q"].alias("q")).count()
    print(
        f"consistent snapshot @lsn700 (EAV rows per table): {per_table}; "
        f"quantized {n_q} embeddings to int8"
    )


if __name__ == "__main__":
    main()
