"""Targeted tests for the round-3 batch entries — properties the row-hash
oracle gate can't see: Bloom false-positive discrimination, the KMV merge
law, chunk coverage arithmetic, and redaction idempotence/completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassabon_spark.queries.extensions import (
    _CHUNK_STRIDE,
    _CHUNK_W,
    _KMV_K,
    _kmv_bottom_k,
    join_bloom_prune,
    sketch_kmv_distinct,
    similarity_sq8,
    text_chunk_windows,
    text_pii_redact,
)

SF = "/root/testdata/sf0.01"


def test_bloom_prune_has_real_false_positives(spark):
    """The entry is only a meaningful Bloom demo if the filter actually
    passes some non-matching rows (FP > 0) while never dropping a match
    (candidates >= matched, guaranteed by construction; asserted anyway)."""
    rows = join_bloom_prune(spark, SF).collect()
    assert rows, "bloom entry returned no groups"
    assert all(r.n_bloom_candidates >= r.n_matched for r in rows)
    assert sum(r.n_false_positives for r in rows) > 0, (
        "no Bloom false positives at sf0.01 — the candidate set degenerated "
        "to the exact match set and the entry no longer exercises the filter"
    )
    assert sum(r.n_matched for r in rows) > 0


def test_kmv_merge_equals_direct_sketch(spark):
    """Merge law: bottom-k(union of per-shard sketches) == bottom-k(all
    hashes) whenever every retained hash would have been retained by some
    shard — true here because shards partition the input. This is the
    property that makes the sketch safe to compute per-partition at 100 TB."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("shard"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    per_shard = _kmv_bottom_k(df, ["shard"])
    merged = _kmv_bottom_k(
        per_shard.select(F.explode("bk").alias("h")).distinct(), []
    ).collect()[0]["bk"]
    direct = _kmv_bottom_k(df.select("h"), []).collect()[0]["bk"]
    assert merged == direct
    assert len(direct) == _KMV_K


def test_kmv_estimates_within_error(spark):
    """KMV relative error is ~1/sqrt(k-1) (~9% at k=128); assert the merged
    estimate lands within 4 standard errors of truth."""
    out = {r.shard: r for r in sketch_kmv_distinct(spark, SF).collect()}
    allr = out["ALL"]
    rel = abs(allr.est_distinct - allr.true_distinct) / allr.true_distinct
    assert rel < 4 / (_KMV_K - 1) ** 0.5, (allr.est_distinct, allr.true_distinct)
    # per-shard sketches that kept fewer than k hashes must be exact
    for r in out.values():
        if r.n_sketch < _KMV_K:
            assert r.est_distinct == r.true_distinct


def test_chunk_windows_cover_every_token(spark):
    """Coverage arithmetic: with stride < width every token is in >= 1
    chunk and token slots re-counted across chunks equal
    n + overlap * (n_chunks - n_docs) per doc (each non-first chunk
    re-reads exactly `overlap` tokens, except ragged tails shorter than
    the overlap)."""
    out = text_chunk_windows(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from cassabon_spark.functions.text import tokens_expr

    tok_totals = {
        r.source: r.n_tok
        for r in docs.select("source", F.size(tokens_expr("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tok"))
        .collect()
    }
    overlap = _CHUNK_W - _CHUNK_STRIDE
    for r in out:
        assert r.sum_chunk_tokens >= tok_totals[r.source]
        # each chunk beyond the first per doc re-counts at most `overlap` tokens
        assert r.sum_chunk_tokens <= tok_totals[r.source] + overlap * (
            r.n_chunks - r.n_docs
        )
        assert r.n_unique_chunks <= r.n_chunks


def test_pii_redaction_idempotent_and_complete(spark):
    """Redacting an already-redacted corpus must change nothing, and no
    injected pattern may survive redaction."""
    from cassabon_spark.queries.extensions import _PII_EMAIL, _PII_IP, _PII_PHONE

    docs = spark.createDataFrame(
        [
            (3, "alpha beta", "en", "web", 10),
            (4, "gamma delta", "en", "web", 11),
            (7, "epsilon", "de", "news", 7),
            (84, "zeta eta", "fr", "web", 8),  # 84 % 3 == 0, % 4 == 0, % 7 == 0
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = text_pii_redact(spark, d).collect()
        assert sum(r.n_emails for r in rows) == 2  # doc 3 and 84
        assert sum(r.n_phones for r in rows) == 2  # doc 4 and 84
        assert sum(r.n_ips for r in rows) == 2  # doc 7 and 84
        # a second detection pass over the redacted text finds nothing
        from cassabon_spark.queries.extensions import _pii_redact_rows

        red = _pii_redact_rows(spark.read.parquet(f"{d}/documents.parquet"))
        leftovers = red.select(
            sum(
                F.size(F.regexp_extract_all("redacted", F.lit(p), F.lit(0)))
                for p in (_PII_EMAIL, _PII_PHONE, _PII_IP)
            ).alias("n")
        ).agg(F.sum("n"))
        assert leftovers.collect()[0][0] == 0


def test_sq8_recall_vs_exact_topk(spark):
    """SQ8 is lossy; assert it still recovers most of the exact cosine
    top-5 (recall@5 >= 0.6 on the synthetic corpus). Guards against a
    quantizer regression that the exact-oracle gate (which checks the
    quantized answer, not its quality) would not catch."""
    from cassabon_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.qid, r.cid)
        for r in cosine_topk(emb, queries, k=5).select("qid", "cid").collect()
    }
    sq8 = {(r.qid, r.cid) for r in similarity_sq8(spark, SF).collect()}
    recall = len(exact & sq8) / len(exact)
    assert recall >= 0.6, f"SQ8 recall@5 degraded: {recall}"


def test_zorder_bounds_both_dimensions(spark):
    """The point of the z layout: per-bucket spans stay narrow on BOTH
    dimensions, while a 1-D sort layout leaves the other dimension's span
    at ~the global span (no skipping possible for predicates on it)."""
    from cassabon_spark.operators.layout import linear_bucket_expr, zorder_key_expr
    from cassabon_spark.queries.extensions import pipeline_zorder_layout

    from cassabon_spark.queries import T

    rows = pipeline_zorder_layout(spark, SF).collect()
    li = T(spark, SF, "lineitem")
    g = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min(F.col("l_shipdate").cast("long")), F.max(F.col("l_shipdate").cast("long")),
    ).collect()[0]
    pk_span, sd_span = g[1] - g[0], g[3] - g[2]
    # weighted mean per-bucket span under z layout: narrow on both dims
    n = sum(r.n_rows for r in rows)
    z_pk = sum((r.pk_max - r.pk_min) * r.n_rows for r in rows) / n
    z_sd = sum((r.sd_max - r.sd_min) * r.n_rows for r in rows) / n
    assert z_pk < 0.5 * pk_span, (z_pk, pk_span)
    assert z_sd < 0.5 * sd_span, (z_sd, sd_span)
    # 1-D sort on shipdate: partkey span per bucket stays ~global
    from pyspark.sql import Window

    w = Window.orderBy("sd", "l_partkey")
    sorted_1d = (
        li.select("l_partkey", F.col("l_shipdate").cast("long").alias("sd"))
        .withColumn("r", F.row_number().over(w))
        .withColumn("bucket", F.floor((F.col("r") - 1) * 32 / n))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk_sp"),
        )
        .collect()
    )
    sort_pk = sum(r.pk_sp * r.n_rows for r in sorted_1d) / n
    assert sort_pk > 0.9 * pk_span, (sort_pk, pk_span)
    assert z_pk < 0.6 * sort_pk
