"""Round-10 entry semantics beyond the registry oracle: CDC chunk
boundary stability, two-stage rerank recall, DoReMi weight invariants."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F


def _h48(tok: str) -> int:
    return int(hashlib.md5(f"cdc:{tok}".encode()).hexdigest()[:12], 16)


def _is_boundary(tok: str, d: int = 16) -> bool:
    return _h48(tok) % d == 0


def _mk_tokens(n: int, boundary: bool, salt: str) -> list[str]:
    """Deterministically mine tokens whose CDC boundary bit is `boundary`."""
    out, i = [], 0
    while len(out) < n:
        t = f"{salt}{i}"
        if _is_boundary(t) == boundary:
            out.append(t)
        i += 1
    return out


def _chunk_hashes(spark, text: str) -> list[str]:
    from cassabon_spark.queries.extensions import _cdc_chunk_frame

    docs = spark.createDataFrame(
        [(1, text, "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = _cdc_chunk_frame(docs).select("ctext", "h").collect()
    # chunks come back in document order (explode preserves array order)
    return [r["h"] for r in rows]


def test_cdc_boundaries_are_content_defined(spark):
    """The partition into chunks is exactly the one the per-token boundary
    rule dictates: each chunk ends on a boundary token (except the last)."""
    from cassabon_spark.queries.extensions import _cdc_chunk_frame

    toks = _mk_tokens(5, False, "p") + _mk_tokens(1, True, "q") + _mk_tokens(3, False, "r")
    docs = spark.createDataFrame(
        [(1, " ".join(toks), "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    chunks = _cdc_chunk_frame(docs).select("ctext", "clen").collect()
    assert len(chunks) == 2
    assert chunks[0]["clen"] == 6 and chunks[0]["ctext"].split()[-1] == toks[5]
    assert chunks[1]["clen"] == 3 and chunks[1]["ctext"] == " ".join(toks[6:])


def test_cdc_chunks_stable_under_head_insertion(spark):
    """CDC's defining property (vs fixed-stride windows): inserting a token
    at the head disturbs only the first chunk — every later chunk hash
    survives, so the edited copy still dedups against the original."""
    body = []
    for k in range(6):  # 6 chunks: 9 non-boundary tokens + 1 boundary each
        body += _mk_tokens(9, False, f"b{k}x") + _mk_tokens(1, True, f"e{k}x")
    body += _mk_tokens(4, False, "tailx")  # ragged last chunk
    orig = _chunk_hashes(spark, " ".join(body))
    ins = _mk_tokens(1, False, "insx")  # non-boundary insert keeps chunk count
    edited = _chunk_hashes(spark, " ".join(ins + body))
    assert len(orig) == 7
    assert len(edited) == 7
    assert edited[0] != orig[0]  # the landing chunk changes...
    assert edited[1:] == orig[1:]  # ...every later chunk hash survives


def test_cdc_entry_counts_cross_doc_shared_chunks(spark, tmp_path):
    """Two docs share a passage at DIFFERENT offsets; because boundaries
    are content-based the passage's interior chunks align and are counted
    in n_shared_chunks."""
    from cassabon_spark.queries import load_registry

    # shared passage = two full CDC chunks (boundary-mined), plus a
    # boundary token in front so both docs start the passage chunk-aligned
    shared = (
        _mk_tokens(1, True, "cut")
        + _mk_tokens(7, False, "s1x") + _mk_tokens(1, True, "s1e")
        + _mk_tokens(7, False, "s2x") + _mk_tokens(1, True, "s2e")
    )
    pre_a = _mk_tokens(3, False, "pa")
    pre_b = _mk_tokens(11, False, "pb")
    uniq = _mk_tokens(5, False, "uz")
    rows = [
        (1, " ".join(pre_a + shared), "en", "s", 0),
        (2, " ".join(pre_b + shared), "en", "s", 0),
        (3, " ".join(uniq), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = load_registry()["dedup_cdc_chunks"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    # the two interior passage chunks are shared across docs 1 and 2
    assert r["n_shared_chunks"] == 2
    assert r["n_chunks"] - r["n_distinct_chunks"] == 2  # one dup instance each


def test_ann_rerank_recall_and_shape(spark, sf_dir):
    """Two-stage rerank: 5 rows per query, exact-dot scores non-increasing,
    and at R=32 candidates the refine stage recovers the exact top-5
    (recall5 == 1.0 on the test corpus)."""
    from cassabon_spark.queries import load_registry

    rows = load_registry()["similarity_ann_rerank"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert [r["rnk"] for r in sorted(rs, key=lambda r: r["rnk"])] == [1, 2, 3, 4, 5]
        scores = [r["score"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(r["recall5"] == 1.0 for r in rs)


def test_domain_reweight_invariants(spark, sf_dir):
    """DoReMi step: weights form a distribution, respect the smoothing
    floor, order by excess loss, and the token budget spends the corpus."""
    from cassabon_spark.queries.extensions import _DRW_SMOOTH
    from cassabon_spark.queries import load_registry

    rows = load_registry()["pipeline_domain_reweight"].fn(spark, sf_dir).collect()
    nd = len(rows)
    assert nd > 1
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    floor = _DRW_SMOOTH / nd
    assert all(r["weight"] >= floor - 1e-9 for r in rows)
    # exp is monotone: weight order == excess-loss order
    by_kl = sorted(rows, key=lambda r: r["excess_loss"])
    by_w = sorted(rows, key=lambda r: r["weight"])
    assert [r["source"] for r in by_kl] == [r["source"] for r in by_w]
    ntot = sum(r["n_tokens"] for r in rows)
    assert abs(sum(r["target_tokens"] for r in rows) - ntot) < 1.0
    for r in rows:
        assert abs(r["resample_factor"] - r["target_tokens"] / r["n_tokens"]) < 1e-3


def test_lsh_band_ablation_tradeoff(spark, sf_dir):
    """More rows per band => stricter bands: candidate volume shrinks,
    precision can only rise; hits never exceed truth or candidates."""
    from cassabon_spark.queries import load_registry

    rows = sorted(
        load_registry()["dedup_lsh_band_ablation"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rows_per_band"],
    )
    assert [(r["n_bands"], r["rows_per_band"]) for r in rows] == [(8, 1), (4, 2), (2, 4)]
    cands = [r["n_candidates"] for r in rows]
    assert cands[0] >= cands[1] >= cands[2]
    precs = [r["precision"] for r in rows]
    assert precs[0] <= precs[1] <= precs[2]
    scurve = [r["s_curve_at_07"] for r in rows]
    assert scurve[0] > scurve[1] > scurve[2]
    for r in rows:
        assert r["n_hits"] <= min(r["n_truth"], r["n_candidates"])
        assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["precision"] <= 1.0


def test_probe_ablation_recall_cost_curve(spark, sf_dir):
    """A bigger probe budget can only scan more and recall more."""
    from cassabon_spark.queries import load_registry

    rows = sorted(
        load_registry()["similarity_probe_ablation"].fn(spark, sf_dir).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    assert all(r["n_queries"] == 5 for r in rows)
    rec = [r["mean_recall5"] for r in rows]
    frac = [r["mean_scanned_frac"] for r in rows]
    assert rec[0] <= rec[1] <= rec[2]
    assert frac[0] <= frac[1] <= frac[2]
    assert all(0.0 < f <= 1.0 for f in frac)


# ---------------------------------------------------------------- CDC property fuzz

def _py_cdc_chunks(toks: list[str], d: int = 16) -> list[str]:
    """Pure-python mirror of the CDC partition (validated against the
    Spark frame below, then fuzzed cheaply without a Spark job per
    example): token i ends a chunk iff h48('cdc:'||tok) % d == 0; the
    last token always ends the final chunk."""
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if _is_boundary(t, d):
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_cdc_python_mirror_matches_spark(spark):
    """One Spark job pins the python mirror to the real chunker on a
    batch of adversarial docs (boundary at head/tail, all-boundary,
    no-boundary, mixed)."""
    import random

    rng = random.Random(1234)
    docs, expected = [], {}
    pool_b = _mk_tokens(40, True, "fb")
    pool_n = _mk_tokens(40, False, "fn")
    for did in range(1, 21):
        n = rng.randint(1, 50)
        toks = [rng.choice(pool_b if rng.random() < 0.2 else pool_n) for _ in range(n)]
        docs.append((did, " ".join(toks), "en", "s", 0))
        expected[did] = _py_cdc_chunks(toks)
    from cassabon_spark.queries.extensions import _cdc_chunk_frame

    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    got: dict[int, list[str]] = {}
    for r in _cdc_chunk_frame(df).select("doc_id", "ctext").collect():
        got.setdefault(r["doc_id"], []).append(r["ctext"])
    assert got == expected


def test_cdc_edit_locality_property():
    """Fuzzed CDC contract (on the pinned python mirror): ONE token
    insertion or deletion changes the chunk multiset by at most 3
    elements — the edited chunk plus at most a split/merge neighbor —
    regardless of where the edit lands. Fixed-stride chunking violates
    this for every edit not in the last window."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    pool = _mk_tokens(12, False, "hz") + _mk_tokens(4, True, "hb")

    @settings(max_examples=300, deadline=None)
    @given(
        toks=st.lists(st.sampled_from(pool), min_size=1, max_size=80),
        pos=st.integers(min_value=0, max_value=80),
        ins=st.sampled_from(pool),
        delete=st.booleans(),
    )
    def check(toks, pos, ins, delete):
        if delete:
            if len(toks) < 2:
                return
            p = min(pos, len(toks) - 1)
            edited = toks[:p] + toks[p + 1 :]
        else:
            p = min(pos, len(toks))
            edited = toks[:p] + [ins] + toks[p:]
        a, b = Counter(_py_cdc_chunks(toks)), Counter(_py_cdc_chunks(edited))
        diff = sum(((a - b) + (b - a)).values())
        assert diff <= 3, (toks, edited, diff)

    check()


def test_snapshot_time_travel_versions(spark, sf_dir):
    """Historical snapshots reconstruct exactly: v0 ⊂ v1 (appends), head
    = v1 minus the dropped 'en' partition, and v1 keeps all languages."""
    from cassabon_spark.queries import load_registry

    rows = {r["snapshot"]: r for r in load_registry()["snapshot_time_travel"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"v0", "v1", "head"}
    assert rows["v0"]["n_rows"] < rows["v1"]["n_rows"]
    assert rows["head"]["n_rows"] < rows["v1"]["n_rows"]
    assert rows["head"]["n_langs"] == rows["v1"]["n_langs"] - 1  # 'en' dropped
    assert rows["v0"]["chars_total"] < rows["v1"]["chars_total"]


def test_filtered_ann_predicate_and_recall(spark, sf_dir):
    """Filtered search contract: every truth row satisfies the per-query
    label predicate, 5 rows per query, and the filtered-IVF recall is a
    value in [0, 1] shared by the query's rows."""
    from cassabon_spark.queries import load_registry

    rows = load_registry()["similarity_filtered_ann"].fn(spark, sf_dir).collect()
    emb = {r["vec_id"]: r["label"] for r in
           spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "label").collect()}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        target = (q * 7) % 10
        assert all(emb[r["cid"]] == target for r in rs)  # predicate holds
        assert sorted(r["rnk"] for r in rs) == [1, 2, 3, 4, 5]
        assert len({r["recall5"] for r in rs}) == 1
        assert 0.0 <= rs[0]["recall5"] <= 1.0
        assert all(r["n_eligible"] >= 5 for r in rs)
