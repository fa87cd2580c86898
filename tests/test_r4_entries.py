"""Round-4 entry semantics that deserve a constructed fixture on top of
the registry oracle: ExactSubstr span merging."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_exact_substring_merges_overlapping_positions_into_spans(spark, tmp_path):
    """Two docs share one 25-token passage: 6 duplicated 20-gram positions
    per doc must merge into ONE span covering exactly the 25 shared
    tokens; a doc with no repeated grams reports zeros."""
    from cassabon_spark.queries import load_registry

    shared = " ".join(f"tok{i}" for i in range(25))
    uniq_a = " ".join(f"aa{i}" for i in range(10))
    uniq_b = " ".join(f"bb{i}" for i in range(10))
    clean = " ".join(f"cc{i}" for i in range(30))
    rows = [
        (1, f"{uniq_a} {shared}", "en", "s", 0),
        (2, f"{shared} {uniq_b}", "en", "s", 0),
        (3, clean, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in load_registry()["dedup_exact_substring"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # doc 1: shared passage at positions 11..35 -> 20-gram starts 11..16
    assert out[1]["n_dup_grams"] == 6
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 25
    assert out[2]["n_dup_grams"] == 6 and out[2]["dup_tokens"] == 25
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_tokens"] == 0
    assert abs(out[1]["dup_ratio"] - 25 / 35) < 1e-4  # entry rounds to 4dp


def test_minhash_collapse_path_matches_direct_path(spark, tmp_path):
    """The adaptive content-collapse plan must emit EXACTLY the pairs the
    direct plan emits. Corpus: a 120-copy dup farm (trips the collapse
    threshold) + near-dup pair + unique docs; expected pairs computed
    independently here."""
    import itertools

    from cassabon_spark.queries import load_registry

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"  # high-jaccard neighbor
    rows = [(i, base, "en", "s", 0) for i in range(120)]  # dup farm 0..119
    rows.append((200, near, "en", "s", 0))
    rows += [
        (300 + j, " ".join(f"u{j}x{i}" for i in range(30)), "en", "s", 0)
        for j in range(5)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in load_registry()["dedup_minhash_lsh"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # every farm pair present with jaccard exactly 1.0
    farm = set(itertools.combinations(range(120), 2))
    assert farm <= set(got)
    assert all(got[p] == 1.0 for p in farm)
    # the near-dup doc pairs with EVERY farm member at the same jaccard:
    # 38 3-shingles per doc, 37 shared -> 37/39 ~ 0.9487 >= 0.7
    near_pairs = {p for p in got if p[1] == 200}
    assert len(near_pairs) in (0, 120)  # all-or-nothing by content
    if near_pairs:
        assert all(abs(got[p] - round(37 / 39, 4)) < 1e-9 for p in near_pairs)
    # unique docs never pair with each other
    assert not any(d1 >= 300 and d2 >= 300 for (d1, d2) in got)


def test_minhash_collapse_excludes_shingle_less_docs(spark, tmp_path):
    """Identical tiny docs (< 3 tokens, so NO shingles) must not pair even
    when the collapse path triggers — the direct plan and the oracle never
    produce candidates for them."""
    from cassabon_spark.queries import load_registry

    base = " ".join(f"w{i}" for i in range(40))
    rows = [(i, base, "en", "s", 0) for i in range(120)]  # trips collapse
    rows += [(500 + j, "hi there", "en", "s", 0) for j in range(10)]  # 2 tokens
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["d1"], r["d2"])
        for r in load_registry()["dedup_minhash_lsh"].fn(spark, str(tmp_path)).collect()
    }
    assert not any(d1 >= 500 or d2 >= 500 for (d1, d2) in got)
    assert len(got) == 120 * 119 // 2  # the farm pairs, nothing else


@pytest.mark.slow  # r15 tiering: crafted collapse-corpus graph equality, ~60 s; the other collapse pins stay default
def test_cluster_and_canonical_match_pair_graph_on_collapse_corpus(spark, tmp_path):
    """On a corpus that trips the content-collapse threshold, the
    rep-graph component labels must equal a union-find over the emitted
    pair set, for both dedup_minhash_clusters and dedup_keep_canonical."""
    from cassabon_spark.queries import load_registry

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    other = " ".join(f"q{i}" for i in range(40))
    rows = [(i, base, "en", "s", 40) for i in range(120)]
    rows.append((200, near, "en", "s", 41))
    rows += [(300 + j, other, "en", "s", 40) for j in range(70)]  # 2nd farm
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    reg = load_registry()
    pairs = [
        (r["d1"], r["d2"])
        for r in reg["dedup_minhash_lsh"].fn(spark, str(tmp_path)).collect()
    ]
    # union-find over the pair graph
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    expected = {
        (lab, len(m), len(m) - 1) for lab, m in comps.items()
    }
    got = {
        (r["component"], r["cluster_size"], r["n_removable"])
        for r in reg["dedup_minhash_clusters"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expected, (sorted(got), sorted(expected))
    # canonical: longest member, ties -> smallest doc_id
    exp_canon = {}
    n_chars = {r[0]: r[4] for r in rows}
    for lab, m in comps.items():
        best = min(m, key=lambda d: (-n_chars[d], d))
        exp_canon[lab] = (best, len(m) - 1, sum(n_chars[d] for d in m) - max(n_chars[d] for d in m))
    got_canon = {
        r["component"]: (r["canonical"], r["n_dropped"], r["chars_dropped"])
        for r in reg["dedup_keep_canonical"].fn(spark, str(tmp_path)).collect()
    }
    assert got_canon == exp_canon, (got_canon, exp_canon)
