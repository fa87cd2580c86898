"""Text-analysis building blocks for the training-data pipeline operators
(SURVEY §2 Part C): tokenization, shingling, quality metrics, language ID,
fingerprinting, portable MinHash.

Design rules:
  * Built-in expressions only (split / transform / filter / md5) — whole-stage
    codegen, no Python UDFs in any hot path.
  * Every hash is md5-derived, because md5 is bit-identical across Spark and
    DuckDB — which makes even MinHash signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lexicons for the n-gram/stopword language-ID
# heuristic. Public common-word lists; enough for a coarse signal.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "de", "y", "un", "una", "es", "que", "por", "en"],
    "de": ["der", "die", "das", "und", "ein", "ist", "zu", "den", "von", "mit"],
}


def tokens_expr(text, lowercase: bool = True) -> Column:
    """Whitespace tokenization; empty strings filtered.

    Implemented as edge-strip (regexp_replace) + plain split instead of a
    per-token higher-order filter: HOFs evaluate interpreted (outside
    whole-stage codegen) and measured 5x slower on the documents corpus.
    Interior \\s+ runs never produce empty tokens once the edges are
    stripped; the empty-document case is handled wholesale.
    """
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    cleaned = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(F.length(cleaned) == 0, F.array().cast("array<string>")).otherwise(
        F.split(cleaned, r"\s+")
    )


def word_shingles_expr(toks: Column, n: int = 3, sep: str = " ") -> Column:
    """n-gram word shingles from a token array: transform over start offsets,
    array_join each window. Pure Catalyst — no UDF.

    Guarded for short docs: Spark's sequence(1, 0) yields a DESCENDING [1, 0]
    (unlike DuckDB's empty generate_series), which would feed element_at an
    out-of-range index — docs with fewer than n tokens return an empty
    shingle set instead.

    Window construction is per-element element_at + concat_ws, not
    slice + array_join: the slice allocates an array per shingle and
    measured 3.5x slower over the documents corpus.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(sep, *[F.element_at(toks, i + j) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def md5_bucket_expr(s: Column, prefix: str = "") -> Column:
    """First 12 hex chars of md5 -> BIGINT in [0, 2^48) — a portable,
    deterministic hash identical in Spark and DuckDB
    (DuckDB: ('0x' || substr(md5(x),1,12))::BIGINT)."""
    h = F.md5(F.concat(F.lit(prefix), s))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")


def md5_chunk_hash_expr(s: Column, i: int) -> Column:
    """i-th 32-bit hash of a string, 4 hashes per md5 evaluation: the 32
    hex chars of md5('<i//4>|' || s) split into four 8-hex-char chunks.
    k MinHash components cost ceil(k/4) md5 calls instead of k — the md5 is
    the dominant map-side cost of the LSH pipeline. Portable: DuckDB mirror
    is CAST(('0x' || SUBSTR(MD5('<i//4>|' || s), 8*(i%4)+1, 8)) AS BIGINT)."""
    h = F.md5(F.concat(F.lit(f"{i // 4}|"), s))
    return F.conv(F.substring(h, 8 * (i % 4) + 1, 8), 16, 10).cast("bigint")


def minhash_expr(shingles: Column, seed: int) -> Column:
    """One MinHash component: min over shingles of md5_bucket(seed || shingle).
    Empty shingle set -> 2^48 sentinel (matches oracle COALESCE)."""
    hashed = F.transform(shingles, lambda sh: md5_bucket_expr(sh, prefix=f"{seed}|"))
    return F.coalesce(F.array_min(hashed), F.lit(1 << 48).cast("bigint"))


def stopword_hits_expr(toks: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang`."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_score_expr(text) -> Column:
    """Heuristic document quality in [0,1]:
      0.4 * clamp(n_tokens/64) + 0.3 * (1 - punct_ratio) + 0.3 * stopword_ratio
    Deterministic arithmetic, reproducible in ANSI SQL for the oracle.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_expr(c)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    sw_hits = stopword_hits_expr(toks, "en").cast("double")
    sw_ratio = F.when(n_tok > 0, sw_hits / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    return 0.4 * len_score + 0.3 * (1.0 - punct_ratio) + 0.3 * sw_ratio


def fingerprint_expr(text) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct token set —
    robust to word order and duplication (the classic 'fingerprint' key
    collapse). Identical in DuckDB via
    md5(array_to_string(list_sort(list_distinct(string_split(...))), ' '))."""
    toks = tokens_expr(text)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
