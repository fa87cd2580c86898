"""Pearson 8-bit hash — bit-compatible with the reference's consistent-routing
hash (pearson/pearson.go:10-41), kept ONLY for compatibility tooling.

The reference uses it to assign each metric path to an owning peer
(listener/peerlist.go:113-120). Spark's shuffle replaces that topology
entirely (SURVEY A4); nothing in the engine's hot path calls this. It exists
so operators that must reproduce the reference's shard assignment (e.g.
validating a migration) can, via a vectorized pandas UDF.

The reference's permutation table (pearson/pearson.go:9-26) is not random:
entry k is the byte with high nibble (k mod 16) and low nibble (15 - k//16).
We derive it from that formula, giving bit-identical hashes without copying
the table literal.
"""

from __future__ import annotations

_T = [((k % 16) << 4) | (15 - k // 16) for k in range(256)]


def pearson_hash8(s: str) -> int:
    """8-bit Pearson hash of a UTF-8 string (pearson/pearson.go:30-41).
    Golden values (pearson/pearson_test.go): ''->0,
    'sample string to be hashed'->47."""
    h = 0
    for b in s.encode("utf-8"):
        h = _T[h ^ b]
    return h


def pearson_hash64(s: str) -> tuple[int, ...]:
    """64-bit extended Pearson hash: 8 passes, pass `seg` seeds from the first
    byte offset by seg (pearson/pearson.go:44-58)."""
    data = s.encode("utf-8")
    if not data:
        return (0,) * 8
    out = []
    for seg in range(8):
        h = _T[(data[0] + seg) % 256]
        for b in data[1:]:
            h = _T[h ^ b]
        out.append(h)
    return tuple(out)


def pearson_hash8_udf():
    """Vectorized pandas UDF form for bulk compat checks.

    No type hints on the inner fn: this module uses postponed annotation
    evaluation, which turns hints into strings pandas_udf can't resolve —
    the explicit returnType carries the schema instead.

    Since r14 the query surface uses `pearson_hash8_expr` (pure Catalyst,
    no Python boundary); this UDF form remains for callers that want the
    Python reference implementation applied in bulk.
    """
    from pyspark.sql.functions import pandas_udf

    def _hash(col):
        return col.map(lambda s: pearson_hash8(s) if s is not None else None)

    return pandas_udf(_hash, "int")


def pearson_hash8_expr(col):
    """Pure-Catalyst Pearson hash (r14, guide §4: built-ins over UDFs):
    folds the UTF-8 bytes of `col` through the formula-derived table with
    aggregate + element_at — bit-identical to `pearson_hash8`, and the
    plan loses its ArrowEvalPython node (the JVM<->Python transpose +
    serialization both ways was the whole cost of this op). Bytes come
    from hex(encode(col, 'utf-8')) split into 8-bit pairs, so multi-byte
    UTF-8 folds exactly like the Python reference (per BYTE, not per
    character). Empty string -> 0, like the reference."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    tab = F.array(*[F.lit(v) for v in _T])
    raw = F.encode(c, "utf-8")
    hx = F.hex(raw)
    nb = F.octet_length(raw)
    fold = F.aggregate(
        # sequence(1, 0) would yield the DESCENDING [1, 0] (the
        # word_shingles_expr lesson), so the empty case is guarded below
        F.sequence(F.lit(1), nb),
        F.lit(0),
        lambda h, i: F.element_at(
            tab,
            h.bitwiseXOR(
                F.conv(F.substring(hx, i * 2 - 1, F.lit(2)), 16, 10).cast("int")
            )
            + 1,
        ),
    )
    return F.when(nb == 0, F.lit(0)).otherwise(fold)


def peer_index(path: str, n_peers: int) -> int:
    """Owning-peer assignment (listener/peerlist.go:113-120)."""
    return pearson_hash8(path) % n_peers
