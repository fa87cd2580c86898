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
    """
    from pyspark.sql.functions import pandas_udf

    def _hash(col):
        return col.map(lambda s: pearson_hash8(s) if s is not None else None)

    return pandas_udf(_hash, "int")


def peer_index(path: str, n_peers: int) -> int:
    """Owning-peer assignment (listener/peerlist.go:113-120)."""
    return pearson_hash8(path) % n_peers
