"""Deterministic text→embedding generators.

The reference's EmbeddingGenerator has three backends: ML.NET SSWE, Ollama
HTTP, and a deterministic hash-seeded random fallback in [-1, 1]
(Neighborly/EmbeddingGenerator.cs:28-54,60-71,139-156). We replicate the
*deterministic hash fallback* as the engine's portable embedder — but since
.NET's GetHashCode is not stable anyway, we fix a portable hash (md5), which
has the bonus of being expressible in BOTH Spark SQL and DuckDB SQL, so the
correctness oracle can hash-match text-search results end to end.

Definition (dim components, j = 0..dim-1): one md5 digest carries 128 bits
= FOUR uint32 components, so block b = md5(text || ':' || b) serves
components 4b..4b+3 — 4x fewer digests than hash-per-component:
    h_j  = uint32 from hex chars [8*(j%4)+1 .. 8*(j%4)+8] of
           md5(text || ':' || (j div 4))
    e_j  = float32( (h_j / 2^32) * 2 - 1 )          # in [-1, 1)

Everything is a Column expression (md5/conv/transform — JVM-side codegen).
A model-backed embedder would slot in as a pandas_udf via EMBEDDERS; the
hash embedder is the test/default backend exactly like the reference's
fallback.

Scale note: md5-per-component is ~dim hashes per row; fine for bench scales
and entirely JVM-side. For bulk 100 TB embedding jobs you'd use the
xxhash64 variant below (one hash per component but a much cheaper one) or a
real model behind mapInPandas; the md5 form is the cross-engine-portable one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_32 = 4294967296.0  # 2^32


def hash_embedding(text: Column | str, dim: int) -> Column:
    """Portable deterministic embedding as array<float> (see module doc).

    The md5 block list is let-bound via the one-element-transform trick
    (Catalyst does not CSE across lambda bodies), so exactly ceil(dim/4)
    digests are computed per row."""
    t = F.col(text) if isinstance(text, str) else text
    n_blocks = (dim + 3) // 4
    blocks = F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda b: F.md5(F.concat(t, F.lit(":"), b.cast("string"))),
    )

    def body(bl: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (
                    F.conv(
                        F.element_at(bl, F.floor(j / 4).cast("int") + 1).substr(
                            (j % 4) * 8 + 1, F.lit(8)
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(TWO_32)
                )
                * 2.0
                - 1.0
            ).cast("float"),
        )

    return F.element_at(F.transform(F.array(blocks), body), 1)


def hash_embedding_duckdb_sql(text_expr: str, dim: int) -> str:
    """The exact same function as DuckDB SQL, for correctness oracles.

    Bit-for-bit identical to hash_embedding(): md5 hex is engine-independent;
    the uint32 is exact in double; /2^32, *2, -1 are exact or identically
    rounded IEEE ops; the float32 cast rounds identically. (The oracle
    recomputes the block digest per component rather than let-binding —
    same VALUE, and oracle-side cost is irrelevant.)
    """
    return (
        f"list_transform(range(0, {dim}), j -> CAST("
        f"(CAST(('0x' || substr(md5({text_expr} || ':' || CAST(j // 4 AS VARCHAR)), "
        f"(j % 4) * 8 + 1, 8)) AS BIGINT)"
        f" / {TWO_32:.1f}) * 2.0 - 1.0 AS FLOAT))"
    )


def hash_embedding_fast(text: Column | str, dim: int) -> Column:
    """Cheaper Spark-only variant using xxhash64 (one 64-bit hash per
    component, no hex round-trip). Same distribution, NOT cross-engine
    portable — use for bulk pipelines, not oracle-checked tests."""
    t = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (
                F.pmod(F.xxhash64(t, j), F.lit(2**32)).cast("double") / F.lit(TWO_32)
            )
            * 2.0
            - 1.0
        ).cast("float"),
    )


#: Embedder registry — the swappable-generator surface
#: (EmbeddingGenerator.cs:170-187, SearchService.cs:22-27).
EMBEDDERS = {
    "hash": hash_embedding,
    "hash_fast": hash_embedding_fast,
}
