"""Deterministic id generation.

The reference auto-generates `Guid.NewGuid()` per vector (Vector.cs:56) —
nondeterministic, which SURVEY §7.3 flags as a reproducibility hazard. The
engine accepts caller-supplied ids everywhere; when it must mint them, it
uses a uuid5-style deterministic derivation from content (md5 of a
namespace + payload, formatted as a canonical lowercase UUID with the
version nibble set to 3 — RFC 4122 name-based, md5 variant), identical in
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_NAMESPACE = "neighborly-spark"


def deterministic_id(content: Column, namespace: str = DEFAULT_NAMESPACE) -> Column:
    """Canonical lowercase UUID string derived from md5(namespace:content)."""
    h = F.md5(F.concat(F.lit(namespace + ":"), content))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),  # version nibble = 3
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def deterministic_id_duckdb_sql(content_expr: str, namespace: str = DEFAULT_NAMESPACE) -> str:
    h = f"md5('{namespace}:' || {content_expr})"
    return (
        f"concat_ws('-', substr({h},1,8), substr({h},9,4), "
        f"'3' || substr({h},14,3), substr({h},17,4), substr({h},21,12))"
    )
