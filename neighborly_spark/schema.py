"""Canonical schemas for the engine's tables.

The reference's data model is a single flat collection of Vector records
(reference: Neighborly/Vector.cs:25-47, Neighborly/VectorAttributes.cs:9-11).
Spark mapping per SURVEY.md §1.5: one `vectors` DataFrame with fixed schema;
dimension is table-level metadata enforced by a validator (the reference
checks dimensions pairwise at operation time, Vector.cs:451-457 — we enforce
it table-wide up front, which is the scalable equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    FloatType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

#: The `vectors` table — Spark image of Neighborly/Vector.cs:25-47.
VECTORS_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("embedding", ArrayType(FloatType(), containsNull=False), nullable=False),
        StructField("tags", ArrayType(ShortType(), containsNull=False), nullable=True),
        StructField("original_text", StringType(), nullable=True),
        # VectorAttributes (Neighborly/VectorAttributes.cs:9-11):
        # Priority: sbyte, UserId: uint, OrgId: uint (widened to long).
        StructField("priority", ByteType(), nullable=True),
        StructField("user_id", LongType(), nullable=True),
        StructField("org_id", LongType(), nullable=True),
    ]
)

#: Tag dictionary (Neighborly/VectorTags.cs:16-17) as a broadcastable dim table.
TAG_DIM_SCHEMA = StructType(
    [
        StructField("tag_id", ShortType(), nullable=False),
        StructField("tag", StringType(), nullable=False),
    ]
)


def validate_dim(df: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Fail rows whose embedding length != dim.

    Returns the offending rows (empty DataFrame == valid). The reference
    throws on pairwise mismatch (Vector.cs:451-457); at scale we surface the
    violations as data instead of failing the job on the first bad row.
    """
    return df.filter(F.size(F.col(vec_col)) != F.lit(dim))


def assert_dim(df: DataFrame, dim: int, vec_col: str = "embedding") -> None:
    """Raise ValueError if any row violates the fixed dimension."""
    bad = validate_dim(df, dim, vec_col).limit(1).count()
    if bad:
        raise ValueError(f"embedding dimension violation: expected size {dim} in column {vec_col!r}")
