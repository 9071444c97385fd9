"""CRUD-as-batch + tag operations — P1-P9 (SURVEY §2.2).

The reference mutates an in-memory list under locks (VectorList.cs); the
scalable equivalent is batch set algebra over immutable DataFrames:

- P1 add / add_range      -> union (at scale: append partitions)
- P2 update by id         -> upsert = anti-join + union
- P3 remove / remove_by_id / clear -> anti-join / empty
- P4 get by id            -> filter (point lookup; pushed to the scan)
- P5 find / find_all      -> filter (+ limit 1)
- P6 contains             -> left-semi join (position/IndexOf is meaningless
                              in an unordered distributed table — membership
                              only, per SURVEY P6)
- P7 tombstone/defrag     -> not needed (immutable parquet rewrite)
- P8 tag dictionary        -> broadcast dim table (VectorTags.cs:16-17)
- P9 tag filtering         -> array predicates; inverted map = explode+groupBy
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --- row CRUD -----------------------------------------------------------------


def add(df: DataFrame, new_rows: DataFrame) -> DataFrame:
    """P1: AddVector/AddRange (VectorDatabase.cs:37-50)."""
    return df.unionByName(new_rows, allowMissingColumns=True)


def upsert(df: DataFrame, updates: DataFrame, id_col: str = "id") -> DataFrame:
    """P2: update-by-id preserving ids (VectorDatabase.cs:58-71) — rows in
    `updates` replace same-id rows, new ids append."""
    return df.join(updates.select(id_col), on=id_col, how="left_anti").unionByName(updates)


def remove_by_id(df: DataFrame, ids: DataFrame | list, id_col: str = "id") -> DataFrame:
    """P3: RemoveById/RemoveRange (VectorDatabase.cs:78-91)."""
    if isinstance(ids, list):
        return df.filter(~F.col(id_col).isin(ids))
    return df.join(ids.select(id_col), on=id_col, how="left_anti")


def clear(df: DataFrame) -> DataFrame:
    """P3: Clear — empty table, schema preserved."""
    return df.limit(0)


def get_by_id(df: DataFrame, vec_id, id_col: str = "id") -> DataFrame:
    """P4: point lookup (VectorDatabase.cs:98-109). The id filter is pushed
    into the parquet scan (PushedFilters) — at scale this reads only row
    groups whose stats admit the id."""
    return df.filter(F.col(id_col) == F.lit(vec_id))


def find(df: DataFrame, predicate: Column) -> DataFrame:
    """P5: Find — first matching row (VectorList.cs:80-83)."""
    return df.filter(predicate).limit(1)


def find_all(df: DataFrame, predicate: Column) -> DataFrame:
    """P5: FindAll (VectorList.cs:85-88)."""
    return df.filter(predicate)


def contains(df: DataFrame, other: DataFrame, id_col: str = "id") -> DataFrame:
    """P6: membership via left-semi join."""
    return df.join(other.select(id_col), on=id_col, how="left_semi")


# --- tag dictionary (P8) --------------------------------------------------------

MAX_TAGS = 32767  # short ids (VectorTags.cs:49-66)


def build_tag_dim(df: DataFrame, tag_text_col: str = "tag") -> DataFrame:
    """Build the tag dictionary from raw tag strings: lowercase, trim,
    distinct, sequential short ids from 1 in first-seen (here: sorted)
    order — parity with VectorTags.Add (VectorTags.cs:47-66).

    The global row_number is a single tiny shuffle of the DISTINCT tag set
    (bounded at 32767 rows), not of the data.
    """
    tags = (
        df.select(F.trim(F.lower(F.col(tag_text_col))).alias("tag"))
        .filter(F.col("tag") != "")
        .distinct()
    )
    w = Window.orderBy("tag")
    return tags.withColumn("tag_id", F.row_number().over(w).cast("smallint")).select(
        "tag_id", "tag"
    )


def resolve_tags(df: DataFrame, tag_dim: DataFrame, tags_col: str = "tags") -> DataFrame:
    """P8 GetRangeAsString: attach `tag_names: array<string>` via the
    broadcast dictionary. The id array is resolved ELEMENT-WISE over the
    DISTINCT tag arrays — explode -> broadcast-join -> regroup keyed by
    the array VALUE itself — then joined back onto the rows by that value.

    Why this shape: a surrogate monotonically_increasing_id row key (the
    previous formulation) is nondeterministic — evaluated independently on
    the two sides of its self-join, any shuffle/retry/AQE reorder can
    assign different ids and silently mis-pair tag_names with rows
    (round-2 ADVICE crud.py:107). The array value is a deterministic key,
    row multiplicity is preserved (every duplicate row joins its array's
    resolution), and the explode/regroup work shrinks to |distinct arrays|
    instead of |rows|. Null arrays resolve to [] (posexplode_outer's
    behavior in the original)."""
    arrs = df.select(F.col(tags_col).alias("_arr")).filter(F.col("_arr").isNotNull()).distinct()
    pos = arrs.select("_arr", F.posexplode_outer("_arr").alias("_pos", "_tag_id"))
    joined = pos.join(
        F.broadcast(tag_dim.withColumnRenamed("tag_id", "_tag_id")), on="_tag_id", how="left"
    )
    regrouped = joined.groupBy("_arr").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_pos").alias("pos"), F.col("tag").alias("tag")))
        ).alias("_ordered")
    )
    resolved = regrouped.select(
        "_arr",
        F.transform(
            # posexplode_outer emits one null-pos row for empty arrays -> drop it
            F.filter(F.col("_ordered"), lambda s: s["pos"].isNotNull()), lambda s: s["tag"]
        ).alias("tag_names"),
    )
    out = df.join(resolved, df[tags_col] == resolved["_arr"], "left").drop("_arr")
    return out.withColumn(
        "tag_names", F.coalesce(F.col("tag_names"), F.lit([]).cast("array<string>"))
    )


# --- tag filtering (P9) -----------------------------------------------------------


def filter_by_tag(df: DataFrame, tag_id: int, tags_col: str = "tags") -> Column | DataFrame:
    """GetVectorIdsByTag: rows carrying one tag."""
    return df.filter(F.array_contains(F.col(tags_col), tag_id))


def filter_by_all_tags(df: DataFrame, tag_ids: list[int], tags_col: str = "tags") -> DataFrame:
    """ByTags (AND): rows carrying every tag (tagging_explained.md:58-64)."""
    arr = F.lit(tag_ids).cast("array<smallint>")
    return df.filter(F.size(F.array_except(arr, F.col(tags_col))) == 0)


def filter_by_any_tag(df: DataFrame, tag_ids: list[int], tags_col: str = "tags") -> DataFrame:
    """ByAnyTag (OR): rows carrying at least one."""
    arr = F.lit(tag_ids).cast("array<smallint>")
    return df.filter(F.arrays_overlap(F.col(tags_col), arr))


def inverted_tag_map(df: DataFrame, id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """P9 BuildMap (VectorTags.cs:171-194): tag_id -> sorted vector ids."""
    return (
        df.select(F.col(id_col), F.explode(F.col(tags_col)).alias("tag_id"))
        .groupBy("tag_id")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("vector_ids"))
    )
