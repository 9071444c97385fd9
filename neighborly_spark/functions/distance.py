"""Distance / vector scalar functions as Spark Column expressions.

This is the engine's equivalent of the reference's IDistanceCalculator
surface (reference: Neighborly/Distance/IDistanceCalculator.cs:6-16) plus the
element-wise Vector operators (Neighborly/Vector.cs:209-319).

Everything here is a *pure Column expression* built from higher-order array
functions (zip_with / aggregate / transform) — it runs JVM-side inside
whole-stage codegen, no Python in the hot path. That replaces the
reference's SIMD kernels (Distance/Simd*.cs, CacheOptimizedDistanceCalculators.cs)
with Tungsten codegen: physically different, numerically identical.

Determinism contract (drives the DuckDB oracle in __spark_entry__.py):
- all arithmetic in float64 — each float32 element is cast to double (exact),
  then combined with the same operation order a sequential left fold gives;
- `aggregate(arr, 0.0D, (s,x) -> s+x)` is a left fold in array order, which
  matches DuckDB's `list_reduce(arr, (s,x) -> s+x)` exactly (0.0+x1 == x1);
- squares are written `d*d`, never pow(d,2), so both engines round the same.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnLike = Column


def _d(x: Column) -> Column:
    return x.cast("double")


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum in double. Matches DuckDB list_reduce order."""
    return F.aggregate(arr, F.lit(0.0), lambda s, x: s + x)


def sq_euclidean(a: Column, b: Column) -> Column:
    """Squared L2 — the internal building block (no sqrt)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))))


def euclidean(a: Column, b: Column) -> Column:
    """L2 distance: sqrt(sum((a-b)^2)).

    Parity: Distance/EuclideanDistanceCalculator.cs:15-25 (the reference's
    default metric everywhere).
    """
    return F.sqrt(sq_euclidean(a, b))


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: _d(x) * _d(y)))


def magnitude(a: Column) -> Column:
    """L2 norm. Parity: Vector.cs:270-273."""
    return F.sqrt(_fold_sum(F.transform(a, lambda x: _d(x) * _d(x))))


def normalize(a: Column) -> Column:
    """L2-normalize an embedding array (zero vectors pass through
    unchanged — dividing by 0 would NaN-poison downstream math).

    The cosine bridge to every euclidean-only ANN structure (MLlib
    BRP-LSH, IVF, BQ): on unit vectors ``||a-b||^2 = 2 - 2*cos(a,b)``, so
    euclidean ranking over normalized vectors IS cosine ranking. Normalize
    the table once at index build, normalize each query, search euclidean.

    The norm is LET-BOUND via a one-element transform (same fix as
    v_normalize): referencing magnitude(a) inside the per-element lambda
    re-folds the whole array per element — Catalyst does not CSE across
    lambda bodies, so the inline form is O(dim^2) interpreted work per
    row (measured ~30x wall on a 64-dim 150k-row normalize scan:
    16.5-27 s inline vs 0.5-0.85 s let-bound). Values are bit-identical —
    the expression tree differs only in how often the fold evaluates.
    """

    def body(m: Column) -> Column:
        safe = F.when(m == 0.0, F.lit(1.0)).otherwise(m)
        return F.transform(a, lambda x: (_d(x) / safe).cast("float"))

    return F.element_at(F.transform(F.array(magnitude(a)), body), 1)


def cosine(a: Column, b: Column) -> Column:
    """Cosine *similarity* — dot/(|a||b|).

    PARITY QUIRK (intentional, do not "fix"): the reference's
    CosineSimilarityCalculator returns similarity yet is consumed as a
    *distance* by threshold/range filters
    (Distance/CosineSimilarityCalculator.cs:8-22, consumed at
    Search/LinearRangeSearch.cs:41-46). We replicate that behavior: metric
    name 'cosine' returns similarity, and callers order/filter on it as if it
    were a distance.

    Zero-magnitude inputs: C# float division yields NaN for 0/0
    (the reference does no guard); we reproduce NaN explicitly since
    Spark's ANSI mode would otherwise raise DIVIDE_BY_ZERO.
    """
    denom = magnitude(a) * magnitude(b)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(dot(a, b) / denom)


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity — the conventional distance, used by the dedup
    and ANN operators where we want a true distance (not a parity surface)."""
    return F.lit(1.0) - cosine(a, b)


def manhattan(a: Column, b: Column) -> Column:
    """L1 distance. Parity: Distance/ManhattanDistanceCalculator.cs:8-18."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y))))


def chebyshev(a: Column, b: Column) -> Column:
    """L-inf distance. Parity: Distance/ChebyshevDistanceCalculator.cs:8-21."""
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y))))


def minkowski3(a: Column, b: Column) -> Column:
    """Minkowski with p=3 — the reference HARDCODES p=3
    (Distance/MinkowskiDistanceCalculator.cs:8-18); kept as-is for parity."""
    s = _fold_sum(
        F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y)) * F.abs(_d(x) - _d(y)) * F.abs(_d(x) - _d(y)))
    )
    return F.pow(s, F.lit(1.0 / 3.0))


def hamming_packed(a: Column, b: Column) -> Column:
    """Hamming distance over packed bit codes (array<long>).

    Parity: Search/BinaryQuantization.cs:28-55 (popcount of XOR over ulong[]).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda s, x: s + x.cast("long"),
    )


# --- element-wise vector ops (Vector.cs:209-319) ---------------------------


def v_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: (x + y).cast("float"))


def v_sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: (x - y).cast("float"))


def v_divide(a: Column, n: Column | float) -> Column:
    n = F.lit(n) if not isinstance(n, Column) else n
    return F.transform(a, lambda x: (x / n).cast("float"))


def v_element(a: Column, i: Column | int) -> Column:
    """0-based indexer (Vector.cs:261-265 — C# semantics)."""
    i = F.lit(i) if not isinstance(i, Column) else i
    return F.element_at(a, i + 1)


def v_equal(a: Column, b: Column) -> Column:
    """Element-wise equality, id/text excluded (Vector.cs:419-435) — the
    basis of exact dedup."""
    return a.eqNullSafe(b)


#: Metric registry — the pluggable-calculator surface
#: (Distance/IDistanceCalculator.cs:6-16 → SearchService.cs:201-251).
METRICS: dict[str, Callable[[Column, Column], Column]] = {
    "euclidean": euclidean,
    "cosine": cosine,  # similarity-as-distance parity quirk, see cosine()
    "cosine_distance": cosine_distance,
    "manhattan": manhattan,
    "chebyshev": chebyshev,
    "minkowski": minkowski3,
    "hamming": hamming_packed,
}


def metric_expr(name: str, a: Column, b: Column) -> Column:
    try:
        return METRICS[name](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {name!r}; known: {sorted(METRICS)}") from None


def v_normalize(a: Column) -> Column:
    """Unit-normalize (L2). Pre-normalizing a corpus turns cosine similarity
    into a plain dot product — the standard trick before ANN indexing.
    Zero vectors normalize to themselves (no NaN poisoning).

    The norm is LET-BOUND via a one-element transform: referencing
    magnitude(a) directly inside the per-element lambda would re-fold the
    whole array per element (no CSE across lambda bodies)."""

    def body(m: Column) -> Column:
        return F.when(m == F.lit(0.0), a).otherwise(
            F.transform(a, lambda x: (x / m).cast("float"))
        )

    return F.element_at(F.transform(F.array(magnitude(a)), body), 1)
