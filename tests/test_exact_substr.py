"""ExactSubstr duplicated-span removal (Lee et al. 2022) — DuckDB twin +
guarantee tests. The paper's tool is a single-machine suffix array; the
operator is the distributed window-hash rendering (see
operators/dedup.exact_substr_spans docstring), exact for duplicated runs of
>= min_tokens tokens."""

import duckdb
import pytest

from neighborly_spark.operators.dedup import (
    exact_substr_dedup,
    exact_substr_spans,
    exact_substr_spans_duckdb_sql,
)

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
DOCS = [
    (1, f"start one two {SHARED} tail x y z"),
    (2, f"{SHARED} something entirely different here now ok"),
    (3, "no duplicated content at all in this document whatsoever friend"),
    (4, f"double {SHARED} middle bit {SHARED} end"),  # within-doc repeat
    (5, "alpha bravo charlie delta echo foxtrot golf misses one token pad"),
    (6, SHARED),  # doc that IS the duplicated run -> fully removed
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").cache()
    df.count()
    yield df
    df.unpersist()


def _twin_spans_sql(L: int, min_count: int = 2) -> str:
    # the shared builder used by the parity gate (repetition_stats leg)
    return exact_substr_spans_duckdb_sql("docs", L, min_count)


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    return con


def test_spans_twin(docs):
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in exact_substr_spans(docs, min_tokens=8).collect()
    }
    con = _con()
    oracle = {tuple(r) for r in con.sql(_twin_spans_sql(8)).fetchall()}
    assert got == oracle and got  # non-trivial


def test_spans_twin_real_corpus(spark):
    """Twin equality on the real (low-vocabulary, hence span-dense) corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        "doc_id < 100"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in exact_substr_spans(docs, min_tokens=4).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW docs AS SELECT doc_id, text "
        "FROM '/root/testdata/sf0.01/documents.parquet' WHERE doc_id < 100"
    )
    # min_tokens=4: the corpus' shortest duplicated runs (measured: 23 spans
    # at L=4, zero at L>=5 over these 100 docs) — small L exercises the
    # dense-window path the paper-default L=50 never would here
    oracle = {tuple(r) for r in con.sql(_twin_spans_sql(4)).fetchall()}
    assert got == oracle and got


def test_guarantee_and_semantics(docs):
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substr_spans(docs, min_tokens=8).collect()
    }
    # the 8-token shared run is found at its exact positions
    assert (1, 3, 10) in spans and (2, 0, 7) in spans and (6, 0, 7) in spans
    # within-doc repeat: BOTH occurrences marked (paper semantics)
    assert (4, 1, 8) in spans and (4, 11, 18) in spans
    # 7-token overlap (doc 5) is BELOW min_tokens: never marked
    assert all(d != 5 for d, _, _ in spans)
    assert all(d != 3 for d, _, _ in spans)


def test_dedup_rebuild(docs):
    out = {r.doc_id: r for r in exact_substr_dedup(docs, min_tokens=8).collect()}
    assert out[1].text == "start one two tail x y z"
    assert out[1].n_removed_tokens == 8 and out[1].n_tokens == 15
    assert out[3].n_removed_tokens == 0
    assert out[4].text == "double middle bit end" and out[4].n_removed_tokens == 16
    assert out[6].text == "" and out[6].n_removed_tokens == 8  # fully-dup doc survives empty
    # untouched docs keep every token (modulo whitespace canonicalization)
    assert out[5].text == DOCS[4][1]


def test_merged_adjacent_spans(spark):
    """A duplicated run LONGER than min_tokens merges its windows into one
    maximal span covering the whole run."""
    run = " ".join(f"tok{i}" for i in range(14))  # 14-token duplicated run
    df = spark.createDataFrame(
        [(1, f"pre {run} post"), (2, f"{run} zz yy xx ww vv uu tt ss")],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in exact_substr_spans(df, min_tokens=8).collect()
    }
    # doc 1: run occupies tokens 1..14 -> 7 windows merged into one span
    assert (1, 1, 14, 7) in spans and (2, 0, 13, 7) in spans
    assert len(spans) == 2


def test_shingle_python_engine_bit_identical(spark):
    """hashed_shingle_sets_table (the hashlib mapInPandas tier feeding the
    Jaccard AND MinHash bench paths) equals the expression tier
    element-for-element on the real corpus and edge shapes, and both
    pipelines emit the same scored pairs either way."""
    from pyspark.sql import functions as F  # noqa: F401

    from neighborly_spark.operators.dedup import (
        hashed_shingle_sets,
        hashed_shingle_sets_table,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    rows = [
        (1, "tiny"),
        (2, "a b c"),
        (3, "a  b\t c\nd"),
        (4, None),
        (5, " x y z w "),
        # unicode case-mapping parity: final sigma, dotted I, sharp s —
        # Python str.lower() and Spark lower() agree (probed empirically)
        (6, "ΑΣ ΒΗΤΑ ΣΙΓΜΑ ΤΕΛΟΣ"),
        (7, "İstanbul IJssel STRASSE ß ok"),
    ]
    edge = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r._id: list(r._sh) for r in hashed_shingle_sets(edge).collect()}
    b = {r._id: list(r._sh) for r in hashed_shingle_sets_table(edge).collect()}
    assert a == b

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        "doc_id < 300"
    )
    a = {r._id: list(r._sh) for r in hashed_shingle_sets(docs).collect()}
    b = {r._id: list(r._sh) for r in hashed_shingle_sets_table(docs).collect()}
    assert a == b and len(a) == 300

    pa = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.3, engine="python").collect()
    }
    pb = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.3, engine="expr").collect()
    }
    assert pa == pb and pa
    ma = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.3, engine="python").collect()
    }
    mb = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.3, engine="expr").collect()
    }
    assert ma == mb and ma


def test_spans_python_engine_bit_identical(spark):
    """engine='python' (hashlib window hashes, the parity/serving tier)
    produces the identical span set as the expression tier."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        "doc_id < 200"
    )
    a = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in exact_substr_spans(docs, min_tokens=4).collect()
    }
    b = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in exact_substr_spans(docs, min_tokens=4, engine="python").collect()
    }
    assert a == b and a


def test_null_text_and_dedup_counts(spark):
    """Null-text docs survive exact_substr_dedup with text='' and ZERO
    counts (size(null) = -1 would otherwise leak negative token counts)."""
    rows = [(1, None), (2, "real words here definitely present")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in exact_substr_dedup(df, min_tokens=4).collect()}
    assert out[1].text == "" and out[1].n_tokens == 0 and out[1].n_removed_tokens == 0
    assert out[2].n_tokens == 5 and out[2].n_removed_tokens == 0
