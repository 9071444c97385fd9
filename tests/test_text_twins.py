"""Regression guard: every text/embedding/id function must stay value-
identical to its DuckDB twin — the property the whole oracle gate rests on.
Exercises edge shapes the documents corpus doesn't (empty-ish strings,
heavy punctuation, repeated tokens, multi-space)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from neighborly_spark.functions import text as T
from neighborly_spark.functions.embedding import hash_embedding, hash_embedding_duckdb_sql
from neighborly_spark.functions.ids import deterministic_id, deterministic_id_duckdb_sql
from neighborly_spark.operators.dedup import (
    minhash_sig_duckdb_sql,
    simhash,
    simhash_duckdb_sql,
)

SAMPLES = [
    "The quick brown fox, and the lazy dog!",
    "der hund ist nicht mit der katze",
    "el perro es un animal que no se va",
    "  spark   JOIN  merge   sort  ",
    "x",
    "one two",
    "a a a a a a",
    "!!! ??? ... ;;;",
    "MiXeD CaSe ToKeNs MiXeD CaSe",
]

PAIRS = [
    ("tokens", lambda c: T.tokens(c), lambda t: T.tokens_duckdb_sql(t)),
    ("token_count", lambda c: T.token_count(c), lambda t: T.token_count_duckdb_sql(t)),
    ("bpe_count", lambda c: T.bpe_ish_token_count(c), lambda t: T.bpe_ish_token_count_duckdb_sql(t)),
    ("stopword_ratio", lambda c: F.round(T.stopword_ratio(c), 6), lambda t: f"round({T.stopword_ratio_duckdb_sql(t)}, 6)"),
    ("lang_id", lambda c: T.lang_id(c), lambda t: T.lang_id_duckdb_sql(t)),
    ("punct_ratio", lambda c: F.round(T.punct_ratio(c), 6), lambda t: f"round({T.punct_ratio_duckdb_sql(t)}, 6)"),
    ("distinct_ratio", lambda c: F.round(T.distinct_token_ratio(c), 6), lambda t: f"round({T.distinct_token_ratio_duckdb_sql(t)}, 6)"),
    ("quality", lambda c: F.round(T.quality_score(c), 6), lambda t: f"round({T.quality_score_duckdb_sql(t)}, 6)"),
    # fused single-tokenization struct must equal the standalone functions
    ("fused_n_tokens", lambda c: T.text_stats_exprs(c)["n_tokens"], lambda t: T.token_count_duckdb_sql(t)),
    ("fused_lang", lambda c: T.text_stats_exprs(c)["lang_pred"], lambda t: T.lang_id_duckdb_sql(t)),
    ("fused_sw_ratio", lambda c: F.round(T.text_stats_exprs(c)["stopword_ratio"], 6), lambda t: f"round({T.stopword_ratio_duckdb_sql(t)}, 6)"),
    ("fused_quality", lambda c: F.round(T.text_stats_exprs(c)["quality"], 6), lambda t: f"round({T.quality_score_duckdb_sql(t)}, 6)"),
    ("fingerprint", lambda c: T.fingerprint(c), lambda t: T.fingerprint_duckdb_sql(t)),
    ("hash32", lambda c: T.hash32(c), lambda t: T.hash32_duckdb_sql(t)),
    ("shingles2", lambda c: T.shingles(c, 2), lambda t: T.shingles_duckdb_sql(t, 2)),
    ("shingles3", lambda c: T.shingles(c, 3), lambda t: T.shingles_duckdb_sql(t, 3)),
    ("simhash", lambda c: simhash(c), lambda t: simhash_duckdb_sql(t)),
    ("embed4", lambda c: hash_embedding(c, 4), lambda t: hash_embedding_duckdb_sql(t, 4)),
    ("det_id", lambda c: deterministic_id(c), lambda t: deterministic_id_duckdb_sql(t)),
]


def _norm(v):
    return list(v) if isinstance(v, (list, tuple)) else v


@pytest.mark.parametrize("name,sexpr,dsql", PAIRS, ids=[p[0] for p in PAIRS])
def test_twin_identical(spark, name, sexpr, dsql):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["t"])
    got = [_norm(r.v) for r in df.select(sexpr(F.col("t")).alias("v")).collect()]
    con = duckdb.connect()
    vals = "(VALUES " + ",".join("('" + s.replace("'", "''") + "')" for s in SAMPLES) + ") v(t)"
    want = [_norm(r[0]) for r in con.sql(f"SELECT {dsql('t')} FROM {vals}").fetchall()]
    assert got == want, name


def test_minhash_sig_twin(spark):
    from neighborly_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], ["doc_id", "text"])
    got = {r._id: list(r.sig) for r in minhash_signatures(df, num_perm=8).collect()}
    con = duckdb.connect()
    vals = "(VALUES " + ",".join(f"({i}, '" + s.replace("'", "''") + "')" for i, s in enumerate(SAMPLES)) + ") v(doc_id, text)"
    sh = T.shingles_duckdb_sql("text", 3)
    want = dict(
        con.sql(
            f"SELECT doc_id, {minhash_sig_duckdb_sql(sh, 8)} FROM {vals} WHERE len({sh}) > 0"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], k


def test_bm25_hand_computed(spark):
    """BM25 against a hand-computed 3-doc corpus (Lucene idf form)."""
    import math

    from neighborly_spark.operators.text_search import bm25_topk

    docs = [(1, "apple banana apple"), (2, "banana cherry"), (3, "durian elderberry fig")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r.score for r in bm25_topk(df, "apple banana", k=3).collect()}

    def expected(tf_counts, dl):
        n, avgdl, k1, b = 3, 8 / 3, 1.2, 0.75
        dfreq = {"apple": 1, "banana": 2}
        s = 0.0
        for term in ["apple", "banana"]:
            idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1)
            tf = tf_counts.get(term, 0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        return round(s, 6)

    assert out[1] == pytest.approx(expected({"apple": 2, "banana": 1}, 3), abs=1e-6)
    assert out[2] == pytest.approx(expected({"banana": 1}, 2), abs=1e-6)
    assert 3 not in out  # no query terms -> score 0 -> filtered


def test_chunk_documents_windows(spark):
    from neighborly_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "a b c")], "doc_id int, text string"
    )
    rows = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
            for r in chunk_documents(df, chunk_tokens=3, overlap=1).collect()}
    assert rows[(1, 0)] == ("a b c", 3)
    assert rows[(1, 1)] == ("c d e", 3)   # stride 2, tail window complete
    assert rows[(2, 0)] == ("x", 1)       # short doc -> one short chunk
    assert rows[(3, 0)] == ("a b c", 3) and (3, 1) not in rows  # exact fit -> one chunk
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=3, overlap=3)


def test_vocab_topk_counts(spark):
    from neighborly_spark.operators.corpus import vocab_topk

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b b")], "doc_id int, text string"
    )
    rows = [(r.token, r.n_total, r.n_docs) for r in vocab_topk(df, k=10).collect()]
    assert rows == [("b", 4, 2), ("a", 3, 2), ("c", 1, 1)]


def test_hybrid_search_rrf_hand_computed(spark):
    from neighborly_spark.operators.text_search import hybrid_search_rrf

    lexical = spark.createDataFrame(
        [(1, 2.0), (2, 1.5), (3, 1.0)], "doc_id int, score double"
    )
    semantic = spark.createDataFrame(
        [(2, 0.1), (4, 0.2)], "doc_id int, dist double"
    )
    out = {r.doc_id: r.rrf_score for r in hybrid_search_rrf(lexical, semantic, k=4).collect()}
    # ranks: lex 1->1, 2->2, 3->3; sem 2->1, 4->2
    assert out[2] == round(1 / 62 + 1 / 61, 6)   # in both lists
    assert out[1] == round(1 / 61, 6)
    assert out[4] == round(1 / 62, 6)
    assert out[3] == round(1 / 63, 6)
    top = sorted(out.items(), key=lambda t: (-t[1], t[0]))[0][0]
    assert top == 2  # fusion promotes the doc present in both lists


def test_winnow_fingerprints_twin_and_guarantee(spark):
    """Winnowing fingerprints: bit-identical Spark/DuckDB sets on the
    documents corpus, empty for sub-k texts, and the winnowing guarantee —
    docs sharing a substring of length >= w + k - 1 share a fingerprint."""
    from neighborly_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_duckdb_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(F.col("doc_id") < 50)
    got = {
        r.doc_id: list(r.fp)
        for r in docs.select("doc_id", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT doc_id, {winnow_fingerprints_duckdb_sql('text')} AS fp "
        f"FROM '/root/testdata/sf0.01/documents.parquet' "
        f"WHERE doc_id < 50 ORDER BY doc_id"
    )
    oracle = {r[0]: list(r[1]) for r in con.sql(sql).fetchall()}
    assert got == oracle and len(got) == 50

    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river"),
        (2, "XX the quick brown fox jumps over the lazy dog YY"),
        (3, "entirely different content with no shared phrasing at all"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {
        r.doc_id: set(r.fp)
        for r in df.select("doc_id", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    assert fp[1] & fp[2]          # long shared substring -> common fingerprint
    assert not (fp[1] & fp[3])    # unrelated -> disjoint
    assert fp[4] == set()         # shorter than k


def test_winnow_neardup_pairs(spark):
    from neighborly_spark.operators.dedup import winnow_neardup_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river bank"),
        (2, "the quick brown fox jumps over the lazy dog by the river bend"),
        (3, "completely unrelated text talking about something else entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.winnow_jaccard for r in winnow_neardup_pairs(df, threshold=0.3).collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.5
    assert all(3 not in pair for pair in got)


def test_winnow_python_engine_bit_identical(spark):
    """The hashlib mapInPandas fingerprint tier (engine='python', the
    bench/serving path — removes ~len(text) interpreted-HOF md5 lambdas per
    doc) produces BIT-IDENTICAL fingerprint sets and the same scored pairs
    as the expression tier on the real corpus — unlike the recall-gated
    vectorized ANN tiers, this twin is exact (hashlib.md5 == Spark md5,
    same normalization, same window minima)."""
    from neighborly_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_table,
    )
    from neighborly_spark.operators.dedup import winnow_neardup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    expr = {
        r.doc_id: list(r.fp)
        for r in docs.select("doc_id", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    py = {r.doc_id: list(r._fp) for r in winnow_fingerprints_table(docs, "doc_id", "text").collect()}
    assert expr == py

    # edge shapes: sub-k text (empty), text with <= w grams (single window),
    # whitespace runs, None
    rows = [(1, "tiny"), (2, "exactly09"), (3, "a  b\t c\nd   e f g h i j"), (4, None)]
    edge = spark.createDataFrame(rows, "doc_id long, text string")
    e1 = {
        r.doc_id: list(r.fp)
        for r in edge.select("doc_id", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    e2 = {r.doc_id: list(r._fp) for r in winnow_fingerprints_table(edge, "doc_id", "text").collect()}
    assert e1 == e2  # including None text -> [] in BOTH tiers

    pa = {
        (r.id_a, r.id_b, r.winnow_jaccard)
        for r in winnow_neardup_pairs(docs, threshold=0.3, engine="python").collect()
    }
    pb = {
        (r.id_a, r.id_b, r.winnow_jaccard)
        for r in winnow_neardup_pairs(docs, threshold=0.3, engine="expr").collect()
    }
    assert pa == pb


GOPHER_DOCS = [
    (1, "the cat sat on the mat and it was that good to have tea with " * 5),
    (2, "short doc"),                                     # word count < 50
    (3, "- bullet one\n- bullet two\n- bullet three"),    # all bullet lines
    (4, ("trailing thoughts...\nmore trailing...\nfinal line is fine and "
         "the rest of this text has plenty of words " * 3)),
    (5, "#### symbols #### everywhere #### " * 20),       # symbol-heavy
    (6, "12345 67890 11111 22222 33333 " * 20),           # no alphabetic words
    (7, ""),                                              # empty
]


def test_gopher_quality_flags_twin(spark):
    """Gopher A1.1 rule flags: bit-identical struct fields in both engines
    on synthetic rule-violating docs AND the real corpus."""
    from neighborly_spark.functions.text import (
        gopher_quality_flags,
        gopher_quality_flags_duckdb_sql,
    )

    fields = [
        "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "stopword_hits", "keep",
    ]

    def norm(v):
        import math
        return "nan" if isinstance(v, float) and math.isnan(v) else v

    df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: tuple(norm(r.g[f]) for f in fields)
        for r in df.select("doc_id", gopher_quality_flags(F.col("text")).alias("g")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", GOPHER_DOCS)
    rows = con.sql(
        f"SELECT doc_id, {gopher_quality_flags_duckdb_sql('text')} AS g FROM docs"
    ).fetchall()
    oracle = {r[0]: tuple(norm(r[1][f]) for f in fields) for r in rows}
    assert got == oracle
    # the rules actually fire where designed
    keep = {d: got[d][-1] for d in got}
    assert keep[1] is True
    assert keep[2] is False    # word count
    assert keep[3] is False    # bullets
    assert keep[5] is False    # symbols
    assert keep[6] is False    # no alpha words

    real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    got_r = {
        r.doc_id: tuple(norm(r.g[f]) for f in fields)
        for r in real.select("doc_id", gopher_quality_flags(F.col("text")).alias("g")).collect()
    }
    con2 = duckdb.connect()
    rows_r = con2.sql(
        f"SELECT doc_id, {gopher_quality_flags_duckdb_sql('text')} AS g "
        f"FROM '/root/testdata/sf0.01/documents.parquet' WHERE doc_id < 200"
    ).fetchall()
    oracle_r = {r[0]: tuple(norm(r[1][f]) for f in fields) for r in rows_r}
    assert got_r == oracle_r and len(got_r) == 200
