"""Cross-document line dedup (C4/RefinedWeb discipline) — DuckDB twin +
semantics tests on synthetic multi-line docs (the driver corpus is
single-line, so line granularity only shows on constructed data)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators.dedup import duplicated_line_stats, line_dedup

DOCS = [
    (1, "COOKIE BANNER\nunique content of page one\nall rights reserved\n"),
    (2, "COOKIE BANNER\nsecond page says other things\nall rights reserved"),
    (3, "third page has only its own words\nand another private line"),
    (4, "COOKIE BANNER\nall rights reserved"),  # fully boilerplate
    (5, "  COOKIE BANNER  \npadded but same after trim"),  # trim-equal line
    (6, "\n\nonly content here"),  # leading empty lines never candidates
    (7, None),  # null text must SURVIVE as '' (round 7 — was silently dropped)
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").cache()
    df.count()
    yield df
    df.unpersist()


def _oracle(min_docs: int, keep_first: bool, min_line_chars: int = 1):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    drop_cond = "c.t IS NOT NULL"
    if keep_first:
        drop_cond += " AND l.doc_id != c.fd"
    rows = con.sql(
        f"""
WITH lines AS (
  SELECT doc_id, u.pos, u.line FROM (
    SELECT doc_id,
           unnest(list_transform(string_split(coalesce(text, ''), chr(10)),
                                 (x, i) -> {{'pos': i - 1, 'line': x}})) AS u
    FROM docs
  )
),
c AS (
  SELECT trim(line) AS t, count(DISTINCT doc_id) AS nd, min(doc_id) AS fd
  FROM lines WHERE length(trim(line)) >= {min_line_chars}
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
),
tagged AS (
  SELECT l.doc_id, l.pos, l.line,
         (length(trim(l.line)) >= {min_line_chars} AND {drop_cond}) AS drop
  FROM lines l LEFT JOIN c ON trim(l.line) = c.t
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT drop THEN line END, chr(10) ORDER BY pos), '') AS text,
       count(*) AS n_lines,
       sum(CASE WHEN drop THEN 1 ELSE 0 END) AS n_removed
FROM tagged GROUP BY doc_id ORDER BY doc_id
"""
    ).fetchall()
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


@pytest.mark.parametrize("min_docs,keep_first", [(2, False), (2, True), (3, False)])
def test_line_dedup_matches_duckdb_twin(spark, docs, min_docs, keep_first):
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in line_dedup(docs, min_docs=min_docs, keep_first=keep_first).collect()
    }
    assert got == _oracle(min_docs, keep_first)


def test_line_dedup_semantics(spark, docs):
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}  # every doc survives as a row
    assert out[7].text == "" and out[7].n_removed == 0  # null text -> ''
    # boilerplate removed everywhere; unique lines intact, order preserved
    assert out[1].text == "unique content of page one\n"
    assert out[2].text == "second page says other things"
    assert out[3].text == "third page has only its own words\nand another private line"
    assert out[4].text == ""  # fully boilerplate -> empty, not dropped
    assert out[4].n_removed == 2
    # trim-equal lines share a key but surviving text keeps original bytes
    assert out[5].text == "padded but same after trim"
    # empty lines are never candidates and survive the rebuild
    assert out[6].text == "\n\nonly content here"
    assert out[6].n_removed == 0


def test_line_dedup_keep_first(spark, docs):
    out = {r.doc_id: r.text for r in line_dedup(docs, keep_first=True).collect()}
    # min-id doc keeps the line verbatim; later docs lose it
    assert out[1].startswith("COOKIE BANNER\n")
    assert "COOKIE BANNER" not in out[2]
    assert "COOKIE BANNER" not in out[4]
    assert "all rights reserved" in out[1]
    assert "all rights reserved" not in out[2]


def test_duplicated_line_stats(spark, docs):
    rows = duplicated_line_stats(docs).collect()
    by_line = {r.line: (r.n_docs, r.n_occurrences) for r in rows}
    # trim-equality folds doc 5's padded variant into the count
    assert by_line["COOKIE BANNER"] == (4, 4)
    assert by_line["all rights reserved"] == (3, 3)
    assert list(by_line)[0] == "COOKIE BANNER"  # ordered by n_docs desc
    assert all(r.n_docs >= 2 for r in rows)
