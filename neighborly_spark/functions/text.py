"""Text-analysis functions for training-data pipelines.

These extend the reference's surface (it has none of this beyond prefix
matching inside text search, Search/SearchService.cs:121-127) per the
driver's north star: language-ID, quality scoring, token counting, document
fingerprinting — each as a pure Column expression with a DuckDB-SQL twin
(suffix `_duckdb_sql`) so every operator built on them stays
oracle-checkable.

Determinism contract: same as functions/distance.py — identical operation
order, integer arithmetic where possible, round(…, 6) at the surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenization -----------------------------------------------------------

_WS = r"\s+"

# Python replicas of the tokenization used by the hashlib twin tiers
# (winnow_fingerprints_table, hashed_shingle_sets_table,
# _window_hashes_table): ONE definition so the "byte-identical to the
# engine" contract lives in one place. Java \s == [ \t\n\x0B\f\r];
# Python \s is wider (unicode), so the class is spelled out. F.trim strips
# SPACES only; Spark split keeps leading/trailing empty fields (limit -1),
# and so does re.split.
import re as _re

PY_WS = _re.compile("[ \t\n\x0b\f\r]+")


def py_normalize_exact(text: str) -> str:
    r"""Python replica of normalize_text (lower, trim spaces, collapse \s+).

    Caveat (applies to every engine='python' twin built on these): Python's
    str.lower() and the JVM's String.toLowerCase() agree on ASCII but can
    diverge on non-ASCII text under exotic JVM default locales (e.g.
    Turkish dotless-i) or across Unicode-table versions — a divergence the
    twin equality tests (ASCII corpus) cannot see. Corpora with non-ASCII
    case-folding-sensitive text should pin the expr tier or run the JVM
    with -Duser.language=en."""
    return PY_WS.sub(" ", text.lower().strip(" "))


def py_tokens_exact(text: str) -> list[str]:
    r"""Python replica of tokens() (split trimmed lowered text on \s+)."""
    return PY_WS.split(text.lower().strip(" "))


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), _WS)


def tokens_duckdb_sql(t: str) -> str:
    return f"string_split_regex(trim(lower({t})), '\\s+')"


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def token_count_duckdb_sql(t: str) -> str:
    return f"len({tokens_duckdb_sql(t)})"


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy count: word-piece segments of letters/digits plus
    individual punctuation marks (regex split on boundaries). Matches the
    common ~chars/4 heuristic better than whitespace for code/punct text.

    Alphabet contract: word characters are ASCII ``[a-z0-9]`` (post-lower),
    everything else counts as punctuation — the SAME class the DuckDB twin
    uses, so non-ASCII text scores identically in both engines (a Unicode
    ``\\p{L}\\p{N}`` class here would diverge from the oracle)."""
    pieces = F.split(F.lower(text), r"[^a-z0-9]+")
    words = F.filter(pieces, lambda p: p != "")
    # each word contributes ceil(len/4) subword units, punctuation 1 each
    word_units = F.aggregate(
        words, F.lit(0).cast("long"), lambda s, w: s + F.ceil(F.length(w) / 4.0).cast("long")
    )
    punct = F.length(F.regexp_replace(F.lower(text), r"[a-z0-9\s]", ""))
    return (word_units + punct).alias("bpe_tokens")


def bpe_ish_token_count_duckdb_sql(t: str) -> str:
    return (
        # list_prepend(0, ...) == the fold's init value: DuckDB's list_reduce
        # errors on empty lists (all-punctuation text has zero word pieces)
        f"(list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(list_filter(string_split_regex(lower({t}), '[^a-z0-9]+'), p -> p <> ''), "
        f"w -> CAST(ceil(len(w) / 4.0) AS BIGINT))), (s, x) -> s + x) "
        f"+ len(regexp_replace(lower({t}), '[a-z0-9\\s]', '', 'g')))"
    )


# --- stopwords / language ID ------------------------------------------------

#: Tiny ASCII-only stopword inventories, fixed order = deterministic tie-break.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den", "von", "im"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no", "los", "por"),
    "fr": ("le", "la", "de", "et", "un", "en", "une", "du", "dans", "est", "pour", "que"),
}
LANGS = tuple(STOPWORDS)  # fixed order


def _sw_hits(text: Column, words: tuple[str, ...]) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _sw_hits_duckdb_sql(t: str, words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens_duckdb_sql(t)}, x -> x IN ({inlist})))"


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    n = F.size(toks)
    hits = _sw_hits(text, STOPWORDS[lang])
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def stopword_ratio_duckdb_sql(t: str, lang: str = "en") -> str:
    toks = tokens_duckdb_sql(t)
    hits = _sw_hits_duckdb_sql(t, STOPWORDS[lang])
    return f"(CASE WHEN len({toks}) = 0 THEN 0.0 ELSE CAST({hits} AS DOUBLE) / CAST(len({toks}) AS DOUBLE) END)"


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax stopword-hit count over LANGS, ties to
    the earlier language in the fixed order; 'unknown' when no hits."""
    scores = [_sw_hits(text, STOPWORDS[lang]) for lang in LANGS]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    expr = F.lit("unknown")
    # build from last to first so earlier langs win ties
    for lang, score in reversed(list(zip(LANGS, scores))):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_duckdb_sql(t: str) -> str:
    scores = {lang: _sw_hits_duckdb_sql(t, STOPWORDS[lang]) for lang in LANGS}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    out = "'unknown'"
    for lang in reversed(LANGS):
        out = f"(CASE WHEN {scores[lang]} = {best} AND {best} > 0 THEN '{lang}' ELSE {out} END)"
    return out


# --- quality scoring ---------------------------------------------------------


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def punct_ratio_duckdb_sql(t: str) -> str:
    return (
        f"(CASE WHEN len({t}) = 0 THEN 0.0 ELSE "
        f"CAST(len(regexp_replace({t}, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) / CAST(len({t}) AS DOUBLE) END)"
    )


def distinct_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )


def distinct_token_ratio_duckdb_sql(t: str) -> str:
    toks = tokens_duckdb_sql(t)
    return (
        f"(CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
        f"CAST(len(list_distinct({toks})) AS DOUBLE) / CAST(len({toks}) AS DOUBLE) END)"
    )


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length saturation (40%), lexical
    diversity (30%), low punctuation noise (15%), stopword naturalness (15%).
    Deterministic double arithmetic, identical in the DuckDB twin."""
    length_part = F.least(token_count(text).cast("double") / 100.0, F.lit(1.0)) * 0.4
    diversity_part = distinct_token_ratio(text) * 0.3
    punct_part = (F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))) * 0.15
    natural_part = F.least(stopword_ratio(text, "en") * 2.0, F.lit(1.0)) * 0.15
    return length_part + diversity_part + punct_part + natural_part


def quality_score_duckdb_sql(t: str) -> str:
    return (
        f"(least(CAST({token_count_duckdb_sql(t)} AS DOUBLE) / 100.0, 1.0) * 0.4"
        f" + {distinct_token_ratio_duckdb_sql(t)} * 0.3"
        f" + (1.0 - least({punct_ratio_duckdb_sql(t)} * 4.0, 1.0)) * 0.15"
        f" + least({stopword_ratio_duckdb_sql(t)} * 2.0, 1.0) * 0.15)"
    )


def text_stats_exprs(text: Column) -> Column:
    """struct(n_tokens, lang_pred, stopword_ratio, quality) — every
    token-derived stat computed off ONE let-bound token array.

    The standalone functions each call tokens() themselves; composing them
    (as text_stats does) costs ~12 regex splits per row because Catalyst
    does not CSE across expressions. Binding the array as a lambda variable
    evaluates the split once. Values are expression-for-expression identical
    to token_count / lang_id / stopword_ratio(en) / quality_score — the
    DuckDB twins of those functions remain the oracle.

    CONSUMPTION PATTERN: when reading more than one field, land the struct
    in its own projection first (df.withColumn("_st", text_stats_exprs(t))
    .select(col("_st.x"), ...)). Selecting struct[field] several times in ONE
    projection inlines the whole struct per reference — HOFs get no codegen
    and no runtime subexpression elimination, so that re-tokenizes per field.
    CollapseProject keeps the two projections apart (the struct isn't cheap).
    """
    punct = punct_ratio(text)  # text-direct, no tokenization

    def body(toks: Column) -> Column:
        n = F.size(toks)
        scores = [
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))) for lang in LANGS
        ]
        best = F.greatest(*scores) if len(scores) > 1 else scores[0]
        lang_expr = F.lit("unknown")
        for lang, score in reversed(list(zip(LANGS, scores))):
            lang_expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(lang_expr)
        sw_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
            scores[0].cast("double") / n.cast("double")  # LANGS[0] == 'en'
        )
        distinct_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
            F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
        )
        quality = (
            F.least(n.cast("double") / 100.0, F.lit(1.0)) * 0.4
            + distinct_ratio * 0.3
            + (F.lit(1.0) - F.least(punct * 4.0, F.lit(1.0))) * 0.15
            + F.least(sw_ratio * 2.0, F.lit(1.0)) * 0.15
        )
        return F.struct(
            n.alias("n_tokens"),
            lang_expr.alias("lang_pred"),
            sw_ratio.alias("stopword_ratio"),
            quality.alias("quality"),
        )

    return F.element_at(F.transform(F.array(tokens(text)), body), 1)


# --- chunking -----------------------------------------------------------------


def chunks_expr(text: Column, chunk_tokens: int, overlap: int = 0) -> Column:
    """Sliding-window token chunks: array<struct<chunk_id int, chunk_text
    string, n_tokens int>> — the context-window splitter every training
    pipeline needs before embedding/packing.

    Windows start every (chunk_tokens - overlap) tokens; the last window may
    be short but is never empty; a doc with <= chunk_tokens tokens yields one
    chunk. Pure Column expression (no explode here — callers posexplode), the
    token array is let-bound so the regex split runs once per document.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap

    def body(toks: Column) -> Column:
        n = F.size(toks)
        # chunk count: 1 + ceil((n - chunk_tokens) / step) for n > chunk_tokens
        extra = F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(step)).cast("int")
        n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(1 + extra)
        windows = F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda j: F.struct(
                (j - 1).alias("chunk_id"),
                F.concat_ws(" ", F.slice(toks, (j - 1) * step + 1, chunk_tokens)).alias("chunk_text"),
                F.least(n - (j - 1) * step, F.lit(chunk_tokens)).alias("n_tokens"),
            ),
        )
        # sequence(1, 0) is DESCENDING in Spark, not empty — guard empty docs
        # here, inside the lambda, so the text tokenizes exactly once
        return F.when(
            n <= 0,
            F.array().cast("array<struct<chunk_id:int,chunk_text:string,n_tokens:int>>"),
        ).otherwise(windows)

    return F.element_at(F.transform(F.array(tokens(text)), body), 1)


def chunks_duckdb_sql(t: str, chunk_tokens: int, overlap: int = 0) -> str:
    """DuckDB twin of chunks_expr (list of structs, same fields)."""
    step = chunk_tokens - overlap
    toks = tokens_duckdb_sql(t)
    n = f"len({toks})"
    n_chunks = (
        f"(CASE WHEN {n} <= 0 THEN 0 WHEN {n} <= {chunk_tokens} THEN 1 "
        f"ELSE 1 + CAST(ceil(CAST({n} - {chunk_tokens} AS DOUBLE) / {step}) AS INT) END)"
    )
    return (
        f"list_transform(range(1, {n_chunks} + 1), j -> {{"
        f"'chunk_id': j - 1, "
        f"'chunk_text': array_to_string({toks}[(j-1)*{step}+1 : (j-1)*{step}+{chunk_tokens}], ' '), "
        f"'n_tokens': least({n} - (j-1)*{step}, {chunk_tokens})}})"
    )


# --- fingerprints / hashing ---------------------------------------------------


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.regexp_replace(F.trim(F.lower(text)), _WS, " ")


def normalize_text_duckdb_sql(t: str) -> str:
    return f"regexp_replace(trim(lower({t})), '\\s+', ' ', 'g')"


def fingerprint(text: Column) -> Column:
    """md5 of the normalized text — the engine's content hash."""
    return F.md5(normalize_text(text))


def fingerprint_duckdb_sql(t: str) -> str:
    return f"md5({normalize_text_duckdb_sql(t)})"


def hash32(s: Column) -> Column:
    """Portable uint32 of a string: first 8 hex chars of md5 (same trick as
    functions/embedding.py) — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def hash32_duckdb_sql(s: str) -> str:
    return f"CAST(('0x' || substr(md5({s}), 1, 8)) AS BIGINT)"


# --- PII redaction ------------------------------------------------------------

#: (tag, pattern) in APPLICATION ORDER — emails first (their local parts can
#: contain digit runs a later pass would mis-tag), then dotted IPv4 quads,
#: then bare phone-ish digit runs. Patterns restricted to the syntax subset
#: Java regex and RE2 (DuckDB) interpret identically: character classes,
#: bounded repetition, no backrefs/lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("PHONE", r"\+?[0-9][0-9 \-]{6,}[0-9]"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    ``<EMAIL>/<IP>/<PHONE>`` tags, applied in PII_PATTERNS order (a pass
    sees the previous pass's output, so an email's digits are never
    re-tagged as a phone).

    Extension beyond the reference (no text mutation ops exist there) — a
    pre-training corpus scrub. Pure JVM regexp_replace chain: shuffle-free,
    whole-stage-codegen, embarrassingly parallel at any corpus size.
    """
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def redact_pii_duckdb_sql(t: str) -> str:
    out = t
    for tag, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '<{tag}>', 'g')"
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts on the RAW text (each pattern counted
    independently), aliased n_email/n_ip/n_phone."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{tag.lower()}")
        for tag, pat in PII_PATTERNS
    ]


def pii_counts_duckdb_sql(t: str) -> list[str]:
    return [
        f"len(regexp_extract_all({t}, '{pat}')) AS n_{tag.lower()}"
        for tag, pat in PII_PATTERNS
    ]


# --- repetition signals -------------------------------------------------------


def repetition_stats_expr(text: Column, n: int = 2) -> Column:
    """Gopher-style repetition signals per document:
    struct(total_ngrams int, distinct_ngrams int, top_ngram_count int).

    Callers derive dup_frac = (total - distinct) / total (fraction of
    n-gram occurrences that are repeats) and top_frac = top / total (mass
    of the single most frequent n-gram) — the two classic boilerplate /
    spam repetition filters.

    Implementation is shuffle-free: per row, sort the (non-distinct) n-gram
    list, then the most-frequent count == the longest equal-run, found via
    run-BOUNDARY positions (i where s[i] != s[i-1]) and their successive
    differences. Everything is integer list arithmetic — no fold with a
    struct accumulator (DuckDB 1.0 lambda struct-literals see already-
    mutated sibling fields, so a run-length fold is NOT portable; boundary
    positions are). The token array, the sorted gram list, and the boundary
    list are each let-bound via the one-element-transform trick (Catalyst
    does not CSE across lambda bodies).

    Scale: embarrassingly parallel projection, O(L log L) per document in
    its own length — no cross-row state, survives any corpus size.
    """

    def on_bounds(s: Column, m: Column, bp: Column) -> Column:
        runs = F.transform(
            F.sequence(F.lit(1), F.size(bp)),
            lambda j: F.coalesce(F.try_element_at(bp, j + 1), m + 1) - F.element_at(bp, j),
        )
        return F.array_max(runs)

    def on_sorted(s: Column) -> Column:
        m = F.size(s)
        bounds = F.filter(
            F.sequence(F.lit(1), m),
            lambda i: (i == 1) | (F.try_element_at(s, i) != F.try_element_at(s, i - 1)),
        )
        top = F.element_at(F.transform(F.array(bounds), lambda bp: on_bounds(s, m, bp)), 1)
        return F.struct(
            m.alias("total_ngrams"),
            F.size(F.array_distinct(s)).alias("distinct_ngrams"),
            top.alias("top_ngram_count"),
        )

    def body(toks: Column) -> Column:
        nt = F.size(toks)
        raw = F.transform(
            F.sequence(F.lit(1), nt - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        empty = F.struct(
            F.lit(0).alias("total_ngrams"),
            F.lit(0).alias("distinct_ngrams"),
            F.lit(0).alias("top_ngram_count"),
        )
        # sequence(1, m) is DESCENDING for m < 1 — guard short docs first
        return F.when(nt < n, empty).otherwise(
            F.element_at(F.transform(F.array(F.array_sort(raw)), on_sorted), 1)
        )

    return F.element_at(F.transform(F.array(tokens(text)), body), 1)


def sorted_ngrams_duckdb_sql(t: str, n: int = 2) -> str:
    """DuckDB scalar twin of the sorted NON-distinct n-gram list (the input
    to the run-boundary computation; contrast shingles_duckdb_sql, which
    dedups). Parity queries let-bind it via a CTE, then apply the same
    boundary-difference arithmetic (see parity.repetition oracle)."""
    toks = tokens_duckdb_sql(t)
    return (
        f"list_sort(list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


# --- shingles ----------------------------------------------------------------


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as a sorted distinct set.

    The token array is LET-BOUND via a one-element transform: referencing
    `tokens(text)` directly inside the per-shingle lambda would re-run the
    regex split once per shingle (O(tokens^2) per document — Catalyst does
    not CSE across lambda bodies); a lambda variable is evaluated once.
    """

    def body(toks: Column) -> Column:
        n = F.size(toks)
        raw = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
        # guard: Spark's sequence(1, m) is DESCENDING for m < 1, not empty.
        # array_sort canonicalizes set order (DuckDB's list_distinct reorders).
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.array_sort(F.array_distinct(raw))
        )

    return F.element_at(F.transform(F.array(tokens(text)), body), 1)


def shingles_duckdb_sql(t: str, k: int = 3) -> str:
    toks = tokens_duckdb_sql(t)
    return (
        f"list_sort(list_distinct(list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' '))))"
    )


# --- winnowing fingerprints ---------------------------------------------------


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """MOSS-style winnowing fingerprint set (Schleimer et al., SIGMOD'03):
    hash every character k-gram of the normalized text, slide a window of
    w consecutive k-gram hashes, keep each window's minimum, return the
    distinct minima sorted — array<long>.

    This is the "rolling hash" document fingerprint of plagiarism/near-dup
    systems. The rolling (Rabin-Karp) hash itself is an O(1)-update trick
    for serial scanners; in a vectorized engine every k-gram hashes
    independently inside codegen, which is the same selection function with
    better parallelism. hash32 (md5-prefix) keeps the values bit-identical
    in DuckDB (winnow_fingerprints_duckdb_sql), so the guarantee holds
    cross-engine: any shared substring of length >= w + k - 1 contributes
    at least one COMMON fingerprint to both documents.

    Shorter-than-k texts yield an empty set; texts shorter than the first
    full window fall back to one window over whatever k-grams exist.

    Evaluation shape: both the normalized text and the gram array are
    LET-BOUND (the element_at(transform(array(x), body), 1) idiom —
    Catalyst does not CSE across lambda bodies, so referencing the outer
    `grams` expression inside the per-window lambda would re-hash EVERY
    k-gram once per window: O(n^2) md5s per document. Measured at the
    driver corpus' 300-char docs x 5k rows, the unbound form took the
    fingerprint pass from seconds to >9 minutes). Values are unchanged —
    the DuckDB twin stays bit-identical.
    """

    def over_grams(grams: Column) -> Column:
        n_win = F.greatest(F.size(grams) - F.lit(w - 1), F.lit(1))
        mins = F.when(F.size(grams) > 0, F.transform(
            F.sequence(F.lit(1), n_win),
            lambda j: F.array_min(F.slice(grams, j, w)),
        )).otherwise(F.array().cast("array<long>"))
        return F.array_sort(F.array_distinct(mins))

    def over_text(t: Column) -> Column:
        n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
        grams = F.when(n_grams > 0, F.transform(
            F.sequence(F.lit(1), n_grams), lambda i: hash32(t.substr(i, F.lit(k)))
        )).otherwise(F.array().cast("array<long>"))
        return F.element_at(F.transform(F.array(grams), over_grams), 1)

    return F.element_at(F.transform(F.array(normalize_text(text)), over_text), 1)


def winnow_fingerprints_table(
    df, id_col: str, text_col: str, k: int = 8, w: int = 4, out_col: str = "_fp"
):
    """Throughput twin of the winnow_fingerprints Column expression:
    mapInPandas computing the SAME selection with the SAME hash — Python
    hashlib.md5 produces byte-identical digests to Spark's md5, so the
    fingerprint sets are equal element-for-element (test-gated on the real
    corpus), unlike the recall-gated vectorized ANN tiers.

    Why it exists: the expression tier evaluates ~len(text) interpreted-HOF
    lambdas per document, each an md5 + conv — measured 6.7 s of the 10.9 s
    winnow pass at the 5k-doc bench tier, all of it lambda-interpreter
    overhead. Here the per-doc loop is a C-speed hashlib call per k-gram
    plus one numpy sliding-window min — same O(len) work, ~10x less
    constant. Arrow-batched, no shuffle, embarrassingly parallel: the right
    shape at 100 TB where fingerprinting is a map-only pass.

    Returns (id_col, out_col array<long>) — one row per input row.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    def fingerprint_one(text, md5) -> list[int]:
        if text is None:
            return []
        t = py_normalize_exact(text)
        n = len(t) - k + 1
        if n <= 0:
            return []
        b = t.encode("utf-8")
        # ascii fast path: byte offsets == char offsets
        if len(b) == len(t):
            hs = [int.from_bytes(md5(b[i : i + k]).digest()[:4], "big") for i in range(n)]
        else:
            hs = [int.from_bytes(md5(t[i : i + k].encode("utf-8")).digest()[:4], "big") for i in range(n)]
        if n <= w:
            return sorted(set((min(hs),)))
        arr = np.asarray(hs, dtype=np.int64)
        mins = np.lib.stride_tricks.sliding_window_view(arr, w).min(axis=1)
        return np.unique(mins).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hashlib import md5

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [fingerprint_one(t, md5) for t in pdf[text_col]],
                }
            )

    schema = StructType(
        [df.schema[id_col], StructField(out_col, ArrayType(LongType()))]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def winnow_fingerprints_duckdb_sql(t: str, k: int = 8, w: int = 4) -> str:
    """DuckDB twin of winnow_fingerprints (same md5-derived k-gram hash,
    same window minima, same distinct+sort)."""
    norm = normalize_text_duckdb_sql(t)
    grams = (
        f"CASE WHEN length({norm}) >= {k} THEN "
        f"list_transform(range(1, length({norm}) - {k - 1} + 1), "
        f"i -> {hash32_duckdb_sql(f'substr({norm}, i, {k})')}) "
        f"ELSE [] END"
    )
    return (
        f"list_sort(list_distinct((SELECT CASE WHEN len(g) > 0 THEN "
        f"list_transform(range(1, greatest(len(g) - {w - 1}, 1) + 1), "
        f"j -> list_min(g[j:j+{w - 1}])) ELSE [] END FROM (SELECT {grams} AS g))))"
    )


# --- Gopher quality flags ------------------------------------------------------

#: Gopher rule A1.1 stopword presence list (Rae et al. 2021): a document
#: must contain at least 2 of these to pass the "natural language" check.
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """Gopher quality heuristics (Rae et al. 2021, Appendix A1.1) as ONE
    let-bound struct — the pre-dedup document filter of the Gopher/
    MassiveText pipeline, complementing quality_score (a composite score)
    with the paper's named PASS/FAIL rules:

    - word count in [min_words, max_words];
    - mean word length in [min_mean_word_len, max_mean_word_len];
    - '#' or '...' symbols per word <= max_symbol_word_ratio;
    - <= max_bullet_line_frac of lines start with a bullet, and
      <= max_ellipsis_line_frac of lines end with an ellipsis;
    - >= min_alpha_word_frac of words contain an (ASCII) alphabetic char;
    - >= min_stopword_hits of GOPHER_STOPWORDS present.

    Returns struct(n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
    keep) — numeric evidence plus the AND-of-all-rules verdict, so a
    pipeline can both filter on ``keep`` and report WHICH rule fired.
    Ratios are rounded to 6dp (the cross-engine float contract); the
    alphabet is ASCII [a-z] post-lower like the rest of this module
    (gopher_quality_flags_duckdb_sql is the bit-identical twin).

    Scale: generate-only — one projection, no shuffle, no Python.
    """

    def over(toks: Column, lines: Column) -> Column:
        n_words = F.size(toks)
        nd = n_words.cast("double")
        mean_len = F.round(
            F.aggregate(toks, F.lit(0.0), lambda s, w: s + F.length(w)) / nd, 6
        )
        n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
        n_ell = F.floor(
            (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
        ).cast("long")
        symbol_ratio = F.round((n_hash + n_ell) / nd, 6)
        n_lines = F.size(lines).cast("double")
        bullet_frac = F.round(
            F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
            / n_lines,
            6,
        )
        ellipsis_frac = F.round(
            F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$"))) / n_lines,
            6,
        )
        alpha_frac = F.round(
            F.size(F.filter(toks, lambda w: w.rlike(r"[a-z]"))) / nd, 6
        )
        hits = F.size(
            F.filter(
                F.lit(list(GOPHER_STOPWORDS)).cast("array<string>"),
                lambda s: F.array_contains(toks, s),
            )
        )
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (symbol_ratio <= max_symbol_word_ratio)
            # '<=': the paper removes docs with MORE than 90% bullet lines,
            # so exactly-at-the-bound keeps (consistent with the ellipsis rule)
            & (bullet_frac <= max_bullet_line_frac)
            & (ellipsis_frac <= max_ellipsis_line_frac)
            & (alpha_frac >= min_alpha_word_frac)
            & (hits >= min_stopword_hits)
        )
        return F.struct(
            n_words.alias("n_words"),
            mean_len.alias("mean_word_len"),
            symbol_ratio.alias("symbol_word_ratio"),
            bullet_frac.alias("bullet_line_frac"),
            ellipsis_frac.alias("ellipsis_line_frac"),
            alpha_frac.alias("alpha_word_frac"),
            hits.alias("stopword_hits"),
            keep.alias("keep"),
        )

    return F.element_at(
        F.zip_with(
            F.array(tokens(text)),
            F.array(F.split(text, "\n")),
            lambda t, ln: over(t, ln),
        ),
        1,
    )


def gopher_quality_flags_duckdb_sql(
    t: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> str:
    """DuckDB twin of gopher_quality_flags — identical fields and rounding.
    Emitted as a struct_pack; consumers unpack fields with dot access."""
    toks = tokens_duckdb_sql(t)
    sw = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""(
SELECT struct_pack(
  n_words := nw,
  mean_word_len := round(list_reduce(list_prepend(0.0, list_transform(tk, w -> CAST(length(w) AS DOUBLE))), (a, b) -> a + b) / nw, 6),
  symbol_word_ratio := round((CAST(length({t}) - length(replace({t}, '#', '')) AS BIGINT)
      + CAST(floor((length({t}) - length(replace({t}, '...', ''))) / 3) AS BIGINT)) / nw, 6),
  bullet_line_frac := round(len(list_filter(ln, x -> regexp_matches(trim(x), '^[-*•]'))) / CAST(len(ln) AS DOUBLE), 6),
  ellipsis_line_frac := round(len(list_filter(ln, x -> regexp_matches(trim(x), '\\.\\.\\.$'))) / CAST(len(ln) AS DOUBLE), 6),
  alpha_word_frac := round(len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) / nw, 6),
  stopword_hits := len(list_filter([{sw}], s -> list_contains(tk, s))),
  keep := (nw >= {min_words} AND nw <= {max_words}
    AND round(list_reduce(list_prepend(0.0, list_transform(tk, w -> CAST(length(w) AS DOUBLE))), (a, b) -> a + b) / nw, 6) BETWEEN {min_mean_word_len} AND {max_mean_word_len}
    AND round((CAST(length({t}) - length(replace({t}, '#', '')) AS BIGINT)
      + CAST(floor((length({t}) - length(replace({t}, '...', ''))) / 3) AS BIGINT)) / nw, 6) <= {max_symbol_word_ratio}
    AND round(len(list_filter(ln, x -> regexp_matches(trim(x), '^[-*•]'))) / CAST(len(ln) AS DOUBLE), 6) <= {max_bullet_line_frac}
    AND round(len(list_filter(ln, x -> regexp_matches(trim(x), '\\.\\.\\.$'))) / CAST(len(ln) AS DOUBLE), 6) <= {max_ellipsis_line_frac}
    AND round(len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) / nw, 6) >= {min_alpha_word_frac}
    AND len(list_filter([{sw}], s -> list_contains(tk, s))) >= {min_stopword_hits})
) FROM (SELECT {toks} AS tk, string_split({t}, chr(10)) AS ln, CAST(len({toks}) AS DOUBLE) AS nw)
)"""
