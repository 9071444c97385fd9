"""Persistent dedup store — INCREMENTAL corpus dedup (round 9).

The missing piece of the dedup family at 100 TB growth: every operator in
operators/dedup.py dedups a corpus against ITSELF, so day N's ingest would
re-scan days 0..N-1 (quadratic total work over the corpus lifetime). The
store keeps the two compact artifacts those operators already compute —
exact text fingerprints and banded MinHash signatures — as parquet, so a
new batch dedups against the WHOLE history by joining against
fingerprint/band tables a tiny fraction of the corpus size:

- ``exact/``    (fingerprint, doc_id): one row per first-seen distinct text
  (md5 — functions/text.fingerprint, the same column the exact-dedup gate
  hashes). A batch's exact duplicates are one anti/semi join keyed on the
  fingerprint — the only shuffle carries (fingerprint, id).
- ``minhash/``  (doc_id, band, key, sig): the banded LSH rows of
  dedup.minhash_lsh_pairs, with the full signature denormalized onto each
  band row (bands x num_perm longs per doc, ~0.5 KB at 16x4) so candidate
  generation AND signature verification are ONE join keyed (band, key) —
  no second pass over a signatures table.

Near-dup verification is the standard MinHash ESTIMATE (fraction of
matching signature minima — an unbiased Jaccard estimator with stddev
sqrt(j(1-j)/num_perm)): exact shingle verification would require storing
every doc's shingle set, which is corpus-sized — exactly what the store
exists to avoid. Raise num_perm at create() when tighter estimates matter.

Replay safety: ``add(ingest_id=...)`` partitions both tables by the caller
supplied ingest id and writes with dynamic partition overwrite — re-running
a failed ingest REPLACES its own partition instead of double-inserting
(the same mechanism as streaming/search.py's serving sink), so the store
composes with foreachBatch (pass the micro-batch id).

100 TB posture: both joins key on high-cardinality hashes (fingerprint /
band key) — no skew; the store side is column-pruned parquet. For a hot
path at extreme store sizes, rewrite the store tables bucketed by the join
key (sources/etl.write_bucketed) and only the new batch shuffles.

Batch-INTERNAL duplicates are out of scope by design: dedup the batch with
the existing self-dedup operators first (exact_dedup / minhash_lsh_pairs),
then check the survivors against the store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neighborly_spark.functions.text import fingerprint
from neighborly_spark.operators.dedup import _shingle_sets, minhash_sig_expr

_MANIFEST = "manifest.json"


class DedupStore:
    """Handle on a dedup store directory. Parameters (k, num_perm, bands,
    engine) are pinned in the manifest at create() — signatures from
    different parameter sets are not comparable, so every add/query uses
    the manifest's, never the caller's."""

    def __init__(self, spark: SparkSession, path: str, params: dict):
        self.spark = spark
        self.path = path
        self.k = int(params["k"])
        self.num_perm = int(params["num_perm"])
        self.bands = int(params["bands"])
        self.engine = params.get("engine", "expr")

    # --- lifecycle -----------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        k: int = 3,
        num_perm: int = 16,
        bands: int = 4,
        engine: str = "expr",
    ) -> "DedupStore":
        if bands < 1 or num_perm % bands != 0:
            raise ValueError(
                f"bands must divide num_perm (got num_perm={num_perm}, bands={bands})"
            )
        if os.path.exists(os.path.join(path, _MANIFEST)):
            raise ValueError(f"dedup store already exists at {path!r} (use open)")
        os.makedirs(path, exist_ok=True)
        params = {"k": k, "num_perm": num_perm, "bands": bands, "engine": engine}
        with open(os.path.join(path, _MANIFEST), "w") as f:
            json.dump(params, f)
        return cls(spark, path, params)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "DedupStore":
        with open(os.path.join(path, _MANIFEST)) as f:
            return cls(spark, path, json.load(f))

    # --- featurization (manifest-pinned params) --------------------------

    def _exact_rows(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        # one fingerprint per distinct text, doc_id = min id (deterministic
        # survivor, matching dedup.exact_duplicate_groups' min-id law)
        return (
            docs.select(
                fingerprint(F.col(text_col)).alias("fingerprint"),
                F.col(id_col).alias("doc_id"),
            )
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("doc_id"))
        )

    def _band_rows(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        rows = self.num_perm // self.bands
        sh = _shingle_sets(docs, id_col, text_col, self.k, self.engine)
        sigs = sh.select(
            "_id", minhash_sig_expr(F.col("_sh"), self.num_perm).alias("sig")
        )
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows + r + 1).cast("string")
                            for r in range(rows)
                        ],
                    ).alias("key"),
                )
                for b in range(self.bands)
            ]
        )
        return sigs.select(
            F.col("_id").alias("doc_id"), "sig", F.explode(band_arr).alias("bk")
        ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "sig")

    # --- writes ----------------------------------------------------------

    def add(
        self,
        docs: DataFrame,
        ingest_id: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Register a batch's fingerprints + band rows under ``ingest_id``.
        Dynamic partition overwrite on _ingest_id: replaying the same
        ingest (foreachBatch retry, backfill re-run) REPLACES its rows
        instead of duplicating them.

        First-seen invariant is OWNED HERE, not by the caller: texts whose
        fingerprint already exists in the store contribute NOTHING (no
        second exact row, no duplicate band rows), so exact_matches keeps
        returning exactly one dup_of per text however often a duplicate is
        re-added — calling filter_new first is an optimization, not a
        correctness requirement. The batch is materialized ONCE
        (localCheckpoint) before any write: the two table writes must see
        identical rows, and the history anti-join must not leave a read of
        exact/ inside the plan that overwrites exact/ (self-overwrite
        detection would reject it)."""
        src = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).localCheckpoint()
        exact_rows = self._exact_rows(src, "doc_id", "text")
        store = self._table("exact")
        if store is not None:
            exact_rows = exact_rows.join(
                store.select("fingerprint"), "fingerprint", "left_anti"
            )
        # materialize the survivors: breaks the lineage back to exact/
        # before the overwrite, and both writes below derive from it
        exact_rows = exact_rows.localCheckpoint()
        reps = exact_rows.select(F.col("doc_id").alias("_rep_id"))
        band_src = src.join(reps, src["doc_id"] == reps["_rep_id"], "semi")
        for sub, rows in (
            ("exact", exact_rows),
            ("minhash", self._band_rows(band_src, "doc_id", "text")),
        ):
            (
                rows.withColumn("_ingest_id", F.lit(str(ingest_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_ingest_id")
                .parquet(f"{self.path}/{sub}")
            )

    # --- reads -----------------------------------------------------------

    def _table(self, sub: str) -> DataFrame | None:
        p = f"{self.path}/{sub}"
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(p)
        except AnalysisException as e:
            # ONLY genuine nonexistence (no ingest yet) maps to "empty
            # store" — a transient read failure swallowed here would make
            # filter_new pass duplicates as new (the same bug class the
            # round's worker-cache fix closed). Anything else re-raises.
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    def exact_matches(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """(doc_id, dup_of): batch docs whose EXACT text already exists in
        the store, with the store's first-seen doc id. One equi-join keyed
        on the md5 fingerprint."""
        store = self._table("exact")
        batch = docs.select(
            F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fingerprint")
        )
        if store is None:
            return batch.select(
                "doc_id",
                F.lit(None).cast(batch.schema["doc_id"].dataType).alias("dup_of"),
            ).limit(0)
        return batch.join(
            store.select("fingerprint", F.col("doc_id").alias("dup_of")), "fingerprint"
        ).select("doc_id", "dup_of")

    def filter_new(self, docs: DataFrame, text_col: str = "text") -> DataFrame:
        """Batch rows whose exact text is NOT in the store (left_anti on
        the fingerprint — the ingest-gate shape). Schema passes through
        untouched (the join key uses a name collision-proofed against the
        caller's columns)."""
        store = self._table("exact")
        if store is None:
            return docs
        tmp = "_fp"
        while tmp in docs.columns:
            tmp += "_"
        keyed = docs.withColumn(tmp, fingerprint(F.col(text_col)))
        return (
            keyed.join(
                store.select(F.col("fingerprint").alias(tmp)), tmp, "left_anti"
            ).drop(tmp)
        )

    def neardup_matches(
        self,
        docs: DataFrame,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        round_to: int = 6,
    ) -> DataFrame:
        """(doc_id, store_doc_id, est_jaccard): batch docs near-duplicating
        a STORED doc — banded-LSH candidates (join keyed (band, key)),
        verified by the MinHash estimate (matching minima / num_perm)
        against the stored signature, thresholded. Per (batch, store) pair
        the estimate is computed once (max over shared bands dedups)."""
        store = self._table("minhash")
        batch = self._band_rows(docs, id_col, text_col)
        if store is None:
            return batch.select(
                F.col("doc_id"),
                F.lit(None).cast(batch.schema["doc_id"].dataType).alias("store_doc_id"),
                F.lit(0.0).alias("est_jaccard"),
            ).limit(0)
        est = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("b_sig"), F.col("s_sig"),
                    lambda x, y: (x == y).cast("int"),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.lit(float(self.num_perm)),
            round_to,
        )
        cand = (
            batch.select(
                F.col("doc_id").alias("b_id"), "band", "key", F.col("sig").alias("b_sig")
            )
            .join(
                store.select(
                    F.col("doc_id").alias("s_id"), "band", "key", F.col("sig").alias("s_sig")
                ),
                ["band", "key"],
            )
            .select("b_id", "s_id", "b_sig", "s_sig")
            .dropDuplicates(["b_id", "s_id"])  # shared bands collapse to one
        )
        return (
            cand.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select(
                F.col("b_id").alias("doc_id"),
                F.col("s_id").alias("store_doc_id"),
                "est_jaccard",
            )
        )
