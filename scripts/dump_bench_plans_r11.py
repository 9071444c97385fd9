"""Dump explain('formatted') for the round-11-touched BENCH entries.

Usage: python scripts/dump_bench_plans_r11.py <suffix> <out_dir> [sf_dir]
  suffix : 'before' or 'after' — files land as <out_dir>/<entry>_<suffix>.txt
  out_dir: plans directory (pass the MAIN repo's plans/r11 even when running
           from a prior-round worktree to capture the 'before' shapes)
  sf_dir : defaults to sf0.01 — plan SHAPE is scale-invariant pre-AQE and
           the builders' untimed index fits are cheap there.

Run it with cwd+PYTHONPATH at the leg's repo root (see
scripts/bench_ab.py's module docstring for why that matters).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ENTRIES = [
    # touched this round: ivfpq probe-assign / ADC kernel / salting /
    # cells-only probe pass; hnsw routing rewrite; dsir subtree removal;
    # dedup-store single-base agg elision (47a50eb)
    "ivfpq_batch1k_df_150k",
    "ivfpq_opq_batch1k_df_150k",
    "ivfpq_snaptag1k_df_150k",
    "ivfpq_batch100k_df_150k",
    "ivfpq_snap100k_df_150k",
    "hnsw_batch256_df_150k",
    "hnsw_snap100k_df_150k",
    "dsir_logweights_docs",
    "dedup_store_incr_docs",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = os.path.abspath(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    os.environ.setdefault("SPARK_GRAFT_RELAYOUT", "0")

    import bench  # noqa: E402  (the leg's own bench.py via sys.path[0])

    bench.SF_DIR = sf_dir
    from neighborly_spark.session import get_spark

    spark = get_spark(app_name=f"dump-bench-plans-{suffix}", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in ENTRIES:
        build = (
            bench.BENCH_LOCAL.get(name)
            or bench.BENCH_STEADY.get(name)
            or bench.BENCH_SINGLE.get(name)
        )
        if build is None:
            print(f"SKIP {name}: not registered in this leg", file=sys.stderr)
            continue
        try:
            df = build(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"WROTE {path}")
        except Exception as exc:  # keep going: one entry must not sink the dump
            print(f"FAIL {name}: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
