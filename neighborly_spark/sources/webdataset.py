"""WebDataset-style tar-shard source/sink for multimodal training data.

Large multimodal corpora ship as tar shards whose members pair up by
basename: ``000123.jpg`` + ``000123.json`` + ``000123.txt`` form one
sample (the WebDataset convention). This module reads and writes that
layout with stdlib ``tarfile`` only — no external deps — so the engine's
opaque-binary multimodal columns (operators/multimodal.py) have a real
at-scale container format on both ends.

Layout in the engine: the LONG form ``(shard, key, ext, data binary)``,
one row per member — schema-stable regardless of which extensions a shard
carries. ``samples_wide`` pivots a known extension set into one row per
sample with a binary column per extension (the shape decode/feature UDFs
consume).

Scale shape:
- read: ``binaryFile`` gives one row per shard; a ``mapInPandas`` pass
  unpacks members. Parallelism = number of shards (exactly how WebDataset
  is consumed everywhere); per-task memory is bounded by one shard, which
  the format already sizes for streaming (100 MB - 1 GB).
- write: one tar per input partition, members in partition order —
  ``repartition(n)`` picks the shard count; no driver-side data movement.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = "shard string, key string, ext string, data binary"


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """Tar shards -> long rows (shard, key, ext, data).

    ``key`` is the member basename up to the FIRST dot, ``ext`` everything
    after it (so ``x.seg.png`` -> ext ``seg.png``, per WebDataset rules).
    Directories and non-regular members are skipped.
    """
    shards = spark.read.format("binaryFile").load(path_glob)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(path)
                rows = []
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        name = os.path.basename(m.name)
                        if "." in name:
                            key, ext = name.split(".", 1)
                        else:
                            key, ext = name, ""
                        rows.append((shard, key, ext, tf.extractfile(m).read()))
                if rows:
                    yield pd.DataFrame(rows, columns=["shard", "key", "ext", "data"])

    return shards.select("path", "content").mapInPandas(unpack, MEMBER_SCHEMA)


def samples_wide(members: DataFrame, extensions: list[str]) -> DataFrame:
    """Pivot long member rows into one row per (shard, key) sample with a
    binary column per requested extension (missing members -> null). The
    pivot is one keyed aggregation; extensions must be the known, fixed
    set a pipeline consumes (WebDataset pipelines always declare one)."""
    aggs = [
        F.max(F.when(F.col("ext") == e, F.col("data"))).alias(e.replace(".", "_"))
        for e in extensions
    ]
    return members.groupBy("shard", "key").agg(*aggs)


def write_webdataset(
    members: DataFrame,
    out_dir: str,
    prefix: str = "shard",
) -> int:
    """Long member rows -> one tar shard PER PARTITION under ``out_dir``
    (local or mounted path), members ordered (key, ext) within the shard
    so samples stay contiguous — the property WebDataset readers rely on.
    Returns the number of shards written.

    Repartition/sort upstream to control shard count and sample placement:
    ``members.repartitionByRange(n, "key")`` gives n roughly equal shards
    with co-located samples.

    Write protocol: each task writes ``.<name>.inprogress`` then
    os.rename()s into place on completion, so a task that dies mid-write
    never leaves a truncated tar that counts as output, and a retry of the
    same partition simply re-renames over its own finished shard
    (idempotent per partition). The write itself is a side effect of
    executing the returned manifest plan ONCE — this function triggers
    that execution and returns the count; callers must not re-execute the
    plan (non-transactional, run-once semantics).
    """
    os.makedirs(out_dir, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # materialize before concat: an empty partition yields an empty
        # iterator, and pd.concat([]) raises ValueError
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["key", "ext"], kind="mergesort"
        )
        path = os.path.join(out_dir, f"{prefix}-{pid:06d}.tar")
        tmp = os.path.join(out_dir, f".{prefix}-{pid:06d}.tar.inprogress")
        with tarfile.open(tmp, "w") as tf:
            for _, r in pdf.iterrows():
                info = tarfile.TarInfo(name=f"{r['key']}.{r['ext']}")
                info.size = len(r["data"])
                tf.addfile(info, io.BytesIO(bytes(r["data"])))
        os.rename(tmp, path)
        yield pd.DataFrame({"shard": [os.path.basename(path)], "n_members": [len(pdf)]})

    manifest = members.select("key", "ext", "data").mapInPandas(
        dump, "shard string, n_members long"
    )
    return manifest.count()
