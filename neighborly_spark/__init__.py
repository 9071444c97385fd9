"""neighborly_spark — a PySpark-native vector-analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
nickna/Neighborly (an embeddable C# vector database) on Spark SQL + MLlib:

- exact k-NN / range search / text search   (operators.knn)
- approximate search: LSH, IVF              (operators.lsh, operators.ivf)
- quantization: binary (BQ) and product (PQ) (operators.quantization)
- dedup: exact / MinHash-LSH / SimHash / n-gram Jaccard / cosine
                                            (operators.dedup)
- distance expression library               (functions.distance)
- deterministic hash embedder               (functions.embedding)
- text analysis (lang-id, quality, tokens)  (functions.text)
- ETL: CSV / JSON / JSONZ / Parquet + snapshots (sources.etl)
- CRUD-as-batch + tag filtering             (operators.crud)
- corpus ops: chunking, packing, vocab, decontamination, unigram LM
                                            (operators.corpus)
- BM25 / hybrid RRF / rerank retrieval      (operators.text_search)
- sessionization + ordered funnels          (operators.sessions)
- as-of + interval joins                    (operators.joins)
- deterministic splits / stratified sampling (functions.splits)
- streaming ingest + debounced index refresh (streaming.ingest)

Design stance (SURVEY.md §7.0): every operator takes and returns DataFrames,
builds declarative plans for Catalyst, avoids driver-side collect, and keeps
hot-path math JVM-side via higher-order array expressions (zip_with /
aggregate / transform) — pandas UDFs only where built-ins can't express the
semantics.
"""

__version__ = "0.1.0"

from neighborly_spark.search_service import SearchService  # noqa: F401
from neighborly_spark.session import get_spark  # noqa: F401
