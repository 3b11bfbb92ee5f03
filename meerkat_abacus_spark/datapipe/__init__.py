"""Large-scale training-data pipeline operators.

These go beyond the reference's surveillance surface: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
approximate nearest-neighbor similarity search, text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Design rule shared by every operator here: all hashing is built from
``md5`` + string ops so the exact same numbers are computable in any ANSI
SQL engine (the DuckDB oracle included) — no engine-specific hash seeds.
"""

from meerkat_abacus_spark.datapipe import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
