"""Large-scale training-data pipeline operators.

Beyond the reference engine's own operators (SURVEY.md §2), these are
the data-processing primitives a 100 TB training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), approximate similarity search, text statistics
(language ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing.

Everything stays JVM-side (pyspark.sql.functions, whole-stage codegen)
unless the semantics genuinely require Python — and then it is an
Arrow-batched pandas UDF, never row-at-a-time Python.
"""
