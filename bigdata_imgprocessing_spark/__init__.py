"""bigdata_imgprocessing_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query & data-processing capabilities of
the reference repo ``gero0/bigdata_imgprocessing`` (surveyed in SURVEY.md)
as an idiomatic Spark DataFrame / Spark SQL engine:

* declarative logical plans (Catalyst optimizes; no driver-loop group-bys,
  no collect/parallelize round-trips — cf. SURVEY.md §2.12 anti-patterns),
* explicit schemas everywhere (the reference is untyped CSV strings),
* Arrow ``pandas_udf`` stages for the irreducibly-Python image ops,
* first-class large-scale training-data operators (dedup, similarity
  search, text analysis, time windows, streaming) beyond reference parity.

Layout:
    core/       session factory, table catalog, query registry
    queries/    named, oracle-checked queries (the driver contract surface)
    operators/  reusable distributed operators (as-of join, minhash, knn, …)
    functions/  column-level helpers (zero-guard avg, buckets, text metrics)
    images/     binary-column codec + color analytics (pandas UDFs)
    streaming/  Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
