"""map_reduce_showcase_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``bobabuster/map-reduce-showcase`` (a Rust MapReduce framework,
surveyed in /root/repo/SURVEY.md), re-expressed Spark-first:

* The reference's framework layer (coordinator, workers, in-memory
  shuffle, fault tolerance — ``src/coordinator/mod.rs``,
  ``src/worker/mod.rs``) is Spark's driver/executor/DAGScheduler.
  We do not rebuild it.
* The reference's *query* layer (word count, grep, vertex degree —
  ``src/app/*.rs``) plus the full relational surface the north star
  requires (joins, aggregations, windows, set ops, streaming) and
  LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) are implemented as declarative
  DataFrame plans so Catalyst/Tungsten/AQE pick physical strategies.

Layout:
    sources/     table + text readers (reference F1/F7 equivalents)
    operators/   mapreduce app parity + relational operators
    functions/   scalar/vector column expression helpers
    dedup/       exact, minhash-LSH, simhash, ngram-jaccard, embedding
    similarity/  brute-force + LSH-bucketed ANN top-k
    multimodal/  binary-column plumbing (decode stubs)
    streaming/   structured-streaming demos + event-time windows
    plans/       the query registry the driver contract consumes
"""

__version__ = "0.1.0"
