"""l_space_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-imagination of L-space's (scala-steward/L-space) graph
computing capabilities on Apache Spark: instead of interpreting Gremlin-style
traversal steps over an in-memory object graph
(reference: core/shared/src/main/scala/lspace/librarian/task/SyncGuide.scala:27),
this engine expresses the same capabilities — label-filtered neighborhood
moves, filtering / grouping / reduction, dedup, ordering, and iterative
traversal (L-space's ``Repeat`` step,
core/shared/src/main/scala/lspace/librarian/traversal/step/Repeat.scala:100)
— as DataFrame jobs over a partitioned edge table, and implements PageRank,
connected components, label propagation and triangle counting as resumable
superstep loops.

Layout
------
- ``session``            SparkSession factory (AQE, shuffle partitions, Arrow)
- ``synth``              deterministic generator for the ``repos`` input table
- ``extract``            vectorized repo→repo edge extraction + sha256 invariant
- ``sources``            table loaders, derived edge graphs, partitioned writers
- ``plans``              superstep runner with checkpoint / resume / metrics
- ``operators``          pagerank, components, labelprop, triangles,
                         dedup (exact/minhash/simhash/ngram/embedding),
                         similarity search, text analysis, multimodal stubs
- ``functions``          predicate library (L-space ``P``), text & vector fns
- ``traversal``          fluent DataFrame-backed traversal DSL (step parity)
- ``streaming``          structured-streaming edge ingestion
"""

__version__ = "0.1.0"
