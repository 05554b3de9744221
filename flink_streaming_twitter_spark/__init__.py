"""PySpark-native analytics engine with the query surface of
gunjanvishwakarma/flink-streaming-twitter, re-expressed Spark-first.

The reference (/root/reference, Flink 1.9 DataStream job
``PrcoessTweetFromKafkaAndWriteToInfluxDatabase.java``) hand-wires four
streaming topologies; this package authors the same semantics as Catalyst
logical plans (DataFrame / SQL / Structured Streaming) and extends them with
the large-scale training-data-pipeline operators described in SURVEY.md §7
step 6 (dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): Catalyst + Tungsten IS the execution engine;
this library contributes schemas, column-expression builders, window/query
factories, a streaming runner, and sink adapters. No RDDs, no custom
Catalyst rules; Python UDFs only where built-ins cannot express the
semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"
