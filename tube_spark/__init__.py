"""tube_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Gen3's "tube" ETL (reference:
uc-cdis/tube), re-designed Spark-first.

The engine compiles a declarative mapping (aggregator / collector, the
reference's etlMapping.yaml language) into a single Catalyst logical
plan over graph-shaped sources (node/edge tables), plus a suite of
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Layout:
  config/     mapping language: dataclasses + YAML parser
  dictionary  data-dictionary abstraction (node schemas + links)
  sources/    graph sources: reference _props-JSON format, relational FK adapter
  functions/  expression builders: aggregation fns, filter DSL, value maps, text
  operators/  flatten, aggregation tree, parent chains, nested docs,
              collector, joining, dedup, similarity, multimodal
  plans/      translators (aggregator / collector) + orchestrator
  sinks/      document sinks + zero-downtime versioned publish
  streaming/  incremental refresh via Structured Streaming
"""

__version__ = "0.1.0"
