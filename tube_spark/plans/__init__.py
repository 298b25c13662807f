from tube_spark.plans.translator import Aggregator, Collector, Pipeline, build_translator

__all__ = ["Aggregator", "Collector", "Pipeline", "build_translator"]
