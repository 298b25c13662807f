from tube_spark.functions.aggs import agg_expr, merge_expr
from tube_spark.functions.filters import compile_filter
from tube_spark.functions.valuemap import value_map_col

__all__ = ["agg_expr", "merge_expr", "compile_filter", "value_map_col"]
