from mapreducefw_spark.plans.map_reduce import map_reduce, map_reduce_rows

__all__ = ["map_reduce", "map_reduce_rows"]
