"""PySpark-native analytics engine with the capabilities of Korner03/MapReduceFW.

The reference (``/root/reference``) is a compact single-process C++ MapReduce
framework: input vector -> user Map (flat, 0..N emits) -> sorted group-by-key
shuffle -> user Reduce (flat) -> global ascending sort by output key
(``MRFCore.cpp:252-446``). This package re-expresses that computational model,
and the full analytics surface classically layered on it, as idiomatic
PySpark: DataFrame/SQL first so Catalyst/Tungsten own the physical plan,
Pandas-UDF (Arrow-batched) only where built-ins cannot express the semantics.

Layout:
  session     -- SparkSession factory tuned for local[N] and for cluster scale
  sources     -- table loading (parquet), format readers, filesystem listing
  plans       -- the generic map_reduce() adapter (reference-parity core)
  operators   -- dedup, similarity search, text analysis, multimodal, top-k
  streaming   -- structured-streaming windows/session/stateful wrappers
  queries     -- the registered query surface checked against a DuckDB oracle
"""

from mapreducefw_spark.session import get_spark
from mapreducefw_spark.sources.tables import TABLES, load_tables, register_views
from mapreducefw_spark.plans.map_reduce import map_reduce

__all__ = ["get_spark", "TABLES", "load_tables", "register_views", "map_reduce"]
