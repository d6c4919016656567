"""cs744_big_data_system_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo mihuuu/CS744-Big-Data-System (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, Parquet
columnar sources, broadcast/AQE-aware joins, and Arrow-vectorized Pandas UDFs
only where built-ins cannot express the semantics.

Subpackages
-----------
sources    : readers/writers (parquet, csv, text, json, edge lists) + table loader
functions  : column-expression helpers (vector math, text stats) — JVM-side first
operators  : relational ops, dedup family, similarity search, text analysis,
             as-of joins, multimodal plumbing
plans      : explain/plan-inspection utilities (pushdown & codegen checks)
graph      : PageRank (reference assignment1/part3 semantics)
ml         : distributed-aggregation supersteps (reference assignment2 semantics)
streaming  : Structured Streaming windows/watermarks over the events table
"""

__version__ = "0.1.0"

from cs744_big_data_system_spark.session import get_spark  # noqa: F401
