from cs744_big_data_system_spark.ml.superstep import (  # noqa: F401
    distributed_vector_mean,
    shard,
    synchronized_superstep,
)
