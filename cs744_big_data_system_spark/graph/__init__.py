from cs744_big_data_system_spark.graph.pagerank import pagerank  # noqa: F401
