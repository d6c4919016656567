from cs744_big_data_system_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_edge_list,
    read_json,
    read_text,
)
from cs744_big_data_system_spark.sources.writers import (  # noqa: F401
    write_csv,
    write_parquet,
    write_text,
)
