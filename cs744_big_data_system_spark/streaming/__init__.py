from cs744_big_data_system_spark.streaming.windows import (  # noqa: F401
    replay_to_batch,
    session_window_counts,
    sliding_window_counts,
    stream_dedup,
    tumbling_window_counts,
)
