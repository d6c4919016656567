from cs744_big_data_system_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    has_pushed_filters,
    wholestage_codegen_spans,
)
