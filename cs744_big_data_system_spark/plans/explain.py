"""Plan-inspection helpers: assert the physical plan is the one we want.

Used by tests to verify scale posture — filters reach the Parquet scan,
projections prune columns, hot expressions stay inside whole-stage
codegen (the prompt-level requirements for 100 TB efficiency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan node reports non-empty PushedFilters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "[]" not in line.split("PushedFilters:")[1]:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the source (ReadSchema) — a projection
    of 2 columns that reads 11 means pruning failed."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:")[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            for field in inner.split(","):
                if ":" in field:
                    cols.append(field.split(":")[0])
    return cols


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the physical plan.

    Spark's formatted explain annotates codegen'd operators with
    ``[codegen id : N]`` (simple mode uses ``*(N)``); count distinct ids.
    """
    plan = formatted_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "codegen id :" in line:
            ids.add(line.split("codegen id :")[1].split("]")[0].strip())
        elif "WholeStageCodegen" in line:
            ids.add(line.split("(")[-1].split(")")[0])
    return len(ids)
