"""Physical-plan assertions — the ".explain and iterate" discipline as code.

Used by tests to pin down the plans we actually want at scale:
* filters/column pruning reach the parquet scan (PushedFilters / ReadSchema)
* the ``bytes`` audio column is NOT read by text-only queries
* joins that must broadcast actually broadcast
* whole-stage codegen spans exist where expected
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names appearing in the parquet scan ReadSchema."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            depth = 0
            field = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(field.split(":")[0].strip())
                    field = ""
                else:
                    field += ch
            if field:
                cols.append(field.split(":")[0].strip())
    return cols


def assert_column_pruned(df: DataFrame, column: str) -> None:
    cols = scan_read_schema(df)
    assert cols, f"no parquet scan found in plan:\n{formatted_plan(df)}"
    assert column not in cols, (
        f"column '{column}' should be pruned from the scan but ReadSchema "
        f"is {cols}"
    )


def assert_has_pushed_filters(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters:\n{plan}"
    pushed = [
        line for line in plan.splitlines() if "PushedFilters:" in line
    ]
    assert any(
        "[" in line and line.split("[", 1)[1].strip() != "]"
        for line in pushed
    ), f"pushed filter list is empty:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    plan = formatted_plan(df)
    # formatted explain marks codegen nodes with a leading '*' and/or a
    # "[codegen id : N]" annotation (the literal WholeStageCodegen node name
    # only appears in 'simple' mode)
    assert (
        "WholeStageCodegen" in plan
        or "[codegen id" in plan
        or "\n* " in plan
        or plan.startswith("* ")
    ), f"no codegen span:\n{plan}"
