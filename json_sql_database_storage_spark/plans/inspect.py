"""Physical-plan inspection helpers (SURVEY.md §4.3).

At 100 TB the plan IS the performance: a filter that doesn't reach the
parquet scan re-reads the table; a dimension join that isn't broadcast
shuffles the fact side; an expression that falls out of whole-stage codegen
drops to interpreted row processing.  These helpers parse
``explain("formatted")`` output so tests (tests/test_plans.py) can pin the
plan shapes, not just the results — the properties that survive a 1000×
scale-up.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    text = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (ReadSchema)."""
    text = explain_formatted(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
        schemas.append(cols)
    return schemas


def uses_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_formatted(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Codegen spans via explain("codegen").  NOTE: under AQE the unexecuted
    top-level plan reports 0 subtrees — disable
    spark.sql.adaptive.enabled BEFORE building the DataFrame to inspect the
    statically compiled plan (see tests/test_plans.py)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    return int(m.group(1)) if m else 0
