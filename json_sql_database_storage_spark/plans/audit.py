"""Plan-audit CLI: print a registered query's physical plan and the
scale-relevant properties the plan tests pin — the tool for asking "is
this the plan I'd want at 100 TB?" interactively.

Usage::

    python -m json_sql_database_storage_spark.plans.audit QUERY [SF_DIR]

Prints the formatted physical plan, then a property summary: pushed
filters, scanned columns, exchange count/kinds, broadcast/codegen usage,
and any scale flags (CartesianProduct, BatchEvalPython, SinglePartition).
"""

from __future__ import annotations

import re
import sys


def audit(name: str, sf_dir: str = "/root/testdata/sf0.001") -> int:
    from .. import registry
    from ..session import build_session
    from .inspect import (explain_formatted, pushed_filters,
                          read_schema_columns, wholestage_codegen_spans)

    specs = registry.specs()
    if name not in specs:
        close = [n for n in specs if name in n]
        print(f"unknown query {name!r}" +
              (f"; close matches: {close}" if close else ""))
        return 2
    spark = build_session("plan-audit")
    try:
        # AQE defers physical compilation, hiding exchanges/codegen from
        # the unexecuted plan — audit the static plan instead (same
        # reasoning as tests/test_plans.py::test_q1_wholestage_codegen)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = specs[name].fn(spark, sf_dir)
        text = explain_formatted(df)
        print(text)
        print("=" * 72)
        print(f"query:            {name}")
        print(f"pushed filters:   {pushed_filters(df) or '-'}")
        print(f"scan columns:     {read_schema_columns(df) or '-'}")
        # formatted explain names the node bare ("Exchange (7)"); the
        # executed-plan string carries the partitioning kind
        phys = df._jdf.queryExecution().executedPlan().toString()
        exchanges = re.findall(r"Exchange (\w+)", phys)
        print(f"exchanges:        {len(exchanges)} {exchanges}")
        print(f"codegen spans:    {wholestage_codegen_spans(df)}")
        print(f"broadcast join:   {'BroadcastHashJoin' in text}")
        for flag in ("CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "SinglePartition"):
            if flag in text:
                print(f"scale flag:       {flag} present — check whether "
                      f"this query is a documented exhibit "
                      f"(tests/test_plans.py allowlist)")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    raise SystemExit(audit(*sys.argv[1:3]))
