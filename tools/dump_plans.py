#!/usr/bin/env python
"""Dump executed .explain("formatted") plans for named queries to
``plans/r12/<query>_<suffix>.txt`` — the optimization-round evidence
files (judge checks plan claims against these).

Usage: python tools/dump_plans.py <suffix> <query> [query ...]
       python tools/dump_plans.py <suffix> --all
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — plan shape,
       not timing, is what these files carry).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ensembl_lakehouse_spark.plans.explain import formatted_plan  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from ensembl_lakehouse_spark.session import get_spark

    queries = entry.queries()
    if names == ["--all"]:
        names = list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    for name in names:
        df = queries[name](spark, sf_dir)
        # Execute first so AQE's final plan (real join strategies,
        # codegen ids) is what lands in the file.
        df.write.format("noop").mode("overwrite").save()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
            fh.write("\n")
        print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
