"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count-style action (``collect`` on
aggregates, ``count`` on wide outputs) so the full plan executes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from production_grade_rag_spark.plans.catalog import CATALOG
    from production_grade_rag_spark.session import get_spark

    spark = get_spark("pgrs-bench")
    # warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # one failing query must not lose the artifact for the healthy 14:
    # failures are recorded per-query and the JSON line is always emitted
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in CATALOG.items():
        if not spec.headline:
            continue
        t0 = time.perf_counter()
        try:
            df = spec.build(spark, SF_DIR)
            n = df.count()
        except Exception as exc:  # noqa: BLE001 — bench must survive any query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
