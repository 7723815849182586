#!/usr/bin/env python
"""Capture .explain("formatted") for every bench workload (and a rough
single-shot timing for prioritization — NOT the official bench).

Usage: python plans/r14/capture_plans.py [before|after] [name ...]
Writes plans/r14/<name>_<tag>.txt
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

from bench import BENCH_QUERIES  # noqa: E402

from solr_map_reduce_spark.queries import registry  # noqa: E402
from solr_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(
        app_name="smrs-plancap", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    out_dir = os.path.join(repo, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    if ONLY:
        names = [n for n in reg if n in ONLY]
    else:
        names = list(BENCH_QUERIES)
    for name in names:
        qd = reg[name]
        spark.sparkContext.setJobDescription(f"plancap:{name}")
        t0 = time.perf_counter()
        df = qd.spark(spark, SF_DIR)
        build_sec = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        exec_sec = time.perf_counter() - t0
        with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(
                f"# {name} ({TAG}) — plan-build {build_sec:.3f}s, "
                f"single noop exec {exec_sec:.3f}s (rough, unwarmed)\n"
            )
            f.write(plan)
        print(f"{name}: build {build_sec:.3f}s exec {exec_sec:.3f}s")
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
