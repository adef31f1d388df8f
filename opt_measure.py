"""Optimization-round harness: isolated per-query timing + plan capture.

Usage:
    python opt_measure.py <query> [<query> ...] [--tag before|after] [--runs 3] [--dir plans/r18]

For each named registry/supplementary query: build the DataFrame, write
`.explain("formatted")` to <dir>/<query>_<tag>.txt, then time
`noop`-sink executions (min-of-N) exactly like bench.py does.  Prints one
JSON line per query.  Same session config as bench.py (local[$SPARK_GRAFT_CPUS]).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_code_spark.plans.registry import QUERIES, SUPPLEMENTARY_QUERIES
from datawarehouse_code_spark.session import get_spark

BENCHABLE = {**SUPPLEMENTARY_QUERIES, **QUERIES}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    runs = 3
    plan_dir = "plans/r18"
    names: list[str] = []
    skip_plan = False
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--dir":
            plan_dir = args[i + 1]; i += 2
        elif args[i] == "--no-plan":
            skip_plan = True; i += 1
        else:
            names.append(args[i]); i += 1

    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(plan_dir, exist_ok=True)

    # one warm-up to pay classloading/Arrow startup once (not charged
    # to the first named query)
    from pyspark.sql import functions as F
    (spark.range(0, 2_000_000)
        .select((F.col("id") % 97).alias("k"))
        .groupBy("k").count()
        .write.format("noop").mode("overwrite").save())

    for name in names:
        q = BENCHABLE[name]
        df = q.fn(spark, SF_DIR)
        if not skip_plan:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{plan_dir}/{name}_{tag}.txt", "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"query": name, "tag": tag, "min": min(samples),
                          "samples": samples}), flush=True)


if __name__ == "__main__":
    main()
