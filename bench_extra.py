"""Per-query isolation bench + plan capture for optimization work.

NOT the driver's bench (bench.py is frozen for measurement). This harness
times individual driver-contract queries with the noop sink (guide §1.4 —
computes every column, no optimizer pruning like .count()), labels jobs
(guide §1.5), and dumps .explain("formatted") for the plan evidence the
round's OPTIMIZATION_r11.md cites.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --repeat 3 \
      --queries ann_ivf,emb_near_dup_pairs [--explain plans/r11 --tag before]

Prints one JSON line: {"sf_dir": ..., "repeat": N,
                       "queries": {name: [sec, ...]}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark  # same session config as the frozen bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--explain", default="",
                    help="directory to write <name>_<tag>.txt plan dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--count", action="store_true",
                    help="time .count() like bench.py instead of noop write")
    args = ap.parse_args()

    spark = build_spark(args.cpus)
    from subdomain_crawler_spark.plans import driver_queries as dq

    names = ([n for n in args.queries.split(",") if n]
             or list(dq.QUERIES))
    # warmup (same as bench.py)
    dq.QUERIES["tpch_q1"](spark, args.sf).count()

    out: dict[str, list[float]] = {}
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = dq.QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain,
                                   f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.monotonic()
            df = dq.QUERIES[name](spark, args.sf)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"  {name}: {runs}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": args.sf, "repeat": args.repeat,
                      "count_mode": bool(args.count), "queries": out}))


if __name__ == "__main__":
    main()
