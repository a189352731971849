#!/usr/bin/env python3
"""Per-query isolation harness (guide §1.4): times individual declared
queries with the noop sink, dumps .explain("formatted"), and reports
per-run samples.  bench.py is FROZEN for measurement — this file exists
so optimization evidence (noop-sink isolation, plan snapshots, repeat
samples) can be produced without touching it.

Usage:
  python bench_extra.py q1 q2 ...        # time the named queries
  python bench_extra.py --all            # time every declared query
  python bench_extra.py --plan q1        # dump explain to plans/r09/
  python bench_extra.py --repeat 3 q1    # N samples per query
  python bench_extra.py --collect q1     # time with .collect() like bench.py
  python bench_extra.py --fresh q1       # fresh SparkSession per query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cores: int = CPUS):
    from bench import make_spark as mk

    spark = mk(cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_one(spark, name: str, fn, use_collect: bool) -> float:
    spark.sparkContext.setJobDescription(f"bench_extra: {name}")
    t0 = time.monotonic()
    df = fn(spark, SF_DIR)
    if use_collect:
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plan", action="store_true",
                    help="dump explain('formatted') to plans dir")
    ap.add_argument("--plan-dir", default="plans/r09")
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--collect", action="store_true",
                    help="time .collect() like bench.py (default: noop sink)")
    ap.add_argument("--fresh", action="store_true",
                    help="fresh SparkSession per query (no shared tiers)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    names = list(registry) if args.all else args.names
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = None if args.fresh else make_spark()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = registry[name]
        samples = []
        for _ in range(args.repeat):
            s = make_spark() if args.fresh else spark
            if args.plan:
                os.makedirs(args.plan_dir, exist_ok=True)
                df = fn(s, SF_DIR)
                p = os.path.join(args.plan_dir,
                                 f"{name}_{args.plan_suffix}.txt")
                with open(p, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
                print(f"wrote {p}", file=sys.stderr)
            samples.append(run_one(s, name, fn, args.collect))
            if args.fresh:
                s.stop()
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    if len(names) > 1:
        total = sum(min(v) for v in out.values())
        print(json.dumps({"total_min": round(total, 3)}), flush=True)


if __name__ == "__main__":
    main()
