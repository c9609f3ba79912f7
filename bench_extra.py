"""Round-6 optimization harness (bench.py is FROZEN; this file is the
builder's own measurement side-channel — guide §1.4).

Modes:
  python bench_extra.py plans [out_dir] [q...]   # .explain("formatted") per query
  python bench_extra.py noop [q...]              # noop-sink timing per query
  python bench_extra.py count [q...]             # bench.py-identical .count() timing

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEATS
(same contract as bench.py).  Each query is labeled with
setJobDescription so the UI/event log stays readable (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from hgcn_name_disambiguation_spark.session import get_spark

from bench import BENCH_QUERIES


def _session():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 16),
        extra_conf={"spark.driver.memory": "8g"},
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "count"
    rest = sys.argv[2:]
    out_dir = None
    if mode == "plans":
        out_dir = rest[0] if rest else "plans/r06"
        rest = rest[1:]
    names = rest or BENCH_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    spark = _session()
    qs = entry_mod.queries()

    total = 0.0
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        if mode == "plans":
            os.makedirs(out_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# {name}: plan -> {path}", file=sys.stderr)
            continue
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
        total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
        print(f"{name}\t{best:.3f}")
    print(f"TOTAL\t{total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
