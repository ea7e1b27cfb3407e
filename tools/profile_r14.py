"""Round-14 optimization profiler: per-query wall time (bench-parity
count() action), Spark job count, and explain("formatted") capture.

Usage:
  python tools/profile_r14.py [--plans DIR] [--suffix _before] [--passes 2] q_a q_b ...

For each query: one untimed warmup, then N timed passes (count()).
Job counts come from a per-query job group, so iterative queries'
action counts are visible (each collect/localCheckpoint/count = 1+ job).
Plans are written to DIR/<q><suffix>.txt when --plans is given.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "_before"
    passes = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from nyc_tlc_trip_data_pipelines_spark.session import get_spark

    spark = get_spark("profile_r14")
    sc = spark.sparkContext
    qs = E.queries()

    for name in names:
        fn = qs[name]
        # warmup (codegen/JIT/footers) — untimed
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        # timed passes inside a job group to count jobs
        runs = []
        n_jobs = 0
        for p in range(passes):
            group = f"prof:{name}:{p}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            try:
                n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            except Exception:
                n_jobs = -1
            sc.setJobGroup(None, None)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(plan)
        print(
            f"{name}: cold={warm:.3f}s passes={[round(r, 3) for r in runs]} "
            f"median={sorted(runs)[len(runs) // 2]:.3f}s jobs/pass={n_jobs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
