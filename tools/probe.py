"""Fresh-session bench probes — the ambient-flag dismissal protocol.

When the calm gate flags a query the round's diff did not touch, the
dismissal protocol (established round 11 for q_ccf/q_mannwhitney, reused
round 12 for q_dedup_ngram_jaccard / q_bitmap_rollup /
q_text_wordcount / q_url_canonicalize) is:

1. a full QUIET bench run — its value vs the committed BENCH_LOCAL
   baseline is the decisive, protocol-comparable number;
2. N fresh-session probes (this script): each spawns a NEW python +
   SparkSession, runs one untimed warmup then one timed count, and the
   min-of-N is recorded. Fresh singles sit ~1.7-2.3x ABOVE bench
   steady state (JIT + codegen compile are one-time costs the bench's
   warmup pass amortizes) — that margin is expected, not a regression;
3. the query's band across committed BENCH_LOCAL history
   (``git log -- BENCH_LOCAL.json`` + ``git show rev:BENCH_LOCAL.json``)
   — a "regression" back INTO a band whose committed baseline was the
   fast edge is regression-to-band, dismissed with the band cited.

Record all three in DESIGN.md. A flag that reproduces >1.2x on the
quiet bench AND sits above its historical band needs a plan fix, not a
dismissal.

Usage: python tools/probe.py q_name [q_name ...] [--n 5] [--sf DIR]
Each probe runs in a subprocess so sessions never share a JVM.
"""

from __future__ import annotations

import subprocess
import sys

_CHILD = """
import sys, time
sys.path.insert(0, "/root/repo")
q, sf = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as E
fn = E.queries()[q]
fn(spark, sf).count()
t0 = time.perf_counter(); fn(spark, sf).count()
print(f"PROBE {q} {time.perf_counter() - t0:.3f}")
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    sf = "/root/testdata/sf0.1"
    argv = sys.argv[1:]
    if "--n" in argv:
        n = int(argv[argv.index("--n") + 1])
        args = [a for a in args if a != str(n)]
    if "--sf" in argv:
        sf = argv[argv.index("--sf") + 1]
        args = [a for a in args if a != sf]
    if not args:
        sys.exit(__doc__)
    for q in args:
        times = []
        for _ in range(n):
            out = subprocess.run(
                [sys.executable, "-c", _CHILD, q, sf],
                capture_output=True, text=True, timeout=300,
            )
            for line in out.stdout.splitlines():
                if line.startswith("PROBE"):
                    times.append(float(line.split()[2]))
        if not times:
            print(f"{q}: NO RESULT (query error?)")
            continue
        times.sort()
        print(
            f"{q}: min {times[0]:.3f} / spread {times[0]:.3f}-{times[-1]:.3f} "
            f"over {len(times)} fresh sessions"
        )


if __name__ == "__main__":
    main()
