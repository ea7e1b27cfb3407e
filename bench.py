"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: one shared SparkSession (JVM startup excluded). One
untimed warmup pass of every headline query first (whole-stage-codegen
compilation + JIT + parquet footer caching are one-time costs a
long-running deployment doesn't pay per query), then each query timed
end-to-end in steady state (plan → execute → count). Queries span the
operator families: scan-agg, joins (broadcast + star), windows, top-k,
text, dedup, vectors — the mix a 100 TB deployment would run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_agg_basic",
    "q_join_star",
    "q_join_broadcast",
    "q_window_avg_two_grains",
    "q_window_rank",
    "q_topk",
    "q_groupby_avg_orderby",
    "q_text_wordcount",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_similarity_topk",
    "q_sql_tpch_q3",
    "q_sql_tpch_q6",
]

# round-2 heavyweights tracked separately so regressions in the newer
# surface are visible without moving the cross-round headline baseline
EXTENDED = [
    "q_decontaminate",
    "q_pagerank",
    "q_entity_resolve",
]


PASSES = 3


def _timed_pass(qs, names, spark, sf_dir) -> dict[str, float]:
    """Per query: min over PASSES steady-state runs. Ambient machine
    load has swung identical plans ~1.6× between rounds (BENCH_r2 vs
    r3: even scan-bound TPC-H Q6 moved in lockstep with everything
    else); the min is the closest observable to the plan's true cost."""
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(PASSES):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from nyc_tlc_trip_data_pipelines_spark.session import get_spark

    spark = get_spark("bench")
    qs = E.queries()

    # untimed warmup pass: codegen compile, JIT, parquet footers
    for name in HEADLINE + EXTENDED:
        qs[name](spark, sf_dir).count()

    timings = _timed_pass(qs, HEADLINE, spark, sf_dir)
    extended = _timed_pass(qs, EXTENDED, spark, sf_dir)
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended": extended,
                "extended_total": round(sum(extended.values()), 3),
                "passes": PASSES,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
