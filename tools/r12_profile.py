"""Per-query profiling for the optimization round: for each headline
query, time builder+noop (min-of-k like bench.py) and record the
number of Spark jobs / stages / tasks the query submits, via a
per-query job group + statusTracker. Overhead-bound queries (tiny
per-task work, many stages) separate cleanly from compute-bound ones.

Usage: python tools/r12_profile.py [query ...]   (default: HEADLINE)
Output: one JSON line per query on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_ingestion_tool_spark import get_spark  # noqa: E402
from data_ingestion_tool_spark.operators import registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    total_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    split = min(max(total_bytes // (cpus * 2), 1 << 20), 128 << 20)
    spark = get_spark(
        "r12-profile",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(split)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = registry()
    from bench import HEADLINE  # noqa: E402

    names = sys.argv[1:] or [n for n in HEADLINE if n in reg]

    # same warmups as bench.py
    reg[names[0]].builder(spark, SF_DIR).limit(1).collect()

    def _ident(it):
        yield from it

    (
        spark.range(cpus)
        .repartition(cpus)
        .mapInPandas(_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    tracker = sc.statusTracker()
    for name in names:
        best, best_counts = float("inf"), {}
        for r in range(RUNS):
            group = f"r12prof-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = reg[name].builder(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            if dt < best:
                best = dt
                best_counts = {
                    "jobs": len(job_ids),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
        print(
            json.dumps(
                {"query": name, "sec": round(best, 3), **best_counts}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
