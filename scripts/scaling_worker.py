"""One scaling measurement: run the headline pipeline at a given core count
on a given transcripts parquet.  Prints one JSON line.

Usage: python scripts/scaling_worker.py <cpus> <transcripts_path> [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    cpus = int(sys.argv[1])
    tpath = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from quake3_log_analyser_spark.plans.pipeline import summarize_matches
    from quake3_log_analyser_spark.schemas import TRANSCRIPT_SCHEMA
    from quake3_log_analyser_spark.session import get_spark

    spark = get_spark("scaling", cpus=cpus, shuffle_partitions=cpus)
    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(tpath)
    n_turns = t.count()

    def run():
        return (
            summarize_matches(t, ops={"kills"})
            .agg(F.count(F.lit(1)).alias("n"), F.sum("total_kills"))
            .collect()[0]["n"]
        )

    run()  # warm: codegen + python workers
    best = min(
        (lambda t0=time.perf_counter(): (run(), time.perf_counter() - t0)[1])()
        for _ in range(reps)
    )
    print(
        json.dumps(
            {
                "cpus": cpus,
                "seconds": round(best, 3),
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / best),
            }
        )
    )


if __name__ == "__main__":
    main()
