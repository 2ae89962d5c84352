"""Scaling-efficiency evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the N -> 4N executor criterion
is evidenced by running the identical bench at two local parallelism
levels (fresh JVM each, via subprocess) on the SAME input and reporting
throughput at both plus efficiency = (T_N_cores / T_4N_cores) / 4.

Writes BENCH/BASELINE.md.  Usage:
    python scripts/scaling_bench.py [n_cores] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    small = run_bench(n, sf_dir)
    big = run_bench(4 * n, sf_dir)
    eff = (small["value"] / big["value"]) / 4 if big["value"] else 0.0
    report = {
        "n_cores": n,
        "turns_per_sec_N": small["turns_per_sec"],
        "turns_per_sec_4N": big["turns_per_sec"],
        "seconds_N": small["value"],
        "seconds_4N": big["value"],
        "scaling_efficiency": round(eff, 3),
        "sf": small["sf"],
        "n_turns": small["n_turns"],
    }
    print(json.dumps(report))

    md = REPO / "BENCH"
    md.mkdir(exist_ok=True)
    (md / "BASELINE.md").write_text(
        f"""# BENCH/BASELINE — scaling evidence (local[{n}] vs local[{4*n}])

Protocol per BASELINE.md: identical job (parse -> sessionize -> per-match
aggregate over {report['n_turns']:,} synthetic turns at {report['sf']}),
two parallelism levels, fresh JVM each, shuffle partitions = cores.

| cores | end-to-end sec | turns/sec |
|---|---|---|
| {n} | {report['seconds_N']} | {report['turns_per_sec_N']:,} |
| {4*n} | {report['seconds_4N']} | {report['turns_per_sec_4N']:,} |

**Scaling efficiency (T_N / T_4N) / 4 = {report['scaling_efficiency']}**
(target >= 0.8 per BASELINE.json).

Reference single-thread baseline: ~3,000,000 lines/sec
(/root/reference/README.md:62).

Full per-query timings land in the driver's BENCH_r{{N}}.json via bench.py.
"""
    )
    print(f"wrote {md / 'BASELINE.md'}")


if __name__ == "__main__":
    main()
