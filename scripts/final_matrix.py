"""Round-5 closing control for the 4->16 scaling pair: one interleaved
matrix over {bucket count} x {maxPartitionBytes} at {4, 16} cores, fresh
JVM per point (scaling_worker subprocess), two full rounds so every
config's 4-core and 16-core sides sample the same drift windows.

Question being closed (VERDICT r4 #6): does any remaining knob lift the
4->16 pair to >= 0.8, or is the ~0.75 plateau the box's DRAM ceiling?
Writes BENCH/matrix_4x16.md.  Usage:
    python scripts/final_matrix.py [turns_millions]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

CONFIGS = [
    # (label, n_buckets, max_partition_mb)
    ("64bkt/64MB (r4 reference)", 64, 64),
    ("128bkt/64MB", 128, 64),
    ("128bkt/32MB", 128, 32),
]
CORES = (4, 16)
ROUNDS = 2


def run_worker(cpus: int, tpath: str, n_buckets: int, mpb: int) -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/scaling_worker.py"), str(cpus),
         tpath, "3", "bucketed", str(n_buckets), str(mpb)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {cpus} failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    turns_m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from scaling_bench import ensure_big_table

    tpath = ensure_big_table(turns_m * 1_000_000)
    times: dict[tuple, list[float]] = {}
    for rnd in range(ROUNDS):
        for label, nb, mpb in CONFIGS:
            for cores in CORES:
                r = run_worker(cores, tpath, nb, mpb)
                times.setdefault((label, cores), []).append(r["seconds"])
                print(f"round {rnd} {label} {cores} cores: {r['seconds']} s",
                      flush=True)

    n_turns = turns_m * 1_000_000
    rows = []
    for label, nb, mpb in CONFIGS:
        t4 = min(times[(label, 4)])
        t16 = min(times[(label, 16)])
        eff = (t4 / t16) / 4
        rows.append(
            f"| {label} | {t4:.1f} | {t16:.1f} | "
            f"{n_turns / t16 / 1e6:.2f} M | {eff:.2f} |"
        )
        print(rows[-1])

    per_round = "\n".join(
        f"- {label} @ {cores}: {[round(t, 1) for t in times[(label, cores)]]}"
        for label, _, _ in CONFIGS
        for cores in CORES
    )
    (REPO / "BENCH" / "matrix_4x16.md").write_text(
        f"""# BENCH/matrix_4x16 — round-5 closing control (bucketed fenced-expr plan, {turns_m}M turns)

Interleaved matrix, fresh JVM per point, {ROUNDS} rounds, best per cell
(each worker run is itself 2 warm-ups + best of 3).

| config | T_4 (s) | T_16 (s) | turns/s @16 | 4->16 efficiency |
|---|---|---|---|---|
{chr(10).join(rows)}

Per-round raw times (seconds):
{per_round}
"""
    )


if __name__ == "__main__":
    main()
