"""Summarize a round of A/B measurement JSONs into one table.

Reads the artifacts a measurement batch leaves behind (runtime_table
--json rows, fusebench/race_paths JSONs) and prints a compact comparison
against the published U50 number at the same size, so a diagnosis run
turns into a decision table in one command.

Usage: python tools/batch_summary.py [--dir /tmp] [--u50 14.16]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _pick(rows):
    """runtime_table emits one row per iteration; the honest number is the
    fastest warm (iter > 0) run, falling back to the cold row when the file
    holds a single run."""
    warm = [r for r in rows if r.get("iter", 0) > 0]
    pool = warm or rows
    best = min(pool, key=lambda r: r["seconds"])
    return best, ("warm" if warm else "cold")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp")
    ap.add_argument("--u50", type=float, default=14.16,
                    help="published U50 e2e seconds at the same size")
    args = ap.parse_args()

    rt = sorted(glob.glob(os.path.join(args.dir, "rt150k_*.json")))
    if rt:
        print(f"{'variant':22s} {'e2e s':>8s} {'vs U50':>7s} "
              f"{'sweep s':>8s} {'hits':>9s}  phases")
        for path in rt:
            try:
                rows = json.load(open(path))
            except (OSError, ValueError) as e:
                print(f"{os.path.basename(path):22s} unreadable: {e}")
                continue
            if isinstance(rows, dict):  # provenance-stamped format (r4+)
                rows = rows.get("rows", [])
            if not rows:
                continue
            best, kind = _pick(rows)
            phases = " ".join(
                f"{k}={v:.1f}" for k, v in sorted(
                    (best.get("phases") or {}).items())
                if isinstance(v, (int, float)) and v >= 0.05)
            name = os.path.basename(path)[len("rt150k_"):-len(".json")]
            print(f"{name:22s} {best['seconds']:8.2f} "
                  f"{args.u50 / best['seconds']:6.2f}x "
                  f"{best.get('sweep_seconds', 0):8.2f} "
                  f"{best.get('num_hits', 0):9d}  [{kind}] {phases}")

    fb = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "fusebench_v5e.json")
    for cand in (fb, os.path.join(args.dir, "fusebench_v5e.json")):
        if os.path.exists(cand):
            data = json.load(open(cand))
            print("\nfusebench (ms/chunk):")
            for geom, g in data.get("geometries", {}).items():
                vs = "  ".join(f"{k}={v['ms_per_chunk']}"
                               for k, v in g.get("variants", {}).items())
                print(f"  {geom}: chunks={g.get('n_chunks')} "
                      f"maxt={g.get('maxt')} tile={g.get('tile_gb')}GiB  "
                      f"cap={g.get('cap')}  {vs}")
            break

    race = os.path.join(args.dir, "race_150k.json")
    if os.path.exists(race):
        try:
            rows = json.load(open(race))
            if isinstance(rows, dict):  # provenance-stamped format (r4+)
                rows = rows.get("rows", [])
            print("\npath race (same dense 150k workload):")
            for r in rows:
                print(f"  {r['path']:12s} iter{r.get('iter', 0)} "
                      f"{r['seconds']:8.2f}s e2e "
                      f"({r.get('gcups_e2e', 0):.0f} GCUPS e2e, "
                      f"{r.get('gcups_sweep', 0):.0f} sweep), "
                      f"{r.get('num_hits', 0)} hits")
        except (OSError, ValueError, KeyError) as e:
            print(f"race_150k.json unreadable: {e}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
