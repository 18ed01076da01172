"""Race the engine's two single-chip execution paths on ONE workload.

VERDICT r2 weak #4: the pipelined path (384 GCUPS sweep, dense) and the
1-device mesh path (437-512 GCUPS, sparse) had only ever been measured on
DIFFERENT workloads. This tool runs both — plus the mesh path's monolithic
dispatch mode — on the same synthetic dense-hit workload and prints one
comparison table, so the engine's default routing is justified by a
measurement.

Each path runs ``--repeat`` times in one process; the first iteration pays
the remote-compile cost, later iterations are the honest warm numbers.

Usage: python tools/race_paths.py [--positions 150043] [--seq-len 50818468]
                                  [--composition uniform] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Also works under runpy.run_path (which doesn't add this file's directory
# to sys.path the way direct execution does).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from runtime_table import synthetic_workload  # noqa: E402


def run_path(name: str, make_engine, models, db, repeat: int):
    rows = []
    for it in range(repeat):
        engine = make_engine()
        engine.load_phmm(models).load_sequence(db)
        t0 = time.perf_counter()
        engine.run()
        t_run = time.perf_counter() - t0
        hits = engine.hits()
        elapsed = time.perf_counter() - t0
        row = {
            "path": name, "iter": it,
            "seconds": round(elapsed, 3),
            "run_seconds": round(t_run, 3),
            "sweep_seconds": round(engine.stats.sweep_seconds, 3),
            "gcups_sweep": round(engine.stats.gcups, 1),
            "gcups_e2e": round(engine.stats.cells / elapsed / 1e9, 1),
            "num_hits": len(hits),
        }
        if engine.stats.pipeline_prof:
            row["phases"] = {k: round(v, 3)
                             for k, v in engine.stats.pipeline_prof.items()}
        row["native_active"] = engine.stats.native_active
        if engine.stats.chunk_geometry:
            row["chunk_geometry"] = engine.stats.chunk_geometry
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main() -> int:
    from jax.sharding import Mesh

    import jax
    from havac_tpu.engine import Havac
    from havac_tpu.io.fasta import SequenceDatabase
    from havac_tpu.utils.backend import bounded_backend_init

    ap = argparse.ArgumentParser()
    ap.add_argument("--positions", type=int, default=150043)
    ap.add_argument("--seq-len", type=int, default=50_818_468)
    ap.add_argument("--pvalue", type=float, default=0.02)
    ap.add_argument("--composition", choices=["uniform", "genomic"],
                    default="uniform")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--paths", nargs="*",
                    default=["pipelined", "mesh_step", "mesh_mono"])
    ap.add_argument("--json", default=None)
    ap.add_argument("--allow-fallback", action="store_true",
                    help="record even when the native host core is "
                    "unavailable (tagged native_active=false)")
    args = ap.parse_args()

    from havac_tpu.utils.provenance import provenance

    bounded_backend_init(tag="race_paths")  # fail fast on a dead tunnel
    stamp = provenance(require_native=not args.allow_fallback)
    print(json.dumps({"provenance": stamp}), flush=True)
    models, seq = synthetic_workload(args.positions, args.seq_len,
                                     args.composition)
    db = SequenceDatabase(
        codes=seq, starts=np.array([0, len(seq) + 1]),
        lengths=np.array([len(seq)]), names=["synth-chr"], seed=0)

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("seq",))
    makers = {
        "pipelined": lambda: Havac(p_value=args.pvalue),
        "mesh_step": lambda: Havac(p_value=args.pvalue, mesh=mesh1),
        "mesh_mono": lambda: Havac(p_value=args.pvalue, mesh=mesh1,
                                   dist_step_dispatch=False),
    }
    all_rows = []
    for name in args.paths:
        all_rows += run_path(name, makers[name], models, db, args.repeat)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"provenance": stamp, "rows": all_rows}, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
