"""Product sweep of the pipelined-engine A/B knobs at ONE workload size.

VERDICT r3 #3: the dense-hit 150k sweep realizes ~35-50% of kernel rate and
the knobs that plausibly close the gap (taller chunks via
HAVAC_TILE_BUDGET_GB, deeper HAVAC_LOOKAHEAD) were never swept as a product.
This tool runs the SAME synthetic workload as tools/runtime_table.py through
the full production engine (`Havac.run()` + `hits()`) under each knob
config, in ONE process (so every config shares the tunnel handshake and the
learned record cap), and reports warm seconds + the phase table per config.

The knobs are read by PipelinedSweep at construction, so in-process
os.environ mutation between engine builds is sufficient — each iteration
builds a fresh engine exactly like runtime_table.py does.

Usage:
  python tools/gatesweep.py --positions 150043 --warm 2 \
      --configs default b8 b10 b10l5 l5 --json benchmarks/gatesweep_v5e.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from runtime_table import synthetic_workload  # noqa: E402

# name -> {env var: value or None (= unset, engine default)}
CONFIGS = {
    "default": {},
    "l2": {"HAVAC_LOOKAHEAD": "2"},
    "l5": {"HAVAC_LOOKAHEAD": "5"},
    "b8": {"HAVAC_TILE_BUDGET_GB": "8"},
    "b10": {"HAVAC_TILE_BUDGET_GB": "10"},
    "b10l5": {"HAVAC_TILE_BUDGET_GB": "10", "HAVAC_LOOKAHEAD": "5"},
    "b12": {"HAVAC_TILE_BUDGET_GB": "12"},
    "nofuse": {"HAVAC_FUSE": "0"},
    "pb0": {"HAVAC_PULL_BATCH": "0"},
    "pb4": {"HAVAC_PULL_BATCH": "4"},
    "pb8": {"HAVAC_PULL_BATCH": "8"},
    "pb16": {"HAVAC_PULL_BATCH": "16"},
    "pb24": {"HAVAC_PULL_BATCH": "24"},
    "pb32": {"HAVAC_PULL_BATCH": "32"},
    "pb32l5": {"HAVAC_PULL_BATCH": "32", "HAVAC_LOOKAHEAD": "5"},
    "b10pb16": {"HAVAC_TILE_BUDGET_GB": "10", "HAVAC_PULL_BATCH": "16"},
    "bands1": {"HAVAC_DRAIN_BANDS": "1"},
    "bands18": {"HAVAC_DRAIN_BANDS": "18"},
    "bands42": {"HAVAC_DRAIN_BANDS": "42"},
    "bands126": {"HAVAC_DRAIN_BANDS": "126"},
    "pack0": {"HAVAC_REC_PACK": "0"},
    "keyform0": {"HAVAC_KEYFORM": "0"},
    "piece0": {"HAVAC_COMPACT_PIECE": "0"},
    "pb48": {"HAVAC_PULL_BATCH": "48"},
}
_KNOB_VARS = ("HAVAC_TILE_BUDGET_GB", "HAVAC_LOOKAHEAD", "HAVAC_FUSE",
              "HAVAC_DONATE", "HAVAC_SLICE_PULL", "HAVAC_PULL_BATCH",
              "HAVAC_DRAIN_BANDS", "HAVAC_REC_PACK", "HAVAC_KEYFORM",
              "HAVAC_COMPACT_PIECE")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--positions", type=int, default=150043)
    ap.add_argument("--seq-len", type=int, default=50_818_468)
    ap.add_argument("--pvalue", type=float, default=0.02)
    ap.add_argument("--warm", type=int, default=2,
                    help="timed warm iterations per config (after 1 cold)")
    ap.add_argument("--composition", choices=["uniform", "genomic"],
                    default="uniform")
    ap.add_argument("--configs", nargs="+", default=["default", "b8", "b10",
                                                     "b10l5", "l5"])
    ap.add_argument("--json", default=None)
    ap.add_argument("--interleave", action="store_true",
                    help="round-robin configs per iteration (tunnel-drift-"
                         "robust A/B) instead of finishing each config")
    args = ap.parse_args()

    from havac_tpu.utils.backend import bounded_backend_init
    from havac_tpu.utils.provenance import provenance

    bounded_backend_init(tag="gatesweep")
    stamp = provenance(require_native=True)  # knob sweep on numpy = garbage
    print(json.dumps({"provenance": stamp}), flush=True)

    from havac_tpu.engine import Havac
    from havac_tpu.io.fasta import SequenceDatabase

    models, seq = synthetic_workload(args.positions, args.seq_len,
                                     args.composition)
    db = SequenceDatabase(codes=seq, starts=np.array([0, len(seq) + 1]),
                          lengths=np.array([len(seq)]), names=["synth-chr"],
                          seed=0)

    out = {"provenance": stamp, "positions": args.positions,
           "composition": args.composition,
           "interleave": args.interleave, "configs": {}}

    def run_one(name: str, it: int):
        knobs = CONFIGS[name]
        for var in _KNOB_VARS:
            os.environ.pop(var, None)
        os.environ.update(knobs)
        engine = Havac(p_value=args.pvalue)
        engine.load_phmm(models)
        engine.load_sequence(db)
        t0 = time.perf_counter()
        engine.run()
        hits = engine.hits()
        elapsed = time.perf_counter() - t0
        row = {"iter": it, "seconds": round(elapsed, 3),
               "sweep_seconds": round(engine.stats.sweep_seconds, 3),
               "gcups_e2e": round(engine.stats.cells / elapsed / 1e9, 1),
               "num_hits": len(hits),
               "native_active": engine.stats.native_active,
               "overflow_retries": engine.stats.overflow_retries,
               "chunk_geometry": engine.stats.chunk_geometry}
        if engine.stats.pipeline_prof:
            row["phases"] = {k: round(v, 3) for k, v
                             in engine.stats.pipeline_prof.items()}
        print(json.dumps({"config": name, **row}), flush=True)
        return row

    all_runs = {name: [] for name in args.configs}
    if args.interleave:
        # Round-robin the configs so a drifting tunnel (the rig's warm
        # 150k pb16 measured 21.7 s one hour and 36-51 s the next, same
        # commit) biases every config equally instead of whichever ran
        # last. iter 0 of each config still pays its compile.
        for it in range(1 + args.warm):
            for name in args.configs:
                all_runs[name].append(run_one(name, it))
    else:
        for name in args.configs:
            for it in range(1 + args.warm):
                all_runs[name].append(run_one(name, it))
    for name in args.configs:
        runs = all_runs[name]
        warm = sorted(r["seconds"] for r in runs[1:])
        out["configs"][name] = {
            "knobs": CONFIGS[name], "runs": runs,
            "warm_min_s": warm[0], "warm_median_s": warm[len(warm) // 2]}
        print(json.dumps({"config": name, "warm_min_s": warm[0],
                          "warm_median_s": warm[len(warm) // 2]}), flush=True)
    for var in _KNOB_VARS:
        os.environ.pop(var, None)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
