"""Measured multi-device scaling curve on the virtual CPU mesh (VERDICT r3 #8).

Real multi-chip hardware is unavailable on this rig, so BENCHMARKS.md's
scaling claims rest on the wavefront fill model: a D-device wavefront over S
row chunks executes T = S + D − 1 steps, every device computing at every
step (SPMD), so useful work is S·D of T·D step-slots and predicted
efficiency is S/(S+D−1).

This tool validates that model's step accounting as a BOUND on the
8-virtual-device CPU mesh (`--xla_force_host_platform_device_count`).
Virtual devices share the host's compute, so wall(D)/wall(1) must land
between two structural envelopes: T(D)/S (fully serialized host — every
padded step is real compute) and (S+D-1)/(S·D) (devices perfectly
parallel). Landing INSIDE the envelope is the measurement: a wavefront
that dispatched more steps than T = S+D-1, or a seam exchange that
serialized the step pipeline, would push the ratio ABOVE the fill bound
T(D)/S. (This VM advertises one core but gives thread pools ~8×, so the
measured ratio sits between the envelopes rather than on the serialized
bound; absolute per-chip GCUPS scaling remains hardware-pending — see
BENCHMARKS.md.)

The run also asserts bit-exactness of every D against D=1 on a workload
with real hits (the pytest suite pins exactness vs the scalar oracle;
here it is free).

Usage:
  python tools/scaling_mesh.py --json benchmarks/scaling_cpu_mesh.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Must precede any jax import/backend init (the axon sitecustomize preloads
# jax; see tests/conftest.py for the same dance).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=1 << 18)
    ap.add_argument("--positions", type=int, default=1024)
    ap.add_argument("--rows-per-step", type=int, default=128)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    assert len(devs) >= max(args.devices), (
        f"need {max(args.devices)} virtual devices, got {len(devs)}")
    from jax.sharding import Mesh

    from havac_tpu.parallel.engine_dist import ssv_distributed
    from havac_tpu.utils.provenance import provenance

    rng = np.random.default_rng(11)
    L, P, R = args.seq_len, args.positions, args.rows_per_step
    symbols = rng.integers(0, 4, size=L).astype(np.uint8)
    # Hot enough that diagonal chains actually cross the 256 threshold —
    # the D-vs-D=1 exactness assertion must compare real hit sets, not
    # empty arrays (integers(-40, 12) produced zero hits at this length).
    scores = rng.integers(-11, 11, size=(P, 4)).astype(np.int8)
    S = P // R  # one rows_per_call covers the whole score stream

    out = {"provenance": provenance(), "seq_len": L, "positions": P,
           "rows_per_step": R, "num_strips": S, "rows": []}
    base = None
    wall1 = None
    for D in args.devices:
        mesh = Mesh(np.array(devs[:D]), ("seq",))

        def run():
            return ssv_distributed(symbols, scores, mesh,
                                   rows_per_step=R, rows_per_call=P)

        rows, pos = run()  # compile + warm; also the exactness sample
        if base is None:
            base = (rows, pos)
        else:
            assert np.array_equal(rows, base[0]), f"rows mismatch at D={D}"
            assert np.array_equal(pos, base[1]), f"pos mismatch at D={D}"
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        wall = min(times)
        if wall1 is None:
            wall1 = wall
        T = S + D - 1
        row = {
            "devices": D, "steps": T, "wall_s": round(wall, 4),
            "wall_median_s": round(sorted(times)[len(times) // 2], 4),
            "iters": args.iters,
            "predicted_fill_ratio": round(T / S, 4),
            "measured_wall_ratio": round(wall / wall1, 4),
            "predicted_efficiency": round(S / T, 4),
            # Seam bytes shipped per wavefront step: each interior edge
            # carries one int32 tail scalar per device pair on this path
            # (the SWAR path ships (R+1) int32 — noted for BENCHMARKS.md).
            "seam_bytes_per_step": 4 * (D - 1),
            "num_hits": int(rows.size),
        }
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
