"""Micro-price the vector ops the record compaction is built from, at the
production (cap, 128) shape, on the real chip.

compactbench at engine geometry (maxt 11880, cap 176128) bills ~26.7 of the
28.6 ms compaction to the three per-record stages, i.e. ~0.15 us per record
slot — ~20x off bandwidth for what is nominally a handful of (cap, 128)
passes. Every one of those stages mixes LANE-axis reductions/cumsums (the
slow cross-lane direction on TPU), leading-axis row gathers, searchsorted,
and take_along_axis; this tool times each op in isolation, plus the
MXU reformulations (lane reduce = dot with ones; lane cumsum = dot with a
triangular ones matrix — exact in f32 for values < 2^24), so the compaction
rewrite targets the measured offender instead of a guess.

Usage: python tools/opbench.py [--cap 176128] [--json benchmarks/opbench_v5e.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=176128)
    ap.add_argument("--nb", type=int, default=743)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--lo", type=int, default=1)
    ap.add_argument("--hi", type=int, default=9)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from havac_tpu.utils.backend import bounded_backend_init

    print(f"# backend={bounded_backend_init(tag='opbench')} cap={args.cap}")

    cap, NB = args.cap, args.nb
    rng = np.random.default_rng(0)
    win_np = np.sort(rng.integers(0, cap, size=(cap, 128)).astype(np.int32),
                     axis=1)
    win = jnp.asarray(win_np)
    r1 = jnp.arange(cap, dtype=jnp.int32) + 1
    tbl = jnp.asarray(np.sort(rng.integers(0, cap, size=NB)).astype(np.int32))
    bic = jnp.asarray(rng.integers(0, NB, size=cap).astype(np.int32))
    offs2 = jnp.asarray(np.sort(
        rng.integers(0, cap, size=(NB, 128)).astype(np.int32), axis=1))
    lidx = jnp.asarray(rng.integers(0, 128, size=cap).astype(np.int32))
    ones128 = jnp.ones((128, 1), jnp.float32)
    # Inclusive-cumsum matrix: out[:, j] = sum_i x[:, i] [i <= j]
    tri = jnp.asarray(np.triu(np.ones((128, 128), np.float32)))

    def f(name):
        if name == "lanesum":
            def op(x, s):
                return jnp.sum((x < (r1 + s)[:, None]).astype(jnp.int32),
                               axis=1)
        elif name == "lanesum_dot":
            def op(x, s):
                m = (x < (r1 + s)[:, None]).astype(jnp.float32)
                return jax.lax.dot_general(
                    m, ones128, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, 0].astype(jnp.int32)
        elif name == "lanecumsum":
            def op(x, s):
                return jnp.cumsum(x + s, axis=1)[:, 127]
        elif name == "lanecumsum_dot":
            def op(x, s):
                c = jax.lax.dot_general(
                    (x + s).astype(jnp.float32), tri,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return c[:, 127].astype(jnp.int32)
        elif name == "rowgather":
            def op(x, s):
                return offs2[jnp.clip(bic + s, 0, NB - 1)][:, 0]
        elif name == "searchsorted":
            def op(x, s):
                return jnp.searchsorted(tbl, r1 + s, side="left"
                                        ).astype(jnp.int32)
        elif name == "takealong":
            def op(x, s):
                return jnp.take_along_axis(
                    x, jnp.clip(lidx + s, 0, 127)[:, None], axis=1)[:, 0]
        elif name == "cmp_only":
            def op(x, s):
                return ((x < (r1 + s)[:, None]).astype(jnp.int32))[:, 0]
        else:
            raise ValueError(name)

        @jax.jit
        def run(x, salt):
            out = op(x, salt)
            return out[:1] + out[cap // 2:cap // 2 + 1]

        return run

    names = ["lanesum", "lanesum_dot", "lanecumsum", "lanecumsum_dot",
             "rowgather", "searchsorted", "takealong", "cmp_only"]
    results = {}
    for name in names:
        run = f(name)

        def run_n(n):
            s = jnp.zeros((), jnp.int32)
            out = None
            for _ in range(n):
                out = run(win, s)
                s = out[0] * 0
            return np.asarray(out)

        run_n(1)
        def best(n):
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run_n(n)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (best(args.hi) - best(args.lo)) / (args.hi - args.lo)
        results[name] = {"ms": round(per * 1e3, 3),
                         "ns_per_slot": round(per / cap * 1e9, 2)}
        print(f"  {name:16s} {per*1e3:8.3f} ms   "
              f"{per/cap*1e9:7.2f} ns/slot", flush=True)

    if args.json:
        with open(args.json, "w") as fjson:
            json.dump({"cap": cap, "nb": NB, "results": results}, fjson,
                      indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
