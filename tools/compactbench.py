"""Stage-by-stage timing of the on-device record compaction
(`engine/pipeline._compact_tiles_impl`) at real engine geometry.

The 150k-point phase attribution bills ~7 ms of every ~34 ms chunk to the
compaction dispatch (BENCHMARKS.md). This tool reproduces the engine's
exact compaction inputs (maxt dirty tiles at realistic ~5 nonzero words
per tile) and times truncated variants of the same computation, so the
7 ms can be attributed to a specific stage instead of guessed at:

  counts   — sidecar masking + group totals + NG-length cumsum + nrec
  search   — + per-record group searchsorted
  ingroup  — + (cap, C) count-row gather + lane-axis cumsum + in-group rank
  gather   — + the (cap, 128) random-row gather of the 2 GB tile buffer
  full     — the shipping compaction (adds in-row localization + packing)

Timing is differential and data-chained (axon rig rules: N vs 1 dispatches
of one executable, chained through an operand, ending in a byte fetch).

Usage: python tools/compactbench.py [--maxt 4152] [--ws 1008] [--cap 24576]
                                    [--hits-per-tile 5] [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_inputs(maxt: int, WS: int, hits_per_tile: float, seed: int = 0):
    """Device-side construction of realistic compaction inputs (an H2D of
    the 2 GB tile buffer over the tunnel would take minutes)."""
    import jax
    import jax.numpy as jnp

    C = WS // 8

    @jax.jit
    def gen(key):
        # ~hits_per_tile nonzero words per (WS, 128) tile, geometric-ish
        # placement like real scattered hits.
        p = hits_per_tile / (WS * 128)
        u = jax.random.uniform(key, (maxt, WS, 128))
        words = jnp.where(u < p, jnp.int32(0x201), 0)
        cnts = jnp.zeros((maxt, 8, 128), jnp.int32)
        c = jnp.sum((words.reshape(maxt, 8, C, 128) != 0).astype(jnp.int32),
                    axis=3)
        cnts = cnts.at[:, :, :C].set(c)
        return words, cnts

    key = jax.random.PRNGKey(seed)
    otiles, ocnts = gen(key)
    ometa = jnp.arange(maxt, dtype=jnp.int32)
    return otiles, ocnts, ometa


def make_stage(stage: str, cap: int):
    """A jitted ``fn(otiles, ocnts, ometa, count)`` for one truncated
    compaction variant. Each returns a small int32 vector (checksum-bearing
    so no stage is dead code). ``pipeline`` times the PRODUCTION
    ``_compact_tiles_core`` (the stages below are a frozen copy of the
    round-3 formulation, kept so rewrites can be compared against it)."""
    import jax
    import jax.numpy as jnp

    if stage == "pipeline":
        from havac_tpu.engine.pipeline import _compact_tiles_core

        @jax.jit
        def run_prod(otiles, ocnts, ometa, count):
            nrec, idx, words = _compact_tiles_core(otiles, ocnts, count,
                                                   cap)
            return (nrec[None].astype(jnp.int32) + idx[:1] + words[:1]
                    + idx[cap // 2:cap // 2 + 1])

        return run_prod

    @functools.partial(jax.jit, static_argnames=())
    def run(otiles, ocnts, ometa, count):
        maxt, WS, _ = otiles.shape
        R = maxt * WS
        C = WS // 8
        NG = maxt * 8
        rows = otiles.reshape(R, 128)
        cnt_g = ocnts[:, :, :C].reshape(NG, C)
        g_tot = jnp.sum(cnt_g, axis=1)
        g_tot = jnp.where(jnp.arange(NG) // 8 < count, g_tot, 0)
        NB = (NG + 127) // 128
        g2 = jnp.zeros((NB, 128), jnp.int32).reshape(-1).at[:NG].set(
            g_tot).reshape(NB, 128)
        in_row = jnp.cumsum(g2, axis=1)
        row_tot = in_row[:, 127]
        row_offs = jnp.cumsum(row_tot)
        offs2 = in_row + (row_offs - row_tot)[:, None]
        nrec = row_offs[NB - 1]
        if stage == "counts":
            return nrec[None] + row_offs[:1]
        r = jnp.arange(cap, dtype=jnp.int32)
        bi = jnp.searchsorted(row_offs, r + 1, side="left").astype(jnp.int32)
        bic = jnp.clip(bi, 0, NB - 1)
        win = offs2[bic]
        gl = jnp.sum((win < (r + 1)[:, None]).astype(jnp.int32), axis=1)
        glc = jnp.clip(gl, 0, 127)
        gic = jnp.clip(bic * 128 + glc, 0, NG - 1)
        if stage == "search":
            return nrec[None] + jnp.sum(gic)[None]
        row_base = (row_offs - row_tot)[bic]
        g_prev = jnp.where(
            glc > 0,
            jnp.take_along_axis(win, jnp.clip(glc - 1, 0, None)[:, None],
                                axis=1)[:, 0], row_base)
        grank = r + 1 - g_prev
        crow = cnt_g[gic]
        ccum = jnp.cumsum(crow, axis=1)
        gpos = jnp.sum((ccum < grank[:, None]).astype(jnp.int32), axis=1)
        gposc = jnp.clip(gpos, 0, C - 1)
        row_prev = jnp.where(
            gposc > 0,
            jnp.take_along_axis(ccum, jnp.clip(gposc - 1, 0, None)[:, None],
                                axis=1)[:, 0], 0)
        rank = grank - row_prev
        row_rc = (gic // 8) * WS + (gic % 8) * C + gposc
        if stage == "ingroup":
            return nrec[None] + jnp.sum(row_rc)[None] + jnp.sum(rank)[None]
        sel = rows[row_rc]
        if stage == "gather":
            return nrec[None] + jnp.sum(sel)[None]
        rowcum = jnp.cumsum((sel != 0).astype(jnp.int32), axis=1)
        lane = jnp.sum((rowcum < rank[:, None]).astype(jnp.int32), axis=1)
        lanec = jnp.clip(lane, 0, 127)
        words = jnp.take_along_axis(sel, lanec[:, None], axis=1)[:, 0]
        ok = r < nrec
        idx = jnp.where(ok, row_rc * 128 + lanec, -1)
        words = jnp.where(ok, words, 0)
        return jnp.concatenate([nrec[None].astype(jnp.int32),
                                ometa.astype(jnp.int32),
                                idx.astype(jnp.int32),
                                words.astype(jnp.int32)])

    return run


def time_stage(run, otiles, ocnts, ometa, count0, *, n_lo=1, n_hi=9,
               iters=5):
    """Differential seconds per dispatch, chained through the count
    operand (scalar dep forces ordering without copying the tile buffer)."""

    def run_n(n):
        c = count0
        out = None
        for _ in range(n):
            out = run(otiles, ocnts, ometa, c)
            c = count0 + out[0] * 0
        return np.asarray(out[:1])

    def best(n):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run_n(n)
            times.append(time.perf_counter() - t0)
        return min(times)

    run_n(1)  # compile + warm
    return (best(n_hi) - best(n_lo)) / (n_hi - n_lo)


STAGES = ["counts", "search", "ingroup", "gather", "full", "pipeline"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxt", type=int, default=4152)
    ap.add_argument("--ws", type=int, default=1008)
    ap.add_argument("--cap", type=int, default=24576)
    ap.add_argument("--hits-per-tile", type=float, default=5.0)
    ap.add_argument("--stages", nargs="*", default=STAGES)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from havac_tpu.utils.backend import bounded_backend_init

    print(f"# backend={bounded_backend_init(tag='compactbench')} "
          f"maxt={args.maxt} ws={args.ws} "
          f"cap={args.cap} hits/tile={args.hits_per_tile}")
    otiles, ocnts, ometa = build_inputs(args.maxt, args.ws,
                                        args.hits_per_tile)
    count0 = jnp.asarray(args.maxt, jnp.int32)
    results = {}
    prev = 0.0
    for stage in args.stages:
        run = make_stage(stage, args.cap)
        dt = time_stage(run, otiles, ocnts, ometa, count0)
        results[stage] = {"ms": round(dt * 1e3, 3),
                          "delta_ms": round((dt - prev) * 1e3, 3)}
        print(f"{stage:8s} {dt*1e3:8.3f} ms  (+{(dt-prev)*1e3:.3f})",
              flush=True)
        prev = dt
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "maxt": args.maxt, "ws": args.ws, "cap": args.cap,
                       "hits_per_tile": args.hits_per_tile,
                       "results": results}, f, indent=2)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
