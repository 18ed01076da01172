"""Dissect the per-chunk DEVICE cost of the engine's sweep on the real chip.

Round-3 instrumentation showed the 150k sweep is device-bound (ready_wait ≈
32 s of a 36 s run) at ~187 ms/chunk where kernel+compaction "should" cost
~75 ms — and that the regression appeared with the kernel+compaction fusion
and grew with the bigger round-3 chunks. This tool times, differentially
(delta between N and 1 data-dependent chained dispatches ending in a byte
fetch — the only truthful timing on this rig, see BENCHMARKS.md):

  kernel   — the SWAR kernel alone (round-2's first dispatch)
  k+c      — kernel then compaction as TWO dispatches (round-2's flow)
  fused    — ONE executable doing kernel + compaction (round-3's flow)
  compact  — compaction alone on a fixed kernel output

at both the round-3 chunk geometry (tile budget buys one full-size buffer)
and the round-2 geometry (budget/3), on the same dense synthetic workload
as tools/runtime_table.py. One process, one table.

Usage: python tools/fusebench.py [--positions 150043] [--reps 4]
                                 [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from runtime_table import synthetic_workload  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--positions", type=int, default=150043)
    ap.add_argument("--seq-len", type=int, default=50_818_468)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--json", default=None)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU smoke test of the "
                         "harness itself; timings are meaningless)")
    args = ap.parse_args()

    import jax

    if args.interpret:
        # CPU smoke: must pin the platform before any backend init (the
        # axon sitecustomize preloads jax; JAX_PLATFORMS env is ineffective).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from havac_tpu.utils.backend import bounded_backend_init

    bounded_backend_init(tag="fusebench")  # fail fast on a dead tunnel

    from havac_tpu.engine import Havac
    from havac_tpu.engine.pipeline import PipelinedSweep, _compact_tiles_impl
    from havac_tpu.io.fasta import SequenceDatabase
    from havac_tpu.ops.common import round_up

    models, seq = synthetic_workload(args.positions, args.seq_len)
    if args.interpret:
        from havac_tpu.ops.common import SsvKernelConfig

        engine = Havac(p_value=0.02, backend="pallas",
                       config=SsvKernelConfig.swar(block_width=6144,
                                                   interpret=True),
                       chunk_symbols=12288, chunk_rows=60)
    else:
        engine = Havac(p_value=0.02)
    engine.load_phmm(models)
    db = SequenceDatabase(codes=seq, starts=np.array([0, len(seq) + 1]),
                          lengths=np.array([len(seq)]), names=["synth-chr"],
                          seed=0)
    engine.load_sequence(db)
    codes = engine.database.codes
    W = engine.config.block_width
    if codes.shape[0] % W:
        codes = np.pad(codes, (0, round_up(codes.shape[0], W)
                               - codes.shape[0]))

    out = {"backend": jax.default_backend(), "reps": args.reps,
           "geometries": {}}

    for geom, budget in (("r3", engine.config.tile_budget_bytes),
                         ("r2", engine.config.tile_budget_bytes // 3)):
        cfg = dataclasses.replace(engine.config, tile_budget_bytes=budget,
                                  interpret=args.interpret)
        sweep = PipelinedSweep(codes, engine.scores, cfg,
                               engine.chunk_symbols, engine.chunk_rows)
        from havac_tpu.ops import ssv_swar as mod

        maxt = sweep._chunk_maxt()
        symw, _lo, _Lc = sweep._pack_codes(0)
        B, WS = int(symw.shape[0]), int(symw.shape[1])
        scores_dev = sweep._scores_dev[0]
        reset_dev = sweep._reset_dev[0]
        istate0 = jnp.zeros((B, WS, 128), jnp.int32)
        icarry0 = jnp.zeros(sweep._rows1[0], jnp.int32)
        cells = B * W * sweep.rchunk
        ginfo = {"n_chunks": sweep.n_col * sweep.n_row, "B": B,
                 "rchunk": sweep.rchunk, "maxt": maxt,
                 "tile_gb": round(maxt * sweep._tile_words * 4 / 2**30, 2),
                 "cells_per_chunk_g": round(cells / 1e9, 2), "variants": {}}
        out["geometries"][geom] = ginfo
        print(f"# geom={geom} chunks={ginfo['n_chunks']} B={B} "
              f"rchunk={sweep.rchunk} maxt={maxt} "
              f"tile_buf={ginfo['tile_gb']} GiB", flush=True)

        def kdisp(istate, icarry):
            return mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, reset_dev,
                block_words=sweep.W3, max_hit_tiles=maxt,
                interpret=args.interpret, isolate=sweep._isolate)

        # Kernel-only with DONATED hit buffers rethreaded dispatch-to-
        # dispatch (the production memory discipline, minus compaction):
        # at the r3 geometry the tile buffer is ~6 GiB, so undonated
        # chains (each enqueue allocates a fresh output buffer) overcommit
        # HBM at reps+1 in flight — exactly the failure mode the engine's
        # donation fix removed.
        kdon = _get_kernel_donated(jax, mod, sweep, maxt, args.interpret)

        # Converge the record cap on chunk 0's density (2x margin).
        k0 = kdisp(istate0, icarry0)
        cap = 1 << 14
        pk = _get_compact(jax, cap)(k0[4], k0[5], k0[2], k0[3][0],
                                    jnp.zeros(1, jnp.int32))
        n0 = int(np.asarray(pk[:1])[0])
        if n0 > cap:
            cap = int(round_up(2 * n0, 1024))
        ginfo["cap"] = cap
        ginfo["records_chunk0"] = n0
        print(f"#   records/chunk ~{n0}, cap={cap}", flush=True)

        fused = sweep._get_fused(maxt, cap)
        compact = _get_compact(jax, cap)

        # The tile buffer is several GiB at the r3 geometry; chains must
        # retain only the small outputs (state/count/packed) or two live
        # buffers exhaust HBM. ``compact`` runs first, on k0's retained
        # output, which is then freed before the kernel/fused chains.
        def run_compact(n):
            prev = jnp.zeros(1, jnp.int32)
            for _ in range(n):
                pk = compact(k0[4], k0[5], k0[2], k0[3][0], prev)
                prev = pk[:1]
            return np.asarray(prev)

        def run_kernel(n):
            st, cnt = istate0, None
            for _ in range(n):
                o = kdisp(st, icarry0)
                st, cnt = o[0], o[3]
                del o  # free the tile buffer before the next dispatch
            return np.asarray(cnt[:1])

        def run_kc(n):
            st, pk = istate0, None
            for _ in range(n):
                o = kdisp(st, icarry0)
                pk = compact(o[4], o[5], o[2], o[3][0],
                             jnp.zeros(1, jnp.int32))
                st = o[0]
                del o
            return np.asarray(pk[:1])

        def run_kernel_donated(n):
            st, cnt = istate0, None
            tiles = jnp.zeros((maxt, WS, 128), jnp.int32)
            cnts = jnp.zeros((maxt, 8, 128), jnp.int32)
            for _ in range(n):
                o = kdon(symw, scores_dev, st, icarry0, reset_dev, tiles,
                         cnts)
                st, cnt, tiles, cnts = o[0], o[3], o[4], o[5]
                del o
            return np.asarray(cnt[:1])

        def run_fused(n):
            # Donated tile/count buffers rethreaded dispatch-to-dispatch —
            # the production flow: one tile buffer live regardless of how
            # many dispatches are enqueued.
            st, pk = istate0, None
            tiles = jnp.zeros((maxt, WS, 128), jnp.int32)
            cnts = jnp.zeros((maxt, 8, 128), jnp.int32)
            for _ in range(n):
                o = fused(symw, scores_dev, st, icarry0, reset_dev, tiles,
                          cnts)
                # 5 outputs legacy (st, carry, packed, tiles, cnts); 6 in
                # slice-pull mode (st, carry, header, records, tiles, cnts).
                st, pk, tiles, cnts = o[0], o[2], o[-2], o[-1]
                del o
            return np.asarray(pk[:1])

        def run_fused_nodonate(n):
            # HAVAC_DONATE=0 variant: the executable takes no tile/count
            # buffers (internal temps, allocated per enqueue) and returns
            # only (st, carry, packed...) — same arity the engine uses.
            st, pk = istate0, None
            for _ in range(n):
                o = fused(symw, scores_dev, st, icarry0, reset_dev)
                st, pk = o[0], o[2]
                del o
            return np.asarray(pk[:1])

        if not sweep._donate:
            # Each enqueue holds a fresh internal tile buffer — clamp the
            # chain length like the other undonated variants.
            run_fused = run_fused_nodonate

        # Undonated chains (kernel / k+c: the round-2 production flow) hold
        # one fresh tile buffer PER ENQUEUED DISPATCH in HBM (enqueue runs
        # far ahead of execution), so their chain length is clamped to keep
        # the in-flight footprint under ~10 GiB — at the r3 geometry
        # (~6 GiB buffers on a 16 GiB chip) that means 1 rep; never risk a
        # RESOURCE_EXHAUSTED mid-batch.
        tile_bytes = maxt * sweep._tile_words * 4
        undon_reps = max(0, min(args.reps,
                                int(10 * 2**30 // max(tile_bytes, 1)) - 1))
        variants = [("compact", run_compact, args.reps)]
        if undon_reps:
            variants += [("kernel", run_kernel, undon_reps),
                         ("k+c", run_kc, undon_reps)]
        variants += [("kernel-don", run_kernel_donated, args.reps),
                     ("fused", run_fused,
                      args.reps if sweep._donate else max(undon_reps, 1))]
        for name, fn, reps in variants:
            if name in ("kernel", "kernel-don") and k0 is not None:
                del k0  # free the retained tile buffer (several GiB)
                k0 = None
            fn(1)  # compile + warm
            t0 = time.perf_counter()
            fn(1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(reps + 1)
            tn = time.perf_counter() - t0
            per = (tn - t1) / reps
            gc = cells / per / 1e9 if name != "compact" else 0.0
            ginfo["variants"][name] = {
                "ms_per_chunk": round(per * 1e3, 2), "reps": reps,
                "gcups": round(gc, 1), "t1": round(t1, 3),
                "tn": round(tn, 3)}
            print(f"  {name:10s} {per * 1e3:8.2f} ms/chunk"
                  + (f"  {gc:7.1f} GCUPS" if gc else "")
                  + (f"  (reps={reps})" if reps != args.reps else ""),
                  flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


_KDON_CACHE = {}


def _get_kernel_donated(jax, mod, sweep, maxt: int, interpret: bool):
    """Kernel-only executable with donated tile/count buffers (argnums 5, 6)
    — the fused flow's memory discipline without the compaction epilogue."""
    key = (sweep.W3, maxt, sweep._isolate, interpret)
    fn = _KDON_CACHE.get(key)
    if fn is None:
        W3, isolate = sweep.W3, sweep._isolate

        def kern(symw, sc, ist, ic, rs, tb, cb):
            return mod._ssv_swar_jit(
                symw, sc, ist, ic, rs, tb, cb, block_words=W3,
                max_hit_tiles=maxt, interpret=interpret, isolate=isolate)

        fn = jax.jit(kern, donate_argnums=(5, 6))
        _KDON_CACHE[key] = fn
    return fn


_COMPACT_CACHE = {}


def _get_compact(jax, cap: int):
    """Compaction-only executable with a chainable dummy input (prev[0]*0
    added to count) so repeated dispatches form a data-dependent chain."""
    from havac_tpu.engine.pipeline import _compact_tiles_impl

    fn = _COMPACT_CACHE.get(cap)
    if fn is None:
        fn = jax.jit(lambda ot, oc, om, cnt, prev: _compact_tiles_impl(
            ot, oc, om, cnt + prev[0] * 0, cap=cap))
        _COMPACT_CACHE[cap] = fn
    return fn


if __name__ == "__main__":
    sys.exit(main())
