"""Decompose the fused chunk's 84.4 ms (545 GCUPS dense no-pull floor).

pullprobe (benchmarks/pullprobe_v5e.json) measured the engine's fused
kernel+compaction executable at 84.4 ms/chunk with ZERO pulls against a
59.6 ms kernel-rate bound (771 GCUPS) — ~25 ms/chunk of device-side
overhead of which only the 6.7 ms compaction (compact_v5e_r4.json) was
attributed. This tool runs a LADDER of executables at the exact engine
geometry and dense 150k workload, all chained with one final fetch
(differential timing), so each rung's delta names one owner:

  k-none     — kernel with NO drain DMA at all (debug_drain="none"):
               the pure compute + slot-bookkeeping rate.
  k-sidecar  — + per-dirty-flush count-sidecar DMA (4 KB staging copy,
               start + wait) (debug_drain="sidecar").
  k-b1       — + full-tile drain, 1 band (one 172 KB DMA per dirty flush).
  k-b18      — + banded drain (the round-4 default, HAVAC_DRAIN_BANDS=18 →
               14 effective at WS=336: up to 14 starts/waits per dirty
               flush; measured +4.5 ms/chunk over b1, hence the round-5
               default flip back to 1).
  f-b1/f-b18 — + the fused on-device compaction (split header/records).
  fa-b18     — + the batched-pull accumulator append
               (dynamic_update_slice at the device-resident offset).

Usage: python tools/fuseladder.py [--positions 150043] [--chunks 24]
                                  [--json benchmarks/fuseladder_v5e.json]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--positions", type=int, default=150043)
    ap.add_argument("--seq-len", type=int, default=50_818_468)
    ap.add_argument("--chunks", type=int, default=24)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of rung names to run")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from havac_tpu.utils.backend import bounded_backend_init

    bounded_backend_init(tag="fuseladder")

    from havac_tpu.engine import Havac
    from havac_tpu.engine.pipeline import PipelinedSweep, _compact_tiles_split
    from havac_tpu.io.fasta import SequenceDatabase
    from havac_tpu.ops import ssv_swar as mod
    from havac_tpu.ops.common import round_up
    from havac_tpu.utils.provenance import provenance

    models, seq = synthetic_workload(args.positions, args.seq_len)
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
    sweep = PipelinedSweep(codes, engine.scores, engine.config,
                           engine.chunk_symbols, engine.chunk_rows)
    maxt = sweep._chunk_maxt()
    W3 = sweep.W3
    symw, _lo, _Lc = sweep._pack_codes(0)
    B, WS = int(symw.shape[0]), int(symw.shape[1])
    scores_dev = sweep._scores_dev[0]
    istate0 = jnp.zeros((B, WS, 128), jnp.int32)
    icarry0 = jnp.zeros(sweep._rows1[0], jnp.int32)
    cells = B * sweep.W * sweep.rchunk

    # Converge the record cap on chunk-0 density (like the engine warmup).
    out = sweep._dispatch_fused(symw, scores_dev, istate0, icarry0, maxt,
                                None, sweep.record_cap)
    hdr = np.asarray(out[2])
    n0 = int(hdr[0])
    cap = sweep.record_cap
    if n0 > cap:
        cap = int(round_up(2 * n0, 1024))
    print(f"# chunk0 records={n0} cap={cap} maxt={maxt} B={B} WS={WS} "
          f"cells/chunk={cells/1e9:.2f}G", flush=True)
    sweep._tiles_dev = sweep._cnts_dev = None  # fresh buffers per variant

    def make_fn(debug_drain=None, bands=1, compact=False, append=False,
                emit=True, xc=False, mxu=False):
        def fn(symw, scores_dev, istate, icarry, tiles, cnts, *extra):
            out = mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, None, tiles, cnts,
                block_words=W3, max_hit_tiles=maxt, interpret=False,
                isolate=False, drain_bands=bands, debug_drain=debug_drain,
                emit_cnts=emit, cnt_mxu=mxu)
            ocnts = mod.xla_tile_counts(out[4]) if xc else out[5]
            if not compact:
                if xc:  # counts alone (forces the reduce; not DCE'd)
                    return out[0], out[1], ocnts, out[4], out[5]
                return out[0], out[1], out[4], out[5]
            header, rec = _compact_tiles_split(out[4], ocnts, out[2],
                                               out[3][0], cap=cap)
            if not append:
                return out[0], out[1], header, rec, out[4], out[5]
            hdrbuf, recbuf, roff, slot = extra
            hdrbuf = jax.lax.dynamic_update_slice(hdrbuf, header[None],
                                                  (slot, 0))
            recbuf = jax.lax.dynamic_update_slice(recbuf, rec, (roff,))
            roff = roff + 2 * jnp.minimum(header[0], cap)
            return out[0], out[1], hdrbuf, recbuf, roff, out[4], out[5]

        donate = (4, 5, 6, 7) if append else (4, 5)
        return jax.jit(fn, donate_argnums=donate)

    LADDER = [
        ("k-none", dict(debug_drain="none")),
        ("k-cntcompute", dict(debug_drain="cntcompute")),
        ("k-sidecar", dict(debug_drain="sidecar")),
        ("k-sidecar-u", dict(debug_drain="sidecar-u")),
        ("k-b1", dict(bands=1)),
        ("k-b18", dict(bands=18)),
        ("k-b42", dict(bands=42)),
        ("f-b1", dict(bands=1, compact=True)),
        ("f-b18", dict(bands=18, compact=True)),
        ("fa-b1", dict(bands=1, compact=True, append=True)),
        ("fa-b18", dict(bands=18, compact=True, append=True)),
        # XLA-side counts (emit_cnts=False + xla_tile_counts): the kernel
        # sheds the 8.9 ms/chunk in-register count; the fused executable
        # re-derives counts at HBM bandwidth from the fully drained tiles.
        ("k-b1-nc", dict(bands=1, emit=False)),
        ("xc-b1", dict(bands=1, emit=False, xc=True)),
        ("f-b1-xc", dict(bands=1, compact=True, emit=False, xc=True)),
        ("fa-b1-xc", dict(bands=1, compact=True, append=True, emit=False,
                          xc=True)),
        # Count-sidecar implementation A/B (cnt_mxu — measured WORSE than
        # the default VPU lane reduce, kept as the rejected rung): MXU
        # broadcast + mask + sublane-group sum.
        ("k-b1-mxu", dict(bands=1, mxu=True)),
        ("fa-b1-mxu", dict(bands=1, compact=True, append=True, mxu=True)),
    ]
    if args.variants:
        LADDER = [(n, kw) for n, kw in LADDER if n in args.variants]

    N = args.chunks
    rows = {}
    for name, kw in LADDER:
        fn = make_fn(**kw)
        append = kw.get("append", False)

        def run_chain(n):
            st = istate0
            tiles = jnp.zeros((maxt, WS, 128), jnp.int32)
            cnts = jnp.zeros((maxt, 8, 128), jnp.int32)
            if append:
                hb = jnp.zeros((N + 1, 8 + maxt), jnp.int32)
                rb = jnp.zeros(((N + 1) * 2 * cap,), jnp.int32)
                roff = jnp.zeros((), jnp.int32)
                for i in range(n):
                    st, _, hb, rb, roff, tiles, cnts = fn(
                        symw, scores_dev, st, icarry0, tiles, cnts,
                        hb, rb, roff, np.int32(i))
            else:
                for _ in range(n):
                    st, _, *_rest, tiles, cnts = fn(
                        symw, scores_dev, st, icarry0, tiles, cnts)
            st.block_until_ready()
            np.asarray(st[:1, :1, :1])

        run_chain(1)  # compile + warm
        t1s, tns = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run_chain(1)
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_chain(N + 1)
            tns.append(time.perf_counter() - t0)
        per = (min(tns) - min(t1s)) / N
        rows[name] = {"ms_per_chunk": round(per * 1e3, 2),
                      "gcups": round(cells / per / 1e9, 1),
                      "t1_s": round(min(t1s), 3), "tn_s": round(min(tns), 3)}
        print(f"  {name:10s} {per*1e3:8.2f} ms/chunk  "
              f"{cells/per/1e9:7.1f} GCUPS", flush=True)

    if args.json:
        payload = {"chunks": N, "iters": args.iters, "cap": cap,
                   "maxt": maxt, "cells_per_chunk": cells,
                   "variants": rows, "provenance": provenance()}
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
