"""Isolate the engine's per-chunk PULL tax on the axon tunnel.

fusebench (benchmarks/fusebench_v5e.json) measured the fused
kernel+compaction executable at 85 ms/chunk (r3 geometry, dense workload)
when dispatches chain back-to-back with ONE final fetch — yet the engine's
sweep observes ~128-165 ms/chunk of device-side wait. The difference is the
per-chunk record pull (header fetch + bucketed slice fetch), ~43 ms/chunk
that fusebench's differential timing never sees.

This tool dispatches the SAME fused executable over n chained chunks and
times, in one process:

  nopull     — chain with one final fetch (fusebench's flow; the floor)
  hdr        — + per-chunk header copy_to_host_async at dispatch, fetched
               lookahead chunks later via is_ready polling (engine stage A)
  hdr+slice  — + the bucketed record-prefix slice dispatch and its fetch
               (the engine's full slice-pull flow)
  hdr+slice/block — same but waiting via arr.block_until_ready() instead of
               the is_ready() poll loop (prices the poll itself: if
               is_ready() on an in-flight remote buffer is an RPC, the poll
               loop serializes ~30-40 ms round trips into every chunk)
  capfetch   — per-chunk full cap-sized packed fetch (HAVAC_SLICE_PULL=0
               analog): prices wire bytes (2·cap·4 B vs ~2·n·4 B)

plus a microbenchmark of is_ready()/block latency on ready and in-flight
buffers.

Usage: python tools/pullprobe.py [--positions 150043] [--chunks 24]
                                 [--json benchmarks/pullprobe_v5e.json]
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
    ap.add_argument("--chunks", type=int, default=24,
                    help="chained chunk dispatches per timed variant")
    ap.add_argument("--lookahead", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from havac_tpu.utils.backend import bounded_backend_init

    bounded_backend_init(tag="pullprobe")

    from havac_tpu.engine import Havac
    from havac_tpu.engine.pipeline import PipelinedSweep, _pull_bucket
    from havac_tpu.io.fasta import SequenceDatabase
    from havac_tpu.ops.common import round_up

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
    assert sweep._slice_pull and sweep._fuse and sweep._donate
    maxt = sweep._chunk_maxt()
    symw, _lo, _Lc = sweep._pack_codes(0)
    B, WS = int(symw.shape[0]), int(symw.shape[1])
    scores_dev = sweep._scores_dev[0]
    reset_dev = sweep._reset_dev[0]
    istate0 = jnp.zeros((B, WS, 128), jnp.int32)
    icarry0 = jnp.zeros(sweep._rows1[0], jnp.int32)
    cells = B * W * sweep.rchunk

    # Converge the cap on chunk-0 density like the engine does (2x margin).
    out = sweep._dispatch_fused(symw, scores_dev, istate0, icarry0, maxt,
                                reset_dev, sweep.record_cap)
    hdr = np.asarray(out[2])
    n0 = int(hdr[0])
    cap = sweep.record_cap
    if n0 > cap:
        cap = int(round_up(2 * n0, 1024))
    print(f"# chunk0 records={n0} cap={cap} maxt={maxt} "
          f"cells/chunk={cells/1e9:.2f}G", flush=True)
    fn = sweep._get_fused(maxt, cap)

    def wait_poll(arr):
        while not arr.is_ready():
            time.sleep(0.0005)

    def wait_block(arr):
        arr.block_until_ready()

    def dispatch(st):
        tiles, cnts = sweep._hit_bufs(maxt)
        ostate, ocarry, header, rec, sweep._tiles_dev, sweep._cnts_dev = fn(
            symw, scores_dev, st, icarry0, reset_dev, tiles, cnts)
        return ostate, header, rec

    def run_chain(n, mode, wait):
        st = istate0
        pend = []
        pend2 = []
        fetched = 0

        def drain_hdr():
            nonlocal fetched
            header, rec = pend.pop(0)
            wait(header)
            h = np.asarray(header)
            k = min(_pull_bucket(2 * int(h[0])), 2 * cap)
            if mode in ("hdr+slice", "hdr+slice/block"):
                sl = rec[:k]
                try:
                    sl.copy_to_host_async()
                except AttributeError:
                    pass
                pend2.append(sl)
            elif mode == "capfetch":
                fetched += np.asarray(rec).nbytes

        def drain_slice():
            nonlocal fetched
            sl = pend2.pop(0)
            wait(sl)
            fetched += np.asarray(sl).nbytes

        for _ in range(n):
            st, header, rec = dispatch(st)
            if mode != "nopull":
                try:
                    header.copy_to_host_async()
                except AttributeError:
                    pass
                pend.append((header, rec))
                while len(pend) >= args.lookahead:
                    drain_hdr()
                while len(pend2) >= args.lookahead + 2:
                    drain_slice()
        while pend:
            drain_hdr()
        while pend2:
            drain_slice()
        wait(st)
        np.asarray(st[:1, :1, :1])
        return fetched

    from concurrent.futures import ThreadPoolExecutor

    def run_chain_thread(n, mode, wait):
        # Per-chunk pulls done entirely in ONE worker thread while the main
        # thread keeps dispatching: if the axon client allows a concurrent
        # D2H to overlap queued executions, the marginal cost approaches
        # nopull; if transfers serialize in the stream (or the client lock
        # contends), it approaches hdr+slice. ``noasync`` skips
        # copy_to_host_async so the transfer is initiated only by the
        # worker's np.asarray on a completed buffer.
        noasync = "noasync" in mode
        st = istate0
        fetched = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []

            def pull(header, rec):
                wait_poll(header)
                h = np.asarray(header)
                k = min(_pull_bucket(2 * int(h[0])), 2 * cap)
                sl = rec[:k]
                wait_poll(sl)
                return np.asarray(sl).nbytes

            for _ in range(n):
                st, header, rec = dispatch(st)
                if not noasync:
                    try:
                        header.copy_to_host_async()
                    except AttributeError:
                        pass
                futs.append(pool.submit(pull, header, rec))
                while len(futs) > args.lookahead + 2:
                    fetched += futs.pop(0).result()
            for f in futs:
                fetched += f.result()
        wait(st)
        np.asarray(st[:1, :1, :1])
        return fetched

    variants = [("nopull", "nopull", wait_poll),
                ("hdr", "hdr", wait_poll),
                ("hdr+slice", "hdr+slice", wait_poll),
                ("hdr+slice/block", "hdr+slice/block", wait_block),
                ("capfetch", "capfetch", wait_poll),
                ("threadpull", "thread", wait_poll),
                ("threadpull-noasync", "thread-noasync", wait_poll)]
    out_rows = {}
    for name, mode, wait in variants:
        runner = run_chain_thread if mode.startswith("thread") else run_chain
        runner(1, mode, wait)  # warm every executable incl. slice buckets
        t1s, tns = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            runner(1, mode, wait)
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fetched = runner(args.chunks + 1, mode, wait)
            tns.append(time.perf_counter() - t0)
        per = (min(tns) - min(t1s)) / args.chunks
        out_rows[name] = {
            "ms_per_chunk": round(per * 1e3, 2),
            "gcups": round(cells / per / 1e9, 1),
            "bytes_fetched_per_chunk": fetched // (args.chunks + 1),
            "t1_s": round(min(t1s), 3), "tn_s": round(min(tns), 3)}
        print(f"  {name:16s} {per*1e3:8.2f} ms/chunk  "
              f"{cells/per/1e9:7.1f} GCUPS  "
              f"({out_rows[name]['bytes_fetched_per_chunk']} B/chunk fetched)",
              flush=True)

    # --- is_ready / fetch latency microbench ---------------------------
    micro = {}
    ready_arr = np.asarray(out[3][:4096]), out[3][:4096]  # fetched+held
    arr = ready_arr[1]
    arr.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(1000):
        arr.is_ready()
    micro["is_ready_ready_us"] = round((time.perf_counter() - t0) * 1e3, 2)
    st = istate0
    for _ in range(3):
        st, header, rec = dispatch(st)
    t0 = time.perf_counter()
    k = 0
    while not st.is_ready():
        k += 1
    dt = time.perf_counter() - t0
    micro["is_ready_polls_while_busy"] = k
    micro["busy_wall_s"] = round(dt, 3)
    micro["is_ready_busy_us"] = round(dt / max(k, 1) * 1e6, 1)
    np.asarray(st[:1, :1, :1])
    print(f"# micro: {micro}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"chunks": args.chunks, "lookahead": args.lookahead,
                       "cap": cap, "maxt": maxt, "iters": args.iters,
                       "cells_per_chunk": cells, "variants": out_rows,
                       "micro": micro}, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
