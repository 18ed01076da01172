"""Kernel micro-benchmark: device-only GCUPS for the Pallas SSV kernels.

Times the production SWAR kernel (default) or the unpacked kernel
(``--kernel unpacked``) with inputs staged in HBM and DIFFERENTIAL timing —
the delta between 9 and 1 back-to-back dispatches of one executable, which
cancels the fixed per-call host round trip (~30-40 ms on the axon tunnel;
absolute timings underreported the kernel by ~40% and produced a spurious
"wider blocks are much faster" scaling curve). The companion of bench.py
for kernel tuning work.

Usage:
  python tools/kbench.py [--kernel swar|unpacked] [--blocks 22] [--rows 4080]
                         [--width 387072] [--sweep-blocks 2 4 8 22]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_differential(step, state0, *, n_lo=1, n_hi=9, iters=5):
    """Seconds per dispatch: (t(n_hi) - t(n_lo)) / (n_hi - n_lo).

    ``step(state) -> (state', fetchable)`` must CHAIN real data through the
    dispatches, and the fetchable is pulled with np.asarray — independent
    repeated dispatches of one executable get elided/overlapped by the axon
    platform (measured 400,000 "GCUPS"), and bare block_until_ready is
    unreliable there; a data-dependent chain ending in a real byte fetch is
    the only timing this rig respects."""

    def run_n(n):
        st = state0
        for _ in range(n):
            st, fetchable = step(st)
        return np.asarray(fetchable)

    def best(n):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run_n(n)
            times.append(time.perf_counter() - t0)
        return min(times)

    run_n(1)  # compile + warm
    return (best(n_hi) - best(n_lo)) / (n_hi - n_lo)


def bench_swar(B: int, P: int, W: int, max_hit_tiles: int = 512,
               iters: int = 5, dense: bool = False, card: int = 4) -> float:
    """``dense=True`` uses hit-rich scores (every strip flushes its tiles,
    the engine's realistic p=0.02 regime) and sizes the tile buffer for it —
    the regime where the kernel's hit-DMA overlap matters; the default
    sparse scores measure pure compute. ``card=20`` measures the amino
    variant (card-1 indicator planes; VERDICT r4 #7's rate record)."""
    import jax.numpy as jnp

    from havac_tpu.ops.ssv_swar import (
        ROWS_PER_FLUSH, ROWS_PER_STRIP, _ssv_swar_jit, pack_symbols)

    W3 = W // 3
    L = B * W
    rng = np.random.default_rng(0)
    codes = rng.integers(0, card, size=L).astype(np.uint8)
    hi = 110 if dense else 12
    scores = rng.integers(-40, hi, size=(P, card)).astype(np.int8)
    S = P // ROWS_PER_STRIP
    if dense:
        max_hit_tiles = B * S * (ROWS_PER_STRIP // ROWS_PER_FLUSH)
    symw = jnp.asarray(pack_symbols(codes, W3))
    sc = jnp.asarray((scores.astype(np.int32) + 256)
                     .reshape(S, ROWS_PER_STRIP, card))
    ist = jnp.zeros((B, W3 // 128, 128), jnp.int32)
    ic = jnp.zeros(P + 1, jnp.int32)

    def step(st):
        out = _ssv_swar_jit(symw, sc, st, ic, block_words=W3,
                            max_hit_tiles=max_hit_tiles, interpret=False)
        return out[0], out[1]  # chain ostate; fetch ocarry

    dt = time_differential(step, ist, iters=iters)
    return L * P / dt / 1e9


def bench_unpacked(B: int, P: int, W: int, K: int = 32,
                   iters: int = 5) -> float:
    import jax.numpy as jnp

    from havac_tpu.ops.common import SsvKernelConfig
    from havac_tpu.ops.ssv_pallas import _ssv_pallas_jit

    cfg = SsvKernelConfig(block_width=W, rows_per_strip=K)
    WS = cfg.sublane_rows
    L = B * W
    S = P // K
    rng = np.random.default_rng(0)
    sym = jnp.asarray(rng.integers(0, 4, size=(B, WS, 128)).astype(np.int8))
    sc = jnp.asarray(rng.integers(-40, 12, size=(S, K, 4)).astype(np.int32))
    ist = jnp.zeros((B, WS, 128), jnp.int32)
    ic = jnp.zeros(P + 1, jnp.int32)

    def step(st):
        out = _ssv_pallas_jit(sym, sc, st, ic, block_width=W,
                              rows_per_strip=K,
                              max_hit_tiles=cfg.max_hit_tiles,
                              interpret=False)
        return out[0], out[1]  # chain ostate; fetch ocarry

    dt = time_differential(step, ist, iters=iters)
    return L * P / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", choices=["swar", "unpacked"], default="swar")
    ap.add_argument("--blocks", type=int, default=22)
    ap.add_argument("--rows", type=int, default=4080)
    ap.add_argument("--width", type=int, default=387072)
    ap.add_argument("--rows-per-strip", type=int, default=32,
                    help="unpacked kernel only (SWAR is fixed at 30)")
    ap.add_argument("--sweep-blocks", type=int, nargs="*", default=None,
                    help="bench each B in the list instead of one point")
    ap.add_argument("--dense", action="store_true",
                    help="hit-rich scores: every strip flushes its hit "
                    "tiles (SWAR kernel only)")
    ap.add_argument("--card", type=int, default=4,
                    help="alphabet cardinality (SWAR kernel only): 4 = "
                    "nucleotide, 20 = amino. Amino wants --width 196608 "
                    "(19 indicator planes must fit VMEM)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from havac_tpu.utils.backend import bounded_backend_init

    bounded_backend_init(tag="kbench")  # fail fast on a dead tunnel
    blocks = args.sweep_blocks or [args.blocks]
    for B in blocks:
        if args.kernel == "swar":
            g = bench_swar(B, args.rows, args.width, iters=args.iters,
                           dense=args.dense, card=args.card)
        else:
            g = bench_unpacked(B, args.rows, args.width,
                               K=args.rows_per_strip, iters=args.iters)
        print(f"{args.kernel} B={B:3d} W={args.width} P={args.rows}"
              f" card={args.card}{' dense' if args.dense else ''}: "
              f"{g:8.1f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
