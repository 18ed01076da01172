"""Kernel micro-benchmark: device-only GCUPS for the Pallas SSV kernel.

Usage: python tools/kbench.py [L_log2] [P] [block_width] [rows_per_strip]
Prints per-iteration GCUPS with inputs staged in HBM (no host transfers in
the timed region). The companion of bench.py for kernel tuning work.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from havac_tpu.ops.common import SsvKernelConfig
    from havac_tpu.ops.ssv_pallas import _ssv_pallas_jit

    Llog = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    L = 1 << Llog

    cfg = SsvKernelConfig(block_width=W, rows_per_strip=K)
    WS = cfg.sublane_rows
    B, S = L // W, P // K
    rng = np.random.default_rng(0)
    sym = jnp.asarray(rng.integers(0, 4, size=(B, WS, 128)).astype(np.int8))
    sc = jnp.asarray(rng.integers(-40, 12, size=(S, K, 4)).astype(np.int32))
    ist = jnp.zeros((B, WS, 128), jnp.int32)
    ic = jnp.zeros(P + 1, jnp.int32)

    def run():
        return _ssv_pallas_jit(sym, sc, ist, ic, block_width=W,
                               rows_per_strip=K,
                               max_hit_tiles=cfg.max_hit_tiles,
                               interpret=False)

    out = run()
    np.asarray(out[3])
    best = 0.0
    for i in range(5):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = max(best, L * P / dt / 1e9)
        print(f"iter {i}: {dt*1e3:.1f} ms  {L*P/dt/1e9:.1f} GCUPS")
    print(f"BEST {best:.1f} GCUPS  (L=2^{Llog} P={P} W={W} K={K})")


if __name__ == "__main__":
    main()
