"""Headline benchmark: SSV sweep throughput in GCUPS on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference FPGA's published 1,739 GCUPS (12,288 PEs @ 145 MHz on
an Alveo U50, `README.md:4`, BASELINE.md). Workload mirrors the reference
benchmark's shape (`benchmark/benchmark.cpp`): a large DNA database swept
against a multi-model pHMM collection; we time the device sweep (kernel
dispatch to completion, inputs staged in HBM), the analog of the reference's
"hardware run" phase timer (`benchmark/benchmark.cpp:43-71`).
"""

import json
import time

import numpy as np

BASELINE_GCUPS = 1739.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    if on_tpu:
        L = 1 << 23  # 8.4M symbols
        P = 4096
    else:  # CPU smoke mode so the bench always runs
        L = 1 << 18
        P = 256

    symbols = rng.integers(0, 4, size=L).astype(np.int8)
    scores = rng.integers(-40, 12, size=(P, 4)).astype(np.int8)

    if on_tpu:
        from havac_tpu.ops.common import SsvKernelConfig
        from havac_tpu.ops.ssv_pallas import _ssv_pallas_jit

        cfg = SsvKernelConfig()
        W, K, WS = cfg.block_width, cfg.rows_per_strip, cfg.sublane_rows
        B, S = L // W, P // K
        sym_blocks = jnp.asarray(symbols.reshape(B, WS, 128))
        scores_strips = jnp.asarray(
            scores.astype(np.int32).reshape(S, K, 4))
        istate = jnp.zeros((B, WS, 128), jnp.int32)
        icarry = jnp.zeros(P + 1, jnp.int32)

        def run():
            return _ssv_pallas_jit(
                sym_blocks, scores_strips, istate, icarry,
                block_width=W, rows_per_strip=K,
                max_hit_tiles=cfg.max_hit_tiles, interpret=False)
    else:
        from havac_tpu.ops.ssv_xla import ssv_scan_xla

        sym_dev = jnp.asarray(symbols)
        scores_dev = jnp.asarray(scores)
        istate = jnp.zeros(L, jnp.int32)
        icarry = jnp.zeros(P + 1, jnp.int32)

        def run():
            return ssv_scan_xla(sym_dev, scores_dev, istate, icarry)

    out = run()  # compile + warm up
    np.asarray(jax.tree.leaves(out)[-2 if on_tpu else 0])  # force full sync
    iters = 3
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run()  # hold the result: the experimental axon platform elides
        jax.block_until_ready(out)  # block on discarded temporaries
        times.append(time.perf_counter() - t0)
    dt = min(times)

    gcups = L * P / dt / 1e9
    print(json.dumps({
        "metric": "ssv_sweep_throughput",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
    }))


if __name__ == "__main__":
    main()
