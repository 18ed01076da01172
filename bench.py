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
        W = 387072  # SWAR kernel block width (3 × 1008 × 128)
        L = W * 22  # ~8.5M symbols
        P = 4080  # 136 strips of 30 rows
    else:  # CPU smoke mode so the bench always runs
        L = 1 << 18
        P = 256

    symbols = rng.integers(0, 4, size=L).astype(np.int8)
    scores = rng.integers(-40, 12, size=(P, 4)).astype(np.int8)

    if on_tpu:
        from havac_tpu.ops.ssv_swar import (
            ROWS_PER_STRIP, _ssv_swar_jit, pack_symbols)

        W3 = W // 3
        B, S = L // W, P // ROWS_PER_STRIP
        symw = jnp.asarray(pack_symbols(symbols.astype(np.uint8), W3))
        scores_strips = jnp.asarray(
            (scores.astype(np.int32) + 256).reshape(S, ROWS_PER_STRIP, 4))
        istate = jnp.zeros((B, W3 // 128, 128), jnp.int32)
        icarry = jnp.zeros(P + 1, jnp.int32)

        def run():
            return _ssv_swar_jit(
                symw, scores_strips, istate, icarry,
                block_words=W3, max_hit_tiles=512, interpret=False)
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
    iters = 5
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
