"""D2H transfer cost curve on the axon tunnel: latency + bandwidth vs size.

The pipelined engine's remaining 150k overhead is serialized D2H (pull
batches of record slabs). Whether to shrink bytes (record re-encoding) or
enlarge batches (HAVAC_PULL_BATCH) depends on how the tunnel's effective
bandwidth scales with transfer size — this measures np.asarray wall time
for device-resident int32 buffers of 256 KB … 64 MB, fresh (device just
produced them) and with copy_to_host_async issued first.

Usage: python tools/d2hprobe.py [--json benchmarks/d2hprobe_v5e.json]
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
    ap.add_argument("--sizes-mb", type=float, nargs="+",
                    default=[0.25, 1, 4, 16, 64])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from havac_tpu.utils.backend import bounded_backend_init

    print(f"# backend={bounded_backend_init(tag='d2hprobe')}")

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def make(n, salt):
        return jnp.arange(n, dtype=jnp.int32) + salt

    rows = {}
    for mb in args.sizes_mb:
        n = int(mb * (1 << 20) // 4)
        fresh, pre = [], []
        for it in range(args.iters):
            arr = make(n, jnp.int32(it))
            arr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(arr)
            fresh.append(time.perf_counter() - t0)
            arr2 = make(n, jnp.int32(100 + it))
            arr2.block_until_ready()
            try:
                arr2.copy_to_host_async()
            except AttributeError:
                pass
            t0 = time.perf_counter()
            np.asarray(arr2)
            pre.append(time.perf_counter() - t0)
        f, p = min(fresh), min(pre)
        rows[str(mb)] = {
            "bytes": n * 4,
            "fresh_ms": round(f * 1e3, 1),
            "fresh_mb_s": round(n * 4 / f / 1e6, 1),
            "prefetched_ms": round(p * 1e3, 1),
            "prefetched_mb_s": round(n * 4 / p / 1e6, 1),
        }
        print(f"  {mb:6.2f} MB  fresh {f*1e3:8.1f} ms ({n*4/f/1e6:7.1f} MB/s)"
              f"   prefetched {p*1e3:8.1f} ms ({n*4/p/1e6:7.1f} MB/s)",
              flush=True)
    if args.json:
        with open(args.json, "w") as fj:
            json.dump(rows, fj, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
