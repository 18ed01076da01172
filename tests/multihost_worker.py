"""One process of a multi-process JAX CPU cluster (spawned by
tests/test_multihost.py).

Executes the per-host recipe from havac_tpu/parallel/multihost.py for real:
jax.distributed over localhost TCP, a global mesh spanning both processes'
virtual CPU devices, host-local database staging, and addressable-shard-only
hit decode. Writes this host's partial hit list to <outdir>/proc<i>.npz; the
parent concatenates the per-host outputs and asserts exact parity with the
single-process oracle.

Usage: multihost_worker.py <coordinator> <num_processes> <process_id> <outdir>
       [--case plain|overflow|2d]
"""

import os
import sys

import numpy as np


def make_inputs(case: str, n_global_dev: int):
    rng = np.random.default_rng(0)
    if case == "plain":
        codes = rng.integers(0, 4, size=4 * 3072 * n_global_dev)
        scores = rng.integers(-40, 110, size=(75, 4))
    elif case == "overflow":
        # Hits dense ONLY in process 0's half of the database: symbol 0
        # scores high, and only the first half contains symbol 0. With tiny
        # initial caps, host 0 overflows while host 1 does not — the exact
        # divergence the global_record_max sync exists for.
        L = 2 * 3072 * n_global_dev
        codes = rng.integers(1, 4, size=L)
        codes[: L // 2] = 0
        scores = np.full((30, 4), -40)
        scores[:, 0] = 110
    elif case == "2d":
        codes = rng.integers(0, 4, size=2 * 3072 * (n_global_dev // 2))
        scores = rng.integers(-40, 110, size=(64, 4))
    else:
        raise ValueError(case)
    return codes.astype(np.uint8), scores.astype(np.int8)


def main():
    coord, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    case = sys.argv[sys.argv.index("--case") + 1] \
        if "--case" in sys.argv else "plain"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_dev = len(jax.devices())
    from jax.sharding import Mesh

    codes, scores = make_inputs(case, n_dev)

    if case == "2d":
        from havac_tpu.parallel.swar_dist2d import Swar2DSweep

        mesh = Mesh(np.array(jax.devices()).reshape(-1, 2),
                    ("seq", "model"))
        sweep = Swar2DSweep(codes, mesh, "seq", "model", block_width=3072,
                            rows_per_step=30, interpret=True)
        prefix = np.array([0, 33, 64], dtype=np.int64)
        rows, pos = sweep.run(scores, prefix)
    else:
        from havac_tpu.parallel.swar_dist import SwarDistributedSweep

        mesh = Mesh(np.array(jax.devices()), ("seq",))
        kw = {}
        if case == "overflow":
            kw = dict(record_cap=16)
        sweep = SwarDistributedSweep(codes, mesh, block_width=3072,
                                     rows_per_step=30, interpret=True, **kw)
        rows, pos = sweep.run(scores)

    np.savez(os.path.join(outdir, f"proc{pid}.npz"), rows=rows, pos=pos,
             record_cap=sweep.record_cap)
    print(f"proc {pid}: {rows.size} local hits", flush=True)


if __name__ == "__main__":
    main()
