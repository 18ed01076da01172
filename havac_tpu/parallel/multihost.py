"""Multi-host orchestration: jax.distributed + global mesh + per-host IO.

The reference has no distributed transport (its only "transport" is XRT PCIe
buffer sync, `host/HavacHwClient.cpp:104,132`); scaling past one host is new
scope (SURVEY.md §2.5). The TPU-native recipe:

  1. every host calls :func:`initialize` (JAX's distributed runtime over DCN);
  2. :func:`global_sequence_mesh` builds one mesh over all chips in the
     slice; the engine's wavefront path then runs unchanged — XLA routes the
     per-strip seam `ppermute` over ICI within a host and DCN across hosts
     (one R-entry int32 vector per seam per strip, negligible vs the sweep);
  3. each host feeds only its local shard of the database
     (:func:`host_local_codes` gives the per-host slice + global offset), and
     hit decode runs on the host that owns the shard.

On a single host this degrades to the plain mesh the tests use, so the same
code path is exercised by the CPU-mesh suite.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime (no-op if single-process or
    already initialized). Arguments default to cluster auto-detection."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as exc:  # already initialized
        if "already" not in str(exc).lower():
            raise


def global_sequence_mesh(axis: str = "seq"):
    """1-D mesh over every chip in the slice (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def sequence_model_mesh(model_parallel: int, seq_axis: str = "seq",
                        model_axis: str = "model"):
    """2-D (sequence × model) mesh; model shards must cut the collection at
    model boundaries (wavefront.make_wavefront_fn model_axis contract)."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if devices.size % model_parallel:
        raise ValueError(
            f"{devices.size} devices not divisible by model_parallel="
            f"{model_parallel}")
    return Mesh(devices.reshape(-1, model_parallel), (seq_axis, model_axis))


def host_local_codes(codes: np.ndarray, mesh, axis: str = "seq"
                     ) -> Tuple[np.ndarray, int]:
    """This process's contiguous slice of the database + its global offset.

    With jax.make_array_from_process_local_data, each host materializes only
    its slice of the sharded codes array instead of the full database."""
    import jax

    D = mesh.shape[axis]
    L = codes.shape[0]
    shard = -(-L // D)
    procs = jax.process_count()
    if procs and D % procs:
        # Silent degradation here (process 0 taking everything) would be
        # wrong sharding, not a fallback — refuse instead.
        raise ValueError(
            f"mesh axis {axis!r} of size {D} is not divisible by "
            f"process_count={procs}; lay the mesh out so each host owns an "
            f"equal contiguous span of the sequence axis")
    per_host = D // procs if procs else D
    lo = jax.process_index() * per_host * shard
    hi = min(L, lo + per_host * shard)
    return codes[lo:hi], lo
