"""Bounded JAX backend initialization for tools and driver hooks.

On this rig the TPU is reached through a tunnel whose PJRT plugin blocks
INDEFINITELY inside backend init when the tunnel is dead (observed: >6 h
outages). Every standalone entry point that touches the real chip bounds
ONLY the init step with a watchdog — the first-compile handshake (30-800 s,
legitimate) happens later and must stay unbounded.
"""

from __future__ import annotations

import os
import sys
import threading


def bounded_backend_init(timeout: float = 600.0, tag: str = "") -> str:
    """Return ``jax.default_backend()``, hard-exiting (status 3) if backend
    discovery exceeds ``timeout`` seconds — a dead tunnel otherwise hangs
    the calling process forever. ``tag`` names the caller in the abort
    message. Idempotent and cheap once backends are initialized."""
    import jax

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(timeout):
            print(f"{tag or 'havac_tpu'}: TPU backend init exceeded "
                  f"{timeout:.0f} s (tunnel down?); aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    backend = jax.default_backend()
    init_done.set()
    return backend
