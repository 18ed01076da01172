"""Multi-chip SWAR sweep: the production distributed path.

`parallel/engine_dist.py` proves exact sequence sharding with an XLA-scan
inner kernel; this module runs the same wavefront with the *Pallas SWAR
kernel* per shard, so each chip sweeps at full kernel speed (~775 GCUPS
sustained on v5e) while seams cost one (R+1)-int `ppermute` per row chunk.

Wavefront over row chunks of R rows: at scan step t, device k sweeps row
chunk s = t − k over its whole shard with one Pallas dispatch (grid =
shard blocks × R/30 strips), then ships the kernel's right-edge carry
(`ocarry`, which already includes the row −1 entry) to device k+1 — the
receiver's `icarry` is exactly the arriving seam, no stagger bookkeeping.
Row state chains on device between steps as the kernel's packed ostate.

Hit tiles are compacted to records *inside the scan step* (the same
count-sidecar compaction as the engine pipeline), so the stacked per-step
output is a small packed record vector, not gigabytes of bitmap tiles.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from havac_tpu.ops.common import round_up, sort_hit_pairs
from havac_tpu.ops.ssv_swar import (
    ROWS_PER_FLUSH,
    ROWS_PER_STRIP,
    _ssv_swar_jit,
    decode_swar_flat,
    pack_symbols,
)
from havac_tpu.engine.pipeline import (_compact_tiles_impl,
                                       _compact_tiles_packed16,
                                       _compact_tiles_split,
                                       _packed16_advance, _packed16_esc_cap,
                                       _pull_bucket, unpack_delta16)


class _RecordCapacityExceeded(RuntimeError):
    def __init__(self, nrec: int):
        super().__init__(f"record capacity exceeded (n={nrec})")
        self.nrec = nrec


def _get_shard_map():
    try:
        from jax import shard_map
        return shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        return shard_map


def make_swar_dist_fn(mesh: Mesh, axis: str, block_words: int,
                      rows_per_step: int, num_chunks: int, max_hit_tiles: int,
                      record_cap: int, interpret: bool,
                      col_chunks: int = 1, isolate: bool = False):
    """Jitted sharded SWAR sweep.

    fn(symw (D·Bs, WS, 128) int32 packed+sharded, scores (S, R/30, 30, 4)
    int32 biased+replicated, istate (D·Bs, WS, 128) sharded)
      → (ostate sharded, packed records (D, T, CC, 1 + maxt + 2·cap) sharded
         on axis 0) where T = S + D − 1 and CC = ``col_chunks``.

    ``col_chunks`` > 1 sweeps each shard in column sub-ranges per wavefront
    step, chaining the kernel's carry between them — the dirty-tile buffer
    then covers only one sub-range, so arbitrarily large per-chip shards fit
    the tile budget (the reference's serial segment sweep, one level up).
    """
    shard_map = _get_shard_map()
    R = rows_per_step
    S = num_chunks
    D = mesh.shape[axis]
    T = S + D - 1
    W3 = block_words
    CC = col_chunks
    perm = [(k, k + 1) for k in range(D - 1)]

    def device_fn(symw, scores_strips, reset_steps, istate0):
        k = jax.lax.axis_index(axis)
        Bs = symw.shape[0]
        assert Bs % CC == 0, (
            f"shard blocks ({Bs}) must be a multiple of col_chunks ({CC})")
        Bc = Bs // CC  # shard blocks per column chunk

        def step(carry, t):
            istate, seam_in = carry
            s = t - k
            active = jnp.logical_and(s >= 0, s < S)
            sc = jax.lax.dynamic_index_in_dim(
                scores_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)
            rr = jax.lax.dynamic_index_in_dim(
                reset_steps, jnp.clip(s, 0, S - 1), 0, keepdims=False)

            def col_chunk(carry_c, c):
                symw_c = jax.lax.dynamic_slice_in_dim(symw, c * Bc, Bc)
                istate_c = jax.lax.dynamic_slice_in_dim(istate, c * Bc, Bc)
                (ostate, ocarry, ometa, ocount, otiles,
             ocnts) = _ssv_swar_jit(
                    symw_c, sc, istate_c, carry_c,
                    rr if isolate else None, block_words=W3,
                    max_hit_tiles=max_hit_tiles, interpret=interpret,
                    isolate=isolate)
                count = jnp.where(active, ocount[0], 0)
                packed = _compact_tiles_impl(otiles, ocnts, ometa, count,
                                             cap=record_cap)
                return ocarry, (ostate, packed)

            ocarry, (ostates, packeds) = jax.lax.scan(
                col_chunk, seam_in, jnp.arange(CC))
            new_istate = ostates.reshape(Bs, *symw.shape[1:])
            istate = jnp.where(active, new_istate, istate)
            seam_out = jnp.where(active, ocarry, jnp.zeros_like(ocarry))
            seam_next = jax.lax.ppermute(seam_out, axis, perm)
            return (istate, seam_next), packeds

        init = (istate0, jnp.zeros(R + 1, jnp.int32))
        (istate, _), packeds = jax.lax.scan(step, init, jnp.arange(T))
        return istate, packeds[None]  # (1, T, CC, X)

    specs = dict(mesh=mesh,
                 in_specs=(P(axis), P(), P(), P(axis)),
                 out_specs=(P(axis), P(axis, None, None)))
    try:
        fn = shard_map(device_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(device_fn, check_rep=False, **specs)
    return jax.jit(fn)


def make_swar_dist_step_fn(mesh: Mesh, axis: str, block_words: int,
                           rows_per_step: int, num_chunks: int,
                           max_hit_tiles: int, record_cap: int,
                           interpret: bool, col_chunks: int = 1,
                           isolate: bool = False):
    """ONE wavefront step as a jitted sharded call (abort granularity).

    The monolithic scan (`make_swar_dist_fn`) is uncancelable once
    dispatched; this variant keeps the scan-carry (row state + seam vector)
    as sharded device arrays between calls, so the host can stop between
    steps — the analog of the reference's XRT abort
    (`host/HavacHwClient.cpp:159-165`) at the natural chunk boundary.
    One executable serves every step: the step index ``t`` is a replicated
    device scalar, not a static.

    fn(symw, scores, resets, istate sharded, seam (D, R+1) sharded,
    t (1,) replicated) → (istate', seam', packeds (D, CC, X))."""
    shard_map = _get_shard_map()
    R = rows_per_step
    S = num_chunks
    D = mesh.shape[axis]
    W3 = block_words
    CC = col_chunks
    perm = [(k, k + 1) for k in range(D - 1)]

    def device_fn(symw, scores_strips, reset_steps, istate, seam_in, t):
        k = jax.lax.axis_index(axis)
        Bs = symw.shape[0]
        assert Bs % CC == 0, (
            f"shard blocks ({Bs}) must be a multiple of col_chunks ({CC})")
        Bc = Bs // CC
        s = t[0] - k
        active = jnp.logical_and(s >= 0, s < S)
        sc = jax.lax.dynamic_index_in_dim(
            scores_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)
        rr = jax.lax.dynamic_index_in_dim(
            reset_steps, jnp.clip(s, 0, S - 1), 0, keepdims=False)

        def col_chunk(carry_c, c):
            symw_c = jax.lax.dynamic_slice_in_dim(symw, c * Bc, Bc)
            istate_c = jax.lax.dynamic_slice_in_dim(istate, c * Bc, Bc)
            (ostate, ocarry, ometa, ocount, otiles,
             ocnts) = _ssv_swar_jit(
                symw_c, sc, istate_c, carry_c,
                rr if isolate else None, block_words=W3,
                max_hit_tiles=max_hit_tiles, interpret=interpret,
                isolate=isolate)
            count = jnp.where(active, ocount[0], 0)
            packed = _compact_tiles_impl(otiles, ocnts, ometa, count,
                                         cap=record_cap)
            return ocarry, (ostate, packed)

        ocarry, (ostates, packeds) = jax.lax.scan(
            col_chunk, seam_in[0], jnp.arange(CC))
        new_istate = ostates.reshape(Bs, *symw.shape[1:])
        istate = jnp.where(active, new_istate, istate)
        seam_out = jnp.where(active, ocarry, jnp.zeros_like(ocarry))
        seam_next = jax.lax.ppermute(seam_out, axis, perm)
        return istate, seam_next[None], packeds[None]  # (1, CC, X)

    specs = dict(mesh=mesh,
                 in_specs=(P(axis), P(), P(), P(axis), P(axis), P()),
                 out_specs=(P(axis), P(axis), P(axis, None, None)))
    try:
        fn = shard_map(device_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(device_fn, check_rep=False, **specs)
    return jax.jit(fn)


def make_swar_dist_batch_step_fn(mesh: Mesh, axis: str, block_words: int,
                                 rows_per_step: int, num_chunks: int,
                                 max_hit_tiles: int, record_cap: int,
                                 interpret: bool, col_chunks: int = 1,
                                 isolate: bool = False, batch: int = 8,
                                 pack16: bool = True):
    """:func:`make_swar_dist_step_fn` with the pipelined engine's batched
    pull discipline (VERDICT r4 #2): each step's compacted records APPEND on
    device to per-shard donated accumulators — ``hdrbuf`` (kb·CC, 8 + maxt)
    split headers by batch position, ``recbuf`` (kb·CC·2·cap,) valid record
    prefixes at the device-resident running offset ``roff`` — so the host
    pulls the 8-int header prefixes plus ONE bucketed record-slab prefix per
    shard per ``batch`` steps, instead of a full cap-sized packed vector per
    step per shard. The legacy per-step flow pulled (1 + maxt + 2·cap) ints
    per step; at the dense 150k point that was 137–145 s of the mesh path's
    200 s run on this rig's serialized ~20 MB/s D2H tunnel
    (benchmarks/race_paths_v5e.json). Match: the reference's hit drain
    overlaps the sweep by construction (device/HitReporting.cpp:58-148).

    fn(symw, scores, resets, istate sharded, seam sharded, t (1,) replicated,
    bpos (1,) replicated batch position, hdrbuf/recbuf/roff sharded+donated)
      → (istate', seam', hdrbuf', recbuf', roff')."""
    shard_map = _get_shard_map()
    R = rows_per_step
    S = num_chunks
    D = mesh.shape[axis]
    W3 = block_words
    CC = col_chunks
    cap = record_cap
    perm = [(k, k + 1) for k in range(D - 1)]

    def device_fn(symw, scores_strips, reset_steps, istate, seam_in, t,
                  bpos, hdrbuf, recbuf, roff):
        k = jax.lax.axis_index(axis)
        Bs = symw.shape[0]
        assert Bs % CC == 0, (
            f"shard blocks ({Bs}) must be a multiple of col_chunks ({CC})")
        Bc = Bs // CC
        s = t[0] - k
        active = jnp.logical_and(s >= 0, s < S)
        sc = jax.lax.dynamic_index_in_dim(
            scores_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)
        rr = jax.lax.dynamic_index_in_dim(
            reset_steps, jnp.clip(s, 0, S - 1), 0, keepdims=False)

        def col_chunk(carry_c, c):
            symw_c = jax.lax.dynamic_slice_in_dim(symw, c * Bc, Bc)
            istate_c = jax.lax.dynamic_slice_in_dim(istate, c * Bc, Bc)
            (ostate, ocarry, ometa, ocount, otiles,
             ocnts) = _ssv_swar_jit(
                symw_c, sc, istate_c, carry_c,
                rr if isolate else None, block_words=W3,
                max_hit_tiles=max_hit_tiles, interpret=interpret,
                isolate=isolate)
            count = jnp.where(active, ocount[0], 0)
            if pack16:
                header, words, dpk, escv = _compact_tiles_packed16(
                    otiles, ocnts, ometa, count, cap=cap)
                return ocarry, (ostate, header, words, dpk, escv)
            header, rec = _compact_tiles_split(otiles, ocnts, ometa, count,
                                               cap=cap)
            return ocarry, (ostate, header, rec)

        ocarry, scanned = jax.lax.scan(col_chunk, seam_in[0],
                                       jnp.arange(CC))
        ostates, headers = scanned[0], scanned[1]
        new_istate = ostates.reshape(Bs, *symw.shape[1:])
        istate = jnp.where(active, new_istate, istate)
        seam_out = jnp.where(active, ocarry, jnp.zeros_like(ocarry))
        seam_next = jax.lax.ppermute(seam_out, axis, perm)
        off = roff[0]
        for c in range(CC):
            hdrbuf = jax.lax.dynamic_update_slice(
                hdrbuf, headers[c][None], (bpos[0] * CC + c, 0))
            n = jnp.minimum(headers[c][0], cap)
            if pack16:
                _, _, words, dpk, escv = scanned
                recbuf = jax.lax.dynamic_update_slice(recbuf, words[c],
                                                      (off,))
                recbuf = jax.lax.dynamic_update_slice(recbuf, dpk[c],
                                                      (off + n,))
                recbuf = jax.lax.dynamic_update_slice(
                    recbuf, escv[c], (off + n + (n + 1) // 2,))
                off = off + _packed16_advance(n, cap, headers[c][2])
            else:
                recbuf = jax.lax.dynamic_update_slice(recbuf,
                                                      scanned[2][c], (off,))
                off = off + 2 * n
        return istate, seam_next[None], hdrbuf, recbuf, off[None]

    specs = dict(mesh=mesh,
                 in_specs=(P(axis), P(), P(), P(axis), P(axis), P(), P(),
                           P(axis), P(axis), P(axis)),
                 out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)))
    try:
        fn = shard_map(device_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(device_fn, check_rep=False, **specs)
    return jax.jit(fn, donate_argnums=(7, 8, 9))


def make_swar_dist_superstep_fn(mesh: Mesh, axis: str, block_words: int,
                                rows_per_step: int, num_chunks: int,
                                max_hit_tiles: int, record_cap: int,
                                interpret: bool, col_chunks: int = 1,
                                isolate: bool = False, batch: int = 8,
                                pack16: bool = True):
    """:func:`make_swar_dist_batch_step_fn` with ``batch`` wavefront steps
    per DISPATCH (round 5): the per-step body runs under one ``lax.scan``,
    so the host enqueues once per batch instead of once per step. On the
    tunnel rig each enqueue costs ~30 ms; at the dense 150k point the
    per-step flow spent 33.5 s of its 114.5 s run in dispatch alone
    (benchmarks/race_paths_r5_v5e.json) — the superstep divides that by
    ``batch`` while keeping the batched two-transfer pull flow and an
    abort/checkpoint granularity of ``batch`` steps (the monolithic scan is
    uncancelable; this is the middle ground). A production local-PJRT
    deployment (~50 µs enqueue) gains little but loses nothing.

    fn(symw, scores, resets, istate sharded, seam sharded, t0 (1,)
    replicated first step, nsteps (1,) replicated live-step count (≤ batch;
    trailing scan iterations are inactive no-ops with n = 0 headers),
    hdrbuf/recbuf/roff sharded+donated) → (istate', seam', hdrbuf',
    recbuf', roff')."""
    shard_map = _get_shard_map()
    S = num_chunks
    D = mesh.shape[axis]
    W3 = block_words
    CC = col_chunks
    cap = record_cap
    kb = batch
    perm = [(k, k + 1) for k in range(D - 1)]

    def device_fn(symw, scores_strips, reset_steps, istate, seam_in, t0,
                  nsteps, hdrbuf, recbuf, roff):
        k = jax.lax.axis_index(axis)
        Bs = symw.shape[0]
        assert Bs % CC == 0, (
            f"shard blocks ({Bs}) must be a multiple of col_chunks ({CC})")
        Bc = Bs // CC

        def one_step(carry, i):
            istate, seam, hdrbuf, recbuf, off = carry
            t = t0[0] + i
            s = t - k
            # ``live``: a real wavefront step of this batch (trailing scan
            # iterations of a partial batch are dead and must leave ALL
            # carried state — including the seam — untouched). ``active``:
            # live AND inside this shard's s-range; edge-inactive live
            # steps still ppermute zeros into the pipe, exactly like the
            # per-step flow.
            live = i < nsteps[0]
            active = jnp.logical_and(live,
                                     jnp.logical_and(s >= 0, s < S))
            sc = jax.lax.dynamic_index_in_dim(
                scores_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)
            rr = jax.lax.dynamic_index_in_dim(
                reset_steps, jnp.clip(s, 0, S - 1), 0, keepdims=False)

            def col_chunk(carry_c, c):
                symw_c = jax.lax.dynamic_slice_in_dim(symw, c * Bc, Bc)
                istate_c = jax.lax.dynamic_slice_in_dim(istate, c * Bc, Bc)
                (ostate, ocarry, ometa, ocount, otiles,
                 ocnts) = _ssv_swar_jit(
                    symw_c, sc, istate_c, carry_c,
                    rr if isolate else None, block_words=W3,
                    max_hit_tiles=max_hit_tiles, interpret=interpret,
                    isolate=isolate)
                count = jnp.where(active, ocount[0], 0)
                if pack16:
                    header, words, dpk, escv = _compact_tiles_packed16(
                        otiles, ocnts, ometa, count, cap=cap)
                    return ocarry, (ostate, header, words, dpk, escv)
                header, rec = _compact_tiles_split(otiles, ocnts, ometa,
                                                   count, cap=cap)
                return ocarry, (ostate, header, rec)

            ocarry, scanned = jax.lax.scan(col_chunk, seam, jnp.arange(CC))
            ostates, headers = scanned[0], scanned[1]
            new_istate = ostates.reshape(Bs, *symw.shape[1:])
            istate = jnp.where(active, new_istate, istate)
            seam_out = jnp.where(active, ocarry, jnp.zeros_like(ocarry))
            seam = jnp.where(live, jax.lax.ppermute(seam_out, axis, perm),
                             seam)
            for c in range(CC):
                hdrbuf = jax.lax.dynamic_update_slice(
                    hdrbuf, headers[c][None], (i * CC + c, 0))
                n = jnp.minimum(headers[c][0], cap)
                if pack16:
                    _, _, words, dpk, escv = scanned
                    recbuf = jax.lax.dynamic_update_slice(recbuf, words[c],
                                                          (off,))
                    recbuf = jax.lax.dynamic_update_slice(recbuf, dpk[c],
                                                          (off + n,))
                    recbuf = jax.lax.dynamic_update_slice(
                        recbuf, escv[c], (off + n + (n + 1) // 2,))
                    off = off + _packed16_advance(n, cap, headers[c][2])
                else:
                    recbuf = jax.lax.dynamic_update_slice(
                        recbuf, scanned[2][c], (off,))
                    off = off + 2 * n
            return (istate, seam, hdrbuf, recbuf, off), None

        init = (istate, seam_in[0], hdrbuf, recbuf, roff[0])
        (istate, seam, hdrbuf, recbuf, off), _ = jax.lax.scan(
            one_step, init, jnp.arange(kb, dtype=jnp.int32))
        return istate, seam[None], hdrbuf, recbuf, off[None]

    specs = dict(mesh=mesh,
                 in_specs=(P(axis), P(), P(), P(axis), P(axis), P(), P(),
                           P(axis), P(axis), P(axis)),
                 out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)))
    try:
        fn = shard_map(device_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(device_fn, check_rep=False, **specs)
    return jax.jit(fn, donate_argnums=(7, 8, 9))


class SwarDistributedSweep:
    """Stateful multi-chip SWAR sweep (engine mesh fast path).

    Shards the packed database over ``mesh[axis]``; ``run`` sweeps the whole
    model stream in R-row wavefront chunks and returns exact global hits.
    """

    def __init__(self, codes: np.ndarray, mesh: Mesh, axis: str = "seq",
                 block_width: int = 387072, rows_per_step: int = 2040,
                 tile_budget_bytes: int = 6 << 30,
                 record_cap: int = 1 << 14,
                 interpret: bool = False):
        if block_width % 3072:
            raise ValueError("block_width must be a multiple of 3072")
        if rows_per_step % ROWS_PER_STRIP:
            raise ValueError("rows_per_step must be a multiple of 30")
        self.mesh = mesh
        self.axis = axis
        self.W = block_width
        self.W3 = block_width // 3
        self.R = rows_per_step
        self.D = mesh.shape[axis]
        self.record_cap = record_cap
        self.interpret = interpret

        # Equal shards of whole blocks per device; when a shard's worst-case
        # dirty tiles exceed the budget, sweep it in CC column chunks per
        # wavefront step (carry chained through the kernel) so only one
        # chunk's tile buffer is live.
        L = codes.shape[0]
        tile_bytes = self.W3 * 4
        nflush = ROWS_PER_STRIP // ROWS_PER_FLUSH
        strips = self.R // ROWS_PER_STRIP
        budget_tiles = max(strips * nflush,
                           tile_budget_bytes // (3 * tile_bytes))
        blocks_total = -(-L // self.W)
        shard_blocks = -(-blocks_total // self.D)
        # Bound blocks-per-chunk by the budget first, so maxt never exceeds
        # it, then round the shard up to a chunk multiple (pad waste bounded
        # by one chunk, not by col_chunks).
        blocks_per_chunk = max(1, budget_tiles // (strips * nflush))
        self.col_chunks = max(1, -(-shard_blocks // blocks_per_chunk))
        shard_blocks = round_up(shard_blocks, self.col_chunks)
        self.L = L
        self.shard_blocks = shard_blocks
        self.shard_width = shard_blocks * self.W
        self.chunk_blocks = shard_blocks // self.col_chunks
        self.maxt = self.chunk_blocks * strips * nflush

        # Multi-host staging: each process packs + uploads ONLY the blocks
        # its own devices shard (jax.make_array_from_process_local_data
        # assembles the global array); a host never materializes the other
        # hosts' device data. Single-process this is the whole database.
        from havac_tpu.parallel.multihost import local_row_range, stage_sharded

        self._shard = NamedSharding(mesh, P(axis))
        G = shard_blocks * self.D  # global packed blocks
        b_lo, b_hi = local_row_range(G, mesh, axis)
        lo, hi = b_lo * self.W, min(L, b_hi * self.W)
        local_padded = np.zeros((b_hi - b_lo) * self.W, dtype=np.uint8)
        if hi > lo:
            local_padded[: hi - lo] = codes[lo:hi]
        self.symw_dev = stage_sharded(
            pack_symbols(local_padded, self.W3), self._shard, G)
        self._fns = {}
        # HAVAC_MESH_PULL_BATCH=k — wavefront steps whose compacted records
        # accumulate ON DEVICE (per shard) before one header-prefix + one
        # bucketed record-slab pull per shard (0 = legacy per-step cap-sized
        # pulls, the pre-round-5 flow kept for A/B). Default 8: T is
        # typically tens of steps, so 8 bounds the drain tail while cutting
        # the serialized-D2H transfer count ~8x (the per-step pulls were
        # 137-145 s of the mesh path's 200 s dense 150k run,
        # benchmarks/race_paths_v5e.json).
        self._pull_batch = int(os.environ.get("HAVAC_MESH_PULL_BATCH", "8"))
        if self._pull_batch < 0:
            self._pull_batch = 8
        # HAVAC_MESH_SUPERSTEP=0 — one dispatch per wavefront step (the
        # round-5-early flow) instead of one dispatch per pull batch. The
        # superstep scan cuts the per-enqueue tunnel cost (~30 ms each;
        # 33.5 s of the dense 150k run) by the batch factor while keeping
        # abort/checkpoint granularity at ``pull_batch`` steps.
        self._superstep = (self._pull_batch > 0 and
                           os.environ.get("HAVAC_MESH_SUPERSTEP", "1")
                           != "0")
        # HAVAC_REC_PACK=0 — legacy interleaved (idx, word) pairs instead of
        # the delta16 wire layout (same knob as the pipelined engine).
        self._rec_pack = (self._pull_batch > 0 and
                          os.environ.get("HAVAC_REC_PACK", "1") != "0")
        self._iota_hdr: Optional[np.ndarray] = None
        # Per-phase wall-clock attribution (seconds), like the pipelined
        # path's PipelinedSweep.prof — filled by run():
        #   dispatch — enqueueing wavefront steps (async)
        #   sync     — waiting on the device / replicated overflow checks
        #   pull     — fetching packed record shards to host
        #   decode   — host record decode
        #   sort     — final composite-key sort
        self.prof = {"dispatch": 0.0, "sync": 0.0, "pull": 0.0,
                     "decode": 0.0, "sort": 0.0}

    def run(self, scores: np.ndarray,
            reset_rows: Optional[np.ndarray] = None,
            abort_event=None, progress=None, monolithic: bool = False,
            checkpoint_cb=None, resume=None, ckpt_every: int = 8
            ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Sweep the full (P, 4) int8 score stream; exact global hits.

        ``reset_rows`` (optional bool (P,)) enables model isolation.
        The record cap adapts: a hit-dense run that overflows it is
        re-swept with a doubled cap (one extra compile) — same retry
        contract as the single-chip paths.

        By default the sweep is dispatched PER WAVEFRONT STEP with the
        scan carries (row state + seam vectors) resident on device, so
        ``abort_event`` (a threading.Event) is honored between steps —
        returns None when aborted, like the pipelined path. Pass
        ``monolithic=True`` for the single lax.scan dispatch (no mid-sweep
        abort; saves T-1 dispatches, which measure ~1 ms each).
        ``progress(step, total)`` is called per completed step.

        Step-dispatch mode supports wavefront-step checkpointing:
        ``checkpoint_cb(t_next, istate_local, istate_lo, seam_local,
        seam_lo, rows, pos)`` is called every ``ckpt_every`` completed
        steps with this PROCESS's shards of the device-resident scan carry
        (multi-host runs persist per-host files) plus the hits decoded so
        far; ``resume`` is a prior payload ``(t_next, istate_local,
        seam_local, rows, pos)`` to continue from. Monolithic mode ignores
        both (one uncancelable dispatch has no step boundary to cut at)."""
        while True:
            try:
                return self._run_once(scores, reset_rows, abort_event,
                                      progress, monolithic,
                                      checkpoint_cb=checkpoint_cb,
                                      resume=resume, ckpt_every=ckpt_every)
            except _RecordCapacityExceeded as exc:
                while self.record_cap < exc.nrec:
                    self.record_cap *= 2
                self._fns.clear()  # the cap is baked into the compiled fn

    def _run_once(self, scores: np.ndarray, reset_rows=None,
                  abort_event=None, progress=None, monolithic=False,
                  checkpoint_cb=None, resume=None, ckpt_every: int = 8
                  ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        P_ = scores.shape[0]
        P2 = round_up(max(P_, 1), self.R)
        S = P2 // self.R
        sc = np.full((P2, 4), -128, dtype=np.int32)
        sc[:P_] = scores.astype(np.int32)
        sc_strips = (sc + 256).reshape(
            S, self.R // ROWS_PER_STRIP, ROWS_PER_STRIP, 4)
        from havac_tpu.parallel.multihost import (
            device_zeros, global_record_max, global_record_max_many,
            stage_replicated, stage_sharded)

        sc_dev = stage_replicated(sc_strips, self.mesh)
        isolate = reset_rows is not None
        rr = np.zeros(P2, dtype=np.int32)
        if isolate:
            rr[:P_] = np.asarray(reset_rows, dtype=np.int32)
        rr_dev = stage_replicated(rr.reshape(S, self.R), self.mesh)

        kb = 0 if monolithic else self._pull_batch
        key = (S, isolate, monolithic, kb, self._rec_pack, self._superstep)
        if key not in self._fns:
            if monolithic:
                make = make_swar_dist_fn
            elif kb and self._superstep:
                import functools as _ft
                make = _ft.partial(make_swar_dist_superstep_fn, batch=kb,
                                   pack16=self._rec_pack)
            elif kb:
                import functools as _ft
                make = _ft.partial(make_swar_dist_batch_step_fn, batch=kb,
                                   pack16=self._rec_pack)
            else:
                make = make_swar_dist_step_fn
            self._fns[key] = make(
                self.mesh, self.axis, self.W3, self.R, S, self.maxt,
                self.record_cap, self.interpret,
                col_chunks=self.col_chunks, isolate=isolate)

        G = self.shard_blocks * self.D
        T = S + self.D - 1
        all_rows, all_pos = [], []
        if monolithic:
            istate = device_zeros((G, self.W3 // 128, 128), jnp.int32,
                                  self._shard)
            t0 = time.perf_counter()
            _, packeds = self._fns[key](self.symw_dev, sc_dev, rr_dev,
                                        istate)
            self.prof["dispatch"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            gmax = global_record_max(packeds, self.mesh)
            if gmax is not None and int(gmax.max()) > self.record_cap:
                raise _RecordCapacityExceeded(int(gmax.max()))
            self.prof["sync"] += time.perf_counter() - t0
            # Decode only this process's addressable shards of the packed
            # record output (hits for the shards this host owns);
            # coordinates are global, so multi-host runs concatenate
            # per-host results for the exact global list. Single-process,
            # this covers every shard.
            for sh in packeds.addressable_shards:
                d0 = sh.index[0].start or 0
                t0 = time.perf_counter()
                arr = np.asarray(sh.data)  # (Dl, T, CC, 1 + maxt + 2*cap)
                self.prof["pull"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                for dd in range(arr.shape[0]):
                    d = d0 + dd
                    for t in range(arr.shape[1]):
                        self._decode_step(arr[dd, t], d, t - d, S,
                                          all_rows, all_pos)
                self.prof["decode"] += time.perf_counter() - t0
        elif kb:
            done = self._run_steps_batched(
                self._fns[key], sc_dev, rr_dev, S, T, all_rows, all_pos,
                abort_event, progress, checkpoint_cb, resume, ckpt_every)
            if done is None:
                return None
        else:
            from havac_tpu.parallel.multihost import local_leading_slice

            start_t = 0
            if resume is not None:
                start_t, istate_local, seam_local, rows0, pos0 = resume
                istate = stage_sharded(istate_local, self._shard, G)
                seam = stage_sharded(seam_local, self._shard, self.D)
                all_rows.append(np.asarray(rows0, dtype=np.int64))
                all_pos.append(np.asarray(pos0, dtype=np.int64))
            else:
                istate = device_zeros((G, self.W3 // 128, 128), jnp.int32,
                                      self._shard)
                seam = device_zeros((self.D, self.R + 1), jnp.int32,
                                    self._shard)
            tarr = stage_replicated(
                np.arange(T, dtype=np.int32).reshape(T, 1), self.mesh)
            pend = []  # (t, packed) awaiting decode

            def drain_pend():
                """Replicated overflow check + decode of pending steps —
                collective-safe: every process folds the SAME steps."""
                t0 = time.perf_counter()
                gmax = global_record_max_many([p for _, p in pend],
                                              self.mesh)
                if gmax is not None and int(gmax.max()) > self.record_cap:
                    raise _RecordCapacityExceeded(int(gmax.max()))
                self.prof["sync"] += time.perf_counter() - t0
                for t, pk in pend:
                    for sh in pk.addressable_shards:
                        d0 = sh.index[0].start or 0
                        t1 = time.perf_counter()
                        arr = np.asarray(sh.data)  # (Dl, CC, X)
                        t2 = time.perf_counter()
                        self.prof["pull"] += t2 - t1
                        for dd in range(arr.shape[0]):
                            d = d0 + dd
                            self._decode_step(arr[dd], d, t - d, S,
                                              all_rows, all_pos)
                        self.prof["decode"] += time.perf_counter() - t2
                pend.clear()

            for t in range(start_t, T):
                if abort_event is not None and abort_event.is_set():
                    return None
                t0 = time.perf_counter()
                istate, seam, pk = self._fns[key](
                    self.symw_dev, sc_dev, rr_dev, istate, seam, tarr[t])
                try:
                    pk.copy_to_host_async()
                except AttributeError:  # pragma: no cover - older jax
                    pass
                self.prof["dispatch"] += time.perf_counter() - t0
                pend.append((t, pk))
                if progress is not None:
                    progress(t + 1, T)
                if (checkpoint_cb is not None and t + 1 < T
                        and (t + 1 - start_t) % ckpt_every == 0):
                    drain_pend()
                    t0 = time.perf_counter()
                    il, ilo = local_leading_slice(istate)
                    sl, slo = local_leading_slice(seam)
                    rows_s = (np.concatenate(all_rows) if all_rows
                              else np.empty(0, dtype=np.int64))
                    pos_s = (np.concatenate(all_pos) if all_pos
                             else np.empty(0, dtype=np.int64))
                    all_rows[:] = [rows_s]
                    all_pos[:] = [pos_s]
                    checkpoint_cb(t + 1, il, ilo, sl, slo, rows_s, pos_s)
                    self.prof["sync"] += time.perf_counter() - t0
            drain_pend()
        if not all_rows:
            return (np.empty(0, dtype=np.int64),) * 2
        rows = np.concatenate(all_rows)
        pos = np.concatenate(all_pos)
        keep = (rows < P_) & (pos < self.L)
        rows, pos = rows[keep], pos[keep]
        t0 = time.perf_counter()
        out = sort_hit_pairs(rows, pos)
        self.prof["sort"] += time.perf_counter() - t0
        return out

    def _run_steps_batched(self, fn, sc_dev, rr_dev, S: int, T: int,
                           all_rows: list, all_pos: list, abort_event,
                           progress, checkpoint_cb, resume,
                           ckpt_every: int) -> Optional[bool]:
        """Step-dispatch sweep with device-side record accumulation: the
        host pulls TWO transfers per shard per ``kb`` steps (header prefixes
        + one bucketed record-slab prefix) instead of a cap-sized packed
        vector per step per shard — the pipelined engine's pull discipline
        (engine/pipeline.py batched flow) ported to the mesh path.
        Returns None if aborted, True when complete."""
        from havac_tpu.parallel.multihost import (
            device_zeros, global_batch_header_max, local_leading_slice,
            stage_replicated, stage_sharded)

        D = self.D
        CC = self.col_chunks
        cap = self.record_cap
        maxt = self.maxt
        kb = self._pull_batch
        G = self.shard_blocks * D
        hdr_rows = kb * CC
        pack = self._rec_pack
        chunk_slab = (round_up(cap + (cap + 1) // 2
                               + _packed16_esc_cap(maxt, self.W3, cap), 8)
                      if pack else 2 * cap)
        slab = hdr_rows * chunk_slab

        start_t = 0
        if resume is not None:
            start_t, istate_local, seam_local, rows0, pos0 = resume
            istate = stage_sharded(istate_local, self._shard, G)
            seam = stage_sharded(seam_local, self._shard, self.D)
            all_rows.append(np.asarray(rows0, dtype=np.int64))
            all_pos.append(np.asarray(pos0, dtype=np.int64))
        else:
            istate = device_zeros((G, self.W3 // 128, 128), jnp.int32,
                                  self._shard)
            seam = device_zeros((self.D, self.R + 1), jnp.int32, self._shard)
        tarr = stage_replicated(
            np.arange(T, dtype=np.int32).reshape(T, 1), self.mesh)
        barr = stage_replicated(
            np.arange(kb + 1, dtype=np.int32).reshape(kb + 1, 1), self.mesh)
        hdrbuf = device_zeros((D * hdr_rows, 8 + maxt), jnp.int32,
                              self._shard)
        recbuf = device_zeros((D * slab,), jnp.int32, self._shard)
        roff = device_zeros((D,), jnp.int32, self._shard)
        hkey = ("hdr8", D * hdr_rows, 8 + maxt)
        if hkey not in self._fns:
            self._fns[hkey] = jax.jit(lambda h: h[:, :8])
        hdr8_fn = self._fns[hkey]
        metas: list = []  # global step index per batch position

        def drain_batch():
            nonlocal roff
            if not metas:
                return
            # Replicated overflow check FIRST — multi-host capacity-retry
            # decisions must be identical on every host (a host raising on
            # its local shards alone would desync the next collective).
            # Stale header rows beyond the current batch can never
            # false-trigger: a row that survived a previous drain had
            # n <= cap, and cap never shrinks within a run.
            t0 = time.perf_counter()
            gmax = global_batch_header_max(hdrbuf, self.mesh)
            if gmax is not None and int(gmax) > cap:
                raise _RecordCapacityExceeded(int(gmax))
            self.prof["sync"] += time.perf_counter() - t0
            nrows = len(metas) * CC
            t0 = time.perf_counter()
            hdr8 = hdr8_fn(hdrbuf)
            h8_by_d = {}
            for sh in hdr8.addressable_shards:
                d = (sh.index[0].start or 0) // hdr_rows
                h8_by_d[d] = np.asarray(sh.data)[:nrows]
            self.prof["pull"] += time.perf_counter() - t0
            full_by_d = {}
            for sh in hdrbuf.addressable_shards:
                d = (sh.index[0].start or 0) // hdr_rows
                h8 = h8_by_d[d]
                ns = h8[:, 0].astype(np.int64)
                if ns.max(initial=0) > cap:
                    raise _RecordCapacityExceeded(int(ns.max()))
                # Dense chunks (count == maxt: every tile dirty, slots in
                # grid order) have ometa === iota; the maxt-wide header rows
                # then never cross the wire (engine/pipeline.py drain_batch
                # applies the same skip).
                if np.any((ns > 0) & (h8[:, 1] != maxt)):
                    t1 = time.perf_counter()
                    full_by_d[d] = np.asarray(sh.data)[:nrows]
                    self.prof["pull"] += time.perf_counter() - t1
            for sh in recbuf.addressable_shards:
                d = (sh.index[0].start or 0) // slab
                h8 = h8_by_d[d]
                ns = h8[:, 0].astype(np.int64)
                ncl = np.minimum(ns, cap)
                if pack:
                    advs = ncl + (ncl + 1) // 2 + h8[:, 2].astype(np.int64)
                else:
                    advs = 2 * ncl
                offs = np.zeros(nrows + 1, dtype=np.int64)
                offs[1:] = np.cumsum(advs)
                total = int(offs[-1])
                recs = np.empty(0, dtype=np.int32)
                if total:
                    t1 = time.perf_counter()
                    sl = sh.data[: min(_pull_bucket(total), slab)]
                    recs = np.asarray(sl)
                    self.prof["pull"] += time.perf_counter() - t1
                t1 = time.perf_counter()
                full = full_by_d.get(d)
                for i in range(nrows):
                    t = metas[i // CC]
                    c = i % CC
                    n = int(ns[i])
                    if n == 0:
                        continue
                    ometa = (full[i][8:] if full is not None
                             else self._iota_header())
                    seg = recs[offs[i]:offs[i + 1]]
                    if pack:
                        idx, words = unpack_delta16(seg, n, int(h8[i, 2]))
                        self._decode_idx_words(idx, words, d, t - d, S, c,
                                               ometa, all_rows, all_pos)
                    else:
                        self._decode_split_chunk(ometa, seg, n, d, t - d,
                                                 S, c, all_rows, all_pos)
                self.prof["decode"] += time.perf_counter() - t1
            roff = device_zeros((D,), jnp.int32, self._shard)
            metas.clear()

        def maybe_checkpoint(t_next: int) -> None:
            t0 = time.perf_counter()
            il, ilo = local_leading_slice(istate)
            sl, slo = local_leading_slice(seam)
            rows_s = (np.concatenate(all_rows) if all_rows
                      else np.empty(0, dtype=np.int64))
            pos_s = (np.concatenate(all_pos) if all_pos
                     else np.empty(0, dtype=np.int64))
            all_rows[:] = [rows_s]
            all_pos[:] = [pos_s]
            checkpoint_cb(t_next, il, ilo, sl, slo, rows_s, pos_s)
            self.prof["sync"] += time.perf_counter() - t0

        if self._superstep:
            # One dispatch per pull batch: the superstep fn scans up to kb
            # wavefront steps on device (trailing inactive steps of the
            # final partial batch emit n = 0 headers). Abort and checkpoint
            # land on batch boundaries.
            t = start_t
            while t < T:
                if abort_event is not None and abort_event.is_set():
                    return None
                n = min(kb, T - t)
                if checkpoint_cb is not None:
                    # Cut the batch so it lands on the next checkpoint
                    # boundary (boundaries strictly inside the sweep, like
                    # the per-step flow's t+1 < T condition).
                    nb = ((t - start_t) // ckpt_every + 1) * ckpt_every
                    if (t - start_t) + n > nb and start_t + nb < T:
                        n = nb - (t - start_t)
                t0 = time.perf_counter()
                istate, seam, hdrbuf, recbuf, roff = fn(
                    self.symw_dev, sc_dev, rr_dev, istate, seam, tarr[t],
                    barr[n], hdrbuf, recbuf, roff)
                self.prof["dispatch"] += time.perf_counter() - t0
                metas.extend(range(t, t + n))
                t += n
                if progress is not None:
                    progress(t, T)
                drain_batch()
                if (checkpoint_cb is not None and t < T
                        and (t - start_t) % ckpt_every == 0):
                    maybe_checkpoint(t)
            return True

        for t in range(start_t, T):
            if abort_event is not None and abort_event.is_set():
                return None
            t0 = time.perf_counter()
            istate, seam, hdrbuf, recbuf, roff = fn(
                self.symw_dev, sc_dev, rr_dev, istate, seam, tarr[t],
                barr[len(metas)], hdrbuf, recbuf, roff)
            self.prof["dispatch"] += time.perf_counter() - t0
            metas.append(t)
            if progress is not None:
                progress(t + 1, T)
            if len(metas) == kb:
                drain_batch()
            if (checkpoint_cb is not None and t + 1 < T
                    and (t + 1 - start_t) % ckpt_every == 0):
                drain_batch()  # seal the partial batch at the cut
                maybe_checkpoint(t + 1)
        drain_batch()
        return True

    def _iota_header(self) -> np.ndarray:
        if self._iota_hdr is None or self._iota_hdr.shape[0] != self.maxt:
            self._iota_hdr = np.arange(self.maxt, dtype=np.int32)
        return self._iota_hdr

    def _decode_split_chunk(self, ometa, rec, n: int, d: int, s: int,
                            S: int, c: int, all_rows: list,
                            all_pos: list) -> None:
        """Decode one (shard, step, col-chunk) split record block: ``rec``
        holds interleaved (idx, word) pairs of which the first ``n`` are
        valid; ``ometa`` is the (maxt,) tile-id table (iota when dense)."""
        pairs = rec[:2 * n]
        idx = pairs[0::2].astype(np.int64)
        words = np.ascontiguousarray(pairs[1::2])
        self._decode_idx_words(idx, words, d, s, S, c, ometa, all_rows,
                               all_pos)

    def _decode_idx_words(self, idx, words, d: int, s: int, S: int, c: int,
                          ometa, all_rows: list, all_pos: list) -> None:
        if not (0 <= s < S):
            return
        words = np.ascontiguousarray(words)
        slots = idx // self.W3
        word_idx = idx % self.W3
        ids = ometa[slots]
        rows, pos = decode_swar_flat(ids, word_idx, words,
                                     self.R // ROWS_PER_STRIP, self.W3,
                                     sort=False)
        chunk_width = self.chunk_blocks * self.W
        all_rows.append(rows + s * self.R)
        all_pos.append(pos + d * self.shard_width + c * chunk_width)

    def _decode_step(self, vecs, d: int, s: int, S: int,
                     all_rows: list, all_pos: list) -> None:
        """Decode one device's one wavefront step: ``vecs`` is the (CC, X)
        packed record block for shard ``d`` sweeping row chunk ``s``."""
        if not (0 <= s < S):
            return
        cap = self.record_cap
        maxt = self.maxt
        S_strips = self.R // ROWS_PER_STRIP
        chunk_width = self.chunk_blocks * self.W
        for c in range(self.col_chunks):
            vec = vecs[c]
            n = int(vec[0])
            if n > cap:
                raise _RecordCapacityExceeded(n)
            if n == 0:
                continue
            ometa = vec[1:1 + maxt]
            idx = vec[1 + maxt:1 + maxt + n].astype(np.int64)
            words = vec[1 + maxt + cap:1 + maxt + cap + n]
            slots = idx // self.W3
            word_idx = idx % self.W3
            ids = ometa[slots]
            rows, pos = decode_swar_flat(ids, word_idx, words,
                                         S_strips, self.W3, sort=False)
            all_rows.append(rows + s * self.R)
            all_pos.append(pos + d * self.shard_width + c * chunk_width)
