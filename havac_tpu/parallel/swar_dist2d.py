"""2D (sequence × model) sharded SWAR sweep — BASELINE config 4.

Extends the 1-D wavefront (`parallel/swar_dist.py`) with a model axis: the
model collection is partitioned into contiguous groups of whole models, one
group per model-mesh column; every column runs an independent sequence-axis
wavefront over the same (replicated-over-model, sharded-over-seq) database.
There is **no communication on the model axis** — groups are independent
because cuts land on model boundaries and model isolation
(`reset_rows`, see ops/reference.py) guarantees no DP chain crosses a cut.
2D sharding therefore REQUIRES isolate-models semantics; the engine enforces
it.

Group row ranges are padded to a common chunk count so every device compiles
one program; pad rows carry the -128 never-hit score and their hits are
filtered by each group's true row count at decode.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

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
from havac_tpu.engine.pipeline import _compact_tiles_impl
from havac_tpu.parallel.swar_dist import _RecordCapacityExceeded, _get_shard_map


def partition_models(prefix_sums: np.ndarray, num_groups: int) -> List[int]:
    """Split the concatenated model stream into ``num_groups`` contiguous
    groups of whole models, balancing total rows. Returns the group-start
    model indices (length num_groups + 1, first 0, last n_models)."""
    prefix = np.asarray(prefix_sums, dtype=np.int64)
    total = int(prefix[-1])
    n_models = len(prefix) - 1
    bounds = [0]
    for g in range(1, num_groups):
        target = total * g // num_groups
        m = int(np.searchsorted(prefix, target, side="left"))
        m = max(bounds[-1], min(m, n_models))
        bounds.append(m)
    bounds.append(n_models)
    return bounds


def make_swar_dist2d_fn(mesh: Mesh, seq_axis: str, model_axis: str,
                        block_words: int, rows_per_step: int,
                        num_chunks: int, max_hit_tiles: int,
                        record_cap: int, interpret: bool,
                        col_chunks: int = 1):
    """fn(symw (D_seq·Bs, WS, 128) P(seq), scores (D_m, S, strips, 30, 4)
    P(model), resets (D_m, S, strips·30) P(model), istate (D_seq·Bs, WS, 128)
    P(seq)) → packed records (D_m, D_seq, T, X)."""
    shard_map = _get_shard_map()
    R = rows_per_step
    S = num_chunks
    D = mesh.shape[seq_axis]
    T = S + D - 1
    W3 = block_words
    CC = col_chunks
    perm = [(k, k + 1) for k in range(D - 1)]

    def device_fn(symw, scores_strips, reset_strips, istate0):
        k = jax.lax.axis_index(seq_axis)
        scores_strips = scores_strips[0]  # (S, strips, 30, 4) local group
        reset_strips = reset_strips[0]  # (S, strips*30)
        Bs = symw.shape[0]
        assert Bs % CC == 0, (
            f"shard blocks ({Bs}) must be a multiple of col_chunks ({CC})")
        Bc = Bs // CC

        def step(carry, t):
            istate, seam_in = carry
            s = t - k
            active = jnp.logical_and(s >= 0, s < S)
            sc = jax.lax.dynamic_index_in_dim(
                scores_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)
            rr = jax.lax.dynamic_index_in_dim(
                reset_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)

            def col_chunk(carry_c, c):
                symw_c = jax.lax.dynamic_slice_in_dim(symw, c * Bc, Bc)
                istate_c = jax.lax.dynamic_slice_in_dim(istate, c * Bc, Bc)
                (ostate, ocarry, ometa, ocount, otiles,
             ocnts) = _ssv_swar_jit(
                    symw_c, sc, istate_c, carry_c, rr, block_words=W3,
                    max_hit_tiles=max_hit_tiles, interpret=interpret,
                    isolate=True)
                count = jnp.where(active, ocount[0], 0)
                packed = _compact_tiles_impl(otiles, ocnts, ometa, count,
                                             cap=record_cap)
                return ocarry, (ostate, packed)

            ocarry, (ostates, packeds) = jax.lax.scan(
                col_chunk, seam_in, jnp.arange(CC))
            new_istate = ostates.reshape(Bs, *symw.shape[1:])
            istate = jnp.where(active, new_istate, istate)
            seam_out = jnp.where(active, ocarry, jnp.zeros_like(ocarry))
            seam_next = jax.lax.ppermute(seam_out, seq_axis, perm)
            return (istate, seam_next), packeds

        init = (istate0, jnp.zeros(R + 1, jnp.int32))
        _, packeds = jax.lax.scan(step, init, jnp.arange(T))
        return packeds[None, None]  # (1, 1, T, CC, X)

    specs = dict(mesh=mesh,
                 in_specs=(P(seq_axis), P(model_axis), P(model_axis),
                           P(seq_axis)),
                 out_specs=P(model_axis, seq_axis, None, None))
    try:
        fn = shard_map(device_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(device_fn, check_rep=False, **specs)
    return jax.jit(fn)


def make_swar_dist2d_step_fn(mesh: Mesh, seq_axis: str, model_axis: str,
                             block_words: int, rows_per_step: int,
                             num_chunks: int, max_hit_tiles: int,
                             record_cap: int, interpret: bool,
                             col_chunks: int = 1):
    """ONE 2D wavefront step as a jitted sharded call (abort granularity;
    the 2D analog of `make_swar_dist_step_fn`). Scan carries live as
    sharded device arrays between calls: istate (D_m, D_seq·Bs, WS, 128)
    P(model, seq) — each model group evolves its own row state — and seam
    (D_m, D_seq, R+1) P(model, seq).

    fn(symw, scores, resets, istate, seam, t (1,) replicated)
      → (istate', seam', packeds (D_m, D_seq, CC, X))."""
    shard_map = _get_shard_map()
    R = rows_per_step
    S = num_chunks
    D = mesh.shape[seq_axis]
    W3 = block_words
    CC = col_chunks
    perm = [(k, k + 1) for k in range(D - 1)]

    def device_fn(symw, scores_strips, reset_strips, istate_g, seam_in, t):
        k = jax.lax.axis_index(seq_axis)
        scores_strips = scores_strips[0]  # (S, strips, 30, 4) local group
        reset_strips = reset_strips[0]  # (S, strips*30)
        istate = istate_g[0]
        Bs = symw.shape[0]
        assert Bs % CC == 0, (
            f"shard blocks ({Bs}) must be a multiple of col_chunks ({CC})")
        Bc = Bs // CC
        s = t[0] - k
        active = jnp.logical_and(s >= 0, s < S)
        sc = jax.lax.dynamic_index_in_dim(
            scores_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)
        rr = jax.lax.dynamic_index_in_dim(
            reset_strips, jnp.clip(s, 0, S - 1), 0, keepdims=False)

        def col_chunk(carry_c, c):
            symw_c = jax.lax.dynamic_slice_in_dim(symw, c * Bc, Bc)
            istate_c = jax.lax.dynamic_slice_in_dim(istate, c * Bc, Bc)
            (ostate, ocarry, ometa, ocount, otiles,
             ocnts) = _ssv_swar_jit(
                symw_c, sc, istate_c, carry_c, rr, block_words=W3,
                max_hit_tiles=max_hit_tiles, interpret=interpret,
                isolate=True)
            count = jnp.where(active, ocount[0], 0)
            packed = _compact_tiles_impl(otiles, ocnts, ometa, count,
                                         cap=record_cap)
            return ocarry, (ostate, packed)

        ocarry, (ostates, packeds) = jax.lax.scan(
            col_chunk, seam_in[0, 0], jnp.arange(CC))
        new_istate = ostates.reshape(Bs, *symw.shape[1:])
        istate = jnp.where(active, new_istate, istate)
        seam_out = jnp.where(active, ocarry, jnp.zeros_like(ocarry))
        seam_next = jax.lax.ppermute(seam_out, seq_axis, perm)
        return (istate[None], seam_next[None, None],
                packeds[None, None])  # (1, 1, CC, X)

    specs = dict(mesh=mesh,
                 in_specs=(P(seq_axis), P(model_axis), P(model_axis),
                           P(model_axis, seq_axis),
                           P(model_axis, seq_axis), P()),
                 out_specs=(P(model_axis, seq_axis),
                            P(model_axis, seq_axis),
                            P(model_axis, seq_axis, None, None)))
    try:
        fn = shard_map(device_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(device_fn, check_rep=False, **specs)
    return jax.jit(fn)


class Swar2DSweep:
    """Stateful 2D-sharded SWAR sweep (engine mesh fast path, config 4)."""

    def __init__(self, codes: np.ndarray, mesh: Mesh, seq_axis: str = "seq",
                 model_axis: str = "model", block_width: int = 387072,
                 rows_per_step: int = 2040,
                 tile_budget_bytes: int = 6 << 30,
                 record_cap: int = 1 << 14,
                 interpret: bool = False):
        if block_width % 3072:
            raise ValueError("block_width must be a multiple of 3072")
        if rows_per_step % ROWS_PER_STRIP:
            raise ValueError("rows_per_step must be a multiple of 30")
        self.mesh = mesh
        self.seq_axis = seq_axis
        self.model_axis = model_axis
        self.W = block_width
        self.W3 = block_width // 3
        self.R = rows_per_step
        self.D_seq = mesh.shape[seq_axis]
        self.D_model = mesh.shape[model_axis]
        self.record_cap = record_cap
        self.interpret = interpret

        L = codes.shape[0]
        tile_bytes = self.W3 * 4
        nflush = ROWS_PER_STRIP // ROWS_PER_FLUSH
        strips = self.R // ROWS_PER_STRIP
        budget_tiles = max(strips * nflush,
                           tile_budget_bytes // (3 * tile_bytes))
        blocks_total = -(-L // self.W)
        shard_blocks = -(-blocks_total // self.D_seq)
        blocks_per_chunk = max(1, budget_tiles // (strips * nflush))
        self.col_chunks = max(1, -(-shard_blocks // blocks_per_chunk))
        shard_blocks = round_up(shard_blocks, self.col_chunks)
        L2 = shard_blocks * self.D_seq * self.W
        padded = np.zeros(L2, dtype=np.uint8)
        padded[:L] = codes
        self.L = L
        self.shard_blocks = shard_blocks
        self.shard_width = shard_blocks * self.W
        self.chunk_blocks = shard_blocks // self.col_chunks
        self.maxt = self.chunk_blocks * strips * nflush

        # Multi-host: upload only this process's device shards (the array
        # replicates across the model axis, so the generic slice-per-device
        # staging is used rather than process-contiguous assembly).
        from havac_tpu.parallel.multihost import stage_from_full

        self._seq_shard = NamedSharding(mesh, P(seq_axis))
        self.symw_dev = stage_from_full(pack_symbols(padded, self.W3),
                                        self._seq_shard)
        self._fns = {}
        # Per-phase wall-clock attribution, same keys as the 1D mesh path.
        self.prof = {"dispatch": 0.0, "sync": 0.0, "pull": 0.0,
                     "decode": 0.0, "sort": 0.0}

    def run(self, scores: np.ndarray, prefix_sums: np.ndarray,
            reset_rows: Optional[np.ndarray] = None,
            abort_event=None, progress=None, monolithic: bool = False,
            checkpoint_cb=None, resume=None, ckpt_every: int = 8
            ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Sweep; ``prefix_sums`` are the model-length prefix sums (cut
        points). ``reset_rows`` defaults to isolating every model (required
        for 2D exactness).

        Default dispatch is PER WAVEFRONT STEP with device-resident scan
        carries, so ``abort_event`` is honored between steps (returns None
        when aborted); ``monolithic=True`` restores the single lax.scan
        dispatch. Same contract as `SwarDistributedSweep.run`.

        Step-dispatch mode supports wavefront-step checkpointing:
        ``checkpoint_cb(t_next, istate (D_m, G, WS, 128) int32, seam
        (D_m, D_seq, R+1) int32, rows, pos)`` is called every ``ckpt_every``
        completed steps with the FULL device-resident scan carries (the 2D
        state is sharded over both axes, so per-host shard persistence is
        not supported — the engine only wires this single-process);
        ``resume`` is a prior payload ``(t_next, istate, seam, rows, pos)``.
        Monolithic mode ignores both."""
        while True:
            try:
                return self._run_once(scores, prefix_sums, reset_rows,
                                      abort_event, progress, monolithic,
                                      checkpoint_cb=checkpoint_cb,
                                      resume=resume, ckpt_every=ckpt_every)
            except _RecordCapacityExceeded as exc:
                while self.record_cap < exc.nrec:
                    self.record_cap *= 2
                self._fns.clear()

    def _run_once(self, scores, prefix_sums, reset_rows, abort_event=None,
                  progress=None, monolithic=False, checkpoint_cb=None,
                  resume=None, ckpt_every: int = 8):
        P_ = scores.shape[0]
        prefix = np.asarray(prefix_sums, dtype=np.int64)
        if reset_rows is None:
            reset_rows = np.zeros(P_, dtype=bool)
            reset_rows[prefix[:-1]] = True
        bounds = partition_models(prefix, self.D_model)
        g_row0 = [int(prefix[bounds[g]]) for g in range(self.D_model)]
        g_rows = [int(prefix[bounds[g + 1]]) - g_row0[g]
                  for g in range(self.D_model)]
        S = max(1, max(round_up(max(r, 1), self.R) // self.R
                       for r in g_rows))
        rows_pad = S * self.R

        sc_g = np.full((self.D_model, rows_pad, 4), -128, dtype=np.int32)
        rr_g = np.zeros((self.D_model, rows_pad), dtype=np.int32)
        for g in range(self.D_model):
            r0, nr = g_row0[g], g_rows[g]
            sc_g[g, :nr] = scores[r0:r0 + nr].astype(np.int32)
            rr_g[g, :nr] = reset_rows[r0:r0 + nr]
            rr_g[g, 0] = 1  # group start is always a model start
        strips = self.R // ROWS_PER_STRIP
        from havac_tpu.parallel.multihost import device_zeros, stage_from_full

        model_shard = NamedSharding(self.mesh, P(self.model_axis))
        sc_dev = stage_from_full(
            (sc_g + 256).reshape(self.D_model, S, strips, ROWS_PER_STRIP, 4),
            model_shard)
        rr_dev = stage_from_full(rr_g.reshape(self.D_model, S, self.R),
                                 model_shard)

        key = (S, monolithic)
        if key not in self._fns:
            make = (make_swar_dist2d_fn if monolithic
                    else make_swar_dist2d_step_fn)
            self._fns[key] = make(
                self.mesh, self.seq_axis, self.model_axis, self.W3, self.R,
                S, self.maxt, self.record_cap, self.interpret,
                col_chunks=self.col_chunks)
        from havac_tpu.parallel.multihost import (
            global_record_max, global_record_max_many, stage_replicated)

        T = S + self.D_seq - 1
        all_rows, all_pos = [], []
        # Decode this process's addressable record shards only (global
        # coordinates; per-host outputs concatenate to the exact global
        # list — same contract as SwarDistributedSweep).
        if monolithic:
            istate = device_zeros(self.symw_dev.shape, jnp.int32,
                                  self._seq_shard)
            t0 = time.perf_counter()
            packeds = self._fns[key](self.symw_dev, sc_dev, rr_dev, istate)
            self.prof["dispatch"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            gmax = global_record_max(packeds, self.mesh)
            self.prof["sync"] += time.perf_counter() - t0
            if gmax is not None and int(gmax.max()) > self.record_cap:
                raise _RecordCapacityExceeded(int(gmax.max()))
            for sh in packeds.addressable_shards:
                g0 = sh.index[0].start or 0
                d0 = sh.index[1].start or 0
                t0 = time.perf_counter()
                arr = np.asarray(sh.data)
                t1 = time.perf_counter()
                self.prof["pull"] += t1 - t0
                for gg in range(arr.shape[0]):
                    for dd in range(arr.shape[1]):
                        for t in range(arr.shape[2]):
                            self._decode_block(
                                arr[gg, dd, t], g0 + gg, d0 + dd,
                                t - (d0 + dd), S, strips, g_rows, g_row0,
                                all_rows, all_pos)
                self.prof["decode"] += time.perf_counter() - t1
        else:
            state_shard = NamedSharding(
                self.mesh, P(self.model_axis, self.seq_axis))
            start_t = 0
            if resume is not None:
                start_t, istate_np, seam_np, rows0, pos0 = resume
                istate = jax.device_put(np.asarray(istate_np, np.int32),
                                        state_shard)
                seam = jax.device_put(np.asarray(seam_np, np.int32),
                                      state_shard)
                all_rows.append(np.asarray(rows0, dtype=np.int64))
                all_pos.append(np.asarray(pos0, dtype=np.int64))
            else:
                istate = device_zeros(
                    (self.D_model,) + self.symw_dev.shape, jnp.int32,
                    state_shard)
                seam = device_zeros((self.D_model, self.D_seq, self.R + 1),
                                    jnp.int32, state_shard)
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
                        g0 = sh.index[0].start or 0
                        d0 = sh.index[1].start or 0
                        t1 = time.perf_counter()
                        arr = np.asarray(sh.data)  # (Gl, Dl, CC, X)
                        t2 = time.perf_counter()
                        self.prof["pull"] += t2 - t1
                        for gg in range(arr.shape[0]):
                            for dd in range(arr.shape[1]):
                                self._decode_block(
                                    arr[gg, dd], g0 + gg, d0 + dd,
                                    t - (d0 + dd), S, strips, g_rows,
                                    g_row0, all_rows, all_pos)
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
                    rows_s = (np.concatenate(all_rows) if all_rows
                              else np.empty(0, dtype=np.int64))
                    pos_s = (np.concatenate(all_pos) if all_pos
                             else np.empty(0, dtype=np.int64))
                    all_rows[:] = [rows_s]
                    all_pos[:] = [pos_s]
                    checkpoint_cb(t + 1, np.asarray(istate),
                                  np.asarray(seam), rows_s, pos_s)
                    self.prof["sync"] += time.perf_counter() - t0
            drain_pend()
        if not all_rows:
            return (np.empty(0, dtype=np.int64),) * 2
        rows = np.concatenate(all_rows)
        pos = np.concatenate(all_pos)
        keep = pos < self.L
        rows, pos = rows[keep], pos[keep]
        t0 = time.perf_counter()
        out = sort_hit_pairs(rows, pos)
        self.prof["sort"] += time.perf_counter() - t0
        return out

    def _decode_block(self, vecs, g: int, d: int, s: int, S: int,
                      strips: int, g_rows, g_row0,
                      all_rows: list, all_pos: list) -> None:
        """Decode one (model group g, seq shard d) block of one wavefront
        step: ``vecs`` is its (CC, X) packed record block for row chunk
        ``s``."""
        if not (0 <= s < S):
            return
        cap = self.record_cap
        maxt = self.maxt
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
            rows, pos = decode_swar_flat(ids, word_idx, words, strips,
                                         self.W3, sort=False)
            rows = rows + s * self.R
            keep = rows < g_rows[g]
            all_rows.append(rows[keep] + g_row0[g])
            all_pos.append(pos[keep] + d * self.shard_width + c * chunk_width)
