"""Pipelined single-device sweep: hit drain overlaps the DP sweep.

The reference overlaps its hit-filter tree with the PE sweep via HLS DATAFLOW
FIFOs (`device/HavacHls.cpp:49,190`; SURVEY.md §2.5 "pipeline parallelism").
The TPU-native equivalent exploits JAX's async dispatch: the engine dispatches
chunk (i+1) before touching chunk i's outputs, so the host-side hit decode of
chunk i runs while the device sweeps chunk i+1. All chain state — the
boundary-carry column between column chunks and the row state between row
chunks — stays on device as jax arrays; the only host synchronization per
chunk is the hit-count scalar and the dirty tiles actually produced.

Chunk geometry is clamped so the dirty-tile buffer covers the worst case
(every tile dirty) within a fixed HBM budget — tile overflow is impossible by
construction. Hit records are compacted on device and cross to the host as
one packed array per chunk; the record/group caps adapt (re-running only the
cheap compaction step) when a chunk is unusually hit-dense.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from havac_tpu.ops.common import SsvKernelConfig, round_up


def _nonzero_capped(x, cap: int):
    """Indices of the first ``cap`` nonzero elements (−1 fill), via
    cumsum+searchsorted — ~5× faster than jnp.nonzero(size=cap) on TPU."""
    import jax.numpy as jnp

    n = x.shape[0]
    pos = jnp.cumsum((x != 0).astype(jnp.int32))
    idx = jnp.searchsorted(pos, jnp.arange(1, cap + 1, dtype=jnp.int32),
                           side="left")
    idxc = jnp.clip(idx, 0, n - 1)
    ok = jnp.logical_and(idx < n, x[idxc] != 0)
    return jnp.where(ok, idxc, -1)


def _get_compact_jit():
    global _COMPACT_JIT
    if _COMPACT_JIT is None:
        import jax

        _COMPACT_JIT = jax.jit(_compact_tiles_impl,
                               static_argnames=("cap", "group_cap"))
    return _COMPACT_JIT


_COMPACT_JIT = None


def _compact_tiles_impl(otiles, ometa, count, cap: int, group_cap: int):
    """On-device tile→record compaction: nonzero bitmap words of the first
    ``count`` tiles as (flat index, word) pairs. Only ``cap`` records cross
    to the host instead of whole 0.5 MB tiles — essential when realistic
    p-values make most tiles dirty.

    Two-level: a full nonzero over the buffer is pathologically slow on TPU
    (~20× the bandwidth bound), so first reduce 8-sublane groups (1024 words,
    a layout-preserving reduction — splitting the lane axis instead would
    force a Mosaic relayout ~20× slower than bandwidth) to dirty flags,
    nonzero the small flag vector, gather only the dirty groups, and nonzero
    that small block. Stale slots beyond ``count`` are excluded via the flag
    mask — no full-buffer masked copy. Callers retry with bigger caps when
    nrec > cap or ngroups > group_cap."""
    import jax.numpy as jnp

    GS = 8  # sublanes per group; group = GS × 128 lanes = 1024 words
    G = GS * 128
    maxt, WS, _ = otiles.shape
    groups_per_tile = WS // GS
    ng = maxt * groups_per_tile
    gview = otiles.reshape(ng, GS, 128)
    flags = jnp.any(gview != 0, axis=(1, 2))
    slot_of_group = jnp.arange(ng) // groups_per_tile
    flags = jnp.logical_and(flags, slot_of_group < count)
    ngroups = jnp.sum(flags.astype(jnp.int32))

    cap_g = min(group_cap, ng)
    gids_raw = _nonzero_capped(flags.astype(jnp.int32), cap_g)
    gids = jnp.where(gids_raw >= 0, gids_raw, ng)
    gview_pad = jnp.concatenate(
        [gview, jnp.zeros((1, GS, 128), gview.dtype)])
    data = gview_pad[gids].reshape(-1)  # (cap_g * G,)
    # Exact iff ngroups ≤ cap_g (otherwise the caller retries bigger).
    nrec = jnp.sum((data != 0).astype(jnp.int32))
    ridx = _nonzero_capped(data, cap)
    words = jnp.where(ridx >= 0, data[jnp.clip(ridx, 0, None)], 0)
    gsel = gids[jnp.clip(ridx, 0, None) // G]
    idx = jnp.where(ridx >= 0, gsel * G + ridx % G, -1)
    # One packed vector so the host needs a single D2H round trip:
    # [nrec, ngroups, ometa(maxt), idx(cap), words(cap)].
    return jnp.concatenate([nrec[None].astype(jnp.int32),
                            ngroups[None].astype(jnp.int32),
                            ometa.astype(jnp.int32), idx.astype(jnp.int32),
                            words.astype(jnp.int32)])


def _concat_results(results):
    rows = ([r for r, _ in results if r.size]
            or [np.empty(0, dtype=np.int64)])
    pos = ([p for _, p in results if p.size]
           or [np.empty(0, dtype=np.int64)])
    return np.concatenate(rows), np.concatenate(pos)


class PipelinedSweep:
    """Chunked (column × row) sweep with depth-1 software pipelining."""

    def __init__(self, codes: np.ndarray, scores: np.ndarray,
                 config: SsvKernelConfig, chunk_symbols: int,
                 chunk_rows: int, reset_rows: np.ndarray = None) -> None:
        import jax
        import jax.numpy as jnp

        self.jnp = jnp
        self.jax = jax
        self.cfg = config
        self.codes = codes
        self.scores = scores
        self.L = codes.shape[0]
        self.P = scores.shape[0]
        self.W = config.block_width
        self.K = config.rows_per_strip
        self.overflow_retries = 0
        self.record_cap = 1 << 14  # hit records pulled per chunk (adaptive)
        self.group_cap = 1 << 14  # dirty 1024-word groups per chunk (adaptive)
        self.tile_budget_bytes = config.tile_budget_bytes

        if config.packing == 3:
            from havac_tpu.ops import ssv_swar as mod
            self._mod = mod
            self.W3 = self.W // 3
            self._tile_words = self.W3
            self._nflush = self.K // mod.ROWS_PER_FLUSH
        else:
            from havac_tpu.ops import ssv_pallas as mod
            self._mod = mod
            self._tile_words = self.W
            self._nflush = 1
        self._compact = _get_compact_jit()

        # Clamp chunk geometry so a worst-case (every tile dirty) dispatch
        # fits the tile budget: with lookahead pipelining ~6 buffers of maxt
        # tiles are live at once (in-flight dispatches + compaction copies).
        # This bounds HBM even at realistic p-values where most tiles
        # contain hits.
        tile_bytes = self._tile_words * 4
        self._maxt_cap = max(12, min(8192,
                                     config.tile_budget_bytes // (3 * tile_bytes)))
        K = self.K
        # Uniform chunk shapes: every dispatch shares one (B, S) so the whole
        # run costs exactly one kernel compile (pad rows/columns into the
        # last chunk instead of letting it go ragged).
        P2 = round_up(self.P, K)
        # ~8 blocks per dispatch balances kernel width against dispatch count;
        # (measured: taller row chunks beat wider blocks at equal tile budget).
        rchunk_cap = min(max(chunk_rows, K),
                         max(K, (self._maxt_cap // (self._nflush * 8)) * K))
        self.n_row = max(1, -(-P2 // rchunk_cap))
        self.rchunk = round_up(-(-P2 // self.n_row), K)
        strips_per_chunk = self.rchunk // K
        blocks_cap = max(1, self._maxt_cap // (self._nflush * strips_per_chunk))
        chunk_blocks = min(max(1, chunk_symbols // self.W), blocks_cap)
        self.chunk = chunk_blocks * self.W
        self.n_col = max(1, -(-self.L // self.chunk))

        # Stage the whole packed database in HBM once (one H2D) and slice
        # per column chunk on device — per-chunk host uploads would bottleneck
        # hosts with slow interconnects. Falls back to per-chunk upload when
        # the packed database exceeds the staging budget.
        self._codes_dev = None
        self._blocks_per_chunk = self.chunk // self.W
        L2 = self.n_col * self.chunk  # uniform column chunks
        packed_bytes = (L2 * 4 // 3 if config.packing == 3 else L2)
        if packed_bytes <= (1 << 32):  # 4 GiB staging budget
            padded = np.zeros(L2, dtype=np.uint8)
            padded[:self.L] = codes
            if config.packing == 3:
                blocks = self._mod.pack_symbols(padded, self.W3)
            else:
                blocks = padded.astype(np.int8).reshape(L2 // self.W,
                                                        self.W // 128, 128)
            self._codes_dev = jnp.asarray(blocks)

        # Per-row-chunk score strips (and reset strips under model
        # isolation), staged once.
        self._isolate = reset_rows is not None
        self._scores_dev: List = []
        self._reset_dev: List = []
        self._rows1: List[int] = []
        for ri in range(self.n_row):
            r0, r1 = ri * self.rchunk, min(self.P, (ri + 1) * self.rchunk)
            Pc = max(0, r1 - r0)
            sc = np.full((self.rchunk, 4), -128, dtype=np.int32)
            sc[:Pc] = scores[r0:r1].astype(np.int32)
            if config.packing == 3:
                sc = sc + 256  # SWAR kernel takes biased scores
            self._scores_dev.append(jnp.asarray(sc.reshape(
                self.rchunk // self.K, self.K, 4)))
            if self._isolate:
                rr = np.zeros(self.rchunk, dtype=np.int32)
                rr[:Pc] = np.asarray(reset_rows[r0:r1], dtype=np.int32)
                self._reset_dev.append(jnp.asarray(rr))
            else:
                self._reset_dev.append(None)
            self._rows1.append(self.rchunk + 1)

    # ---------------------------------------------------------- chunk prep

    def _pack_codes(self, ci: int):
        lo = ci * self.chunk
        hi = min(self.L, lo + self.chunk)
        if self._codes_dev is not None:
            b0 = ci * self._blocks_per_chunk
            return (self._codes_dev[b0:b0 + self._blocks_per_chunk], lo,
                    hi - lo)
        chunk_codes = self.codes[lo:hi]
        L2 = self.chunk  # uniform chunk shape even for the last chunk
        padded = np.zeros(L2, dtype=np.uint8)
        padded[:chunk_codes.shape[0]] = chunk_codes
        if self.cfg.packing == 3:
            blocks = self._mod.pack_symbols(padded, self.W3)
        else:
            blocks = padded.astype(np.int8).reshape(L2 // self.W,
                                                    self.W // 128, 128)
        return self.jnp.asarray(blocks), lo, hi - lo

    def _dispatch(self, symw, scores_dev, istate, icarry, maxt: int,
                  reset_dev=None):
        if self.cfg.packing == 3:
            return self._mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, reset_dev,
                block_words=self.W3, max_hit_tiles=maxt,
                interpret=self.cfg.interpret, isolate=self._isolate)
        if self._isolate:
            raise NotImplementedError(
                "isolate_models requires the SWAR kernel (packing=3) or the "
                "XLA backend")
        return self._mod._ssv_pallas_jit(
            symw, scores_dev, istate, icarry,
            block_width=self.W, rows_per_strip=self.K,
            max_hit_tiles=maxt, interpret=self.cfg.interpret)

    def _collect(self, pend) -> Tuple[np.ndarray, np.ndarray]:
        (out, ri, lo, Lc) = pend
        ostate, ocarry, ometa, ocount, otiles = out
        r0 = ri * self.rchunk
        Pc = min(self.P, r0 + self.rchunk) - r0
        # On-device compaction + a single packed D2H pull per chunk.
        while True:
            cap, gcap = self.record_cap, self.group_cap
            packed = np.asarray(self._compact(otiles, ometa, ocount[0],
                                              cap=cap, group_cap=gcap))
            n, ngroups = int(packed[0]), int(packed[1])
            if n <= cap and ngroups <= gcap:
                break
            if n > cap:
                self.record_cap = max(cap * 2, round_up(n, 1024))
            if ngroups > gcap:
                self.group_cap = max(gcap * 2, round_up(ngroups, 1024))
            self.overflow_retries += 1
        if n == 0:
            return (np.empty(0, dtype=np.int64),) * 2
        mt = otiles.shape[0]
        ometa_np = packed[2:2 + mt]
        idx = packed[2 + mt:2 + mt + n].astype(np.int64)
        words = packed[2 + mt + cap:2 + mt + cap + n]
        slots = idx // self._tile_words
        word_idx = idx % self._tile_words
        ids = ometa_np[slots]
        S = self._scores_dev[ri].shape[0]
        if self.cfg.packing == 3:
            rows, pos = self._mod.decode_swar_flat(ids, word_idx, words, S,
                                                   self.W3)
        else:
            from havac_tpu.hits.decode import decode_flat_records

            rows, pos = decode_flat_records(ids, word_idx, words, S, self.W,
                                            self.K)
        keep = (rows < Pc) & (pos < Lc)
        return rows[keep] + r0, pos[keep] + lo

    # ----------------------------------------------------------------- run

    def run(self, abort_event=None, progress=None, lookahead: int = 3,
            checkpoint_cb=None, resume=None
            ) -> Optional[Tuple[np.ndarray, np.ndarray, float]]:
        """Full pipelined sweep; returns (rows, positions, sweep_seconds) or
        None if aborted.

        Up to ``lookahead`` chunks are in flight; a small collector pool
        pulls finished chunks' packed hit records concurrently, so the
        per-chunk host round trip overlaps both device compute and other
        chunks' round trips (high-latency host links would otherwise
        serialize on it).

        ``checkpoint_cb(next_ci, carries (n_row, rchunk+1) int32, rows, pos)``
        is called after every completed column chunk (the pipeline drains at
        that boundary, trading some overlap for a consistent snapshot).
        ``resume`` is a prior callback payload ``(next_ci, carries, rows,
        pos)`` to continue from.
        """
        from concurrent.futures import ThreadPoolExecutor

        jnp = self.jnp
        t_start = time.perf_counter()
        futures: List = []
        inflight: List = []
        done = 0
        start_ci = 0
        prev_col_carry: Dict[int, object] = {}
        results: List[Tuple[np.ndarray, np.ndarray]] = []
        if resume is not None:
            start_ci, carries, rows0, pos0 = resume
            for ri in range(self.n_row):
                prev_col_carry[ri] = jnp.asarray(carries[ri])
            results.append((rows0, pos0))
            done = start_ci * self.n_row

        with ThreadPoolExecutor(max_workers=2) as pool:
            for ci in range(start_ci, self.n_col):
                symw, lo, Lc = self._pack_codes(ci)
                B, WS = symw.shape[0], symw.shape[1]
                istate = jnp.zeros((B, WS, 128), jnp.int32)
                col_carry: Dict[int, object] = {}
                for ri in range(self.n_row):
                    if abort_event is not None and abort_event.is_set():
                        for f in futures:
                            f.result()  # drain workers before bailing
                        return None
                    icarry = prev_col_carry.get(ri)
                    if icarry is None or icarry.shape[0] != self._rows1[ri]:
                        icarry = jnp.zeros(self._rows1[ri], jnp.int32)
                    # Geometry clamping guarantees ntiles <= _maxt_cap: the
                    # buffer covers the worst case and tile overflow cannot
                    # occur (record caps adapt inside _collect).
                    ntiles = B * self._scores_dev[ri].shape[0] * self._nflush
                    maxt = min(ntiles, self._maxt_cap)
                    out = self._dispatch(symw, self._scores_dev[ri], istate,
                                         icarry, maxt, self._reset_dev[ri])
                    while len(inflight) >= lookahead:
                        inflight.pop(0).result()  # bound buffers in flight
                    fut = pool.submit(self._collect, (out, ri, lo, Lc))
                    futures.append(fut)
                    inflight.append(fut)
                    istate = out[0]  # chain row state on device
                    col_carry[ri] = out[1]  # chain carry on device
                    done += 1
                    if progress is not None:
                        progress(done)
                prev_col_carry = col_carry
                if checkpoint_cb is not None and ci + 1 < self.n_col:
                    results += [f.result() for f in futures]
                    futures.clear()
                    inflight.clear()
                    carries = np.stack([np.asarray(prev_col_carry[ri])
                                        for ri in range(self.n_row)])
                    rows_s, pos_s = _concat_results(results)
                    checkpoint_cb(ci + 1, carries, rows_s, pos_s)
            results += [f.result() for f in futures]

        rows, pos = _concat_results(results)
        order = np.lexsort((pos, rows))
        return rows[order], pos[order], time.perf_counter() - t_start
