"""Pipelined single-device sweep: hit drain overlaps the DP sweep.

The reference overlaps its hit-filter tree with the PE sweep via HLS DATAFLOW
FIFOs (`device/HavacHls.cpp:49,190`; SURVEY.md §2.5 "pipeline parallelism").
The TPU-native equivalent exploits JAX's async dispatch: the engine dispatches
chunk (i+1) before touching chunk i's outputs, so the host-side hit decode of
chunk i runs while the device sweeps chunk i+1. All chain state — the
boundary-carry column between column chunks and the row state between row
chunks — stays on device as jax arrays; the only host synchronization per
chunk is the hit-count scalar and the dirty tiles actually produced.

Tile-buffer overflow is detected at collect time; the chunk is re-dispatched
with a doubled buffer using its saved inputs (state/carry outputs of an
overflowed dispatch are still exact — only the tile list saturates — so
downstream chunks already in flight need no replay).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from havac_tpu.ops.common import SsvKernelConfig, round_up


class PipelinedSweep:
    """Chunked (column × row) sweep with depth-1 software pipelining."""

    def __init__(self, codes: np.ndarray, scores: np.ndarray,
                 config: SsvKernelConfig, chunk_symbols: int,
                 chunk_rows: int) -> None:
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
        self.maxt = config.max_hit_tiles
        self.chunk = chunk_symbols
        self.rchunk = chunk_rows
        self.n_col = max(1, -(-self.L // self.chunk))
        self.n_row = max(1, -(-self.P // self.rchunk))
        self.overflow_retries = 0

        if config.packing == 3:
            from havac_tpu.ops import ssv_swar as mod
            self._mod = mod
            self.W3 = self.W // 3
        else:
            from havac_tpu.ops import ssv_pallas as mod
            self._mod = mod

        # Stage the whole packed database in HBM once (one H2D) and slice
        # per column chunk on device — per-chunk host uploads would bottleneck
        # hosts with slow interconnects. Falls back to per-chunk upload when
        # the packed database exceeds the staging budget.
        self._codes_dev = None
        packed_bytes = round_up(self.L, self.W) * (4 // 3 if config.packing == 3
                                                   else 1)
        if packed_bytes <= (1 << 32):  # 4 GiB staging budget
            L2 = round_up(self.L, self.W)
            padded = np.zeros(L2, dtype=np.uint8)
            padded[:self.L] = codes
            if config.packing == 3:
                blocks = self._mod.pack_symbols(padded, self.W3)
            else:
                blocks = padded.astype(np.int8).reshape(L2 // self.W,
                                                        self.W // 128, 128)
            self._codes_dev = jnp.asarray(blocks)
            self._blocks_per_chunk = self.chunk // self.W

        # Per-row-chunk score strips, staged once.
        self._scores_dev: List = []
        self._rows1: List[int] = []
        for ri in range(self.n_row):
            r0, r1 = ri * self.rchunk, min(self.P, (ri + 1) * self.rchunk)
            Pc = r1 - r0
            P2 = round_up(Pc, self.K)
            sc = np.full((P2, 4), -128, dtype=np.int32)
            sc[:Pc] = scores[r0:r1].astype(np.int32)
            if config.packing == 3:
                sc = sc + 256  # SWAR kernel takes biased scores
            self._scores_dev.append(jnp.asarray(sc.reshape(P2 // self.K,
                                                           self.K, 4)))
            self._rows1.append(P2 + 1)

    # ---------------------------------------------------------- chunk prep

    def _pack_codes(self, ci: int):
        lo = ci * self.chunk
        hi = min(self.L, lo + self.chunk)
        if self._codes_dev is not None:
            b0 = ci * self._blocks_per_chunk
            b1 = min(self._codes_dev.shape[0], b0 + self._blocks_per_chunk)
            return self._codes_dev[b0:b1], lo, hi - lo
        chunk_codes = self.codes[lo:hi]
        L2 = round_up(chunk_codes.shape[0], self.W)
        padded = np.zeros(L2, dtype=np.uint8)
        padded[:chunk_codes.shape[0]] = chunk_codes
        if self.cfg.packing == 3:
            blocks = self._mod.pack_symbols(padded, self.W3)
        else:
            blocks = padded.astype(np.int8).reshape(L2 // self.W,
                                                    self.W // 128, 128)
        return self.jnp.asarray(blocks), lo, hi - lo

    def _dispatch(self, symw, scores_dev, istate, icarry, maxt: int):
        if self.cfg.packing == 3:
            return self._mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, block_words=self.W3,
                max_hit_tiles=maxt, interpret=self.cfg.interpret)
        return self._mod._ssv_pallas_jit(
            symw, scores_dev, istate, icarry,
            block_width=self.W, rows_per_strip=self.K,
            max_hit_tiles=maxt, interpret=self.cfg.interpret)

    def _collect(self, pend) -> Tuple[np.ndarray, np.ndarray]:
        (out, inputs, maxt, ri, lo, Lc) = pend
        while True:
            ostate, ocarry, ometa, ocount, otiles = out
            count = int(ocount[0])  # first device sync for this chunk
            if count <= maxt:
                break
            # Rare: replay this chunk with a bigger tile buffer. Chain
            # outputs of the overflowed dispatch are exact, so nothing
            # downstream is re-run.
            self.overflow_retries += 1
            maxt *= 2
            out = self._dispatch(*inputs, maxt)
        r0 = ri * self.rchunk
        Pc = min(self.P, r0 + self.rchunk) - r0
        if count == 0:
            return (np.empty(0, dtype=np.int64),) * 2
        S = self._scores_dev[ri].shape[0]
        if self.cfg.packing == 3:
            rows, pos = self._mod.decode_swar_tiles(
                np.asarray(ometa), np.asarray(otiles[:count]).reshape(count, -1),
                count, S, self.W3)
        else:
            from havac_tpu.hits.decode import decode_hit_tiles

            rows, pos = decode_hit_tiles(
                np.asarray(ometa),
                np.asarray(otiles[:count]).reshape(count, -1),
                count, S, self.W, self.K)
        keep = (rows < Pc) & (pos < Lc)
        return rows[keep] + r0, pos[keep] + lo

    # ----------------------------------------------------------------- run

    def run(self, abort_event=None, progress=None
            ) -> Optional[Tuple[np.ndarray, np.ndarray, float]]:
        """Full pipelined sweep; returns (rows, positions, sweep_seconds) or
        None if aborted."""
        jnp = self.jnp
        t_start = time.perf_counter()
        all_rows: List[np.ndarray] = []
        all_pos: List[np.ndarray] = []
        pending = None
        done = 0

        prev_col_carry: Dict[int, object] = {}  # ri -> ocarry device array
        for ci in range(self.n_col):
            symw, lo, Lc = self._pack_codes(ci)
            B, WS = symw.shape[0], symw.shape[1]
            istate = jnp.zeros((B, WS, 128), jnp.int32)
            col_carry: Dict[int, object] = {}
            for ri in range(self.n_row):
                if abort_event is not None and abort_event.is_set():
                    return None
                icarry = prev_col_carry.get(ri)
                if icarry is None or icarry.shape[0] != self._rows1[ri]:
                    icarry = jnp.zeros(self._rows1[ri], jnp.int32)
                inputs = (symw, self._scores_dev[ri], istate, icarry)
                out = self._dispatch(*inputs, self.maxt)
                # Depth-1 pipeline: decode the previous chunk while this one
                # sweeps on device.
                if pending is not None:
                    rows, pos = self._collect(pending)
                    all_rows.append(rows)
                    all_pos.append(pos)
                pending = (out, inputs, self.maxt, ri, lo, Lc)
                istate = out[0]  # chain row state on device
                col_carry[ri] = out[1]  # chain carry on device
                done += 1
                if progress is not None:
                    progress(done)
            prev_col_carry = col_carry
        if pending is not None:
            rows, pos = self._collect(pending)
            all_rows.append(rows)
            all_pos.append(pos)

        rows = (np.concatenate(all_rows) if all_rows
                else np.empty(0, dtype=np.int64))
        pos = (np.concatenate(all_pos) if all_pos
               else np.empty(0, dtype=np.int64))
        order = np.lexsort((pos, rows))
        return rows[order], pos[order], time.perf_counter() - t_start
