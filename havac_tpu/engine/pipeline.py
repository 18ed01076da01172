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
one packed array per chunk; the record cap adapts (re-running only the
cheap compaction step) when a chunk is unusually hit-dense.
"""

from __future__ import annotations

import os
import time
from dataclasses import replace as dataclasses_replace
from typing import Dict, List, Optional, Tuple

import numpy as np

from havac_tpu.ops.common import (SsvKernelConfig, round_up,
                                  sort_hit_pairs)


def _get_compact_jit():
    global _COMPACT_JIT
    if _COMPACT_JIT is None:
        import jax

        _COMPACT_JIT = jax.jit(_compact_tiles_impl, static_argnames=("cap",))
    return _COMPACT_JIT


def _get_compact_split_jit():
    global _COMPACT_SPLIT_JIT
    if _COMPACT_SPLIT_JIT is None:
        import jax

        _COMPACT_SPLIT_JIT = jax.jit(_compact_tiles_split,
                                     static_argnames=("cap",))
    return _COMPACT_SPLIT_JIT


_COMPACT_JIT = None
_COMPACT_SPLIT_JIT = None


def _get_fused_global(packing: int, block_words: int, rows_per_strip: int,
                      maxt: int, cap: int, interpret: bool, isolate: bool,
                      split: bool = False, donate: bool = True,
                      batch: int = 0, drain_bands: Optional[int] = None,
                      pack16: bool = False):
    """Module-level cache of the fused kernel+compaction executable.

    MUST be global, not per-sweep: the engine builds a fresh PipelinedSweep
    per run, and a per-instance ``jax.jit`` closure would re-trace AND
    remote-recompile the fused program on every run of a warm process —
    this rig's compiles are remote-only with no cross-executable dedup, so
    an instance-level cache put ~10 s of recompilation inside every timed
    run (the round-2 design's module-level kernel jit had no such cost)."""
    key = (packing, block_words, rows_per_strip, maxt, cap, interpret,
           isolate, split, donate, batch, drain_bands, pack16)
    fn = _FUSED_CACHE.get(key)
    if fn is not None:
        return fn
    import jax

    if batch:
        # Batched-pull flow (requires packing=3 + donate + split): the
        # chunk's header and valid record prefix are APPENDED on device to
        # caller-owned accumulator buffers — ``hdrbuf`` (batch, 1+maxt) by
        # host-tracked slot, ``recbuf`` (batch·2·cap,) at the device-resident
        # running offset ``roff`` — so the host pulls TWO transfers per
        # batch of chunks instead of two per chunk. On this rig every D2H
        # transfer serializes with the execution stream at ~25 ms latency +
        # ~40 MB/s (benchmarks/pullprobe_v5e.json: header-only pulls alone
        # cost +26.6 ms/chunk over the 84.5 ms fused floor), so per-chunk
        # pulls taxed the 150k sweep ~50%. Overflowed chunks (nrec > cap)
        # advance ``roff`` by the clamped 2·cap — their truncated records
        # are garbage, but the engine re-dispatches them at a grown cap
        # anyway, and later chunks in the batch stay intact.
        if packing != 3 or not donate or not split:
            raise ValueError("batched pulls require the donated SWAR "
                             "slice-pull flow")
        from havac_tpu.ops import ssv_swar as mod

        def fused_batch(symw, scores_dev, istate, icarry, reset_dev,
                        tiles_buf, cnts_buf, hdrbuf, recbuf, roff, slot):
            import jax.numpy as jnp

            out = mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, reset_dev, tiles_buf,
                cnts_buf, block_words=block_words, max_hit_tiles=maxt,
                interpret=interpret, isolate=isolate,
                drain_bands=drain_bands)
            if pack16:
                # delta16 wire layout (HAVAC_REC_PACK, the default): three
                # contiguous segments per chunk — words(n), packed
                # deltas(ceil(n/2)), escapes(n_esc) — 6 B/record on the
                # serialized ~20 MB/s tunnel instead of 8.
                header, words, dpk, escv = _compact_tiles_packed16(
                    out[4], out[5], out[2], out[3][0], cap=cap)
                hdrbuf = jax.lax.dynamic_update_slice(hdrbuf, header[None],
                                                      (slot, 0))
                n = jnp.minimum(header[0], cap)
                recbuf = jax.lax.dynamic_update_slice(recbuf, words, (roff,))
                recbuf = jax.lax.dynamic_update_slice(recbuf, dpk,
                                                      (roff + n,))
                recbuf = jax.lax.dynamic_update_slice(
                    recbuf, escv, (roff + n + (n + 1) // 2,))
                roff = roff + _packed16_advance(n, cap, header[2])
                return (out[0], out[1], hdrbuf, recbuf, roff, out[4], out[5])
            header, rec = _compact_tiles_split(out[4], out[5], out[2],
                                               out[3][0], cap=cap)
            hdrbuf = jax.lax.dynamic_update_slice(hdrbuf, header[None],
                                                  (slot, 0))
            recbuf = jax.lax.dynamic_update_slice(recbuf, rec, (roff,))
            roff = roff + 2 * jnp.minimum(header[0], cap)
            return (out[0], out[1], hdrbuf, recbuf, roff, out[4], out[5])

        fn = jax.jit(fused_batch, donate_argnums=(5, 6, 7, 8))
        _FUSED_CACHE[key] = fn
        return fn

    if packing == 3:
        from havac_tpu.ops import ssv_swar as mod

        if not donate:
            # A/B variant (HAVAC_DONATE=0): the tile buffer and sidecar stay
            # INTERNAL to the executable (pallas outputs consumed by the
            # compaction, never returned) — no donation, no rethreading.
            # Temps are allocated per enqueue, so a lookahead-k pipeline
            # holds k of them live; the engine divides the tile budget by
            # lookahead+1 in this mode (same clamp as HAVAC_FUSE=0).
            def fused_nodonate(symw, scores_dev, istate, icarry, reset_dev):
                out = mod._ssv_swar_jit(
                    symw, scores_dev, istate, icarry, reset_dev,
                    block_words=block_words, max_hit_tiles=maxt,
                    interpret=interpret, isolate=isolate,
                    drain_bands=drain_bands)
                if split:
                    header, rec = _compact_tiles_split(
                        out[4], out[5], out[2], out[3][0], cap=cap)
                    return out[0], out[1], header, rec
                packed = _compact_tiles_impl(out[4], out[5], out[2],
                                             out[3][0], cap=cap)
                return out[0], out[1], packed

            fn = jax.jit(fused_nodonate)
            _FUSED_CACHE[key] = fn
            return fn

        # The multi-GB dirty-tile buffer and its count sidecar are DONATED
        # and returned: the engine rethreads them dispatch-to-dispatch so
        # exactly ONE copy lives in HBM. Without donation each enqueued
        # dispatch allocates a fresh temp at enqueue time — a lookahead-k
        # pipeline then holds k tile buffers live, and at the round-3
        # 6 GB budget that overcommits HBM and stalls the dispatch queue.
        def fused(symw, scores_dev, istate, icarry, reset_dev, tiles_buf,
                  cnts_buf):
            out = mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, reset_dev, tiles_buf,
                cnts_buf, block_words=block_words, max_hit_tiles=maxt,
                interpret=interpret, isolate=isolate,
                drain_bands=drain_bands)
            if split:
                header, rec = _compact_tiles_split(
                    out[4], out[5], out[2], out[3][0], cap=cap)
                return out[0], out[1], header, rec, out[4], out[5]
            packed = _compact_tiles_impl(out[4], out[5], out[2], out[3][0],
                                         cap=cap)
            return out[0], out[1], packed, out[4], out[5]

        fn = jax.jit(fused, donate_argnums=(5, 6))
        _FUSED_CACHE[key] = fn
        return fn
    else:
        from havac_tpu.ops import ssv_pallas as mod

        def fused(symw, scores_dev, istate, icarry, reset_dev):
            del reset_dev  # unpacked kernel has no isolation support
            out = mod._ssv_pallas_jit(
                symw, scores_dev, istate, icarry,
                block_width=block_words, rows_per_strip=rows_per_strip,
                max_hit_tiles=maxt, interpret=interpret)
            t = out[4]
            import jax.numpy as jnp

            ocnts = jnp.sum(
                (t.reshape(t.shape[0], 8, t.shape[1] // 8, 128) != 0)
                .astype(jnp.int32), axis=3)
            packed = _compact_tiles_impl(out[4], ocnts, out[2], out[3][0],
                                         cap=cap)
            return out[0], out[1], packed

    fn = jax.jit(fused)
    _FUSED_CACHE[key] = fn
    return fn


_FUSED_CACHE: Dict = {}
# Process-wide learned record caps, keyed by chunk geometry (rchunk,
# chunk_symbols). A single global max let one sweep's density poison every
# later sweep in the process: the r4 runtime table's 10k point (6 fat
# chunks, ~180k records each) taught cap=270336, and the 150k sweep then
# ran ALL 171 of its ~62k-record chunks through a compaction sized 4x too
# big (compaction cost scales ~linearly with cap — ~+5 ms/chunk, ~0.9 s of
# pure overhead at the 150k point). Chunks of the same geometry see the
# same per-chunk cell count, so density learned under one key transfers;
# different geometries converge independently via the warmup loop.
_RECORD_CAP_HINTS: Dict[Tuple[int, int], int] = {}


def _pull_bucket(k: int) -> int:
    """Bucketed slice-pull length: smallest power of two ≥ k (min 4096) up
    to 2^18 ints, then the next MULTIPLE of 2^17 (512 KiB). Lengths are
    bucketed because every distinct slice shape is its own executable —
    i.e. a remote compile on this rig. Pure pow2 buckets overshoot ≤ 2×,
    which at the batched slab scale shipped ~3 MB of padding per ~5 MB
    batch over a ~20 MB/s serialized tunnel (benchmarks/d2hprobe_v5e.json)
    — linear 512 KiB steps cap the overshoot at 0.5 MB while keeping the
    shape count bounded (≤ 6 pow2 + slab-size/512 KiB shapes, prewarmed)."""
    k = int(k)
    if k <= (1 << 18):
        return 1 << max(12, (k - 1).bit_length())
    return round_up(k, 1 << 17)


def _compact_tiles_impl(otiles, ocnts, ometa, count, cap: int):
    """On-device tile→record compaction: nonzero bitmap words of the first
    ``count`` tiles as (flat index, word) pairs. Only ``cap`` records cross
    to the host instead of whole 0.5 MB tiles — essential when realistic
    p-values make most tiles dirty.

    Row-granule flat design (round 2): at realistic density (~5 hits per
    129k-word tile) an earlier two-level group scheme degenerated — every
    record occupied its own 1024-word group, so the group gather + flat
    cumsum cost ~24 ms/chunk, doubling the device time of the sweep it
    serves. Instead:
      1. the KERNEL emits per-sublane-row nonzero-word counts as it drains
         each tile (``ocnts``, a 16 MB sidecar computed while the bits are
         in registers) — compaction never reads the 2 GB tile buffer
         wholesale;
      2. a two-level prefix following the sidecar's (slot, i) blocks: a
         cumsum over the maxt·8 group totals, then per-record group search
         + an in-group per-row prefix — no (maxt·WS)-length (≈4M) cumsum
         or searchsorted ever materializes;
      3. each output record gathers ONLY its row of the tile buffer
         (cap × 512 B total) and locates its lane with a per-row prefix.
    Cost is O(counts sidecar) + O(cap · 128) independent of how hits
    cluster (measured 7.8 ms vs 24 ms for the group scheme at engine
    geometry), and the old group_cap adaptivity is gone because nothing
    scales with dirty-group count. Stale slots beyond ``count`` are
    excluded via the count mask. Callers retry with a bigger cap when
    nrec > cap.

    Packed layout (one D2H round trip): [nrec, ometa(maxt), idx(cap),
    words(cap)]."""
    import jax.numpy as jnp

    nrec, idx, words = _compact_tiles_core(otiles, ocnts, count, cap)
    return jnp.concatenate([nrec[None].astype(jnp.int32),
                            ometa.astype(jnp.int32), idx.astype(jnp.int32),
                            words.astype(jnp.int32)])


def _compact_tiles_split(otiles, ocnts, ometa, count, cap: int):
    """:func:`_compact_tiles_impl` with a split, slice-pullable layout:
    ``header = [nrec, count, pad(6), ometa(maxt)]`` and ``records`` = the
    (idx, word) pairs INTERLEAVED, so the valid data is the contiguous
    prefix ``records[:2·nrec]`` — the host pulls a bucketed slice of that
    prefix instead of the full cap-sized vector. The 8-int header prefix
    carries the tile count so the host can detect the dense case (count ==
    ntiles ⇒ ometa ≡ iota, slots were allocated in grid order) and skip
    pulling the ~47 KB ometa at all — on this rig's ~20 MB/s serialized
    tunnel (benchmarks/d2hprobe_v5e.json) that header traffic alone cost
    ~0.4 s per 150k sweep."""
    import jax.numpy as jnp

    nrec, idx, words = _compact_tiles_core(otiles, ocnts, count, cap)
    header = jnp.concatenate([nrec[None].astype(jnp.int32),
                              count[None].astype(jnp.int32),
                              jnp.zeros(6, jnp.int32),
                              ometa.astype(jnp.int32)])
    rec = jnp.stack([idx.astype(jnp.int32), words.astype(jnp.int32)],
                    axis=1).reshape(-1)
    return header, rec


def _packed16_esc_cap(maxt: int, tile_words: int, cap: int) -> int:
    """Static escape-list capacity for the delta16 record layout: records
    are emitted in ascending flat-index order over a range of
    maxt · tile_words, so at most range // 0xFFFF gaps can exceed the
    16-bit delta field — a structural bound independent of hit density."""
    return int(min(cap, maxt * tile_words // 0xFFFF + 2))


def _packed16_advance(n, cap: int, n_esc):
    """Record-slab ints appended per chunk under the delta16 layout:
    words(n) + packed deltas(ceil(n/2)) + escapes(n_esc)."""
    return n + (n + 1) // 2 + n_esc


def _compact_tiles_packed16(otiles, ocnts, ometa, count, cap: int):
    """:func:`_compact_tiles_split` with the delta16 wire layout (round 5,
    VERDICT r4 #3): the reference ships 64-bit coordinate records because
    on-card DDR is free (`device/HitReporting.cpp:421-430`); on this rig
    the serialized ~20 MB/s D2H tunnel makes record BYTES the scarcest
    resource (the uniform→genomic 150k gap is pure record traffic). The
    compaction emits records in ascending flat-index order, so the idx
    stream delta-encodes: 16-bit deltas packed two per int32, gaps ≥ 0xFFFF
    escape to a full-idx side list whose length is structurally ≤
    range/0xFFFF (:func:`_packed16_esc_cap`). 8 B/record → 6 B + tiny.

    Returns (header, words (cap,) int32, dpk (cap/2,) int32 packed deltas,
    escv (cap_esc,) int32 absolute idx of escaped records, in rank order).
    header = [nrec, count, n_esc, pad(5), ometa(maxt)]. The batched append
    writes the three segments contiguously and advances the device offset
    by :func:`_packed16_advance`; invalid records (r ≥ nrec) carry delta 0
    and are never escaped, so they cost nothing on the wire."""
    import jax.numpy as jnp

    nrec, idx, words = _compact_tiles_core(otiles, ocnts, count, cap)
    maxt = otiles.shape[0]
    tile_words = otiles.shape[1] * otiles.shape[2]
    cap_esc = _packed16_esc_cap(maxt, tile_words, cap)
    r = jnp.arange(cap, dtype=jnp.int32)
    ok = r < nrec
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), idx[:-1]])
    delta = jnp.where(ok, idx - prev, 0)
    esc = delta >= 0xFFFF
    d16 = jnp.where(esc, 0xFFFF, delta)
    if cap % 2:  # engine caps are 4096-multiples; tiny test caps may be odd
        d16 = jnp.concatenate([d16, jnp.zeros(1, jnp.int32)])
    dpk = d16[0::2] | (d16[1::2] << 16)  # two uint16 per int32, lo first
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))
    er = _cumsum_1d_exact(esc.astype(jnp.int32), tri)  # inclusive ranks
    n_esc = er[cap - 1]
    rank = jnp.where(esc, er - 1, cap_esc)
    escv = jnp.zeros(cap_esc + 1, jnp.int32).at[
        jnp.minimum(rank, cap_esc)].set(jnp.where(esc, idx, 0),
                                        mode="drop")[:cap_esc]
    header = jnp.concatenate([nrec[None].astype(jnp.int32),
                              count[None].astype(jnp.int32),
                              n_esc[None].astype(jnp.int32),
                              jnp.zeros(5, jnp.int32),
                              ometa.astype(jnp.int32)])
    return header, words.astype(jnp.int32), dpk, escv


def unpack_delta16(seg: np.ndarray, n: int, n_esc: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of :func:`_compact_tiles_packed16`'s record
    segments: ``seg`` holds [words(n), packed deltas(ceil(n/2)),
    escapes(n_esc)] int32; returns (idx int64 (n,), words int32 (n,))."""
    words = seg[:n]
    ndl = (n + 1) // 2
    d16 = seg[n:n + ndl].view(np.uint16)[:n].astype(np.int64)
    part = np.cumsum(np.where(d16 == 0xFFFF, 0, d16))
    if n_esc:
        escv = seg[n + ndl:n + ndl + n_esc].astype(np.int64)
        pos = np.flatnonzero(d16 == 0xFFFF)
        offs = escv - part[pos]
        j = np.searchsorted(pos, np.arange(n), side="right") - 1
        idx = part + np.where(j >= 0, offs[np.maximum(j, 0)], 0)
    else:
        idx = part
    return idx, words


def _cumsum_1d_exact(v, tri):
    """Inclusive cumsum of a 1D nonnegative int32 vector (total < 2^24) via
    ONE (N/128, 128) @ triangular MXU contraction plus a tiny second-level
    cumsum — f32-exact by the bound. Lengths are padded to a multiple of
    128 (engine caps are 4096-multiples; tests use tiny caps)."""
    import jax.numpy as jnp

    N0 = v.shape[0]
    N = round_up(max(N0, 1), 128)
    if N != N0:
        v = jnp.pad(v, (0, N - N0))
    x = v.reshape(N // 128, 128).astype(jnp.float32)
    c = x @ tri
    tails = c[:, 127]
    offs = jnp.cumsum(tails) - tails  # (N/128,): small, plain cumsum
    return (c + offs[:, None]).reshape(N).astype(jnp.int32)[:N0]


# Ranks per while-loop block of the piecewise compaction search. 2^16 keeps
# each block's (PIECE, 128) f32 intermediates at 32 MB (good XLA op sizes)
# while one block covers most uniform-density chunks. HAVAC_COMPACT_PIECE
# overrides (0 = monolithic cap-sized search, the pre-round-5 flow, kept
# for A/B); read at trace time, so it binds per compiled executable.
_COMPACT_PIECE = 1 << 16


def _compact_piece() -> int:
    v = int(os.environ.get("HAVAC_COMPACT_PIECE", str(_COMPACT_PIECE)))
    return v if v > 0 else (1 << 30)


def _compact_tiles_core(otiles, ocnts, count, cap: int):
    """Three-level record search over the count sidecar.

    TPU op choices (measured, benchmarks/opbench_v5e.json @ cap 176k):
      * level-1 block assignment: the queries are the SORTED ranks 0..cap-1,
        so ``searchsorted`` (9.6 ms — the single most expensive op in the
        round-3 compaction) collapses to a 743-element scatter + one 1D
        cumsum: bi[r] = #{row_offs ≤ r}.
      * every lane-axis reduction/cumsum/take runs as an MXU contraction
        (mask @ ones = 1.0 ms vs 2.1; x @ triangular = 1.05 vs 1.6;
        onehot-dot ≈ 1.0 vs take_along's 1.9). All f32 paths are exact:
        compares of ints through f32 are monotone (and both sides < 2^24
        whenever the compare is close), mask sums ≤ 128, per-group cumsums
        ≤ 16k, gathered prefix values ≤ the record's rank ≤ cap < 2^24.
      * ``words`` stays int32 take_along — bitmap words use 30 bits and
        must not round through f32.
    """
    import jax
    import jax.numpy as jnp

    maxt, WS, _ = otiles.shape
    R = maxt * WS
    C = WS // 8
    NG = maxt * 8
    rows = otiles.reshape(R, 128)
    # ocnts is (maxt, 8, C>=WS/8): [slot, i, g] counts sublane row i*C+g
    # (lane-padded by the kernel; sliced off here). Structure: group totals
    # fold into 128-group prefix rows; records locate their prefix row
    # (level 1), their group inside ONE gathered 128-lane prefix row
    # (level 2), and their word by the in-group lane prefix (level 3). No
    # R-length (4M) cumsum and no NG-length per-record search materializes.
    cnt_g = ocnts[:, :, :C].reshape(NG, C)
    g_tot = jnp.sum(cnt_g, axis=1)  # (NG,)
    # Stale slots beyond ``count`` are excluded here, on the (NG,) totals —
    # masking the full (NG, C) block cost a measured ~1.5 ms/chunk, and
    # valid records can only ever index live groups of cnt_g.
    g_tot = jnp.where(jnp.arange(NG) // 8 < count, g_tot, 0)
    NB = (NG + 127) // 128
    g2 = jnp.zeros((NB, 128), jnp.int32).reshape(-1).at[:NG].set(
        g_tot).reshape(NB, 128)
    in_row = jnp.cumsum(g2, axis=1)  # (NB, 128) lane prefix — small
    row_tot = in_row[:, 127]  # (NB,)
    row_offs = jnp.cumsum(row_tot)  # inclusive per-prefix-row totals
    offs2 = in_row + (row_offs - row_tot)[:, None]  # global inclusive prefix
    nrec = row_offs[NB - 1]
    ones = jnp.ones((128, 1), jnp.float32)
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))
    if C != 128:
        cnt128 = jnp.zeros((NG, 128), jnp.int32).at[:, :C].set(cnt_g)
    else:
        cnt128 = cnt_g

    def dotsum(mask_or_f32):
        m = mask_or_f32.astype(jnp.float32)
        return jax.lax.dot_general(
            m, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0]

    def rank_block(r0, Np: int):
        """Locate records of ranks [r0, r0 + Np): the (Np, 128) search
        levels for one contiguous rank block (``r0`` may be traced)."""
        r = r0 + jnp.arange(Np, dtype=jnp.int32)
        # Level 1: bi[j] = #{v: row_offs[v] ≤ r0 + j} = (count ≤ r0) +
        # inclusive cumsum of a tiny scatter of the in-block offsets —
        # the blocked form of the sorted-iota searchsorted collapse.
        base = jnp.sum((row_offs <= r0).astype(jnp.int32))
        pos = row_offs - r0
        marks = jnp.zeros((Np + 128,), jnp.int32).at[
            jnp.clip(pos, 0, Np)].add((pos >= 1).astype(jnp.int32))
        bi = base + _cumsum_1d_exact(marks[:Np], tri)
        bic = jnp.clip(bi, 0, NB - 1)
        win = offs2[bic]  # (Np, 128) — the record's 128-group prefix window
        gl = dotsum(win < (r + 1)[:, None]).astype(jnp.int32)
        glc = jnp.clip(gl, 0, 127)
        gic = jnp.clip(bic * 128 + glc, 0, NG - 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (Np, 128), 1)
        row_base = (row_offs - row_tot)[bic]
        oh_prev = jnp.logical_and(lane_iota == (glc - 1)[:, None],
                                  (glc > 0)[:, None])
        g_prev_f = dotsum(win.astype(jnp.float32)
                          * oh_prev.astype(jnp.float32))
        g_prev = jnp.where(glc > 0, g_prev_f.astype(jnp.int32), row_base)
        grank = r + 1 - g_prev  # 1-based rank within the group
        crow = cnt128[gic].astype(jnp.float32)  # (Np, 128) per-row counts
        ccum = crow @ tri  # lane cumsum on the MXU (values ≤ 16k: exact)
        gpos = dotsum(ccum < grank.astype(jnp.float32)[:, None]).astype(
            jnp.int32)
        gposc = jnp.clip(gpos, 0, C - 1)
        oh_rp = jnp.logical_and(lane_iota == (gposc - 1)[:, None],
                                (gposc > 0)[:, None])
        row_prev = dotsum(ccum * oh_rp.astype(jnp.float32)).astype(
            jnp.int32)
        rank = grank - row_prev  # 1-based rank within the row
        row_rc = (gic // 8) * WS + (gic % 8) * C + gposc
        sel = rows[row_rc]  # (Np, 128) — the only read of the tile buffer
        rowcum = (sel != 0).astype(jnp.float32) @ tri
        lane = dotsum(rowcum < rank.astype(jnp.float32)[:, None]).astype(
            jnp.int32)
        lanec = jnp.clip(lane, 0, 127)
        words = jnp.take_along_axis(sel, lanec[:, None], axis=1)[:, 0]
        ok = r < nrec
        idx = jnp.where(ok, row_rc * 128 + lanec, -1)
        words = jnp.where(ok, words, 0)
        return idx, words

    if cap <= _compact_piece():
        idx, words = rank_block(jnp.int32(0), cap)
        return nrec, idx, words
    # Piecewise search (round 5): the (cap, 128) levels were the one
    # compaction cost LINEAR IN CAP (17.3 ms at cap 110k, measured), and
    # the cap is a sticky worst-case learned per geometry — at the genomic
    # 150k point (cap 430k, mean chunk ~143k records) every chunk paid ~3×
    # its actual record count, and empty chunks paid full freight. A
    # while_loop of ⌈nrec/piece⌉ fixed-shape blocks makes the cost follow
    # the ACTUAL records; ranks past nrec keep the same -1/0 filler the
    # monolithic form produced (the trailing pieces simply never run).
    PIECE = _compact_piece()
    capp = round_up(cap, PIECE)
    idx0 = jnp.full((capp,), -1, jnp.int32)
    words0 = jnp.zeros((capp,), jnp.int32)
    # Overflowed chunks (nrec > cap) still fill exactly the buffer — the
    # truncated tail is regenerated by the host's grown-cap redispatch.
    npieces = jnp.minimum((nrec + PIECE - 1) // PIECE, capp // PIECE)

    def cond(state):
        return state[0] < npieces

    def body(state):
        p, idx, words = state
        r0 = p * PIECE
        idx_p, words_p = rank_block(r0, PIECE)
        idx = jax.lax.dynamic_update_slice(idx, idx_p, (r0,))
        words = jax.lax.dynamic_update_slice(words, words_p, (r0,))
        return p + 1, idx, words

    _, idx, words = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx0, words0))
    return nrec, idx[:cap], words[:cap]


def _concat_fill(parts, pool):
    """np.concatenate with the copies fanned across ``pool``: one worker
    per source part writing its slice of a preallocated buffer. Large
    fresh-page concatenations on this VM run at wildly variable single-core
    rates (85 MB/s worst case measured); parallel first-touch fill is never
    slower. Must NOT be called from inside a pool worker (nested submits
    can deadlock a bounded pool)."""
    parts = [p for p in parts if p.size]
    if not parts:
        return np.empty(0, dtype=np.int64)
    if len(parts) == 1:
        return parts[0]
    offs = np.cumsum([0] + [p.size for p in parts])
    out = np.empty(offs[-1], dtype=parts[0].dtype)
    futs = [pool.submit(out.__setitem__, slice(offs[i], offs[i + 1]),
                        parts[i]) for i in range(len(parts))]
    for f in futs:
        f.result()
    return out


def _concat_results(results, pool=None):
    rows = [r for _, r, _, _ in results if r.size]
    pos = [p for _, _, p, _ in results if p.size]
    if pool is not None:
        return _concat_fill(rows, pool), _concat_fill(pos, pool)
    return (np.concatenate(rows or [np.empty(0, dtype=np.int64)]),
            np.concatenate(pos or [np.empty(0, dtype=np.int64)]))


_RESOLVED_FIELDS = ("sequence_index", "sequence_position", "phmm_index",
                    "phmm_position")


def _runs_order(rows, pos, run_sizes, nthreads: int = 1):
    """Permutation (row, pos)-sorting the concatenation of already-sorted
    runs (run r has run_sizes[r] entries); None means identity (single
    run). O(n·log k) native pairwise merge when built, full composite-key
    sort otherwise.

    ``nthreads`` defaults to 1 because every caller fans groups across the
    collector pool already: nesting the natives' own 4-8-way thread spawns
    under 8 concurrent pool jobs oversubscribed this 1-core (≈8-effective)
    VM ~8x and measured 8-24 s for the 150k drain tail vs 0.7 s
    single-threaded-per-job (callers with few groups raise it)."""
    if len(run_sizes) <= 1:
        return None
    try:
        from havac_tpu import native
    except Exception:  # pragma: no cover
        native = None
    if native is not None:
        offs = np.cumsum([0] + list(run_sizes))
        order = native.merge_runs_native(rows, pos, offs, nthreads=nthreads)
        if order is None:
            order = native.sort_order_native(rows, pos, nthreads=nthreads)
        if order is not None:
            return order
    from havac_tpu.ops.common import hit_sort_order

    return hit_sort_order(rows, pos)


def _merge_results_sorted(results, n_row, pool):
    """Globally sorted (rows, positions) from per-chunk parts that are each
    already (row, pos)-sorted: per-row-group k-way merges fanned across the
    pool (groups cover disjoint row ranges, so group slices stacked in ri
    order are globally sorted)."""
    groups = [[] for _ in range(n_row)]
    for ri, r, p, _ in results:
        if r.size:
            groups[ri].append((r, p))
    sizes = [sum(r.size for r, _ in g) for g in groups]
    total = sum(sizes)
    if not total:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy()
    out_r = np.empty(total, dtype=np.int64)
    out_p = np.empty(total, dtype=np.int64)
    offs = np.cumsum([0] + sizes)
    nt = max(1, 8 // max(1, sum(1 for g in groups if g)))

    def job(g, lo, hi):
        rows = np.concatenate([r for r, _ in g])
        pos = np.concatenate([p for _, p in g])
        order = _runs_order(rows, pos, [r.size for r, _ in g], nthreads=nt)
        if order is None:
            out_r[lo:hi], out_p[lo:hi] = rows, pos
        else:
            out_r[lo:hi], out_p[lo:hi] = rows[order], pos[order]

    futs = [pool.submit(job, g, offs[i], offs[i + 1])
            for i, g in enumerate(groups) if g]
    for f in futs:
        f.result()
    return out_r, out_p


def _merge_group_into(parts, cols, lo: int, hi: int, nthreads: int = 1):
    """Merge one row-chunk group's (ResolvedHits, kept_rows, kept_pos) parts
    by raw (row, position) key, writing the permuted columns DIRECTLY into
    rows [lo, hi) of the preallocated result columns — jax-free
    collector-pool work item. Each part arrives already (row, pos)-sorted
    (the per-chunk sort ran in the collector pool, overlapped with the
    sweep), so this is an O(n·log k) k-way merge of sorted runs (native
    pairwise inplace_merge when built; threaded full sort otherwise).
    Writing in place halves the bytes moved vs merge-then-concatenate;
    memcpy bandwidth is the tail's bottleneck."""
    krows = [r for _, r, _ in parts if r.size]
    if not krows:
        return
    try:
        from havac_tpu import native
    except Exception:  # pragma: no cover
        native = None
    keyform = parts[0][2] is None  # key-form: (ResolvedHits, keys u64, None)
    if keyform:
        keys = np.concatenate(krows)
        if len(krows) <= 1:
            order = None
        else:
            offs = np.cumsum([0] + [r.size for r in krows])
            order = (native.merge_runs_u64_native(keys, offs,
                                                  nthreads=nthreads)
                     if native else None)
            if order is None:
                order = np.argsort(keys, kind="stable")
    else:
        rows = np.concatenate(krows)
        pos = np.concatenate([p for _, _, p in parts if p.size])
        order = _runs_order(rows, pos, [r.size for r in krows],
                            nthreads=nthreads)
    for f, out_col in zip(_RESOLVED_FIELDS, cols):
        col = np.concatenate([np.ascontiguousarray(getattr(t, f))
                              for t, _, _ in parts if len(t)])
        if order is None:  # single already-sorted run: straight copy
            out_col[lo:hi] = col
            continue
        if native is not None:
            done = (native.permute_i32_native(col, order,
                                              out=out_col[lo:hi],
                                              nthreads=nthreads)
                    if col.dtype == np.int32
                    else native.permute_i64_native(col, order,
                                                   out=out_col[lo:hi],
                                                   nthreads=nthreads))
        else:
            done = None
        if done is None:
            out_col[lo:hi] = col[order]


def _concat_resolved(results, n_row, pool):
    """Merge per-chunk (ri, rows, pos, (ResolvedHits, kept_rows, kept_pos))
    entries into one globally (row, position)-sorted table.

    Row-chunk groups cover disjoint row ranges, so each group sorts
    independently (fanned out on the collector pool — the native sort and
    numpy both release the GIL, and this VM's thread pools reach ~8×),
    each writing its slice of the final columns in place; slices stacked in
    ri order are already globally sorted."""
    from havac_tpu.hits.decode import ResolvedHits

    groups = [[] for _ in range(n_row)]
    for ri, _, _, res in results:
        if res is not None:
            groups[ri].append(res)
    sizes = [sum(r.size for _, r, _ in g) for g in groups]
    total = sum(sizes)
    if not total:
        return ResolvedHits(*(np.empty(0, dtype=np.int64),) * 4)
    # Key-form parts carry int32 resolved columns; allocate to match (the
    # group merges write their slices in place, so dtypes must agree).
    dt = next(t.sequence_index.dtype for g in groups for t, _, _ in g
              if len(t))
    cols = [np.empty(total, dtype=dt) for _ in _RESOLVED_FIELDS]
    offs = np.cumsum([0] + sizes)
    nt = max(1, 8 // max(1, sum(1 for g in groups if g)))
    futs = [pool.submit(_merge_group_into, g, cols, offs[i], offs[i + 1], nt)
            for i, g in enumerate(groups) if g]
    for f in futs:
        f.result()
    return ResolvedHits(*cols)


class PipelinedSweep:
    """Chunked (column × row) sweep with depth-1 software pipelining."""

    def __init__(self, codes: np.ndarray, scores: np.ndarray,
                 config: SsvKernelConfig, chunk_symbols: int,
                 chunk_rows: int, reset_rows: np.ndarray = None,
                 resolve_fn=None, resolve_tables=None) -> None:
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
        # Hit records pulled per chunk: adaptive, and seeded per GEOMETRY —
        # once any sweep converges on a workload's density, later sweeps of
        # the same chunk shape (fresh engines included) start at the learned
        # cap and skip the overflow re-dispatch plus its one-off recompile.
        # (Re-seeded from _RECORD_CAP_HINTS once the geometry is derived
        # below; a lone global hint let small-chunk-count sweeps oversize
        # every later sweep's compaction — see the _RECORD_CAP_HINTS note.)
        self.record_cap = 1 << 14
        # Per-phase wall-clock attribution (seconds), filled by run():
        #   dispatch    — enqueueing kernel+compaction (async, host side)
        #   gate_wait   — main thread in the lookahead gate (≈ pull + any
        #                 wait for the device to finish the oldest chunk —
        #                 the pipeline bubble)
        #   pull        — fetching packed records (main thread; ~0.3 ms
        #                 when the async D2H prefetch has landed)
        #   decode      — collectors decoding records to (row, pos)
        #   resolve     — collectors resolving chunk hits to local coords
        #                 (overlapped with the device sweep; the reference
        #                 resolves serially after the run, Havac.cpp:145-187)
        #   drain       — final drain (tail pulls + decodes)
        #   compile     — first-call trace+remote-compile per (maxt, cap)
        #                 (a subset of dispatch; ~0 on warm processes since
        #                 the fused cache is module-global)
        #   ready_wait  — pull time spent waiting for the device to finish
        #                 the oldest chunk (pipeline bubble: device-bound)
        #   fetch       — pull time spent actually fetching bytes (host/
        #                 tunnel-bound; ~0.3 ms when the async D2H landed)
        self.prof: Dict[str, float] = {
            "dispatch": 0.0, "compile": 0.0, "gate_wait": 0.0, "drain": 0.0,
            "pull": 0.0, "ready_wait": 0.0, "fetch": 0.0, "decode": 0.0,
            "resolve": 0.0}
        self._dispatched = set()
        # Per-chunk resolution in the collector pool: resolve_fn(rows, pos)
        # -> (ResolvedHits, kept_rows, kept_pos). None = caller resolves
        # after the run (serial tail).
        self._resolve_fn = resolve_fn
        # Key-form hit path (round 5): when the native core is built and the
        # caller supplies the raw resolution tables, each chunk's hits run
        # one fused native pass — records → bounds filter → SORTED global
        # uint64 keys ((row << 38) | pos) → int32 resolved columns — instead
        # of the decode/keep/resolve numpy chain. Per-hit state drops from
        # ~48 B across three passes to 8 B + 16 B across one; at genomic
        # density the host side was 2× the device sweep (runtime_table_r5_
        # genomic.json: decode 29 s + resolve 27 s + tail 13 s vs 28 s of
        # device). HAVAC_KEYFORM=0 is the exactness A/B knob.
        self._resolve_tables = resolve_tables
        self._keyform = False
        self._native = None
        if (resolve_tables is not None and config.packing == 3
                and os.environ.get("HAVAC_KEYFORM", "1") != "0"):
            try:
                from havac_tpu import native as _native

                lib = _native._load()
                starts, lengths, _prefix = resolve_tables
                if (lib is not None and hasattr(lib, "hv_chunk_keys")
                        and self.P < (1 << 25)
                        and int(codes.shape[0]) < (1 << 38)
                        and (lengths.size == 0
                             or int(lengths.max()) < (1 << 31))):
                    self._keyform = True
                    self._native = _native
            except Exception:  # pragma: no cover - fall back to legacy path
                pass
        import threading as _threading

        self._prof_lock = _threading.Lock()  # decode accrues from workers
        self.tile_budget_bytes = config.tile_budget_bytes
        self._fused = {}  # (maxt, cap) -> jitted kernel+compaction
        self._tiles_dev = None  # chained donated hit buffers (_hit_bufs)
        self._cnts_dev = None
        # Experiment knobs (fusebench A/B without code edits):
        #   HAVAC_FUSE=0          — kernel and compaction as two dispatches
        #                           (round-2 flow) instead of one fused
        #                           executable. The tile buffer is then a
        #                           real kernel output with up to lookahead+1
        #                           copies live; the geometry clamp below
        #                           divides the tile budget accordingly
        #                           (HAVAC_TILE_BUDGET_GB still overrides).
        #   HAVAC_TILE_BUDGET_GB  — override config.tile_budget_bytes
        import os as _os

        self._fuse = _os.environ.get("HAVAC_FUSE", "1") != "0"
        #   HAVAC_DONATE=0        — fused executable with INTERNAL temp hit
        #                           buffers instead of donated/rethreaded
        #                           ones (isolates donation cost; budget is
        #                           clamped by lookahead+1 like FUSE=0).
        self._donate = _os.environ.get("HAVAC_DONATE", "1") != "0"
        # Slice-pull (HAVAC_SLICE_PULL=0 reverts to cap-sized pulls for
        # A/B): only the SWAR path emits the split record layout.
        self._slice_pull = (config.packing == 3 and
                            _os.environ.get("HAVAC_SLICE_PULL", "1") != "0")
        #   HAVAC_PULL_BATCH=k    — chunks whose records accumulate on
        #                           device before ONE header + ONE record
        #                           pull (0/1 = legacy per-chunk pulls).
        #                           Every D2H transfer on this rig
        #                           serializes with the execution stream at
        #                           ~25-45 ms latency + bytes at ~20 MB/s
        #                           (benchmarks/pullprobe_v5e.json,
        #                           d2hprobe_v5e.json), so per-chunk pulls
        #                           taxed dense sweeps ~50%. Unset = AUTO:
        #                           sized from the chunk count below (the
        #                           interleaved gatesweep A/Bs measured 16
        #                           best at 171 chunks, 24 at 56 chunks —
        #                           fewer serialized stalls — while a batch
        #                           spanning most of the sweep regresses:
        #                           everything piles into the drain tail,
        #                           gatesweep50k pb32).
        _pb_env = _os.environ.get("HAVAC_PULL_BATCH")
        self._pull_batch = -1 if _pb_env is None else int(_pb_env)
        if not (self._fuse and self._donate and self._slice_pull):
            self._pull_batch = 0  # batched appends require the fused
            #                       donated slice-pull executable
        if self._pull_batch == 1:
            self._pull_batch = 0
        #   HAVAC_REC_PACK=0      — revert the batched flow's delta16 record
        #                           wire layout (words + 16-bit idx deltas +
        #                           bounded escape list, 6 B/record) to the
        #                           interleaved (idx, word) pairs (8 B).
        #                           Record bytes are the genomic-density tax
        #                           on this rig's serialized ~20 MB/s D2H
        #                           (the uniform→genomic 150k gap is pure
        #                           record traffic, runtime_table_r4*).
        self._rec_pack = (self._pull_batch > 0 and
                          _os.environ.get("HAVAC_REC_PACK", "1") != "0")
        self._batch_free: List = []  # recycled (hdrbuf, recbuf) sets
        self._batch_bufs_cap = 0  # cap the free sets were sized for
        #   HAVAC_DRAIN_BANDS=n   — dirty-band granularity of the kernel's
        #                           tile drain (1 = full-tile DMA per dirty
        #                           flush, the DEFAULT). The round-4 banded
        #                           variant (default 18) saved HBM bytes in
        #                           theory but measured SLOWER everywhere it
        #                           was A/B'd: the fuseladder decomposition
        #                           (benchmarks/fuseladder_v5e.json) prices
        #                           the full-tile drain at +0.0 ms/chunk
        #                           over the sidecar-only kernel (the DMA
        #                           overlaps compute; HBM bytes are not the
        #                           bottleneck) while 18 bands cost +4.5
        #                           ms/chunk of per-band DMA issue overhead,
        #                           matching the round-4 interleaved gate
        #                           sweep (bands1 27.4 s vs bands18 29.6 s,
        #                           gatesweep150k_bands_v5e.json). Kept as a
        #                           knob; rounded down to a divisor of WS//8
        #                           (ssv_swar._effective_drain_bands).
        self._drain_bands = int(_os.environ.get("HAVAC_DRAIN_BANDS", "1"))
        if self.cfg.packing != 3:
            self._drain_bands = 1  # unpacked kernel: no banded drain
        _bgb = _os.environ.get("HAVAC_TILE_BUDGET_GB")
        if _bgb:
            self.tile_budget_bytes = int(float(_bgb) * (1 << 30))
            config = dataclasses_replace(config,
                                         tile_budget_bytes=self.tile_budget_bytes)
            self.cfg = config

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
        self._compact_split = _get_compact_split_jit()

        # Clamp chunk geometry so a worst-case (every tile dirty) dispatch
        # fits the tile budget. Since the kernel+compaction fusion the
        # dirty-tile buffer is a temp INTERNAL to the one fused executable —
        # device executions serialize, so exactly one tile buffer is ever
        # live and the budget buys one full-size buffer (the pre-fusion
        # design kept ~3 in flight). Bigger chunks mean fewer dispatches:
        # each chunk cycle costs fixed host time (enqueue + pull round trip
        # on the tunnel), which dominated the 150k sweep at 493 chunks.
        tile_bytes = self._tile_words * 4
        budget = config.tile_budget_bytes
        # Resolve the pipeline depth ONCE: the budget clamp below and run()
        # must agree on it, or an explicit run(lookahead=k) would keep more
        # per-enqueue tile buffers live than the geometry was sized for.
        self._lookahead = int(_os.environ.get("HAVAC_LOOKAHEAD", "3"))
        if (not self._fuse or not self._donate) and not _bgb:
            # Undonated A/B modes (HAVAC_FUSE=0 or HAVAC_DONATE=0): the tile
            # buffer is a real kernel output / per-enqueue temp, so up to
            # lookahead+1 copies are live at once. Divide the DEFAULT budget
            # so the worst case still fits HBM — without this, either knob
            # alone would overcommit a 16 GB v5e ~3x and die
            # RESOURCE_EXHAUSTED. An explicit HAVAC_TILE_BUDGET_GB is taken
            # as the intended per-buffer size.
            budget //= self._lookahead + 1
        self._maxt_cap = max(12, min(16384, budget // tile_bytes))
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
        if self._pull_batch < 0:  # AUTO
            # 24 across the board: the round-4 interleaved A/Bs picked 16
            # at >96 chunks, but with the round-5 bands=1 + delta16 wire
            # the per-batch pulls got cheap enough that 24 wins at 171
            # chunks too (21.5 s vs 22.7, warm-min interleaved,
            # benchmarks/gatesweep150k_r5_v5e.json) as it already did at 56
            # chunks (gatesweep50k_v5e.json).
            self._pull_batch = 24
        # Geometry is now fixed: adopt the cap another sweep of this chunk
        # shape already converged (per-chunk record density scales with the
        # chunk's cell count, so hints only transfer within a geometry).
        self._cap_key = (self.rchunk, self.chunk)
        self.record_cap = max(self.record_cap,
                              _RECORD_CAP_HINTS.get(self._cap_key, 0))

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
            card = scores.shape[1]
            sc = np.full((self.rchunk, card), -128, dtype=np.int32)
            sc[:Pc] = scores[r0:r1].astype(np.int32)
            if config.packing == 3:
                sc = sc + 256  # SWAR kernel takes biased scores
            self._scores_dev.append(jnp.asarray(sc.reshape(
                self.rchunk // self.K, self.K, card)))
            if self._isolate:
                rr = np.zeros(self.rchunk, dtype=np.int32)
                rr[:Pc] = np.asarray(reset_rows[r0:r1], dtype=np.int32)
                self._reset_dev.append(jnp.asarray(rr))
            else:
                self._reset_dev.append(None)
            self._rows1.append(self.rchunk + 1)

    # ---------------------------------------------------------- warmup

    def _chunk_maxt(self) -> int:
        ntiles = (self._blocks_per_chunk * self._scores_dev[0].shape[0]
                  * self._nflush)
        return min(ntiles, self._maxt_cap)

    def warm_compact(self) -> None:
        """Trigger the fused kernel+compaction compile on chunk-0 shapes.

        Since the fusion rewrite there is ONE executable per (maxt, cap);
        this dispatches it once with zero state and discards the result
        (~tens of ms of compute once warm; one 30-180 s remote compile
        cold). AOT .lower().compile() cannot be used here — local AOT
        fails on the rig's libtpu version mismatch — so a real dummy call
        is the only way to force the compile."""
        jnp = self.jnp
        try:
            symw, _lo, _Lc = self._pack_codes(0)
            B, WS = symw.shape[0], symw.shape[1]
            istate = jnp.zeros((B, WS, 128), jnp.int32)
            icarry = jnp.zeros(self._rows1[0], jnp.int32)
            maxt = self._chunk_maxt()
            if self._pull_batch:
                # Batched flow: warm the batched executable AND converge
                # the record cap on chunk 0's real density here (the warm
                # dispatch sweeps real symbols/scores), so the first timed
                # run neither recompiles nor pays the overflow-redispatch
                # storm a too-small cap causes across a whole batch.
                for _ in range(3):
                    cap = self.record_cap
                    hb, rb = self._alloc_batch_bufs(maxt, cap)
                    out = self._dispatch_batched(
                        symw, self._scores_dev[0], istate, icarry, maxt,
                        self._reset_dev[0], cap, hb, rb,
                        jnp.zeros((), jnp.int32), 0)
                    # Reads via the same (kb, 8) header-prefix slice the
                    # batch drain uses, prewarming that executable too.
                    n0 = int(np.asarray(out[2][:, :8])[0, 0])
                    hb2, rb2 = out[2], out[3]
                    # Prewarm the record-slab bucket slice shapes (each
                    # distinct slice length is one remote compile).
                    k = _pull_bucket(1)
                    slices = []
                    while k < rb2.shape[0]:
                        slices.append(rb2[:k])
                        k = (k * 2 if k < (1 << 18)
                             else k + (1 << 17))  # _pull_bucket's ladder
                    for s in slices:
                        s.block_until_ready()
                    self._batch_free.append((cap, hb2, rb2))
                    if n0 <= cap:
                        break
                    self.record_cap = round_up(n0 + n0 // 2, 4096)
                    _RECORD_CAP_HINTS[self._cap_key] = max(
                        _RECORD_CAP_HINTS.get(self._cap_key, 0),
                        self.record_cap)
                return
            out = self._dispatch_fused(symw, self._scores_dev[0], istate,
                                       icarry, maxt,
                                       self._reset_dev[0], self.record_cap)
            np.asarray(out[2][:1])
            if self._slice_pull:
                # Prewarm every slice-pull bucket shape (each distinct
                # slice length is one executable → one remote compile);
                # dispatch only, no pulls — a few ms of device copies.
                rec = out[3]
                k = _pull_bucket(1)
                slices = []
                while k < 2 * self.record_cap:
                    slices.append(rec[:k])
                    k = (k * 2 if k < (1 << 18)
                         else k + (1 << 17))  # _pull_bucket's ladder
                slices.append(rec[:2 * self.record_cap])
                for s in slices:
                    s.block_until_ready()
        except Exception:  # pragma: no cover - warmup must never fail a run
            # The dispatch may have DONATED the chained tile/count buffers
            # before failing; dropping the handles makes the next _hit_bufs
            # reallocate instead of reusing a deleted array.
            self._tiles_dev = self._cnts_dev = None

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

    def _get_fused(self, maxt: int, cap: int, batch: int = 0):
        """One jitted executable for kernel + record compaction: halves the
        per-chunk dispatch count (each enqueue costs ~1.3 ms of host time on
        the tunnel rig) and leaves the dirty-tile buffer internal to the
        executable. Cached at module level per (geometry, maxt, cap) — see
        _get_fused_global — so warm runs never recompile; cap growth
        recompiles once per growth, like the standalone compaction did."""
        if self._isolate and self.cfg.packing != 3:
            raise NotImplementedError(
                "isolate_models requires the SWAR kernel (packing=3) or the "
                "XLA backend")
        key = (maxt, cap, batch)
        fn = self._fused.get(key)
        if fn is None:
            fn = _get_fused_global(
                self.cfg.packing,
                self.W3 if self.cfg.packing == 3 else self.W, self.K, maxt,
                cap, bool(self.cfg.interpret), self._isolate,
                split=self._slice_pull, donate=self._donate, batch=batch,
                drain_bands=self._drain_bands,
                pack16=self._rec_pack and batch > 0)
            self._fused[key] = fn
        return fn

    def _hit_bufs(self, maxt: int):
        """The chained donated hit buffers for the fused executable: one
        (maxt, WS, 128) tile buffer + one (maxt, 8, 128) count sidecar,
        allocated once per sweep (maxt is constant across a run's uniform
        chunks) and rethreaded dispatch-to-dispatch — each call donates the
        previous dispatch's output handles, so exactly one tile buffer is
        live in HBM no matter the lookahead. If a handle is still consumed
        by an in-flight dispatch (overflow re-dispatch), the runtime falls
        back to a copy — contents are scratch, so that is merely a rare
        transient second buffer, never a correctness issue."""
        if (self._tiles_dev is None
                or self._tiles_dev.shape[0] != maxt):
            jnp = self.jnp
            WS = self.W3 // 128
            self._tiles_dev = jnp.zeros((maxt, WS, 128), jnp.int32)
            self._cnts_dev = jnp.zeros((maxt, 8, 128), jnp.int32)
        return self._tiles_dev, self._cnts_dev

    def _dispatch_fused(self, symw, scores_dev, istate, icarry, maxt: int,
                        reset_dev, cap: int):
        """(ostate, ocarry, packed records) — or (ostate, ocarry, header,
        records) in slice-pull mode — ONE device dispatch normally; two
        (kernel, then compaction) under HAVAC_FUSE=0 for A/B runs.

        The first call per (maxt, cap) this process traces + remote-compiles
        (blocking); its wall time is attributed to prof["compile"] so run
        phase tables separate compilation from steady-state dispatch."""
        key = (maxt, cap)
        first = key not in self._dispatched
        t0 = time.perf_counter() if first else 0.0
        if self._fuse:
            fn = self._get_fused(maxt, cap)
            if self.cfg.packing == 3 and not self._donate:
                out = fn(symw, scores_dev, istate, icarry, reset_dev)
            elif self.cfg.packing == 3:
                tiles, cnts = self._hit_bufs(maxt)
                if self._slice_pull:
                    (ostate, ocarry, header, rec, self._tiles_dev,
                     self._cnts_dev) = fn(symw, scores_dev, istate, icarry,
                                          reset_dev, tiles, cnts)
                    out = (ostate, ocarry, header, rec)
                else:
                    (ostate, ocarry, packed, self._tiles_dev,
                     self._cnts_dev) = fn(symw, scores_dev, istate, icarry,
                                          reset_dev, tiles, cnts)
                    out = (ostate, ocarry, packed)
            else:
                out = fn(symw, scores_dev, istate, icarry, reset_dev)
        else:
            if self.cfg.packing != 3:
                raise NotImplementedError("HAVAC_FUSE=0 requires packing=3")
            o = self._mod._ssv_swar_jit(
                symw, scores_dev, istate, icarry, reset_dev,
                block_words=self.W3, max_hit_tiles=maxt,
                interpret=self.cfg.interpret, isolate=self._isolate,
                drain_bands=self._drain_bands)
            if self._slice_pull:
                header, rec = self._compact_split(o[4], o[5], o[2], o[3][0],
                                                  cap=cap)
                out = (o[0], o[1], header, rec)
            else:
                packed = self._compact(o[4], o[5], o[2], o[3][0], cap=cap)
                out = (o[0], o[1], packed)
        if first:
            self.prof["compile"] += time.perf_counter() - t0
            self._dispatched.add(key)
        return out

    def _alloc_batch_bufs(self, maxt: int, cap: int):
        """One (hdrbuf, recbuf) accumulator set for the batched-pull flow,
        recycled across batches (the handles are donated into every chunk's
        dispatch; the host holds them only while a sealed batch is pulled).
        The free pool is cap-tagged — recbuf is sized batch·2·cap and a
        stale-cap set must never reach an executable compiled for a bigger
        cap (dynamic_update_slice would clamp and corrupt records)."""
        while self._batch_free:
            c, hb, rb = self._batch_free.pop()
            if c == cap:  # stale-cap sets are simply dropped
                return hb, rb
        jnp = self.jnp
        kb = self._pull_batch
        return (jnp.zeros((kb, 8 + maxt), jnp.int32),
                jnp.zeros((kb * self._chunk_slab(maxt, cap),), jnp.int32))

    def _chunk_slab(self, maxt: int, cap: int) -> int:
        """Worst-case record-slab ints appended per chunk: delta16 layout
        (words + packed deltas + bounded escapes) or legacy pairs."""
        if self._rec_pack:
            return round_up(
                cap + (cap + 1) // 2
                + _packed16_esc_cap(maxt, self._tile_words, cap), 8)
        return 2 * cap

    def _dispatch_batched(self, symw, scores_dev, istate, icarry, maxt: int,
                          reset_dev, cap: int, hdrbuf, recbuf, roff,
                          slot: int):
        """Batched-pull dispatch: ONE fused execution sweeps the chunk,
        compacts its records, and appends header + valid record prefix to
        the batch accumulators (see _get_fused_global's ``batch`` flow).
        Returns (ostate, ocarry, hdrbuf', recbuf', roff')."""
        key = ("batch", maxt, cap)
        first = key not in self._dispatched
        t0 = time.perf_counter() if first else 0.0
        fn = self._get_fused(maxt, cap, batch=self._pull_batch)
        tiles, cnts = self._hit_bufs(maxt)
        (ostate, ocarry, hdrbuf, recbuf, roff, self._tiles_dev,
         self._cnts_dev) = fn(symw, scores_dev, istate, icarry, reset_dev,
                              tiles, cnts, hdrbuf, recbuf, roff,
                              np.int32(slot))
        if first:
            self.prof["compile"] += time.perf_counter() - t0
            self._dispatched.add(key)
        return ostate, ocarry, hdrbuf, recbuf, roff

    def _decode_packed(self, packed: np.ndarray, n: int, cap: int, ri: int,
                       lo: int, Lc: int) -> Tuple[np.ndarray, np.ndarray]:
        """Pure-numpy record decode (collector-pool work item).

        Workers never touch jax: concurrent device calls from side threads
        contend with the main dispatch loop on the client, which measured
        ~100 ms per pull even for prefetched bytes — host-side decode of an
        already-pulled vector has no such contention."""
        t_decode = time.perf_counter()
        r0 = ri * self.rchunk
        Pc = min(self.P, r0 + self.rchunk) - r0
        if n == 0:
            if self._keyform:
                return self._finish_chunk_keys(
                    np.empty(0, np.int64), np.empty(0, np.int32), None, ri,
                    lo, Lc, t_decode)
            return self._finish_chunk(ri, np.empty(0, dtype=np.int64),
                                      np.empty(0, dtype=np.int64), t_decode)
        mt = packed.shape[0] - 1 - 2 * cap
        ometa_np = packed[1:1 + mt]
        idx = packed[1 + mt:1 + mt + n].astype(np.int64)
        words = packed[1 + mt + cap:1 + mt + cap + n]
        if self._keyform and self.cfg.packing == 3:
            return self._finish_chunk_keys(idx, np.ascontiguousarray(words),
                                           ometa_np, ri, lo, Lc, t_decode)
        slots = idx // self._tile_words
        word_idx = idx % self._tile_words
        ids = ometa_np[slots]
        S = self._scores_dev[ri].shape[0]
        if self.cfg.packing == 3:
            # sort=True: the per-chunk sort runs HERE, in the collector
            # pool, overlapped with the device sweep (free while the main
            # thread is device-bound in the gate) — the drain-time tail
            # then merges the k already-sorted runs per row group in
            # O(n·log k) instead of re-sorting O(n·log n) after the sweep.
            # nthreads=1: this runs on one of 4 collector-pool workers; the
            # native decode spawning its standalone default (4) on top
            # oversubscribes the ~8-effective-core VM (measured 30 ms/chunk
            # at genomic density vs 17 ms single-threaded per job).
            rows, pos = self._mod.decode_swar_flat(ids, word_idx, words, S,
                                                   self.W3, sort=True,
                                                   nthreads=1)
        else:
            from havac_tpu.hits.decode import decode_flat_records

            rows, pos = decode_flat_records(ids, word_idx, words, S, self.W,
                                            self.K)
        keep = (rows < Pc) & (pos < Lc)
        return self._finish_chunk(ri, rows[keep] + r0, pos[keep] + lo,
                                  t_decode)

    def _decode_split(self, header: np.ndarray, rec: np.ndarray, n: int,
                      ri: int, lo: int, Lc: int):
        """Slice-pull variant of :meth:`_decode_packed`: ``header`` is
        ``[nrec, ometa(maxt)]`` and ``rec`` holds interleaved (idx, word)
        pairs, of which the first ``n`` are valid (``rec`` may be a longer
        power-of-two bucket)."""
        t_decode = time.perf_counter()
        r0 = ri * self.rchunk
        Pc = min(self.P, r0 + self.rchunk) - r0
        if n == 0:
            if self._keyform:
                return self._finish_chunk_keys(
                    np.empty(0, np.int64), np.empty(0, np.int32), None, ri,
                    lo, Lc, t_decode)
            return self._finish_chunk(ri, np.empty(0, dtype=np.int64),
                                      np.empty(0, dtype=np.int64), t_decode)
        pairs = rec[:2 * n]
        idx = pairs[0::2].astype(np.int64)
        words = np.ascontiguousarray(pairs[1::2])
        if self._keyform:
            return self._finish_chunk_keys(idx, words, header[8:], ri, lo,
                                           Lc, t_decode)
        slots = idx // self._tile_words
        word_idx = idx % self._tile_words
        ids = header[8:][slots]
        S = self._scores_dev[ri].shape[0]
        # nthreads=1: collector-pool worker (see _decode_packed).
        rows, pos = self._mod.decode_swar_flat(ids, word_idx, words, S,
                                               self.W3, sort=True,
                                               nthreads=1)
        keep = (rows < Pc) & (pos < Lc)
        return self._finish_chunk(ri, rows[keep] + r0, pos[keep] + lo,
                                  t_decode)

    def _decode_packed16(self, header: np.ndarray, seg: np.ndarray, n: int,
                         n_esc: int, ri: int, lo: int, Lc: int):
        """delta16 variant of :meth:`_decode_split`: ``seg`` holds the
        chunk's [words(n), packed deltas(ceil(n/2)), escapes(n_esc)]
        segments (see :func:`_compact_tiles_packed16`)."""
        t_decode = time.perf_counter()
        r0 = ri * self.rchunk
        Pc = min(self.P, r0 + self.rchunk) - r0
        if n == 0:
            if self._keyform:
                return self._finish_chunk_keys(
                    np.empty(0, np.int64), np.empty(0, np.int32), None, ri,
                    lo, Lc, t_decode)
            return self._finish_chunk(ri, np.empty(0, dtype=np.int64),
                                      np.empty(0, dtype=np.int64), t_decode)
        idx, words = unpack_delta16(seg, n, n_esc)
        words = np.ascontiguousarray(words)
        if self._keyform:
            return self._finish_chunk_keys(idx, words, header[8:], ri, lo,
                                           Lc, t_decode)
        slots = idx // self._tile_words
        word_idx = idx % self._tile_words
        ids = header[8:][slots]
        S = self._scores_dev[ri].shape[0]
        # nthreads=1: collector-pool worker (see _decode_packed).
        rows, pos = self._mod.decode_swar_flat(ids, word_idx, words, S,
                                               self.W3, sort=True,
                                               nthreads=1)
        keep = (rows < Pc) & (pos < Lc)
        return self._finish_chunk(ri, rows[keep] + r0, pos[keep] + lo,
                                  t_decode)

    def _finish_chunk_keys(self, idx, words, ometa, ri: int, lo: int,
                           Lc: int, t_decode: float):
        """Key-form collector tail (round 5): one fused native pass expands
        this chunk's records to sorted global uint64 keys (bounds filter
        applied during expansion), then resolves them to int32 columns.
        Returns (ri, keys, None, (ResolvedHits, kept_keys, None)) — the
        ``None`` pos marks the key-form tuple for the tail/checkpoint
        consumers. nthreads=1: collector-pool worker (see _decode_packed)."""
        from havac_tpu.hits.decode import ResolvedHits

        r0 = ri * self.rchunk
        Pc = min(self.P, r0 + self.rchunk) - r0
        S = self._scores_dev[ri].shape[0]
        keys = self._native.chunk_keys_native(
            idx, words, ometa, self._tile_words, S, self.W3, Pc, Lc, r0, lo,
            nthreads=1)
        t_resolve = time.perf_counter()
        starts, lengths, prefix = self._resolve_tables
        si, sp, mi, mp, kept = self._native.resolve_keys_native(
            keys, starts, lengths, prefix, nthreads=1)
        res = (ResolvedHits(si, sp, mi, mp), kept, None)
        t_end = time.perf_counter()
        with self._prof_lock:
            self.prof["decode"] += t_resolve - t_decode
            self.prof["resolve"] += t_end - t_resolve
        return ri, keys, None, res

    def _finish_chunk(self, ri: int, rows: np.ndarray, pos: np.ndarray,
                      t_decode: float):
        """Collector-pool tail of one chunk: account decode time, then (when
        a resolver is installed) resolve this chunk's hits to local
        coordinates while the device sweeps later chunks."""
        t_resolve = time.perf_counter()
        res = None
        if self._resolve_fn is not None:
            res = self._resolve_fn(rows, pos)
        t_end = time.perf_counter()
        with self._prof_lock:
            self.prof["decode"] += t_resolve - t_decode
            self.prof["resolve"] += t_end - t_resolve
        return ri, rows, pos, res

    # ----------------------------------------------------------------- run

    def run(self, abort_event=None, progress=None, lookahead: int = None,
            checkpoint_cb=None, resume=None
            ) -> Optional[Tuple[np.ndarray, np.ndarray, float]]:
        """Full pipelined sweep; returns (rows, positions, resolved,
        sweep_seconds) or None if aborted. ``resolved`` is the globally
        sorted ResolvedHits table when a ``resolve_fn`` is installed — rows
        and positions are then returned as None (the raw per-chunk parts are
        retained on ``self.raw_parts`` for lazy materialization; memcpy
        bandwidth is the tail's scarce resource). Without a resolver,
        ``resolved`` is None and (rows, positions) are the globally
        (row, pos)-sorted arrays.

        Up to ``lookahead`` chunks are in flight. Per chunk the main loop
        dispatches the kernel + record compaction and schedules the packed
        vector's D2H (copy_to_host_async); the gate then pulls the OLDEST
        chunk's bytes on the main thread — ~0.3 ms once prefetched, and the
        natural device backpressure otherwise — and hands the pure-numpy
        decode to the collector pool. Workers never touch jax (see
        _decode_packed).

        ``checkpoint_cb(next_ci, carries (n_row, rchunk+1) int32, rows, pos)``
        is called after every completed column chunk (the pipeline drains at
        that boundary, trading some overlap for a consistent snapshot).
        ``resume`` is a prior callback payload ``(next_ci, carries, rows,
        pos)`` to continue from.
        """
        from concurrent.futures import ThreadPoolExecutor

        if lookahead is None:
            # Depth 3 hides the dispatch+pull round trip; HAVAC_LOOKAHEAD
            # is an A/B knob (with the donated tile buffer, depth no longer
            # multiplies HBM footprint).
            lookahead = self._lookahead
        elif not (self._fuse and self._donate):
            # Undonated A/B modes size the tile budget for _lookahead+1
            # live per-enqueue buffers (see __init__); a deeper explicit
            # request would overcommit HBM, so clamp it.
            lookahead = min(lookahead, self._lookahead)
        jnp = self.jnp
        t_start = time.perf_counter()
        futures: List = []
        pend: List = []  # (out, packed_dev, cap, ri, lo, Lc) awaiting pull
        done = 0
        start_ci = 0
        prev_col_carry: Dict[int, object] = {}
        results: List[Tuple[np.ndarray, np.ndarray]] = []
        if resume is not None:
            start_ci, carries, rows0, pos0 = resume
            for ri in range(self.n_row):
                prev_col_carry[ri] = jnp.asarray(carries[ri])
            # Checkpoint payloads span every row chunk; split them back into
            # per-ri entries so the drain-time group merge stays disjoint.
            gidx = np.minimum(rows0 // self.rchunk, self.n_row - 1)
            for ri in range(self.n_row):
                m = gidx == ri
                if not m.any() and ri:
                    continue
                rs, ps = rows0[m], pos0[m]
                # Parts must each be (row, pos)-sorted — the drain tail
                # merges sorted runs; the checkpoint payload interleaves
                # chunks, so re-sort this group's slice once here.
                rs, ps = sort_hit_pairs(rs, ps)
                if self._keyform:
                    from havac_tpu.hits.decode import ResolvedHits

                    keys = ((rs.astype(np.uint64) << np.uint64(38))
                            | ps.astype(np.uint64))
                    starts, lengths, prefix = self._resolve_tables
                    si, sp, mi, mp, kept = self._native.resolve_keys_native(
                        keys, starts, lengths, prefix, nthreads=8)
                    results.append((ri, keys, None,
                                    (ResolvedHits(si, sp, mi, mp), kept,
                                     None)))
                    continue
                res0 = (self._resolve_fn(rs, ps)
                        if self._resolve_fn is not None else None)
                results.append((ri, rs, ps, res0))
            done = start_ci * self.n_row

        # (The pre-fusion design started a warm_compact thread here to
        # overlap the separate compaction compile with the kernel compile;
        # the fused executable made that second compile disappear.)
        slice_pull = self._slice_pull
        pend2: List = []  # slice-pull stage B: (slice_dev, header, n, ...)

        with ThreadPoolExecutor(max_workers=4) as pool:

            def _wait_ready(arr):
                try:  # split the pull: device-bound wait vs byte fetch
                    while not arr.is_ready():
                        time.sleep(0.0005)
                except AttributeError:  # pragma: no cover - older jax
                    pass

            def _grow_cap(n, cap):
                # Rare: the chunk overflowed the record cap — grow it
                # and re-dispatch the fused chunk (its retained inputs
                # are in ``inputs``; one extra ~25 ms kernel run, at
                # most a handful of times per process as the cap
                # converges on the workload's density). Growth is 1.5× the
                # OBSERVED count, not a doubling of the cap: compaction
                # compute scales ~linearly with cap (17.3 ms at cap 110k
                # vs 4.2 ms at 25k, fusebench/compactbench), so the old
                # rule's 2× overshoot billed every subsequent chunk.
                self.record_cap = max(
                    self.record_cap,
                    round_up(max(n + n // 2, cap + 1024), 4096))
                _RECORD_CAP_HINTS[self._cap_key] = max(
                    _RECORD_CAP_HINTS.get(self._cap_key, 0), self.record_cap)
                self.overflow_retries += 1
                return self.record_cap

            def drain_one():
                if slice_pull:
                    return drain_header()
                inputs, packed_dev, cap, ri, lo, Lc = pend.pop(0)
                t0 = time.perf_counter()
                _wait_ready(packed_dev)
                t1 = time.perf_counter()
                packed = np.asarray(packed_dev)
                t2 = time.perf_counter()
                self.prof["ready_wait"] += t1 - t0
                self.prof["fetch"] += t2 - t1
                n = int(packed[0])
                while n > cap:
                    cap = _grow_cap(n, cap)
                    symw_i, istate_i, icarry_i, maxt_i = inputs
                    _, _, pk2 = self._dispatch_fused(
                        symw_i, self._scores_dev[ri], istate_i, icarry_i,
                        maxt_i, self._reset_dev[ri], cap)
                    packed = np.asarray(pk2)
                    n = int(packed[0])
                self.prof["pull"] += time.perf_counter() - t0
                futures.append(pool.submit(self._decode_packed, packed, n,
                                           cap, ri, lo, Lc))

            def drain_header():
                # Slice-pull stage A: pull the oldest chunk's small header,
                # then enqueue a bucketed prefix slice of its records and
                # its async D2H. Bucketing to powers of two bounds the
                # number of distinct slice shapes (each distinct shape is
                # one remote compile on this rig).
                inputs, hdr_dev, rec_dev, cap, ri, lo, Lc = pend.pop(0)
                t0 = time.perf_counter()
                _wait_ready(hdr_dev)
                t1 = time.perf_counter()
                header = np.asarray(hdr_dev)
                t2 = time.perf_counter()
                self.prof["ready_wait"] += t1 - t0
                self.prof["fetch"] += t2 - t1
                n = int(header[0])
                while n > cap:
                    cap = _grow_cap(n, cap)
                    symw_i, istate_i, icarry_i, maxt_i = inputs
                    _, _, h2, rec_dev = self._dispatch_fused(
                        symw_i, self._scores_dev[ri], istate_i, icarry_i,
                        maxt_i, self._reset_dev[ri], cap)
                    header = np.asarray(h2)
                    n = int(header[0])
                if n == 0:
                    self.prof["pull"] += time.perf_counter() - t0
                    futures.append(pool.submit(
                        self._decode_split, header,
                        np.empty(0, dtype=np.int32), 0, ri, lo, Lc))
                    return
                k = min(_pull_bucket(2 * n), 2 * cap)
                sl = rec_dev[:k]  # static bucketed slice → cached executable
                try:
                    sl.copy_to_host_async()
                except AttributeError:  # pragma: no cover - older jax
                    pass
                self.prof["pull"] += time.perf_counter() - t0
                pend2.append((sl, header, n, ri, lo, Lc))

            def drain_slice():
                # Slice-pull stage B: fetch the oldest prefix slice's bytes
                # and hand the pure-numpy decode to the collector pool.
                sl, header, n, ri, lo, Lc = pend2.pop(0)
                t0 = time.perf_counter()
                _wait_ready(sl)
                t1 = time.perf_counter()
                rec = np.asarray(sl)
                t2 = time.perf_counter()
                self.prof["ready_wait"] += t1 - t0
                self.prof["fetch"] += t2 - t1
                self.prof["pull"] += t2 - t0
                futures.append(pool.submit(self._decode_split, header, rec,
                                           n, ri, lo, Lc))

            def drain_ready_slices():
                # Opportunistic: collect any arrived slices without blocking.
                while pend2:
                    sl = pend2[0][0]
                    try:
                        if not sl.is_ready():
                            break
                    except AttributeError:  # pragma: no cover - older jax
                        break  # can't probe: leave to the bounded drains
                    drain_slice()

            # ---- batched-pull flow (HAVAC_PULL_BATCH, the default) ----
            # Every D2H transfer serializes with the execution stream on
            # this rig (~25 ms latency + bytes at ~40 MB/s,
            # benchmarks/pullprobe_v5e.json — worker-thread pulls do NOT
            # overlap either), so records accumulate ON DEVICE across
            # ``kb`` chunks and cross in TWO transfers per batch.
            kb = self._pull_batch
            cur_batch: List = []  # [hdrbuf, recbuf, roff, metas] or []
            pendb: List = []  # sealed batches awaiting their pull

            iota_hdrs: Dict[int, np.ndarray] = {}  # maxt -> synthetic header

            def seal_batch():
                hb, rb, _roff, metas, _bcap = cur_batch
                del cur_batch[:]
                # Only the 8-int header prefixes cross eagerly (256 B per
                # batch); the maxt-wide ometa rows are pulled lazily and
                # ONLY when some chunk was not fully dense (count < ntiles
                # ⇒ ometa differs from iota).
                hb8 = hb[:, :8]
                try:
                    hb8.copy_to_host_async()
                except AttributeError:  # pragma: no cover - older jax
                    pass
                pendb.append((hb, hb8, rb, metas))

            def redispatch_overflow(meta, n):
                # Rare: this chunk overflowed the record cap inside the
                # batch; its appended records are truncated garbage. Re-run
                # kernel+compaction at a grown cap as a single-chunk batch
                # and pull directly (blocking). The grown-cap batched
                # executable is compiled here and then serves every
                # subsequent batch, so the overflow path adds no extra
                # compile beyond the one cap growth forces anyway; overflow
                # converges to zero once the cap hint learns the density.
                inputs, ci_cap, ri, lo, Lc = meta
                symw_i, istate_i, icarry_i, maxt_i = inputs
                cap2 = _grow_cap(n, ci_cap)
                while True:
                    hb2, rb2 = self._alloc_batch_bufs(maxt_i, cap2)
                    o = self._dispatch_batched(
                        symw_i, self._scores_dev[ri], istate_i, icarry_i,
                        maxt_i, self._reset_dev[ri], cap2, hb2, rb2,
                        jnp.zeros((), jnp.int32), 0)
                    hdr2 = np.asarray(o[2])[0]
                    n2 = int(hdr2[0])
                    if n2 <= cap2:
                        sz = (_packed16_advance(n2, cap2, int(hdr2[2]))
                              if self._rec_pack else 2 * n2)
                        k2 = min(_pull_bucket(sz), rb2.shape[0])
                        rec2 = np.asarray(o[3][:k2])
                        self._batch_free.append((cap2, o[2], o[3]))
                        break
                    self._batch_free.append((cap2, o[2], o[3]))
                    cap2 = _grow_cap(n2, cap2)
                if self._rec_pack:
                    futures.append(pool.submit(
                        self._decode_packed16, hdr2, rec2, n2,
                        int(hdr2[2]), ri, lo, Lc))
                else:
                    futures.append(pool.submit(self._decode_split, hdr2,
                                               rec2, n2, ri, lo, Lc))

            def drain_batch():
                hb, hb8, rb, metas = pendb.pop(0)
                t0 = time.perf_counter()
                _wait_ready(hb8)
                t1 = time.perf_counter()
                headers8 = np.asarray(hb8)
                t2 = time.perf_counter()
                self.prof["ready_wait"] += t1 - t0
                self.prof["fetch"] += t2 - t1
                ns = headers8[:len(metas), 0].astype(np.int64)
                # Dense chunks (count == ntiles) allocated their slots in
                # grid order, so ometa ≡ iota and the maxt-wide header rows
                # need not cross the wire at all.
                headers = None
                if any(int(headers8[i, 1]) != meta[0][3]
                       for i, meta in enumerate(metas)):
                    _wait_ready(hb)
                    headers = np.asarray(hb)
                # Per-chunk record extents: the device advanced roff by the
                # CLAMPED layout advance per chunk (cap may differ per chunk
                # if it grew mid-batch), so offsets reconstruct exactly.
                pack = self._rec_pack
                offs = np.zeros(len(metas) + 1, dtype=np.int64)
                for i, meta in enumerate(metas):
                    nc = min(int(ns[i]), meta[1])
                    adv = (_packed16_advance(nc, meta[1],
                                             int(headers8[i, 2]))
                           if pack else 2 * nc)
                    offs[i + 1] = offs[i] + adv
                total = int(offs[-1])
                recs = np.empty(0, dtype=np.int32)
                if total:
                    k = min(_pull_bucket(total), rb.shape[0])
                    sl = rb[:k]
                    try:
                        sl.copy_to_host_async()
                    except AttributeError:  # pragma: no cover - older jax
                        pass
                    t3 = time.perf_counter()
                    _wait_ready(sl)
                    t4 = time.perf_counter()
                    recs = np.asarray(sl)
                    self.prof["ready_wait"] += t4 - t3
                    self.prof["fetch"] += time.perf_counter() - t4
                for i, meta in enumerate(metas):
                    inputs_i, ci_cap, ri, lo, Lc = meta
                    n = int(ns[i])
                    if n > ci_cap:
                        redispatch_overflow(meta, n)
                        continue
                    if headers is not None:
                        hdr_i = headers[i]
                    else:
                        maxt_i = inputs_i[3]
                        hdr_i = iota_hdrs.get(maxt_i)
                        if hdr_i is None:
                            hdr_i = np.concatenate(
                                [np.zeros(8, np.int32),
                                 np.arange(maxt_i, dtype=np.int32)])
                            iota_hdrs[maxt_i] = hdr_i
                    if pack:
                        futures.append(pool.submit(
                            self._decode_packed16, hdr_i,
                            recs[offs[i]:offs[i + 1]], n,
                            int(headers8[i, 2]), ri, lo, Lc))
                    else:
                        futures.append(pool.submit(
                            self._decode_split, hdr_i,
                            recs[offs[i]:offs[i + 1]], n, ri, lo, Lc))
                self.prof["pull"] += time.perf_counter() - t0
                # Recycle under the batch's cap tag (all chunks in a batch
                # dispatch at the cap the batch was opened with).
                self._batch_free.append((metas[0][1], hb, rb))

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
                    # occur (the record cap adapts in drain_one).
                    ntiles = B * self._scores_dev[ri].shape[0] * self._nflush
                    maxt = min(ntiles, self._maxt_cap)
                    t0 = time.perf_counter()
                    if kb:
                        # Batched-pull flow: the fused dispatch appends this
                        # chunk's header + record prefix to the device-side
                        # accumulators; nothing crosses to the host until
                        # the batch seals (two transfers per kb chunks).
                        if not cur_batch:
                            bcap = self.record_cap
                            hb0, rb0 = self._alloc_batch_bufs(maxt, bcap)
                            cur_batch[:] = [hb0, rb0,
                                            jnp.zeros((), jnp.int32), [],
                                            bcap]
                        bcap = cur_batch[4]
                        slot = len(cur_batch[3])
                        (ostate, ocarry, cur_batch[0], cur_batch[1],
                         cur_batch[2]) = self._dispatch_batched(
                            symw, self._scores_dev[ri], istate, icarry,
                            maxt, self._reset_dev[ri], bcap, cur_batch[0],
                            cur_batch[1], cur_batch[2], slot)
                        cur_batch[3].append(((symw, istate, icarry, maxt),
                                             bcap, ri, lo, Lc))
                        t1 = time.perf_counter()
                        self.prof["dispatch"] += t1 - t0
                        if len(cur_batch[3]) == kb:
                            seal_batch()
                        while len(pendb) >= 2:
                            drain_batch()  # bound batches in flight
                        self.prof["gate_wait"] += time.perf_counter() - t1
                        istate = ostate
                        col_carry[ri] = ocarry
                        done += 1
                        if progress is not None:
                            progress(done)
                        continue
                    # ONE fused dispatch runs the kernel and compacts its
                    # dirty tiles to records on device; the packed vector's
                    # D2H starts while the device sweeps the next chunk.
                    cap = self.record_cap
                    out = self._dispatch_fused(
                        symw, self._scores_dev[ri], istate, icarry, maxt,
                        self._reset_dev[ri], cap)
                    ostate, ocarry = out[0], out[1]
                    try:
                        out[2].copy_to_host_async()  # packed or header
                    except AttributeError:  # pragma: no cover - older jax
                        pass
                    t1 = time.perf_counter()
                    self.prof["dispatch"] += t1 - t0
                    if slice_pull:
                        pend.append(((symw, istate, icarry, maxt), out[2],
                                     out[3], cap, ri, lo, Lc))
                    else:
                        pend.append(((symw, istate, icarry, maxt), out[2],
                                     cap, ri, lo, Lc))
                    while len(pend) >= lookahead:
                        drain_one()  # bound buffers in flight
                    if slice_pull:
                        drain_ready_slices()
                        # Bound stage-B depth: a slice enqueued for chunk i
                        # lands behind the kernels already in flight, so a
                        # slightly deeper bound keeps the main thread from
                        # blocking on device progress it doesn't need yet.
                        while len(pend2) >= lookahead + 2:
                            drain_slice()
                    self.prof["gate_wait"] += time.perf_counter() - t1
                    istate = ostate  # chain row state on device
                    col_carry[ri] = ocarry  # chain carry on device
                    done += 1
                    if progress is not None:
                        progress(done)
                prev_col_carry = col_carry
                if checkpoint_cb is not None and ci + 1 < self.n_col:
                    if cur_batch:
                        seal_batch()  # flush the partial batch at the cut
                    while pendb:
                        drain_batch()
                    while pend:
                        drain_one()
                    while pend2:
                        drain_slice()
                    results += [f.result() for f in futures]
                    futures.clear()
                    carries = np.stack([np.asarray(prev_col_carry[ri])
                                        for ri in range(self.n_row)])
                    if self._keyform:
                        # Key-form tuples carry uint64 keys; the checkpoint
                        # payload stays int64 (rows, pos) for compatibility
                        # with resumes under either knob setting.
                        ks = [k for _, k, _, _ in results if k.size]
                        allk = (np.concatenate(ks) if ks
                                else np.empty(0, np.uint64))
                        pair = self._native.keys_to_pairs_native(allk)
                        if pair is None:  # pragma: no cover - lib vanished
                            pair = (allk >> np.uint64(38)).astype(np.int64), \
                                (allk & np.uint64((1 << 38) - 1)).astype(
                                    np.int64)
                        rows_s, pos_s = pair
                    else:
                        rows_s, pos_s = _concat_results(results, pool)
                    checkpoint_cb(ci + 1, carries, rows_s, pos_s)
            t_drain = time.perf_counter()
            if cur_batch:
                seal_batch()
            while pendb:
                drain_batch()
            while pend:
                drain_one()
            while pend2:
                drain_slice()
            results += [f.result() for f in futures]
            self.prof["drain"] += time.perf_counter() - t_drain

            t_tail = time.perf_counter()
            resolved = None
            # The tail runs AFTER the sweep (no dispatch loop to contend
            # with), so it gets its own wider pool: the group merges are
            # GIL-releasing numpy/native memcpy work and this VM's thread
            # pools reach ~8× there — the 4-worker collector pool left
            # half the tail's parallelism on the table (measured ~2.6 s
            # at the 150k point for ~350 MB of column moves).
            with ThreadPoolExecutor(max_workers=8) as tail_pool:
                if self._resolve_fn is not None:
                    # Chunks were resolved in the collector pool as the
                    # device swept; the tail fans per-row-chunk group sorts
                    # (disjoint row ranges) across the pool, each writing
                    # its slice of the preallocated result columns. Raw
                    # (rows, pos) are NOT materialized at all — memcpy
                    # bandwidth is the tail's scarce resource on this VM —
                    # the engine concatenates and sorts the retained
                    # per-chunk parts lazily if raw_hits() is ever queried.
                    resolved = _concat_resolved(results, self.n_row,
                                                tail_pool)
                    self.raw_parts = [(r, p) for _, r, p, _ in results]
                    rows = pos = None
                else:
                    rows, pos = _merge_results_sorted(results, self.n_row,
                                                      tail_pool)
            self.prof["tail_sort"] = time.perf_counter() - t_tail
        return rows, pos, resolved, time.perf_counter() - t_start
