"""SWAR-packed Pallas TPU SSV kernel: 3 DP cells per 32-bit VPU lane.

The reference packs one DP cell per 8-bit adder and detects hits with the
adder's carry bit (`device/HavacHls.cpp:370-402`). The TPU VPU has 32-bit
lanes, so the TPU-native translation of that trick is SWAR: three cells per
lane in 10-bit fields, biased so field arithmetic never crosses field
boundaries and the hit/floor tests become single-bit probes:

    state  ∈ [0, 255]   (8 bits per field, unbiased)
    match_b = match + 256 ∈ [128, 383]
    w      = state + match_b ∈ [128, 638]   — fits 10 bits, no carry-out
    hit    ⟺ w ≥ 512 ⟺ bit 9 of the field  (true sum ≥ 256)
    keep   ⟺ w ∈ [256, 511] ⟺ bit 8 ∧ ¬bit 9 (true sum in [0, 255])
    state' = keep ? (w & 0xFF) : 0           (w mod 256 = true sum)

Packing is *split-block*: a block of W = 3·W3 positions stores position
f·W3 + w in field f of word w, so the shift-by-one-position is a single
lane/sublane roll of the packed vector, with one stitched lane at word 0
((rolled_sub << 10) | carry_in) covering all three sub-block seams and the
block-boundary carry injection at once.

The match-score gather (the reference's 12,288-way 4:1 mux,
`device/HavacHls.cpp:407-449`) becomes four indicator planes — ind_a[word]
has bit 0 of field f set iff that position's symbol is a — contracted with
the row's four biased scores by multiply-add; the planes are built once per
block from 2-bit symbols packed at field offsets.

Per-word cost ≈ 24 VPU ops for 3 cells (~8 ops/cell) versus ~13 ops/cell for
the unpacked kernel — measured ~1.7× on TPU v5e.

Everything else (grid order, SMEM score-queue double buffer, compact dirty
hit tiles, carry contracts) matches `ssv_pallas.py`. Hit bitmaps are packed:
bits field f, bit (9 − r) = hit at row base+r, position field f; strips of
K = 30 rows flush three 10-row bitmap tiles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from havac_tpu.ops.common import HitTileOverflow, hit_sort_order, round_up

FMASK = 0x00100401  # bit 0 of each 10-bit field
FIELD = 0x3FF
ROWS_PER_FLUSH = 10  # bitmap rows per field (10-bit fields)
ROWS_PER_STRIP = 30  # 3 flushes per strip


def pack_symbols(codes: np.ndarray, block_words: int) -> np.ndarray:
    """(B*W,) 2-bit codes → (B, WS, 128) packed words, W = 3·block_words.

    Field f of word w in block b holds codes[b·W + f·W3 + w].
    """
    W3 = block_words
    arr = np.asarray(codes, dtype=np.int32).reshape(-1, 3, W3)
    words = arr[:, 0] | (arr[:, 1] << 10) | (arr[:, 2] << 20)
    return words.reshape(-1, W3 // 128, 128)


def pack_state(state: np.ndarray, block_words: int) -> np.ndarray:
    """(B*W,) cell values [0,255] → (B, WS, 128) packed words."""
    W3 = block_words
    arr = np.asarray(state, dtype=np.int32).reshape(-1, 3, W3)
    words = arr[:, 0] | (arr[:, 1] << 10) | (arr[:, 2] << 20)
    return words.reshape(-1, W3 // 128, 128)


def unpack_state(packed: np.ndarray) -> np.ndarray:
    """(B, WS, 128) packed words → (B*W,) cell values."""
    B = packed.shape[0]
    w = np.asarray(packed, dtype=np.int64).reshape(B, -1)
    fields = np.stack([(w >> (10 * f)) & FIELD for f in range(3)], axis=1)
    return fields.reshape(-1)


def _ssv_swar_kernel(
    scores_smem,  # (1, K, 4) int32 biased (match + 256), strip-indexed
    symw_ref,  # (1, WS, 128) int32 packed symbols, block-indexed
    istate_ref,  # (1, WS, 128) int32 packed, block-indexed
    icarry_ref,  # (ROWS1,) int32 SMEM, full
    *refs,  # [reset_smem (ROWS,) SMEM iff isolate] + outputs + scratch
    K: int,
    WS: int,
    isolate: bool,
    card: int = 4,
    drain_bands: int = 1,
    debug_rows: bool = False,
    debug_drain: Optional[str] = None,
    emit_cnts: bool = True,
    cnt_mxu: bool = False,
):
    if isolate:
        reset_smem, *refs = refs
    orows_ref = None
    if debug_rows:
        (ostate_ref, ocarry_ref, ometa_ref, ocount_ref, otiles_ref,
         ocnts_ref, orows_ref, state_ref, bits_ref, carry_ref,
         *rest) = refs
    else:
        (ostate_ref, ocarry_ref, ometa_ref, ocount_ref, otiles_ref,
         ocnts_ref, state_ref, bits_ref, carry_ref, *rest) = refs
    ind_refs = tuple(rest[:card - 1])
    (cnt_ref, cntv_ref, dma_sem, nb_ref, mones_ref,
     mmask_ref) = rest[card - 1:]
    _ssv_swar_body(scores_smem, symw_ref, istate_ref, icarry_ref,
                   ostate_ref, ocarry_ref, ometa_ref, ocount_ref, otiles_ref,
                   ocnts_ref, state_ref, bits_ref, carry_ref, ind_refs,
                   cnt_ref, cntv_ref, dma_sem,
                   nb_ref, mones_ref, mmask_ref,
                   reset_smem if isolate else None, K=K, WS=WS,
                   isolate=isolate, card=card, drain_bands=drain_bands,
                   orows_ref=orows_ref, debug_drain=debug_drain,
                   emit_cnts=emit_cnts, cnt_mxu=cnt_mxu)


def _ssv_swar_body(
    scores_smem,
    symw_ref,
    istate_ref,
    icarry_ref,
    ostate_ref,  # (1, WS, 128) int32 packed, block-indexed
    ocarry_ref,  # (ROWS1,) int32 SMEM, full
    ometa_ref,  # (MAXT,) int32 SMEM, full
    ocount_ref,  # (1,) int32 SMEM
    otiles_ref,  # (MAXT, WS, 128) int32, HBM (ANY)
    ocnts_ref,  # (MAXT, 8, 128) int32, HBM (ANY) — per-sublane-row record
    #             counts: [slot, i, g] counts row i*(WS/8)+g (lane-padded)
    state_ref,  # (WS, 128) int32 VMEM
    bits_ref,  # (2, WS, 128) int32 VMEM — double-buffered DMA staging
    carry_ref,  # (2, ROWS1) int32 SMEM — the "score queue"
    ind_refs,  # (card-1)-tuple of (WS,128) int32 VMEM indicator planes
    cnt_ref,  # (1,) int32 SMEM
    cntv_ref,  # (2, 8, 128) int32 VMEM — count-block staging for the DMA
    dma_sem,  # (2, 2) DMA semaphores: [staging slot, bands|sidecar]
    nb_ref,  # (2,) int32 SMEM — dirty-band count per staging slot
    mones_ref,  # (128, 128) bf16 VMEM — all-ones MXU operand (cnt_mxu)
    mmask_ref,  # (WS, 128) f32 VMEM — lane-select mask (r % C == g)
    reset_smem,  # (ROWS,) int32 SMEM or None
    *,
    K: int,
    WS: int,
    isolate: bool,
    card: int = 4,  # alphabet cardinality (4 = nucleotide, 20 = amino):
    #   symbols occupy the low bits of each 10-bit field and the match
    #   gather generalizes to card-1 indicator planes (the reference is
    #   nucleotide-only, `README.md:2` — amino is capability beyond parity).
    drain_bands: int = 1,
    orows_ref=None,  # (1, K, WS, 128) VMEM debug output: packed state/row
    emit_cnts: bool = True,  # False skips the in-kernel count sidecar: the
    #   per-dirty-flush count compute + store measured 6.4-8.9 ms/chunk at
    #   the dense 150k geometry — the largest single fused-dispatch
    #   overhead (benchmarks/fuseladder_v5e.json, k-none vs k-cntcompute /
    #   k-b1-nc vs k-b1) — while the sidecar DMA itself is free. The
    #   XLA-side recompute from fully drained tiles (xla_tile_counts) was
    #   measured at 8.1 ms — WORSE than the in-kernel compute it replaces —
    #   so production paths keep emit_cnts=True; False remains the
    #   measurement rung that prices the sidecar. With False, ocnts is
    #   returned untouched (donated passthrough / uninitialized) and MUST
    #   NOT be read.
    debug_drain: Optional[str] = None,  # MEASUREMENT ONLY (tools/fuseladder):
    #   "sidecar" — count-sidecar DMA runs, tile band copies skipped (otiles
    #               contents are then stale garbage; the sidecar prefix
    #               structure stays real, so a fused compaction's timing is
    #               representative while its word values are meaningless);
    #   "none"    — no drain DMA at all (pure compute + slot bookkeeping).
    # Production paths must pass None.
    cnt_mxu: bool = False,  # Count-sidecar implementation A/B. The VPU
    #   lane reduce + (8, C) relayout costs ~0.55 µs per dirty flush (6.4
    #   ms/chunk dense, benchmarks/fuseladder_v5e.json k-b1-nc vs k-b1-vpu).
    #   The MXU form — nz @ ones(128,128) broadcasts row counts across
    #   lanes, a constant (r % C == g) mask keeps lane r % C, and a
    #   sublane-group sum lands the (8, 128) staging layout with no
    #   cross-lane VPU work — is exact (0/1 bf16 operands, integer sums
    #   ≤ 128, f32 accumulation) but MEASURED WORSE (68.9 vs 67.5 ms/chunk,
    #   fuseladder k-b1 vs k-b1-vpu): every count formulation (VPU, MXU,
    #   XLA re-read) costs ~6.5-8 ms/chunk, implicating a fixed per-flush
    #   dependency stall rather than the reduce itself. Kept as the
    #   measured-and-rejected rung; default stays the VPU reduce.
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    B = pl.num_programs(0)
    S = pl.num_programs(1)
    rslot = jax.lax.rem(b, 2)
    wslot = 1 - rslot
    nflush = K // ROWS_PER_FLUSH

    use_mxu_cnt = cnt_mxu and emit_cnts and debug_drain is None

    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _init_run():
        cnt_ref[0] = 0
        if use_mxu_cnt:
            mones_ref[:] = jnp.ones((128, 128), jnp.bfloat16)
            ri = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 1)
            mmask_ref[:] = (jax.lax.rem(ri, WS // 8) == ci).astype(
                jnp.float32)

    def _flush_counts_mxu(bits):
        """(8, 128) per-sublane-row nonzero-word counts of one bitmap tile
        ([i, g] counts row i·C+g; lanes ≥ C zero) — see the cnt_mxu note."""
        C = WS // 8
        nzb = (bits != 0).astype(jnp.bfloat16)
        s1 = jax.lax.dot_general(
            nzb, mones_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s2 = s1 * mmask_ref[:]
        return jnp.sum(s2.reshape(8, C, 128), axis=1).astype(jnp.int32)

    @pl.when(s == 0)
    def _init_block():
        state_ref[:] = istate_ref[0]
        w = symw_ref[0]
        fm = jnp.int32(FMASK)
        # Symbol values are (card-1).bit_length() bits wide per field; the
        # zero-field test OR-folds exactly that many bits onto bit 0 (the
        # nucleotide case keeps its original x | (x >> 1) sequence).
        nbits = max(1, (card - 1).bit_length())
        for a, ref in enumerate(ind_refs, start=1):
            x = w ^ jnp.int32(a * FMASK)  # field == 0 iff symbol == a
            nz = x
            sh = 1
            while sh < nbits:
                nz = nz | (nz >> sh)
                sh *= 2
            nz = nz & fm  # bit0 of field set iff field != 0
            ref[:] = nz ^ fm
        tail = (istate_ref[0, WS - 1, 127] >> 20) & FIELD
        carry_ref[wslot, 0] = tail

        @pl.when(b == B - 1)
        def _():
            ocarry_ref[0] = tail

    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _seed_queue():
        # Block 0 reads the kernel-level input carry; seeding the queue once
        # removes a per-row SMEM load + select from the hot loop.
        def body(j, _):
            carry_ref[0, j] = icarry_ref[j]
            return 0

        jax.lax.fori_loop(0, icarry_ref.shape[0], body, 0)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 0)
    col0 = col_ids == 0
    pos00 = jnp.logical_and(col0, row_ids == 0)
    i_planes = [ref[:] for ref in ind_refs]

    state = state_ref[:]
    bits = jnp.zeros_like(state)
    j0 = s * K
    fm = jnp.int32(FMASK)
    for k in range(K):
        j = j0 + k
        m0 = scores_smem[0, k, 0]
        # match = Σ_f mb[sym_f]·2^10f: splat the symbol-0 score to all three
        # fields on the scalar unit, then add indicator-masked deltas — an
        # exact integer identity (final field values < 1024, no carry-out).
        # card-1 fused multiply-adds per word (3 for nucleotide; 19 for
        # amino, where the reference has no path at all).
        match = m0 * fm
        for a, ia in enumerate(i_planes, start=1):
            match = match + ia * (scores_smem[0, k, a] - m0)

        rolled = pltpu.roll(state, 1, 1)
        rolled_sub = pltpu.roll(rolled, 1, 0)
        shifted = jnp.where(col0, rolled_sub, rolled)
        cin = carry_ref[rslot, j]
        stitch = (rolled_sub << 10) | cin
        shifted = jnp.where(pos00, stitch, shifted)
        if isolate:
            # Model-isolation: rows that start a new model take no incoming
            # diagonal state (scalar 0/1 multiply; compiled out when off).
            shifted = shifted * (1 - reset_smem[j])

        w = shifted + match
        t9 = w >> 9
        hit = t9 & fm
        bits = (bits << 1) | hit
        kmask = (w >> 8) & ~t9 & fm
        state = w & (kmask * 255)

        if orows_ref is not None:
            # byCellComparator debug mode: the production kernel's own packed
            # post-update state, every row (`byCellComparator.cpp:47-96`).
            orows_ref[0, k] = state

        # state words have bits 30-31 clear, so >> 20 is exactly field 2.
        tail = state[WS - 1, 127] >> 20
        carry_ref[wslot, j + 1] = tail

        if (k + 1) % ROWS_PER_FLUSH == 0:
            flush = k // ROWS_PER_FLUSH
            any_hit = jnp.any(bits != 0)
            NB = drain_bands
            PART = WS // NB  # multiple of 8 by _effective_drain_bands

            if debug_drain == "none":
                # Ladder level 0: no DMA at all — slot bookkeeping only, so
                # the grid's control flow (and ocount) match the real kernel.
                @pl.when(any_hit)
                def _bookkeep(flush=flush):
                    cnt = cnt_ref[0]
                    slot = jnp.minimum(cnt, otiles_ref.shape[0] - 1)
                    ometa_ref[slot] = (b * S + s) * nflush + flush
                    cnt_ref[0] = cnt + 1

                bits = jnp.zeros_like(state)
                continue

            if debug_drain in ("sidecar", "cntcompute", "sidecar-u"):
                # Ladder level 1: count sidecar computed (+ DMAed unless
                # "cntcompute") per dirty flush, tile band copies skipped.
                # "sidecar-u" hoists the count compute OUT of the @pl.when
                # (unconditional vector work; store + DMA stay conditional)
                # to price the conditional's effect on Mosaic's pipeline.
                C = WS // 8
                dma = debug_drain != "cntcompute"
                counts_u = None
                if debug_drain == "sidecar-u":
                    counts_u = jnp.sum(
                        (bits.reshape(8, C, 128) != 0).astype(jnp.int32),
                        axis=2)

                @pl.when(any_hit)
                def _sidecar_only(flush=flush, bits=bits, counts_u=counts_u):
                    cnt = cnt_ref[0]
                    d = jax.lax.rem(cnt, 2)
                    slot = jnp.minimum(cnt, otiles_ref.shape[0] - 1)

                    if dma:
                        @pl.when(cnt >= 2)
                        def _wait_prev():
                            pltpu.make_async_copy(
                                cntv_ref.at[d], ocnts_ref.at[slot],
                                dma_sem.at[d, 1]).wait()

                    counts = counts_u
                    if counts is None:
                        counts = jnp.sum(
                            (bits.reshape(8, C, 128) != 0).astype(jnp.int32),
                            axis=2)
                    if C != 128:
                        cntv_ref[d, :, 0:C] = counts
                    else:
                        cntv_ref[d] = counts
                    if dma:
                        pltpu.make_async_copy(cntv_ref.at[d],
                                              ocnts_ref.at[slot],
                                              dma_sem.at[d, 1]).start()
                    nb_ref[d] = 0
                    ometa_ref[slot] = (b * S + s) * nflush + flush
                    cnt_ref[0] = cnt + 1

                bits = jnp.zeros_like(state)
                continue

            @pl.when(any_hit)
            def _drain(flush=flush, bits=bits):
                # Double-buffered drain: staging slot d alternates per dirty
                # flush; the copies started here are waited only when slot d
                # comes around again (two dirty flushes later), so at dense
                # hit rates the DMAs overlap the next 10 rows of compute
                # instead of serializing the hot loop (the analog of the
                # reference's DATAFLOW hit-drain FIFOs,
                # `device/HitReporting.cpp:58-148`).
                #
                # BANDED (round 4): the tile is split into NB row bands and
                # only DIRTY bands are copied out. At the dense 150k point a
                # flush has ~5 scattered hit words in a 516 KB tile, so the
                # full-tile drain wrote ~6 GB/chunk of mostly-zero HBM
                # traffic (~7.5 ms/chunk at v5e bandwidth) to carry ~0.5 MB
                # of records. Skipped bands leave stale rows in the slot —
                # harmless by construction: the count sidecar (always
                # written, from this flush's real bits) is the only index
                # into the tile buffer, and compaction gathers exactly the
                # rows with nonzero counts, all of which belong to drained
                # bands. nb_ref remembers how many band copies were started
                # on each staging slot so the reuse path waits that many.
                cnt = cnt_ref[0]
                d = jax.lax.rem(cnt, 2)
                slot = jnp.minimum(cnt, otiles_ref.shape[0] - 1)

                @pl.when(cnt >= 2)
                def _wait_prev():
                    def wb(_, c):
                        pltpu.make_async_copy(
                            bits_ref.at[d, 0:PART],
                            otiles_ref.at[slot, 0:PART],
                            dma_sem.at[d, 0]).wait()
                        return c

                    jax.lax.fori_loop(0, nb_ref[d], wb, 0)
                    if emit_cnts:
                        pltpu.make_async_copy(
                            cntv_ref.at[d], ocnts_ref.at[slot],
                            dma_sem.at[d, 1]).wait()

                bits_ref[d] = bits
                if emit_cnts:
                    # Per-sublane-row nonzero-word counts, computed while
                    # the bits are still in registers: the host-side
                    # compaction's prefix structure comes straight from this
                    # small sidecar instead of a full read of the 2 GB tile
                    # buffer. Staged (8, WS/8)-within-(8, 128) so both the
                    # store and the DMA are tile-aligned — Mosaic rejects 1D
                    # stores/copies whose length is not a tile multiple.
                    # cnt_mxu computes it on the MXU (see _flush_counts_mxu);
                    # the legacy VPU lane reduce below is the A/B rung.
                    if use_mxu_cnt:
                        cntv_ref[d] = _flush_counts_mxu(bits)
                    else:
                        C = WS // 8
                        counts = jnp.sum(
                            (bits.reshape(8, C, 128) != 0).astype(jnp.int32),
                            axis=2)
                        if C != 128:
                            cntv_ref[d, :, 0:C] = counts
                        else:
                            cntv_ref[d] = counts
                if NB == 1:
                    pltpu.make_async_copy(bits_ref.at[d],
                                          otiles_ref.at[slot],
                                          dma_sem.at[d, 0]).start()
                    nb_ref[d] = 1
                else:
                    nb = jnp.int32(0)
                    for band in range(NB):
                        lo, hi = band * PART, (band + 1) * PART
                        dirty = jnp.any(bits[lo:hi] != 0)

                        @pl.when(dirty)
                        def _copy_band(lo=lo, hi=hi):
                            pltpu.make_async_copy(
                                bits_ref.at[d, lo:hi],
                                otiles_ref.at[slot, lo:hi],
                                dma_sem.at[d, 0]).start()

                        nb = nb + dirty.astype(jnp.int32)
                    nb_ref[d] = nb
                if emit_cnts:
                    pltpu.make_async_copy(cntv_ref.at[d], ocnts_ref.at[slot],
                                          dma_sem.at[d, 1]).start()
                ometa_ref[slot] = (b * S + s) * nflush + flush
                cnt_ref[0] = cnt + 1

            bits = jnp.zeros_like(state)

    state_ref[:] = state

    if debug_drain not in ("none", "cntcompute"):
        @pl.when(jnp.logical_and(b == B - 1, s == S - 1))
        def _drain_tail():
            # The last one or two dirty flushes still have DMAs in flight
            # (their waits would have run two dirty flushes later);
            # semaphores must be drained before the kernel exits. (In
            # "sidecar" debug mode nb_ref is 0 on every dirty flush, so the
            # band-wait loop is a no-op and only the sidecar sem drains.)
            cnt = cnt_ref[0]
            maxt = otiles_ref.shape[0]
            PART = WS // drain_bands

            def _wait_pair(c):
                d = jax.lax.rem(c, 2)
                slot = jnp.minimum(c, maxt - 1)

                def wb(_, carry):
                    pltpu.make_async_copy(bits_ref.at[d, 0:PART],
                                          otiles_ref.at[slot, 0:PART],
                                          dma_sem.at[d, 0]).wait()
                    return carry

                jax.lax.fori_loop(0, nb_ref[d], wb, 0)
                if emit_cnts:
                    pltpu.make_async_copy(cntv_ref.at[d], ocnts_ref.at[slot],
                                          dma_sem.at[d, 1]).wait()

            @pl.when(cnt >= 2)
            def _():
                _wait_pair(cnt - 2)

            @pl.when(cnt >= 1)
            def _():
                _wait_pair(cnt - 1)

    @pl.when(b == B - 1)
    def _emit_carry():
        # The kernel-level output carry is the LAST block's right edge;
        # copying it from the queue once per strip (scalar loop, off the
        # hot path) replaces a per-row SMEM store on every block.
        def body(k, _):
            ocarry_ref[j0 + k + 1] = carry_ref[wslot, j0 + k + 1]
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    @pl.when(s == S - 1)
    def _emit_state():
        ostate_ref[0] = state_ref[:]

    @pl.when(jnp.logical_and(b == B - 1, s == S - 1))
    def _emit_count():
        ocount_ref[0] = cnt_ref[0]


def _effective_drain_bands(WS: int, requested: Optional[int]) -> int:
    """Largest divisor of WS//8 that is <= the requested band count (so
    every band is a tile-aligned (PART, 128) slice, PART a multiple of 8).

    None = 1 (legacy full-tile drain). Banded drain leaves STALE rows in a
    slot's skipped bands, so it is only safe for consumers that index the
    tile buffer through the count sidecar (the engine's fused compaction);
    consumers that scan whole tiles for nonzero words
    (:func:`decode_swar_tiles`, the mesh paths' bitmap pulls) must keep the
    full-tile drain. The pipelined engine opts in explicitly."""
    if requested is None:
        return 1
    ws8 = WS // 8
    want = max(1, min(int(requested), ws8))
    for nb in range(want, 0, -1):
        if ws8 % nb == 0:
            return nb
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("block_words", "max_hit_tiles", "interpret", "isolate",
                     "debug_rows", "drain_bands", "debug_drain",
                     "emit_cnts", "cnt_mxu"),
)
def _ssv_swar_jit(
    symw_blocks,  # (B, WS, 128) int32 packed
    scores_strips,  # (S, K, 4) int32 biased
    istate_blocks,  # (B, WS, 128) int32 packed
    icarry,  # (ROWS1,) int32
    reset_rows_arr=None,  # (S·K,) int32, required when isolate=True
    tiles_buf=None,  # (maxt, WS, 128) int32 — donated, aliased to otiles
    cnts_buf=None,  # (maxt, 8, 128) int32 — donated, aliased to ocnts
    *,
    block_words: int,
    max_hit_tiles: int,
    interpret: bool,
    isolate: bool = False,
    debug_rows: bool = False,
    drain_bands: Optional[int] = None,
    debug_drain: Optional[str] = None,  # measurement ladder only, see body
    emit_cnts: bool = True,  # False: ocnts returned UNWRITTEN (see body)
    cnt_mxu: bool = False,  # True: MXU count rung (measured worse, see body)
):
    B, WS, _ = symw_blocks.shape
    S, K, card = scores_strips.shape
    rows1 = icarry.shape[0]
    maxt = max_hit_tiles
    if WS % 8 or WS // 8 > 128:
        raise ValueError(
            f"WS={WS} unsupported: the count sidecar stages (8, WS/8) "
            "blocks in one 128-lane tile, so WS must be a multiple of 8 "
            "and at most 1024 (block_width <= 393216)")
    if not 2 <= card <= 32:
        raise ValueError(
            f"cardinality {card} unsupported: symbols live in the low 5 "
            "bits of each 10-bit SWAR field and the match gather keeps "
            "card-1 indicator planes in VMEM")

    grid = (B, S)
    nbands = _effective_drain_bands(WS, drain_bands)
    kernel = functools.partial(_ssv_swar_kernel, K=K, WS=WS, isolate=isolate,
                               card=card, drain_bands=nbands,
                               debug_rows=debug_rows,
                               debug_drain=debug_drain, emit_cnts=emit_cnts,
                               cnt_mxu=cnt_mxu)
    if tiles_buf is not None:
        # The aliased inputs append two refs after [reset]; the kernel body
        # never reads them (aliasing only supplies the buffers), so drop
        # them before delegating.
        nin = 4 + (1 if isolate else 0)
        inner_kernel = kernel

        def kernel(*refs):  # noqa: F811 - deliberate wrapper
            inner_kernel(*refs[:nin], *refs[nin + 2:])
    in_specs = [
        pl.BlockSpec((1, K, card), lambda b, s: (s, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, WS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, WS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [scores_strips, symw_blocks, istate_blocks, icarry]
    if isolate:
        if reset_rows_arr is None:
            reset_rows_arr = jnp.zeros(S * K, jnp.int32)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(reset_rows_arr)
    # Optional donated hit buffers: otiles/ocnts are the kernel's largest
    # outputs (the tile buffer is sized by the engine's multi-GB budget);
    # without aliasing each enqueued dispatch allocates a FRESH buffer at
    # enqueue time, so a lookahead-k pipeline holds k of them live in HBM.
    # Aliasing them to caller-owned buffers (donated by the engine's fused
    # jit and rethreaded dispatch-to-dispatch) keeps exactly one copy live.
    # Stale contents are harmless ONLY under the sidecar-indexing contract:
    # with drain_bands > 1 a live slot is PARTIALLY written (dirty bands
    # only), so rethreaded buffers retain rows from previous chunks in the
    # skipped bands. The count sidecar (always fully written per live slot,
    # from this execution's real bits) is the sole valid index into the tile
    # buffer — compaction gathers exactly the rows with nonzero counts, all
    # of which belong to drained bands. Consumers that scan whole live slots
    # (decode_swar_tiles, mesh bitmap pulls) require drain_bands=1; see
    # _effective_drain_bands.
    io_aliases = {}
    if tiles_buf is not None:
        nin_base = len(inputs)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(tiles_buf)
        inputs.append(cnts_buf)
        io_aliases = {nin_base: 4, nin_base + 1: 5}
    out_specs = [
        pl.BlockSpec((1, WS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, WS, 128), jnp.int32),  # ostate
        jax.ShapeDtypeStruct((rows1,), jnp.int32),  # ocarry
        jax.ShapeDtypeStruct((maxt,), jnp.int32),  # ometa
        jax.ShapeDtypeStruct((1,), jnp.int32),  # ocount
        jax.ShapeDtypeStruct((maxt, WS, 128), jnp.int32),  # otiles
        jax.ShapeDtypeStruct((maxt, 8, 128), jnp.int32),  # ocnts
    ]
    if debug_rows:
        # Per-row packed state dump (byCellComparator mode; small inputs
        # only — this is O(rows · block) memory).
        out_specs.append(pl.BlockSpec(
            (1, K, WS, 128), lambda b, s: (b, s, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((B, S * K, WS, 128), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        scratch_shapes=[
            pltpu.VMEM((WS, 128), jnp.int32),  # state
            pltpu.VMEM((2, WS, 128), jnp.int32),  # bits double-buffer
            pltpu.SMEM((2, rows1), jnp.int32),  # carry double-buffer
        ] + [
            pltpu.VMEM((WS, 128), jnp.int32)  # card-1 indicator planes
            for _ in range(card - 1)
        ] + [
            pltpu.SMEM((1,), jnp.int32),  # tile count
            pltpu.VMEM((2, 8, 128), jnp.int32),  # count-block DMA staging
            pltpu.SemaphoreType.DMA((2, 2)),  # per-slot (bands, sidecar) sems
            pltpu.SMEM((2,), jnp.int32),  # dirty-band count per slot
            pltpu.VMEM((128, 128), jnp.bfloat16),  # MXU ones (cnt_mxu)
            pltpu.VMEM((WS, 128), jnp.float32),  # lane-select mask (cnt_mxu)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(*inputs)
    return out


def xla_tile_counts(otiles):
    """Per-sublane-row nonzero-word counts computed in XLA from FULLY
    drained tiles: (maxt, WS, 128) → (maxt, 8, WS//8), [slot, i, g] counts
    row i·(WS//8)+g — the kernel ocnts sidecar's contract (sans lane
    padding; :func:`_compact_tiles_core` slices to WS//8 lanes anyway).

    Pairs with ``emit_cnts=False``. MEASURED AND REJECTED as the production
    count source: the full-buffer reduce costs 8.1 ms/chunk at the dense
    150k geometry (252 GB/s effective over the 2 GB buffer) vs 6.4 ms for
    the kernel's in-register count it would replace
    (benchmarks/fuseladder_v5e.json xc-b1 / f-b1-xc rungs) — kept as the
    measurement rung and for consumers without kernel counts. Valid ONLY
    under drain_bands=1 (banded drains leave stale rows inside live slots
    that this full-buffer reduce would count). Stale slots ≥ ocount are
    fine: compaction masks whole slots by the count exactly as it does for
    stale sidecar entries."""
    import jax.numpy as jnp

    maxt, WS, _ = otiles.shape
    return jnp.sum((otiles.reshape(maxt, 8, WS // 8, 128) != 0)
                   .astype(jnp.int32), axis=3)


def decode_swar_tiles(
    tile_ids: np.ndarray,
    tile_words: np.ndarray,
    count: int,
    num_strips: int,
    block_words: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Packed dirty tiles → (global rows, global positions), sorted.

    ``tile_ids[t] = (block·S + strip)·3 + flush``; ``tile_words[t]`` is the
    (WS·128,) packed bitmap: field f, bit (9−r) = hit at row
    (strip·30 + flush·10 + r), position (block·W + f·W3 + word).
    """
    if count == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ids = np.asarray(tile_ids[:count], dtype=np.int64)
    wm = np.asarray(tile_words[:count]).view(np.uint32).reshape(count, -1)
    W3 = block_words
    W = 3 * W3
    nf = ROWS_PER_FLUSH
    tile_idx, word_idx = np.nonzero(wm)
    if tile_idx.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    words = wm[tile_idx, word_idx]
    flat = ids[tile_idx]
    flush = flat % 3
    bs = flat // 3
    blocks = bs // num_strips
    strips = bs % num_strips
    row_base = strips * ROWS_PER_STRIP + flush * nf
    rows_out = []
    pos_out = []
    for f in range(3):
        for r in range(nf):
            sel = ((words >> np.uint32(10 * f + nf - 1 - r)) & np.uint32(1)).astype(bool)
            if sel.any():
                rows_out.append(row_base[sel] + r)
                pos_out.append(blocks[sel] * W + f * W3 + word_idx[sel])
    rows = np.concatenate(rows_out)
    positions = np.concatenate(pos_out)
    order = hit_sort_order(rows, positions)
    return rows[order], positions[order]



def ssv_swar(
    symbols: np.ndarray,
    scores: np.ndarray,
    init_state: Optional[np.ndarray] = None,
    init_carry: Optional[np.ndarray] = None,
    block_width: int = 129024,
    max_hit_tiles: int = 512,
    interpret: bool = False,
    reset_rows: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-facing wrapper, same contract as :func:`ssv_pallas.ssv_pallas`.

    ``block_width`` must be a multiple of 3·1024 (three lane-aligned thirds).
    Chunk-chaining: ``final_row_state`` valid iff P % 30 == 0; ``final_carry``
    valid iff L % block_width == 0.
    """
    W = block_width
    if W % 3072:
        raise ValueError("block_width must be a multiple of 3072")
    if W > 393216:
        raise ValueError(
            "block_width must be <= 393216: the kernel's count sidecar "
            "stages (8, WS/8) blocks in a 128-lane tile (use more blocks "
            "instead of wider ones; throughput is flat in B)")
    W3 = W // 3
    WS = W3 // 128
    K = ROWS_PER_STRIP

    symbols = np.asarray(symbols, dtype=np.uint8)
    scores = np.asarray(scores, dtype=np.int8)
    L = symbols.shape[0]
    P = scores.shape[0]

    L2 = round_up(max(L, 1), W)
    P2 = round_up(max(P, 1), K)
    B = L2 // W
    S = P2 // K
    rows1 = P2 + 1

    sym_padded = np.zeros(L2, dtype=np.uint8)
    sym_padded[:L] = symbols
    symw_blocks = pack_symbols(sym_padded, W3)

    card = scores.shape[1]
    scores_padded = np.full((P2, card), -128, dtype=np.int32)
    scores_padded[:P] = scores.astype(np.int32)
    scores_strips = (scores_padded + 256).reshape(S, K, card)

    istate = np.zeros(L2, dtype=np.int32)
    if init_state is not None:
        istate[:L] = np.asarray(init_state, dtype=np.int32)
    istate_blocks = pack_state(istate, W3)

    icarry = np.zeros(rows1, dtype=np.int32)
    if init_carry is not None:
        ic = np.asarray(init_carry, dtype=np.int32)
        icarry[: ic.shape[0]] = ic

    reset_arr = None
    isolate = reset_rows is not None
    if isolate:
        rr = np.zeros(P2, dtype=np.int32)
        rr[:P] = np.asarray(reset_rows, dtype=np.int32)
        reset_arr = jnp.asarray(rr)
    ostate, ocarry, ometa, ocount, otiles, _ocnts = _ssv_swar_jit(
        jnp.asarray(symw_blocks),
        jnp.asarray(scores_strips),
        jnp.asarray(istate_blocks),
        jnp.asarray(icarry),
        reset_arr,
        block_words=W3,
        max_hit_tiles=max_hit_tiles,
        interpret=interpret,
        isolate=isolate,
    )

    count = int(ocount[0])
    if count > max_hit_tiles:
        raise HitTileOverflow(
            f"{count} hit tiles exceed max_hit_tiles={max_hit_tiles}")

    if count:
        rows, positions = decode_swar_tiles(
            np.asarray(ometa), np.asarray(otiles[:count]).reshape(count, -1),
            count, S, W3)
    else:
        rows = positions = np.empty(0, dtype=np.int64)
    keep = (rows < P) & (positions < L)
    rows, positions = rows[keep], positions[keep]

    final_state = unpack_state(np.asarray(ostate))[:L]
    final_carry = np.asarray(ocarry)[: P + 1]
    return rows, positions, final_state, final_carry


def decode_swar_flat(
    tile_ids_per_entry: np.ndarray,
    word_idx: np.ndarray,
    words: np.ndarray,
    num_strips: int,
    block_words: int,
    sort: bool = True,
    nthreads: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Flat record decode: entry e is bitmap word ``words[e]`` at position
    ``word_idx[e]`` of the tile whose id is ``tile_ids_per_entry[e]``
    (id = (block·S + strip)·3 + flush, as in :func:`decode_swar_tiles`).

    ``sort=False`` returns the pairs UNORDERED (implementation-defined
    order): the engine's sweep paths re-sort the merged chunks globally, so
    sorting each chunk here was pure double work — at genomic hit density
    the per-chunk sort dominated decode time.

    ``nthreads`` caps the native decode's own thread spawns; callers that
    fan chunks across a pool must pass 1 (see CLAUDE.md: nested spawns
    measured 8-24 s stalls on this 1-core VM). The default suits
    main-thread calls only."""
    if words.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    try:
        from havac_tpu import native

        out = native.decode_swar_flat_native(
            tile_ids_per_entry, word_idx, words, num_strips, block_words,
            sort=sort, nthreads=nthreads)
        if out is not None:
            return out
    except Exception:  # pragma: no cover - fall back to numpy
        pass
    words = np.asarray(words).view(np.uint32)
    flat = np.asarray(tile_ids_per_entry, dtype=np.int64)
    word_idx = np.asarray(word_idx, dtype=np.int64)
    W3 = block_words
    W = 3 * W3
    nf = ROWS_PER_FLUSH
    flush = flat % 3
    bs = flat // 3
    blocks = bs // num_strips
    strips = bs % num_strips
    row_base = strips * ROWS_PER_STRIP + flush * nf
    rows_out, pos_out = [], []
    for f in range(3):
        for r in range(nf):
            sel = ((words >> np.uint32(10 * f + nf - 1 - r)) & np.uint32(1)).astype(bool)
            if sel.any():
                rows_out.append(row_base[sel] + r)
                pos_out.append(blocks[sel] * W + f * W3 + word_idx[sel])
    rows = np.concatenate(rows_out)
    positions = np.concatenate(pos_out)
    if not sort:
        return rows, positions
    order = hit_sort_order(rows, positions)
    return rows[order], positions[order]
