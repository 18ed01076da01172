"""Pallas TPU SSV kernel — the accelerated DP engine.

TPU-native redesign of the reference's 12,288-PE systolic array
(`device/HavacHls.cpp:220-402`). The diagonal-only dependency means one model
row updates as a single vector op over a whole sequence block, so the "PE
array" becomes a (WS, 128)-shaped int32 state vector in VMEM (W = WS*128
positions, typically 32K — 2.7× the reference's segment width):

  per model row j:   shifted = shift_right_1(state, carry_in[j])
                     sum     = shifted + match(scores[j], symbols)
                     hit     = sum >= 256
                     state   = where(sum < 0 or hit, 0, sum)

Grid = (sequence blocks × row strips), block-major, mirroring the
HavacMainLoop/phmmVectorLoop nesting (`device/HavacHls.cpp:151,264`). The
boundary column between consecutive blocks — the reference's 22M-entry
score-queue FIFO (`device/HavacHls.cpp:451-465`) — is a double-buffered SMEM
scalar array: block b reads slot b%2 (written by block b-1) and writes slot
(b+1)%2. Left/right edge columns enter/leave the kernel as (P+1,) arrays,
which is exactly what crosses chips via `ppermute` in the sharded path.

Hits are accumulated as per-strip bitmaps (bit K-1-k of word i = hit at strip
row k, position i) and DMA'd to an HBM tile buffer *only for strips containing
at least one hit* — the TPU replacement for the reference's hierarchical FIFO
hit-filter tree (`device/HitReporting.cpp:58-417`). Overflow of the tile
buffer is detected via the returned count.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from havac_tpu.ops.common import HitTileOverflow, SsvKernelConfig, cdiv, round_up


def _shift_right_one(prev: jax.Array, col0: jax.Array) -> jax.Array:
    """Shift a (WS, 128) row-major position vector right by one position:
    out[p] = prev[p-1]. Lane roll + sublane-rolled fix for column 0; the
    wrapped value at position 0 is overridden by the carry injection."""
    rolled = pltpu.roll(prev, 1, 1)  # out[r, c] = prev[r, c-1]; col 0 wrong
    rolled_sub = pltpu.roll(rolled, 1, 0)  # [r, 0] = prev[r-1, 127]
    return jnp.where(col0, rolled_sub, rolled)


def _ssv_kernel(
    # inputs
    scores_smem,  # (1, K, 4) int32, strip-indexed
    sym_ref,  # (1, WS, 128) int8, block-indexed
    istate_ref,  # (1, WS, 128) int32, block-indexed
    icarry_ref,  # (ROWS1,) int32 SMEM, full
    # outputs
    ostate_ref,  # (1, WS, 128) int32, block-indexed
    ocarry_ref,  # (ROWS1,) int32 SMEM, full
    ometa_ref,  # (MAXT,) int32 SMEM, full
    ocount_ref,  # (1,) int32 SMEM
    otiles_ref,  # (MAXT, WS, 128) int32, HBM (ANY)
    # scratch
    state_ref,  # (WS, 128) int32 VMEM
    bits_ref,  # (WS, 128) int32 VMEM
    carry_ref,  # (2, ROWS1) int32 SMEM — the "score queue"
    b0_ref,  # (WS, 128) int32 VMEM — symbol bit 0
    b1_ref,  # (WS, 128) int32 VMEM — symbol bit 1
    cnt_ref,  # (1,) int32 SMEM
    dma_sem,
    *,
    K: int,
    WS: int,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    B = pl.num_programs(0)
    S = pl.num_programs(1)
    rslot = jax.lax.rem(b, 2)
    wslot = 1 - rslot

    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _init_run():
        cnt_ref[0] = 0

    @pl.when(s == 0)
    def _init_block():
        # Fresh DP row state for this block (row -1 values) + symbol bit planes.
        state_ref[:] = istate_ref[0]
        sym = sym_ref[0].astype(jnp.int32)
        b0_ref[:] = sym & 1
        b1_ref[:] = sym >> 1
        # carry[0] = S[-1][block tail] feeds row 0 of the *next* block.
        carry_ref[wslot, 0] = istate_ref[0, WS - 1, 127]

        @pl.when(b == B - 1)
        def _():
            ocarry_ref[0] = istate_ref[0, WS - 1, 127]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 0)
    col0 = col_ids == 0
    pos00 = jnp.logical_and(col0, row_ids == 0)
    b0m = b0_ref[:] != 0
    b1m = b1_ref[:] != 0

    # Statically unrolled row loop, state and bitmap carried as values so the
    # hot path has no per-row VMEM round trips or loop-index arithmetic.
    state = state_ref[:]
    bits = jnp.zeros_like(state)
    j0 = s * K
    is_first_block = b == 0
    for k in range(K):
        j = j0 + k
        m0 = scores_smem[0, k, 0]
        m1 = scores_smem[0, k, 1]
        m2 = scores_smem[0, k, 2]
        m3 = scores_smem[0, k, 3]
        match = jnp.where(b1m, jnp.where(b0m, m3, m2), jnp.where(b0m, m1, m0))

        shifted = _shift_right_one(state, col0)
        # Left-edge injection: block 0 reads the kernel-level input carry
        # (global left edge / left shard seam); later blocks read the previous
        # block's tail column from the score-queue double buffer.
        cin = jnp.where(is_first_block, icarry_ref[j], carry_ref[rslot, j])
        shifted = jnp.where(pos00, cin, shifted)

        ssum = shifted + match
        hit = ssum >= 256
        state = jnp.where(jnp.logical_or(ssum < 0, hit), 0, ssum)
        bits = bits * 2 + hit.astype(jnp.int32)

        tail = state[WS - 1, 127]
        carry_ref[wslot, j + 1] = tail
        # Unconditional: every block overwrites; the last block's values win.
        ocarry_ref[j + 1] = tail

    state_ref[:] = state
    bits_ref[:] = bits

    # Compact hit drain: only strips that actually hit reach HBM.
    any_hit = jnp.any(bits_ref[:] != 0)

    @pl.when(any_hit)
    def _drain():
        cnt = cnt_ref[0]
        slot = jnp.minimum(cnt, otiles_ref.shape[0] - 1)
        dma = pltpu.make_async_copy(bits_ref, otiles_ref.at[slot], dma_sem)
        dma.start()
        dma.wait()
        ometa_ref[slot] = b * S + s
        cnt_ref[0] = cnt + 1

    @pl.when(s == S - 1)
    def _emit_state():
        ostate_ref[0] = state_ref[:]

    @pl.when(jnp.logical_and(b == B - 1, s == S - 1))
    def _emit_count():
        ocount_ref[0] = cnt_ref[0]


@functools.partial(
    jax.jit, static_argnames=("block_width", "rows_per_strip", "max_hit_tiles", "interpret")
)
def _ssv_pallas_jit(
    sym_blocks,  # (B, WS, 128) int8
    scores_strips,  # (S, K, 4) int32
    istate_blocks,  # (B, WS, 128) int32
    icarry,  # (ROWS1,) int32
    *,
    block_width: int,
    rows_per_strip: int,
    max_hit_tiles: int,
    interpret: bool,
):
    B, WS, _ = sym_blocks.shape
    S, K, _ = scores_strips.shape
    rows1 = icarry.shape[0]
    maxt = max_hit_tiles

    grid = (B, S)
    kernel = functools.partial(_ssv_kernel, K=K, WS=WS)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda b, s: (s, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, WS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, WS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, WS, 128), jnp.int32),  # ostate
            jax.ShapeDtypeStruct((rows1,), jnp.int32),  # ocarry
            jax.ShapeDtypeStruct((maxt,), jnp.int32),  # ometa
            jax.ShapeDtypeStruct((1,), jnp.int32),  # ocount
            jax.ShapeDtypeStruct((maxt, WS, 128), jnp.int32),  # otiles
        ],
        scratch_shapes=[
            pltpu.VMEM((WS, 128), jnp.int32),  # state
            pltpu.VMEM((WS, 128), jnp.int32),  # bits
            pltpu.SMEM((2, rows1), jnp.int32),  # carry double-buffer
            pltpu.VMEM((WS, 128), jnp.int32),  # b0
            pltpu.VMEM((WS, 128), jnp.int32),  # b1
            pltpu.SMEM((1,), jnp.int32),  # tile count
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(scores_strips, sym_blocks, istate_blocks, icarry)
    return out



def ssv_pallas(
    symbols: np.ndarray,
    scores: np.ndarray,
    init_state: Optional[np.ndarray] = None,
    init_carry: Optional[np.ndarray] = None,
    config: SsvKernelConfig = SsvKernelConfig(),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-facing wrapper: pads, reshapes, runs the kernel, decodes hits.

    Returns (hit_rows, hit_positions, final_row_state (L,), final_carry (P+1,)).
    Hits are exact global coordinates, filtered to the unpadded (P, L) region.
    Chunk-chaining contracts (the engine guarantees both for non-final chunks):
      * ``final_row_state`` is meaningful iff P is a multiple of
        ``rows_per_strip`` (padded score rows would corrupt the row state);
      * ``final_carry`` is the boundary column at the *padded* block tail, so
        it is meaningful iff L is a multiple of ``block_width`` (column chunks
        must cut on block boundaries).
    """
    from havac_tpu.hits.decode import decode_hit_tiles

    W = config.block_width
    K = config.rows_per_strip
    WS = config.sublane_rows

    symbols = np.asarray(symbols, dtype=np.uint8)
    scores = np.asarray(scores, dtype=np.int8)
    L = symbols.shape[0]
    P = scores.shape[0]

    L2 = round_up(max(L, 1), W)
    P2 = round_up(max(P, 1), K)
    B = L2 // W
    S = P2 // K
    rows1 = P2 + 1

    sym_padded = np.zeros(L2, dtype=np.int8)
    sym_padded[:L] = symbols
    sym_blocks = sym_padded.reshape(B, WS, 128)

    scores_padded = np.full((P2, 4), -128, dtype=np.int32)
    scores_padded[:P] = scores.astype(np.int32)
    scores_strips = scores_padded.reshape(S, K, 4)

    istate = np.zeros(L2, dtype=np.int32)
    if init_state is not None:
        istate[:L] = np.asarray(init_state, dtype=np.int32)
    istate_blocks = istate.reshape(B, WS, 128)

    icarry = np.zeros(rows1, dtype=np.int32)
    if init_carry is not None:
        ic = np.asarray(init_carry, dtype=np.int32)
        icarry[: ic.shape[0]] = ic

    ostate, ocarry, ometa, ocount, otiles = _ssv_pallas_jit(
        jnp.asarray(sym_blocks),
        jnp.asarray(scores_strips),
        jnp.asarray(istate_blocks),
        jnp.asarray(icarry),
        block_width=W,
        rows_per_strip=K,
        max_hit_tiles=config.max_hit_tiles,
        interpret=config.interpret,
    )

    count = int(ocount[0])
    if count > config.max_hit_tiles:
        raise HitTileOverflow(
            f"{count} hit tiles exceed the configured max_hit_tiles="
            f"{config.max_hit_tiles}; rerun with a larger buffer"
        )

    tile_ids = np.asarray(ometa)
    tile_bitmaps = np.asarray(otiles[:count]).reshape(count, WS * 128)
    rows, positions = decode_hit_tiles(
        tile_ids, tile_bitmaps, count, S, W, K
    )
    keep = (rows < P) & (positions < L)
    rows, positions = rows[keep], positions[keep]

    final_state = np.asarray(ostate).reshape(L2)[:L]
    final_carry = np.asarray(ocarry)[: P + 1]
    return rows, positions, final_state, final_carry
