"""Per-cell DP equivalence: the byCellComparator analog (SURVEY.md §4.2).

The reference's strongest correctness tool instruments both implementations
to record every DP cell and compares exhaustively
(`test/byCellComparator/byCellComparator.cpp:47-96`). Here, each backend can
produce the full (P × L) post-update state matrix for small inputs:

  * oracle  — ssv_reference(return_matrix=True), the scalar golden model;
  * xla     — lax.scan over rows collecting every row state;
  * pallas  — the unpacked kernel driven row-by-row (rows_per_strip=1),
              reading final_row_state after each row: the exact state the
              compiled kernel computes, cell for cell;
  * swar    — the production SWAR kernel in ``debug_rows`` mode: the kernel
              itself dumps its packed post-update state after every row, so
              the shipping implementation (not a stand-in) is compared cell
              for cell, like the reference's per-cell hooks in the live
              device code (`device/HavacHls.cpp:388-399`).

``compare_matrices`` reports the first mismatching cells like the
reference's comparator printout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from havac_tpu.ops.reference import ssv_reference


def dp_matrix_oracle(symbols: np.ndarray, scores: np.ndarray) -> np.ndarray:
    _, matrix = ssv_reference(symbols, scores, return_matrix=True)
    return matrix


def dp_matrix_xla(symbols: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Full state matrix via a jitted scan (rows as scan steps)."""
    import jax
    import jax.numpy as jnp

    symbols = np.asarray(symbols, dtype=np.uint8)
    scores = np.asarray(scores, dtype=np.int8)
    L = symbols.shape[0]
    onehot = jax.nn.one_hot(jnp.asarray(symbols, jnp.int32), 4, dtype=jnp.int32)

    def row_step(row, score_row):
        m = onehot @ score_row
        shifted = jnp.roll(row, 1).at[0].set(0)
        s = shifted + m
        hit = s >= 256
        row = jnp.where(jnp.logical_or(s < 0, hit), 0, s)
        return row, row

    _, states = jax.lax.scan(
        row_step, jnp.zeros(L, jnp.int32),
        jnp.asarray(scores, jnp.int32))
    return np.asarray(states)


def dp_matrix_pallas(
    symbols: np.ndarray, scores: np.ndarray, interpret: bool = True
) -> np.ndarray:
    """Full state matrix from the production Pallas kernel, one row per
    dispatch (debug-only: O(P) dispatches)."""
    from havac_tpu.ops.common import SsvKernelConfig
    from havac_tpu.ops.ssv_pallas import ssv_pallas

    symbols = np.asarray(symbols, dtype=np.uint8)
    scores = np.asarray(scores, dtype=np.int8)
    P = scores.shape[0]
    L = symbols.shape[0]
    cfg = SsvKernelConfig(block_width=1024, rows_per_strip=1,
                          max_hit_tiles=max(256, 2 * P), interpret=interpret)
    matrix = np.zeros((P, L), dtype=np.int32)
    state: Optional[np.ndarray] = None
    for j in range(P):
        _, _, state, _ = ssv_pallas(symbols, scores[j:j + 1],
                                    init_state=state, config=cfg)
        matrix[j] = state[:L]
    return matrix


def dp_matrix_swar(
    symbols: np.ndarray,
    scores: np.ndarray,
    init_carry: Optional[np.ndarray] = None,
    reset_rows: Optional[np.ndarray] = None,
    interpret: bool = True,
    block_width: int = 3072,
) -> np.ndarray:
    """Full state matrix from the production SWAR kernel — the exact code
    path that ships (3 cells/lane, K=30 strips, SMEM score queue), run with
    ``debug_rows=True`` so the kernel itself dumps its packed post-update
    state after every row (`byCellComparator.cpp:47-96` instruments the
    shipping implementation the same way). One dispatch; rows beyond P are
    padding and dropped."""
    import jax.numpy as jnp

    from havac_tpu.ops.common import round_up
    from havac_tpu.ops.ssv_swar import (
        ROWS_PER_STRIP,
        _ssv_swar_jit,
        pack_symbols,
        unpack_state,
    )

    symbols = np.asarray(symbols, dtype=np.uint8)
    scores = np.asarray(scores, dtype=np.int8)
    L = symbols.shape[0]
    P = scores.shape[0]
    W = block_width
    if W % 3072:
        raise ValueError("block_width must be a multiple of 3072")
    W3 = W // 3
    K = ROWS_PER_STRIP
    L2 = round_up(max(L, 1), W)
    P2 = round_up(max(P, 1), K)
    B, S = L2 // W, P2 // K

    sym_padded = np.zeros(L2, dtype=np.uint8)
    sym_padded[:L] = symbols
    scores_padded = np.full((P2, 4), -128, dtype=np.int32)
    scores_padded[:P] = scores.astype(np.int32)
    icarry = np.zeros(P2 + 1, dtype=np.int32)
    if init_carry is not None:
        ic = np.asarray(init_carry, dtype=np.int32)
        icarry[: ic.shape[0]] = ic
    reset_arr = None
    isolate = reset_rows is not None
    if isolate:
        rr = np.zeros(P2, dtype=np.int32)
        rr[:P] = np.asarray(reset_rows, dtype=np.int32)
        reset_arr = jnp.asarray(rr)

    out = _ssv_swar_jit(
        jnp.asarray(pack_symbols(sym_padded, W3)),
        jnp.asarray((scores_padded + 256).reshape(S, K, 4)),
        jnp.zeros((B, W3 // 128, 128), jnp.int32),
        jnp.asarray(icarry),
        reset_arr,
        block_words=W3,
        max_hit_tiles=max(12, B * S * 3),
        interpret=interpret,
        isolate=isolate,
        debug_rows=True,
    )
    orows = np.asarray(out[6])  # (B, P2, WS, 128) packed
    matrix = np.empty((P, L), dtype=np.int32)
    for j in range(P):
        matrix[j] = unpack_state(orows[:, j])[:L]
    return matrix


@dataclass
class CellMismatch:
    row: int
    position: int
    expected: int
    actual: int


def compare_matrices(
    expected: np.ndarray, actual: np.ndarray, max_report: int = 16
) -> List[CellMismatch]:
    """Exhaustive cell comparison; returns up to ``max_report`` mismatches
    (empty = bit-exact equivalence)."""
    expected = np.asarray(expected)
    actual = np.asarray(actual)
    if expected.shape != actual.shape:
        raise ValueError(f"shape mismatch {expected.shape} vs {actual.shape}")
    rows, cols = np.nonzero(expected != actual)
    return [
        CellMismatch(int(r), int(c), int(expected[r, c]), int(actual[r, c]))
        for r, c in zip(rows[:max_report], cols[:max_report])
    ]
