"""SWAR-packed Pallas SSV kernel (interpret mode on CPU) vs the numpy oracle.

Same semantic matrix as test_ssv_pallas (multi-block carries, chunk chaining,
overflow, planted fixture) plus SWAR-specific cases: field-boundary stitching
at the three sub-block seams, packed-bitmap decode across flush groups, and
pack/unpack round trips.
"""

import numpy as np
import pytest

from havac_tpu.ops.reference import ssv_reference
from havac_tpu.ops.ssv_swar import (
    ROWS_PER_STRIP,
    HitTileOverflow,
    pack_state,
    pack_symbols,
    ssv_swar,
    unpack_state,
)

# Smallest legal geometry: 3 sub-blocks of 1024 positions.
BW = 3072


def random_case(seed, L, P, lo=-40, hi=120):
    rng = np.random.default_rng(seed)
    symbols = rng.integers(0, 4, size=L).astype(np.uint8)
    scores = rng.integers(lo, hi, size=(P, 4)).astype(np.int8)
    return symbols, scores


def run(symbols, scores, **kw):
    kw.setdefault("block_width", BW)
    kw.setdefault("interpret", True)
    return ssv_swar(symbols, scores, **kw)


def check_against_oracle(symbols, scores, expect_hits=True, **kw):
    expected, _ = ssv_reference(symbols, scores)
    exp_set = set(zip(expected.hit_rows.tolist(), expected.hit_positions.tolist()))
    rows, pos, state, carry = run(symbols, scores, **kw)
    got = set(zip(rows.tolist(), pos.tolist()))
    assert got == exp_set
    if expect_hits:
        assert len(exp_set) > 0
    if scores.shape[0] % ROWS_PER_STRIP == 0:
        np.testing.assert_array_equal(state, expected.final_row_state)
    if (
        symbols.shape[0] % kw.get("block_width", BW) == 0
        and scores.shape[0] % ROWS_PER_STRIP == 0
    ):
        np.testing.assert_array_equal(carry, expected.final_carry)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 256, size=2 * BW).astype(np.int32)
    packed = pack_state(vals, BW // 3)
    assert packed.shape == (2, BW // 3 // 128, 128)
    np.testing.assert_array_equal(unpack_state(packed), vals)
    codes = rng.integers(0, 4, size=BW).astype(np.uint8)
    np.testing.assert_array_equal(
        unpack_state(pack_symbols(codes, BW // 3)), codes)


def test_single_block_multi_strip():
    symbols, scores = random_case(0, BW, 60)
    check_against_oracle(symbols, scores)


def test_field_seam_chains():
    """Monotone-rising chains cross both intra-block field seams (positions
    W3 and 2*W3) and the block boundary — exercises the stitched lane."""
    rng = np.random.default_rng(1)
    symbols = rng.integers(0, 4, size=2 * BW).astype(np.uint8)
    scores = np.full((64, 4), 5, dtype=np.int8)
    check_against_oracle(symbols, scores)


def test_multi_block_carry():
    symbols, scores = random_case(2, 3 * BW, ROWS_PER_STRIP)
    check_against_oracle(symbols, scores)


def test_unaligned_sizes_are_padded():
    symbols, scores = random_case(3, 2000, 17)
    check_against_oracle(symbols, scores)


def test_cold_input_no_hits():
    symbols, scores = random_case(4, BW, 16, lo=-128, hi=10)
    expected, _ = ssv_reference(symbols, scores)
    assert len(expected.hit_rows) == 0
    rows, pos, _, _ = run(symbols, scores)
    assert rows.size == 0 and pos.size == 0


def test_row_chunk_chaining():
    symbols, scores = random_case(5, BW, 2 * ROWS_PER_STRIP)
    whole, _ = ssv_reference(symbols, scores)
    whole_set = set(zip(whole.hit_rows.tolist(), whole.hit_positions.tolist()))
    cut = ROWS_PER_STRIP
    r1, p1, state1, _ = run(symbols, scores[:cut])
    r2, p2, _, _ = run(symbols, scores[cut:], init_state=state1)
    got = set(zip(r1.tolist(), p1.tolist())) | {
        (j + cut, i) for j, i in zip(r2.tolist(), p2.tolist())
    }
    assert got == whole_set


def test_column_chunk_chaining_via_carry():
    symbols, scores = random_case(6, 2 * BW, 24)
    whole, _ = ssv_reference(symbols, scores)
    whole_set = set(zip(whole.hit_rows.tolist(), whole.hit_positions.tolist()))
    cut = BW
    rl, pl_, _, carry_l = run(symbols[:cut], scores)
    rr, pr, _, _ = run(symbols[cut:], scores, init_carry=carry_l)
    got = set(zip(rl.tolist(), pl_.tolist())) | {
        (j, i + cut) for j, i in zip(rr.tolist(), pr.tolist())
    }
    assert got == whole_set


def test_hit_tile_overflow_detection():
    symbols = np.zeros(2 * BW, dtype=np.uint8)
    scores = np.full((ROWS_PER_STRIP, 4), 127, dtype=np.int8)
    with pytest.raises(HitTileOverflow):
        run(symbols, scores, max_hit_tiles=2)


def test_matches_oracle_on_planted_fixture():
    from havac_tpu.io.fasta import encode_database
    from havac_tpu.scoring.reprojection import project_models
    from havac_tpu.testing.generator import generate_planted_fixture

    models, seqs = generate_planted_fixture(
        seed=7, model_length=64, sequence_length=4000)
    db = encode_database([n for n, _ in seqs], [s.encode() for _, s in seqs],
                         pad_multiple=BW)
    scores = project_models(models, p_value=0.02)
    check_against_oracle(db.codes, scores)


def test_block_width_cap_rejected():
    """Widths whose count sidecar would overflow its 128-lane staging tile
    are rejected with a clear error (use more blocks, not wider ones)."""
    import pytest

    from havac_tpu.ops.ssv_swar import ssv_swar

    with pytest.raises(ValueError, match="block_width must be <= 393216"):
        ssv_swar(np.zeros(396288, dtype=np.uint8),
                 np.zeros((30, 4), dtype=np.int8), block_width=396288,
                 interpret=True)
