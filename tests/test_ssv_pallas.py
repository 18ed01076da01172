"""Pallas SSV kernel (interpret mode on CPU) vs the numpy oracle.

Exercises multi-block boundary carries (the score-queue analog), multi-strip
bitmaps, hit-tile compaction, row/column chunk chaining, and overflow
detection. The same kernel runs compiled on real TPU; interpret mode checks
kernel *semantics* per SURVEY.md §4 rung 1.
"""

import numpy as np
import pytest

from havac_tpu.ops.common import SsvKernelConfig
from havac_tpu.ops.reference import ssv_reference
from havac_tpu.ops.ssv_pallas import HitTileOverflow, ssv_pallas

# Small geometry so tests cover many blocks/strips quickly.
CFG = SsvKernelConfig(block_width=1024, rows_per_strip=8, max_hit_tiles=256, interpret=True)


def random_case(seed, L, P, lo=-40, hi=120):
    rng = np.random.default_rng(seed)
    symbols = rng.integers(0, 4, size=L).astype(np.uint8)
    scores = rng.integers(lo, hi, size=(P, 4)).astype(np.int8)
    return symbols, scores


def check_against_oracle(symbols, scores, cfg=CFG, expect_hits=True):
    expected, _ = ssv_reference(symbols, scores)
    exp_set = set(zip(expected.hit_rows.tolist(), expected.hit_positions.tolist()))
    rows, pos, state, carry = ssv_pallas(symbols, scores, config=cfg)
    got = set(zip(rows.tolist(), pos.tolist()))
    assert got == exp_set
    if expect_hits:
        assert len(exp_set) > 0
    if scores.shape[0] % cfg.rows_per_strip == 0:
        np.testing.assert_array_equal(state, expected.final_row_state)
    if (
        symbols.shape[0] % cfg.block_width == 0
        and scores.shape[0] % cfg.rows_per_strip == 0
    ):
        np.testing.assert_array_equal(carry, expected.final_carry)


def test_single_block_single_strip():
    symbols, scores = random_case(0, 512, 8)
    check_against_oracle(symbols, scores)


def test_multi_strip():
    symbols, scores = random_case(1, 1024, 40)
    check_against_oracle(symbols, scores)


def test_multi_block_carry_across_blocks():
    # 3 blocks: the boundary column must flow through the score-queue buffer.
    symbols, scores = random_case(2, 3 * 1024, 24)
    check_against_oracle(symbols, scores)


def test_unaligned_sizes_are_padded():
    symbols, scores = random_case(3, 1500, 13)
    check_against_oracle(symbols, scores)


def test_cold_input_no_hits():
    symbols, scores = random_case(4, 1024, 16, lo=-128, hi=10)
    expected, _ = ssv_reference(symbols, scores)
    assert len(expected.hit_rows) == 0
    rows, pos, _, _ = ssv_pallas(symbols, scores, config=CFG)
    assert rows.size == 0 and pos.size == 0


def test_row_chunk_chaining():
    symbols, scores = random_case(5, 2048, 32)
    whole, _ = ssv_reference(symbols, scores)
    whole_set = set(zip(whole.hit_rows.tolist(), whole.hit_positions.tolist()))

    r1, p1, state1, _ = ssv_pallas(symbols, scores[:16], config=CFG)
    r2, p2, _, _ = ssv_pallas(symbols, scores[16:], init_state=state1, config=CFG)
    got = set(zip(r1.tolist(), p1.tolist())) | {
        (j + 16, i) for j, i in zip(r2.tolist(), p2.tolist())
    }
    assert got == whole_set


def test_column_chunk_chaining_via_carry():
    symbols, scores = random_case(6, 4096, 24)
    whole, _ = ssv_reference(symbols, scores)
    whole_set = set(zip(whole.hit_rows.tolist(), whole.hit_positions.tolist()))

    cut = 2048
    rl, pl_, _, carry_l = ssv_pallas(symbols[:cut], scores, config=CFG)
    rr, pr, _, _ = ssv_pallas(symbols[cut:], scores, init_carry=carry_l, config=CFG)
    got = set(zip(rl.tolist(), pl_.tolist())) | {
        (j, i + cut) for j, i in zip(rr.tolist(), pr.tolist())
    }
    assert got == whole_set


def test_hit_tile_overflow_detection():
    # All-max scores hit everywhere: every tile is dirty, tiny buffer overflows.
    symbols = np.zeros(2048, dtype=np.uint8)
    scores = np.full((16, 4), 127, dtype=np.int8)
    small = SsvKernelConfig(
        block_width=1024, rows_per_strip=8, max_hit_tiles=2, interpret=True
    )
    with pytest.raises(HitTileOverflow):
        ssv_pallas(symbols, scores, config=small)


def test_matches_oracle_on_planted_fixture():
    from havac_tpu.io.fasta import encode_database
    from havac_tpu.scoring.reprojection import project_models
    from havac_tpu.testing.generator import generate_planted_fixture

    models, seqs = generate_planted_fixture(
        seed=7, model_length=64, sequence_length=3000
    )
    db = encode_database([n for n, _ in seqs], [s.encode() for _, s in seqs], pad_multiple=1024)
    scores = project_models(models, p_value=0.02)
    check_against_oracle(db.codes, scores)
