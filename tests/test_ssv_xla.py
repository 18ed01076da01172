"""XLA scan kernel vs the numpy oracle, including boundary-condition plumbing."""

import numpy as np

from havac_tpu.hits.decode import decode_dense_bitmaps
from havac_tpu.ops.reference import ssv_reference
from havac_tpu.ops.ssv_xla import ssv_xla_full


def run_case(seed, L, P, K=32, lo=-40, hi=120):
    rng = np.random.default_rng(seed)
    symbols = rng.integers(0, 4, size=L).astype(np.uint8)
    scores = rng.integers(lo, hi, size=(P, 4)).astype(np.int8)
    return symbols, scores


def hits_from_xla(symbols, scores, K=32, **kw):
    bitmaps, final_row, final_carry = ssv_xla_full(
        symbols, scores, rows_per_strip=K, **kw
    )
    rows, pos = decode_dense_bitmaps(np.asarray(bitmaps), K)
    keep = rows < scores.shape[0]
    return set(zip(rows[keep].tolist(), pos[keep].tolist())), np.asarray(
        final_row
    ), np.asarray(final_carry)


def test_xla_matches_oracle_hits_state_and_carry():
    for seed, L, P in [(0, 257, 64), (1, 1000, 96), (2, 64, 32)]:
        symbols, scores = run_case(seed, L, P)
        expected, _ = ssv_reference(symbols, scores)
        exp_set = set(zip(expected.hit_rows.tolist(), expected.hit_positions.tolist()))
        got, final_row, final_carry = hits_from_xla(symbols, scores)
        assert got == exp_set
        assert len(exp_set) > 0
        np.testing.assert_array_equal(final_row, expected.final_row_state)
        np.testing.assert_array_equal(final_carry, expected.final_carry)


def test_xla_with_nonmultiple_row_count():
    symbols, scores = run_case(3, 128, 45)  # 45 not a multiple of 32
    expected, _ = ssv_reference(symbols, scores)
    exp_set = set(zip(expected.hit_rows.tolist(), expected.hit_positions.tolist()))
    got, _, final_carry = hits_from_xla(symbols, scores)
    assert got == exp_set
    np.testing.assert_array_equal(final_carry, expected.final_carry)


def test_xla_row_and_column_chunking():
    symbols, scores = run_case(4, 300, 64)
    whole, _ = ssv_reference(symbols, scores)
    whole_set = set(zip(whole.hit_rows.tolist(), whole.hit_positions.tolist()))

    # Row chunking: run rows [0, 32) then [32, 64) with state carry.
    h1, row1, _ = hits_from_xla(symbols, scores[:32])
    import jax.numpy as jnp

    h2, _, _ = hits_from_xla(symbols, scores[32:], init_state=jnp.asarray(row1))
    assert h1 | {(j + 32, i) for j, i in h2} == whole_set

    # Column chunking: positions [0, 128) then [128, 300) with carry.
    hl, _, carry_l = hits_from_xla(symbols[:128], scores)
    hr, _, _ = hits_from_xla(symbols[128:], scores, init_carry=jnp.asarray(carry_l))
    assert hl | {(j, i + 128) for j, i in hr} == whole_set
