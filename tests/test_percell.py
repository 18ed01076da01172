"""Per-cell DP matrix equivalence across backends (byCellComparator analog)."""

import numpy as np

from havac_tpu.testing.percell import (
    compare_matrices,
    dp_matrix_oracle,
    dp_matrix_pallas,
    dp_matrix_xla,
)


def case(seed=0, L=700, P=24):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 4, size=L).astype(np.uint8),
            rng.integers(-40, 110, size=(P, 4)).astype(np.int8))


def test_xla_matches_oracle_per_cell():
    symbols, scores = case(1)
    assert compare_matrices(dp_matrix_oracle(symbols, scores),
                            dp_matrix_xla(symbols, scores)) == []


def test_pallas_matches_oracle_per_cell():
    symbols, scores = case(2, L=1500, P=12)
    assert compare_matrices(dp_matrix_oracle(symbols, scores),
                            dp_matrix_pallas(symbols, scores)) == []


def test_comparator_reports_mismatches():
    symbols, scores = case(3, L=300, P=8)
    m = dp_matrix_oracle(symbols, scores)
    bad = m.copy()
    bad[4, 100] += 1
    bad[7, 2] = 0 if m[7, 2] else 1
    report = compare_matrices(m, bad)
    assert {(c.row, c.position) for c in report} == {(4, 100), (7, 2)}
