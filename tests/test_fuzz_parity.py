"""Randomized cross-implementation parity: every kernel vs the oracle.

Seeded sweep over irregular shapes, score ranges, and boundary conditions —
the broad net behind the targeted tests (reference analog: the generated
softwareTestbench inputs, test/softwareTestbench.cpp:43-170).
"""

import numpy as np
import pytest

from havac_tpu.hits.decode import decode_dense_bitmaps
from havac_tpu.ops.reference import ssv_reference
from havac_tpu.ops.ssv_swar import ssv_swar
from havac_tpu.ops.ssv_pallas import ssv_pallas
from havac_tpu.ops.common import SsvKernelConfig


def random_case(rng):
    L = int(rng.integers(50, 5000))
    P = int(rng.integers(1, 120))
    lo = int(rng.integers(-128, -20))
    hi = int(rng.integers(lo + 10, 128))
    symbols = rng.integers(0, 4, size=L).astype(np.uint8)
    scores = rng.integers(lo, hi, size=(P, 4)).astype(np.int8)
    init_state = (rng.integers(0, 256, size=L).astype(np.int32)
                  if rng.random() < 0.3 else None)
    init_carry = (rng.integers(0, 256, size=P + 1).astype(np.int32)
                  if rng.random() < 0.3 else None)
    return symbols, scores, init_state, init_carry


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_swar_and_pallas_vs_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    symbols, scores, init_state, init_carry = random_case(rng)
    want, _ = ssv_reference(symbols, scores, init_row_state=init_state,
                            init_carry=init_carry)
    exp = set(zip(want.hit_rows.tolist(), want.hit_positions.tolist()))

    r, p, _, _ = ssv_swar(symbols, scores, init_state=init_state,
                          init_carry=init_carry, block_width=3072,
                          max_hit_tiles=4096, interpret=True)
    assert set(zip(r.tolist(), p.tolist())) == exp

    cfg = SsvKernelConfig(block_width=1024, rows_per_strip=8,
                          max_hit_tiles=4096, interpret=True)
    r2, p2, _, _ = ssv_pallas(symbols, scores, init_state=init_state,
                              init_carry=init_carry, config=cfg)
    assert set(zip(r2.tolist(), p2.tolist())) == exp


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_xla_isolation_vs_oracle(seed):
    import jax.numpy as jnp

    from havac_tpu.ops.ssv_xla import ssv_scan_xla

    rng = np.random.default_rng(2000 + seed)
    symbols, scores, _, _ = random_case(rng)
    P = scores.shape[0]
    reset = rng.random(P) < 0.1
    reset[0] = True
    want, _ = ssv_reference(symbols, scores, reset_rows=reset)

    K = 32
    P2 = -(-P // K) * K
    sp = np.full((P2, 4), -128, dtype=np.int8)
    sp[:P] = scores
    rr = np.zeros(P2, dtype=np.int32)
    rr[:P] = reset
    bm, _, _ = ssv_scan_xla(
        jnp.asarray(symbols), jnp.asarray(sp),
        jnp.zeros(symbols.shape[0], jnp.int32),
        jnp.zeros(P2 + 1, jnp.int32), jnp.asarray(rr), rows_per_strip=K)
    rows, pos = decode_dense_bitmaps(np.asarray(bm), K)
    keep = rows < P
    assert set(zip(rows[keep].tolist(), pos[keep].tolist())) == set(
        zip(want.hit_rows.tolist(), want.hit_positions.tolist()))
