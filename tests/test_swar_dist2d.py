"""2D (sequence × model) sharded SWAR sweep vs the isolated oracle.

BASELINE config 4's sharding shape at test scale on the 8-device CPU mesh:
model groups across one mesh axis (no communication; cuts at model
boundaries under isolation), sequence wavefront across the other.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from havac_tpu.io.hmm import model_length_prefix_sums
from havac_tpu.ops.reference import ssv_reference
from havac_tpu.parallel.swar_dist2d import Swar2DSweep, partition_models
from havac_tpu.scoring.reprojection import project_models
from havac_tpu.testing.generator import generate_planted_fixture
from havac_tpu.io.fasta import load_fasta_database


def mesh2d(d_seq, d_model):
    devs = np.array(jax.devices()[:d_seq * d_model]).reshape(d_seq, d_model)
    return Mesh(devs, ("seq", "model"))


def test_partition_models_balanced_whole_models():
    prefix = np.array([0, 10, 30, 35, 80, 100])
    bounds = partition_models(prefix, 3)
    assert bounds[0] == 0 and bounds[-1] == 5
    assert bounds == sorted(bounds)


@pytest.mark.parametrize("d_seq,d_model", [(4, 2), (2, 4)])
def test_2d_matches_isolated_oracle(d_seq, d_model):
    models, records = generate_planted_fixture(
        seed=101, model_length=32, sequence_length=9000, num_models=5)
    db = load_fasta_database(
        "".join(f">{n}\n{s}\n" for n, s in records), is_text=True)
    scores = project_models(models, 0.05)
    prefix = model_length_prefix_sums(models)
    reset = np.zeros(scores.shape[0], dtype=bool)
    reset[prefix[:-1]] = True

    sweep = Swar2DSweep(db.codes, mesh2d(d_seq, d_model), block_width=3072,
                        rows_per_step=30, interpret=True)
    rows, pos = sweep.run(scores, prefix)

    want, _ = ssv_reference(db.codes, scores, reset_rows=reset)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_2d_column_chunking():
    """Tiny tile budget forces column chunks inside the 2D path; exact."""
    models, records = generate_planted_fixture(
        seed=103, model_length=30, sequence_length=30000, num_models=4)
    db = load_fasta_database(
        "".join(f">{n}\n{s}\n" for n, s in records), is_text=True)
    scores = project_models(models, 0.05)
    prefix = model_length_prefix_sums(models)
    reset = np.zeros(scores.shape[0], dtype=bool)
    reset[prefix[:-1]] = True
    sweep = Swar2DSweep(db.codes, mesh2d(2, 2), block_width=3072,
                        rows_per_step=30,
                        tile_budget_bytes=1024 * 4 * 3 * 2, interpret=True)
    assert sweep.col_chunks > 1
    rows, pos = sweep.run(scores, prefix)
    want, _ = ssv_reference(db.codes, scores, reset_rows=reset)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar2d_step_vs_monolithic_and_abort():
    """Default per-step dispatch matches the monolithic scan bit-for-bit,
    and abort takes effect between wavefront steps."""
    from test_swar_dist import _AbortAfter

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=2 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(64, 4)).astype(np.int8)
    prefix = np.array([0, 33, 64], dtype=np.int64)
    m = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("seq", "model"))
    sweep = Swar2DSweep(codes, m, "seq", "model", block_width=3072,
                        rows_per_step=30, interpret=True)
    rows_s, pos_s = sweep.run(scores, prefix)
    rows_m, pos_m = sweep.run(scores, prefix, monolithic=True)
    np.testing.assert_array_equal(rows_s, rows_m)
    np.testing.assert_array_equal(pos_s, pos_m)
    reset = np.zeros(64, dtype=bool)
    reset[prefix[:-1]] = True
    want, _ = ssv_reference(codes, scores, reset_rows=reset)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows_s, want.hit_rows)
    np.testing.assert_array_equal(pos_s, want.hit_positions)

    assert sweep.run(scores, prefix, abort_event=_AbortAfter(1)) is None
    rows2, pos2 = sweep.run(scores, prefix)  # still usable after abort
    np.testing.assert_array_equal(rows2, want.hit_rows)
