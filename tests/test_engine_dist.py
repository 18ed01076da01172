"""Distributed engine path on an 8-device CPU mesh vs the scalar oracle.

BASELINE config 3's shape at test scale: a multi-model collection swept over
a sequence-sharded mesh in several row chunks, exercising the cross-chunk
chain state (sharded row state + per-device boundary scalars) and the
on-device hit compaction. Exactness includes chains that cross shard seams
AND row-chunk boundaries simultaneously.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from havac_tpu.engine import Havac, HavacUsageError
from havac_tpu.io.fasta import load_fasta_database
from havac_tpu.ops.common import SsvKernelConfig
from havac_tpu.ops.reference import ssv_reference
from havac_tpu.parallel.engine_dist import ssv_distributed
from havac_tpu.scoring.reprojection import project_models
from havac_tpu.testing.generator import generate_planted_fixture


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("seq",))


def test_distributed_sweep_matches_oracle_multi_chunk():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=4096).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(300, 4)).astype(np.int8)
    rows, pos = ssv_distributed(codes, scores, mesh8(), rows_per_step=32,
                                rows_per_call=96)
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_distributed_chains_cross_seams_and_chunks():
    """Monotone chains longer than both a shard and a row chunk."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=1024).astype(np.uint8)
    scores = np.full((128, 4), 5, dtype=np.int8)  # rising chains everywhere
    rows, pos = ssv_distributed(codes, scores, mesh8(), rows_per_step=32,
                                rows_per_call=32)  # 4 chained calls
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 100
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_distributed_hit_capacity_overflow():
    from havac_tpu.ops.common import HitTileOverflow
    from havac_tpu.parallel.engine_dist import DistributedSweep

    codes = np.zeros(1024, dtype=np.uint8)
    scores = np.full((32, 4), 127, dtype=np.int8)  # hits everywhere
    sweep = DistributedSweep(codes, mesh8(), rows_per_step=32,
                             rows_per_call=32, hit_capacity=4)
    with pytest.raises(HitTileOverflow):
        sweep.sweep_rows(scores, 0)


def test_engine_mesh_end_to_end():
    models, records = generate_planted_fixture(
        seed=43, model_length=64, sequence_length=6000, num_models=3)
    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    dist = Havac(p_value=0.05, backend="xla", mesh=mesh8(), chunk_rows=64,
                 dist_rows_per_step=32)
    dist.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert dist.stats.num_chunks == 3  # 192 rows / 64
    single = Havac(p_value=0.05, backend="xla",
                   config=SsvKernelConfig(block_width=1024, rows_per_strip=8,
                                          interpret=True))
    single.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert len(dist.hits()) > 0
    assert sorted(dist.hits().as_tuples()) == sorted(single.hits().as_tuples())


def test_engine_mesh_swar_backend():
    """Mesh + SWAR backend routes through the Pallas wavefront path."""
    from havac_tpu.ops.common import SsvKernelConfig

    models, records = generate_planted_fixture(
        seed=47, model_length=40, sequence_length=30000, num_models=2)
    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    cfg = SsvKernelConfig.swar(block_width=3072, interpret=True)
    dist = Havac(p_value=0.05, backend="pallas_interpret", config=cfg,
                 mesh=mesh8())
    dist.load_phmm(models).load_sequence(fasta, is_text=True).run()
    single = Havac(p_value=0.05, backend="xla",
                   config=SsvKernelConfig(block_width=1024, rows_per_strip=8,
                                          interpret=True))
    single.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert len(dist.hits()) > 0
    assert sorted(dist.hits().as_tuples()) == sorted(single.hits().as_tuples())


def test_engine_mesh_2d_checkpoint_resume(tmp_path):
    """Engine-level 2D (seq × model) mesh checkpoint/resume: an aborted 2D
    run restarted with the same inputs resumes from the wavefront-step
    checkpoint and produces identical hits. Deterministic: the wrapped
    callback aborts right after the first checkpoint write, and the tiny
    tile budget forces R=30 so T = S + D_seq - 1 > ckpt_every."""
    import os as _os

    from havac_tpu.engine import HavacRunState
    from havac_tpu.ops.common import SsvKernelConfig

    ckpt = str(tmp_path / "mesh2d.ckpt.npz")
    models, records = generate_planted_fixture(
        seed=53, model_length=30, sequence_length=20000, num_models=4)
    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, ("seq", "model"))
    cfg = SsvKernelConfig.swar(block_width=3072, interpret=True,
                               tile_budget_bytes=49152)

    def make():
        e = Havac(p_value=0.05, backend="pallas_interpret", config=cfg,
                  mesh=mesh2, isolate_models=True, checkpoint_path=ckpt)
        return e.load_phmm(models).load_sequence(fasta, is_text=True)

    first = make()
    orig_hooks = first._mesh2d_checkpoint_hooks

    def hooks(sweep2d, P):
        cb, resume, path = orig_hooks(sweep2d, P)
        assert cb is not None

        def cb_then_abort(*args):
            cb(*args)
            first._abort_event.set()

        return cb_then_abort, resume, path

    first._mesh2d_checkpoint_hooks = hooks
    first.run_async()
    first.wait()
    assert first.state == HavacRunState.ABORTED
    assert _os.path.exists(ckpt)

    second = make()
    second.run()
    if _os.path.exists(ckpt + ".tmp.npz"):
        _os.remove(ckpt + ".tmp.npz")
    assert second.resumed_chunks > 0  # the resume machinery actually ran
    assert not _os.path.exists(ckpt)  # cleaned up on completion

    single = Havac(p_value=0.05, backend="xla",
                   config=SsvKernelConfig(block_width=1024, rows_per_strip=8,
                                          interpret=True),
                   isolate_models=True)
    single.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert len(single.hits()) > 0
    assert sorted(second.hits().as_tuples()) == sorted(
        single.hits().as_tuples())


def test_engine_mesh_2d_swar():
    """2D mesh + isolate_models routes through Swar2DSweep, exact vs the
    isolated single-device run."""
    from havac_tpu.ops.common import SsvKernelConfig

    models, records = generate_planted_fixture(
        seed=53, model_length=30, sequence_length=20000, num_models=4)
    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, ("seq", "model"))
    cfg = SsvKernelConfig.swar(block_width=3072, interpret=True)
    dist = Havac(p_value=0.05, backend="pallas_interpret", config=cfg,
                 mesh=mesh2, isolate_models=True)
    dist.load_phmm(models).load_sequence(fasta, is_text=True).run()

    single = Havac(p_value=0.05, backend="xla",
                   config=SsvKernelConfig(block_width=1024, rows_per_strip=8,
                                          interpret=True),
                   isolate_models=True)
    single.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert len(dist.hits()) > 0
    assert sorted(dist.hits().as_tuples()) == sorted(single.hits().as_tuples())

    # Without isolation the 2D path must refuse.
    bad = Havac(p_value=0.05, backend="pallas_interpret", config=cfg,
                mesh=mesh2)
    bad.load_phmm(models).load_sequence(fasta, is_text=True)
    with pytest.raises(HavacUsageError):
        bad.run()


def test_engine_mesh_fallback_to_xla_on_budget():
    """A tile budget too small for the SWAR mesh path falls back to the XLA
    wavefront instead of erroring."""
    from havac_tpu.ops.common import SsvKernelConfig

    models, records = generate_planted_fixture(
        seed=59, model_length=24, sequence_length=20000, num_models=2)
    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    cfg = SsvKernelConfig.swar(block_width=3072, interpret=True)
    cfg = __import__("dataclasses").replace(cfg, tile_budget_bytes=1024)
    dist = Havac(p_value=0.05, backend="pallas_interpret", config=cfg,
                 mesh=mesh8(), dist_rows_per_step=32)
    dist.load_phmm(models).load_sequence(fasta, is_text=True).run()
    single = Havac(p_value=0.05, backend="xla",
                   config=SsvKernelConfig(block_width=1024, rows_per_strip=8,
                                          interpret=True))
    single.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert sorted(dist.hits().as_tuples()) == sorted(single.hits().as_tuples())


def test_engine_mesh_checkpoint_resume(tmp_path):
    """Engine-level mesh checkpoint/resume (VERDICT r2 #5): an aborted mesh
    run restarted with the same inputs resumes from the per-step checkpoint
    file and produces identical hits."""
    import os as _os

    from havac_tpu.engine import HavacRunState
    from havac_tpu.ops.common import SsvKernelConfig

    ckpt = str(tmp_path / "mesh.ckpt.npz")
    models, records = generate_planted_fixture(
        seed=61, model_length=40, sequence_length=30000, num_models=2)
    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    cfg = SsvKernelConfig.swar(block_width=3072, interpret=True)

    def make():
        e = Havac(p_value=0.05, backend="pallas_interpret", config=cfg,
                  mesh=mesh8(), checkpoint_path=ckpt)
        return e.load_phmm(models).load_sequence(fasta, is_text=True)

    # Deterministic mid-run abort: wrap the checkpoint callback so the run
    # aborts right after its FIRST checkpoint write. The mesh has D=8, so
    # T = S + 7 >= 8 wavefront steps and the engine's ckpt_every=4 always
    # fires before the run can complete — no timing race.
    first = make()
    orig_hooks = first._mesh_checkpoint_hooks

    def hooks(sweep, P):
        cb, resume, path = orig_hooks(sweep, P)
        assert cb is not None

        def cb_then_abort(*args):
            cb(*args)
            first._abort_event.set()

        return cb_then_abort, resume, path

    first._mesh_checkpoint_hooks = hooks
    first.run_async()
    first.wait()
    assert first.state == HavacRunState.ABORTED
    assert _os.path.exists(ckpt)

    second = make()
    second.run()
    if _os.path.exists(ckpt + ".tmp.npz"):
        _os.remove(ckpt + ".tmp.npz")
    assert second.resumed_chunks > 0  # the resume machinery actually ran
    assert not _os.path.exists(ckpt)  # cleaned up on completion

    single = Havac(p_value=0.05, backend="xla",
                   config=SsvKernelConfig(block_width=1024, rows_per_strip=8,
                                          interpret=True))
    single.load_phmm(models).load_sequence(fasta, is_text=True).run()
    assert sorted(second.hits().as_tuples()) == sorted(
        single.hits().as_tuples())
