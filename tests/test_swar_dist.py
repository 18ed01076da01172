"""Multi-chip SWAR wavefront (interpret mode, 8-device CPU mesh) vs oracle.

The production distributed path: the Pallas SWAR kernel per shard inside a
shard_map wavefront, seams exchanged as the kernel's carry vector via
ppermute, tiles compacted to records inside the scan.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from havac_tpu.ops.reference import ssv_reference
from havac_tpu.parallel.swar_dist import SwarDistributedSweep


def mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def sweep_for(codes, n_dev, **kw):
    kw.setdefault("block_width", 3072)
    kw.setdefault("rows_per_step", 30)
    kw.setdefault("interpret", True)
    return SwarDistributedSweep(codes, mesh(n_dev), **kw)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_swar_dist_matches_oracle(n_dev):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=4 * 3072 * n_dev).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(75, 4)).astype(np.int8)
    sweep = sweep_for(codes, n_dev)
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_seam_and_chunk_crossing():
    """Monotone chains cross shard seams and row-chunk boundaries."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=2 * 3072 * 4).astype(np.uint8)
    scores = np.full((90, 4), 5, dtype=np.int8)  # 3 row chunks of 30
    sweep = sweep_for(codes, 4)
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 100
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_ragged_padding():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=20011).astype(np.uint8)  # ragged L
    scores = rng.integers(-40, 110, size=(44, 4)).astype(np.int8)  # ragged P
    sweep = sweep_for(codes, 4)
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_record_cap_retry():
    """Hit-dense runs must adapt record/group caps, not hard-fail."""
    codes = np.zeros(2 * 3072, dtype=np.uint8)
    scores = np.full((30, 4), 127, dtype=np.int8)  # hits everywhere
    sweep = SwarDistributedSweep(codes, mesh(2), block_width=3072,
                                 rows_per_step=30, record_cap=16,
                                 interpret=True)
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)
    assert sweep.record_cap > 16  # caps grew


def test_swar_dist_column_chunking():
    """A tile budget smaller than the shard forces column chunking; hits
    must remain exact (carry chained through the kernel between chunks)."""
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=4 * 3072 * 2).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(60, 4)).astype(np.int8)
    sweep = SwarDistributedSweep(codes, mesh(2), block_width=3072,
                                 rows_per_step=30,
                                 tile_budget_bytes=3 * 1024 * 4 * 3,
                                 interpret=True)
    assert sweep.col_chunks > 1
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_column_chunking_rising_chains():
    """Chains crossing column-chunk boundaries within a shard."""
    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, size=4 * 3072).astype(np.uint8)
    scores = np.full((30, 4), 5, dtype=np.int8)
    sweep = SwarDistributedSweep(codes, mesh(2), block_width=3072,
                                 rows_per_step=30,
                                 tile_budget_bytes=1 * 1024 * 4 * 3,
                                 interpret=True)
    assert sweep.col_chunks > 1
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_isolation():
    """1D mesh path with model isolation matches the isolated oracle."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=2 * 3072 * 2).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(60, 4)).astype(np.int8)
    reset = np.zeros(60, dtype=bool)
    reset[0] = reset[23] = True
    sweep = SwarDistributedSweep(codes, mesh(2), block_width=3072,
                                 rows_per_step=30, interpret=True)
    rows, pos = sweep.run(scores, reset)
    want, _ = ssv_reference(codes, scores, reset_rows=reset)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_step_vs_monolithic():
    """The default per-step dispatch (abortable) and the monolithic
    lax.scan produce identical hits."""
    rng = np.random.default_rng(12)
    codes = rng.integers(0, 4, size=4 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(75, 4)).astype(np.int8)
    sweep = sweep_for(codes, 4)
    rows_s, pos_s = sweep.run(scores)
    rows_m, pos_m = sweep.run(scores, monolithic=True)
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows_s, want.hit_rows)
    np.testing.assert_array_equal(rows_m, want.hit_rows)
    np.testing.assert_array_equal(pos_s, want.hit_positions)
    np.testing.assert_array_equal(pos_m, want.hit_positions)


class _AbortAfter:
    """threading.Event stand-in that trips after n is_set() polls."""

    def __init__(self, n):
        self.n = n
        self.calls = 0

    def is_set(self):
        self.calls += 1
        return self.calls > self.n


def test_swar_dist_abort_mid_sweep(monkeypatch):
    """abort takes effect BETWEEN dispatches (run returns None), and the
    sweep object remains usable afterwards. Under the round-5 superstep
    the dispatch (= abort poll) granularity is one pull batch of wavefront
    steps; pin the batch to 2 so T = 6 spans three dispatches."""
    monkeypatch.setenv("HAVAC_MESH_PULL_BATCH", "2")
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, size=2 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(90, 4)).astype(np.int8)  # T = 6
    sweep = sweep_for(codes, 4)
    ev = _AbortAfter(2)
    assert sweep.run(scores, abort_event=ev) is None
    assert ev.calls == 3  # polled per batch; tripped mid-sweep
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_abort_per_step(monkeypatch):
    """With the superstep disabled the abort poll stays per wavefront
    step (the legacy dispatch granularity)."""
    monkeypatch.setenv("HAVAC_MESH_SUPERSTEP", "0")
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, size=2 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(90, 4)).astype(np.int8)  # T = 6
    sweep = sweep_for(codes, 4)
    ev = _AbortAfter(2)
    assert sweep.run(scores, abort_event=ev) is None
    assert ev.calls == 3  # polled per step; tripped mid-sweep
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_progress_reports_steps():
    """Progress lands on dispatch boundaries: every step when T fits one
    superstep batch is reported once at the end of its batch."""
    rng = np.random.default_rng(14)
    codes = rng.integers(0, 4, size=2 * 3072 * 2).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(60, 4)).astype(np.int8)
    seen = []
    sweep = sweep_for(codes, 2)
    sweep.run(scores, progress=lambda step, total: seen.append((step, total)))
    T = 60 // 30 + 2 - 1
    assert seen[-1] == (T, T)
    assert [s for s, _ in seen] == sorted({s for s, _ in seen})


def test_swar_dist_checkpoint_resume(monkeypatch):
    """Wavefront-step checkpoint/resume (VERDICT r2 #5): a sweep killed
    mid-stream resumes from the last payload and produces the exact hits.
    Pull batch pinned to 1 so the superstep's dispatch (= abort poll)
    granularity matches the original per-step cadence."""
    monkeypatch.setenv("HAVAC_MESH_PULL_BATCH", "1")
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=2 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(150, 4)).astype(np.int8)  # T = 8
    sweep = sweep_for(codes, 4)
    payloads = []

    def cb(t_next, il, ilo, sl, slo, rows, pos):
        assert ilo == 0 and slo == 0  # single-process: local = global
        payloads.append((t_next, il.copy(), sl.copy(), rows.copy(),
                         pos.copy()))

    ev = _AbortAfter(5)
    assert sweep.run(scores, abort_event=ev, checkpoint_cb=cb,
                     ckpt_every=2) is None
    assert [p[0] for p in payloads] == [2, 4]
    rows, pos = sweep.run(scores, resume=payloads[-1])
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_superstep_checkpoint_cuts_batches():
    """Under the superstep (default), batches cut at checkpoint boundaries:
    ckpt_every=3 with pull batch 8 over T=8 checkpoints at 3 and 6, and a
    resume from each payload reproduces the exact hits."""
    rng = np.random.default_rng(23)
    codes = rng.integers(0, 4, size=2 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(150, 4)).astype(np.int8)  # T = 8
    sweep = sweep_for(codes, 4)
    assert sweep._superstep and sweep._pull_batch == 8
    payloads = []

    def cb(t_next, il, ilo, sl, slo, rows, pos):
        payloads.append((t_next, il.copy(), sl.copy(), rows.copy(),
                         pos.copy()))

    rows, pos = sweep.run(scores, checkpoint_cb=cb, ckpt_every=3)
    assert [p[0] for p in payloads] == [3, 6]
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)
    for p in payloads:
        r2, p2 = sweep.run(scores, resume=p)
        np.testing.assert_array_equal(r2, want.hit_rows)
        np.testing.assert_array_equal(p2, want.hit_positions)


def test_swar_dist_superstep_knob_is_exact(monkeypatch):
    """HAVAC_MESH_SUPERSTEP=0 (per-step dispatch) produces identical hits
    to the default batched-scan superstep, including a partial final
    batch (T = 13 over batches of 8)."""
    rng = np.random.default_rng(29)
    codes = rng.integers(0, 4, size=4 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(300, 4)).astype(np.int8)  # T = 13

    sup = sweep_for(codes, 4)
    assert sup._superstep
    rows1, pos1 = sup.run(scores)
    monkeypatch.setenv("HAVAC_MESH_SUPERSTEP", "0")
    leg = sweep_for(codes, 4)
    assert not leg._superstep
    rows0, pos0 = leg.run(scores)
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows1, want.hit_rows)
    np.testing.assert_array_equal(pos1, want.hit_positions)
    np.testing.assert_array_equal(rows0, want.hit_rows)
    np.testing.assert_array_equal(pos0, want.hit_positions)


def test_swar_dist_pull_batch_knob_is_exact(monkeypatch):
    """HAVAC_MESH_PULL_BATCH (device-side record accumulation, default 8 —
    the round-5 port of the pipelined engine's batched pull discipline)
    must produce hits identical to legacy per-step pulls (0) at batch sizes
    that seal mid-run (2) and never fill (64, one partial drain)."""
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, size=4 * 3072 * 4).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(300, 4)).astype(np.int8)  # T = 13

    def run(kb):
        monkeypatch.setenv("HAVAC_MESH_PULL_BATCH", kb)
        sweep = sweep_for(codes, 4)
        assert sweep._pull_batch == int(kb)
        return sweep.run(scores)

    rows0, pos0 = run("0")
    want, _ = ssv_reference(codes, scores)
    assert len(want.hit_rows) > 0
    np.testing.assert_array_equal(rows0, want.hit_rows)
    np.testing.assert_array_equal(pos0, want.hit_positions)
    for kb in ("2", "64"):
        rows, pos = run(kb)
        np.testing.assert_array_equal(rows, want.hit_rows)
        np.testing.assert_array_equal(pos, want.hit_positions)
    # legacy interleaved-pair wire layout inside the batched flow
    monkeypatch.setenv("HAVAC_REC_PACK", "0")
    rows, pos = run("2")
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)


def test_swar_dist_batched_cap_retry_and_col_chunks(monkeypatch):
    """Batched mesh pulls with a record cap that must grow (overflowed
    chunks truncate in the slab; the replicated header check restarts the
    sweep) AND column chunking (CC > 1: several appends per step)."""
    monkeypatch.setenv("HAVAC_MESH_PULL_BATCH", "2")
    codes = np.zeros(4 * 3072, dtype=np.uint8)
    scores = np.full((60, 4), 127, dtype=np.int8)  # hits everywhere
    sweep = SwarDistributedSweep(codes, mesh(2), block_width=3072,
                                 rows_per_step=30, record_cap=16,
                                 tile_budget_bytes=3 * 1024 * 4 * 3,
                                 interpret=True)
    assert sweep.col_chunks > 1
    rows, pos = sweep.run(scores)
    want, _ = ssv_reference(codes, scores)
    np.testing.assert_array_equal(rows, want.hit_rows)
    np.testing.assert_array_equal(pos, want.hit_positions)
    assert sweep.record_cap > 16


def test_swar_dist_phase_attribution():
    """The mesh path reports per-phase timings like the pipelined path
    (VERDICT r2 weak #4)."""
    rng = np.random.default_rng(22)
    codes = rng.integers(0, 4, size=2 * 3072 * 2).astype(np.uint8)
    scores = rng.integers(-40, 110, size=(60, 4)).astype(np.int8)
    sweep = sweep_for(codes, 2)
    sweep.run(scores)
    assert set(sweep.prof) == {"dispatch", "sync", "pull", "decode", "sort"}
    assert sweep.prof["dispatch"] > 0
    assert sweep.prof["sort"] > 0
