"""Op-mix roofline for the SWAR SSV kernel: what the VPU can sustain on the
exact per-row op sequence, measured on real hardware.

This bounds the achievable GCUPS of any kernel implementing exact 8-bit
SSV semantics, with a measured artifact instead of an assertion
(BENCHMARKS.md claimed ~500 GCUPS/chip was the VPU ceiling; VERDICT round 1
asked for the proof — the measured ceiling turned out ~2x higher, see
BENCHMARKS.md "Roofline").

Measurement design (three earlier versions measured nothing):
  * the op mix runs inside ONE Pallas grid step, operands loaded to VMEM
    once, iterated by an internal ``fori_loop`` — a version that iterated
    via the pallas grid was DMA-bound at ~25% of compute;
  * the loop trip count is a RUNTIME SMEM scalar; each variant is timed at
    two rep counts with one compiled executable and the reported time is
    the DIFFERENCE per rep — cancels fixed dispatch + tunnel round-trip
    (~30 ms on the axon rig), which swamped absolute timings;
  * the compiler must be prevented from shortening the mix: scores are
    indexed by a rep-rotating strip index (else the whole match
    construction hoists out of the loop), the hit bitmap folds into a
    checksum at every flush (else the hit ops are dead code), and the add
    chain uses shift-xor (else it strength-reduces to one op). A naive
    version measured an impossible 11 VPU ops/cycle on 4-issue hardware.

Variants:

  current   — the live SWAR per-row vector sequence (`ops/ssv_swar.py` hot
              loop): indicator-plane match construction, lane+sublane roll,
              seam stitch, biased add, bit-9 hit probe, bitmap accumulate,
              keep mask, state update. Vector-op ceiling for the shipping
              kernel.
  perrow    — current PLUS the shipping kernel's per-row scalar side: the
              (WS-1,127) tail extract, the SMEM carry-queue write, the
              ocarry SMEM write, and the dynamic carry-queue read feeding
              the stitch. The current→perrow delta is what the scalar/SMEM
              chatter costs; this is the honest per-strip ceiling.
  leanhit   — candidate cheaper hit/keep logic: bit-9 mask accumulated into
              the bitmap directly ((bits>>1)|B9; decode flips row order)
              and keep mask via keep - (keep>>8) instead of (...)*255.
  nomatch   — current minus match construction (splat only): what a free
              match gather would buy.
  noroll    — current minus roll/stitch (match + arithmetic only): what a
              free position shift would buy.
  addonly   — irreducible dependent chain, 2 ops per "row": the VPU's raw
              dependent-op rate on this buffer size.
  mulcost   — addonly with an int32 vector multiply in the chain: prices
              one multiply slot (match construction spends 3 per row).
  andmatch  — multiply-free match construction: full-field indicator masks
              (precomputed per block) + biased deltas turn the three
              per-field selects into ANDs; wins iff int32 multiply > 1 slot.
  stripmatch — VERDICT-r3 #5: per-strip match precompute — the strip's K
              match planes materialized into VMEM scratch once, hot loop
              loads instead of reconstructing. Prices a load vs the 6-op
              inline construction (total ops do not drop: the planes are
              built once per (block, strip) either way and never reused
              across blocks).
  mxumatch / mxumatch8 — VERDICT-r2 #2: per-flush (10,4)×(4,3·WS·128)
              dot_general on the MXU replacing match construction, repack
              included (bf16→f32 / int8→int32).
  add16     — the same chain on int16 (2 elts/lane candidate).
  add8 / int8mix / int16mix — narrow-int probes; Mosaic's remote compiler
              crashes on int8/int16 fori_loop kernels on this rig (kept for
              documentation; run with --variants to retry).

Usage:  python tools/roofline.py [--ws 336] [--lo 64] [--hi 16448]
                                 [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FMASK = 0x00100401
ROWS_PER_FLUSH = 10
NS = 16  # score strips in SMEM; rep r uses strip r % NS (anti-hoisting)


def _time_call(fn, arg, *, iters):
    import jax

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(arg)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _time_variant(run, lo: int, hi: int, *, iters=5):
    """Seconds per rep via differential timing: (t(hi) - t(lo)) / (hi - lo).

    One compiled executable serves both rep counts (runtime scalar), so the
    difference cancels every fixed cost — dispatch, transfer latency, the
    final D2H pull."""
    import jax
    import jax.numpy as jnp

    lo_a = jnp.asarray([lo], jnp.int32)
    hi_a = jnp.asarray([hi], jnp.int32)
    out = run(hi_a)
    jax.block_until_ready(out)  # compile once
    t_lo = _time_call(run, lo_a, iters=iters)
    t_hi = _time_call(run, hi_a, iters=iters)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def make_variant(name: str, WS: int, K: int, interpret: bool = False):
    """Build a jitted runner ``run(reps: (1,) int32 array)`` for one op-mix
    variant.

    Returns (run, cells_per_rep, layout_desc)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fm = FMASK
    int32_cells = 3 * WS * 128  # SWAR: 3 cells per int32 word

    def mix_current(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        m0, m1, m2, m3 = ms[k]
        match = (m0 * jnp.int32(fm)) + i1 * (m1 - m0) + i2 * (m2 - m0) + i3 * (m3 - m0)
        rolled = pltpu.roll(state, 1, 1)
        rolled_sub = pltpu.roll(rolled, 1, 0)
        shifted = jnp.where(col0, rolled_sub, rolled)
        stitch = (rolled_sub << 10) | cin
        shifted = jnp.where(pos00, stitch, shifted)
        w = shifted + match
        t9 = w >> 9
        hit = t9 & jnp.int32(fm)
        bits = (bits << 1) | hit
        kmask = (w >> 8) & ~t9 & jnp.int32(fm)
        state = w & (kmask * 255)
        return state, bits

    def mix_leanhit(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        m0, m1, m2, m3 = ms[k]
        match = (m0 * jnp.int32(fm)) + i1 * (m1 - m0) + i2 * (m2 - m0) + i3 * (m3 - m0)
        rolled = pltpu.roll(state, 1, 1)
        rolled_sub = pltpu.roll(rolled, 1, 0)
        shifted = jnp.where(col0, rolled_sub, rolled)
        stitch = (rolled_sub << 10) | cin
        shifted = jnp.where(pos00, stitch, shifted)
        w = shifted + match
        b9 = w & jnp.int32(fm << 9)
        bits = (bits >> 1) | b9  # hit row r lands at field bit r
        keep = (w & jnp.int32(fm << 8)) & ~(b9 >> 1)
        state = w & (keep - (keep >> 8))
        return state, bits

    def mix_nomatch(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        match = ms[k][0] * jnp.int32(fm)
        rolled = pltpu.roll(state, 1, 1)
        rolled_sub = pltpu.roll(rolled, 1, 0)
        shifted = jnp.where(col0, rolled_sub, rolled)
        stitch = (rolled_sub << 10) | cin
        shifted = jnp.where(pos00, stitch, shifted)
        w = shifted + match
        t9 = w >> 9
        hit = t9 & jnp.int32(fm)
        bits = (bits << 1) | hit
        kmask = (w >> 8) & ~t9 & jnp.int32(fm)
        state = w & (kmask * 255)
        return state, bits

    def mix_noroll(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        m0, m1, m2, m3 = ms[k]
        match = (m0 * jnp.int32(fm)) + i1 * (m1 - m0) + i2 * (m2 - m0) + i3 * (m3 - m0)
        w = state + match
        t9 = w >> 9
        hit = t9 & jnp.int32(fm)
        bits = (bits << 1) | hit
        kmask = (w >> 8) & ~t9 & jnp.int32(fm)
        state = w & (kmask * 255)
        return state, bits

    def mix_addonly(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        # Irreducible dependent chain, 2 ops per row (nonlinear in state, so
        # neither strength reduction nor xor-folding applies; both a plain
        # add chain and a shift-xor chain were collapsed by the compiler).
        return (state + i1) ^ state, bits

    def mix_mulcost(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        # addonly with the add replaced by an int32 vector multiply:
        # (mulcost - addonly) prices one multiply slot — the match
        # construction spends 3 of them per row.
        return (state * i1) ^ state, bits

    def mix_andmatch(state, bits, i1, i2, i3, ms, k, col0, pos00, cin):
        # Multiply-free match construction: i1/i2/i3 arrive as FULL-FIELD
        # masks (0x3FF per matching field, precomputed once per block) and
        # the per-row deltas are biased non-negative (d+256 fits 9 bits), so
        # the per-field select is AND instead of multiply; the 256 bias is
        # removed by one subtract of the precomputed nonzero-indicator
        # plane. Exact for the same reason the multiply form is: fields
        # never borrow because every per-field partial is non-negative.
        m0, m1, m2, m3 = ms[k]
        fmv = jnp.int32(fm)
        s1 = ((m1 - m0 + 256) & 0x3FF) * fmv
        s2 = ((m2 - m0 + 256) & 0x3FF) * fmv
        s3 = ((m3 - m0 + 256) & 0x3FF) * fmv
        inz8 = ((i1 | i2 | i3) & jnp.int32(fm * 256))  # 256 per nz field
        match = (m0 * fmv) + (i1 & s1) + (i2 & s2) + (i3 & s3) - inz8
        rolled = pltpu.roll(state, 1, 1)
        rolled_sub = pltpu.roll(rolled, 1, 0)
        shifted = jnp.where(col0, rolled_sub, rolled)
        stitch = (rolled_sub << 10) | cin
        shifted = jnp.where(pos00, stitch, shifted)
        w = shifted + match
        t9 = w >> 9
        hit = t9 & fmv
        bits = (bits << 1) | hit
        kmask = (w >> 8) & ~t9 & fmv
        state = w & (kmask * 255)
        return state, bits

    mixes = {
        "current": mix_current,
        "perrow": mix_current,  # + scalar/SMEM side, added in the kernel
        "leanhit": mix_leanhit,
        "nomatch": mix_nomatch,
        "noroll": mix_noroll,
        "addonly": mix_addonly,
        "mulcost": mix_mulcost,
        "andmatch": mix_andmatch,
    }

    if name in mixes:
        mix = mixes[name]
        perrow = name == "perrow"

        def kernel(reps_smem, scores_smem, i1_ref, i2_ref, i3_ref, out_ref,
                   q_ref, oc_ref):
            i1 = i1_ref[:]
            i2 = i2_ref[:]
            i3 = i3_ref[:]
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 0)
            col0 = col_ids == 0
            pos00 = jnp.logical_and(col0, row_ids == 0)
            q_ref[0, 0] = 7
            q_ref[1, 0] = 7

            def body(r, carry):
                state, bits, acc = carry
                # Rep-rotating strip index: the match construction cannot
                # hoist out of the loop (the real kernel's s varies too).
                sidx = jax.lax.rem(r, NS)
                ms = [[scores_smem[sidx, k, a] for a in range(4)]
                      for k in range(K)]
                rslot = jax.lax.rem(r, 2)
                wslot = 1 - rslot
                for k in range(K):
                    cin = q_ref[rslot, k] if perrow else jnp.int32(7)
                    state, bits = mix(state, bits, i1, i2, i3, ms, k,
                                      col0, pos00, cin)
                    if perrow:
                        # The shipping kernel's per-row scalar side
                        # (`ops/ssv_swar.py` hot loop): vector→scalar tail
                        # extract + the carry-queue SMEM store (the output
                        # carry moved to a per-strip epilogue in round 2).
                        tail = state[WS - 1, 127] >> 20
                        q_ref[wslot, k + 1] = tail
                    if (k + 1) % ROWS_PER_FLUSH == 0:
                        acc = acc ^ bits  # keep the hit ops live
                        bits = jnp.zeros_like(state)
                return state, bits, acc

            z = jnp.zeros_like(i1)
            state, bits, acc = jax.lax.fori_loop(
                0, reps_smem[0], body, (i1, z, z))
            out_ref[:] = state + bits + acc

        rng = np.random.default_rng(0)
        sym = rng.integers(0, 4, size=(WS, 128))
        # andmatch consumes FULL-FIELD indicator masks (0x3FF per matching
        # field); the other variants take bit-0 indicators.
        pbit = 0x3FFFFFFF if name == "andmatch" else FMASK
        planes = [jax.numpy.asarray(((sym == a) * pbit).astype(np.int32))
                  for a in (1, 2, 3)]
        scores = jax.numpy.asarray(
            rng.integers(128, 384, size=(NS, K, 4)).astype(np.int32))

        call = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((WS, 128), jax.numpy.int32),
            scratch_shapes=[
                pltpu.SMEM((2, K + 1), jax.numpy.int32),  # carry queue
                pltpu.SMEM((K + 1,), jax.numpy.int32),  # ocarry
            ],
            interpret=interpret,
        )
        jitted = jax.jit(lambda reps: call(reps, scores, *planes))
        return jitted, K * int32_cells, "3 cells / int32 lane"

    if name == "stripmatch":
        # VERDICT-r3 #5: per-strip match precompute. Phase 1 materializes the
        # strip's K match-word planes into a VMEM scratch (K × WS×128 int32 —
        # 5 MB at the probe WS=336, ~15 MB at engine WS=1008, hence reduced-WS
        # prototyping); phase 2 is the hot loop with the per-row 6-op
        # indicator construction replaced by one VMEM load. Total vector ops
        # do NOT drop — the planes are built from the same indicator
        # contraction once per (block, strip) either way (no reuse across
        # blocks: match depends on the block's symbols) — so this prices
        # whether a load beats recomputation on the VPU's issue slots.
        def kernel_strip(reps_smem, scores_smem, i1_ref, i2_ref, i3_ref,
                         out_ref, mp_ref):
            i1 = i1_ref[:]
            i2 = i2_ref[:]
            i3 = i3_ref[:]
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 0)
            col0 = col_ids == 0
            pos00 = jnp.logical_and(col0, row_ids == 0)
            fmv = jnp.int32(fm)

            def body(r, carry):
                state, bits, acc = carry
                sidx = jax.lax.rem(r, NS)
                for k in range(K):  # phase 1: build the strip's planes
                    m0 = scores_smem[sidx, k, 0]
                    m1 = scores_smem[sidx, k, 1]
                    m2 = scores_smem[sidx, k, 2]
                    m3 = scores_smem[sidx, k, 3]
                    mp_ref[k] = ((m0 * fmv) + i1 * (m1 - m0)
                                 + i2 * (m2 - m0) + i3 * (m3 - m0))
                for k in range(K):  # phase 2: hot loop, match = one load
                    match = mp_ref[k]
                    rolled = pltpu.roll(state, 1, 1)
                    rolled_sub = pltpu.roll(rolled, 1, 0)
                    shifted = jnp.where(col0, rolled_sub, rolled)
                    stitch = (rolled_sub << 10) | jnp.int32(7)
                    shifted = jnp.where(pos00, stitch, shifted)
                    w = shifted + match
                    t9 = w >> 9
                    hit = t9 & fmv
                    bits = (bits << 1) | hit
                    kmask = (w >> 8) & ~t9 & fmv
                    state = w & (kmask * 255)
                    if (k + 1) % ROWS_PER_FLUSH == 0:
                        acc = acc ^ bits
                        bits = jnp.zeros_like(state)
                return state, bits, acc

            z = jnp.zeros_like(i1)
            state, bits, acc = jax.lax.fori_loop(
                0, reps_smem[0], body, (i1, z, z))
            out_ref[:] = state + bits + acc

        rng = np.random.default_rng(0)
        sym = rng.integers(0, 4, size=(WS, 128))
        planes = [jax.numpy.asarray(((sym == a) * FMASK).astype(np.int32))
                  for a in (1, 2, 3)]
        scores = jax.numpy.asarray(
            rng.integers(128, 384, size=(NS, K, 4)).astype(np.int32))
        call = pl.pallas_call(
            kernel_strip,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((WS, 128), jax.numpy.int32),
            scratch_shapes=[
                pltpu.VMEM((K, WS, 128), jax.numpy.int32),  # match planes
            ],
            interpret=interpret,
        )
        jitted = jax.jit(lambda reps: call(reps, scores, *planes))
        return jitted, K * int32_cells, "3 cells / int32 lane, strip planes"

    if name in ("mxumatch", "mxumatch8"):
        # VERDICT-r2 #2: the MXU match-construction experiment. Per flush of
        # 10 rows, ONE dot_general contracts the one-hot symbol planes
        # (4, 3·WS, 128) with the flush's scores (10, 4) on the MXU —
        # the TPU analog of the reference's 12,288-way mux
        # (`device/HavacHls.cpp:407-449`) — into a VMEM value the row loop
        # consumes by leading-dim slice + 10-bit field repack
        # (cast/shift/or/bias). The measured rate therefore includes BOTH
        # the matmul (contraction dim 4 → MXU pads to 128, ~3% utilization)
        # and the repack the packed-SWAR state layout forces. mxumatch8
        # uses int8×int8→int32 (skips the float casts); mxumatch uses
        # bf16→f32 (scores ∈ [-128,127] are bf16-exact).
        is8 = name == "mxumatch8"
        in_dt = jax.numpy.int8 if is8 else jax.numpy.bfloat16
        acc_dt = jax.numpy.int32 if is8 else jax.numpy.float32
        NF = K // ROWS_PER_FLUSH

        def kernel_mxu(reps_smem, scores_ref, onehot_ref, out_ref):
            # scores_ref is (NS·NF, 10, 4): one flush of rows per leading
            # index, read with a dynamic LEADING index (Mosaic supports
            # that; a mid-array dynamic_slice it does not).
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (WS, 128), 0)
            col0 = col_ids == 0
            pos00 = jnp.logical_and(col0, row_ids == 0)
            oh = onehot_ref[:]
            fmv = jnp.int32(fm)
            bias = jnp.int32(256) * fmv

            def body(r, carry):
                state, bits, acc = carry
                sidx = jax.lax.rem(r, NS)
                for f in range(NF):
                    sc = scores_ref[sidx * NF + f]
                    mdot = jax.lax.dot_general(
                        sc, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_dt)
                    for k in range(ROWS_PER_FLUSH):
                        mk = mdot[k]
                        m0 = mk[0:WS].astype(jnp.int32)
                        m1 = mk[WS:2 * WS].astype(jnp.int32)
                        m2 = mk[2 * WS:3 * WS].astype(jnp.int32)
                        match = m0 + (m1 << 10) + (m2 << 20) + bias
                        rolled = pltpu.roll(state, 1, 1)
                        rolled_sub = pltpu.roll(rolled, 1, 0)
                        shifted = jnp.where(col0, rolled_sub, rolled)
                        stitch = (rolled_sub << 10) | jnp.int32(7)
                        shifted = jnp.where(pos00, stitch, shifted)
                        w = shifted + match
                        t9 = w >> 9
                        hit = t9 & fmv
                        bits = (bits << 1) | hit
                        kmask = (w >> 8) & ~t9 & fmv
                        state = w & (kmask * 255)
                    acc = acc ^ bits
                    bits = jnp.zeros_like(state)
                return state, bits, acc

            z = jnp.zeros((WS, 128), jnp.int32)
            state, bits, acc = jax.lax.fori_loop(
                0, reps_smem[0], body, (z, z, z))
            out_ref[:] = state + bits + acc

        rng = np.random.default_rng(0)
        sym3 = rng.integers(0, 4, size=(3 * WS, 128))
        onehot = (sym3[None] == np.arange(4)[:, None, None])
        onehot_dev = jax.numpy.asarray(
            onehot.astype(np.int8 if is8 else np.float32)).astype(in_dt)
        scores_np = rng.integers(-128, 128, size=(NS * NF, ROWS_PER_FLUSH, 4))
        scores_dev = jax.numpy.asarray(
            scores_np.astype(np.int8 if is8 else np.float32)).astype(in_dt)

        call = pl.pallas_call(
            kernel_mxu,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((WS, 128), jax.numpy.int32),
            interpret=interpret,
        )
        jitted = jax.jit(lambda reps: call(reps, scores_dev, onehot_dev))
        return jitted, K * int32_cells, (
            "3 cells / int32 lane, MXU match (int8)" if is8
            else "3 cells / int32 lane, MXU match (bf16)")

    if name in ("add8", "add16"):
        dtype = jax.numpy.int8 if name == "add8" else jax.numpy.int16
        np_dtype = np.int8 if name == "add8" else np.int16
        rows = WS * 4 if name == "add8" else WS * 2

        def kernel_add(reps_smem, i1_ref, out_ref):
            i1 = i1_ref[:]

            def body(_, state):
                for _k in range(K):
                    # No shifts: Mosaic's remote compiler crashes on narrow-
                    # int shifts; this nonlinear chain is also fold-proof.
                    state = (state + i1) ^ state
                return state

            out_ref[:] = jax.lax.fori_loop(0, reps_smem[0], body, i1)

        rng = np.random.default_rng(0)
        i1 = jax.numpy.asarray(
            rng.integers(0, 3, size=(rows, 128)).astype(np_dtype))
        call = pl.pallas_call(
            kernel_add,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
            interpret=interpret,
        )
        jitted = jax.jit(lambda reps: call(reps, i1))
        return (jitted, K * rows * 128,
                f"1 elt / {np.dtype(np_dtype).itemsize}-byte lane")

    if name in ("int8mix", "int16mix"):
        is8 = name == "int8mix"
        dtype = jax.numpy.int8 if is8 else jax.numpy.int16
        np_dtype = np.int8 if is8 else np.int16
        rows = WS * 4 if is8 else WS * 2  # same byte footprint as int32 case

        def kernel8(reps_smem, m_smem, i1_ref, i2_ref, i3_ref, out_ref):
            i1 = i1_ref[:] != 0
            i2 = i2_ref[:] != 0
            i3 = i3_ref[:] != 0
            one = jnp.ones((rows, 128), dtype)
            zero = jnp.zeros((rows, 128), dtype)

            def body(r, carry):
                state, bits, acc = carry
                sidx = jax.lax.rem(r, NS)
                for k in range(K):
                    m0 = m_smem[sidx, k, 0].astype(dtype)
                    m1 = m_smem[sidx, k, 1].astype(dtype)
                    m2 = m_smem[sidx, k, 2].astype(dtype)
                    m3 = m_smem[sidx, k, 3].astype(dtype)
                    # 4:1 select-tree match (the reference's per-cell mux,
                    # `device/HavacHls.cpp:407-449`).
                    match = jnp.where(i1, m1, m0)
                    match = jnp.where(i2, m2, match)
                    match = jnp.where(i3, m3, match)
                    sumw = state + match  # wrapping add
                    # carry-out of bit7/15 via logic only (no unsigned
                    # compares / shifts — Mosaic rejects those on int8):
                    # carry = msb((a & b) | ((a | b) & ~s))
                    cvec = (state & match) | ((state | match) & ~sumw)
                    carry_neg = cvec < zero
                    msign = match < zero
                    reset = jnp.logical_xor(carry_neg, msign)
                    hit = jnp.logical_and(carry_neg, jnp.logical_not(msign))
                    bits = bits + bits + jnp.where(hit, one, zero)
                    state = jnp.where(reset, zero, sumw)
                    if (k + 1) % 8 == 0:
                        acc = acc ^ bits
                        bits = jnp.zeros_like(state)
                return state, bits, acc

            z = jnp.zeros((rows, 128), dtype)
            state, bits, acc = jax.lax.fori_loop(
                0, reps_smem[0], body,
                (jnp.where(i1, one, zero), z, z))
            out_ref[:] = state + bits + acc

        rng = np.random.default_rng(0)
        planes = [jax.numpy.asarray(
            rng.integers(0, 2, size=(rows, 128)).astype(np_dtype))
            for _ in range(3)]
        scores = jax.numpy.asarray(
            rng.integers(-40, 110, size=(NS, K, 4)).astype(np.int32))

        call = pl.pallas_call(
            kernel8,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
            interpret=interpret,
        )
        jitted = jax.jit(lambda reps: call(reps, scores, *planes))
        return (jitted, K * rows * 128,
                "4 cells / lane (int8)" if is8 else "2 cells / lane (int16)")

    raise ValueError(f"unknown variant {name!r}")


VARIANTS = ["current", "perrow", "leanhit", "nomatch", "noroll", "addonly",
            "mulcost", "andmatch", "stripmatch", "mxumatch", "mxumatch8",
            "add16"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ws", type=int, default=336,
                    help="sublane rows of the state buffer (336 = W 129024)")
    ap.add_argument("--rows", type=int, default=30,
                    help="unrolled rows per loop iteration (K)")
    ap.add_argument("--lo", type=int, default=64,
                    help="low rep count for differential timing")
    ap.add_argument("--hi", type=int, default=16448,
                    help="high rep count for differential timing")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--json", default=None)
    ap.add_argument("--variants", nargs="*", default=VARIANTS)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    from havac_tpu.utils.backend import bounded_backend_init

    print(f"# backend={bounded_backend_init(tag='roofline')} "
          f"ws={args.ws} rows={args.rows} "
          f"lo={args.lo} hi={args.hi} (differential)")
    results = {}
    for name in args.variants:
        try:
            run, cells_per_rep, lanes = make_variant(
                name, args.ws, args.rows, interpret=args.interpret)
            dt_rep, t_lo, t_hi = _time_variant(
                run, args.lo, args.hi, iters=args.iters)
            gcups = cells_per_rep / dt_rep / 1e9
            results[name] = {
                "sec_per_rep": dt_rep, "t_lo": t_lo, "t_hi": t_hi,
                "gcups_equiv": round(gcups, 1), "layout": lanes}
            print(f"{name:10s} {dt_rep*1e6:9.2f} us/rep  {gcups:8.1f} "
                  f"GCUPS-equiv   [{lanes}]  (t_lo={t_lo*1e3:.1f}ms "
                  f"t_hi={t_hi*1e3:.1f}ms)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report per-variant support
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name:10s} UNSUPPORTED: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "ws": args.ws, "rows": args.rows,
                       "lo": args.lo, "hi": args.hi,
                       "results": results}, f, indent=2)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
