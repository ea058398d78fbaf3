"""C++ host-kernel parity tests (native == numpy, bit-identical)."""
import numpy as np
import pytest

from phasm_tpu import dna, native
from phasm_tpu.overlap.seeding import (
    SeedConfig,
    emit_pairs_np,
    extract_minimizers,
    match_seeds,
)
from phasm_tpu.sim import simulate_reads

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


@pytest.fixture(scope="module")
def readset():
    rs, _ = simulate_reads(
        seed=11, genome_len=20_000, ploidy=2, coverage=8, mean_read_len=3000,
        error_rate=0.05,
    )
    return rs


def test_minimizers_bit_identical(readset):
    cfg = SeedConfig()
    s_np = extract_minimizers(readset.codes, readset.lengths, cfg, use_native=False)
    s_cc = extract_minimizers(readset.codes, readset.lengths, cfg, use_native=True)
    assert np.array_equal(s_np.read_id, s_cc.read_id)
    assert np.array_equal(s_np.pos, s_cc.pos)
    assert np.array_equal(s_np.canon, s_cc.canon)
    assert np.array_equal(s_np.orient, s_cc.orient)


def test_minimizers_short_reads():
    from phasm_tpu.reads import ReadSet

    # reads shorter than k, exactly k, shorter than window
    rs = ReadSet.from_sequences(["ACGT", "A" * 15, "ACGTACGTACGTACGTAC"])
    cfg = SeedConfig(k=15, window=8)
    s_np = extract_minimizers(rs.codes, rs.lengths, cfg, use_native=False)
    s_cc = extract_minimizers(rs.codes, rs.lengths, cfg, use_native=True)
    assert np.array_equal(s_np.read_id, s_cc.read_id)
    assert np.array_equal(s_np.pos, s_cc.pos)
    assert np.array_equal(s_np.canon, s_cc.canon)


def test_pair_emission_same_set(readset):
    cfg = SeedConfig()
    s = extract_minimizers(readset.codes, readset.lengths, cfg)
    a1, b1, st1, d1 = emit_pairs_np(s, readset.lengths, cfg)
    a2, b2, st2, d2 = native.match_seed_pairs_native(
        s.read_id, s.pos, s.canon, s.orient, readset.lengths, cfg.k, cfg.max_occ
    )
    k1 = sorted(zip(a1.tolist(), b1.tolist(), st1.tolist(), d1.tolist()))
    k2 = sorted(zip(a2.tolist(), b2.tolist(), st2.tolist(), d2.tolist()))
    assert k1 == k2


def test_candidates_identical(readset):
    cfg = SeedConfig()
    s = extract_minimizers(readset.codes, readset.lengths, cfg)
    c_np = match_seeds(s, readset.lengths, cfg, use_native=False)
    c_cc = match_seeds(s, readset.lengths, cfg, use_native=True)
    for f in ("a_id", "b_id", "strand", "diag", "n_seeds"):
        assert np.array_equal(getattr(c_np, f), getattr(c_cc, f)), f


def test_pack_2bit_native():
    import ctypes

    lib = native.get_lib()
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 256).astype(np.uint8)
    out = np.zeros(64, dtype=np.uint8)
    lib.pack_2bit(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        256,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert np.array_equal(out, dna.pack_2bit(codes))
