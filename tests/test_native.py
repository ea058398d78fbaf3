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


def test_candidates_presorted_identical(readset):
    """The production path — sort_seeds + presorted emission + C++ radix
    histogram — yields the exact same Candidates as the numpy reference."""
    from phasm_tpu.overlap.seeding import sort_seeds

    cfg = SeedConfig()
    s = extract_minimizers(readset.codes, readset.lengths, cfg)
    c_np = match_seeds(s, readset.lengths, cfg, use_native=False)
    ss = sort_seeds(s, k=cfg.k)
    # sortedness invariant the C++ presorted path relies on
    assert np.all(np.diff(ss.canon.astype(np.uint64)) >= 0)
    c_cc = match_seeds(ss, readset.lengths, cfg, use_native=True,
                       presorted=True)
    for f in ("a_id", "b_id", "strand", "diag", "n_seeds"):
        assert np.array_equal(getattr(c_np, f), getattr(c_cc, f)), f


def test_radix_sort_order():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 63, 100_000, dtype=np.int64).astype(np.uint64)
    keys[::7] = keys[0]  # duplicates: stability must match argsort
    got = native.sort_u64_order_native(keys)
    want = np.argsort(keys, kind="stable")
    assert np.array_equal(got, want)


def _edit_dist(a, b):
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[:-1] + (a[i - 1] != b), prev[1:] + 1)
        for j in range(1, m + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[m])


def _gap_case(seed, gap_len, n_truth=1200, read_len=400, err=0.05, cov=12):
    from phasm_tpu.sim import mutate_read

    rng = np.random.default_rng(seed)
    truth = rng.integers(0, 4, n_truth).astype(np.uint8)
    gap0 = n_truth // 2
    draft = np.concatenate([truth[:gap0], truth[gap0 + gap_len:]]).copy()
    derr = rng.random(len(draft)) < 0.01
    draft[derr] = (draft[derr] + rng.integers(1, 4, int(derr.sum()))) % 4
    reads, offs = [], []
    for _ in range(int(cov * n_truth / read_len)):
        p = int(rng.integers(0, n_truth - read_len))
        reads.append(mutate_read(rng, truth[p : p + read_len], err))
        offs.append(p if p < gap0 else p - gap_len)
    return truth, draft, reads, offs


def test_polish_oracle_equality():
    """One round of native polish == pure-python oracle, bit-identical,
    on a case exercising anchors, the affine DP, exact-segment emission
    AND the medoid splice path (30-base draft gap)."""
    from phasm_tpu.polish_oracle import polish_oracle

    for seed, gap in ((3, 0), (4, 6), (5, 30)):
        truth, draft, reads, offs = _gap_case(seed, gap, n_truth=900,
                                              read_len=300, cov=10)
        nat = native.polish_native(draft, reads, offs, band=64, min_cov=3,
                                   iters=1)
        ora = polish_oracle(draft, reads, offs, band=64, min_cov=3)
        assert nat is not None
        assert np.array_equal(nat, ora), (seed, gap, len(nat), len(ora))


def test_polish_restores_multibase_gaps():
    """Unitig-junction-style draft gaps (the round-4 clustered-deletion
    residual) are restored by the medoid splice + iteration: final edit
    distance to truth is ~machinery floor regardless of gap size."""
    for gap in (8, 30, 80):
        truth, draft, reads, offs = _gap_case(11, gap, n_truth=2500,
                                              read_len=700, err=0.06, cov=16)
        d0 = _edit_dist(truth, draft)
        out = native.polish_native(draft, reads, offs, band=128, min_cov=3,
                                   iters=3)
        d = _edit_dist(truth, out)
        assert d0 >= gap  # the gap is in the draft
        assert d <= 8, (gap, d0, d)


def test_polish_deterministic():
    truth, draft, reads, offs = _gap_case(7, 20)
    a = native.polish_native(draft, reads, offs, iters=2)
    b = native.polish_native(draft, reads, offs, iters=2)
    assert np.array_equal(a, b)


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
