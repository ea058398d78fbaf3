"""Overlap engine tests: DP oracle equivalence, seeding recall, engine e2e."""
import numpy as np
import pytest

from phasm_tpu.overlap.extend import (
    banded_overlap_batch,
    banded_overlap_np,
    banded_overlap_pallas,
)
from phasm_tpu.overlap.seeding import SeedConfig, extract_minimizers, match_seeds
from phasm_tpu.overlap import OverlapConfig, overlap_reads
from phasm_tpu.sim import simulate_reads


def _mk_pair(rng, la, lb, ovl, err, noise):
    g = rng.integers(0, 4, la + lb - ovl).astype(np.uint8)
    a = g[:la].copy()
    b = g[la - ovl : la - ovl + lb].copy()
    for p in range(ovl):
        if rng.random() < err:
            b[p] = (b[p] + rng.integers(1, 4)) % 4
    return a, b, la - ovl + noise


def _run_batch(a, b, la, lb, d0, W, jmax, fn):
    oriented = np.zeros((4, jmax), dtype=np.uint8)
    oriented[0, :la] = a
    oriented[2, :lb] = b
    lengths = np.array([la, lb], dtype=np.int32)
    res = fn(
        oriented, lengths, np.array([0]), np.array([2]),
        np.array([d0], dtype=np.int32), band=W, jmax=jmax,
    )
    return (
        int(res.a_start[0]), int(res.a_end[0]), 0,
        int(res.b_end[0]), int(res.diffs[0]),
    )


@pytest.mark.parametrize("seed", range(6))
def test_extend_batch_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    la = int(rng.integers(120, 250))
    lb = int(rng.integers(120, 250))
    ovl = int(rng.integers(40, min(la, lb)))
    err = float(rng.choice([0.0, 0.05, 0.15]))
    noise = int(rng.integers(-8, 9))
    a, b, d0 = _mk_pair(rng, la, lb, ovl, err, noise)
    W = 32
    want = banded_overlap_np(a, b, d0, W)
    got = _run_batch(a, b, la, lb, d0, W, 256, banded_overlap_batch)
    assert got == want


@pytest.mark.parametrize("seed", range(2))
def test_extend_pallas_interpret_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    la, lb = 150, 160
    ovl = int(rng.integers(50, 140))
    a, b, d0 = _mk_pair(rng, la, lb, ovl, 0.08, int(rng.integers(-4, 5)))
    W = 32
    want = banded_overlap_np(a, b, d0, W)
    got = _run_batch(a, b, la, lb, d0, W, 256, banded_overlap_pallas)
    assert got == want


def test_extend_no_overlap_rejected():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 200).astype(np.uint8)
    b = rng.integers(0, 4, 200).astype(np.uint8)
    got = _run_batch(a, b, 200, 200, 100, 32, 256, banded_overlap_batch)
    # random sequences still align *somehow*, but with diff rate near 50%
    assert got[4] > 0.25 * max(got[1] - got[0], 1)


def test_seeding_recall_on_true_overlaps():
    rs, truth = simulate_reads(
        seed=5, genome_len=12_000, ploidy=1, coverage=10, mean_read_len=2500,
        error_rate=0.03, read_len_spread=0.2,
    )
    cfg = SeedConfig()
    seeds = extract_minimizers(rs.codes, rs.lengths, cfg)
    cands = match_seeds(seeds, rs.lengths, cfg)
    got = set(zip(cands.a_id.tolist(), cands.b_id.tolist()))
    pos = truth.read_pos.astype(np.int64)
    end = pos + rs.lengths
    want = {
        (i, j)
        for i in range(rs.n_reads)
        for j in range(i + 1, rs.n_reads)
        if min(end[i], end[j]) - max(pos[i], pos[j]) >= 1000
    }
    assert want, "fixture must contain true overlaps"
    recall = len(got & want) / len(want)
    assert recall >= 0.95, f"seeding recall {recall}"


def test_engine_noisy_recall_and_determinism():
    rs, truth = simulate_reads(
        seed=7, genome_len=12_000, ploidy=1, coverage=10, mean_read_len=2500,
        error_rate=0.05, read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig())
    t2 = overlap_reads(rs, OverlapConfig())
    assert np.array_equal(t.as_matrix(), t2.as_matrix())

    pos = truth.read_pos.astype(np.int64)
    end = pos + rs.lengths
    want = {
        (i, j)
        for i in range(rs.n_reads)
        for j in range(i + 1, rs.n_reads)
        if min(end[i], end[j]) - max(pos[i], pos[j]) >= 1500
    }
    got = set(zip(t.a_id.tolist(), t.b_id.tolist()))
    recall = len(got & want) / max(len(want), 1)
    assert recall >= 0.95, f"engine recall {recall}"
    er = t.diffs / np.maximum(t.overlap_length(), 1)
    assert 0.05 < float(np.median(er)) < 0.16


def test_full_pipeline_from_reads_noisy_haploid():
    from phasm_tpu.pipeline import PipelineConfig, assemble

    rs, truth = simulate_reads(
        seed=7, genome_len=15_000, ploidy=1, coverage=12, mean_read_len=3000,
        error_rate=0.05, read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig())
    cfg = PipelineConfig(min_overlap_length=500, max_error_rate=0.16, length_fuzz=500)
    res = assemble(rs, t, cfg)
    assert res.stats["n_contigs"] == 1
    assert len(res.contigs[0][1]) > 0.9 * 15_000


def test_segmented_kernel_matches_plain_interpret():
    """Segmented Pallas kernel (interpret) == single-shot DP across segments."""
    import jax
    import numpy as np
    from phasm_tpu.overlap.extend import (
        _make_pallas_extend_seg,
        banded_overlap_batch,
        prepare_pair_tensors,
    )

    rng = np.random.default_rng(3)
    la = lb = 300
    W, SEG, NSEG = 16, 128, 3  # 384 columns over 3 segments
    oriented = np.zeros((4, 512), dtype=np.uint8)
    g = rng.integers(0, 4, 500).astype(np.uint8)
    oriented[0, :la] = g[:la]
    b = g[100 : 100 + lb].copy()
    noise = rng.random(lb) < 0.05
    b = np.where(noise, (b + rng.integers(1, 4, lb)) % 4, b).astype(np.uint8)
    oriented[2, :lb] = b
    lengths = np.array([la, lb], dtype=np.int32)
    a_oid = np.zeros(128, dtype=np.int64)
    b_oid = np.full(128, 2, dtype=np.int64)
    d0 = np.full(128, 100, dtype=np.int32)

    want = banded_overlap_batch(
        oriented, lengths, a_oid, b_oid, d0, band=W, jmax=SEG * NSEG
    )

    a2, b2, laa, lbb = prepare_pair_tensors(
        oriented, lengths, a_oid, b_oid, d0, W, SEG * NSEG
    )
    # build segmented halo layout on host (mirrors DeviceExtender)
    M = 128
    tt = np.arange(NSEG * (SEG + W))
    ai = d0[:, None] + (tt // (SEG + W))[None, :] * SEG + (tt % (SEG + W))[None, :] - W // 2
    a_rows = oriented[a_oid]
    a_ok = (ai >= 0) & (ai < laa[:, None])
    a2s = np.where(a_ok, a_rows[np.arange(M)[:, None], np.clip(ai, 0, 511)], 254)
    run = _make_pallas_extend_seg(W, SEG, NSEG, 128, interpret=True)
    out = np.asarray(
        run(
            d0.astype(np.int32)[None, :], laa[None, :], lbb[None, :],
            np.ascontiguousarray(a2s.T).astype(np.int32),
            np.ascontiguousarray(b2.T).astype(np.int32),
        )
    )
    assert np.array_equal(out[0], want.diffs)
    assert np.array_equal(out[1], want.a_start)
    assert np.array_equal(out[2], want.a_end)
    assert np.array_equal(out[3], want.b_end)


def test_segmented_kernel_int8_inputs_match_int32():
    """int8 band tensors (the production path: 4x less HBM/VMEM traffic)
    must be bit-identical to the int32 kernel and the jnp oracle."""
    import numpy as np
    from phasm_tpu.overlap.extend import (
        _make_pallas_extend_seg,
        banded_overlap_batch,
        prepare_pair_tensors,
    )

    rng = np.random.default_rng(7)
    W, SEG, NSEG = 64, 128, 3  # W%32==0 as int8 requires
    cols = SEG * NSEG
    la = lb = 350
    oriented = np.zeros((4, 512), dtype=np.uint8)
    g = rng.integers(0, 4, 500).astype(np.uint8)
    oriented[0, :la] = g[:la]
    b = g[40 : 40 + lb].copy()
    noise = rng.random(lb) < 0.08
    b = np.where(noise, (b + rng.integers(1, 4, lb)) % 4, b).astype(np.uint8)
    oriented[2, :lb] = b
    lengths = np.array([la, lb], dtype=np.int32)
    M = 128
    a_oid = np.zeros(M, dtype=np.int64)
    b_oid = np.full(M, 2, dtype=np.int64)
    d0 = np.full(M, 40, dtype=np.int32)

    want = banded_overlap_batch(
        oriented, lengths, a_oid, b_oid, d0, band=W, jmax=cols
    )
    assert int(want.diffs[0]) < (1 << 15), "fixture must align"

    _, b2, laa, lbb = prepare_pair_tensors(
        oriented, lengths, a_oid, b_oid, d0, W, cols
    )
    tt = np.arange(NSEG * (SEG + W))
    ai = d0[:, None] + (tt // (SEG + W))[None, :] * SEG + (tt % (SEG + W))[None, :] - W // 2
    a_rows = oriented[a_oid]
    a_ok = (ai >= 0) & (ai < laa[:, None])
    a2s = np.where(a_ok, a_rows[np.arange(M)[:, None], np.clip(ai, 0, 511)], 254)
    run8 = _make_pallas_extend_seg(W, SEG, NSEG, 128, interpret=True, int8_in=True)
    out8 = np.asarray(
        run8(
            d0.astype(np.int32)[None, :], laa[None, :], lbb[None, :],
            np.ascontiguousarray(a2s.T).astype(np.uint8).astype(np.int8),
            np.ascontiguousarray(b2.T).astype(np.int8),
        )
    )
    assert np.array_equal(out8[0], want.diffs)
    assert np.array_equal(out8[1], want.a_start)
    assert np.array_equal(out8[2], want.a_end)
    assert np.array_equal(out8[3], want.b_end)


def test_segmented_kernel_long_columns_past_32768():
    """Regression: round 1 packed the i==la endpoint as cost<<16 | (s_rel +
    2^15 - j_end); for j_end > 32768 the low field underflowed into the cost
    bits, corrupting long dovetails (ADVICE r1).  The register-carried fix
    must match the jnp DP oracle with the winning endpoint past column 2^15."""
    import numpy as np
    from phasm_tpu.overlap.extend import (
        _make_pallas_extend_seg,
        banded_overlap_batch,
        prepare_pair_tensors,
    )

    rng = np.random.default_rng(11)
    W, SEG, NSEG = 16, 4096, 9  # 36864 columns > 2^15
    cols = SEG * NSEG
    d0v = 900
    la, lb = 33940, 33400  # la-endpoint at j = la - d0 ± band ≈ 33040 > 32768
    g = rng.integers(0, 4, 36000).astype(np.uint8)
    a = g[:la].copy()
    b = g[d0v : d0v + lb].copy()
    noise = rng.random(lb) < 0.05
    b = np.where(noise, (b + rng.integers(1, 4, lb)) % 4, b).astype(np.uint8)
    oriented = np.zeros((4, cols), dtype=np.uint8)
    oriented[0, :la] = a
    oriented[2, :lb] = b
    lengths = np.array([la, lb], dtype=np.int32)
    M = 128
    a_oid = np.zeros(M, dtype=np.int64)
    b_oid = np.full(M, 2, dtype=np.int64)
    d0 = np.full(M, d0v, dtype=np.int32)

    want = banded_overlap_batch(
        oriented, lengths, a_oid, b_oid, d0, band=W, jmax=cols
    )
    assert int(want.a_end[0]) == la and int(want.b_end[0]) > 32768, "fixture"
    assert 0 < int(want.diffs[0]) < (1 << 15), "fixture must not saturate"

    _, b2, laa, lbb = prepare_pair_tensors(
        oriented, lengths, a_oid, b_oid, d0, W, cols
    )
    tt = np.arange(NSEG * (SEG + W))
    ai = d0[:, None] + (tt // (SEG + W))[None, :] * SEG + (tt % (SEG + W))[None, :] - W // 2
    a_rows = oriented[a_oid]
    a_ok = (ai >= 0) & (ai < laa[:, None])
    a2s = np.where(a_ok, a_rows[np.arange(M)[:, None], np.clip(ai, 0, cols - 1)], 254)
    run = _make_pallas_extend_seg(W, SEG, NSEG, 128, interpret=True)
    out = np.asarray(
        run(
            d0.astype(np.int32)[None, :], laa[None, :], lbb[None, :],
            np.ascontiguousarray(a2s.T).astype(np.int32),
            np.ascontiguousarray(b2.T).astype(np.int32),
        )
    )
    assert np.array_equal(out[0], want.diffs)
    assert np.array_equal(out[1], want.a_start)
    assert np.array_equal(out[2], want.a_end)
    assert np.array_equal(out[3], want.b_end)


def test_wide_band_kernels_match_oracle():
    """Bands 256/512 (the engine's adaptive escalation ladder): the widened
    pack field and two-reduce end key must stay bit-identical to the scalar
    oracle, and the window statistic to the jnp reference.

    Guards the round-2 fix for indel diagonal drift: a 7 kb pair at ~10%
    indels drifts sigma ~26 rows, so the escalation needs bands past 128 —
    which overflowed the round-1 packing (PACK=128, mid<<7|w end key)."""
    import numpy as np
    from phasm_tpu.overlap.extend import (
        _make_pallas_extend_seg,
        banded_overlap_batch,
        banded_overlap_np,
        prepare_pair_tensors,
    )

    rng = np.random.default_rng(11)
    n = 12
    L = 700
    cases = []
    for _ in range(n):
        la_i = int(rng.integers(L // 2, L))
        a = rng.integers(0, 4, la_i).astype(np.uint8)
        d = int(rng.integers(0, la_i - 80))
        seg = a[d:].copy()
        keep = rng.random(seg.shape) >= 0.06           # deletions
        seg = seg[keep]
        ins = rng.random(seg.shape) < 0.06             # insertions
        out = []
        for i, s in enumerate(seg):
            out.append(int(s))
            if ins[i]:
                out.append(int(rng.integers(0, 4)))
        b = np.array(out, dtype=np.uint8)
        sub = rng.random(len(b)) < 0.03
        b = ((b + sub * rng.integers(1, 4, len(b))) % 4).astype(np.uint8)
        cases.append((a, b, d))

    Lp = max(max(len(a), len(b)) for a, b, _ in cases)
    oriented = np.zeros((4 * n, Lp), dtype=np.uint8)
    lengths = np.zeros(2 * n, dtype=np.int64)
    for i, (a, b, _) in enumerate(cases):
        oriented[4 * i, : len(a)] = a
        oriented[4 * i + 2, : len(b)] = b
        lengths[2 * i] = len(a)
        lengths[2 * i + 1] = len(b)
    a_oid = np.repeat(np.arange(n) * 4, 1)
    b_oid = a_oid + 2
    d0 = np.array([d for _, _, d in cases], dtype=np.int64)

    for W in (256, 512):
        jmax = 1024
        res = banded_overlap_batch(
            oriented, lengths, a_oid, b_oid, d0, band=W, jmax=jmax
        )
        for i, (a, b, d) in enumerate(cases):
            want = banded_overlap_np(a, b, d, W)
            got = (
                int(res.a_start[i]), int(res.a_end[i]),
                0, int(res.b_end[i]), int(res.diffs[i]),
            )
            assert got == want, (W, i, got, want)

        # segmented kernel (interpret, padded batch of 128) == jnp reference
        M = 128
        pad = M - n
        ao = np.concatenate([a_oid, np.zeros(pad, np.int64)])
        bo = np.concatenate([b_oid, np.full(pad, 2, np.int64)])
        dd = np.concatenate([d0, np.zeros(pad, np.int64)]).astype(np.int32)
        a2, b2, laa, lbb = prepare_pair_tensors(
            oriented, lengths, ao, bo, dd, W, jmax
        )
        SEG, NSEG = 512, 2
        tt = np.arange(NSEG * (SEG + W))
        ai = (
            dd[:, None]
            + (tt // (SEG + W))[None, :] * SEG
            + (tt % (SEG + W))[None, :]
            - W // 2
        )
        a_rows = oriented[ao]
        a_ok = (ai >= 0) & (ai < laa[:, None])
        a2s = np.where(
            a_ok, a_rows[np.arange(M)[:, None], np.clip(ai, 0, Lp - 1)], 254
        )
        run = _make_pallas_extend_seg(W, SEG, NSEG, 128, interpret=True)
        out = np.asarray(
            run(
                dd[None, :], laa[None, :], lbb[None, :],
                np.ascontiguousarray(a2s.T).astype(np.int32),
                np.ascontiguousarray(b2.T).astype(np.int32),
            )
        )[:, :n]
        assert np.array_equal(out[0], res.diffs), W
        assert np.array_equal(out[1], res.a_start), W
        assert np.array_equal(out[2], res.a_end), W
        assert np.array_equal(out[3], res.b_end), W
        assert np.array_equal(out[4], res.win_cost), W


def test_blocked_overlap_bit_identical():
    """overlap_reads_blocked (DALIGNER-style block tiles, seed-match
    pipelined with device extension) == overlap_reads, bit-exact: per-pair
    seed histograms are tile-local and the escalation + dedup are
    candidate-order-insensitive."""
    import numpy as np

    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.overlap.engine import overlap_reads_blocked
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=13, genome_len=9_000, ploidy=2, coverage=10, mean_read_len=900,
        error_rate=0.05, read_len_spread=0.2,
    )
    cfg = OverlapConfig(backend="jnp")
    t1 = overlap_reads(rs, cfg)
    for nb in (1, 3, 4):
        tb = overlap_reads_blocked(rs, cfg, n_blocks=nb)
        assert len(t1) > 100
        assert np.array_equal(t1.as_matrix(), tb.as_matrix()), f"n_blocks={nb}"
        assert np.array_equal(t1.win, tb.win), f"n_blocks={nb}"


def test_blocked_overlap_bit_identical_repeat_rich():
    """Blocked == unblocked where the max_occ repeat filter actually FIRES.

    A k-mer globally over max_occ can fall under max_occ inside a tile's
    seed subset; without the global pre-drop the blocked engine would emit
    extra repeat-induced candidates (the DALIGNER global-repeat-mask
    property).  max_occ is set below the dataset coverage so ordinary
    genomic k-mers exceed it globally but not per-tile."""
    import numpy as np

    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.overlap.engine import overlap_reads_blocked
    from phasm_tpu.overlap.seeding import SeedConfig, extract_minimizers
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=23, genome_len=8_000, ploidy=1, coverage=18, mean_read_len=900,
        error_rate=0.03, read_len_spread=0.2,
    )
    cfg = OverlapConfig(
        backend="jnp",
        seed=SeedConfig(max_occ=8),
    )
    # precondition: the filter must actually fire globally while per-tile
    # subsets (~1/2 the reads for n_blocks=4 cross tiles) can dip under it
    seeds = extract_minimizers(rs.codes, rs.lengths.astype(np.int32), cfg.seed)
    _, cnt = np.unique(seeds.canon, return_counts=True)
    assert (cnt > cfg.seed.max_occ).any(), "test genome never trips max_occ"
    assert ((cnt > cfg.seed.max_occ) & (cnt <= 2 * cfg.seed.max_occ)).any(), (
        "need k-mers that fall under max_occ in a half-size tile subset"
    )

    t1 = overlap_reads(rs, cfg)
    assert len(t1) > 50
    for nb in (2, 4):
        tb = overlap_reads_blocked(rs, cfg, n_blocks=nb)
        assert np.array_equal(t1.as_matrix(), tb.as_matrix()), f"n_blocks={nb}"
        assert np.array_equal(t1.win, tb.win), f"n_blocks={nb}"
