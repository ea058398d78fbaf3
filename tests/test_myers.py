"""Myers bit-vector block-banded backend: jnp == scalar oracle property
suite (the repo-wide oracle invariant), plus contract/edge coverage.

Reference: phasm/overlap :: DALIGNER stage (SURVEY.md §3.2); the backend
itself is beyond-reference (speed-of-light push, SURVEY.md §8.3 item 3).
"""
import numpy as np
import pytest

from phasm_tpu.overlap import myers as M


def random_overlap_case(rng, B=6, la_max=360, err=0.1, lb_extra=80):
    """Random dovetail-ish pairs: b is a noisy copy of a's suffix + tail."""
    LA = la_max
    LB = la_max + lb_extra
    a = np.full((B, LA), 9, dtype=np.uint8)
    b = np.full((B, LB), 9, dtype=np.uint8)
    la = np.zeros(B, dtype=np.int64)
    lb = np.zeros(B, dtype=np.int64)
    d0 = np.zeros(B, dtype=np.int64)
    for p in range(B):
        la[p] = rng.integers(la_max // 2, la_max + 1)
        aa = rng.integers(0, 4, la[p]).astype(np.uint8)
        a[p, : la[p]] = aa
        d0[p] = rng.integers(0, la[p] - 50)
        seg = aa[d0[p]:].copy()
        keep = rng.random(seg.shape) >= err / 3
        seg = seg[keep]
        noise = rng.random(seg.shape) < err
        seg = np.where(noise, (seg + rng.integers(1, 4, seg.shape)) % 4, seg)
        ins = rng.random(seg.shape) < err / 3
        parts = []
        for i, s in enumerate(seg):
            parts.append(s)
            if ins[i]:
                parts.append(rng.integers(0, 4))
        seg = np.array(parts, dtype=np.uint8)
        tail = rng.integers(0, 4, rng.integers(0, 60))
        full = np.concatenate([seg, tail])[:LB]
        lb[p] = len(full)
        b[p, : len(full)] = full
    return a, b, la, lb, d0


def as_oriented(a, b, la, lb):
    """Pack pair rows into the (oriented, lengths, a_oid, b_oid) contract."""
    B = a.shape[0]
    L = max(a.shape[1], b.shape[1])
    oriented = np.full((4 * B, L), 9, dtype=np.uint8)
    lengths = np.zeros(2 * B, dtype=np.int32)
    for p in range(B):
        oriented[2 * p, : la[p]] = a[p, : la[p]]
        oriented[2 * (B + p), : lb[p]] = b[p, : lb[p]]
    lengths[:B] = la
    lengths[B:] = lb
    a_oid = (np.arange(B, dtype=np.int32)) * 2
    b_oid = (np.arange(B, dtype=np.int32) + B) * 2
    return oriented, lengths, a_oid, b_oid


def check_batch_vs_oracle(a, b, la, lb, d0, W, J=512):
    oriented, lengths, a_oid, b_oid = as_oriented(a, b, la, lb)
    res = M.myers_overlap_batch(
        oriented, lengths, a_oid, b_oid, d0.astype(np.int32), band=W, jmax=J
    )
    for p in range(a.shape[0]):
        want = M.myers_oracle(a[p, : la[p]], b[p, : lb[p]], int(d0[p]), W)
        got = (
            int(res.a_start[p]), int(res.a_end[p]), int(res.b_start[p]),
            int(res.b_end[p]), int(res.diffs[p]), int(res.win_cost[p]),
        )
        assert got == want, (p, got, want, int(d0[p]), int(la[p]), int(lb[p]))
        # start recovery never reports a worse cost than the forward pass
        if want[4] < M.MBIG:
            fc, _, _, _ = M.myers_fwd_oracle(
                a[p, : la[p]], b[p, : lb[p]], int(d0[p]), W
            )
            assert want[4] <= fc


@pytest.mark.parametrize("W", [64, 128])
def test_myers_batch_matches_oracle(W):
    rng = np.random.default_rng(40 + W)
    for err in (0.02, 0.12, 0.25):
        a, b, la, lb, d0 = random_overlap_case(rng, B=5, la_max=320, err=err)
        check_batch_vs_oracle(a, b, la, lb, d0, W)


def test_myers_long_pairs_cross_window_marks():
    """Pairs long enough for several WINDOW marks + window shifts."""
    rng = np.random.default_rng(9)
    a, b, la, lb, d0 = random_overlap_case(
        rng, B=4, la_max=480, err=0.08, lb_extra=40
    )
    check_batch_vs_oracle(a, b, la, lb, d0, 64, J=640)


def test_myers_edge_small_and_degenerate():
    """Short reads, d0 at the edges, exact copies, all-mismatch pairs."""
    rng = np.random.default_rng(1)
    B = 6
    LA, LB = 96, 128
    a = np.full((B, LA), 9, dtype=np.uint8)
    b = np.full((B, LB), 9, dtype=np.uint8)
    la = np.array([40, 96, 64, 50, 33, 96], dtype=np.int64)
    lb = np.array([40, 30, 64, 128, 1, 96], dtype=np.int64)
    d0 = np.array([0, 90, 2, 45, 0, 0], dtype=np.int64)
    for p in range(B):
        a[p, : la[p]] = rng.integers(0, 4, la[p])
    b[0, :40] = a[0, :40]          # identical
    b[1, :30] = rng.integers(0, 4, 30)   # d0 near la: tiny suffix overlap
    b[2, :64] = (a[2, 2:66] + 1) % 4     # all-mismatch
    b[3, :128] = np.concatenate([a[3, 45:50], rng.integers(0, 4, 123)])
    b[4, :1] = a[4, :1]
    b[5, :96] = a[5, :96]
    check_batch_vs_oracle(a, b, la, lb, d0, 64, J=128)


def test_myers_extend_result_contract():
    """b_start always 0; invalid pairs get diffs == extend.BIG sentinel."""
    rng = np.random.default_rng(5)
    a, b, la, lb, d0 = random_overlap_case(rng, B=4, la_max=200, err=0.05)
    oriented, lengths, a_oid, b_oid = as_oriented(a, b, la, lb)
    res = M.myers_overlap_batch(
        oriented, lengths, a_oid, b_oid, d0.astype(np.int32), band=64,
        jmax=512,
    )
    assert (res.b_start == 0).all()
    assert (res.diffs < M.MBIG).all()
    assert (res.a_end >= res.a_start).all()


# ---------------------------------------------------------------------------
# production-engine integration (backend="myers")
# ---------------------------------------------------------------------------


def _sim():
    from phasm_tpu.sim import simulate_reads

    return simulate_reads(
        seed=7, genome_len=12_000, ploidy=1, coverage=10, mean_read_len=2500,
        error_rate=0.05, read_len_spread=0.2,
    )


def test_engine_myers_backend_recall_and_determinism():
    from phasm_tpu.overlap import OverlapConfig, overlap_reads

    rs, truth = _sim()
    cfg = OverlapConfig(backend="myers")
    t = overlap_reads(rs, cfg)
    t2 = overlap_reads(rs, cfg)
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

    # vs the W-band backend: same pairs found; on common pairs the
    # block-band cost is never worse (superset coverage) and endpoints
    # agree almost everywhere (tie-break differences only)
    tb = overlap_reads(rs, OverlapConfig(backend="jnp"))
    key = lambda tt: list(zip(tt.a_id.tolist(), tt.b_id.tolist(), tt.strand.tolist()))
    dm = dict(zip(key(t), zip(t.diffs.tolist(), t.a_end.tolist(), t.b_end.tolist())))
    db = dict(zip(key(tb), zip(tb.diffs.tolist(), tb.a_end.tolist(), tb.b_end.tolist())))
    common = set(dm) & set(db)
    assert len(common) >= 0.98 * max(len(dm), len(db))
    worse = sum(dm[k][0] > db[k][0] for k in common)
    assert worse == 0, f"{worse} pairs with worse myers cost"
    same_end = sum(dm[k][1:] == db[k][1:] for k in common) / len(common)
    assert same_end >= 0.95, f"endpoint agreement {same_end}"


def test_engine_myers_on_mesh_matches_single_device():
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.parallel import make_mesh

    rs, _ = _sim()
    cfg = OverlapConfig(backend="myers")
    t1 = overlap_reads(rs, cfg)
    t8 = overlap_reads(rs, cfg, mesh=make_mesh(8))
    assert len(t1) > 100
    assert np.array_equal(t1.as_matrix(), t8.as_matrix())


def test_full_pipeline_with_myers_backend():
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.pipeline import PipelineConfig, assemble
    from phasm_tpu.sim import simulate_reads

    rs, truth = simulate_reads(
        seed=7, genome_len=15_000, ploidy=1, coverage=12, mean_read_len=3000,
        error_rate=0.05, read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig(backend="myers"))
    cfg = PipelineConfig(
        min_overlap_length=500, max_error_rate=0.16, length_fuzz=500
    )
    res = assemble(rs, t, cfg)
    assert res.stats["n_contigs"] == 1
    assert len(res.contigs[0][1]) > 0.9 * 15_000
