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
