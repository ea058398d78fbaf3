"""Pallas Myers kernels == jnp Myers cores, bit-exact (interpret mode on
CPU; the same pallas_call compiles for TPU in production).

The jnp cores are themselves pinned to the scalar oracle by
tests/test_myers.py, so equality here chains the Pallas kernels to
``myers.myers_oracle`` (the repo-wide oracle invariant).

Reference: phasm/overlap :: DALIGNER stage (SURVEY.md §3.2).
"""
import numpy as np
import pytest

from phasm_tpu.overlap import myers as M
from phasm_tpu.overlap import myers_pallas as MP

from test_myers import random_overlap_case

BP = MP.BLK_ROWS * 128  # 1024-pair kernel block


def _pad_case(a, b, la, lb, d0, B_to=BP):
    """Pad a small case to the kernel's 1024-pair block with benign pairs
    (la=1, lb=0, d0=0 — no valid endpoint, exercised by the sentinel
    path)."""
    B = a.shape[0]
    pad = B_to - B
    a = np.pad(a, ((0, pad), (0, 0)), constant_values=9)
    b = np.pad(b, ((0, pad), (0, 0)), constant_values=9)
    a[B:, 0] = 0
    la = np.pad(la, (0, pad), constant_values=1)
    lb = np.pad(lb, (0, pad), constant_values=0)
    d0 = np.pad(d0, (0, pad), constant_values=0)
    return a, b, la, lb, d0


def _run_both(a, b, la, lb, d0, W, J):
    la = la.astype(np.int32)
    lb = lb.astype(np.int32)
    d0 = d0.astype(np.int32)
    want = M._myers_pair_core(a, b, la, lb, d0, W, J)
    got = MP.myers_pallas_pair_core(a, b, la, lb, d0, W, J, interpret=True)
    names = ("cost", "i0", "iend", "jend", "win")
    for n, w, g in zip(names, want, got):
        w = np.asarray(w)
        g = np.asarray(g)
        bad = np.nonzero(w != g)[0]
        assert bad.size == 0, (
            n, bad[:10], w[bad[:10]], g[bad[:10]],
            la[bad[:10]], lb[bad[:10]], d0[bad[:10]],
        )


@pytest.mark.parametrize("W", [64, 128])
def test_pallas_matches_jnp_random(W):
    rng = np.random.default_rng(80 + W)
    for err in (0.03, 0.15):
        a, b, la, lb, d0 = random_overlap_case(rng, B=24, la_max=320, err=err)
        a, b, la, lb, d0 = _pad_case(a, b, la, lb, d0)
        _run_both(a, b, la, lb, d0, W, 512)


def test_pallas_matches_jnp_long_marks():
    """Long pairs: several window shifts + both mark grids exercised."""
    rng = np.random.default_rng(17)
    a, b, la, lb, d0 = random_overlap_case(
        rng, B=16, la_max=480, err=0.08, lb_extra=40
    )
    a, b, la, lb, d0 = _pad_case(a, b, la, lb, d0)
    _run_both(a, b, la, lb, d0, 64, 640)


def test_pallas_matches_jnp_edge_cases():
    """Degenerate pairs: identical, all-mismatch, tiny, lb > J bucket."""
    rng = np.random.default_rng(3)
    B = 8
    LA, LB = 160, 700
    a = np.full((B, LA), 9, dtype=np.uint8)
    b = np.full((B, LB), 9, dtype=np.uint8)
    la = np.array([40, 96, 64, 50, 33, 96, 160, 128], dtype=np.int64)
    lb = np.array([40, 30, 64, 128, 1, 96, 700, 60], dtype=np.int64)
    d0 = np.array([0, 90, 2, 45, 0, 0, 10, 100], dtype=np.int64)
    for p in range(B):
        a[p, : la[p]] = rng.integers(0, 4, la[p])
    b[0, :40] = a[0, :40]
    b[1, :30] = rng.integers(0, 4, 30)
    b[2, :64] = (a[2, 2:66] + 1) % 4
    b[3, :128] = np.concatenate([a[3, 45:50], rng.integers(0, 4, 123)])
    b[4, :1] = a[4, :1]
    b[5, :96] = a[5, :96]
    b[6, :700] = rng.integers(0, 4, 700)  # lb > J: end never reached
    b[7, :60] = rng.integers(0, 4, 60)
    a, b, la, lb, d0 = _pad_case(a, b, la, lb, d0)
    _run_both(a, b, la, lb, d0, 64, 512)


# ---------------------------------------------------------------------------
# table-driven window construction (fast prep, round 3) == gather-based prep
# ---------------------------------------------------------------------------


def _as_oriented(a, b, la, lb):
    """Pack per-pair rows into an oriented matrix: pair p's a-row is read p
    (oid 2p), its b-row is read B+p (oid 2(B+p)); lengths = concat(la, lb)."""
    B, LA = a.shape
    LB = b.shape[1]
    L = max(LA, LB)
    oriented = np.full((4 * B, L), 9, dtype=np.uint8)
    oriented[2 * np.arange(B), :LA] = a
    oriented[2 * (B + np.arange(B)), :LB] = b
    a_oid = (2 * np.arange(B)).astype(np.int32)
    b_oid = (2 * (B + np.arange(B))).astype(np.int32)
    lengths = np.concatenate([la, lb]).astype(np.int32)
    return oriented, lengths, a_oid, b_oid


def _run_tab_vs_gather(a, b, la, lb, d0, W, J):
    """All three table paths must agree bit-exactly with the gather path:
    the round-3 tab path AND the round-4 blocked-table tab2 path (coarse
    fetch blocks + in-kernel residual barrel/funnel)."""
    import jax

    from phasm_tpu.overlap.myers import (
        build_myers_tables,
        build_myers_tables_blocked,
    )

    oriented, lengths, a_oid, b_oid = _as_oriented(a, b, la, lb)
    d0 = d0.astype(np.int32)
    want = MP.myers_pallas_compute(
        oriented, lengths, a_oid, b_oid, d0, W=W, J=J, interpret=True
    )
    t = jax.jit(build_myers_tables)(oriented, lengths)
    got = MP.myers_pallas_compute_tab(
        t["peq"], t["bpk"], lengths, a_oid, b_oid, d0,
        LA=oriented.shape[1], W=W, J=J, interpret=True,
    )
    t2 = jax.jit(build_myers_tables_blocked)(oriented, lengths)
    got2 = MP.myers_pallas_compute_tab2(
        t2["win"], lengths, a_oid, b_oid, d0,
        LA=oriented.shape[1], W=W, J=J, interpret=True,
    )
    names = ("cost", "i0", "iend", "jend", "win")
    for tag, res in (("tab", got), ("tab2", got2)):
        for n, w, g in zip(names, want, res):
            w = np.asarray(w)
            g = np.asarray(g)
            bad = np.nonzero(w != g)[0]
            assert bad.size == 0, (
                tag, n, bad[:10], w[bad[:10]], g[bad[:10]],
                la[bad[:10]], lb[bad[:10]], d0[bad[:10]],
            )


@pytest.mark.parametrize("W", [64, 128])
def test_tab_prep_matches_gather_random(W):
    rng = np.random.default_rng(800 + W)
    for err in (0.03, 0.15):
        a, b, la, lb, d0 = random_overlap_case(rng, B=24, la_max=320, err=err)
        a, b, la, lb, d0 = _pad_case(a, b, la, lb, d0)
        _run_tab_vs_gather(a, b, la, lb, d0, W, 512)


def test_tab_prep_matches_gather_edges():
    """Anchor extremes: d0 = 0 (m0 = -2), d0 near la (max fwd shift), long
    b (lb > J), tiny reads — exercises front-pad words, funnel deltas 0/31,
    and the k < -m0r whole-word rev mask."""
    rng = np.random.default_rng(5)
    B = 8
    LA, LB = 256, 700
    a = np.full((B, LA), 9, dtype=np.uint8)
    b = np.full((B, LB), 9, dtype=np.uint8)
    la = np.array([200, 256, 64, 250, 33, 96, 256, 128], dtype=np.int64)
    lb = np.array([200, 30, 64, 128, 1, 96, 700, 60], dtype=np.int64)
    d0 = np.array([0, 220, 2, 245, 0, 0, 10, 100], dtype=np.int64)
    for p in range(B):
        a[p, : la[p]] = rng.integers(0, 4, la[p])
    b[0, :200] = np.concatenate([a[0, :150], rng.integers(0, 4, 50)])
    b[1, :30] = a[1, 220:250]
    b[2, :64] = (a[2, 2:66] + 1) % 4
    b[3, :5] = a[3, 245:250]
    b[4, :1] = a[4, :1]
    b[5, :96] = a[5, :96]
    b[6, :700] = rng.integers(0, 4, 700)
    b[7, :60] = a[7, 100:160]
    a, b, la, lb, d0 = _pad_case(a, b, la, lb, d0)
    _run_tab_vs_gather(a, b, la, lb, d0, 64, 512)


# ---------------------------------------------------------------------------
# production-engine integration (backend="myers_pallas")
# ---------------------------------------------------------------------------


def test_engine_myers_pallas_matches_myers():
    """DeviceExtender(backend="myers_pallas") == backend="myers" bit-exactly
    through the full production engine (same block-band semantics; kernels
    chained to the oracle by the suites above)."""
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=11, genome_len=5_000, ploidy=1, coverage=8, mean_read_len=700,
        error_rate=0.05, read_len_spread=0.2,
    )
    t_jnp = overlap_reads(rs, OverlapConfig(backend="myers"))
    t_pl = overlap_reads(rs, OverlapConfig(backend="myers_pallas"))
    assert len(t_jnp) > 50
    assert np.array_equal(t_jnp.as_matrix(), t_pl.as_matrix())


def test_myers_vmem_gate_routes_long_j_to_wband():
    """(W, J) combos whose kernel streams exceed scoped VMEM must NOT route
    to the myers kernels (a J=12288 rung OOM'd at 18.2 MB vs the 16 MB v5e
    scoped limit — LADDER r3 c3); they fall back to the segmented W-band
    family, which streams columns through fixed VMEM windows."""
    from phasm_tpu.overlap.extend import DeviceExtender
    from phasm_tpu.overlap.myers_pallas import kernel_vmem_bytes

    # the observed OOM shape is over budget; the driver workload fits
    assert kernel_vmem_bytes(64, 12288) > DeviceExtender.MYERS_VMEM_BUDGET
    assert kernel_vmem_bytes(64, 2048) <= DeviceExtender.MYERS_VMEM_BUDGET
    assert kernel_vmem_bytes(64, 8192) <= DeviceExtender.MYERS_VMEM_BUDGET
    assert kernel_vmem_bytes(128, 8192) <= DeviceExtender.MYERS_VMEM_BUDGET

    oriented = np.zeros((4, 256), dtype=np.uint8)
    lengths = np.full(2, 256, dtype=np.int32)
    ext = DeviceExtender(oriented, lengths, band=64, backend="myers_pallas")
    assert ext._is_tab_run(None, 2048)
    assert ext._is_tab_run(None, 8192)
    assert not ext._is_tab_run(None, 12288)   # -> W-band segmented kernel
    assert not ext._is_tab_run(256, 2048)     # over MYERS_MAX_BAND
    # tiered routing: tab2 (blocked tables, in-kernel barrel) for the short
    # buckets; the round-3 XLA-barrel tab path for mid-J; W-band beyond
    assert ext._is_tab2_run(None, 2048)
    assert ext._is_tab2_run(128, 1024)
    assert not ext._is_tab2_run(None, 4096)   # -> round-3 tab path
    assert not ext._is_tab2_run(256, 2048)


def test_engine_two_datasets_one_process_no_stale_geometry():
    """REGRESSION (round-4 ladder): the jitted table computes bake the
    oriented-matrix width (table geometry) into their closures; the
    process-level run cache must therefore key on LA.  Without it, the
    SECOND dataset in a process reused the first's geometry — garbage
    windows, 60-95% of alignments lost (ladder rungs c2-c6 collapsed
    while c1, which ran first, stayed bit-correct)."""
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.sim import simulate_reads

    # two read sets with clearly different max read lengths
    rs_long, _ = simulate_reads(
        seed=21, genome_len=6_000, ploidy=1, coverage=6, mean_read_len=1500,
        error_rate=0.04, read_len_spread=0.2,
    )
    rs_short, _ = simulate_reads(
        seed=22, genome_len=6_000, ploidy=1, coverage=8, mean_read_len=600,
        error_rate=0.04, read_len_spread=0.2,
    )
    # prime the process caches with the LONG dataset, then run the short
    # one; each must match its own backend="myers" golden (same block-band
    # semantics, no geometry baked in its closures)
    for rs in (rs_long, rs_short):
        t_pl = overlap_reads(rs, OverlapConfig(min_overlap=300,
                                               backend="myers_pallas"))
        t_my = overlap_reads(rs, OverlapConfig(min_overlap=300,
                                               backend="myers"))
        assert len(t_my) > 20
        assert np.array_equal(t_my.as_matrix(), t_pl.as_matrix())
