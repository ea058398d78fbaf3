"""Fuzz-transitive reduction as a vectorized edge-tensor pass.

Ref: phasm/assembly_graph.py :: remove_transitive_edges — the reference runs
Myers' (2005) sequential INPLAY/ELIMINATED marking per vertex.  That scan is
order-dependent; the TPU rebuild instead uses the *declarative* fuzz rule
(the sparse-matrix formulation of PAPERS.md item 1, arXiv:2010.10055):

    edge (v, x) is transitive  <=>  exists w, w != v, w != x, with
        (v, w) in E,  (w, x) in E,  and
        elen(v,w) + elen(w,x) <= elen(v,x) + fuzz

evaluated one-shot against the ORIGINAL edge set.  This is order-independent
(hence deterministic under any sharding) and equals Myers' result on
consistent overlap graphs, where two-hop distances compose additively (see
structure.py).  `fuzz` plays the same role as the reference's length_fuzz
parameter.

Two implementations with identical outputs:
  * :func:`reduce_mask_np`  — vectorized numpy (host, default for tests/CLI)
  * :func:`reduce_mask_jax` — jit-able jnp version over padded adjacency,
    the one the TPU pipeline runs (static shapes; out-degree padded to a
    bucket size).
"""
from __future__ import annotations

import numpy as np

from phasm_tpu.graph.structure import StringGraph


def _padded_adjacency(
    g: StringGraph, pad_to: int | None = None, dirty: np.ndarray | None = None
):
    """[n_nodes, D] neighbor ids + elens + mask from canonical edges."""
    outdeg = g.out_degree()
    d_max = int(outdeg.max()) if outdeg.shape[0] and g.n_edges else 0
    if pad_to is not None:
        d_max = max(d_max, 1)
        d_max = ((d_max + pad_to - 1) // pad_to) * pad_to
    d_max = max(d_max, 1)
    nbr = np.full((g.n_nodes, d_max), -1, dtype=np.int64)
    nel = np.zeros((g.n_nodes, d_max), dtype=np.int64)
    offsets = g.csr()
    slot = np.arange(g.n_edges, dtype=np.int64) - offsets[g.src]
    nbr[g.src, slot] = g.dst
    nel[g.src, slot] = g.elen
    if dirty is None:
        return nbr, nel, nbr >= 0
    ndirty = np.zeros((g.n_nodes, d_max), dtype=bool)
    ndirty[g.src, slot] = dirty
    return nbr, nel, nbr >= 0, ndirty


def reduce_mask_np(
    g: StringGraph, fuzz: int, dirty: np.ndarray | None = None
) -> np.ndarray:
    """Boolean [E] mask: True = edge is transitive (to be removed).

    ``dirty`` (optional [E] bool): marginal-evidence edges — overlaps whose
    windowed divergence exceeds the pair's error expectation but survived
    the 6-sigma filter (likely cross-haplotype "zipper" edges).  Veto rule:
    a witness path containing a dirty edge cannot eliminate a CLEAN edge.
    Rationale (round-2 purity diagnosis): a marginal cross-hap edge
    arm_h0 -> arm_h1 otherwise eliminates the true parallel edge
    anchor -> arm_h1, concatenating both haplotypes' arms in series — a
    phase swap downstream phasing cannot undo.  Dirty edges may still
    eliminate each other, and clean witness paths behave exactly as before
    (dirty=None is bit-identical to the unvetoed rule).
    """
    if g.n_edges == 0:
        return np.zeros(0, dtype=bool)
    if dirty is None:
        dirty = np.zeros(g.n_edges, dtype=bool)
    nbr, nel, valid, ndirty = _padded_adjacency(g, dirty=dirty)
    # For each edge e = (v, x): candidate mids w = nbr[v, :]
    v = g.src.astype(np.int64)
    x = g.dst.astype(np.int64)
    w = nbr[v]  # [E, D]
    wl = nel[v]  # [E, D] elen(v, w)
    wd = ndirty[v]  # [E, D] dirty(v, w)
    ok = valid[v] & (w != x[:, None]) & (w != v[:, None])
    # lookup elen(w, x) + dirty(w, x) for each (w, x)
    keys = g.src.astype(np.int64) * g.n_nodes + g.dst.astype(np.int64)
    q = np.where(ok, w, 0) * g.n_nodes + x[:, None]
    pos = np.minimum(np.searchsorted(keys, q), keys.shape[0] - 1)
    ex = keys[pos] == q
    wx_len = np.where(ex, g.elen.astype(np.int64)[pos], 0)
    wx_dirty = ex & dirty[pos]
    witness_dirty = wd | wx_dirty
    cond = (
        ok & ex
        & (wl + wx_len <= g.elen.astype(np.int64)[:, None] + fuzz)
        & ~(witness_dirty & ~dirty[:, None])
    )
    return np.any(cond, axis=1)


_jit_reduce = None


def _get_jit_reduce():
    """Module-level jit (built lazily so importing this file never pulls jax)."""
    global _jit_reduce
    if _jit_reduce is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def run(src, dst, elen, row_off, edge_dst, edge_elen, nbr, nel, valid,
                fuzz, edge_dirty, ndirty):
            # Edge lookup elen(w, x) WITHOUT a composed (w * N + x) scalar
            # key: x64 is disabled, so the old int32 key capped devices at
            # 46,340 nodes (VERDICT r4 weak #4).  Instead bisect the CSR row
            # of w directly over the (src, dst)-sorted edge list — a fixed
            # 32-step vectorized lower_bound on [E, D] lanes; works to 2^31
            # nodes and costs the same O(log E) gathers searchsorted did.
            v, x = src, dst
            w = nbr[v]
            wl = nel[v]
            ok = valid[v] & (w != x[:, None]) & (w != v[:, None])
            wsafe = jnp.where(ok, w, 0)
            lo = row_off[wsafe]
            hi0 = row_off[wsafe + 1]
            hi = hi0
            xb = jnp.broadcast_to(x[:, None], lo.shape)
            emax = edge_dst.shape[0] - 1

            def body(_, lh):
                lo, hi = lh
                mid = (lo + hi) // 2
                mv = edge_dst[jnp.clip(mid, 0, emax)]
                go_right = (mv < xb) & (lo < hi)
                lo2 = jnp.where(go_right, mid + 1, lo)
                hi2 = jnp.where((~go_right) & (lo < hi), mid, hi)
                return lo2, hi2

            lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
            pos = jnp.clip(lo, 0, emax)
            ex = ok & (lo < hi0) & (edge_dst[pos] == xb)
            wx_len = jnp.where(ex, edge_elen[pos], 0)
            witness_dirty = ndirty[v] | (ex & edge_dirty[pos])
            cond = (
                ok & ex & (wl + wx_len <= elen[:, None] + fuzz)
                & ~(witness_dirty & ~edge_dirty[:, None])
            )
            return jnp.any(cond, axis=1)

        _jit_reduce = run
    return _jit_reduce


def _pow2(n: int, lo: int) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def reduce_mask_jax(
    g: StringGraph, fuzz: int, dirty: np.ndarray | None = None
) -> np.ndarray:
    """Same rule as :func:`reduce_mask_np`, as a jit-compiled jnp program.

    Edge count and node count are padded to powers of two (and out-degree to
    a multiple of 8), so the jit variant set stays finite across datasets —
    the same bucketing discipline as the extension kernels (fuzz is a traced
    scalar, so changing it never recompiles).  The numpy version is the
    oracle cross-check.  ``dirty`` applies the marginal-edge veto (see
    :func:`reduce_mask_np`); all-clean inputs are bit-identical to the
    unvetoed rule.
    """
    if g.n_edges == 0:
        return np.zeros(0, dtype=bool)
    if dirty is None:
        dirty = np.zeros(g.n_edges, dtype=bool)
    nbr, nel, valid, ndirty = _padded_adjacency(g, pad_to=8, dirty=dirty)
    E, N = g.n_edges, g.n_nodes
    Ep, Np = _pow2(E, 256), _pow2(N, 256)
    nbr = nbr.astype(np.int32)
    nel = nel.astype(np.int32)
    if Np != N:
        nbr = np.pad(nbr, ((0, Np - N), (0, 0)), constant_values=-1)
        nel = np.pad(nel, ((0, Np - N), (0, 0)))
        valid = np.pad(valid, ((0, Np - N), (0, 0)))
        ndirty = np.pad(ndirty, ((0, Np - N), (0, 0)))
    src = np.pad(g.src.astype(np.int32), (0, Ep - E))
    dst = np.pad(g.dst.astype(np.int32), (0, Ep - E))
    elen = np.pad(g.elen.astype(np.int32), (0, Ep - E))
    edge_dirty = np.pad(dirty, (0, Ep - E))
    # CSR row offsets over the (src, dst)-sorted canonical edge list: the
    # jit pass bisects row ranges directly (no composed scalar key, so no
    # int32 node-count cap — VERDICT r4 weak #4).  Padded rows are empty
    # (offset E on both sides); padded edge slots repeat the last dst so
    # bisection never reads garbage.
    row_off = np.zeros(Np + 1, dtype=np.int32)
    row_off[1 : N + 1] = np.cumsum(np.bincount(g.src, minlength=N))
    row_off[N + 1 :] = row_off[N]
    edge_dst_sorted = np.pad(g.dst.astype(np.int32), (0, Ep - E), mode="edge")
    out = _get_jit_reduce()(
        src, dst, elen, row_off, edge_dst_sorted, elen, nbr, nel, valid,
        np.int32(fuzz), edge_dirty, ndirty,
    )
    return np.asarray(out)[:E]


def remove_transitive_edges(
    g: StringGraph, fuzz: int = 1000, impl: str = "np",
    dirty: np.ndarray | None = None,
) -> StringGraph:
    """Drop transitive edges (ref: remove_transitive_edges(g, length_fuzz)).

    impl: "np" | "jax" | "auto" — auto routes large graphs through the jit
    edge-tensor pass (the vectorized device path) and keeps tiny graphs on
    the numpy oracle, where host latency wins.  ``dirty`` ([E] bool,
    optional) applies the marginal-edge veto — see :func:`reduce_mask_np`.
    """
    if impl == "auto":
        impl = "jax" if g.n_edges >= 4096 else "np"
    mask = (
        reduce_mask_np(g, fuzz, dirty)
        if impl == "np"
        else reduce_mask_jax(g, fuzz, dirty)
    )
    return g.take_edges(~mask)
