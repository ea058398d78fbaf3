"""Tip removal (bounded dead-end chains) + isolated-node pruning.

Ref: phasm/assembly_graph.py :: remove_tips, remove_isolated_nodes.

A *tip* is a dangling unambiguous chain of at most ``max_tip_len`` reads that
starts at an in-degree-0 node and merges into the rest of the graph (either
into a junction node with in-degree > 1, or ending at a branch point with
out-degree > 1).  Removal deletes the chain's *reads* (both orientations),
which by graph symmetry simultaneously clips the dual out-tip.  Rounds
iterate to a fixpoint, as the reference does.

The walk itself is a vectorized `max_tip_len`-step pointer chase over the
edge tensor: each step advances every candidate chain simultaneously via
gather ops (no per-node Python loop), matching the oracle in
oracle.py::tips_oracle exactly.
"""
from __future__ import annotations

import numpy as np

from phasm_tpu.graph.structure import StringGraph


def _tip_reads_one_round(g: StringGraph, max_tip_len: int) -> np.ndarray:
    """Boolean [n_reads*... ] mask over READ ids removed this round."""
    n = g.n_nodes
    outdeg = g.out_degree()
    indeg = g.in_degree()

    # unique successor per node (valid only when outdeg == 1)
    succ = np.full(n, -1, dtype=np.int64)
    one_out = outdeg == 1
    # canonical order => for outdeg-1 nodes the single out-edge is found by searchsorted
    first_edge = np.searchsorted(g.src, np.arange(n))
    has_edge = first_edge < g.n_edges
    idx = np.minimum(first_edge, max(g.n_edges - 1, 0))
    succ[one_out & has_edge] = g.dst[idx[one_out & has_edge]]

    present = (outdeg > 0) | (indeg > 0)
    sources = np.nonzero(present & (indeg == 0))[0]
    if sources.shape[0] == 0:
        return np.zeros(n // 2, dtype=bool)

    # Vectorized chain walk: state per source
    cur = sources.astype(np.int64)
    alive = np.ones(cur.shape[0], dtype=bool)  # still walking
    is_tip = np.zeros(cur.shape[0], dtype=bool)
    chain_nodes = np.full((max_tip_len, cur.shape[0]), -1, dtype=np.int64)
    chain_len = np.zeros(cur.shape[0], dtype=np.int64)

    for _ in range(max_tip_len + 1):
        od = outdeg[cur]
        # dead end (od == 0): isolated path, not a tip -> drop from `alive`
        # branch point (od > 1): tip = chain so far, if non-empty
        is_tip |= alive & (od > 1) & (chain_len >= 1)
        # only chains with a unique successor AND room left keep walking
        step = alive & (od == 1) & (chain_len < max_tip_len)
        if not np.any(step):
            break
        # append cur, advance
        chain_nodes[chain_len[step], np.nonzero(step)[0]] = cur[step]
        chain_len = np.where(step, chain_len + 1, chain_len)
        nxt = np.where(step, succ[cur], cur)
        # successor is a junction: chain merges into the graph -> tip
        merges = step & (indeg[np.maximum(nxt, 0)] > 1)
        is_tip |= merges
        alive = step & ~merges
        cur = np.maximum(nxt, 0)
        if not np.any(alive):
            break

    dead_reads = np.zeros(n // 2, dtype=bool)
    tip_cols = np.nonzero(is_tip)[0]
    for c in tip_cols:  # small: only actual tips
        nodes = chain_nodes[: chain_len[c], c]
        dead_reads[nodes >> 1] = True
    return dead_reads


def remove_tips(
    g: StringGraph, max_tip_len: int = 4, max_rounds: int = 64
) -> tuple[StringGraph, np.ndarray]:
    """Iterate tip clipping to a fixpoint.

    Returns (graph, removed_reads_mask).  Ref: remove_tips(g, max_tip_len)
    iterated until no change (SURVEY.md §4.2).
    """
    removed = np.zeros(g.n_nodes // 2, dtype=bool)
    for _ in range(max_rounds):
        dead = _tip_reads_one_round(g, max_tip_len)
        if not np.any(dead):
            break
        removed |= dead
        keep = ~(dead[g.src >> 1] | dead[g.dst >> 1])
        g = g.take_edges(keep)
    return g, removed


def isolated_read_mask(g: StringGraph) -> np.ndarray:
    """Reads with no alive edges in either orientation.

    Ref: phasm/assembly_graph.py :: remove_isolated_nodes.  These reads
    simply don't participate in the assembly graph (they may still be
    contained or low-overlap reads); callers use the mask for reporting.
    """
    deg = g.out_degree() + g.in_degree()
    per_read = deg.reshape(-1, 2).sum(axis=1)
    return per_read == 0
