"""String-graph construction from classified alignments.

Ref: phasm/assembly_graph.py :: build_assembly_graph — the reference walks
LocalAlignment objects and adds node/edge objects one at a time; here the
whole edge tensor is emitted with vectorized arithmetic in one shot.

Edge emission rules (derivation in structure.py docstring; `la/ra/lb/rb` are
the unaligned flank lengths of a and oriented-b):

  OVERLAP_AB  (suffix of a  ~ prefix of oriented b; guarantees la > lb, ra < rb):
      oa -> ob      elen = rb - ra          (appended suffix of b)
      rc(ob)->rc(oa) elen = la - lb         (dual)
  OVERLAP_BA  (suffix of oriented b ~ prefix of a; guarantees la < lb, ra > rb):
      ob -> oa      elen = ra - rb
      rc(oa)->rc(ob) elen = lb - la

where oa = 2*a_id, ob = 2*b_id + strand.  All elens are strictly positive by
the classification case analysis (see alignments.py::classify).
"""
from __future__ import annotations

import numpy as np

from phasm_tpu.alignments import AlignmentTable, AlignmentType
from phasm_tpu.graph.structure import StringGraph


def build_string_graph(
    t: AlignmentTable, types: np.ndarray, lengths: np.ndarray
) -> StringGraph:
    """Build the symmetric string graph from proper overlaps.

    `t` should already be filtered (stage 1); only OVERLAP_AB / OVERLAP_BA
    rows contribute edges.
    """
    n_reads = int(lengths.shape[0])
    n_nodes = 2 * n_reads

    ab = types == int(AlignmentType.OVERLAP_AB)
    ba = types == int(AlignmentType.OVERLAP_BA)

    a_len = lengths[t.a_id]
    b_len = lengths[t.b_id]
    la, ra = t.a_start, a_len - t.a_end
    lb, rb = t.b_start, b_len - t.b_end
    oa = 2 * t.a_id
    ob = 2 * t.b_id + t.strand
    ovl = t.overlap_length()

    srcs, dsts, elens, ovls = [], [], [], []

    def emit(mask, s, d, e):
        srcs.append(s[mask])
        dsts.append(d[mask])
        elens.append(e[mask])
        ovls.append(ovl[mask])

    # AB: oa -> ob and dual
    emit(ab, oa, ob, rb - ra)
    emit(ab, ob ^ 1, oa ^ 1, la - lb)
    # BA: ob -> oa and dual
    emit(ba, ob, oa, ra - rb)
    emit(ba, oa ^ 1, ob ^ 1, lb - la)

    src = np.concatenate(srcs).astype(np.int32)
    dst = np.concatenate(dsts).astype(np.int32)
    elen = np.concatenate(elens).astype(np.int32)
    ovl_all = np.concatenate(ovls).astype(np.int32)

    node_len = np.repeat(lengths.astype(np.int32), 2)

    g = StringGraph(n_nodes, src, dst, elen, ovl_all, node_len)
    return g.canonicalize()


def edge_dirty_mask(
    g: StringGraph, t: AlignmentTable, types: np.ndarray, dirty_rows: np.ndarray
) -> np.ndarray:
    """Map a per-ROW dirty flag onto g's canonical edge order.

    Re-derives the same (src, dst) emissions as :func:`build_string_graph`
    (both duals inherit their row's flag) and marks a canonical edge dirty
    when ANY generating row is dirty — pessimistic on the rare duplicate
    (src, dst) pair, which only strengthens the transitive-reduction veto
    (see transitive.reduce_mask_np).
    """
    ab = types == int(AlignmentType.OVERLAP_AB)
    ba = types == int(AlignmentType.OVERLAP_BA)
    oa = (2 * t.a_id).astype(np.int64)
    ob = (2 * t.b_id + t.strand).astype(np.int64)
    s = np.concatenate([oa[ab], (ob ^ 1)[ab], ob[ba], (oa ^ 1)[ba]])
    d = np.concatenate([ob[ab], (oa ^ 1)[ab], oa[ba], (ob ^ 1)[ba]])
    f = np.concatenate([dirty_rows[ab], dirty_rows[ab],
                        dirty_rows[ba], dirty_rows[ba]]).astype(np.int64)
    keys = s * g.n_nodes + d
    order = np.argsort(keys, kind="stable")
    ks, fs = keys[order], f[order]
    gkeys = g.src.astype(np.int64) * g.n_nodes + g.dst.astype(np.int64)
    lo = np.searchsorted(ks, gkeys, side="left")
    hi = np.searchsorted(ks, gkeys, side="right")
    csum = np.concatenate([[0], np.cumsum(fs)])
    return (csum[hi] - csum[lo]) > 0
