"""Unambiguous-path merging (unitig formation) + sequence spelling.

Ref: phasm/assembly_graph.py :: merge_unambiguous_paths — contract every
maximal chain of edges ``u -> v`` with out_degree(u) == 1 and
in_degree(v) == 1 into a single node, preserving symmetry (the reverse
complement of a unitig is the contracted dual chain).

The result keeps, per unitig: the ordered member oriented reads, their start
offsets in the spelled sequence, and the spelled length — exactly the
bookkeeping phasing needs to map read evidence onto bubble paths
(phasm/phasing.py scores candidate haplotypes by spanning-read support).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from phasm_tpu.graph.structure import StringGraph
from phasm_tpu.reads import ReadSet


@dataclasses.dataclass
class UnitigGraph:
    """Contracted graph. Node ids are unitig indices; `rc[i]` maps a unitig
    to its reverse-complement dual (an involution)."""

    members: list[np.ndarray]  # per-unitig ordered oriented-read ids
    offsets: list[np.ndarray]  # per-unitig member start offsets (bases)
    length: np.ndarray  # [U] spelled length
    rc: np.ndarray  # [U] dual unitig id
    src: np.ndarray  # [Eu] int32
    dst: np.ndarray  # [Eu] int32
    elen: np.ndarray  # [Eu] int32
    ovl: np.ndarray  # [Eu] int32

    @property
    def n_nodes(self) -> int:
        return len(self.members)

    @property
    def n_edges(self) -> int:
        return int(self.src.shape[0])

    def successors(self, u: int) -> np.ndarray:
        return self.dst[self.src == u]

    def predecessors(self, u: int) -> np.ndarray:
        return self.src[self.dst == u]

    def out_degree(self) -> np.ndarray:
        return np.bincount(self.src, minlength=self.n_nodes)

    def in_degree(self) -> np.ndarray:
        return np.bincount(self.dst, minlength=self.n_nodes)

    def read_to_unitig(self, n_reads: int) -> np.ndarray:
        """[2*n_reads] oriented-read -> unitig id (-1 if unplaced)."""
        out = np.full(2 * n_reads, -1, dtype=np.int64)
        for u, mem in enumerate(self.members):
            out[mem] = u
        return out

    def spell(self, u: int, reads: ReadSet, elens_in: list[np.ndarray] | None = None) -> np.ndarray:
        """Spell unitig u's base codes from its member reads."""
        mem = self.members[u]
        offs = self.offsets[u]
        total = int(self.length[u])
        out = np.zeros(total, dtype=np.uint8)
        # later members overwrite overlapping prefixes; write in order so the
        # most recent (rightmost) read wins in overlap regions.  Offsets are
        # clamped: noisy-indel coordinate drift can push a member start a few
        # bases negative (see chain_layout).
        for oid, off in zip(mem.tolist(), offs.tolist()):
            s = reads.oriented_seq(int(oid))
            off = max(int(off), 0)
            end = min(off + s.shape[0], total)
            if end <= off:
                continue
            out[off:end] = s[: end - off]
        return out

    def spell_path(self, path: list[int], path_elens: list[int], reads: ReadSet) -> np.ndarray:
        """Spell a walk over unitigs (used for haplotig output)."""
        seq = self.spell(path[0], reads)
        for node, el in zip(path[1:], path_elens):
            nxt = self.spell(node, reads)
            seq = np.concatenate([seq, nxt[nxt.shape[0] - el :]])
        return seq

    def walk_members(self, path: list[int], path_elens: list[int]):
        """(member_oids, member_offsets) over a spelled walk — the same
        coordinate arithmetic as spell_path, used by consensus polishing."""
        mems: list[int] = []
        offs: list[int] = []
        total = 0
        for idx, node in enumerate(path):
            if idx == 0:
                node_start = 0
                total = int(self.length[node])
            else:
                el = int(path_elens[idx - 1])
                node_start = max(total - (int(self.length[node]) - el), 0)
                total = max(total + el, node_start + int(self.length[node]))
            for m, o in zip(self.members[node], self.offsets[node]):
                mems.append(int(m))
                offs.append(node_start + int(o))
        return mems, offs


def merge_unambiguous_paths(g: StringGraph) -> UnitigGraph:
    """Contract maximal unambiguous chains of the (symmetric) string graph."""
    outdeg = g.out_degree()
    indeg = g.in_degree()
    present = np.nonzero((outdeg > 0) | (indeg > 0))[0]

    # unique successor where it forms an unambiguous pair
    succ = np.full(g.n_nodes, -1, dtype=np.int64)
    succ_elen = np.zeros(g.n_nodes, dtype=np.int64)
    if g.n_edges:
        first_edge = np.searchsorted(g.src, np.arange(g.n_nodes))
        one_out = (outdeg == 1) & (first_edge < g.n_edges)
        idx = np.minimum(first_edge, g.n_edges - 1)
        cand_dst = g.dst[idx]
        mergeable = one_out & (indeg[np.maximum(cand_dst, 0)] == 1)
        succ[mergeable] = cand_dst[mergeable]
        succ_elen[mergeable] = g.elen[idx][mergeable]

    pred_count_unambig = np.zeros(g.n_nodes, dtype=np.int64)
    valid_succ = succ[succ >= 0]
    np.add.at(pred_count_unambig, valid_succ, 1)

    # chain heads: nodes that are not the unambiguous-successor of anything
    visited = np.zeros(g.n_nodes, dtype=bool)
    chains: list[list[int]] = []
    for v in present.tolist():
        if visited[v] or pred_count_unambig[v] > 0:
            continue
        chain = [v]
        visited[v] = True
        cur = v
        while succ[cur] >= 0 and not visited[succ[cur]]:
            cur = int(succ[cur])
            chain.append(cur)
            visited[cur] = True
        chains.append(chain)
    # cycles of unambiguous edges (every node has an unambiguous pred):
    for v in present.tolist():
        if visited[v]:
            continue
        chain = [v]
        visited[v] = True
        cur = v
        while succ[cur] >= 0 and not visited[succ[cur]]:
            cur = int(succ[cur])
            chain.append(cur)
            visited[cur] = True
        chains.append(chain)

    # pair each chain with its reverse-complement dual
    chain_of_node = np.full(g.n_nodes, -1, dtype=np.int64)
    for ci, ch in enumerate(chains):
        chain_of_node[np.array(ch, dtype=np.int64)] = ci

    members: list[np.ndarray] = []
    offsets_l: list[np.ndarray] = []
    lengths: list[int] = []
    rc_pairs: list[int] = []
    unitig_of_chain = np.full(len(chains), -1, dtype=np.int64)

    def chain_layout(ch: list[int]):
        # offs[i] = spelled start of member i = total_before - (len_i - elen_i).
        # With noisy alignments the aligned span of a long member can slightly
        # exceed the accumulated length (indel drift), which would make the
        # offset negative; clamp to 0 (error-free data is unaffected).
        offs = np.zeros(len(ch), dtype=np.int64)
        total = int(g.node_len[ch[0]])
        for i in range(1, len(ch)):
            el = int(succ_elen[ch[i - 1]])
            offs[i] = max(total - (int(g.node_len[ch[i]]) - el), 0)
            total = max(total + el, offs[i] + int(g.node_len[ch[i]]))
        return offs, total

    for ci, ch in enumerate(chains):
        if unitig_of_chain[ci] >= 0:
            continue
        dual_nodes = [n ^ 1 for n in reversed(ch)]
        cj = int(chain_of_node[dual_nodes[0]])
        # sanity: the dual chain must exist as one chain (graph symmetric)
        offs, total = chain_layout(ch)
        uid = len(members)
        members.append(np.array(ch, dtype=np.int64))
        offsets_l.append(offs)
        lengths.append(total)
        unitig_of_chain[ci] = uid
        if cj == ci or chains[cj] == ch:  # self-dual (palindromic)
            rc_pairs.append(uid)
        else:
            offs2, total2 = chain_layout(chains[cj])
            members.append(np.array(chains[cj], dtype=np.int64))
            offsets_l.append(offs2)
            lengths.append(total2)
            unitig_of_chain[cj] = uid + 1
            rc_pairs.append(uid + 1)
            rc_pairs.append(uid)

    # remap surviving edges (those not contracted: edge u->v where NOT
    # (outdeg(u)==1 and indeg(v)==1))
    node_to_unitig = np.full(g.n_nodes, -1, dtype=np.int64)
    for ci, ch in enumerate(chains):
        node_to_unitig[np.array(ch, dtype=np.int64)] = unitig_of_chain[ci]

    chain_head = np.zeros(g.n_nodes, dtype=bool)
    chain_tail = np.zeros(g.n_nodes, dtype=bool)
    for ch in chains:
        chain_head[ch[0]] = True
        chain_tail[ch[-1]] = True

    keep = chain_tail[g.src] & chain_head[g.dst]
    us = node_to_unitig[g.src[keep]]
    ud = node_to_unitig[g.dst[keep]]
    ue = g.elen[keep].astype(np.int64)
    uo = g.ovl[keep].astype(np.int64)
    # edge elen composes with the dst-chain interior: traversing into a
    # unitig appends (unitig_len - (node_len(head) - elen))
    head_len = g.node_len[g.dst[keep]].astype(np.int64)
    ulen = np.array(lengths, dtype=np.int64)
    ue = ulen[ud] - (head_len - ue)

    order = np.lexsort((ud, us))
    return UnitigGraph(
        members=members,
        offsets=offsets_l,
        length=ulen,
        rc=np.array(rc_pairs, dtype=np.int64),
        src=us[order].astype(np.int32),
        dst=ud[order].astype(np.int32),
        elen=ue[order].astype(np.int32),
        ovl=uo[order].astype(np.int32),
    )
