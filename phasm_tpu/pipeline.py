"""End-to-end assembly pipeline: alignments -> graph -> phase -> haplotigs.

Ref: the `phasm` CLI stage sequence filter -> layout -> phase
(SURVEY.md §1); here one call runs all in-memory stages, with the overlap
stage (phasm's external DAZZ_DB/DALIGNER) provided by phasm_tpu.overlap.

Stage boundaries remain exportable (GFA2 / alignment tables) to keep the
reference's file-level checkpoint/resume contract (SURVEY.md §6).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from phasm_tpu import dna
from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.bubbles import BubbleChain, build_chains, find_superbubbles
from phasm_tpu.filter import (
    AdaptiveErrorRate,
    FilterChain,
    MaxErrorRate,
    MinOverlapLength,
    MinReadLength,
    ProperOverlapsOnly,
)
from phasm_tpu.graph import (
    build_string_graph,
    merge_unambiguous_paths,
    pop_error_bubbles,
    remove_tips,
    remove_transitive_edges,
)
from phasm_tpu.graph.unitigs import UnitigGraph
from phasm_tpu.phasing import ChainPhaseResult, PhaseConfig, phase_all
from phasm_tpu.reads import ReadSet


@dataclasses.dataclass
class PipelineConfig:
    """Knob names mirror the reference CLI flags (SURVEY.md §6)."""

    # stage 1 (filter)
    min_read_length: int = 1000
    min_overlap_length: int = 800
    max_error_rate: float = 0.25  # vs overlap length; tune to read error
    adaptive_error: bool = False  # per-pair adaptive divergence filter
    adaptive_factor: float = 1.25
    adaptive_margin: float = 0.01
    # windowed-divergence policy (filter.window_excess_mask): drop
    # cross-haplotype dovetails from edge building and bar window-suspect
    # containments from marking reads contained.  No-op when the alignment
    # table carries no win column.
    window_filter: bool = True
    window_z: float = 6.0
    window_min_excess: float = 12.0
    best_end: bool = False  # relative-best edge selection per read end
    # (off by default: the engine's windowed-divergence filter is the
    # primary cross-haplotype edge killer; best_end thins anchor braids
    # too aggressively on high-identity regions)
    best_end_margin_abs: float = 0.01
    best_end_margin_rel: float = 0.15
    max_overhang_abs: int = 1000
    max_overhang_ratio: float = 0.8
    # stage 2 (layout)
    length_fuzz: int = 1000
    transitive_impl: str = "auto"  # np | jax | auto (jit pass for big graphs)
    max_tip_len: int = 4
    pop_bubbles: bool = True  # pop error bubbles (weak arm <= N reads)
    pop_max_weak_reads: int = 2
    pop_dominance: float = 5.0
    # stage 3 (phase)
    phase: PhaseConfig = dataclasses.field(default_factory=PhaseConfig)
    split_phase_blocks: bool = True  # split haplotigs at unlinked bubble gaps
    # evidence: keep alignments below this error for phasing support
    evidence_max_error: float = 0.3
    # consensus polish (pileup voting over member reads; C++ host kernel)
    polish: bool = False
    polish_band: int = 128
    polish_min_cov: int = 3


@dataclasses.dataclass
class AssemblyResult:
    unitigs: UnitigGraph
    chains: list[BubbleChain]
    phase_results: list[ChainPhaseResult]
    contigs: list[tuple[str, np.ndarray]]  # unphased primary contigs
    haplotigs: list[tuple[str, np.ndarray]]  # phased per-haplotype sequences
    stats: dict

    def write_fasta(self, path: str) -> None:
        from phasm_tpu.io import fasta

        recs = [(n, dna.decode(s)) for n, s in self.haplotigs + self.contigs]
        fasta.write_fasta(path, recs)

    def write_read_assignment(self, path: str, read_names: list[str]) -> None:
        """TSV: read name -> chain id, consistent haplotype ids.

        Ref: phasm/phasing.py emits which reads were assigned to which
        haplotig (SURVEY.md §3.1 phasing row: 'which reads were assigned').
        """
        with open(path, "w") as fh:
            fh.write("read\tchain\thaplotypes\n")
            for ci, r in enumerate(self.phase_results):
                for rd, haps in sorted(r.read_assignment.items()):
                    hs = ",".join(str(h) for h in haps) if haps else "-"
                    fh.write(f"{read_names[rd]}\t{ci}\t{hs}\n")


def assemble(
    reads: ReadSet, alignments: AlignmentTable, cfg: PipelineConfig | None = None
) -> AssemblyResult:
    """Run filter -> layout -> phase on an alignment table."""
    from phasm_tpu import metrics

    cfg = cfg or PipelineConfig()
    stats: dict = {"n_reads": reads.n_reads, "n_alignments": len(alignments)}

    # ---- stage 1: filter (ref: phasm filter) ----------------------------
    filters = [
        MinReadLength(cfg.min_read_length),
        MinOverlapLength(cfg.min_overlap_length),
        MaxErrorRate(cfg.max_error_rate),
        ProperOverlapsOnly(),
    ]
    if cfg.adaptive_error:
        filters.insert(2, AdaptiveErrorRate(cfg.adaptive_factor, cfg.adaptive_margin))
    post = []
    if cfg.best_end:
        from phasm_tpu.filter import RelativeBestEnd

        post.append(
            RelativeBestEnd(cfg.best_end_margin_abs, cfg.best_end_margin_rel)
        )
    chain = FilterChain(
        filters,
        max_overhang_abs=cfg.max_overhang_abs,
        max_overhang_ratio=cfg.max_overhang_ratio,
        window_filter=cfg.window_filter,
        window_z=cfg.window_z,
        window_min_excess=cfg.window_min_excess,
        post_filters=post,
    )
    with metrics.stage("pipeline.filter", alignments=len(alignments)):
        ft, types, contained = chain.apply(alignments, reads.lengths)
    stats["n_proper_overlaps"] = len(ft)
    stats["n_contained_reads"] = int(contained.sum())

    # ---- stage 2: layout (ref: phasm layout) ----------------------------
    with metrics.stage("pipeline.layout"):
        g = build_string_graph(ft, types, reads.lengths)
        stats["edges_initial"] = g.n_edges
        g = remove_transitive_edges(g, fuzz=cfg.length_fuzz, impl=cfg.transitive_impl)
        stats["edges_after_reduction"] = g.n_edges
        g, removed = remove_tips(g, max_tip_len=cfg.max_tip_len)
        if cfg.pop_bubbles:
            from phasm_tpu.filter import estimate_read_errors

            g, popped = pop_error_bubbles(
                g, max_weak_reads=cfg.pop_max_weak_reads,
                dominance=cfg.pop_dominance,
                aln=alignments,
                e_read=estimate_read_errors(alignments, reads.n_reads),
            )
            g, removed2 = remove_tips(g, max_tip_len=cfg.max_tip_len)
            stats["bubble_reads_popped"] = int(popped.sum())
            removed = removed | popped | removed2
    stats["edges_after_tips"] = g.n_edges
    stats["tip_reads_removed"] = int(removed.sum())
    ug = merge_unambiguous_paths(g)
    stats["n_unitigs"] = ug.n_nodes

    # ---- stage 3: phase (ref: phasm phase) ------------------------------
    # linear-time Brankovic finder (bubbles_linear) is the production path;
    # the per-entrance Onodera search (find_superbubbles) is its oracle
    from phasm_tpu.bubbles_linear import find_superbubbles_linear

    bubbles = find_superbubbles_linear(ug)
    chains = build_chains(ug, bubbles)
    stats["n_bubbles"] = len(bubbles)
    stats["n_chains"] = len(chains)

    ev_keep = alignments.diffs <= cfg.evidence_max_error * np.maximum(
        alignments.overlap_length(), 1
    )
    evidence = alignments.take(ev_keep)
    with metrics.stage("pipeline.phase", chains=len(chains)):
        results = phase_all(ug, reads, evidence, chains, cfg.phase)

    elen_lookup = {
        (int(s), int(d)): int(e) for s, d, e in zip(ug.src, ug.dst, ug.elen)
    }

    def _polish(seq, mems, offs):
        if not cfg.polish:
            return seq
        from phasm_tpu import native

        out = native.polish_native(
            seq,
            [reads.oriented_seq(m) for m in mems],
            offs,
            band=cfg.polish_band,
            min_cov=cfg.polish_min_cov,
        )
        return out if out is not None else seq

    haplotigs = []
    chain_nodes: set[int] = set()
    for ci, r in enumerate(results):
        for m, seq in enumerate(r.haplotigs):
            nodes = r.haplotype_paths[m]
            # split at phase breaks: joining bubbles with no spanning read
            # evidence fabricates linkage (phase-switch chimerism); each
            # segment is one phase block, anchors shared between segments
            segs = [nodes]
            if cfg.split_phase_blocks and r.phase_breaks:
                split_at = [
                    nodes.index(r.chain.bubbles[bi].entrance)
                    for bi in r.phase_breaks
                ]
                starts = [0] + split_at
                ends = split_at + [len(nodes) - 1]
                segs = [nodes[s0 : e0 + 1] for s0, e0 in zip(starts, ends)]
            for si, seg_nodes in enumerate(segs):
                elens = [
                    elen_lookup[(seg_nodes[j], seg_nodes[j + 1])]
                    for j in range(len(seg_nodes) - 1)
                ]
                seg_seq = (
                    seq if len(segs) == 1
                    else ug.spell_path(seg_nodes, elens, reads)
                )
                mems, offs = ug.walk_members(seg_nodes, elens)
                # haplotype-pure polish: exclude reads the phaser assigned
                # to a DIFFERENT haplotype — anchor unitigs carry both
                # haplotypes' reads, and letting them vote flips het alleles
                # toward 50/50 (a round-1 purity killer).  Unassigned reads
                # (anchor-only) stay: at their sites the haplotypes agree.
                assign = r.read_assignment
                keep = [
                    k for k, mm in enumerate(mems)
                    if (mm >> 1) not in assign or m in assign[mm >> 1]
                ]
                mems = [mems[k] for k in keep]
                offs = [offs[k] for k in keep]
                name = f"haplotig_c{ci}_h{m}" + (
                    f"_b{si}" if len(segs) > 1 else ""
                )
                haplotigs.append((name, _polish(seg_seq, mems, offs)))
        for nodes in r.haplotype_paths:
            chain_nodes.update(nodes)
            chain_nodes.update(int(ug.rc[n]) for n in nodes)
        for b in r.chain.bubbles:
            chain_nodes.update(b.interior)
            chain_nodes.update(int(ug.rc[n]) for n in b.interior)

    # unphased primary contigs: one orientation per remaining unitig pair
    contigs = []
    emitted = set()
    for u in range(ug.n_nodes):
        if u in chain_nodes or u in emitted:
            continue
        d = int(ug.rc[u])
        emitted.add(u)
        emitted.add(d)
        seq = ug.spell(u, reads)
        seq = _polish(
            seq, [int(m) for m in ug.members[u]], [int(o) for o in ug.offsets[u]]
        )
        contigs.append((f"contig_u{u}", seq))
    stats["n_haplotigs"] = len(haplotigs)
    stats["n_contigs"] = len(contigs)

    return AssemblyResult(
        unitigs=ug,
        chains=chains,
        phase_results=results,
        contigs=contigs,
        haplotigs=haplotigs,
        stats=stats,
    )
