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
    # propagate phaser read assignment into anchor reads by corroborated
    # window-excess incompatibility before the haplotype-pure polish (het
    # sites inside mixed anchors; phasing.refine_assignment_by_window_excess)
    refine_anchor_assignment: bool = True
    # cut heterozygous zipper junctions between unitigs by POOLED window
    # statistics (graph.pop.cut_zipper_edges): serial arm concatenation
    # from marginal cross-hap edges is a phase swap no phaser can fix
    cut_zippers: bool = True
    # marginal-edge veto in transitive reduction: edges whose windowed
    # divergence exceeds the pair's expectation at zipper_z sigma (below the
    # 6-sigma REJECT threshold) cannot eliminate clean parallel edges — the
    # mechanism that otherwise zips cross-haplotype arms in series and merges
    # them into mixed unitigs (transitive.reduce_mask_np veto rule)
    zipper_z: float = 3.5
    zipper_min_excess: float = 8.0
    # polish round 2 (VERDICT r1 #5): re-align every kept member read to the
    # k round-1 polished drafts of its chain (Myers backend, single-read
    # error baseline = 2x the SNR of pairwise window stats), exclude reads
    # whose windowed divergence vs a draft exceeds the chain-best by
    # round2_win_delta, re-polish at the recomputed (aligned) offsets
    polish_round2: bool = True
    round2_win_delta: int = 8
    round2_band: int = 128
    round2_max_err: float = 0.30  # placement sanity cap (read vs draft)
    round2_trim_cov: int = 2  # trim draft ends below this placed coverage
    round2_iters: int = 1  # placement+polish rounds (a 2nd round was net-negative: re-seeding against the once-rewritten draft corrupted low-coverage tails)
    # round-2 polish builds a DENSE (draft-chunks + reads, max_len) code
    # matrix for the mini overlap.  Megabase drafts are CHUNKED into
    # windows of ~round2_chunk (overlapping by a read length + band slack,
    # so every read fits wholly inside at least one window; placements are
    # mapped back to draft-global coordinates and deduped per (draft,
    # read)), keeping the matrix O((draft_len/chunk + n_reads) x
    # max(chunk, read_len)) — the c6 rung's 6.1 Mb draft x 25k reads was
    # 152 GB dense and is ~1 GB chunked.  The budget below remains as a
    # loud backstop; round-1 pileup polish (streaming) still runs if hit.
    round2_max_bytes: float = 4e9
    round2_chunk: int = 65_536
    # DEVICE budget for the round-2 mini overlap: the myers batch pads the
    # oriented item matrix rows to a power of two and keeps a flipped +
    # padded copy, so device HBM ~ 3x pow2(2*n_items) x L bytes.  The c6
    # rung's 65 kb chunks hit a 20 GB compile-time OOM (131072 x 65536 u8
    # + flip + pad) the HOST budget above never sees; the chunk width is
    # halved (down to the 2*(read_len + 4*band) floor that keeps every
    # read wholly inside one window) until the estimate fits.
    round2_device_budget: float = 6e9
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
    # rounds of realign+vote at fixed placements per polish call (offsets
    # remapped through the coordinate map; no re-seeding — medoid gap
    # splices are cleaned by per-base voting in the following round)
    polish_iters: int = 2


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


def _next_pow2(n: int, lo: int = 128) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _polish_round2(entries, reads: ReadSet, cfg, polish_fn):
    """Draft-guided placement of EVERY read + second polish (VERDICT r1 #5).

    Round-1 polish votes only with unitig member reads: contained reads
    (often >half the set) never vote, leaving effective consensus coverage
    of ~3-6x and a ~0.5% error floor.  This round runs a mini overlap of
    the whole ReadSet against the round-1 polished drafts: production
    minimizer seeding (drafts first, so drafts are the A side), Myers
    block-band extension (d0 = seed diagonal), then

      * haplotype choice per read: the windowed-divergence statistic vs a
        draft carries only ONE read's error as baseline (2x the SNR of
        pairwise window stats) — a read is excluded from a draft when its
        window stat exceeds its best over the SAME CHAIN's drafts by
        round2_win_delta;
      * placement sanity: alignments worse than round2_max_err are junk
        (other locus / other chain) and dropped;
      * re-polish at the ALIGNED offsets (recomputed coordinates, immune to
        round-1 indel drift).

    Reference: phasm/phasing.py assigns reads from bubble-arm consistency
    only and has no consensus stage at all; this pass is beyond-reference,
    required for the >=0.99 allele-purity / >=99.9% identity target
    (BASELINE.md bit-identical row).
    """
    from phasm_tpu import metrics
    from phasm_tpu.overlap import seeding
    from phasm_tpu.overlap.extend import BIG as XBIG
    from phasm_tpu.overlap.myers import myers_overlap_batch

    D = len(entries)
    drafts = [np.asarray(ent["seq"], dtype=np.uint8) for ent in entries]
    if not drafts:
        return
    LB = int(reads.codes.shape[1])
    read_max = int(reads.lengths.max())
    # chunk megabase drafts: overlap by a full read length + band slack so
    # every read placement fits wholly inside at least one chunk window
    ov_slack = read_max + 4 * cfg.round2_band
    chunk = max(cfg.round2_chunk, 2 * ov_slack)

    def _layout(chunk):
        step = chunk - ov_slack
        cd: list[int] = []
        cb: list[int] = []
        for i, s in enumerate(drafts):
            st = 0
            while True:
                cd.append(i)
                cb.append(st)
                if st + chunk >= len(s):
                    break
                st += step
        return cd, cb

    def _pow2(n):
        p = 1
        while p < n:
            p *= 2
        return p

    chunk_draft, chunk_begin = _layout(chunk)
    C = len(chunk_draft)
    chunk_draft_a = np.asarray(chunk_draft, dtype=np.int64)
    chunk_begin_a = np.asarray(chunk_begin, dtype=np.int64)
    chunk_lens = np.minimum(
        chunk,
        np.array([len(drafts[d]) for d in chunk_draft], dtype=np.int64)
        - chunk_begin_a,
    )
    L = max(int(chunk_lens.max()), LB)

    # READ-GROUP batching bounds the DEVICE footprint: the myers batch holds
    # several copies (original, flipped, jmax-padded, gathered windows) of
    # the padded oriented item matrix [pow2(2 * (C + group)), L] u8 — at c6
    # scale (25k reads, 22 kb chunks) one group was a 20 GB compile-time
    # HBM OOM.  Reads are placement-independent, so grouping is exact: the
    # global best-per-(draft, read) dedup runs over the concatenated
    # placements.  (The k-mer max_occ filter counts within a group — a
    # superset of the global-count candidates, quality-neutral.)
    group = reads.n_reads
    while (
        6.0 * _pow2(2 * (C + group)) * L > cfg.round2_device_budget
        and group > 1024
    ):
        group //= 2
        metrics.incr("polish2.read_group_halved")
    n_items_g = C + min(group, reads.n_reads)
    if float(n_items_g) * L > cfg.round2_max_bytes:
        import logging

        metrics.incr("polish2.skipped_over_budget")
        logging.getLogger("phasm_tpu.pipeline").warning(
            "polish round 2 skipped: dense code matrix would be "
            "%d x %d = %.1f GB (> round2_max_bytes=%.1f GB); round-1 "
            "pileup polish still applied",
            n_items_g, L, n_items_g * L / 1e9, cfg.round2_max_bytes / 1e9,
        )
        return

    scfg = seeding.SeedConfig()
    jmax = _next_pow2(read_max + 2 * cfg.round2_band, 1024)
    parts: list[tuple] = []  # (gdraft, gstart, b_global, strand, diffs, win)
    for r0 in range(0, reads.n_reads, group):
        r1 = min(r0 + group, reads.n_reads)
        ni = C + (r1 - r0)
        codes = np.zeros((ni, L), dtype=np.uint8)
        lengths = np.zeros(ni, dtype=np.int32)
        for c in range(C):
            cl = int(chunk_lens[c])
            b0 = int(chunk_begin_a[c])
            codes[c, :cl] = drafts[chunk_draft[c]][b0 : b0 + cl]
            lengths[c] = cl
        codes[C:, :LB] = reads.codes[r0:r1]
        lengths[C:] = reads.lengths[r0:r1]

        seeds = seeding.extract_minimizers(codes, lengths, scfg)
        cands = seeding.match_seeds(seeds, lengths, scfg)
        sel = (cands.a_id < C) & (cands.b_id >= C)
        a_id = cands.a_id[sel].astype(np.int64)  # chunk item index
        b_id = cands.b_id[sel].astype(np.int64)
        strand_g = cands.strand[sel].astype(np.int64)
        d0 = cands.diag[sel].astype(np.int32)
        P = a_id.shape[0]
        if P == 0:
            continue

        # oriented rows for the ad-hoc item set (drafts fwd; reads both
        # strands).  Revcomp rows built vectorized (VERDICT r3 weak #4):
        # rc[i, t] = 3 - codes[i, li-1-t]
        om = np.zeros((2 * ni, L), dtype=np.uint8)
        om[0::2] = codes
        src = (
            lengths[:, None].astype(np.int64) - 1
            - np.arange(L, dtype=np.int64)
        )
        om[1::2] = np.where(
            src >= 0,
            3 - codes[np.arange(ni)[:, None], np.clip(src, 0, L - 1)],
            0,
        )
        a_oid = (2 * a_id).astype(np.int32)
        b_oid = (2 * b_id + strand_g).astype(np.int32)

        Pp = _next_pow2(P, 256)
        pad = Pp - P
        res = myers_overlap_batch(
            om, lengths,
            np.pad(a_oid, (0, pad)), np.pad(b_oid, (0, pad)),
            np.pad(d0, (0, pad)), band=cfg.round2_band, jmax=jmax,
        )
        parts.append((
            chunk_draft_a[a_id],
            chunk_begin_a[a_id] + res.a_start[:P].astype(np.int64),
            b_id - C + r0,
            strand_g,
            res.diffs[:P].astype(np.int64),
            res.win_cost[:P].astype(np.int64),
        ))
    if not parts:
        return
    gdraft_all = np.concatenate([p[0] for p in parts])
    gstart_all = np.concatenate([p[1] for p in parts])
    b_global = np.concatenate([p[2] for p in parts])
    strand = np.concatenate([p[3] for p in parts])
    diffs_all = np.concatenate([p[4] for p in parts])
    win_all = np.concatenate([p[5] for p in parts])

    # best placement per (draft, read): lexicographic min of
    # (diffs, win, start, strand); sanity-capped err.  Fully vectorized
    # (VERDICT r3 weak #4: the per-candidate dict loop was a wall at scale):
    # lexsort groups by (draft, read) with the tie-break keys minor, so the
    # first row of each group IS the dict loop's winning tuple.  Chunk
    # placements are mapped to draft-global coordinates FIRST, so the same
    # read seen in two overlapping chunks dedups to one placement.
    ok = diffs_all < XBIG
    rl = reads.lengths[b_global]
    err = diffs_all / np.maximum(rl, 1)
    ok &= err <= cfg.round2_max_err
    gdraft = gdraft_all
    gstart = gstart_all
    n_reads_all = reads.n_reads
    oki = np.nonzero(ok)[0]
    placed = [([], []) for _ in entries]
    if oki.shape[0]:
        order = np.lexsort((
            strand[oki], gstart[oki], win_all[oki],
            diffs_all[oki], b_global[oki], gdraft[oki],
        ))
        s = oki[order]
        first = np.ones(s.shape[0], dtype=bool)
        first[1:] = (gdraft[s[1:]] != gdraft[s[:-1]]) | (
            b_global[s[1:]] != b_global[s[:-1]]
        )
        best = s[first]  # sorted by (draft, read) — the dict's sorted() order
        di_b = gdraft[best]
        ri_b = b_global[best]
        wn_b = win_all[best]
        # haplotype exclusion within each chain: win vs chain-best, via a
        # dense (chain, read) min table
        chain_of = np.array([ent["ci"] for ent in entries], dtype=np.int64)
        ck = chain_of[di_b] * n_reads_all + ri_b
        bw = np.full(
            int(chain_of.max() + 1) * n_reads_all, 1 << 30, dtype=np.int64
        )
        np.minimum.at(bw, ck, wn_b)
        keep = wn_b <= bw[ck] + cfg.round2_win_delta
        n_excl = int((~keep).sum())
        kept = best[keep]
        di_k = gdraft[kept]
        mems_k = 2 * b_global[kept] + strand[kept]
        offs_k = gstart[kept]
        bounds = np.searchsorted(di_k, np.arange(D + 1))
        for di in range(D):
            sl = slice(int(bounds[di]), int(bounds[di + 1]))
            placed[di] = (
                [int(m) for m in mems_k[sl]], [int(o) for o in offs_k[sl]]
            )
        metrics.incr("polish2.reads_excluded", n_excl)
    metrics.incr("polish2.reads_placed", sum(len(p[0]) for p in placed))

    for ei, ent in enumerate(entries):
        mems, offs = placed[ei]
        if not mems:
            continue
        # round-1 members that failed placement stay at scaled offsets
        # (vectorized: np.isin over read ids instead of a per-member loop)
        scale = len(ent["seq"]) / max(ent["spell_len"], 1)
        mems0 = np.asarray(ent["mems"], dtype=np.int64)
        offs0 = np.asarray(ent["offs"], dtype=np.float64)
        if mems0.shape[0]:
            miss = ~np.isin(
                mems0 >> 1, np.asarray(mems, dtype=np.int64) >> 1
            )
            mems.extend(int(m) for m in mems0[miss])
            offs.extend(int(round(o * scale)) for o in offs0[miss])
            metrics.incr("polish2.unplaced_member_kept", int(miss.sum()))
        pre_len = len(ent["seq"])
        ent["seq"] = polish_fn(ent["seq"], mems, offs)
        # trim ends below consensus coverage: the spelled tips extend past
        # read support (single-read tails at ~raw error), the dominant
        # identity sink (round-2 profile: 183 edits in the first kb)
        mems_a = np.asarray(mems, dtype=np.int64)
        offs_a = np.asarray(offs, dtype=np.int64)
        rl2 = reads.lengths[mems_a >> 1].astype(np.int64)
        cov = np.zeros(pre_len + 1, dtype=np.int32)
        np.add.at(cov, np.clip(offs_a, 0, pre_len), 1)
        np.add.at(cov, np.clip(offs_a + rl2, 0, pre_len), -1)
        cov = np.cumsum(cov[:-1])
        good = np.nonzero(cov >= cfg.round2_trim_cov)[0]
        if good.shape[0] == 0:
            continue
        s = len(ent["seq"]) / max(pre_len, 1)  # polish length drift
        t0 = int(good[0] * s)
        t1 = min(int((good[-1] + 1) * s) + 1, len(ent["seq"]))
        if t0 > 0 or t1 < len(ent["seq"]):
            metrics.incr("polish2.bases_trimmed",
                         t0 + (len(ent["seq"]) - t1))
            ent["seq"] = ent["seq"][t0:t1]


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
        dirty_edges = None
        if cfg.cut_zippers and ft.win is not None and len(ft):
            from phasm_tpu.filter import (
                estimate_read_errors,
                window_excess_mask,
            )
            from phasm_tpu.graph.build import edge_dirty_mask

            dirty_rows = window_excess_mask(
                ft, estimate_read_errors(alignments, reads.n_reads),
                z=cfg.zipper_z, min_excess=cfg.zipper_min_excess,
            )
            dirty_edges = edge_dirty_mask(g, ft, types, dirty_rows)
            stats["dirty_edges"] = int(dirty_edges.sum())
            metrics.incr("graph.dirty_edges", stats["dirty_edges"])
        g = remove_transitive_edges(
            g, fuzz=cfg.length_fuzz, impl=cfg.transitive_impl, dirty=dirty_edges
        )
        if dirty_edges is not None:
            from phasm_tpu.graph.build import edge_dirty_mask as _edm
            from phasm_tpu.graph.pop import cut_dirty_chords

            # recompute the flag on the REDUCED edge set, then drop chords
            g, n_chords = cut_dirty_chords(
                g, _edm(g, ft, types, dirty_rows)
            )
            stats["dirty_chords_cut"] = n_chords
        stats["edges_after_reduction"] = g.n_edges
        g, removed = remove_tips(g, max_tip_len=cfg.max_tip_len)
        if cfg.pop_bubbles:
            from phasm_tpu.filter import estimate_read_errors

            g, popped = pop_error_bubbles(
                g, max_weak_reads=cfg.pop_max_weak_reads,
                dominance=cfg.pop_dominance,
                aln=alignments,
                e_read=estimate_read_errors(alignments, reads.n_reads),
                veto_z=cfg.zipper_z, veto_min_excess=cfg.zipper_min_excess,
            )
            g, removed2 = remove_tips(g, max_tip_len=cfg.max_tip_len)
            stats["bubble_reads_popped"] = int(popped.sum())
            removed = removed | popped | removed2
    stats["edges_after_tips"] = g.n_edges
    stats["tip_reads_removed"] = int(removed.sum())
    ug = merge_unambiguous_paths(g)
    if cfg.cut_zippers:
        from phasm_tpu.filter import estimate_read_errors as _ere
        from phasm_tpu.graph.pop import cut_zipper_edges

        ug, n_cut = cut_zipper_edges(
            ug, alignments, _ere(alignments, reads.n_reads), reads.n_reads,
        )
        stats["zipper_edges_cut"] = n_cut
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

    if cfg.refine_anchor_assignment and results:
        # extend per-chain read assignment into anchors (het sites inside
        # mixed anchors were the round-2 residual impurity); uses the FULL
        # table — filtered cross-hap rows carry the window evidence
        from phasm_tpu.filter import estimate_read_errors
        from phasm_tpu.phasing import refine_assignment_by_window_excess

        e_read_all = estimate_read_errors(alignments, reads.n_reads)
        for r in results:
            r.read_assignment = refine_assignment_by_window_excess(
                r.read_assignment, alignments, e_read_all, cfg.phase.ploidy,
                z=cfg.window_z, min_excess=cfg.window_min_excess,
            )

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
            iters=cfg.polish_iters,
        )
        return out if out is not None else seq

    haplotigs = []
    hap_entries: list[dict] = []
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
                # trim each interior phase-block boundary to the MIDPOINT of
                # the shared anchor unitig: het sites in the anchor's far
                # half belong to the NEXT block's first bubble, whose arm
                # choice is unlinked to this block — keeping them would put
                # ~50% wrong alleles on this haplotig's tail (and duplicate
                # the anchor between blocks).  Applied after polish so member
                # offsets stay aligned with the spelled sequence.
                trim0 = int(ug.length[seg_nodes[0]]) // 2 if si > 0 else 0
                trim1 = (
                    int(ug.length[seg_nodes[-1]]) // 2
                    if si < len(segs) - 1 else 0
                )
                if trim0 + trim1 >= len(seg_seq) - 1:
                    trim0 = trim1 = 0
                hap_entries.append({
                    "ci": ci, "name": name, "spell_len": len(seg_seq),
                    "seq": _polish(seg_seq, mems, offs),
                    "mems": mems, "offs": offs,
                    "trim0": trim0, "trim1": trim1,
                })
        for nodes in r.haplotype_paths:
            chain_nodes.update(nodes)
            chain_nodes.update(int(ug.rc[n]) for n in nodes)
        for b in r.chain.bubbles:
            chain_nodes.update(b.interior)
            chain_nodes.update(int(ug.rc[n]) for n in b.interior)

    # unphased primary contigs: one orientation per remaining unitig pair.
    # Contigs join the haplotig entries for round-2 polish: the haploid
    # rungs emit ONLY contigs, and round-1 pileup polish votes with unitig
    # members alone (contained reads — often >half the set — never vote),
    # leaving a ~1% error floor on indel-dominated reads (the c3/c6 ladder
    # k-mer-identity gap).  Each contig gets its own entry; all contigs
    # share ONE pseudo-chain id so a read placing on two contigs (repeats)
    # only votes within round2_win_delta of its best placement.
    contig_entries: list[dict] = []
    emitted = set()
    contig_chain = 1 + max((e["ci"] for e in hap_entries), default=-1)
    for u in range(ug.n_nodes):
        if u in chain_nodes or u in emitted:
            continue
        d = int(ug.rc[u])
        emitted.add(u)
        emitted.add(d)
        seq = ug.spell(u, reads)
        mems = [int(m) for m in ug.members[u]]
        offs = [int(o) for o in ug.offsets[u]]
        contig_entries.append({
            "ci": contig_chain, "name": f"contig_u{u}",
            "spell_len": len(seq), "seq": _polish(seq, mems, offs),
            "mems": mems, "offs": offs,
        })

    all_entries = hap_entries + contig_entries
    if cfg.polish and cfg.polish_round2 and all_entries:
        for _ in range(cfg.round2_iters):
            with metrics.stage(
                "pipeline.polish2",
                haplotigs=len(hap_entries), contigs=len(contig_entries),
            ):
                try:
                    _polish_round2(all_entries, reads, cfg, _polish)
                except Exception:
                    # round-2 is a quality pass over an already-polished
                    # assembly: a device failure here (e.g. HBM OOM on an
                    # unforeseen geometry) must not kill the run — keep the
                    # round-1 output, but NEVER silently (metric + loud log)
                    import logging

                    metrics.incr("polish2.failed")
                    logging.getLogger("phasm_tpu.pipeline").exception(
                        "polish round 2 failed; round-1 polish output kept"
                    )
                    break
    haplotigs = [
        (
            e["name"],
            e["seq"][e.get("trim0", 0) : len(e["seq"]) - e.get("trim1", 0)],
        )
        for e in hap_entries
    ]
    contigs = [(e["name"], e["seq"]) for e in contig_entries]
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
