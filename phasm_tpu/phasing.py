"""Bubble-chain phasing as a masked branch-score-prune dynamic program.

Ref: phasm/phasing.py :: BubbleChainPhaser, HaplotypeSet (SURVEY.md §4.3).
The reference walks each bubble chain keeping a set of candidate
HaplotypeSets (k paths, one per haplotype copy); at each bubble it
*branches* (extend every candidate with every k-multiset of bubble paths),
*scores* (relative likelihood from reads spanning into the bubble + a
coverage model) and *prunes* (drop candidates below prune_factor x best).
That is a per-object Python loop over combinatorial sets.

TPU re-expression (BASELINE.json north star: "phasing DP re-expressed as a
masked dynamic program"): the candidate frontier is a fixed-width tensor.

  state per chain step:
    scores   [C]          candidate log-likelihoods       (padded, masked)
    B        [C, R, k]    read-haplotype consistency bits for active reads
  branch:    path assignments  A [E, k]  (ordered product of bubble paths)
  score:     one fused jnp program computes, for all (candidate, extension)
             pairs at once,
               B'[c,e,r,m] = B[c,r,m] & M[r, A[e,m]]
               P(r|H)      = (c_r(1-err) + (k-c_r)err)/k,  c_r = sum_m B'
               delta[c,e]  = sum_r log P_new(r) - log P_old(r)
             plus a Poisson coverage term over per-path read support
             (ref: phasm/phasing.py :: CoverageModel).
  prune:     top-K by score with threshold  score >= best + log(prune_factor)
             (ref prune semantics), deterministic lexicographic tie-break.

Evidence model: a read "touches" a unitig pair if it is a member or aligns
to a member (from the stage-1 alignment table); a read is consistent with a
haplotype iff every interior unitig it touches, in every bubble of its span,
lies on that haplotype's chosen path.  Reads spanning multiple bubbles are
exactly what links phase across bubbles.
"""
from __future__ import annotations

import dataclasses
import itertools
import logging
import math

import numpy as np

from phasm_tpu import metrics
from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.bubbles import BubbleChain, enumerate_paths
from phasm_tpu.graph.unitigs import UnitigGraph
from phasm_tpu.reads import ReadSet

log = logging.getLogger("phasm_tpu.phasing")


@dataclasses.dataclass
class PhaseConfig:
    """Knobs mirror the reference CLI flags (SURVEY.md §6 config row)."""

    ploidy: int = 2
    prune_factor: float = 0.01  # relative-likelihood prune threshold
    max_candidates: int = 64  # frontier cap (padded tensor width)
    max_paths: int = 32  # per-bubble simple-path cap (tangled bubbles on
    # clustered-het data need > 16: the pure-haplotype path of a 11-node
    # tangle sat at enumeration index 19 — round-2 purity diagnostic)
    err: float = 1e-3  # P(read | inconsistent haplotype)
    coverage_weight: float = 0.25  # weight of the coverage model term
    max_extensions: int = 4096  # cap on |paths|^k before CWR fallback
    margin_abs: float = 0.002  # evidence: absolute error-rate margin
    margin_rel: float = 0.25  # evidence: relative error-rate margin
    # phase-gap linkage corroboration: a gap between bubbles is linked only
    # when >= this many DISTINCT reads constrain bubbles on both sides.  A
    # single constraining read is below the noise floor: a background-only
    # read spanning the inter-bubble anchor can land in one bubble's arm
    # tail by assembly and "constrain" the other via a noisy background
    # alignment whose error clears the margin by chance (measured on the c1
    # ladder rung: exactly one such read welded two 10-kb-separated bubbles
    # into a 0.51-purity chimera).  Same >= 2 corroboration rule as
    # refine_assignment_by_window_excess.  The reference joins chains
    # unconditionally (no phase-block machinery at all).
    min_link_reads: int = 2
    # linkage additionally requires DISCRIMINATING evidence: a read only
    # counts toward linking a gap when, at each bubble it constrains, it
    # touches one arm cleanly AND another arm only through window-suspect
    # alignments (corroborated Poisson excess, the filter.py statistic).
    # Without this, background reads in the inter-hotspot gap "constrain"
    # bubbles through pure error noise / structural path bias — their
    # constraint rows are IDENTICAL for reads of either haplotype (measured
    # on the c4 ladder rung: all 12 linkers of a 0.52-purity join imposed
    # the same row), so the DP's cross-gap phase choice they license is a
    # coin flip.  Requires the alignment table's win column; tables without
    # it keep the permissive rule.
    link_discrimination: bool = True
    link_z: float = 6.0
    link_min_excess: float = 12.0


@dataclasses.dataclass
class ChainPhaseResult:
    chain: BubbleChain
    haplotype_paths: list[list[int]]  # k walks (unitig ids incl. anchors)
    haplotype_choices: list[tuple[int, ...]]  # k tuples of per-bubble path idx
    haplotigs: list[np.ndarray]  # k spelled base-code arrays
    score: float
    n_candidates_final: int
    read_assignment: dict[int, list[int]]  # read -> consistent haplotype ids
    # bubble indices i whose gap to bubble i-1 has NO spanning read evidence:
    # the relative phase across such a gap is arbitrary (a coverage-model
    # tie-break, not data), so emitting one joined haplotig would fabricate
    # linkage.  Callers split haplotigs here — standard phase-block
    # semantics (the reference joins unconditionally; measured phase-switch
    # chimerism up to 25% per haplotig on unlinkable sims).
    phase_breaks: list[int] = dataclasses.field(default_factory=list)


# ----------------------------------------------------------------------------
# evidence preparation
# ----------------------------------------------------------------------------


def canonical_pair(ug: UnitigGraph, u: int) -> int:
    return min(int(u), int(ug.rc[u]))


def _pair_of_read(ug: UnitigGraph, n_reads: int) -> np.ndarray:
    """[N] canonical unitig pair each read is a member of (-1 if none)."""
    o2u = ug.read_to_unitig(n_reads)
    pair_of_read = np.full(n_reads, -1, dtype=np.int64)
    for r in range(n_reads):
        u = o2u[2 * r]
        if u < 0:
            u = o2u[2 * r + 1]
        if u >= 0:
            pair_of_read[r] = canonical_pair(ug, int(u))
    return pair_of_read


def read_touch_errs(
    ug: UnitigGraph, n_reads: int, aln: AlignmentTable
) -> dict[int, dict[int, float]]:
    """read id -> {canonical unitig pair: best alignment error rate}.

    Evidence is *weighted*: a read touching a unitig via an alignment carries
    that alignment's divergence (diffs / overlap length); membership in a
    unitig carries divergence 0.  The phaser treats a read as supporting the
    arm(s) it touches with (near-)minimal divergence — this is the
    spanning-read "overlap placement consistency" scoring of the reference
    (phasm/phasing.py), made explicit: a read placed between two bubbles
    whose flanks dip into both neighbouring hotspot arms aligns cleanly only
    to the arms of its own haplotype, which is exactly the cross-bubble
    linkage signal.
    """
    pair_of_read = _pair_of_read(ug, n_reads)

    touch: dict[int, dict[int, float]] = {r: {} for r in range(n_reads)}
    for r in range(n_reads):
        if pair_of_read[r] >= 0:
            touch[r][int(pair_of_read[r])] = 0.0

    ovl = np.maximum(aln.overlap_length(), 1)
    err = aln.diffs / ovl
    # sharpen with the windowed-divergence statistic where available: a
    # cross-haplotype overlap that only clips a het zone is flank-diluted in
    # whole-overlap error (indistinguishable from same-hap within the
    # margin) but its worst WINDOW-column span is not (filter.py window
    # policy, here reused as touch evidence)
    if getattr(aln, "win", None) is not None:
        from phasm_tpu.overlap.extend import WINDOW

        err = np.maximum(err, aln.win / WINDOW)
    for a, b, e in zip(aln.a_id.tolist(), aln.b_id.tolist(), err.tolist()):
        pa, pb = int(pair_of_read[a]), int(pair_of_read[b])
        if pb >= 0:
            ta = touch[a]
            if e < ta.get(pb, np.inf):
                ta[pb] = e
        if pa >= 0:
            tb = touch[b]
            if e < tb.get(pa, np.inf):
                tb[pa] = e
    return touch


def read_touch_dirty(
    ug: UnitigGraph,
    n_reads: int,
    aln: AlignmentTable,
    z: float = 6.0,
    min_excess: float = 12.0,
) -> dict[int, frozenset[int]] | None:
    """read id -> canonical unitig pairs the read touches ONLY through
    window-suspect alignments (corroborated cross-haplotype evidence).

    An alignment row is *suspect* when its worst-window divergence exceeds
    the pair's Poisson expectation (win > mu + max(z*sqrt(mu), min_excess),
    mu = (e_a + e_b) * WINDOW — the same statistic as
    filter.window_excess_mask / refine_assignment_by_window_excess).  A
    (read, pair) touch is *dirty* iff every alignment establishing it is
    suspect and the read is not a member of the pair.  A read that touches
    one arm of a bubble cleanly and a sibling arm only dirtily has seen het
    sites — that is the discriminating-evidence test for phase linkage
    (PhaseConfig.link_discrimination).  Returns None when the table carries
    no win column (callers fall back to the permissive rule)."""
    if getattr(aln, "win", None) is None or len(aln) == 0:
        return None
    from phasm_tpu.filter import corroborate_window_excess, estimate_read_errors
    from phasm_tpu.overlap.extend import WINDOW

    e_read = estimate_read_errors(aln, n_reads)
    mu = (e_read[aln.a_id] + e_read[aln.b_id]) * WINDOW
    sus = aln.win > mu + np.maximum(z * np.sqrt(mu), min_excess)
    # corroboration (same rule as filter.window_excess_mask): a single
    # read's dense-error patch flags only pairs sharing that read; genuine
    # het sites are flagged by independent pairs at the same locus.  Without
    # this, one bad read could fabricate "discriminating" linkage evidence.
    sus = corroborate_window_excess(aln, sus)

    pair_of_read = _pair_of_read(ug, n_reads)
    dirty: dict[int, set[int]] = {}
    clean: dict[int, set[int]] = {}
    for r in range(n_reads):
        if pair_of_read[r] >= 0:
            clean.setdefault(r, set()).add(int(pair_of_read[r]))
    for a, b, s in zip(aln.a_id.tolist(), aln.b_id.tolist(), sus.tolist()):
        pa, pb = int(pair_of_read[a]), int(pair_of_read[b])
        for x, p in ((a, pb), (b, pa)):
            if p < 0:
                continue
            (dirty if s else clean).setdefault(x, set()).add(p)
    out = {
        r: frozenset(d - clean.get(r, set()))
        for r, d in dirty.items()
        if d - clean.get(r, set())
    }
    if not out:
        # low-heterozygosity regime: NO read anywhere trips the window
        # threshold, so the discriminating-evidence test can never pass and
        # every constrained gap will phase-break.  That is the honest
        # choice — joining on non-discriminating linkage licenses coin-flip
        # phase (chimeras are worse than fragmentation) — but it must be
        # LOUD, not silent (ADVICE r4): real low-het data hitting this wants
        # link_discrimination=False or a lower link_z.
        metrics.incr("phasing.link_discrimination_no_evidence")
        log.warning(
            "link_discrimination: no window-suspect (read, pair) touches in "
            "the whole table — every constrained gap will phase-break; set "
            "link_discrimination=False (or lower link_z) if this data is "
            "genuinely low-heterozygosity"
        )
    return out


def consistent_paths(
    rel: dict[int, float],
    pairsets_i: list[frozenset[int]],
    margin_abs: float,
    margin_rel: float,
) -> np.ndarray:
    """Boolean [P]: which bubble paths a read (with relevant arm errs) supports.

    The read supports the path(s) containing the MOST arms whose divergence
    is within a margin of the read's best arm.  Any-intersection (the round-1
    rule) was degenerate on tangled bubbles: a read whose clean touches were
    {u15, u13, u37} "supported" a crossed path containing only u15 exactly as
    much as the pure path containing all three, so spanning-read linkage
    never disambiguated within-bubble haplotype crossings (observed as
    phase-swapped arms inside one bubble, the round-2 purity diagnostic).
    Maximal intersection restores the constraint while staying robust to
    touches through locally-identical segments (ties support both arms)."""
    emin = min(rel.values())
    thr = emin + margin_abs + margin_rel * emin
    cons = {u for u, e in rel.items() if e <= thr}
    ov = np.array([len(cons & ps) for ps in pairsets_i], dtype=np.int64)
    best = ov.max() if ov.size else 0
    if best == 0:
        return np.zeros(len(pairsets_i), dtype=bool)
    return ov == best


# ----------------------------------------------------------------------------
# the masked DP
# ----------------------------------------------------------------------------

_jit_score = None


def _get_jit_score():
    global _jit_score
    if _jit_score is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def score_step(B, M, A, scores, active, cand_mask, ext_mask, err, beta, n_path):
            """All-pairs branch scores.

            B         [C, R, k] bool   prior consistency bits
            M         [R, P]    bool   read-path consistency for this bubble
            A         [E, k]    int    path assignment per extension
            scores    [C]       float  prior candidate scores
            active    [R]       bool   read participates in this bubble step
            cand_mask [C] bool / ext_mask [E] bool   padding masks
            n_path    [P] float  per-path read support (for coverage term)
            returns   total [C, E]
            """
            k = B.shape[2]
            kf = jnp.float32(k)
            # consistency after extension: [C, E, R, k]
            Mp = M[:, A.T]  # [R, k, E] -> path consistency of each assignment
            Mp = jnp.transpose(Mp, (2, 0, 1))  # [E, R, k]
            Bn = B[:, None, :, :] & Mp[None, :, :, :]  # [C, E, R, k]
            c_new = jnp.sum(Bn, axis=3).astype(jnp.float32)  # [C, E, R]
            c_old = jnp.sum(B, axis=2).astype(jnp.float32)  # [C, R]
            p_new = (c_new * (1.0 - err) + (kf - c_new) * err) / kf
            p_old = (c_old * (1.0 - err) + (kf - c_old) * err) / kf
            contrib = jnp.log(p_new) - jnp.log(p_old)[:, None, :]
            delta = jnp.sum(jnp.where(active[None, None, :], contrib, 0.0), axis=2)

            # coverage term: per-extension multiplicity of each path
            P = M.shape[1]
            onehot = (A[:, :, None] == jnp.arange(P)[None, None, :])  # [E, k, P]
            mult = jnp.sum(onehot, axis=1).astype(jnp.float32)  # [E, P]
            lam = jnp.sum(n_path) / kf
            cov = jnp.sum(
                n_path[None, :] * jnp.log(lam * mult + 1e-6) - lam * mult, axis=1
            )  # [E]

            total = scores[:, None] + delta + beta * cov[None, :]
            total = jnp.where(cand_mask[:, None] & ext_mask[None, :], total, -jnp.inf)
            return total

        _jit_score = score_step
    return _jit_score


def _pad_to(x: np.ndarray, size: int, axis: int, fill=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)


def _bucket(n: int, step: int = 16) -> int:
    return max(step, ((n + step - 1) // step) * step)


class _ChainDP:
    """Resumable branch-score-prune state for ONE chain.

    The per-bubble step is split into ``prep`` (everything before the jitted
    scorer: evidence matrices, padded tensors) and ``apply`` (prune + state
    update from the scorer's output), so a driver can either run one chain
    sequentially (``phase_chain``) or advance MANY chains in lockstep with
    the scorer vmapped over same-shape buckets (``phase_all`` — the
    "independent per chain -> embarrassingly parallel" axis of
    phasm/phasing.py :: BubbleChainPhaser, SURVEY.md §4.3).  Both drivers
    produce bit-identical results (tested)."""

    def __init__(self, ug, reads, aln, chain, cfg, touch, dirty=None):
        self.ug, self.reads, self.chain, self.cfg = ug, reads, chain, cfg
        self.touch = touch
        # read -> pairs touched only through window-suspect alignments
        # (None when the table has no win column: every actor then links)
        self.dirty = dirty if cfg.link_discrimination else None
        k = cfg.ploidy
        bubbles = chain.bubbles
        self.n_b = len(bubbles)
        self.paths_per_bubble: list[list[tuple[int, ...]]] = []
        self.pairsets: list[list[frozenset[int]]] = []
        self.interiors: list[set[int]] = []
        for b in bubbles:
            paths = enumerate_paths(ug, b, max_paths=cfg.max_paths)
            if not paths:
                paths = [()]
            self.paths_per_bubble.append(paths)
            self.pairsets.append(
                [frozenset(canonical_pair(ug, u) for u in p) for p in paths]
            )
            self.interiors.append(
                {canonical_pair(ug, u) for u in b.interior}
            )

        # read spans: first/last bubble index each read touches
        self.first_b: dict[int, int] = {}
        self.last_b: dict[int, int] = {}
        for r, ts in touch.items():
            for i, ip in enumerate(self.interiors):
                if ts.keys() & ip:
                    if r not in self.first_b:
                        self.first_b[r] = i
                    self.last_b[r] = i

        # DP state
        self.candidates: list[tuple[tuple[int, ...], ...]] = [
            tuple(() for _ in range(k))
        ]
        self.scores = np.zeros(1, dtype=np.float64)
        self.active_reads: list[int] = []
        self.B = np.ones((1, 0, k), dtype=bool)
        self.acted: dict[int, list[int]] = {}  # read -> constrained bubbles

    def prep(self, i: int):
        """Build bubble i's padded scorer inputs.  Returns (args, meta):
        args feed score_step (vmappable), meta carries the unpadded shapes
        and per-step arrays ``apply`` needs."""
        cfg = self.cfg
        k = cfg.ploidy
        paths = self.paths_per_bubble[i]
        P = len(paths)
        # activate new reads
        entering = sorted(r for r, fb in self.first_b.items() if fb == i)
        if entering:
            self.B = np.concatenate(
                [
                    self.B,
                    np.ones((self.B.shape[0], len(entering), k), dtype=bool),
                ],
                axis=1,
            )
            self.active_reads = self.active_reads + entering

        R = len(self.active_reads)
        # M[r, p]: read consistent with path p at this bubble
        M = np.zeros((R, P), dtype=bool)
        act = np.zeros(R, dtype=bool)
        for ri, r in enumerate(self.active_reads):
            rel = {
                u: e for u, e in self.touch[r].items()
                if u in self.interiors[i]
            }
            if not rel:
                M[ri, :] = True  # no constraint at this bubble
                continue
            act[ri] = True
            row = consistent_paths(
                rel, self.pairsets[i], cfg.margin_abs, cfg.margin_rel
            )
            M[ri, :] = row
            # linkage bookkeeping: only a read that ELIMINATES >= 1 path
            # imposes a real constraint.  A read whose touches sit in the
            # identical inter-hotspot background aligns equally well to
            # every arm (row all-True) — counting it as "acting" fabricates
            # cross-bubble linkage and suppresses phase breaks (the round-2
            # 36 kb diagnosis: chimeric spanning haplotigs at ~0.6 purity
            # instead of split pure phase blocks)
            if not row.all():
                strong = True
                if self.dirty is not None:
                    # discriminating evidence only: the read must have seen
                    # het sites AT THIS BUBBLE — one arm touched cleanly,
                    # another only through window-suspect alignments (see
                    # PhaseConfig.link_discrimination)
                    dr = self.dirty.get(r, ())
                    strong = any(u in dr for u in rel) and any(
                        u not in dr for u in rel
                    )
                if strong:
                    self.acted.setdefault(r, []).append(i)

        # extensions: ordered assignments; CWR fallback when P^k too large
        if P**k <= cfg.max_extensions:
            A = np.array(
                list(itertools.product(range(P), repeat=k)), dtype=np.int32
            )
        else:
            # unordered multisets lose only the (phenotypically irrelevant)
            # haplotype labelling order — but count it, never silently
            metrics.incr("phasing.extensions_cwr_fallback")
            log.warning(
                "bubble %d: %d^%d extensions exceed max_extensions=%d; "
                "falling back to unordered multisets",
                i, P, k, cfg.max_extensions,
            )
            A = np.array(
                list(itertools.combinations_with_replacement(range(P), k)),
                dtype=np.int32,
            )
        E = A.shape[0]

        # per-path read support for the coverage model
        n_path = (
            M[act].sum(axis=0).astype(np.float32)
            if R
            else np.zeros(P, np.float32)
        )

        # pad to buckets for jit cache friendliness
        C = len(self.candidates)
        Cp, Ep, Rp, Pp = (
            _bucket(C), _bucket(E), _bucket(max(R, 1)), _bucket(P, 8),
        )
        args = (
            _pad_to(_pad_to(self.B, Cp, 0), Rp, 1),
            _pad_to(_pad_to(M, Rp, 0), Pp, 1),
            _pad_to(A, Ep, 0),
            _pad_to(self.scores.astype(np.float32), Cp, 0),
            _pad_to(act, Rp, 0),
            _pad_to(np.ones(C, dtype=bool), Cp, 0),
            _pad_to(np.ones(E, dtype=bool), Ep, 0),
            _pad_to(n_path, Pp, 0),
        )
        meta = (i, C, E, R, A, M)
        return args, meta

    def apply(self, meta, total: np.ndarray) -> None:
        """Prune + state update from the scorer output (unpadded [C, E])."""
        cfg = self.cfg
        k = cfg.ploidy
        i, C, E, R, A, M = meta
        total = total.astype(np.float64)

        # prune: threshold + top-K, deterministic
        best = total.max()
        flat = total.ravel()
        thresh = best + math.log(cfg.prune_factor)
        order = np.lexsort((np.arange(flat.shape[0]), -flat))
        n_above = int((flat >= thresh).sum())
        if n_above > cfg.max_candidates:
            # the frontier cap dropped candidates the reference's prune rule
            # would have kept — count + warn (SURVEY.md §8.3 item 2)
            metrics.incr("phasing.candidates_truncated")
            metrics.incr(
                "phasing.candidates_dropped_above_threshold",
                n_above - cfg.max_candidates,
            )
            log.warning(
                "bubble %d: %d candidates above prune threshold, frontier "
                "capped at max_candidates=%d", i, n_above, cfg.max_candidates,
            )
        keep = [j for j in order[: cfg.max_candidates] if flat[j] >= thresh]
        if not keep:
            keep = [int(order[0])]

        new_candidates = []
        new_B = np.zeros((len(keep), R, k), dtype=bool)
        new_scores = np.zeros(len(keep), dtype=np.float64)
        seen_canon = {}
        for out_i, j in enumerate(keep):
            c, e = divmod(j, E)
            hist = tuple(
                self.candidates[c][m] + (int(A[e, m]),) for m in range(k)
            )
            new_candidates.append(hist)
            new_scores[out_i] = flat[j]
            for m in range(k):
                new_B[out_i, :, m] = self.B[c, :, m] & M[:, A[e, m]]
        # dedup candidates whose sorted haplotype histories coincide
        keep_idx = []
        for idx, hist in enumerate(new_candidates):
            key = tuple(sorted(hist))
            if key not in seen_canon:
                seen_canon[key] = idx
                keep_idx.append(idx)
        self.candidates = [new_candidates[j] for j in keep_idx]
        self.scores = new_scores[keep_idx]
        self.B = new_B[keep_idx]

        # retire reads whose span ended
        if R:
            stay = np.array(
                [self.last_b.get(r, -1) > i for r in self.active_reads],
                dtype=bool,
            )
            self.B = self.B[:, stay, :]
            self.active_reads = [
                r for r, s in zip(self.active_reads, stay) if s
            ]

    def finish(self) -> ChainPhaseResult:
        cfg = self.cfg
        k = cfg.ploidy
        ug, reads, bubbles = self.ug, self.reads, self.chain.bubbles
        best_i = int(np.argmax(self.scores))
        best_hist = self.candidates[best_i]

        # build walks incl. anchors and spell haplotigs
        elen_lookup = {
            (int(s), int(d)): int(e)
            for s, d, e in zip(ug.src, ug.dst, ug.elen)
        }

        def walk_for(hap: tuple[tuple[int, ...], ...]) -> list[int]:
            nodes = [bubbles[0].entrance]
            for i, b in enumerate(bubbles):
                nodes.extend(self.paths_per_bubble[i][hap[i]])
                nodes.append(b.exit)
            return nodes

        hap_paths = []
        haplotigs = []
        for m in range(k):
            nodes = walk_for(best_hist[m])
            hap_paths.append(nodes)
            elens = [
                elen_lookup[(nodes[j], nodes[j + 1])]
                for j in range(len(nodes) - 1)
            ]
            haplotigs.append(ug.spell_path(nodes, elens, reads))

        # read assignment from best candidate's remaining+retired
        # consistency: recompute per read over its span
        assignment: dict[int, list[int]] = {}
        for r, fb in self.first_b.items():
            lb = self.last_b[r]
            cons = []
            for m in range(k):
                ok = True
                for i in range(fb, lb + 1):
                    rel = {
                        u: e for u, e in self.touch[r].items()
                        if u in self.interiors[i]
                    }
                    if rel:
                        mrow = consistent_paths(
                            rel, self.pairsets[i],
                            cfg.margin_abs, cfg.margin_rel,
                        )
                        if not mrow[best_hist[m][i]]:
                            ok = False
                            break
                if ok:
                    cons.append(m)
            assignment[r] = cons

        # phase breaks: gap before bubble i is linked iff >= min_link_reads
        # DISTINCT reads each constrain a bubble <= i-1 AND a bubble >= i
        # (transitive spans count; see PhaseConfig.min_link_reads for why a
        # single read is not evidence)
        phase_breaks = []
        for i in range(1, self.n_b):
            n_link = sum(
                1 for bs in self.acted.values()
                if bs and bs[0] <= i - 1 and bs[-1] >= i
            )
            if n_link < cfg.min_link_reads:
                phase_breaks.append(i)
                metrics.incr("phasing.phase_breaks")

        return ChainPhaseResult(
            chain=self.chain,
            haplotype_paths=hap_paths,
            haplotype_choices=list(best_hist),
            haplotigs=haplotigs,
            score=float(self.scores[best_i]),
            n_candidates_final=len(self.candidates),
            read_assignment=assignment,
            phase_breaks=phase_breaks,
        )


def phase_chain(
    ug: UnitigGraph,
    reads: ReadSet,
    aln: AlignmentTable,
    chain: BubbleChain,
    cfg: PhaseConfig | None = None,
    touch: dict[int, dict[int, float]] | None = None,
    dirty: dict[int, frozenset[int]] | None = None,
) -> ChainPhaseResult:
    """Run the branch-score-prune DP over one bubble chain (sequential)."""
    cfg = cfg or PhaseConfig()
    if touch is None:
        touch = read_touch_errs(ug, reads.n_reads, aln)
    if dirty is None and cfg.link_discrimination:
        dirty = read_touch_dirty(
            ug, reads.n_reads, aln, z=cfg.link_z,
            min_excess=cfg.link_min_excess,
        )
    dp = _ChainDP(ug, reads, aln, chain, cfg, touch, dirty=dirty)
    score_step = _get_jit_score()
    for i in range(dp.n_b):
        metrics.incr("phasing.score_dispatches")
        args, meta = dp.prep(i)
        C, E = meta[1], meta[2]
        total = np.asarray(
            score_step(
                *args[:7],
                np.float32(cfg.err), np.float32(cfg.coverage_weight),
                args[7],
            )
        )[:C, :E]
        dp.apply(meta, total)
    return dp.finish()


def refine_assignment_by_window_excess(
    assignment: dict[int, list[int]],
    aln: AlignmentTable,
    e_read: np.ndarray,
    k: int,
    z: float = 6.0,
    min_excess: float = 12.0,
    rounds: int = 2,
) -> dict[int, list[int]]:
    """Propagate haplotype assignment into ANCHOR reads by corroborated
    window-excess incompatibility.

    The phaser only assigns reads that touch bubble arms; reads whose member
    unitig is an anchor stay unassigned, and het sites that fall INSIDE a
    mixed anchor (bubble boundaries lag hotspot boundaries by up to a read
    length) get polished by both haplotypes' reads — the dominant residual
    impurity of round 2 (purity stuck at 0.84 with every wrong site in an
    anchor).  Rule, mirroring filter.corroborate_window_excess semantics: a
    read is EXCLUDED from haplotype m when its overlaps to >= 2 DISTINCT
    reads uniquely assigned to m show window excess beyond the pair's
    Poisson expectation (win > mu + max(z*sqrt(mu), min_excess)).  Exclusion
    only — never flips an existing assignment; reads with no excess evidence
    stay unassigned (they only vote where haplotypes agree).

    Reference: phasm/phasing.py assigns reads to haplotypes from bubble-arm
    consistency only; anchor-interior het sites are below its resolution —
    this pass is beyond-reference, required for the >= 0.99 allele-purity
    target (BASELINE.md bit-identical row).
    """
    if getattr(aln, "win", None) is None or len(aln) == 0:
        return assignment
    from phasm_tpu.overlap.extend import WINDOW

    mu = (e_read[aln.a_id] + e_read[aln.b_id]) * WINDOW
    thr = mu + np.maximum(z * np.sqrt(mu), min_excess)
    rows = np.nonzero(aln.win > thr)[0]
    if rows.shape[0] == 0:
        return assignment
    assignment = {r: list(v) for r, v in assignment.items()}
    aid, bid = aln.a_id, aln.b_id
    for _ in range(rounds):
        uniq = {r: v[0] for r, v in assignment.items() if len(v) == 1}
        votes: dict[int, dict[int, set]] = {}
        for i in rows:
            a, b = int(aid[i]), int(bid[i])
            for x, y in ((a, b), (b, a)):
                my = uniq.get(y)
                if my is not None:
                    votes.setdefault(x, {}).setdefault(my, set()).add(y)
        changed = False
        for x, vm in votes.items():
            excl = {m for m, ys in vm.items() if len(ys) >= 2}
            if not excl:
                continue
            cand = assignment.get(x, list(range(k)))
            new = [m for m in cand if m not in excl]
            if new != cand:
                assignment[x] = new
                changed = True
                metrics.incr("phasing.anchor_reads_refined")
        if not changed:
            break
    return assignment


_jit_score_v = None


def _get_jit_score_v():
    """vmapped scorer: one device dispatch scores a whole BUCKET of chains
    whose padded step shapes coincide.  err/beta broadcast (same config for
    every chain)."""
    global _jit_score_v
    if _jit_score_v is None:
        import jax

        base = _get_jit_score()
        _jit_score_v = jax.jit(
            jax.vmap(
                base,
                in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, 0),
            )
        )
    return _jit_score_v


def phase_all(
    ug: UnitigGraph,
    reads: ReadSet,
    aln: AlignmentTable,
    chains: list[BubbleChain],
    cfg: PhaseConfig | None = None,
    batch: bool = True,
) -> list[ChainPhaseResult]:
    """Phase every chain.

    Chains are independent (phasm/phasing.py runs them as a sequential
    Python loop; SURVEY.md §4.3 "independent per chain -> embarrassingly
    parallel in rebuild").  With ``batch=True`` (default) all chains advance
    in LOCKSTEP: at step t, every chain with a t-th bubble preps its scorer
    inputs, chains whose padded shapes coincide are stacked and scored in
    ONE vmapped device dispatch, then each chain prunes host-side.  At
    ~1000 small chains this collapses ~1000 per-bubble dispatches into a
    handful of bucket dispatches per step (dispatch overhead dominates tiny
    scorer calls, ~5 ms/call through the TPU tunnel).  Results are
    bit-identical to the sequential driver (tested: vmap batches the same
    lanewise ops; reductions keep their axis order)."""
    cfg = cfg or PhaseConfig()
    if not chains:
        return []  # nothing to phase (and no spurious low-het warning)
    touch = read_touch_errs(ug, reads.n_reads, aln)
    dirty = (
        read_touch_dirty(
            ug, reads.n_reads, aln, z=cfg.link_z,
            min_excess=cfg.link_min_excess,
        )
        if cfg.link_discrimination
        else None
    )

    # restrict each chain to the reads that touch ITS interiors: _ChainDP's
    # span scan is O(|touch| x n_bubbles), so handing every chain the full
    # read set is quadratic in chain count (measured: the dominant cost at
    # 1000 chains).  Restriction is behavior-preserving — a read with no
    # interior touch never enters first_b, and every consumer of touch[r]
    # keys off first_b membership.
    pair2chains: dict[int, set[int]] = {}
    for ci, c in enumerate(chains):
        for b in c.bubbles:
            for u in b.interior:
                pair2chains.setdefault(
                    canonical_pair(ug, u), set()
                ).add(ci)
    touch_sub: list[dict] = [{} for _ in chains]
    for r, ts in touch.items():
        cis: set[int] = set()
        for u in ts:
            cis |= pair2chains.get(u, set())
        for ci in cis:
            touch_sub[ci][r] = ts

    if not batch or len(chains) <= 1:
        return [
            phase_chain(
                ug, reads, aln, c, cfg, touch=touch_sub[ci], dirty=dirty
            )
            for ci, c in enumerate(chains)
        ]

    dps = [
        _ChainDP(ug, reads, aln, c, cfg, touch_sub[ci], dirty=dirty)
        for ci, c in enumerate(chains)
    ]
    score_v = _get_jit_score_v()
    errf = np.float32(cfg.err)
    betaf = np.float32(cfg.coverage_weight)
    max_steps = max(dp.n_b for dp in dps)
    for t in range(max_steps):
        live = [dp for dp in dps if t < dp.n_b]
        preps = [(dp, *dp.prep(t)) for dp in live]
        buckets: dict[tuple, list] = {}
        for dp, args, meta in preps:
            key = tuple(a.shape for a in args)
            buckets.setdefault(key, []).append((dp, args, meta))
        for group in buckets.values():
            metrics.incr("phasing.score_dispatches")
            if len(group) == 1:
                dp, args, meta = group[0]
                total = np.asarray(
                    _get_jit_score()(
                        *args[:7], errf, betaf, args[7]
                    )
                )[: meta[1], : meta[2]]
                dp.apply(meta, total)
                continue
            stacked = [
                np.stack([g[1][j] for g in group]) for j in range(8)
            ]
            totals = np.asarray(
                score_v(*stacked[:7], errf, betaf, stacked[7])
            )
            for gi, (dp, _args, meta) in enumerate(group):
                dp.apply(meta, totals[gi, : meta[1], : meta[2]])
    return [dp.finish() for dp in dps]
