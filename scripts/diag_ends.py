"""What exactly is wrong at the contig ends?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from phasm_tpu import dna
from phasm_tpu.overlap import OverlapConfig, overlap_reads
from phasm_tpu.pipeline import PipelineConfig, assemble
from phasm_tpu.sim import simulate_reads

rs, truth = simulate_reads(
    seed=7, genome_len=30_000, ploidy=1, coverage=16,
    mean_read_len=3000, error_rate=0.06, read_len_spread=0.3,
)
t = overlap_reads(rs, OverlapConfig(min_overlap=700, backend="jnp"))
cfg = PipelineConfig(
    min_overlap_length=700, max_error_rate=0.16, length_fuzz=700,
    polish=True, round2_chunk=8192, polish_iters=3,
)
res = assemble(rs, t, cfg)
name, seq = res.contigs[0]
h0 = truth.haplotypes[0]
# orient
fwd = sum(1 for c in range(1000, 28000, 3000)
          if dna.decode(h0[c:c+32]) in dna.decode(seq))
rc = dna.revcomp(seq)
rch = sum(1 for c in range(1000, 28000, 3000)
          if dna.decode(h0[c:c+32]) in dna.decode(rc))
s = seq if fwd >= rch else rc
print("contig len", len(s), "truth", len(h0))

# where do the contig's first/last clean 32-mers map on truth?
def find_kmer(hs, sub):
    i = hs.find(sub)
    return i

hs = dna.decode(h0)
ss = dna.decode(np.asarray(s))
for label, rng_ in (("head", range(0, 1200, 50)), ("tail", range(len(ss)-1200, len(ss)-32, 50))):
    print(f"--- {label} mapping (contig_pos -> truth_pos) ---")
    for cpos in rng_:
        k = ss[cpos:cpos+32]
        tp = hs.find(k)
        print(f"  {cpos:7d} -> {tp}")

# read coverage of the truth ends: how many reads cover first/last 400?
pos = truth.read_pos
ln = rs.lengths
end = pos + ln
print("truth reads covering [0,100):", int(((pos <= 0) | (pos < 100)).sum()),
      "covering last 100:", int((end > 29900).sum()))
print("min read start:", int(pos.min()), "max read end:", int(end.max()))
