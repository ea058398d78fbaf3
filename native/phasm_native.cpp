// phasm_native: C++ host-side kernels for the TPU assembly engine.
//
// Replaces the role DAZZ_DB/DALIGNER's C code plays on the host side of the
// reference pipeline (SURVEY.md §3.2): read packing and k-mer/minimizer
// index construction.  The device side (banded DP) is Pallas; these are the
// host hot loops that feed it.  Semantics are bit-identical to the numpy
// implementations in phasm_tpu/overlap/seeding.py (tested for equality);
// numpy remains the oracle/fallback.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).  Loaded via ctypes
// (phasm_tpu/native.py) — no pybind11 in this environment.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

namespace {

// splitmix-style mixer — MUST match seeding._hash64 exactly
inline uint64_t hash64(uint64_t x) {
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

inline uint64_t revcomp_kmer(uint64_t v, int k) {
  uint64_t out = 0;
  for (int i = 0; i < k; ++i) {
    out = (out << 2) | (3ULL - (v & 3ULL));
    v >>= 2;
  }
  return out;
}

}  // namespace

extern "C" {

// Bumped on any ABI change; phasm_tpu/native.py rebuilds stale .so files.
int64_t phasm_native_abi_version() { return 2; }

// 2-bit pack (DAZZ_DB storage form): 4 bases/byte, little-endian in byte.
void pack_2bit(const uint8_t* codes, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n / 4; ++i) {
    const uint8_t* c = codes + 4 * i;
    out[i] = (uint8_t)((c[0] & 3) | ((c[1] & 3) << 2) | ((c[2] & 3) << 4) |
                       ((c[3] & 3) << 6));
  }
}

// Minimizer extraction over a dense read matrix.
//
// codes    [n_reads, lpad] row-major base codes 0..3
// lengths  [n_reads]
// outputs: per-seed read id / fwd position / canonical kmer / orientation
// returns the number of seeds written (<= cap), or -1 if cap exceeded.
int64_t extract_minimizers(const uint8_t* codes, int64_t n_reads, int64_t lpad,
                           const int32_t* lengths, int32_t k, int32_t w,
                           int32_t* out_read, int32_t* out_pos,
                           uint64_t* out_canon, uint8_t* out_orient,
                           int64_t cap) {
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  int64_t n_out = 0;
  std::vector<uint64_t> canon;
  std::vector<uint64_t> hash;
  std::vector<uint8_t> orient;

  for (int64_t r = 0; r < n_reads; ++r) {
    const uint8_t* row = codes + r * lpad;
    const int32_t len = lengths[r];
    const int32_t nk = len - k + 1;
    if (nk <= 0) continue;

    canon.assign(nk, 0);
    hash.assign(nk, 0);
    orient.assign(nk, 0);

    // rolling forward and reverse-complement kmers
    uint64_t fwd = 0, rev = 0;
    for (int32_t i = 0; i < len; ++i) {
      fwd = ((fwd << 2) | (row[i] & 3)) & mask;
      rev = (rev >> 2) | ((3ULL - (row[i] & 3)) << (2 * (k - 1)));
      if (i >= k - 1) {
        const int32_t p = i - k + 1;
        const bool rc_smaller = rev < fwd;
        orient[p] = rc_smaller ? 1 : 0;
        canon[p] = rc_smaller ? rev : fwd;
        hash[p] = hash64(canon[p]);
      }
    }

    // window minima, first-min tie-break (== numpy argmin), dedup positions
    const int32_t win = (nk <= w) ? nk : w;
    std::deque<int32_t> dq;
    int32_t last_pick = -1;
    auto emit = [&](int32_t p) -> bool {
      if (p == last_pick) return true;
      last_pick = p;
      if (n_out >= cap) return false;
      out_read[n_out] = (int32_t)r;
      out_pos[n_out] = p;
      out_canon[n_out] = canon[p];
      out_orient[n_out] = orient[p];
      ++n_out;
      return true;
    };
    std::vector<int32_t> picks;
    for (int32_t i = 0; i < nk; ++i) {
      while (!dq.empty() && hash[i] < hash[dq.back()]) dq.pop_back();
      dq.push_back(i);
      if (dq.front() <= i - win) dq.pop_front();
      if (i >= win - 1) picks.push_back(dq.front());
    }
    if (picks.empty() && nk > 0) picks.push_back((int32_t)(std::min_element(hash.begin(), hash.end()) - hash.begin()));
    std::sort(picks.begin(), picks.end());
    picks.erase(std::unique(picks.begin(), picks.end()), picks.end());
    for (int32_t p : picks)
      if (!emit(p)) return -1;
  }
  return n_out;
}

// Seed matching: sort seeds by (canon, read_id) and emit all cross-read
// pairs per bucket (buckets larger than max_occ skipped), with relative
// strand and diagonal in the a-forward frame (a = smaller read id).
//
// cross_split >= 0 restricts emission to pairs straddling the read-id
// boundary (a < cross_split <= b) — the DALIGNER block-vs-block tile case
// (overlap_reads_blocked), which would otherwise re-emit intra-block pairs
// in every cross tile only to discard them.  cross_split < 0 emits all.
// Returns pairs written (<= cap) or -1 on overflow.
int64_t match_seed_pairs(const int32_t* read_id, const int32_t* pos,
                         const uint64_t* canon, const uint8_t* orient,
                         int64_t n_seeds, const int32_t* lengths, int32_t k,
                         int32_t max_occ, int32_t cross_split,
                         int32_t* out_a, int32_t* out_b,
                         int32_t* out_strand, int32_t* out_diag, int64_t cap) {
  std::vector<int64_t> order(n_seeds);
  for (int64_t i = 0; i < n_seeds; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
    if (canon[x] != canon[y]) return canon[x] < canon[y];
    return read_id[x] < read_id[y];
  });

  int64_t n_out = 0;
  int64_t s = 0;
  while (s < n_seeds) {
    int64_t e = s + 1;
    while (e < n_seeds && canon[order[e]] == canon[order[s]]) ++e;
    const int64_t c = e - s;
    if (c >= 2 && c <= max_occ) {
      for (int64_t x = s; x < e; ++x) {
        for (int64_t y = x + 1; y < e; ++y) {
          int64_t i = order[x], j = order[y];
          if (read_id[i] == read_id[j]) continue;
          if (read_id[i] > read_id[j]) std::swap(i, j);
          const int32_t a = read_id[i], b = read_id[j];
          if (cross_split >= 0 && !(a < cross_split && b >= cross_split))
            continue;
          const int32_t st = orient[i] ^ orient[j];
          const int32_t lb = lengths[b];
          const int32_t pb_or = st ? (lb - k - pos[j]) : pos[j];
          if (n_out >= cap) return -1;
          out_a[n_out] = a;
          out_b[n_out] = b;
          out_strand[n_out] = st;
          out_diag[n_out] = pos[i] - pb_or;
          ++n_out;
        }
      }
    }
    s = e;
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Consensus polishing (racon-lite): banded read-vs-draft alignment with
// traceback + per-position base/deletion/insertion voting.  Improves
// haplotig base identity from raw-read level (~1-2x read error) to the
// pileup consensus.  No counterpart in the reference (it emits raw read
// spellings); this is a "beat the reference" quality pass.
// ---------------------------------------------------------------------------

namespace {

struct Cell {
  int32_t cost;
  int8_t move;  // 0 diag, 1 up (read gap / draft del), 2 left (read ins)
};

}  // namespace

extern "C" {

// Align one read to draft[w0..w1) with band around the main diagonal and
// accumulate votes.  votes layout: [draft_len][5] (A,C,G,T,del);
// ins_votes: [draft_len+1][4] (insertion before position p).
// Returns 0 on success, -1 if the band overflowed (read skipped).
int polish_accumulate(const uint8_t* draft, int64_t draft_len,
                      const uint8_t* read, int32_t read_len,
                      int64_t w0, int64_t w1, int32_t band,
                      int32_t* votes, int32_t* ins_votes) {
  const int64_t n = w1 - w0;  // draft window length
  if (n <= 0 || read_len <= 0) return -1;
  const int64_t m = read_len;
  // banded DP over (read pos i, window pos j), band on |j - i*n/m|
  // store full band rows for traceback
  const int64_t W = band;
  std::vector<int32_t> centers(m + 1);
  for (int64_t i = 0; i <= m; ++i)
    centers[i] = (int32_t)((i * n) / m);
  const int32_t INF = 1 << 28;
  std::vector<int32_t> cost((m + 1) * W, INF);
  std::vector<int8_t> move((m + 1) * W, -1);

  auto idx = [&](int64_t i, int64_t j) -> int64_t {
    // band offset of window pos j in row i
    int64_t off = j - (centers[i] - W / 2);
    return (off < 0 || off >= W) ? -1 : i * W + off;
  };
  // init row 0: leading draft bases are "deletions" (free start? global: cost)
  for (int64_t j = std::max<int64_t>(0, centers[0] - W / 2);
       j <= std::min<int64_t>(n, centers[0] + W / 2 - 1); ++j) {
    int64_t x = idx(0, j);
    if (x >= 0) {
      cost[x] = (int32_t)j;  // deleting leading draft bases costs
      move[x] = 1;
    }
  }
  for (int64_t i = 1; i <= m; ++i) {
    const int64_t lo = std::max<int64_t>(0, centers[i] - W / 2);
    const int64_t hi = std::min<int64_t>(n, centers[i] + W / 2 - 1);
    for (int64_t j = lo; j <= hi; ++j) {
      int64_t x = idx(i, j);
      if (x < 0) continue;
      int32_t best = INF;
      int8_t mv = -1;
      if (j > 0) {
        int64_t d = idx(i - 1, j - 1);
        if (d >= 0 && cost[d] < INF) {
          int32_t c = cost[d] + (read[i - 1] == draft[w0 + j - 1] ? 0 : 1);
          if (c < best) { best = c; mv = 0; }
        }
      }
      {
        int64_t u = idx(i - 1, j);
        if (u >= 0 && cost[u] < INF && cost[u] + 1 < best) {
          best = cost[u] + 1; mv = 2;  // read base inserted vs draft
        }
      }
      if (j > 0) {
        int64_t l = idx(i, j - 1);
        if (l >= 0 && cost[l] < INF && cost[l] + 1 < best) {
          best = cost[l] + 1; mv = 1;  // draft base deleted in read
        }
      }
      if (mv >= 0) { cost[x] = best; move[x] = mv; }
    }
  }
  // end: best cell in last row (free draft tail)
  int64_t bj = -1;
  int32_t bc = INF;
  const int64_t lo = std::max<int64_t>(0, centers[m] - W / 2);
  const int64_t hi = std::min<int64_t>(n, centers[m] + W / 2 - 1);
  for (int64_t j = lo; j <= hi; ++j) {
    int64_t x = idx(m, j);
    if (x >= 0 && cost[x] < INF) {
      int32_t c = cost[x];  // tail deletions are free (window may overshoot)
      if (c < bc) { bc = c; bj = j; }
    }
  }
  if (bj < 0) return -1;

  // traceback, voting
  int64_t i = m, j = bj;
  int32_t pending_ins = -1;  // last read base inserted before draft pos
  while (i > 0 || j > 0) {
    int64_t x = idx(i, j);
    if (x < 0 || move[x] < 0) break;
    int8_t mv = move[x];
    if (mv == 0) {
      votes[(w0 + j - 1) * 5 + (read[i - 1] & 3)] += 1;
      if (pending_ins >= 0) {
        ins_votes[(w0 + j) * 4 + (pending_ins & 3)] += 1;
        pending_ins = -1;
      }
      --i; --j;
    } else if (mv == 1) {
      votes[(w0 + j - 1) * 5 + 4] += 1;  // deletion vote
      --j;
    } else {
      pending_ins = read[i - 1];  // insertion (attach to next matched pos)
      --i;
    }
  }
  return 0;
}

// Emit consensus from votes.  Returns output length, or -1 if cap exceeded.
int64_t polish_consensus(const int32_t* votes, const int32_t* ins_votes,
                         const uint8_t* draft, int64_t draft_len,
                         int32_t min_cov, uint8_t* out, int64_t cap) {
  int64_t n_out = 0;
  for (int64_t p = 0; p <= draft_len; ++p) {
    // insertions before position p: majority over covering reads
    int32_t cov_here = 0;
    if (p < draft_len)
      for (int t = 0; t < 5; ++t) cov_here += votes[p * 5 + t];
    int32_t bi = -1, bv = 0;
    for (int t = 0; t < 4; ++t) {
      int32_t v = ins_votes[p * 4 + t];
      if (v > bv) { bv = v; bi = t; }
    }
    if (bi >= 0 && cov_here >= min_cov && bv * 2 > cov_here) {
      if (n_out >= cap) return -1;
      out[n_out++] = (uint8_t)bi;
    }
    if (p == draft_len) break;
    int32_t total = cov_here;
    if (total < min_cov) {  // low coverage: keep draft base
      if (n_out >= cap) return -1;
      out[n_out++] = draft[p];
      continue;
    }
    // deletion must win a strict majority (symmetric with insertion);
    // otherwise emit the best base
    if (votes[p * 5 + 4] * 2 > total) continue;
    int32_t best_t = 0, best_v = -1;
    for (int t = 0; t < 4; ++t) {
      int32_t v = votes[p * 5 + t];
      if (v > best_v) { best_v = v; best_t = t; }
    }
    if (n_out >= cap) return -1;
    out[n_out++] = (uint8_t)best_t;
  }
  return n_out;
}

}  // extern "C"
