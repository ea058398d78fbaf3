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
#include <string>
#include <thread>
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

inline int n_threads(int64_t work) {
  const int hw = (int)std::thread::hardware_concurrency();
  const int by_work = (int)std::min<int64_t>(8, work / (1 << 20) + 1);
  return std::max(1, std::min(hw > 0 ? hw : 1, by_work));
}

// Parallel stable LSD radix sort of (key, payload) pairs, 8-bit digits.
// Stability: threads own contiguous input ranges; scatter offsets are laid
// out (digit-major, thread-minor), so equal keys keep input order —
// deterministic regardless of thread count.
void radix_sort_pairs(std::vector<std::pair<uint64_t, int64_t>>& a,
                      std::vector<std::pair<uint64_t, int64_t>>& b) {
  const int64_t n = (int64_t)a.size();
  if (n < 2) return;
  uint64_t ormask = 0;
  for (int64_t i = 0; i < n; ++i) ormask |= a[i].first;
  const int T = n_threads(n * 16);
  std::vector<int64_t> bounds(T + 1);
  for (int t = 0; t <= T; ++t) bounds[t] = n * t / T;
  std::vector<std::vector<int64_t>> cnt(T, std::vector<int64_t>(256));
  std::vector<std::vector<int64_t>> off(T, std::vector<int64_t>(256));
  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    if (pass > 0 && (ormask >> shift) == 0) break;
    auto count_fn = [&](int t) {
      auto& c = cnt[t];
      std::fill(c.begin(), c.end(), 0);
      for (int64_t i = bounds[t]; i < bounds[t + 1]; ++i)
        ++c[(a[i].first >> shift) & 255];
    };
    {
      std::vector<std::thread> th;
      for (int t = 1; t < T; ++t) th.emplace_back(count_fn, t);
      count_fn(0);
      for (auto& x : th) x.join();
    }
    int64_t acc = 0;
    for (int d = 0; d < 256; ++d)
      for (int t = 0; t < T; ++t) {
        off[t][d] = acc;
        acc += cnt[t][d];
      }
    auto scatter_fn = [&](int t) {
      auto& o = off[t];
      for (int64_t i = bounds[t]; i < bounds[t + 1]; ++i)
        b[o[(a[i].first >> shift) & 255]++] = a[i];
    };
    {
      std::vector<std::thread> th;
      for (int t = 1; t < T; ++t) th.emplace_back(scatter_fn, t);
      scatter_fn(0);
      for (auto& x : th) x.join();
    }
    a.swap(b);
  }
}

}  // namespace

extern "C" {

// Bumped on any ABI change; phasm_tpu/native.py rebuilds stale .so files.
int64_t phasm_native_abi_version() { return 5; }

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
  // parallel over contiguous read ranges; per-thread buffers concatenated
  // in read order afterwards, so output order is identical to the former
  // sequential loop regardless of thread count
  int64_t total_bases = 0;
  for (int64_t r = 0; r < n_reads; ++r) total_bases += lengths[r];
  const int T = n_threads(total_bases);
  std::vector<int64_t> rb(T + 1);
  for (int t = 0; t <= T; ++t) rb[t] = n_reads * t / T;
  struct Buf {
    std::vector<int32_t> read, pos;
    std::vector<uint64_t> canon;
    std::vector<uint8_t> orient;
  };
  std::vector<Buf> bufs(T);

  auto work = [&](int t) {
    Buf& o = bufs[t];
    std::vector<uint64_t> canon, hash;
    std::vector<uint8_t> orient;
    std::vector<int32_t> picks;
    for (int64_t r = rb[t]; r < rb[t + 1]; ++r) {
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

      // window minima, first-min tie-break (== numpy argmin), dedup
      const int32_t win = (nk <= w) ? nk : w;
      std::deque<int32_t> dq;
      picks.clear();
      for (int32_t i = 0; i < nk; ++i) {
        while (!dq.empty() && hash[i] < hash[dq.back()]) dq.pop_back();
        dq.push_back(i);
        if (dq.front() <= i - win) dq.pop_front();
        if (i >= win - 1) picks.push_back(dq.front());
      }
      if (picks.empty() && nk > 0)
        picks.push_back((int32_t)(
            std::min_element(hash.begin(), hash.end()) - hash.begin()));
      std::sort(picks.begin(), picks.end());
      picks.erase(std::unique(picks.begin(), picks.end()), picks.end());
      for (int32_t p : picks) {
        o.read.push_back((int32_t)r);
        o.pos.push_back(p);
        o.canon.push_back(canon[p]);
        o.orient.push_back(orient[p]);
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (int t = 1; t < T; ++t) th.emplace_back(work, t);
    work(0);
    for (auto& x : th) x.join();
  }
  int64_t n_out = 0;
  for (int t = 0; t < T; ++t) n_out += (int64_t)bufs[t].read.size();
  if (n_out > cap) return -1;
  int64_t o = 0;
  for (int t = 0; t < T; ++t) {
    const int64_t m = (int64_t)bufs[t].read.size();
    std::memcpy(out_read + o, bufs[t].read.data(), m * 4);
    std::memcpy(out_pos + o, bufs[t].pos.data(), m * 4);
    std::memcpy(out_canon + o, bufs[t].canon.data(), m * 8);
    std::memcpy(out_orient + o, bufs[t].orient.data(), m * 1);
    o += m;
  }
  return n_out;
}

// Seed matching: emit all cross-read pairs per canonical-k-mer bucket
// (buckets larger than max_occ skipped), with relative strand and diagonal
// in the a-forward frame (a = smaller read id).
//
// presorted != 0 asserts the caller already sorted seeds by (canon,
// read_id) — the production path: a numpy combined-key sort of 45M seeds
// takes ~2 s where the former std::stable_sort through a 64-bit comparator
// lambda took 71 s at c6 geometry (round-5 host-seeding profile), and the
// blocked engine re-paid it per tile (8x).  presorted == 0 keeps the
// self-sorting behavior for ad-hoc callers.
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
                         int32_t presorted,
                         int32_t* out_a, int32_t* out_b,
                         int32_t* out_strand, int32_t* out_diag, int64_t cap) {
  std::vector<int64_t> order;
  const int64_t* ord = nullptr;
  if (!presorted) {
    order.resize(n_seeds);
    for (int64_t i = 0; i < n_seeds; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
      if (canon[x] != canon[y]) return canon[x] < canon[y];
      return read_id[x] < read_id[y];
    });
    ord = order.data();
  }
  auto at = [&](int64_t t) -> int64_t { return ord ? ord[t] : t; };

  int64_t n_out = 0;
  int64_t s = 0;
  while (s < n_seeds) {
    int64_t e = s + 1;
    while (e < n_seeds && canon[at(e)] == canon[at(s)]) ++e;
    const int64_t c = e - s;
    if (c >= 2 && c <= max_occ) {
      for (int64_t x = s; x < e; ++x) {
        for (int64_t y = x + 1; y < e; ++y) {
          int64_t i = at(x), j = at(y);
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

// 64-bit LSB radix argsort: writes the sorting permutation of keys[0..n)
// into order_out (stable).  8 passes x 8 bits with (key, idx) payload —
// ~20x the throughput of comparator std::stable_sort on 45M+ seed keys.
void sort_u64_order(const uint64_t* keys, int64_t n, int64_t* order_out) {
  std::vector<std::pair<uint64_t, int64_t>> a(n), b(n);
  for (int64_t i = 0; i < n; ++i) a[i] = {keys[i], i};
  radix_sort_pairs(a, b);
  for (int64_t i = 0; i < n; ++i) order_out[i] = a[i].second;
}

// Candidate histogram over raw seed pairs: group by (a, b, strand,
// diag band), count + mean-diag per bucket, keep buckets with >= min_seeds
// seeds, then per (a, b, strand) keep the band with the most seeds
// (smallest band on ties).  Bit-identical to the numpy reference in
// seeding.match_seeds (key packing, floor division and tie-breaks match);
// replaces a 76M-row np.unique full sort (33 s) + key build (15 s) at c6
// geometry with one radix sort + linear scans (~6 s).
// Returns output rows, or -1 if cap exceeded.
int64_t pair_histogram(const int32_t* a, const int32_t* b, const int32_t* st,
                       const int32_t* diag, int64_t n_pairs, int64_t n_reads,
                       int32_t diag_band, int32_t min_seeds,
                       int32_t* out_a, int32_t* out_b, int32_t* out_st,
                       int32_t* out_d0, int32_t* out_cnt, int64_t cap) {
  // key = ((a*(n_reads+1)+b)*2 + st) << 22 | band  (band = floor_divide
  // (diag + 2^20, diag_band) — non-negative for |diag| < 2^20)
  std::vector<std::pair<uint64_t, int64_t>> kv(n_pairs), tmp(n_pairs);
  for (int64_t i = 0; i < n_pairs; ++i) {
    const int64_t band =
        ((int64_t)diag[i] + (1LL << 20)) / diag_band;  // diag >= -2^20: >= 0
    const uint64_t key =
        ((((uint64_t)a[i] * (n_reads + 1) + b[i]) * 2 + st[i]) << 22) |
        (uint64_t)band;
    kv[i] = {key, diag[i]};
  }
  radix_sort_pairs(kv, tmp);
  // linear scan: per band-bucket (count, diag sum); per (pair, strand)
  // group keep (max count, then smallest band); emit in pk-ascending order
  int64_t n_out = 0;
  int64_t i = 0;
  while (i < n_pairs) {
    const uint64_t pk = kv[i].first >> 22;  // (pair, strand) group
    int32_t best_cnt = 0;
    uint64_t best_band = 0;
    int64_t best_dsum = 0;
    while (i < n_pairs && (kv[i].first >> 22) == pk) {
      const uint64_t key = kv[i].first;
      int32_t cnt = 0;
      int64_t dsum = 0;
      while (i < n_pairs && kv[i].first == key) {
        dsum += kv[i].second;
        ++cnt;
        ++i;
      }
      if (cnt >= min_seeds && cnt > best_cnt) {
        best_cnt = cnt;
        best_band = key & ((1 << 22) - 1);
        best_dsum = dsum;
      }
      // ties keep the FIRST (smallest band): bands scan in ascending order
      (void)best_band;
    }
    if (best_cnt > 0) {
      if (n_out >= cap) return -1;
      const uint64_t rest = pk;
      out_st[n_out] = (int32_t)(rest & 1);
      const uint64_t ab = rest >> 1;
      out_b[n_out] = (int32_t)(ab % (uint64_t)(n_reads + 1));
      out_a[n_out] = (int32_t)(ab / (uint64_t)(n_reads + 1));
      // numpy floor division semantics for possibly-negative dsum
      const int64_t c = best_cnt;
      int64_t q = best_dsum >= 0 ? best_dsum / c
                                 : -((-best_dsum + c - 1) / c);
      out_d0[n_out] = (int32_t)q;
      out_cnt[n_out] = best_cnt;
      ++n_out;
    }
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Consensus polishing (racon-lite): anchor-chained banded read-vs-draft
// alignment with traceback + per-position base/deletion/INSERTION-SEGMENT
// voting.  Improves haplotig base identity from raw-read level (~1-2x read
// error) to the pileup consensus.
//
// Two mechanisms beyond naive pileup voting (both motivated by the round-4
// residual-error diagnosis: 41 clusters of 20-85 missing truth bases at
// unitig spelling junctions = 822 of 1046 residual edits on the c3-class
// diagnostic):
//
//   * the DP band follows a PIECEWISE-LINEAR CENTERLINE through chained
//     exact k-mer anchors (minimap2-style), not a straight line across the
//     window — a straight centerline drifts off the true path at read ends
//     and at any multi-base draft gap, so gap-spanning reads either
//     smeared their insertions or were skipped entirely;
//   * insertions vote as whole SEGMENTS; segments that cannot win an
//     exact-string majority (a >=4-base segment from 6%-error reads
//     essentially never matches another read's exactly) are restored via
//     the weighted MEDOID of the observed segments, and the caller
//     iterates polish so per-base voting cleans the spliced region.
//
// No counterpart in the reference (it emits raw read spellings); this is a
// "beat the reference" quality pass.  Python oracle: phasm_tpu/polish_oracle.py.
// ---------------------------------------------------------------------------

namespace {

// One insertion-segment observation: read bases inserted immediately before
// draft position `pos`.  Segments <= 28 bases pack inline (2 bits/base +
// length); longer ones index a side table of deduped strings.
struct InsEntry {
  int64_t pos;
  uint64_t key;
};

constexpr uint64_t kLongFlag = 1ULL << 63;
constexpr int kAnchorK = 13;           // anchor k-mer length
constexpr int kMaxWindowHits = 4;      // skip k-mers with more window hits
constexpr int kMaxAnchors = 1024;      // subsample cap per read
constexpr int kMinSpliceLen = 4;       // medoid path applies to segments >= this
constexpr int kSpliceSuppress = 8;     // min draft-position gap between splices

struct PolishAcc {
  std::vector<uint8_t> draft;
  int64_t n = 0;
  std::vector<int32_t> votes;        // [n][5] A,C,G,T,del
  std::vector<InsEntry> ins;         // segment observations
  std::vector<std::string> long_seg; // side table for segments > 28 bases
  // draft k-mer index: entries sorted by (kmer, pos)
  std::vector<std::pair<uint64_t, int64_t>> kidx;
  // scratch reused across reads
  std::vector<int32_t> centers;
  std::vector<int32_t> cost;
  std::vector<int8_t> move;
  std::vector<std::pair<int64_t, int64_t>> anchors;  // (read pos i, window pos j)
  std::vector<int32_t> chain_score, chain_prev;
  std::string pending;
};

inline uint64_t pack_seg(const std::string& s, PolishAcc* acc) {
  const size_t L = s.size();
  if (L <= 28) {
    uint64_t v = (uint64_t)L << 56;
    for (size_t t = 0; t < L; ++t) v |= (uint64_t)(s[t] & 3) << (2 * t);
    return v;
  }
  for (size_t i = 0; i < acc->long_seg.size(); ++i)
    if (acc->long_seg[i] == s) return kLongFlag | (uint64_t)i;
  acc->long_seg.push_back(s);
  return kLongFlag | (uint64_t)(acc->long_seg.size() - 1);
}

inline int64_t seg_len_of(const PolishAcc* acc, uint64_t key) {
  if (key & kLongFlag) return (int64_t)acc->long_seg[key & ~kLongFlag].size();
  return (int64_t)(key >> 56);
}

// banded edit distance between two short segments (for medoid selection)
int32_t seg_edit_dist(const uint8_t* a, int64_t la, const uint8_t* b,
                      int64_t lb) {
  std::vector<int32_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = (int32_t)j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = (int32_t)i;
    for (int64_t j = 1; j <= lb; ++j) {
      int32_t c = prev[j - 1] + (a[i - 1] == b[j - 1] ? 0 : 1);
      c = std::min(c, prev[j] + 1);
      c = std::min(c, cur[j - 1] + 1);
      cur[j] = c;
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// Build piecewise-linear DP centers through chained k-mer anchors.
// Falls back to straight-line interpolation when no chain is found.
void build_centers(PolishAcc* acc, const uint8_t* read, int64_t m, int64_t w0,
                   int64_t w1) {
  const int64_t n = w1 - w0;
  int32_t* centers = acc->centers.data();
  auto linear = [&]() {
    for (int64_t i = 0; i <= m; ++i) centers[i] = (int32_t)((i * n) / m);
  };
  if (m < kAnchorK || n < kAnchorK || acc->kidx.empty()) {
    linear();
    return;
  }
  // collect anchors: read k-mer -> draft positions inside [w0, w1)
  acc->anchors.clear();
  const uint64_t mask = (1ULL << (2 * kAnchorK)) - 1;
  uint64_t v = 0;
  for (int64_t i = 0; i < m; ++i) {
    v = ((v << 2) | (read[i] & 3)) & mask;
    if (i < kAnchorK - 1) continue;
    const int64_t ip = i - kAnchorK + 1;
    auto lo = std::lower_bound(acc->kidx.begin(), acc->kidx.end(),
                               std::make_pair(v, w0));
    auto hi = std::lower_bound(acc->kidx.begin(), acc->kidx.end(),
                               std::make_pair(v, w1));
    const int64_t cnt = hi - lo;
    if (cnt < 1 || cnt > kMaxWindowHits) continue;
    for (auto it = lo; it != hi; ++it)
      acc->anchors.push_back({ip, it->second - w0});
  }
  if (acc->anchors.size() < 2) {
    linear();
    return;
  }
  // subsample evenly to kMaxAnchors (anchors are already sorted by read pos
  // i, then draft pos j via the index order within each i)
  std::sort(acc->anchors.begin(), acc->anchors.end());
  if ((int64_t)acc->anchors.size() > kMaxAnchors) {
    std::vector<std::pair<int64_t, int64_t>> sub;
    const double step = (double)acc->anchors.size() / kMaxAnchors;
    for (int64_t t = 0; t < kMaxAnchors; ++t)
      sub.push_back(acc->anchors[(size_t)(t * step)]);
    acc->anchors.swap(sub);
  }
  // O(A^2) chain DP: longest chain with strictly increasing (i, j) and a
  // bounded diagonal jump (gap splices shift the diagonal by the gap size)
  const int64_t A = acc->anchors.size();
  acc->chain_score.assign(A, 1);
  acc->chain_prev.assign(A, -1);
  int64_t best_end = 0;
  for (int64_t x = 0; x < A; ++x) {
    const auto [ix, jx] = acc->anchors[x];
    for (int64_t y = x - 1; y >= 0; --y) {
      const auto [iy, jy] = acc->anchors[y];
      if (ix - iy > 4096) break;  // sorted by i: older anchors only get worse
      if (iy >= ix || jy >= jx) continue;
      const int64_t dd = (jx - ix) - (jy - iy);
      if (dd > 2048 || dd < -2048) continue;
      if (acc->chain_score[y] + 1 > acc->chain_score[x]) {
        acc->chain_score[x] = acc->chain_score[y] + 1;
        acc->chain_prev[x] = (int32_t)y;
      }
    }
    if (acc->chain_score[x] > acc->chain_score[best_end]) best_end = x;
  }
  if (acc->chain_score[best_end] < 2) {
    linear();
    return;
  }
  // walk the chain into (i, j) knots, forward order
  std::vector<std::pair<int64_t, int64_t>> knots;
  for (int64_t x = best_end; x >= 0; x = acc->chain_prev[x]) {
    knots.push_back(acc->anchors[x]);
    if (acc->chain_prev[x] < 0) break;
  }
  std::reverse(knots.begin(), knots.end());
  // piecewise-linear centers through knots; slope-1 extrapolation outside
  const auto [i0, j0] = knots.front();
  for (int64_t i = 0; i <= std::min(i0, m); ++i)
    centers[i] = (int32_t)std::max<int64_t>(0, std::min(n, j0 - (i0 - i)));
  for (size_t t = 0; t + 1 < knots.size(); ++t) {
    const auto [ia, ja] = knots[t];
    const auto [ib, jb] = knots[t + 1];
    for (int64_t i = ia; i <= ib; ++i)
      centers[i] = (int32_t)(ja + (jb - ja) * (i - ia) / (ib - ia));
  }
  const auto [ie, je] = knots.back();
  for (int64_t i = ie; i <= m; ++i)
    centers[i] = (int32_t)std::min<int64_t>(n, je + (i - ie));
}

}  // namespace

extern "C" {

void* polish_new(const uint8_t* draft, int64_t draft_len) {
  auto* acc = new PolishAcc();
  acc->draft.assign(draft, draft + draft_len);
  acc->n = draft_len;
  acc->votes.assign((size_t)draft_len * 5, 0);
  // draft k-mer index for anchor lookup
  if (draft_len >= kAnchorK) {
    acc->kidx.reserve(draft_len - kAnchorK + 1);
    const uint64_t mask = (1ULL << (2 * kAnchorK)) - 1;
    uint64_t v = 0;
    for (int64_t p = 0; p < draft_len; ++p) {
      v = ((v << 2) | (draft[p] & 3)) & mask;
      if (p >= kAnchorK - 1) acc->kidx.push_back({v, p - kAnchorK + 1});
    }
    std::sort(acc->kidx.begin(), acc->kidx.end());
  }
  return acc;
}

void polish_free(void* h) { delete (PolishAcc*)h; }

// Align one read to draft[w0..w1) with band around the anchor-chained
// centerline and accumulate votes + insertion segments.
//
// AFFINE gap costs (match 0 / mismatch 3 / gap open 4 / gap extend 2,
// 3-state Gotoh DP): with unit costs, a multi-base draft gap ties with a
// smear of scattered single-base insertions threaded through spurious
// matches in the random gap-region sequence (~25% of bases match by
// chance), and the diag-preferring traceback picks the smear — the round-5
// diagnosis showed an 80-base gap arriving as len-1..12 fragments across
// 12 positions, unable to win any consensus.  Affine costs make the
// contiguous run strictly cheapest (4 + 2L vs >= (4+2e)·fragments).
//
// Returns 0 on success, -1 if the band produced no valid endpoint (skipped).
int polish_add(void* h, const uint8_t* read, int32_t read_len,
               int64_t w0, int64_t w1, int32_t band) {
  auto* acc = (PolishAcc*)h;
  const uint8_t* draft = acc->draft.data();
  const int64_t n = w1 - w0;  // draft window length
  if (n <= 0 || read_len <= 0) return -1;
  const int64_t m = read_len;
  const int32_t MIS = 3, GO = 4, GE = 2;
  // banded 3-state DP over (read pos i, window pos j), band around the
  // centerline.  States: 0 = M (diag), 1 = D (draft deleted), 2 = I (read
  // inserted).  Layout: [(i * W + off) * 3 + state].
  const int64_t W = band;
  acc->centers.resize(m + 1);
  build_centers(acc, read, m, w0, w1);
  int32_t* centers = acc->centers.data();
  const int32_t INF = 1 << 28;
  acc->cost.assign((size_t)(m + 1) * W * 3, INF);
  acc->move.assign((size_t)(m + 1) * W * 3, -1);
  int32_t* cost = acc->cost.data();
  int8_t* mvs = acc->move.data();  // predecessor state, or 3 = start marker

  auto idx = [&](int64_t i, int64_t j) -> int64_t {
    // band offset of window pos j in row i
    int64_t off = j - (centers[i] - W / 2);
    return (off < 0 || off >= W) ? -1 : (i * W + off) * 3;
  };
  // init row 0: semiglobal — the read may START at any draft position in
  // the row-0 band for free (marker 3, traceback stops there; draft
  // positions before the start get NO votes)
  for (int64_t j = std::max<int64_t>(0, centers[0] - W / 2);
       j <= std::min<int64_t>(n, centers[0] + W / 2 - 1); ++j) {
    int64_t x = idx(0, j);
    if (x >= 0) {
      cost[x] = 0;
      mvs[x] = 3;
    }
  }
  for (int64_t i = 1; i <= m; ++i) {
    const int64_t lo = std::max<int64_t>(0, centers[i] - W / 2);
    const int64_t hi = std::min<int64_t>(n, centers[i] + W / 2 - 1);
    const uint8_t rb = read[i - 1] & 3;
    for (int64_t j = lo; j <= hi; ++j) {
      int64_t x = idx(i, j);
      if (x < 0) continue;
      // M: consume (read i-1, draft j-1) from any predecessor state
      if (j > 0) {
        int64_t d = idx(i - 1, j - 1);
        if (d >= 0) {
          int32_t best = cost[d], st = 0;
          if (cost[d + 1] < best) { best = cost[d + 1]; st = 1; }
          if (cost[d + 2] < best) { best = cost[d + 2]; st = 2; }
          if (best < INF) {
            cost[x] = best + (rb == draft[w0 + j - 1] ? 0 : MIS);
            mvs[x] = (int8_t)st;
          }
        }
      }
      // D: draft base j-1 deleted (j moves, i fixed) — within-row, so
      // compute left-to-right (j ascending guarantees (i, j-1) done)
      if (j > 0) {
        int64_t l = idx(i, j - 1);
        if (l >= 0) {
          int32_t cm = cost[l] < INF ? cost[l] + GO + GE : INF;
          int32_t cd = cost[l + 1] < INF ? cost[l + 1] + GE : INF;
          int32_t ci = cost[l + 2] < INF ? cost[l + 2] + GO + GE : INF;
          int32_t best = cm;
          int8_t st = 0;
          if (cd < best) { best = cd; st = 1; }
          if (ci < best) { best = ci; st = 2; }
          if (best < INF) { cost[x + 1] = best; mvs[x + 1] = st; }
        }
      }
      // I: read base i-1 inserted (i moves, j fixed)
      {
        int64_t u = idx(i - 1, j);
        if (u >= 0) {
          int32_t cm = cost[u] < INF ? cost[u] + GO + GE : INF;
          int32_t cd = cost[u + 1] < INF ? cost[u + 1] + GO + GE : INF;
          int32_t ci = cost[u + 2] < INF ? cost[u + 2] + GE : INF;
          int32_t best = cm;
          int8_t st = 0;
          if (cd < best) { best = cd; st = 1; }
          if (ci < best) { best = ci; st = 2; }
          if (best < INF) { cost[x + 2] = best; mvs[x + 2] = st; }
        }
      }
    }
  }
  // end: best (state, j) in last row (free draft tail)
  int64_t bj = -1;
  int32_t bc = INF;
  int8_t bst = 0;
  const int64_t lo = std::max<int64_t>(0, centers[m] - W / 2);
  const int64_t hi = std::min<int64_t>(n, centers[m] + W / 2 - 1);
  for (int64_t j = lo; j <= hi; ++j) {
    int64_t x = idx(m, j);
    if (x < 0) continue;
    for (int8_t s = 0; s < 3; ++s)
      if (cost[x + s] < bc) { bc = cost[x + s]; bj = j; bst = s; }
  }
  if (bj < 0) return -1;

  // traceback, voting.  Insertion runs are collected (in traceback order,
  // i.e. reversed) and flushed as one segment at the next matched draft
  // position: forward-order insertions between matches at draft positions
  // p-1 and p are "one segment before p".
  int64_t i = m, j = bj;
  int8_t st = bst;
  std::string& pending = acc->pending;
  pending.clear();
  while (i > 0 || j > 0) {
    int64_t x = idx(i, j);
    if (x < 0) break;
    int8_t pred = mvs[x + st];
    if (pred < 0) break;
    if (st == 0) {
      if (pred == 3) break;  // start marker: read start maps here, stop
      acc->votes[(size_t)(w0 + j - 1) * 5 + (read[i - 1] & 3)] += 1;
      if (!pending.empty()) {
        std::reverse(pending.begin(), pending.end());
        acc->ins.push_back({w0 + j, pack_seg(pending, acc)});
        pending.clear();
      }
      --i; --j;
    } else if (st == 1) {
      acc->votes[(size_t)(w0 + j - 1) * 5 + 4] += 1;  // deletion vote
      --j;
    } else {
      pending.push_back((char)(read[i - 1] & 3));  // insertion run member
      --i;
    }
    st = pred;
  }
  // leading read overhang (pending at window start) is a soft clip: dropped
  pending.clear();
  return 0;
}

}  // extern "C"

namespace {

inline std::string decode_seg(const PolishAcc* acc, uint64_t key) {
  if (key & kLongFlag) return acc->long_seg[key & ~kLongFlag];
  const int64_t L = (int64_t)(key >> 56);
  std::string s(L, 0);
  for (int64_t t = 0; t < L; ++t) s[t] = (char)((key >> (2 * t)) & 3);
  return s;
}

}  // namespace

extern "C" {

// Emit consensus from accumulated votes.  An insertion segment before
// position p is emitted when its exact sequence wins a strict majority of
// the reads covering p; long segments (>= 4 bases — exact matches between
// error-bearing reads are hopeless there) fall back to the weighted MEDOID
// of the observed segments when total long-segment evidence reaches 1/4 of
// coverage (>= min_cov observations).  Medoid splices within 8 positions of
// a stronger one are suppressed (overlapping attachments of the same gap).
// pos_map (len n+1, may be NULL) receives the output coordinate of every
// draft position, so callers can remap member offsets for iterative polish.
// Returns output length, or -1 if cap exceeded.
int64_t polish_finish(void* h, int32_t min_cov, uint8_t* out, int64_t cap,
                      int64_t* pos_map) {
  auto* acc = (PolishAcc*)h;
  const int64_t n = acc->n;
  const int32_t* votes = acc->votes.data();
  // group segment observations by (pos, key)
  std::sort(acc->ins.begin(), acc->ins.end(),
            [](const InsEntry& a, const InsEntry& b) {
              if (a.pos != b.pos) return a.pos < b.pos;
              return a.key < b.key;
            });
  const size_t NI = acc->ins.size();

  // ---- pass 1: per-position decisions (exact-majority emit or medoid
  // splice candidate) ----
  struct Splice {
    int64_t pos;
    int32_t support;
    std::string seg;
  };
  std::vector<Splice> cands;
  std::vector<std::pair<int64_t, uint64_t>> exact_emit;  // (pos, key)
  size_t cur = 0;
  while (cur < NI) {
    const int64_t p = acc->ins[cur].pos;
    int32_t cov_here = 0;
    if (p < n)
      for (int t = 0; t < 5; ++t) cov_here += votes[p * 5 + t];
    uint64_t best_key = 0;
    int32_t best_cnt = 0;
    int32_t tot_long = 0;
    size_t grp0 = cur;
    while (cur < NI && acc->ins[cur].pos == p) {
      size_t e = cur + 1;
      while (e < NI && acc->ins[e].pos == p &&
             acc->ins[e].key == acc->ins[cur].key)
        ++e;
      const int32_t cnt = (int32_t)(e - cur);
      if (cnt > best_cnt) {
        best_cnt = cnt;
        best_key = acc->ins[cur].key;
      }
      if (seg_len_of(acc, acc->ins[cur].key) >= kMinSpliceLen) tot_long += cnt;
      cur = e;
    }
    if (best_cnt > 0 && cov_here >= min_cov && best_cnt * 2 > cov_here) {
      exact_emit.push_back({p, best_key});
      continue;
    }
    if (tot_long >= min_cov && tot_long * 4 > cov_here) {
      // weighted medoid over the long segments observed at p
      std::vector<std::pair<std::string, int32_t>> segs;
      for (size_t x = grp0; x < cur;) {
        size_t e = x + 1;
        while (e < cur && acc->ins[e].key == acc->ins[x].key) ++e;
        if (seg_len_of(acc, acc->ins[x].key) >= kMinSpliceLen)
          segs.push_back({decode_seg(acc, acc->ins[x].key),
                          (int32_t)(e - x)});
        x = e;
      }
      int64_t best_i = -1;
      int64_t best_d = INT64_MAX;
      for (size_t a = 0; a < segs.size(); ++a) {
        int64_t d = 0;
        for (size_t b = 0; b < segs.size(); ++b) {
          if (a == b) continue;
          d += (int64_t)segs[b].second *
               seg_edit_dist((const uint8_t*)segs[a].first.data(),
                             segs[a].first.size(),
                             (const uint8_t*)segs[b].first.data(),
                             segs[b].first.size());
        }
        // prefer higher own count on distance ties (then key order = first)
        d = d * 1024 - segs[a].second;
        if (d < best_d) {
          best_d = d;
          best_i = (int64_t)a;
        }
      }
      if (best_i >= 0)
        cands.push_back({p, tot_long, segs[best_i].first});
    }
  }
  // ---- pass 2: greedy splice acceptance, suppressing near-overlaps ----
  std::vector<int64_t> order(cands.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = (int64_t)i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (cands[a].support != cands[b].support)
      return cands[a].support > cands[b].support;
    return cands[a].pos < cands[b].pos;
  });
  std::vector<char> accepted(cands.size(), 0);
  std::vector<int64_t> taken;  // accepted positions
  for (int64_t oi : order) {
    bool clash = false;
    for (int64_t tp : taken)
      if (std::abs(tp - cands[oi].pos) <= kSpliceSuppress) {
        clash = true;
        break;
      }
    if (!clash) {
      accepted[oi] = 1;
      taken.push_back(cands[oi].pos);
    }
  }
  // index accepted splices / exact emits by position for the emit pass
  std::vector<std::pair<int64_t, const std::string*>> splice_at;
  for (size_t i = 0; i < cands.size(); ++i)
    if (accepted[i]) splice_at.push_back({cands[i].pos, &cands[i].seg});
  std::sort(splice_at.begin(), splice_at.end());

  // ---- pass 3: emit ----
  size_t se = 0, ee = 0;
  int64_t n_out = 0;
  for (int64_t p = 0; p <= n; ++p) {
    while (ee < exact_emit.size() && exact_emit[ee].first < p) ++ee;
    while (se < splice_at.size() && splice_at[se].first < p) ++se;
    if (se < splice_at.size() && splice_at[se].first == p) {
      const std::string& s = *splice_at[se].second;
      if (n_out + (int64_t)s.size() > cap) return -1;
      for (char c : s) out[n_out++] = (uint8_t)(c & 3);
    } else if (ee < exact_emit.size() && exact_emit[ee].first == p) {
      const std::string s = decode_seg(acc, exact_emit[ee].second);
      if (n_out + (int64_t)s.size() > cap) return -1;
      for (char c : s) out[n_out++] = (uint8_t)(c & 3);
    }
    if (p == n) break;
    int32_t total = 0;
    for (int t = 0; t < 5; ++t) total += votes[p * 5 + t];
    if (pos_map) pos_map[p] = n_out;  // coordinate of the base itself
    if (total < min_cov) {  // low coverage: keep draft base
      if (n_out >= cap) return -1;
      out[n_out++] = acc->draft[p];
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
  if (pos_map) pos_map[n] = n_out;
  return n_out;
}

}  // extern "C"
