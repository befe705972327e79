// pafgroup: native greedy PAF grouping for the rtpose-TPU framework.
//
// A from-scratch, thread-safe C++ implementation of the bottom-up
// peak->limb->person assembly stage with the same decision semantics as the
// reference C++ module (reference lib/pafprocess/pafprocess.cpp:22-194),
// but designed as a reentrant C API over an opaque context (the reference
// keeps results in file-scope globals, pafprocess.cpp:12-13, and is not
// thread-safe).  Exposed to Python via ctypes (see native/__init__.py); used
// as the host fallback / differential oracle for the on-device XLA kernels.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumParts = 18;
constexpr int kNumPairs = 19;
constexpr int kNumSeedPairs = 18;  // pairs eligible to create a new person
constexpr int kStepPaf = 10;
constexpr float kThreshVectorScore = 0.05f;
constexpr int kThreshVectorCnt = 6;
constexpr float kThreshPartCnt = 4.0f;
constexpr float kThreshHumanScore = 0.3f;

constexpr int kPairs[kNumPairs][2] = {
    {1, 2},  {1, 5},   {2, 3},   {3, 4},  {5, 6},  {6, 7},  {1, 8},
    {8, 9},  {9, 10},  {1, 11},  {11, 12}, {12, 13}, {1, 0}, {0, 14},
    {14, 16}, {0, 15}, {15, 17}, {2, 16}, {5, 17}};

constexpr int kPairChannels[kNumPairs][2] = {
    {12, 13}, {20, 21}, {14, 15}, {16, 17}, {22, 23}, {24, 25}, {0, 1},
    {2, 3},   {4, 5},   {6, 7},   {8, 9},   {10, 11}, {28, 29}, {30, 31},
    {34, 35}, {32, 33}, {36, 37}, {18, 19}, {26, 27}};

struct PeakRec {
  int x, y;
  float score;
  int part;
};

struct Candidate {
  float score;
  int ia, ib;
};

}  // namespace

struct PafGroupContext {
  std::vector<PeakRec> peaks;            // in global-id order
  std::vector<std::vector<float>> subset;  // rows of 20
};

extern "C" {

PafGroupContext* pafgroup_create() { return new PafGroupContext(); }
void pafgroup_destroy(PafGroupContext* ctx) { delete ctx; }

// peaks: n x 5 float rows [x, y, score, id, part] in upsampled coordinates
// (x/y truncated to int internally).  paf: (h, w, 38) float32, C-contiguous.
// Returns number of humans found.
int pafgroup_process(PafGroupContext* ctx, const float* peaks_in, int n_peaks,
                     const float* paf, int h, int w) {
  ctx->peaks.clear();
  ctx->subset.clear();

  // Bucket by part, preserving order; re-id in bucket order.
  std::vector<std::vector<int>> bucket(kNumParts);
  std::vector<PeakRec> raw(n_peaks);
  for (int i = 0; i < n_peaks; ++i) {
    const float* r = peaks_in + 5 * i;
    raw[i] = {static_cast<int>(r[0]), static_cast<int>(r[1]), r[2],
              static_cast<int>(r[4])};
  }
  for (int part = 0; part < kNumParts; ++part) {
    for (int i = 0; i < n_peaks; ++i) {
      if (raw[i].part == part) {
        bucket[part].push_back(static_cast<int>(ctx->peaks.size()));
        ctx->peaks.push_back(raw[i]);
      }
    }
  }

  const auto paf_at = [&](int y, int x, int c) -> float {
    return paf[(static_cast<int64_t>(y) * w + x) * 38 + c];
  };

  // Per-pair candidate scoring + greedy 1-1 assignment.
  std::vector<std::vector<std::array<float, 3>>> connections(kNumPairs);
  for (int pair = 0; pair < kNumPairs; ++pair) {
    const auto& a_ids = bucket[kPairs[pair][0]];
    const auto& b_ids = bucket[kPairs[pair][1]];
    if (a_ids.empty() || b_ids.empty()) continue;
    const int ch_x = kPairChannels[pair][0];
    const int ch_y = kPairChannels[pair][1];

    std::vector<Candidate> cands;
    for (size_t ia = 0; ia < a_ids.size(); ++ia) {
      const PeakRec& pa = ctx->peaks[a_ids[ia]];
      for (size_t ib = 0; ib < b_ids.size(); ++ib) {
        const PeakRec& pb = ctx->peaks[b_ids[ib]];
        const float dx = static_cast<float>(pb.x - pa.x);
        const float dy = static_cast<float>(pb.y - pa.y);
        const float norm = std::sqrt(dx * dx + dy * dy);
        if (norm < 1e-12f) continue;
        const float ux = dx / norm, uy = dy / norm;
        float sum = 0.0f;
        int cnt = 0;
        // precomputed step, then i * step: matches the reference
        // get_paf_vectors exactly (pafprocess.cpp:223-229) so 1-ulp
        // rounding cannot flip a sample cell vs the other backends
        const float step_x = dx / kStepPaf;
        const float step_y = dy / kStepPaf;
        for (int s = 0; s < kStepPaf; ++s) {
          const int lx = static_cast<int>(pa.x + s * step_x + 0.5f);
          const int ly = static_cast<int>(pa.y + s * step_y + 0.5f);
          const float sc = ux * paf_at(ly, lx, ch_x) + uy * paf_at(ly, lx, ch_y);
          sum += sc;
          if (sc > kThreshVectorScore) ++cnt;
        }
        const float crit2 = sum / kStepPaf +
            std::min(0.0, 0.5 * h / norm - 1.0);
        if (cnt > kThreshVectorCnt && crit2 > 0.0f) {
          cands.push_back({crit2, static_cast<int>(ia), static_cast<int>(ib)});
        }
      }
    }
    std::stable_sort(cands.begin(), cands.end(),
                     [](const Candidate& a, const Candidate& b) {
                       return a.score > b.score;
                     });
    std::vector<char> used_a(a_ids.size(), 0), used_b(b_ids.size(), 0);
    for (const Candidate& c : cands) {
      if (used_a[c.ia] || used_b[c.ib]) continue;
      used_a[c.ia] = used_b[c.ib] = 1;
      connections[pair].push_back({static_cast<float>(a_ids[c.ia]),
                                   static_cast<float>(b_ids[c.ib]), c.score});
    }
  }

  // Person assembly.
  auto& subset = ctx->subset;
  for (int pair = 0; pair < kNumPairs; ++pair) {
    const int part1 = kPairs[pair][0];
    const int part2 = kPairs[pair][1];
    for (const auto& conn : connections[pair]) {
      const float cid1 = conn[0], cid2 = conn[1], score = conn[2];
      int found = 0, s1 = 0, s2 = 0;
      for (size_t si = 0; si < subset.size(); ++si) {
        if (subset[si][part1] == cid1 || subset[si][part2] == cid2) {
          if (found == 0) s1 = static_cast<int>(si);
          if (found == 1) s2 = static_cast<int>(si);
          ++found;
        }
      }
      if (found == 1) {
        auto& row = subset[s1];
        if (row[part2] != cid2) {
          row[part2] = cid2;
          row[19] += 1;
          row[18] += ctx->peaks[static_cast<int>(cid2)].score + score;
        }
      } else if (found == 2) {
        auto& r1 = subset[s1];
        auto& r2 = subset[s2];
        bool membership = false;
        // '> 0' quirk preserved for reference parity
        // (reference pafprocess.cpp:153-158).
        for (int j = 0; j < kNumParts; ++j) {
          if (r1[j] > 0 && r2[j] > 0) membership = true;
        }
        if (!membership) {
          for (int j = 0; j < kNumParts; ++j) r1[j] += r2[j] + 1;
          r1[19] += r2[19];
          r1[18] += r2[18] + score;
          subset.erase(subset.begin() + s2);
        } else {
          r1[part2] = cid2;
          r1[19] += 1;
          r1[18] += ctx->peaks[static_cast<int>(cid2)].score + score;
        }
      } else if (found == 0 && pair < kNumSeedPairs) {
        std::vector<float> row(20, -1.0f);
        row[part1] = cid1;
        row[part2] = cid2;
        row[19] = 2;
        row[18] = ctx->peaks[static_cast<int>(cid1)].score +
                  ctx->peaks[static_cast<int>(cid2)].score + score;
        subset.push_back(std::move(row));
      }
    }
  }

  subset.erase(
      std::remove_if(subset.begin(), subset.end(),
                     [](const std::vector<float>& row) {
                       return row[19] < kThreshPartCnt ||
                              row[18] / row[19] < kThreshHumanScore;
                     }),
      subset.end());
  return static_cast<int>(subset.size());
}

int pafgroup_num_humans(const PafGroupContext* ctx) {
  return static_cast<int>(ctx->subset.size());
}

// Copy the subset rows into out (num_humans x 20 floats).
void pafgroup_get_subset(const PafGroupContext* ctx, float* out) {
  for (size_t i = 0; i < ctx->subset.size(); ++i) {
    std::memcpy(out + 20 * i, ctx->subset[i].data(), 20 * sizeof(float));
  }
}

// Copy re-bucketed peaks into out (n x 4 floats: x, y, score, part).
int pafgroup_get_peaks(const PafGroupContext* ctx, float* out) {
  for (size_t i = 0; i < ctx->peaks.size(); ++i) {
    out[4 * i + 0] = static_cast<float>(ctx->peaks[i].x);
    out[4 * i + 1] = static_cast<float>(ctx->peaks[i].y);
    out[4 * i + 2] = ctx->peaks[i].score;
    out[4 * i + 3] = static_cast<float>(ctx->peaks[i].part);
  }
  return static_cast<int>(ctx->peaks.size());
}

}  // extern "C"
