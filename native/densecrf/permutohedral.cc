#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <unordered_map>

namespace spml {
namespace {

// Hash for short lattice-coordinate keys.
struct KeyHash {
  std::size_t operator()(const std::vector<int16_t>& k) const {
    std::size_t h = 0;
    for (int16_t v : k) h = h * 2531011u + static_cast<uint16_t>(v);
    return h;
  }
};

}  // namespace

void Permutohedral::Init(const float* features, int n, int d) {
  n_ = n;
  d_ = d;
  offsets_.assign(static_cast<std::size_t>(n) * (d + 1), 0);
  barycentric_.assign(static_cast<std::size_t>(n) * (d + 1), 0.f);

  // Scaling so that lattice spacing matches an isotropic unit Gaussian.
  std::vector<float> scale(d);
  const float inv_std = std::sqrt(2.f / 3.f) * (d + 1);
  for (int i = 0; i < d; ++i)
    scale[i] = inv_std / std::sqrt(float(i + 1) * (i + 2));

  std::unordered_map<std::vector<int16_t>, int32_t, KeyHash> table;
  table.reserve(static_cast<std::size_t>(n) * 2);

  std::vector<float> elevated(d + 1);
  std::vector<int> rem0(d + 1), rank(d + 1);
  std::vector<float> bary(d + 2);
  std::vector<int16_t> key(d);

  for (int p = 0; p < n; ++p) {
    const float* f = features + static_cast<std::size_t>(p) * d;

    // Embed into the hyperplane H_d in R^{d+1}.
    float sm = 0.f;
    for (int j = d; j > 0; --j) {
      const float cf = f[j - 1] * scale[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Closest remainder-zero lattice point.
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      int rd = static_cast<int>(std::round(elevated[i] / (d + 1)));
      rem0[i] = rd * (d + 1);
      sum += rd;
    }

    // Rank differentials (ties broken consistently by index order).
    std::fill(rank.begin(), rank.end(), 0);
    for (int i = 0; i <= d; ++i) {
      const float di = elevated[i] - rem0[i];
      for (int j = i + 1; j <= d; ++j) {
        const float dj = elevated[j] - rem0[j];
        if (di < dj)
          ++rank[i];
        else
          ++rank[j];
      }
    }

    // Fix points outside the canonical simplex.
    for (int i = 0; i <= d; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += d + 1;
        rem0[i] += d + 1;
      } else if (rank[i] > d) {
        rank[i] -= d + 1;
        rem0[i] -= d + 1;
      }
    }

    // Barycentric coordinates.
    std::fill(bary.begin(), bary.end(), 0.f);
    for (int i = 0; i <= d; ++i) {
      const float v = (elevated[i] - rem0[i]) / (d + 1);
      bary[d - rank[i]] += v;
      bary[d + 1 - rank[i]] -= v;
    }
    bary[0] += 1.f + bary[d + 1];

    // Register the d+1 enclosing simplex vertices.
    for (int r = 0; r <= d; ++r) {
      for (int i = 0; i < d; ++i) {
        int16_t coord = static_cast<int16_t>(rem0[i]);
        coord += static_cast<int16_t>(rank[i] <= d - r ? r : r - (d + 1));
        key[i] = coord;
      }
      auto it = table.find(key);
      int32_t idx;
      if (it == table.end()) {
        idx = static_cast<int32_t>(table.size());
        table.emplace(key, idx);
      } else {
        idx = it->second;
      }
      offsets_[static_cast<std::size_t>(p) * (d + 1) + r] = idx;
      barycentric_[static_cast<std::size_t>(p) * (d + 1) + r] = bary[r];
    }
  }

  offset_count_ = table.size();

  // Precompute blur neighbors: for occupied lattice point k and axis j,
  // the neighbors are k +/- (1,...,1) with -(d) (resp. +(d)) in slot j.
  blur_plus_.assign((d + 1) * offset_count_, -1);
  blur_minus_.assign((d + 1) * offset_count_, -1);
  std::vector<int16_t> nkey(d);
  for (const auto& kv : table) {
    const std::vector<int16_t>& k = kv.first;
    const int32_t idx = kv.second;
    for (int j = 0; j <= d; ++j) {
      // plus neighbor
      for (int i = 0; i < d; ++i)
        nkey[i] = static_cast<int16_t>(k[i] + 1 - (i == j ? d + 1 : 0));
      // note: axis j == d corresponds to no subtraction inside first d
      // coords (the implicit last coordinate absorbs it)
      auto it = table.find(nkey);
      blur_plus_[static_cast<std::size_t>(j) * offset_count_ + idx] =
          (it == table.end()) ? -1 : it->second;
      // minus neighbor
      for (int i = 0; i < d; ++i)
        nkey[i] = static_cast<int16_t>(k[i] - 1 + (i == j ? d + 1 : 0));
      it = table.find(nkey);
      blur_minus_[static_cast<std::size_t>(j) * offset_count_ + idx] =
          (it == table.end()) ? -1 : it->second;
    }
  }
}

void Permutohedral::Compute(const float* in, float* out,
                            int value_size) const {
  const int vd = value_size;
  const std::size_t M = offset_count_;
  std::vector<float> values(M * vd, 0.f);
  std::vector<float> new_values(M * vd, 0.f);

  // Splat.
  for (int p = 0; p < n_; ++p) {
    for (int r = 0; r <= d_; ++r) {
      const int32_t o = offsets_[static_cast<std::size_t>(p) * (d_ + 1) + r];
      const float w = barycentric_[static_cast<std::size_t>(p) * (d_ + 1) + r];
      float* dst = values.data() + static_cast<std::size_t>(o) * vd;
      const float* src = in + static_cast<std::size_t>(p) * vd;
      for (int c = 0; c < vd; ++c) dst[c] += w * src[c];
    }
  }

  // Blur along each lattice axis with [1/4, 1/2, 1/4].
  for (int j = 0; j <= d_; ++j) {
    const int32_t* plus = blur_plus_.data() + static_cast<std::size_t>(j) * M;
    const int32_t* minus =
        blur_minus_.data() + static_cast<std::size_t>(j) * M;
#pragma omp parallel for schedule(static)
    for (std::size_t m = 0; m < M; ++m) {
      const float* self = values.data() + m * vd;
      const float* vp =
          plus[m] >= 0 ? values.data() + static_cast<std::size_t>(plus[m]) * vd
                       : nullptr;
      const float* vm = minus[m] >= 0
                            ? values.data() +
                                  static_cast<std::size_t>(minus[m]) * vd
                            : nullptr;
      float* dst = new_values.data() + m * vd;
      for (int c = 0; c < vd; ++c) {
        float v = 0.5f * self[c];
        if (vp) v += 0.25f * vp[c];
        if (vm) v += 0.25f * vm[c];
        dst[c] = v;
      }
    }
    values.swap(new_values);
  }

  // Slice (with the alpha correction for the blur gain).
  const float alpha = 1.f / (1.f + std::pow(2.f, -d_));
  std::memset(out, 0, static_cast<std::size_t>(n_) * vd * sizeof(float));
#pragma omp parallel for schedule(static)
  for (int p = 0; p < n_; ++p) {
    float* dst = out + static_cast<std::size_t>(p) * vd;
    for (int r = 0; r <= d_; ++r) {
      const int32_t o = offsets_[static_cast<std::size_t>(p) * (d_ + 1) + r];
      const float w = barycentric_[static_cast<std::size_t>(p) * (d_ + 1) + r];
      const float* src = values.data() + static_cast<std::size_t>(o) * vd;
      for (int c = 0; c < vd; ++c) dst[c] += alpha * w * src[c];
    }
  }
}

}  // namespace spml
