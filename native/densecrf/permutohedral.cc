#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace spml {
namespace {

// Flat open-addressing hash table over short int16 lattice keys.
// Capacity is a power of two; linear probing; keys live contiguously in
// one array (no per-entry allocation, no pointer chasing).
class KeyTable {
 public:
  KeyTable(std::size_t expected, int d) : d_(d) {
    capacity_ = 16;
    while (capacity_ < expected * 2) capacity_ <<= 1;
    mask_ = capacity_ - 1;
    values_.assign(capacity_, -1);
    keys_.resize(capacity_ * d);
  }

  static std::size_t Hash(const int16_t* k, int d) {
    std::size_t h = 0xcbf29ce484222325ull;
    for (int i = 0; i < d; ++i) {
      h ^= static_cast<uint16_t>(k[i]);
      h *= 0x100000001b3ull;
    }
    return h;
  }

  // Returns the index of `key`, inserting it with index `size()` if new.
  int32_t FindOrInsert(const int16_t* key) {
    std::size_t slot = Hash(key, d_) & mask_;
    for (;;) {
      int32_t v = values_[slot];
      if (v < 0) {
        values_[slot] = size_;
        std::memcpy(keys_.data() + slot * d_, key,
                    static_cast<std::size_t>(d_) * sizeof(int16_t));
        slots_.push_back(slot);
        return size_++;
      }
      if (std::memcmp(keys_.data() + slot * d_, key,
                      static_cast<std::size_t>(d_) * sizeof(int16_t)) == 0)
        return v;
      slot = (slot + 1) & mask_;
    }
  }

  // Find-only; returns -1 when absent.
  int32_t Find(const int16_t* key) const {
    std::size_t slot = Hash(key, d_) & mask_;
    for (;;) {
      int32_t v = values_[slot];
      if (v < 0) return -1;
      if (std::memcmp(keys_.data() + slot * d_, key,
                      static_cast<std::size_t>(d_) * sizeof(int16_t)) == 0)
        return v;
      slot = (slot + 1) & mask_;
    }
  }

  int32_t size() const { return size_; }
  // Key of the entry inserted i-th (iteration in index order).
  const int16_t* KeyOf(int32_t i) const {
    return keys_.data() + slots_[i] * d_;
  }

 private:
  int d_;
  std::size_t capacity_ = 0, mask_ = 0;
  int32_t size_ = 0;
  std::vector<int32_t> values_;   // [capacity] -> entry index or -1
  std::vector<int16_t> keys_;     // [capacity, d]
  std::vector<std::size_t> slots_;  // entry index -> slot (for KeyOf)
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

  KeyTable table(static_cast<std::size_t>(n) * (d + 1), d);

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
      offsets_[static_cast<std::size_t>(p) * (d + 1) + r] =
          table.FindOrInsert(key.data());
      barycentric_[static_cast<std::size_t>(p) * (d + 1) + r] = bary[r];
    }
  }

  offset_count_ = static_cast<std::size_t>(table.size());

  // Precompute blur neighbors: for occupied lattice point k and axis j,
  // the neighbors are k +/- (1,...,1) with -(d) (resp. +(d)) in slot j.
  // Missing neighbors map to the zero-sentinel row M (= offset_count_)
  // so the blur inner loop is branch-free and vectorizes.
  const int32_t sentinel = static_cast<int32_t>(offset_count_);
  blur_plus_.assign((d + 1) * offset_count_, sentinel);
  blur_minus_.assign((d + 1) * offset_count_, sentinel);
  std::vector<int16_t> nkey(d);
  for (int32_t idx = 0; idx < table.size(); ++idx) {
    const int16_t* k = table.KeyOf(idx);
    for (int j = 0; j <= d; ++j) {
      // plus neighbor
      for (int i = 0; i < d; ++i)
        nkey[i] = static_cast<int16_t>(k[i] + 1 - (i == j ? d + 1 : 0));
      // note: axis j == d corresponds to no subtraction inside first d
      // coords (the implicit last coordinate absorbs it)
      int32_t np = table.Find(nkey.data());
      blur_plus_[static_cast<std::size_t>(j) * offset_count_ + idx] =
          np >= 0 ? np : sentinel;
      // minus neighbor
      for (int i = 0; i < d; ++i)
        nkey[i] = static_cast<int16_t>(k[i] - 1 + (i == j ? d + 1 : 0));
      int32_t nm = table.Find(nkey.data());
      blur_minus_[static_cast<std::size_t>(j) * offset_count_ + idx] =
          nm >= 0 ? nm : sentinel;
    }
  }
}

void Permutohedral::Compute(const float* in, float* out, int value_size,
                            const float* point_scale,
                            LatticeScratch* scratch, float out_weight,
                            bool accumulate) const {
  const int vd = value_size;
  const std::size_t M = offset_count_;
  // Row M is the zero sentinel absent blur neighbors point at; the blur
  // loop never writes past row M-1 so it stays zero in both buffers
  // across the ping-pong swaps.
  std::vector<float>& values_ = scratch->values;
  std::vector<float>& new_values_ = scratch->new_values;
  values_.assign((M + 1) * vd, 0.f);
  new_values_.resize((M + 1) * vd);
  std::fill(new_values_.end() - vd, new_values_.end(), 0.f);

  // Splat (serial: adjacent pixels share simplex vertices, so the
  // scattered rows are cache-warm; parallelizing would race on dst).
  {
    float* __restrict vals = values_.data();
    for (int p = 0; p < n_; ++p) {
      const float ps = point_scale ? point_scale[p] : 1.f;
      const float* __restrict src = in + static_cast<std::size_t>(p) * vd;
      const int32_t* offs = offsets_.data() +
                            static_cast<std::size_t>(p) * (d_ + 1);
      const float* bary = barycentric_.data() +
                          static_cast<std::size_t>(p) * (d_ + 1);
      for (int r = 0; r <= d_; ++r) {
        const float w = ps * bary[r];
        float* __restrict dst = vals + static_cast<std::size_t>(offs[r]) * vd;
#pragma omp simd
        for (int c = 0; c < vd; ++c) dst[c] += w * src[c];
      }
    }
  }

  // Blur along each lattice axis with [1/4, 1/2, 1/4] (branch-free via
  // the zero sentinel row).
  for (int j = 0; j <= d_; ++j) {
    const int32_t* __restrict plus =
        blur_plus_.data() + static_cast<std::size_t>(j) * M;
    const int32_t* __restrict minus =
        blur_minus_.data() + static_cast<std::size_t>(j) * M;
    const float* __restrict vals = values_.data();
    float* __restrict nvals = new_values_.data();
#pragma omp parallel for schedule(static)
    for (std::size_t m = 0; m < M; ++m) {
      const float* __restrict self = vals + m * vd;
      const float* __restrict vp =
          vals + static_cast<std::size_t>(plus[m]) * vd;
      const float* __restrict vm =
          vals + static_cast<std::size_t>(minus[m]) * vd;
      float* __restrict dst = nvals + m * vd;
#pragma omp simd
      for (int c = 0; c < vd; ++c)
        dst[c] = 0.5f * self[c] + 0.25f * (vp[c] + vm[c]);
    }
    values_.swap(new_values_);
  }

  // Slice (with the alpha correction for the blur gain), scaled by
  // out_weight; accumulate=true fuses the caller's "+= weight * result"
  // so no [N, vd] intermediate ever materializes.
  const float alpha = out_weight / (1.f + std::pow(2.f, -d_));
  const float* __restrict vals = values_.data();
#pragma omp parallel for schedule(static)
  for (int p = 0; p < n_; ++p) {
    const float ps = point_scale ? point_scale[p] : 1.f;
    float* __restrict dst = out + static_cast<std::size_t>(p) * vd;
    const int32_t* offs = offsets_.data() +
                          static_cast<std::size_t>(p) * (d_ + 1);
    const float* bary = barycentric_.data() +
                        static_cast<std::size_t>(p) * (d_ + 1);
    {
      const float w = alpha * ps * bary[0];
      const float* __restrict src =
          vals + static_cast<std::size_t>(offs[0]) * vd;
      if (accumulate) {
#pragma omp simd
        for (int c = 0; c < vd; ++c) dst[c] += w * src[c];
      } else {
#pragma omp simd
        for (int c = 0; c < vd; ++c) dst[c] = w * src[c];
      }
    }
    for (int r = 1; r <= d_; ++r) {
      const float w = alpha * ps * bary[r];
      const float* __restrict src =
          vals + static_cast<std::size_t>(offs[r]) * vd;
#pragma omp simd
      for (int c = 0; c < vd; ++c) dst[c] += w * src[c];
    }
  }
}

}  // namespace spml
