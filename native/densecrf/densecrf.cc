// Dense CRF mean-field inference with Gaussian + bilateral pairwise
// potentials (Krahenbuhl & Koltun, NIPS 2011), exposed through a C API
// for ctypes.
//
// Replaces the pydensecrf dependency of the reference implementation
// (twke18/SPML spml/models/crf.py:14-41): unary = -log(prob),
// addPairwiseGaussian(pos_xy_std, pos_w) +
// addPairwiseBilateral(bi_xy_std, bi_rgb_std, bi_w), `iter_max`
// mean-field iterations, symmetric kernel normalization.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <memory>
#include <mutex>
#include <utility>
#include <vector>

#include "permutohedral.h"

namespace spml {

// A built pairwise kernel: lattice + symmetric normalization. Shared
// (read-only) between CRF models when cached — the Gaussian kernel's
// features are pixel positions only, so for a fixed (W, H, sx, sy) the
// lattice is identical across images and worth reusing (its
// construction is ~15% of a 512x512x21 CRF).
struct BuiltKernel {
  Permutohedral lattice;
  std::vector<float> inv_sqrt_norm;  // [N] symmetric normalization
};

struct Kernel {
  std::shared_ptr<const BuiltKernel> built;
  float weight = 1.f;
  // Per-model ping-pong scratch so concurrent models can share `built`.
  mutable LatticeScratch scratch;
};

struct CrfModel {
  int w = 0, h = 0, c = 0;
  std::vector<float> unary;  // [N, C] row-major (energy, i.e. -log p)
  std::vector<Kernel> kernels;

  int n() const { return w * h; }
};

namespace {

std::shared_ptr<BuiltKernel> BuildKernel(const float* feats, int n, int d) {
  auto k = std::make_shared<BuiltKernel>();
  k->lattice.Init(feats, n, d);
  LatticeScratch scratch;
  std::vector<float> ones(n, 1.f);
  std::vector<float> norm(n, 0.f);
  k->lattice.Compute(ones.data(), norm.data(), 1, nullptr, &scratch);
  k->inv_sqrt_norm.resize(n);
  for (int i = 0; i < n; ++i)
    k->inv_sqrt_norm[i] = 1.f / std::sqrt(std::max(norm[i], 1e-20f));
  return k;
}

// LRU cache of Gaussian (position-only) kernels keyed by (w, h, sx, sy).
// Entries are shared_ptr-held so eviction never invalidates a model
// still filtering with one; per-model scratch keeps shared use
// race-free. Typical segmentation runs see a handful of image sizes
// (VOC12 is dominated by 500x375 / 375x500), so hits are common.
struct GaussKey {
  int w, h;
  float sx, sy;
  bool operator==(const GaussKey& o) const {
    return w == o.w && h == o.h && sx == o.sx && sy == o.sy;
  }
};

std::shared_ptr<const BuiltKernel> GaussianKernelCached(
    int w, int h, float sx, float sy) {
  static std::mutex mu;
  static std::vector<std::pair<GaussKey, std::shared_ptr<const BuiltKernel>>>
      cache;  // most-recently-used at the back; capacity 8
  const GaussKey key{w, h, sx, sy};
  {
    std::lock_guard<std::mutex> lock(mu);
    for (std::size_t i = 0; i < cache.size(); ++i)
      if (cache[i].first == key) {
        auto hit = cache[i].second;
        cache.erase(cache.begin() + i);
        cache.emplace_back(key, hit);
        return hit;
      }
  }
  const int n = w * h;
  std::vector<float> feats(static_cast<std::size_t>(n) * 2);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const std::size_t i = static_cast<std::size_t>(y) * w + x;
      feats[i * 2 + 0] = x / sx;
      feats[i * 2 + 1] = y / sy;
    }
  std::shared_ptr<const BuiltKernel> built = BuildKernel(feats.data(), n, 2);
  {
    std::lock_guard<std::mutex> lock(mu);
    if (cache.size() >= 8) cache.erase(cache.begin());
    cache.emplace_back(key, built);
  }
  return built;
}

// Branchless Cephes-style expf (|rel err| < 3e-7 on [-87, 0]); written
// with bit-cast scaling so gcc auto-vectorizes it under `omp simd`.
// Arguments here are always <= 0 (max-subtracted), so only the
// underflow side needs clamping. The softmax renormalization below
// absorbs the tiny relative error, and the CRF output is consumed
// through argmax / loosely-tolerant marginals.
inline float FastExp(float x) {
  x = std::max(x, -87.0f);
  const float z = x * 1.44269504089f;  // x / ln 2
  const float n = std::floor(z + 0.5f);
  // Extended-precision argument reduction (Cephes split of ln 2).
  x = x - n * 0.693359375f - n * -2.12194440e-4f;
  float p = 1.9875691500e-4f;
  p = p * x + 1.3981999507e-3f;
  p = p * x + 8.3334519073e-3f;
  p = p * x + 4.1665795894e-2f;
  p = p * x + 1.6666665459e-1f;
  p = p * x + 5.0000001201e-1f;
  const float y = p * x * x + x + 1.0f;
  const int32_t e = static_cast<int32_t>(n) + 127;
  uint32_t bits = static_cast<uint32_t>(e) << 23;
  float scale;
  std::memcpy(&scale, &bits, sizeof(scale));
  return y * scale;
}

// Branchless Cephes-style logf for POSITIVE NORMAL floats (the unary
// path clamps probabilities to [1e-8, +inf) first, so no zero/denormal/
// negative handling is needed). |rel err| < ~3e-7; auto-vectorizes
// under `omp simd` (std::log does not, and the unary transform runs
// over n*c = 5.5M elements at 512x512x21).
inline float FastLog(float x) {
  uint32_t bits;
  std::memcpy(&bits, &x, sizeof(bits));
  const int32_t e = static_cast<int32_t>(bits >> 23) - 126;
  bits = (bits & 0x007fffffu) | 0x3f000000u;  // mantissa in [0.5, 1)
  float m;
  std::memcpy(&m, &bits, sizeof(m));
  float exp_f = static_cast<float>(e);
  // Pull m toward 1 for a tighter polynomial range (Cephes SQRTHF);
  // if-converted form so the whole function stays branch-free.
  const float small = m < 0.707106781186547524f ? 1.f : 0.f;
  exp_f -= small;
  m = m + small * m - 1.0f;
  float p = 7.0376836292e-2f;
  p = p * m + -1.1514610310e-1f;
  p = p * m + 1.1676998740e-1f;
  p = p * m + -1.2420140846e-1f;
  p = p * m + 1.4249322787e-1f;
  p = p * m + -1.6668057665e-1f;
  p = p * m + 2.0000714765e-1f;
  p = p * m + -2.4999993993e-1f;
  p = p * m + 3.3333331174e-1f;
  float r = p * m * m * m;
  r += -2.12194440e-4f * exp_f;
  r -= 0.5f * m * m;
  r = m + r;
  r += 0.693359375f * exp_f;
  return r;
}

// Softmax over each length-c row of `in` into `q`.
//
// When the inputs are known to be bounded (|x| <= bound << 87), the
// per-row max-subtraction cancels mathematically in the normalization
// and is skipped: the exp runs as ONE flat pass over all n*c elements,
// which vectorizes far better than per-row length-21 loops (43 ->
// ~12 ms for 512*512*21 on one AVX-512 core). Callers pass `bound` =
// a cheap upper bound on |in|; anything >= 80 falls back to the safe
// max-subtracted form.
void ExpAndNormalize(const float* in, float* q, int n, int c,
                     float bound = 1e30f) {
  if (bound < 80.f) {
    const std::size_t total = static_cast<std::size_t>(n) * c;
#pragma omp parallel for simd schedule(static)
    for (std::size_t j = 0; j < total; ++j) q[j] = FastExp(in[j]);
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
      float* __restrict dst = q + static_cast<std::size_t>(i) * c;
      float sum = 0.f;
#pragma omp simd reduction(+ : sum)
      for (int j = 0; j < c; ++j) sum += dst[j];
      const float inv = 1.f / sum;
#pragma omp simd
      for (int j = 0; j < c; ++j) dst[j] *= inv;
    }
    return;
  }
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const float* __restrict row = in + static_cast<std::size_t>(i) * c;
    float mx = row[0];
    for (int j = 1; j < c; ++j) mx = std::max(mx, row[j]);
    float sum = 0.f;
    float* __restrict dst = q + static_cast<std::size_t>(i) * c;
#pragma omp simd reduction(+ : sum)
    for (int j = 0; j < c; ++j) {
      const float e = FastExp(row[j] - mx);
      dst[j] = e;
      sum += e;
    }
    const float inv = 1.f / sum;
#pragma omp simd
    for (int j = 0; j < c; ++j) dst[j] *= inv;
  }
}

}  // namespace
}  // namespace spml

extern "C" {

void* crf2d_new(int w, int h, int c) {
  auto* m = new spml::CrfModel();
  m->w = w;
  m->h = h;
  m->c = c;
  m->unary.assign(static_cast<std::size_t>(w) * h * c, 0.f);
  return m;
}

void crf2d_free(void* handle) {
  delete static_cast<spml::CrfModel*>(handle);
}

// probs: [C, H, W] class-major (the reference's probmap layout).
// Two passes: a flat, fully vectorized -log over all n*c elements, then
// a cache-blocked [C, N] -> [N, C] transpose (block column strip fits
// L1/L2, so the strided writes stay cache-resident).
void crf2d_set_unary_from_probs(void* handle, const float* probs) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  const int n = m->n();
  const int c = m->c;
  float* __restrict unary = m->unary.data();
  constexpr int kBlock = 512;
#pragma omp parallel for schedule(static)
  for (int i0 = 0; i0 < n; i0 += kBlock) {
    const int len = std::min(i0 + kBlock, n) - i0;
    alignas(64) float buf[kBlock];
    for (int j = 0; j < c; ++j) {
      const float* __restrict src =
          probs + static_cast<std::size_t>(j) * n + i0;
      for (int t = 0; t < len; ++t)
        buf[t] = -spml::FastLog(std::max(src[t], 1e-8f));
      float* __restrict dst = unary + static_cast<std::size_t>(i0) * c + j;
      for (int t = 0; t < len; ++t)
        dst[static_cast<std::size_t>(t) * c] = buf[t];
    }
  }
}

void crf2d_add_pairwise_gaussian(void* handle, float sx, float sy,
                                 float weight) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  m->kernels.emplace_back();
  spml::Kernel& k = m->kernels.back();
  k.weight = weight;
  k.built = spml::GaussianKernelCached(m->w, m->h, sx, sy);
}

// rgb: [H, W, 3] uint8.
void crf2d_add_pairwise_bilateral(void* handle, float sx, float sy,
                                  float sr, float sg, float sb,
                                  const unsigned char* rgb, float weight) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  const int n = m->n();
  std::vector<float> feats(static_cast<std::size_t>(n) * 5);
  for (int y = 0; y < m->h; ++y)
    for (int x = 0; x < m->w; ++x) {
      const std::size_t i = static_cast<std::size_t>(y) * m->w + x;
      feats[i * 5 + 0] = x / sx;
      feats[i * 5 + 1] = y / sy;
      feats[i * 5 + 2] = rgb[i * 3 + 0] / sr;
      feats[i * 5 + 3] = rgb[i * 3 + 1] / sg;
      feats[i * 5 + 4] = rgb[i * 3 + 2] / sb;
    }
  m->kernels.emplace_back();
  spml::Kernel& k = m->kernels.back();
  k.weight = weight;
  k.built = spml::BuildKernel(feats.data(), n, 5);
}

// out: [C, H, W] refined marginals.
void crf2d_inference(void* handle, int n_iter, float* out) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  const int n = m->n();
  const int c = m->c;
  std::vector<float> q(static_cast<std::size_t>(n) * c);
  std::vector<float> neg_u(static_cast<std::size_t>(n) * c);
  std::vector<float> tmp(static_cast<std::size_t>(n) * c);

  // |field| bound for the flat-softmax fast path: unary is
  // -log(clamp(p, 1e-8)) <= 18.5, each kernel contributes at most
  // ~|weight| (normalized filter of q in [0,1]; factor 2 covers the
  // lattice-approximation slop). Exceeds 80 only for absurd weights,
  // which fall back to the max-subtracted form.
  float bound = 18.5f;
  for (const spml::Kernel& k : m->kernels) bound += 2.f * std::abs(k.weight);

  for (std::size_t i = 0; i < neg_u.size(); ++i) neg_u[i] = -m->unary[i];
  spml::ExpAndNormalize(neg_u.data(), q.data(), n, c, bound);

  for (int it = 0; it < n_iter; ++it) {
    std::memcpy(tmp.data(), neg_u.data(), neg_u.size() * sizeof(float));
    // Each kernel's weighted, symmetric-normalized filter result is
    // accumulated into `tmp` directly by the fused slice.
    for (const spml::Kernel& k : m->kernels)
      k.built->lattice.Compute(q.data(), tmp.data(), c,
                               k.built->inv_sqrt_norm.data(), &k.scratch,
                               k.weight, /*accumulate=*/true);
    spml::ExpAndNormalize(tmp.data(), q.data(), n, c, bound);
  }

  // [N, C] -> [C, H, W]
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < c; ++j)
      out[static_cast<std::size_t>(j) * n + i] =
          q[static_cast<std::size_t>(i) * c + j];
}

}  // extern "C"
