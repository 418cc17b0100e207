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
#include <vector>

#include "permutohedral.h"

namespace spml {

struct Kernel {
  Permutohedral lattice;
  float weight = 1.f;
  std::vector<float> inv_sqrt_norm;  // [N] symmetric normalization
};

struct CrfModel {
  int w = 0, h = 0, c = 0;
  std::vector<float> unary;  // [N, C] row-major (energy, i.e. -log p)
  std::vector<Kernel> kernels;

  int n() const { return w * h; }
};

namespace {

void BuildNorm(Kernel* k, int n) {
  std::vector<float> ones(n, 1.f);
  std::vector<float> norm(n, 0.f);
  k->lattice.Compute(ones.data(), norm.data(), 1);
  k->inv_sqrt_norm.resize(n);
  for (int i = 0; i < n; ++i)
    k->inv_sqrt_norm[i] = 1.f / std::sqrt(std::max(norm[i], 1e-20f));
}

void FilterSymmetric(const Kernel& k, const float* in, float* out, int n,
                     int c) {
  // symmetric normalization s_i K s_j folded into splat/slice weights
  k.lattice.Compute(in, out, c, k.inv_sqrt_norm.data());
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
void crf2d_set_unary_from_probs(void* handle, const float* probs) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  const int n = m->n();
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < m->c; ++j) {
      const float p =
          std::max(probs[static_cast<std::size_t>(j) * n + i], 1e-8f);
      m->unary[static_cast<std::size_t>(i) * m->c + j] = -std::log(p);
    }
}

void crf2d_add_pairwise_gaussian(void* handle, float sx, float sy,
                                 float weight) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  const int n = m->n();
  std::vector<float> feats(static_cast<std::size_t>(n) * 2);
  for (int y = 0; y < m->h; ++y)
    for (int x = 0; x < m->w; ++x) {
      const std::size_t i = static_cast<std::size_t>(y) * m->w + x;
      feats[i * 2 + 0] = x / sx;
      feats[i * 2 + 1] = y / sy;
    }
  m->kernels.emplace_back();
  spml::Kernel& k = m->kernels.back();
  k.weight = weight;
  k.lattice.Init(feats.data(), n, 2);
  spml::BuildNorm(&k, n);
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
  k.lattice.Init(feats.data(), n, 5);
  spml::BuildNorm(&k, n);
}

// out: [C, H, W] refined marginals.
void crf2d_inference(void* handle, int n_iter, float* out) {
  auto* m = static_cast<spml::CrfModel*>(handle);
  const int n = m->n();
  const int c = m->c;
  std::vector<float> q(static_cast<std::size_t>(n) * c);
  std::vector<float> neg_u(static_cast<std::size_t>(n) * c);
  std::vector<float> tmp(static_cast<std::size_t>(n) * c);
  std::vector<float> filtered(static_cast<std::size_t>(n) * c);

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
    for (const spml::Kernel& k : m->kernels) {
      spml::FilterSymmetric(k, q.data(), filtered.data(), n, c);
      const float wgt = k.weight;
      float* __restrict t = tmp.data();
      const float* __restrict f = filtered.data();
      const std::size_t sz = tmp.size();
#pragma omp parallel for simd schedule(static)
      for (std::size_t i = 0; i < sz; ++i) t[i] += wgt * f[i];
    }
    spml::ExpAndNormalize(tmp.data(), q.data(), n, c, bound);
  }

  // [N, C] -> [C, H, W]
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < c; ++j)
      out[static_cast<std::size_t>(j) * n + i] =
          q[static_cast<std::size_t>(i) * c + j];
}

}  // extern "C"
