// Permutohedral lattice for high-dimensional Gaussian filtering.
//
// Implements the splat/blur/slice algorithm of Adams, Baek & Davis,
// "Fast High-Dimensional Filtering Using the Permutohedral Lattice"
// (Eurographics 2010), as used by dense-CRF mean-field inference
// (Krahenbuhl & Koltun, NIPS 2011). Written from the published
// algorithm; replaces the reference implementation's pydensecrf
// dependency (twke18/SPML requirements.txt:9, spml/models/crf.py).
//
// Lattice-point lookup uses a flat open-addressing hash table (power-of
// -two capacity, linear probing, keys stored contiguously): the
// previous std::unordered_map<std::vector<int16_t>, ...> paid a heap
// allocation and pointer chase per probe, which made lattice
// construction as expensive as ten mean-field iterations (6.3 s of a
// 13 s 512x512x21 CRF; ~0.5 s with the flat table).
//
// Compute() is const and takes caller-owned scratch, so one lattice can
// be shared (read-only) by concurrent filter calls — the Gaussian
// pairwise lattice depends only on (W, H, sx, sy) and is LRU-cached
// across images in densecrf.cc while the CRF worker pool runs tails in
// parallel.

#pragma once

#include <cstdint>
#include <vector>

namespace spml {

// Ping-pong lattice-value buffers reused across Compute calls. Owned by
// the caller (one per concurrent filter stream), sized inside Compute.
struct LatticeScratch {
  std::vector<float> values, new_values;
};

class Permutohedral {
 public:
  // features: [N, d] row-major (already divided by kernel stddevs).
  void Init(const float* features, int n, int d);

  // Filters `value_size` channels: in/out are [N, value_size] row-major.
  // Gaussian-weighted sum over all points (self included), up to a
  // constant factor that callers cancel via normalization.
  // point_scale (optional, [N]): multiplies point p's contribution on
  // the way in (splat) AND its result on the way out (slice) — the
  // symmetric normalization s_i * K(f_i, f_j) * s_j folded into the
  // barycentric weights instead of two extra full-array passes.
  // The sliced result is scaled by `out_weight` and either stored to or
  // accumulated into `out` (accumulate=true fuses the mean-field
  // "+= weight * filtered" update into the slice, saving a full [N, C]
  // intermediate round-trip per kernel per iteration).
  void Compute(const float* in, float* out, int value_size,
               const float* point_scale, LatticeScratch* scratch,
               float out_weight = 1.f, bool accumulate = false) const;

  int num_lattice_points() const { return static_cast<int>(offset_count_); }

 private:
  int n_ = 0;
  int d_ = 0;
  // Per (point, simplex vertex): lattice point index and barycentric wt.
  std::vector<int32_t> offsets_;     // [n, d+1]
  std::vector<float> barycentric_;   // [n, d+1]
  // Blur neighbor indices per axis: [d+1, M] plus/minus.
  std::vector<int32_t> blur_plus_;
  std::vector<int32_t> blur_minus_;
  std::size_t offset_count_ = 0;     // M = number of occupied lattice pts
};

}  // namespace spml
