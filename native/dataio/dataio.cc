// Native train-item pipeline for the host data loader: fused
// JPEG/PNG decode -> mirror -> (PIL-exact) bilinear/nearest resize ->
// pad -> crop -> normalize, exposed through a C API for ctypes.
//
// Replaces the per-item Python/PIL path of spml_tpu/data/datasets.py::
// ListDataset.__getitem__ (itself the rebuild of the reference's
// spml/data/datasets/base_dataset.py:102-155 + transforms.py). All
// RANDOMNESS STAYS IN PYTHON: the caller draws mirror/scale/crop from
// the same np.random.Generator stream as the Python path and passes
// the resolved parameters, so for a given (seed, index) this produces
// the same item as the Python path (bitwise for decode/mirror/crop/
// normalize; resize within float tolerance — locked by
// tests/test_native_io.py).
//
// Decode semantics match PIL exactly:
// - JPEG via libjpeg default settings (JDCT_ISLOW, fancy upsampling) —
//   the same library PIL wraps, so pixels are bitwise identical.
// - PNG: 8-bit grayscale read raw; palette images go through the
//   palette and PIL's RGB->L weights (L = (19595 R + 38470 G + 7471 B
//   + 0x8000) >> 16), replicating Image.convert("L") like the
//   reference's _read_label (base_dataset.py:112).
// - Bilinear resize replicates Pillow's convolution resampler
//   (Resample.c): per-axis triangle filter with support scaled by
//   max(1, in/out), double-precision normalized weights, horizontal
//   pass then vertical, double accumulation into float32.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg defaults == PIL)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

bool DecodeJpeg(const char* path, std::vector<uint8_t>* rgb, int* h,
                int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<std::size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() +
                   static_cast<std::size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool JpegSize(const char* path, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// PNG label decode (8-bit gray or palette -> PIL convert("L"))
// ---------------------------------------------------------------------------

bool DecodePngL(const char* path, std::vector<uint8_t>* out, int* h,
                int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr,
                                     nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  // Palette stays palette: we map through it with PIL's L weights.
  png_set_interlace_handling(png);
  png_read_update_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  const int channels = png_get_channels(png, info);
  if (channels != 1 && channels != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  std::vector<uint8_t> raw(static_cast<std::size_t>(*h) * *w * channels);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = raw.data() + static_cast<std::size_t>(y) * *w * channels;
  png_read_image(png, rows.data());

  out->resize(static_cast<std::size_t>(*h) * *w);
  auto lum = [](int r, int g, int b) -> uint8_t {
    return static_cast<uint8_t>(
        (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16);
  };
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_PALETTE) {
    png_colorp pal = nullptr;
    int n_pal = 0;
    png_get_PLTE(png, info, &pal, &n_pal);
    uint8_t map[256];
    for (int i = 0; i < 256; ++i)
      map[i] = i < n_pal ? lum(pal[i].red, pal[i].green, pal[i].blue)
                         : 0;
    for (std::size_t i = 0; i < out->size(); ++i)
      (*out)[i] = map[raw[i]];
  } else if (channels == 3) {
    for (std::size_t i = 0; i < out->size(); ++i)
      (*out)[i] = lum(raw[i * 3], raw[i * 3 + 1], raw[i * 3 + 2]);
  } else {
    std::memcpy(out->data(), raw.data(), out->size());
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// PIL-exact bilinear resample (Pillow Resample.c, 32bpc float path)
// ---------------------------------------------------------------------------

struct Coeffs {
  int ksize;
  std::vector<int> bounds;     // [out, 2] (xmin, xmax-count)
  std::vector<double> kk;      // [out, ksize]
};

Coeffs PrecomputeCoeffs(int in_size, int out_size) {
  Coeffs c;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // bilinear support == 1
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.bounds.resize(static_cast<std::size_t>(out_size) * 2);
  c.kk.assign(static_cast<std::size_t>(out_size) * c.ksize, 0.0);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = c.kk.data() + static_cast<std::size_t>(xx) * c.ksize;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      const double arg = (x + xmin - center + 0.5) * ss;
      const double aa = arg < 0 ? -arg : arg;
      const double wgt = aa < 1.0 ? 1.0 - aa : 0.0;
      k[x] = wgt;
      ww += wgt;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    c.bounds[xx * 2] = xmin;
    c.bounds[xx * 2 + 1] = xmax;
  }
  return c;
}

// in: [h, w] single channel float; out: [new_h, new_w].
void ResampleBilinearF(const float* in, int h, int w, float* out,
                       int new_h, int new_w) {
  const Coeffs ch = PrecomputeCoeffs(w, new_w);
  std::vector<float> tmp(static_cast<std::size_t>(h) * new_w);
  // Horizontal pass.
  for (int y = 0; y < h; ++y) {
    const float* row = in + static_cast<std::size_t>(y) * w;
    float* trow = tmp.data() + static_cast<std::size_t>(y) * new_w;
    for (int xx = 0; xx < new_w; ++xx) {
      const int xmin = ch.bounds[xx * 2];
      const int xmax = ch.bounds[xx * 2 + 1];
      const double* k = ch.kk.data() +
                        static_cast<std::size_t>(xx) * ch.ksize;
      double ss = 0.0;
      for (int x = 0; x < xmax; ++x) ss += row[xmin + x] * k[x];
      trow[xx] = static_cast<float>(ss);
    }
  }
  // Vertical pass.
  const Coeffs cv = PrecomputeCoeffs(h, new_h);
  for (int yy = 0; yy < new_h; ++yy) {
    const int ymin = cv.bounds[yy * 2];
    const int ymax = cv.bounds[yy * 2 + 1];
    const double* k = cv.kk.data() +
                      static_cast<std::size_t>(yy) * cv.ksize;
    float* orow = out + static_cast<std::size_t>(yy) * new_w;
    for (int xx = 0; xx < new_w; ++xx) {
      double ss = 0.0;
      for (int y = 0; y < ymax; ++y)
        ss += tmp[static_cast<std::size_t>(ymin + y) * new_w + xx] *
              k[y];
      orow[xx] = static_cast<float>(ss);
    }
  }
}

}  // namespace

extern "C" {

// Header-only size probe (for Python to draw crop offsets from the
// same RNG stream without decoding). Returns 0 on success.
int dataio_image_size(const char* path, int* h, int* w) {
  return JpegSize(path, h, w) ? 0 : 1;
}

// Full train item. Returns 0 on success, nonzero on any decode error
// (caller falls back to the Python path).
//   mirror: 1 = horizontal flip (before resize, like transforms.mirror)
//   ratio:  random_resize scale factor (1.0 = skip; new = int(ratio*d))
//   crop_h/crop_w: output size; start_h/start_w: crop offsets into the
//     left_top-padded resized canvas (caller computed them from the
//     padded dims, datasets.py:121-123)
//   img_mean/img_std: [3] normalization in /255 image space; the pad
//     fill is img_mean, so padded pixels normalize to exactly 0 in
//     mean-subtracted space (same as the Python path)
//   out_image: [crop_h, crop_w, 3] float32 normalized
//   out_sem/out_inst: [crop_h, crop_w] int32 (inst_path may be NULL)
//   out_tags: uint8[256] presence histogram of the PRE-augmentation
//     semantic label values (datasets.py:108-110), may be NULL
int dataio_train_item(const char* image_path, const char* sem_path,
                      const char* inst_path, int mirror, double ratio,
                      int crop_h, int crop_w, int start_h, int start_w,
                      const float* img_mean, const float* img_std,
                      float* out_image, int32_t* out_sem,
                      int32_t* out_inst, uint8_t* out_tags) {
  std::vector<uint8_t> rgb, sem, inst;
  int h = 0, w = 0, lh = 0, lw = 0;
  if (!DecodeJpeg(image_path, &rgb, &h, &w)) return 1;
  if (!DecodePngL(sem_path, &sem, &lh, &lw)) return 2;
  if (lh != h || lw != w) return 3;
  if (inst_path) {
    if (!DecodePngL(inst_path, &inst, &lh, &lw)) return 4;
    if (lh != h || lw != w) return 5;
  }

  if (out_tags) {
    std::memset(out_tags, 0, 256);
    for (uint8_t v : sem) out_tags[v] = 1;
  }

  // uint8 -> float/255 channel planes (mirror by reversed x walk).
  // True division, not reciprocal multiply: numpy's u8/255.0 rounds
  // per-element and the Python-path parity test is bitwise here.
  std::vector<float> chan(static_cast<std::size_t>(h) * w * 3);
  for (int c = 0; c < 3; ++c) {
    float* dst = chan.data() + static_cast<std::size_t>(c) * h * w;
    for (int y = 0; y < h; ++y) {
      const uint8_t* src = rgb.data() + static_cast<std::size_t>(y) * w * 3;
      float* drow = dst + static_cast<std::size_t>(y) * w;
      if (mirror) {
        for (int x = 0; x < w; ++x)
          drow[x] = src[(w - 1 - x) * 3 + c] / 255.0f;
      } else {
        for (int x = 0; x < w; ++x) drow[x] = src[x * 3 + c] / 255.0f;
      }
    }
  }
  auto mirrored_label = [&](std::vector<uint8_t>& lab) {
    if (!mirror) return;
    for (int y = 0; y < h; ++y) {
      uint8_t* row = lab.data() + static_cast<std::size_t>(y) * w;
      std::reverse(row, row + w);
    }
  };
  mirrored_label(sem);
  if (inst_path) mirrored_label(inst);

  // Resize (transforms.resize: new = int(ratio * d)).
  int new_h = h, new_w = w;
  std::vector<float> rchan;
  const float* img_planes = chan.data();
  if (ratio != 1.0) {
    new_h = static_cast<int>(ratio * h);
    new_w = static_cast<int>(ratio * w);
    if (new_h <= 0 || new_w <= 0) return 6;
    rchan.resize(static_cast<std::size_t>(new_h) * new_w * 3);
    for (int c = 0; c < 3; ++c)
      ResampleBilinearF(
          chan.data() + static_cast<std::size_t>(c) * h * w, h, w,
          rchan.data() + static_cast<std::size_t>(c) * new_h * new_w,
          new_h, new_w);
    img_planes = rchan.data();
  }
  // Nearest label index maps (transforms._resize_nearest).
  std::vector<int> ys(new_h), xs(new_w);
  {
    const double sy = static_cast<double>(h) / new_h;
    const double sx = static_cast<double>(w) / new_w;
    for (int y = 0; y < new_h; ++y)
      ys[y] = static_cast<int>(std::floor(y * sy));
    for (int x = 0; x < new_w; ++x)
      xs[x] = static_cast<int>(std::floor(x * sx));
  }

  // Pad (left_top, fill img_mean / 255) + crop + normalize, fused.
  for (int c = 0; c < 3; ++c) {
    const float* plane = img_planes + static_cast<std::size_t>(c) *
                                          new_h * new_w;
    const float mean = img_mean[c];
    const float stdv = img_std[c];
    for (int y = 0; y < crop_h; ++y) {
      const int sy = start_h + y;
      float* orow = out_image + (static_cast<std::size_t>(y) * crop_w) * 3;
      if (sy >= new_h) {
        for (int x = 0; x < crop_w; ++x) orow[x * 3 + c] = 0.0f;
        continue;
      }
      const float* prow = plane + static_cast<std::size_t>(sy) * new_w;
      for (int x = 0; x < crop_w; ++x) {
        const int sx = start_w + x;
        const float v = sx < new_w ? prow[sx] : mean;
        orow[x * 3 + c] = (v - mean) / stdv;
      }
    }
  }
  auto emit_label = [&](const std::vector<uint8_t>& lab, int32_t* out) {
    for (int y = 0; y < crop_h; ++y) {
      const int sy = start_h + y;
      int32_t* orow = out + static_cast<std::size_t>(y) * crop_w;
      if (sy >= new_h) {
        for (int x = 0; x < crop_w; ++x) orow[x] = 255;
        continue;
      }
      const uint8_t* srow = lab.data() +
                            static_cast<std::size_t>(ys[sy]) * w;
      for (int x = 0; x < crop_w; ++x) {
        const int sx = start_w + x;
        orow[x] = sx < new_w ? srow[xs[sx]] : 255;
      }
    }
  };
  emit_label(sem, out_sem);
  if (inst_path && out_inst) emit_label(inst, out_inst);
  return 0;
}

}  // extern "C"
