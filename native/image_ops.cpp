// Native host-side image ops for the TPU input pipeline.
//
// The steady-state eval path decodes ~4-5k JPEGs/s to feed one chip
// (SURVEY.md §6); Python/PIL resize is the dominant host cost after decode.
// This implements the same antialiased separable bilinear (triangle-filter)
// resampling PIL uses for Image.BILINEAR, in C++ with no Python object
// overhead, callable from ctypes with the GIL released (so the pipeline's
// thread pool gets true parallelism).
//
// Exported C ABI:
//   resize_bilinear_u8(src, h, w, c, dst, oh, ow)
//   resize_shortest_edge_center_crop_u8(src, h, w, c, dst, out)
//   decode_jpeg_resize_crop_u8(data, len, dst, out, scale_mode)  [-DMMCM_HAVE_JPEG]
//   has_jpeg()
//
// Algorithm (PIL-compatible): for each output position, the triangle filter
// support scales with the downscale factor; coefficients are computed in
// float, normalized, applied separably (horizontal then vertical), with
// round-half-away-from-zero and clamp to [0, 255] after each pass.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Coeffs {
  std::vector<int> bounds;    // first source index per output index
  std::vector<int> counts;    // number of taps per output index
  std::vector<float> weights; // taps, ksize per output index
  int ksize = 0;
};

// Triangle (bilinear) filter, support 1.0
inline float triangle(float x) {
  if (x < 0.0f) x = -x;
  return x < 1.0f ? 1.0f - x : 0.0f;
}

Coeffs precompute(int in_size, int out_size) {
  Coeffs c;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.bounds.resize(out_size);
  c.counts.resize(out_size);
  c.weights.assign(static_cast<size_t>(out_size) * c.ksize, 0.0f);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    float* w = &c.weights[static_cast<size_t>(xx) * c.ksize];
    double total = 0.0;
    const int n = xmax - xmin;
    for (int i = 0; i < n; ++i) {
      const double win =
          triangle(static_cast<float>((xmin + i - center + 0.5) / filterscale));
      w[i] = static_cast<float>(win);
      total += win;
    }
    if (total != 0.0) {
      for (int i = 0; i < n; ++i) w[i] = static_cast<float>(w[i] / total);
    }
    c.bounds[xx] = xmin;
    c.counts[xx] = n;
  }
  return c;
}

inline uint8_t clip8(float v) {
  const float r = v < 0.0f ? v - 0.5f : v + 0.5f;  // round half away from zero
  if (r <= 0.0f) return 0;
  if (r >= 255.0f) return 255;
  return static_cast<uint8_t>(r);
}

}  // namespace

extern "C" {

// Resize HWC uint8 -> HWC uint8 with PIL-style antialiased bilinear.
void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
  const Coeffs ch = precompute(w, ow);
  const Coeffs cv = precompute(h, oh);

  // horizontal pass: [h, w, c] -> [h, ow, c] (float intermediate)
  std::vector<float> tmp(static_cast<size_t>(h) * ow * c);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * c;
    float* orow = &tmp[static_cast<size_t>(y) * ow * c];
    if (c == 3) {  // RGB fast path: three accumulators, contiguous taps
      for (int x = 0; x < ow; ++x) {
        const float* wts = &ch.weights[static_cast<size_t>(x) * ch.ksize];
        const int n = ch.counts[x];
        const uint8_t* s = row + ch.bounds[x] * 3;
        float a0 = 0.0f, a1 = 0.0f, a2 = 0.0f;
        for (int i = 0; i < n; ++i) {
          const float wv = wts[i];
          a0 += s[0] * wv;
          a1 += s[1] * wv;
          a2 += s[2] * wv;
          s += 3;
        }
        orow[x * 3] = a0;
        orow[x * 3 + 1] = a1;
        orow[x * 3 + 2] = a2;
      }
    } else {
      for (int x = 0; x < ow; ++x) {
        const float* wts = &ch.weights[static_cast<size_t>(x) * ch.ksize];
        const int x0 = ch.bounds[x];
        const int n = ch.counts[x];
        for (int k = 0; k < c; ++k) {
          float acc = 0.0f;
          for (int i = 0; i < n; ++i) acc += row[(x0 + i) * c + k] * wts[i];
          orow[x * c + k] = acc;
        }
      }
    }
  }

  // vertical pass: [h, ow, c] -> [oh, ow, c], as row-SAXPY over contiguous
  // rows so the compiler vectorizes the inner loop
  const int row_elems = ow * c;
  std::vector<float> acc(row_elems);
  for (int y = 0; y < oh; ++y) {
    const float* wts = &cv.weights[static_cast<size_t>(y) * cv.ksize];
    const int y0 = cv.bounds[y];
    const int n = cv.counts[y];
    std::memset(acc.data(), 0, sizeof(float) * row_elems);
    for (int i = 0; i < n; ++i) {
      const float wv = wts[i];
      const float* srow = &tmp[static_cast<size_t>(y0 + i) * row_elems];
      for (int e = 0; e < row_elems; ++e) acc[e] += srow[e] * wv;
    }
    uint8_t* orow = dst + static_cast<size_t>(y) * row_elems;
    for (int e = 0; e < row_elems; ++e) orow[e] = clip8(acc[e]);
  }
}

// Shortest-edge resize to `out` then center crop to (out, out), zero-padding
// if the resized image is smaller (torchvision CenterCrop semantics).
void resize_shortest_edge_center_crop_u8(const uint8_t* src, int h, int w,
                                         int c, uint8_t* dst, int out) {
  int nw, nh;
  if (w < h) {
    nw = out;
    nh = static_cast<int>(static_cast<int64_t>(out) * h / w);
  } else {
    nh = out;
    nw = static_cast<int>(static_cast<int64_t>(out) * w / h);
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * c);
  resize_bilinear_u8(src, h, w, c, resized.data(), nh, nw);

  std::memset(dst, 0, static_cast<size_t>(out) * out * c);
  const int top = (nh - out) / 2;
  const int left = (nw - out) / 2;
  for (int y = 0; y < out; ++y) {
    const int sy = top + y;
    if (sy < 0 || sy >= nh) continue;
    const int sx0 = std::max(left, 0);
    const int dx0 = sx0 - left;
    const int span = std::min(nw, left + out) - sx0;
    if (span <= 0) continue;
    std::memcpy(dst + (static_cast<size_t>(y) * out + dx0) * c,
                resized.data() + (static_cast<size_t>(sy) * nw + sx0) * c,
                static_cast<size_t>(span) * c);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG decode fused with resize+crop (libjpeg-turbo).
//
// The reference's DataLoader workers decode every JPEG at FULL resolution
// with PIL, then downscale to 224 (src/data/dataset.py:106-111). For a
// 224-square target that wastes most of the IDCT work: libjpeg can apply an
// M/8 scale factor *inside* the inverse DCT, so a 1000px image is decoded
// directly to ~250px at a fraction of the cost. `scale_mode=1` picks the
// smallest M/8 whose shortest output edge still covers the crop; the
// antialiased resize above finishes the job. `scale_mode=0` decodes at full
// resolution (bit-identical to PIL, which wraps the same libjpeg).
// ---------------------------------------------------------------------------

#ifdef MMCM_HAVE_JPEG
#include <csetjmp>
#include <cstdio>  // jpeglib.h needs FILE

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(e->jb, 1);
}

}  // namespace

extern "C" {

int has_jpeg() { return 1; }

// Decode JPEG bytes -> shortest-edge resize -> center crop to (out, out) RGB.
// Returns 0 on success; any decode failure (corrupt data, unsupported
// colorspace) returns nonzero and the caller degrades per the presence-flag
// contract. The pixel buffer lives outside the setjmp region so longjmp
// cannot leak it.
int decode_jpeg_resize_crop_u8(const uint8_t* data, int len, uint8_t* dst,
                               int out, int scale_mode) {
  std::vector<uint8_t> pixels;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;  // gray sources are expanded by jdcolor
  if (scale_mode) {
    // smallest M/8 with ceil(shortest*M/8) >= out (turbo supports any M/8;
    // a classic libjpeg would round to a supported power of two and
    // jpeg_calc_output_dimensions below reflects whatever it actually does)
    const int short_edge = static_cast<int>(
        std::min(cinfo.image_width, cinfo.image_height));
    int m = 8;
    while (m > 1 && (short_edge * (m - 1) + 7) / 8 >= out) --m;
    cinfo.scale_num = static_cast<unsigned>(m);
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int c = cinfo.output_components;
  if (c != 3 || w <= 0 || h <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  pixels.resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  resize_shortest_edge_center_crop_u8(pixels.data(), h, w, 3, dst, out);
  return 0;
}

}  // extern "C"

#else  // !MMCM_HAVE_JPEG

extern "C" {
int has_jpeg() { return 0; }
}

#endif  // MMCM_HAVE_JPEG
