// sd_tpu native image loader — C++ host-side decode + resample pipeline.
//
// Replaces the Python/PIL decode path of the reference's data loaders
// (reference: DDPM/ImageDataset.py:9-47, Dataset/lsun.py:8-36,
// Diffusion/data/base.py:8-95) with a native pipeline: JPEG (libjpeg) /
// PNG (libpng) decode -> optional center crop -> PIL-compatible separable
// triangle/Catmull-Rom resampling -> float32 HWC in [-1, 1].
//
// TPU rationale: the TPU input pipeline is host-CPU-bound — every image a
// chip consumes is decoded and resampled on the host, and PIL holds the GIL
// for most of that work. This module is GIL-free C++ with a std::thread
// batch API so the loader can saturate host cores while JAX dispatches.
//
// Exposed via a plain C ABI (ctypes — no pybind11 in this environment):
//   sdtpu_decode_resize_file(path, out_size, center_crop, method, out)
//   sdtpu_load_batch(paths, n, out_size, center_crop, method, n_threads,
//                    out, status)
// Return codes: 0 ok, 1 I/O error, 2 decode error, 3 unsupported format.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int kOk = 0;
constexpr int kIoError = 1;
constexpr int kDecodeError = 2;
constexpr int kUnsupported = 3;

// ---------------------------------------------------------------------------
// File slurp
// ---------------------------------------------------------------------------

int read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kIoError;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return kIoError;
  }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n) ? kOk : kIoError;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, setjmp error trampoline)
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decodes to RGB u8. Returns kOk and fills rgb/w/h on success.
int decode_jpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return kDecodeError;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return kDecodeError;
  }
  // Gray and YCbCr convert to RGB inside libjpeg; CMYK/YCCK would need an
  // inversion pass we don't carry — those fall back to the Python loader.
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return kUnsupported;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  int stride = *w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return kOk;
}

// ---------------------------------------------------------------------------
// PNG decode (libpng simplified API; alpha dropped, gray expanded)
// ---------------------------------------------------------------------------

int decode_png(const uint8_t* data, size_t size, std::vector<uint8_t>* rgb,
               int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, size))
    return kDecodeError;
  // Decode RGBA and strip the channel ourselves: asking libpng for RGB
  // would *composite* alpha onto a background, while the PIL path
  // (convert("RGB")) simply drops it.
  image.format = PNG_FORMAT_RGBA;
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  std::vector<uint8_t> rgba(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&image);
    return kDecodeError;
  }
  size_t npix = static_cast<size_t>(*w) * *h;
  rgb->resize(npix * 3);
  for (size_t i = 0; i < npix; ++i) {
    (*rgb)[i * 3 + 0] = rgba[i * 4 + 0];
    (*rgb)[i * 3 + 1] = rgba[i * 4 + 1];
    (*rgb)[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return kOk;
}

// ---------------------------------------------------------------------------
// PIL-compatible separable resampling.
//
// PIL's ImagingResample: for output pixel i, center = (i + 0.5) * scale,
// filter support is stretched by max(scale, 1) so downscaling averages over
// the full source footprint (anti-aliasing), weights are normalized over the
// in-bounds window. We reproduce that in float32.
// ---------------------------------------------------------------------------

double filter_bilinear(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Keys cubic, a = -0.5 (PIL BICUBIC).
double filter_bicubic(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct ResampleSpec {
  // For each output index: first source index and normalized weights.
  std::vector<int> first;
  std::vector<int> count;
  std::vector<float> weights;  // ragged, max_count stride
  int max_count;
};

ResampleSpec build_spec(int in_size, int out_size, int method) {
  double (*filter)(double) = method == 1 ? filter_bicubic : filter_bilinear;
  double support = method == 1 ? 2.0 : 1.0;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double radius = support * filterscale;
  int max_count = static_cast<int>(std::ceil(radius * 2)) + 2;

  ResampleSpec spec;
  spec.first.resize(out_size);
  spec.count.resize(out_size);
  spec.weights.assign(static_cast<size_t>(out_size) * max_count, 0.f);
  spec.max_count = max_count;

  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(std::floor(center - radius + 0.5)));
    int hi = std::min(in_size, static_cast<int>(std::floor(center + radius + 0.5)));
    double sum = 0.0;
    std::vector<double> ww(static_cast<size_t>(hi - lo), 0.0);
    for (int x = lo; x < hi; ++x) {
      double wv = filter((x + 0.5 - center) / filterscale);
      ww[x - lo] = wv;
      sum += wv;
    }
    spec.first[i] = lo;
    spec.count[i] = hi - lo;
    for (int x = lo; x < hi; ++x)
      spec.weights[static_cast<size_t>(i) * max_count + (x - lo)] =
          static_cast<float>(sum != 0.0 ? ww[x - lo] / sum : 0.0);
  }
  return spec;
}

uint8_t clip8(float v) {
  // PIL stores each pass's result in a uint8 image (round + clip). We
  // reproduce that quantization so native/PIL outputs agree pixel-for-pixel
  // even under cubic overshoot.
  return static_cast<uint8_t>(std::min(255.f, std::max(0.f, v + 0.5f)));
}

// Horizontal pass: (h, in_w, 3) u8 -> (h, out_w, 3) u8.
void resample_h(const uint8_t* src, int h, int in_w, uint8_t* dst, int out_w,
                const ResampleSpec& spec) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * 3;
    uint8_t* orow = dst + static_cast<size_t>(y) * out_w * 3;
    for (int i = 0; i < out_w; ++i) {
      const float* wv = &spec.weights[static_cast<size_t>(i) * spec.max_count];
      int lo = spec.first[i], n = spec.count[i];
      float r = 0.f, g = 0.f, b = 0.f;
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = row + static_cast<size_t>(lo + k) * 3;
        r += wv[k] * p[0];
        g += wv[k] * p[1];
        b += wv[k] * p[2];
      }
      orow[i * 3 + 0] = clip8(r);
      orow[i * 3 + 1] = clip8(g);
      orow[i * 3 + 2] = clip8(b);
    }
  }
}

// Vertical pass: (in_h, w, 3) u8 -> (out_h, w, 3) u8.
void resample_v(const uint8_t* src, int in_h, int w, uint8_t* dst, int out_h,
                const ResampleSpec& spec) {
  std::vector<float> acc(static_cast<size_t>(w) * 3);
  for (int i = 0; i < out_h; ++i) {
    const float* wv = &spec.weights[static_cast<size_t>(i) * spec.max_count];
    int lo = spec.first[i], n = spec.count[i];
    std::fill(acc.begin(), acc.end(), 0.f);
    for (int k = 0; k < n; ++k) {
      const uint8_t* row = src + static_cast<size_t>(lo + k) * w * 3;
      float wk = wv[k];
      for (int x = 0; x < w * 3; ++x) acc[x] += wk * row[x];
    }
    uint8_t* orow = dst + static_cast<size_t>(i) * w * 3;
    for (int x = 0; x < w * 3; ++x) orow[x] = clip8(acc[x]);
  }
}

int decode_resize_impl(const char* path, int out_size, int center_crop,
                       int method, float* out) {
  std::vector<uint8_t> file;
  int rc = read_file(path, &file);
  if (rc != kOk) return rc;

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (file.size() >= 2 && file[0] == 0xFF && file[1] == 0xD8) {
    rc = decode_jpeg(file.data(), file.size(), &rgb, &w, &h);
  } else if (file.size() >= 8 && !png_sig_cmp(file.data(), 0, 8)) {
    rc = decode_png(file.data(), file.size(), &rgb, &w, &h);
  } else {
    return kUnsupported;
  }
  if (rc != kOk) return rc;
  if (w <= 0 || h <= 0) return kDecodeError;

  int x0 = 0, y0 = 0, cw = w, ch = h;
  if (center_crop) {
    int s = std::min(w, h);
    x0 = (w - s) / 2;
    y0 = (h - s) / 2;
    cw = ch = s;
  }

  // u8 crop (contiguous)
  std::vector<uint8_t> src(static_cast<size_t>(cw) * ch * 3);
  for (int y = 0; y < ch; ++y) {
    const uint8_t* row = rgb.data() + (static_cast<size_t>(y0 + y) * w + x0) * 3;
    std::memcpy(src.data() + static_cast<size_t>(y) * cw * 3, row,
                static_cast<size_t>(cw) * 3);
  }

  ResampleSpec hspec = build_spec(cw, out_size, method);
  std::vector<uint8_t> mid(static_cast<size_t>(ch) * out_size * 3);
  resample_h(src.data(), ch, cw, mid.data(), out_size, hspec);
  ResampleSpec vspec = build_spec(ch, out_size, method);
  std::vector<uint8_t> dst(static_cast<size_t>(out_size) * out_size * 3);
  resample_v(mid.data(), ch, out_size, dst.data(), out_size, vspec);

  // normalize to [-1, 1] (reference contract: /127.5 - 1)
  for (size_t i = 0; i < dst.size(); ++i)
    out[i] = static_cast<float>(dst[i]) / 127.5f - 1.0f;
  return kOk;
}

}  // namespace

extern "C" {

// out: float32[out_size, out_size, 3] HWC in [-1, 1].
// method: 0 = bilinear, 1 = bicubic (both PIL-compatible).
int sdtpu_decode_resize_file(const char* path, int out_size, int center_crop,
                             int method, float* out) {
  return decode_resize_impl(path, out_size, center_crop, method, out);
}

// Batched decode over a std::thread pool. out must hold n images; status
// receives the per-image return code (the call returns the count of
// failures so callers can skip the per-image scan when everything is ok).
int sdtpu_load_batch(const char** paths, int n, int out_size, int center_crop,
                     int method, int n_threads, float* out, int* status) {
  size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
        status[i] = decode_resize_impl(paths[i], out_size, center_crop,
                                       method, out + stride * i);
    });
  }
  for (auto& th : pool) th.join();
  int failures = 0;
  for (int i = 0; i < n; ++i) failures += status[i] != kOk;
  return failures;
}

}  // extern "C"
