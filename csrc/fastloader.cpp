// Native data-loader core: threaded JPEG decode + resize + crop + flip.
//
// The reference leans on turbojpeg + 8-12 dataloader worker processes to feed
// 48-90 JPEGs per sample (SURVEY.md "input pipeline throughput";
// /root/reference/loaders/pipelines/loading.py:48-51). This library is the
// TPU-host equivalent: a C++ thread pool decoding straight into the batch
// buffer, callable from the Python pipeline via ctypes (no pybind11 in this
// image). Python/PIL remains the default path; this is the opt-in fast path.
//
// Build: make -C csrc  (produces libfastloader.so)

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file to RGB. Returns empty on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>* out, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// PIL-style cubic filter (a = -0.5, support 2).
inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Per-output-pixel filter taps, PIL-style: when downscaling the filter is
// stretched by the scale factor (antialias), box-centered coordinates,
// clamped borders, normalized weights.
struct FilterTaps {
  std::vector<int> idx;     // [n, ksize]
  std::vector<float> wgt;   // [n, ksize]
  int ksize = 0;
};

FilterTaps build_taps(int src, int dst) {
  FilterTaps t;
  const double scale = static_cast<double>(src) / dst;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;  // bicubic support = 2
  t.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.idx.resize(static_cast<size_t>(dst) * t.ksize);
  t.wgt.assign(static_cast<size_t>(dst) * t.ksize, 0.0f);
  for (int x = 0; x < dst; ++x) {
    double center = (x + 0.5) * scale - 0.5;
    int lo = static_cast<int>(std::floor(center - support)) + 1;
    double wsum = 0;
    std::vector<double> wv(t.ksize, 0.0);
    for (int k = 0; k < t.ksize; ++k) {
      wv[k] = cubic((lo + k - center) / filterscale);
      wsum += wv[k];
    }
    for (int k = 0; k < t.ksize; ++k) {
      t.idx[static_cast<size_t>(x) * t.ksize + k] =
          std::clamp(lo + k, 0, src - 1);
      t.wgt[static_cast<size_t>(x) * t.ksize + k] =
          static_cast<float>(wsum != 0 ? wv[k] / wsum : 0.0);
    }
  }
  return t;
}

// Separable bicubic resize (RGB uint8) with PIL-style antialiasing.
void resize_bicubic(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                    int dh) {
  FilterTaps tx = build_taps(sw, dw);
  FilterTaps ty = build_taps(sh, dh);

  // horizontal pass into a float temp [sh, dw, 3]
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < tx.ksize; ++k) {
        const uint8_t* p = srow + tx.idx[static_cast<size_t>(x) * tx.ksize + k] * 3;
        float wgt = tx.wgt[static_cast<size_t>(x) * tx.ksize + k];
        acc[0] += wgt * p[0];
        acc[1] += wgt * p[1];
        acc[2] += wgt * p[2];
      }
      for (int ch = 0; ch < 3; ++ch) trow[x * 3 + ch] = acc[ch];
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < 3; ++c) {
        float acc = 0;
        for (int k = 0; k < ty.ksize; ++k)
          acc += ty.wgt[static_cast<size_t>(y) * ty.ksize + k]
               * tmp[static_cast<size_t>(ty.idx[static_cast<size_t>(y) * ty.ksize + k]) * dw * 3
                     + x * 3 + c];
        drow[x * 3 + c] =
            static_cast<uint8_t>(std::clamp(acc + 0.5f, 0.0f, 255.0f));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode n JPEGs; per image: resize to (resize_w, resize_h), crop
// [crop_y : crop_y+out_h, crop_x : crop_x+out_w], optional horizontal flip,
// RGB->BGR, write uint8 into out[n, out_h, out_w, 3].
// Returns the number of successfully processed images.
int sbtpu_load_batch(const char** paths, int n, uint8_t* out, int resize_w,
                     int resize_h, int crop_x, int crop_y, int out_w,
                     int out_h, int flip, int num_threads) {
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    std::vector<uint8_t> raw, resized;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      if (!decode_jpeg(paths[i], &raw, &w, &h)) continue;
      const uint8_t* img = raw.data();
      int iw = w, ih = h;
      if (resize_w != w || resize_h != h) {
        resized.resize(static_cast<size_t>(resize_w) * resize_h * 3);
        resize_bicubic(raw.data(), w, h, resized.data(), resize_w, resize_h);
        img = resized.data();
        iw = resize_w;
        ih = resize_h;
      }
      uint8_t* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      for (int y = 0; y < out_h; ++y) {
        int sy = std::clamp(crop_y + y, 0, ih - 1);
        const uint8_t* srow = img + static_cast<size_t>(sy) * iw * 3;
        uint8_t* drow = dst + static_cast<size_t>(y) * out_w * 3;
        for (int x = 0; x < out_w; ++x) {
          int sx = std::clamp(crop_x + (flip ? out_w - 1 - x : x), 0, iw - 1);
          const uint8_t* p = srow + sx * 3;
          drow[x * 3 + 0] = p[2];  // BGR
          drow[x * 3 + 1] = p[1];
          drow[x * 3 + 2] = p[0];
        }
      }
      ok.fetch_add(1);
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

// Plain decode (no resize/crop): out must hold [h, w, 3]; dims returned via
// pointers after a prior sbtpu_probe call.
int sbtpu_probe(const char* path, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int sbtpu_decode(const char* path, uint8_t* out, int w, int h) {
  std::vector<uint8_t> raw;
  int dw = 0, dh = 0;
  if (!decode_jpeg(path, &raw, &dw, &dh) || dw != w || dh != h) return -1;
  // RGB -> BGR
  size_t npix = static_cast<size_t>(w) * h;
  for (size_t i = 0; i < npix; ++i) {
    out[i * 3 + 0] = raw[i * 3 + 2];
    out[i * 3 + 1] = raw[i * 3 + 1];
    out[i * 3 + 2] = raw[i * 3 + 0];
  }
  return 0;
}

}  // extern "C"
