// Native data-loading hot path: JPEG decode + bilinear resize + ImageNet
// normalization, multi-threaded.
//
// The reference delegates this to torch DataLoader worker processes +
// PIL/torchvision C code; here it is an in-tree component the Python loader
// calls via ctypes (spe_tpu/data/native_io.py). One call decodes a whole
// batch in parallel threads and writes directly into the caller's pinned
// float32 buffer in (B, S, S, 3) layout — no Python-side image objects.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -pthread -o libdataio.so dataio.cc -ljpeg

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
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

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

// decode one JPEG, bilinear-resize to (size, size), normalize into out
bool decode_one(const uint8_t* data, int64_t len, int size, float* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  std::vector<uint8_t> img(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // PIL-exact BILINEAR resample: separable triangle filter whose support
  // scales with the downscale ratio (antialiased), half-pixel centers —
  // matches PIL.Image.resize(..., BILINEAR), which the reference's
  // torchvision transforms use.
  //
  // Layout discipline (this is the loader's hot loop): filter bounds and
  // weights are precomputed per axis, both passes stream row-major (the
  // vertical pass is an axpy over whole rows), and there is no transpose —
  // ~2.5x over the per-output-column formulation this replaces.
  struct Filter {
    std::vector<int> lo, n;
    std::vector<float> w;  // (out_len, max_n) row-major
    int max_n = 0;
  };
  auto make_filter = [](int in_len, int out_len) {
    Filter f;
    const float scale = static_cast<float>(in_len) / out_len;
    const float fscale = scale < 1.0f ? 1.0f : scale;
    const float support = 1.0f * fscale;
    f.lo.resize(out_len);
    f.n.resize(out_len);
    std::vector<std::vector<float>> rows(out_len);
    for (int o = 0; o < out_len; ++o) {
      const float center = (o + 0.5f) * scale;
      int lo = static_cast<int>(center - support + 0.5f);
      int hi = static_cast<int>(center + support + 0.5f);
      if (lo < 0) lo = 0;
      if (hi > in_len) hi = in_len;
      int n = hi - lo;
      rows[o].resize(n);
      float wsum = 0.0f;
      for (int i = 0; i < n; ++i) {
        float t = (lo + i - center + 0.5f) / fscale;
        float wgt = (t < 0 ? 1.0f + t : 1.0f - t);
        if (wgt < 0) wgt = 0;
        rows[o][i] = wgt;
        wsum += wgt;
      }
      for (int i = 0; i < n; ++i) rows[o][i] /= wsum;
      f.lo[o] = lo;
      f.n[o] = n;
      if (n > f.max_n) f.max_n = n;
    }
    f.w.assign(static_cast<size_t>(out_len) * f.max_n, 0.0f);
    for (int o = 0; o < out_len; ++o)
      std::memcpy(&f.w[static_cast<size_t>(o) * f.max_n], rows[o].data(),
                  rows[o].size() * sizeof(float));
    return f;
  };

  const Filter fx = make_filter(w, size);
  const Filter fy = make_filter(h, size);

  // horizontal pass straight from uint8 rows: (h, w, 3) -> (h, size, 3)
  std::vector<float> tmp(static_cast<size_t>(h) * size * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = img.data() + static_cast<size_t>(y) * w * 3;
    float* drow = tmp.data() + static_cast<size_t>(y) * size * 3;
    for (int o = 0; o < size; ++o) {
      const float* wg = &fx.w[static_cast<size_t>(o) * fx.max_n];
      const uint8_t* s = srow + fx.lo[o] * 3;
      float a0 = 0, a1 = 0, a2 = 0;
      const int n = fx.n[o];
      for (int i = 0; i < n; ++i) {
        const float wi = wg[i];
        a0 += wi * s[i * 3 + 0];
        a1 += wi * s[i * 3 + 1];
        a2 += wi * s[i * 3 + 2];
      }
      drow[o * 3 + 0] = a0;
      drow[o * 3 + 1] = a1;
      drow[o * 3 + 2] = a2;
    }
  }

  // vertical pass as whole-row axpy: (h, size, 3) -> out row o, fused with
  // the /255 + ImageNet normalization
  const int row_elems = size * 3;
  std::vector<float> acc(row_elems);
  const float inv_std[3] = {1.0f / (255.0f * kStd[0]), 1.0f / (255.0f * kStd[1]),
                            1.0f / (255.0f * kStd[2])};
  const float bias[3] = {kMean[0] / kStd[0], kMean[1] / kStd[1],
                         kMean[2] / kStd[2]};
  for (int o = 0; o < size; ++o) {
    std::memset(acc.data(), 0, row_elems * sizeof(float));
    const float* wg = &fy.w[static_cast<size_t>(o) * fy.max_n];
    const int n = fy.n[o];
    for (int i = 0; i < n; ++i) {
      const float wi = wg[i];
      const float* srow = tmp.data() + static_cast<size_t>(fy.lo[o] + i) * row_elems;
      for (int e = 0; e < row_elems; ++e) acc[e] += wi * srow[e];
    }
    float* drow = out + static_cast<size_t>(o) * row_elems;
    for (int x = 0; x < size; ++x) {
      drow[x * 3 + 0] = acc[x * 3 + 0] * inv_std[0] - bias[0];
      drow[x * 3 + 1] = acc[x * 3 + 1] * inv_std[1] - bias[1];
      drow[x * 3 + 2] = acc[x * 3 + 2] * inv_std[2] - bias[2];
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode a batch. blobs = concatenated JPEG bytes; offsets[i]..offsets[i+1]
// delimit image i (offsets has n+1 entries). out: (n, size, size, 3) f32.
// flips[i] != 0 mirrors image i horizontally (train-time augmentation).
// Returns number of successfully decoded images.
int decode_batch(const uint8_t* blobs, const int64_t* offsets, int n,
                 int size, const uint8_t* flips, float* out, int n_threads) {
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + static_cast<size_t>(i) * size * size * 3;
      if (decode_one(blobs + offsets[i], offsets[i + 1] - offsets[i], size, dst)) {
        ok.fetch_add(1);
        if (flips && flips[i]) {
          for (int y = 0; y < size; ++y) {
            float* row = dst + static_cast<size_t>(y) * size * 3;
            for (int x = 0; x < size / 2; ++x) {
              for (int c = 0; c < 3; ++c) {
                std::swap(row[x * 3 + c], row[(size - 1 - x) * 3 + c]);
              }
            }
          }
        }
      } else {
        std::memset(dst, 0, static_cast<size_t>(size) * size * 3 * sizeof(float));
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  return ok.load();
}

}  // extern "C"
