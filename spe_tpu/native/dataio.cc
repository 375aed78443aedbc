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
  auto resample_axis = [](const std::vector<float>& src, int in_len,
                          int out_len, int stride, int count,
                          std::vector<float>& dst) {
    const float scale = static_cast<float>(in_len) / out_len;
    const float fscale = scale < 1.0f ? 1.0f : scale;
    const float support = 1.0f * fscale;
    for (int o = 0; o < out_len; ++o) {
      const float center = (o + 0.5f) * scale;
      int lo = static_cast<int>(center - support + 0.5f);
      int hi = static_cast<int>(center + support + 0.5f);
      if (lo < 0) lo = 0;
      if (hi > in_len) hi = in_len;
      float wsum = 0.0f;
      float wbuf[512];
      int n = hi - lo;
      for (int i = 0; i < n; ++i) {
        float t = (lo + i - center + 0.5f) / fscale;
        float wgt = (t < 0 ? 1.0f + t : 1.0f - t);
        if (wgt < 0) wgt = 0;
        wbuf[i] = wgt;
        wsum += wgt;
      }
      for (int i = 0; i < n; ++i) wbuf[i] /= wsum;
      for (int r = 0; r < count; ++r) {
        for (int c = 0; c < 3; ++c) {
          float acc = 0.0f;
          for (int i = 0; i < n; ++i) {
            acc += wbuf[i] * src[(static_cast<size_t>(r) * in_len + lo + i) * 3 + c];
          }
          dst[(static_cast<size_t>(r) * out_len + o) * 3 + c] = acc;
        }
      }
    }
  };

  std::vector<float> imgf(img.size());
  for (size_t i = 0; i < img.size(); ++i) imgf[i] = img[i];
  // horizontal: rows stay h, width w -> size
  std::vector<float> tmp(static_cast<size_t>(h) * size * 3);
  resample_axis(imgf, w, size, 1, h, tmp);
  // vertical: transpose-free pass by treating columns; easier: transpose
  std::vector<float> tmp_t(static_cast<size_t>(size) * h * 3);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < size; ++x)
      for (int c = 0; c < 3; ++c)
        tmp_t[(static_cast<size_t>(x) * h + y) * 3 + c] =
            tmp[(static_cast<size_t>(y) * size + x) * 3 + c];
  std::vector<float> res_t(static_cast<size_t>(size) * size * 3);
  resample_axis(tmp_t, h, size, 1, size, res_t);
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      for (int c = 0; c < 3; ++c) {
        float v = res_t[(static_cast<size_t>(x) * size + y) * 3 + c];
        out[(static_cast<size_t>(y) * size + x) * 3 + c] =
            (v / 255.0f - kMean[c]) / kStd[c];
      }
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
