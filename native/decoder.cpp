// Native data layer: parallel image decode + resize worker pool.
//
// The reference's data plane is PIL decode inside torch DataLoader worker
// processes (nerf_qa/data.py:64-84 + num_workers=4 loaders). This is the
// TPU-framework equivalent: a C++ thread pool that decodes PNG/JPEG
// (libpng/libjpeg), composites RGBA onto white (data.py:67-75 semantics),
// bilinearly resizes with torch align_corners=False geometry
// (data.py:81-82), and writes float32 NHWC batches straight into a
// caller-provided buffer — zero Python-side copies. Exposed over a plain
// C ABI for ctypes (no pybind11 in this image).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC + libpng/libjpeg/z).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, c in {3, 4}
  bool ok = false;
};

Image decode_png(const char* path) {
  Image out;
  FILE* fp = fopen(path, "rb");
  if (!fp) return out;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return out;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return out;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_expand(png);           // palette/gray->8-bit RGB(A)
  png_set_strip_16(png);         // 16-bit -> 8-bit
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out.h = png_get_image_height(png, info);
  out.w = png_get_image_width(png, info);
  out.c = png_get_channels(png, info);
  out.data.resize(size_t(out.h) * out.w * out.c);
  std::vector<png_bytep> rows(out.h);
  for (int y = 0; y < out.h; ++y)
    rows[y] = out.data.data() + size_t(y) * out.w * out.c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  out.ok = (out.c == 3 || out.c == 4);
  return out;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

Image decode_jpeg(const char* path) {
  Image out;
  FILE* fp = fopen(path, "rb");
  if (!fp) return out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.h = cinfo.output_height;
  out.w = cinfo.output_width;
  out.c = 3;
  out.data.resize(size_t(out.h) * out.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        out.data.data() + size_t(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  out.ok = true;
  return out;
}

Image decode_any(const char* path) {
  size_t n = strlen(path);
  if (n >= 4 && (strcmp(path + n - 4, ".png") == 0 ||
                 strcmp(path + n - 4, ".PNG") == 0))
    return decode_png(path);
  return decode_jpeg(path);
}

// RGBA -> white-composited RGB float [0,1]; RGB -> float.
std::vector<float> to_float_rgb(const Image& img) {
  std::vector<float> out(size_t(img.h) * img.w * 3);
  const uint8_t* src = img.data.data();
  float* dst = out.data();
  const float inv = 1.0f / 255.0f;
  if (img.c == 3) {
    size_t n = size_t(img.h) * img.w * 3;
    for (size_t i = 0; i < n; ++i) dst[i] = src[i] * inv;
  } else {
    size_t px = size_t(img.h) * img.w;
    for (size_t i = 0; i < px; ++i) {
      float a = src[i * 4 + 3] * inv;
      for (int k = 0; k < 3; ++k) {
        float v = src[i * 4 + k] * inv;
        dst[i * 3 + k] = v * a + (1.0f - a);  // composite onto white
      }
    }
  }
  return out;
}

// Bilinear resize, align_corners=False (torch F.interpolate semantics).
void resize_bilinear(const float* src, int sh, int sw, float* dst, int dh,
                     int dw) {
  if (sh == dh && sw == dw) {
    memcpy(dst, src, size_t(dh) * dw * 3 * sizeof(float));
    return;
  }
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> tx(dw);
  const double sx = double(sw) / dw;
  for (int x = 0; x < dw; ++x) {
    double s = (x + 0.5) * sx - 0.5;
    s = s < 0 ? 0 : (s > sw - 1 ? sw - 1 : s);
    x0[x] = int(s);
    x1[x] = x0[x] + 1 < sw ? x0[x] + 1 : sw - 1;
    tx[x] = float(s - x0[x]);
  }
  const double sy = double(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    double s = (y + 0.5) * sy - 0.5;
    s = s < 0 ? 0 : (s > sh - 1 ? sh - 1 : s);
    int y0 = int(s);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float ty = float(s - y0);
    const float* r0 = src + size_t(y0) * sw * 3;
    const float* r1 = src + size_t(y1) * sw * 3;
    float* drow = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* p00 = r0 + x0[x] * 3;
      const float* p01 = r0 + x1[x] * 3;
      const float* p10 = r1 + x0[x] * 3;
      const float* p11 = r1 + x1[x] * 3;
      float fx = tx[x];
      for (int k = 0; k < 3; ++k) {
        float top = p00[k] * (1 - fx) + p01[k] * fx;
        float bot = p10[k] * (1 - fx) + p11[k] * fx;
        drow[x * 3 + k] = top * (1 - ty) + bot * ty;
      }
    }
  }
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool = nullptr;
std::mutex pool_mu;

ThreadPool& get_pool(int threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  if (!pool) pool = new ThreadPool(threads > 0 ? threads : 4);
  return *pool;
}

}  // namespace

extern "C" {

// Decode one image, resize to (out_h, out_w), write float32 HWC RGB into
// out (caller-allocated, out_h*out_w*3 floats). out_h/out_w <= 0 keeps the
// source size IF it matches the buffer dims passed in src_h/src_w probes.
// Returns 0 on success.
int nqa_decode_resize(const char* path, float* out, int out_h, int out_w) {
  Image img = decode_any(path);
  if (!img.ok) return 1;
  std::vector<float> rgb = to_float_rgb(img);
  resize_bilinear(rgb.data(), img.h, img.w, out, out_h, out_w);
  return 0;
}

// Probe image dimensions without full decode-to-float (full decode still
// happens for simplicity; prep-time only). Returns 0 on success.
int nqa_image_size(const char* path, int* h, int* w) {
  Image img = decode_any(path);
  if (!img.ok) return 1;
  *h = img.h;
  *w = img.w;
  return 0;
}

// Parallel batch: decode+resize n images into out (n*out_h*out_w*3 f32,
// NHWC). Returns number of failures.
int nqa_decode_resize_batch(const char** paths, int n, float* out, int out_h,
                            int out_w, int threads) {
  ThreadPool& tp = get_pool(threads);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;
  size_t stride = size_t(out_h) * out_w * 3;
  for (int i = 0; i < n; ++i) {
    const char* p = paths[i];
    float* dst = out + stride * i;
    tp.submit([p, dst, out_h, out_w, &failures, &done, &done_cv, &done_mu] {
      if (nqa_decode_resize(p, dst, out_h, out_w) != 0) failures++;
      {
        std::lock_guard<std::mutex> lk(done_mu);
        done++;
      }
      done_cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

}  // extern "C"
