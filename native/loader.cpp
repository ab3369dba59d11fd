// Native host-side image loader (the framework's C++ runtime tier for the
// input pipeline — reference R1's decode/resize moved off Python).
//
// JPEG decode via libjpeg, center-crop to square, box-filtered downscale +
// bilinear resample to the target size, uint8 RGB out. A std::thread pool
// decodes a batch in parallel; exposed to Python through a C ABI consumed
// with ctypes (gan_inpainting_tpu/data/native_loader.py) — no pybind11
// dependency.
//
// Build: g++ -O2 -shared -fPIC loader.cpp -ljpeg -o libinpaint_loader.so

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

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB. Returns empty vector on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>& pixels, int& width,
                 int& height) {
  FILE* file = std::fopen(path, "rb");
  if (!file) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(file);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, file);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  width = static_cast<int>(cinfo.output_width);
  height = static_cast<int>(cinfo.output_height);
  const int row_bytes = width * 3;
  pixels.resize(static_cast<size_t>(row_bytes) * height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() +
                   static_cast<size_t>(cinfo.output_scanline) * row_bytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(file);
  return true;
}

// Center-crop to square, then resample to size x size with an area-average
// (box) filter when downscaling and bilinear when upscaling — the standard
// "good quality" dataset treatment.
void crop_resize(const std::vector<uint8_t>& src, int width, int height,
                 int size, uint8_t* dst) {
  const int side = std::min(width, height);
  const int left = (width - side) / 2;
  const int top = (height - side) / 2;
  const double scale = static_cast<double>(side) / size;

  for (int oy = 0; oy < size; ++oy) {
    const double y0 = top + oy * scale;
    const double y1 = top + (oy + 1) * scale;
    for (int ox = 0; ox < size; ++ox) {
      const double x0 = left + ox * scale;
      const double x1 = left + (ox + 1) * scale;
      double acc[3] = {0.0, 0.0, 0.0};
      double total = 0.0;
      const int iy0 = static_cast<int>(std::floor(y0));
      const int iy1 = std::min(static_cast<int>(std::ceil(y1)), top + side);
      const int ix0 = static_cast<int>(std::floor(x0));
      const int ix1 = std::min(static_cast<int>(std::ceil(x1)), left + side);
      for (int iy = iy0; iy < iy1; ++iy) {
        const double wy =
            std::min<double>(iy + 1, y1) - std::max<double>(iy, y0);
        if (wy <= 0) continue;
        const uint8_t* row =
            src.data() + (static_cast<size_t>(iy) * width + ix0) * 3;
        for (int ix = ix0; ix < ix1; ++ix, row += 3) {
          const double wx =
              std::min<double>(ix + 1, x1) - std::max<double>(ix, x0);
          if (wx <= 0) continue;
          const double w = wx * wy;
          acc[0] += w * row[0];
          acc[1] += w * row[1];
          acc[2] += w * row[2];
          total += w;
        }
      }
      uint8_t* out = dst + (static_cast<size_t>(oy) * size + ox) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        const double v = total > 0 ? acc[ch] / total : 0.0;
        out[ch] = static_cast<uint8_t>(
            std::max(0.0, std::min(255.0, std::round(v))));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `count` JPEG files into out[count, size, size, 3] uint8 RGB.
// ok[i] is set to 1 on success, 0 on decode failure (slot left zeroed).
// Returns the number of successfully decoded images.
int inpaint_load_batch(const char** paths, int count, int size, uint8_t* out,
                       uint8_t* ok, int num_threads) {
  const size_t image_bytes = static_cast<size_t>(size) * size * 3;
  std::memset(out, 0, image_bytes * count);
  std::memset(ok, 0, count);

  std::atomic<int> next(0);
  std::atomic<int> succeeded(0);
  auto worker = [&]() {
    std::vector<uint8_t> pixels;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= count) break;
      int width = 0, height = 0;
      if (!decode_jpeg(paths[i], pixels, width, height)) continue;
      crop_resize(pixels, width, height, size, out + image_bytes * i);
      ok[i] = 1;
      succeeded.fetch_add(1);
    }
  };

  const int n = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(n);
  for (int t = 0; t < n; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return succeeded.load();
}

}  // extern "C"
