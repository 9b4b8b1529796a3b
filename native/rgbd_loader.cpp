// Native RGB-D frame loader for e2eslam_tpu.
//
// The host-side data path of the reference is torch DataLoader worker
// processes doing PIL/numpy PNG decode (reference online_adaption.py:89-94,
// num_workers=8). Here the equivalent runtime component is a small C++
// library: libpng decode (8-bit RGB/RGBA color, 16-bit grayscale depth),
// bilinear color / nearest depth resize to the target resolution, depth
// scaling (1/5000 m for TUM-format PNGs), and a std::thread pool that decodes
// a whole sequence window in parallel. Exposed as a C ABI consumed from
// Python via ctypes (e2eslam_tpu/data/native_loader.py), writing directly
// into caller-provided float32 buffers (zero-copy into the numpy batch that
// is then jax.device_put to HBM).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links libpng/zlib)

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // 8-bit: RGB interleaved; 16-bit: big-endian gray
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 0;
  bool ok = false;
};

Image decode_png(const char* path) {
  Image out;
  FILE* fp = fopen(path, "rb");
  if (!fp) return out;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return out;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  int color_type = png_get_color_type(png, info);
  out.bit_depth = png_get_bit_depth(png, info);
  out.width = png_get_image_width(png, info);
  out.height = png_get_image_height(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && out.bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (out.bit_depth == 16 && !(color_type == PNG_COLOR_TYPE_GRAY))
    png_set_strip_16(png);  // 16-bit color -> 8-bit; 16-bit gray kept (depth)

  png_read_update_info(png, info);
  out.channels = png_get_channels(png, info);
  out.bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  out.data.resize(rowbytes * out.height);
  std::vector<png_bytep> rows(out.height);
  for (int y = 0; y < out.height; ++y) rows[y] = out.data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  out.ok = true;
  return out;
}

inline uint16_t be16(const uint8_t* p) {
  return static_cast<uint16_t>((p[0] << 8) | p[1]);
}

// Bilinear resize 8-bit RGB -> float32 [0, 255] HWC.
void resize_color(const Image& img, float* dst, int dh, int dw) {
  const int ch = img.channels >= 3 ? 3 : 1;
  const float sx = static_cast<float>(img.width) / dw;
  const float sy = static_cast<float>(img.height) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < img.height ? y0 + 1 : img.height - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < img.width ? x0 + 1 : img.width - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        int cc = ch == 1 ? 0 : c;
        float v00 = img.data[(y0 * img.width + x0) * img.channels + cc];
        float v01 = img.data[(y0 * img.width + x1) * img.channels + cc];
        float v10 = img.data[(y1 * img.width + x0) * img.channels + cc];
        float v11 = img.data[(y1 * img.width + x1) * img.channels + cc];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        dst[(y * dw + x) * 3 + c] = top + (bot - top) * wy;
      }
    }
  }
}

// Nearest resize 16-bit gray -> float32 meters (value / depth_scale).
void resize_depth(const Image& img, float* dst, int dh, int dw,
                  float depth_scale) {
  const float sx = static_cast<float>(img.width) / dw;
  const float sy = static_cast<float>(img.height) / dh;
  const bool is16 = img.bit_depth == 16;
  for (int y = 0; y < dh; ++y) {
    int syi = static_cast<int>((y + 0.5f) * sy);
    if (syi >= img.height) syi = img.height - 1;
    for (int x = 0; x < dw; ++x) {
      int sxi = static_cast<int>((x + 0.5f) * sx);
      if (sxi >= img.width) sxi = img.width - 1;
      float raw;
      if (is16) {
        raw = be16(&img.data[(syi * img.width + sxi) * 2 * img.channels]);
      } else {
        raw = img.data[(syi * img.width + sxi) * img.channels];
      }
      dst[y * dw + x] = raw / depth_scale;
    }
  }
}

}  // namespace

extern "C" {

// Decode + resize a batch of RGB-D frames in parallel.
//   rgb_paths / depth_paths: n null-terminated path strings
//   colors_out: [n, dh, dw, 3] float32 (0..255)
//   depths_out: [n, dh, dw, 1] float32 (meters)
// Returns the number of successfully loaded frames (== n on full success).
int rgbd_load_batch(const char** rgb_paths, const char** depth_paths, int n,
                    int dh, int dw, float depth_scale, float* colors_out,
                    float* depths_out, int num_threads) {
  std::atomic<int> next{0};
  std::atomic<int> ok{0};
  if (num_threads < 1) num_threads = 1;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      bool good = true;
      if (rgb_paths && colors_out) {
        Image img = decode_png(rgb_paths[i]);
        if (img.ok) {
          resize_color(img, colors_out + static_cast<size_t>(i) * dh * dw * 3,
                       dh, dw);
        } else {
          good = false;
        }
      }
      if (depth_paths && depths_out) {
        Image img = decode_png(depth_paths[i]);
        if (img.ok) {
          resize_depth(img, depths_out + static_cast<size_t>(i) * dh * dw, dh,
                       dw, depth_scale);
        } else {
          good = false;
        }
      }
      if (good) ok.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  int nt = num_threads < n ? num_threads : n;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

int rgbd_loader_version() { return 1; }

}  // extern "C"
