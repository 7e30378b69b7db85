// hostio — native host-side IO/runtime support for sgqn_carla_tpu.
//
// The reference's host runtime leans on native libraries reached through
// Python glue: cv2/ffmpeg video decode (env/wrappers.py:451-479), PIL
// resize (distracting_control/background.py:59-68), torch DataLoader worker
// pools for Places365 (augmentations.py:27-42), imageio mp4 writing
// (video.py:33-36). This library is the framework's own native equivalent:
// multithreaded frame encoding (PNG via zlib), nearest/bilinear uint8
// resize, and procedural dataset synthesis — exposed to Python over a plain
// C ABI consumed with ctypes (sgqn_carla_tpu/core/native.py).
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC -lz -pthread)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <thread>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- PNG write
// Minimal RGB8 PNG encoder (zlib deflate, one IDAT). Returns bytes written
// or -1. `out` must hold at least h*(3*w+1) + 1024 bytes.
static void put_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

static uint32_t crc32_of(const uint8_t* data, size_t n, uint32_t seed) {
  return crc32(seed, data, (uInt)n);
}

long png_encode_rgb(const uint8_t* rgb, int w, int h, uint8_t* out,
                    long out_cap) {
  // filter rows (filter type 0)
  std::vector<uint8_t> raw((size_t)h * (3 * (size_t)w + 1));
  for (int y = 0; y < h; y++) {
    raw[(size_t)y * (3 * w + 1)] = 0;
    memcpy(&raw[(size_t)y * (3 * w + 1) + 1], rgb + (size_t)y * 3 * w, 3 * (size_t)w);
  }
  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
    return -1;

  long need = 8 + 25 + (long)comp_cap + 12 + 12;
  if (need > out_cap) return -1;
  uint8_t* p = out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  memcpy(p, sig, 8); p += 8;
  // IHDR
  put_be32(p, 13); p += 4;
  uint8_t* chunk = p;
  memcpy(p, "IHDR", 4); p += 4;
  put_be32(p, (uint32_t)w); p += 4;
  put_be32(p, (uint32_t)h); p += 4;
  *p++ = 8; *p++ = 2; *p++ = 0; *p++ = 0; *p++ = 0;
  put_be32(p, crc32_of(chunk, 17, crc32(0, Z_NULL, 0))); p += 4;
  // IDAT
  put_be32(p, (uint32_t)comp_cap); p += 4;
  chunk = p;
  memcpy(p, "IDAT", 4); p += 4;
  memcpy(p, comp.data(), comp_cap); p += comp_cap;
  put_be32(p, crc32_of(chunk, comp_cap + 4, crc32(0, Z_NULL, 0))); p += 4;
  // IEND
  put_be32(p, 0); p += 4;
  chunk = p;
  memcpy(p, "IEND", 4); p += 4;
  put_be32(p, crc32_of(chunk, 4, crc32(0, Z_NULL, 0))); p += 4;
  return (long)(p - out);
}

// Encode many frames to PNG files in parallel (one worker per hw thread).
// paths: concatenated null-separated file names.
int png_encode_batch(const uint8_t* frames, int n, int w, int h,
                     const char* paths) {
  std::vector<const char*> files;
  const char* q = paths;
  for (int i = 0; i < n; i++) {
    files.push_back(q);
    q += strlen(q) + 1;
  }
  int n_threads = std::min<int>(std::thread::hardware_concurrency(), n);
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> ts;
  std::vector<int> errs(n, 0);
  size_t frame_bytes = (size_t)w * h * 3;
  for (int t = 0; t < n_threads; t++) {
    ts.emplace_back([&, t]() {
      long cap = (long)frame_bytes + (long)h + 4096;
      std::vector<uint8_t> buf(cap);
      for (int i = t; i < n; i += n_threads) {
        long sz = png_encode_rgb(frames + (size_t)i * frame_bytes, w, h,
                                 buf.data(), cap);
        if (sz < 0) { errs[i] = 1; continue; }
        FILE* f = fopen(files[i], "wb");
        if (!f) { errs[i] = 2; continue; }
        fwrite(buf.data(), 1, (size_t)sz, f);
        fclose(f);
      }
    });
  }
  for (auto& th : ts) th.join();
  for (int e : errs) if (e) return -1;
  return 0;
}

// ------------------------------------------------------------------ resize
// Bilinear uint8 HWC resize (src: sh×sw×c → dst: dh×dw×c).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sh / dh - 0.5f;
    int y0 = (int)floorf(fy); float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0; if (y1 >= sh) y1 = sh - 1; if (y0 >= sh) y0 = sh - 1;
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sw / dw - 0.5f;
      int x0 = (int)floorf(fx); float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0; if (x1 >= sw) x1 = sw - 1; if (x0 >= sw) x0 = sw - 1;
      for (int k = 0; k < c; k++) {
        float v00 = src[((size_t)y0 * sw + x0) * c + k];
        float v01 = src[((size_t)y0 * sw + x1) * c + k];
        float v10 = src[((size_t)y1 * sw + x0) * c + k];
        float v11 = src[((size_t)y1 * sw + x1) * c + k];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)y * dw + x) * c + k] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// -------------------------------------------------- procedural synthesis
// Multithreaded synthesis of the overlay image pool (the Places365 stand-in,
// see data/overlay.py) directly into a caller buffer (n, h, w, 3) uint8.
static uint32_t xorshift(uint32_t* s) {
  uint32_t x = *s;
  x ^= x << 13; x ^= x >> 17; x ^= x << 5;
  return *s = x;
}

static float frand(uint32_t* s) {  // [0, 1)
  return (xorshift(s) >> 8) * (1.0f / 16777216.0f);
}

void synth_pool_u8(uint8_t* out, int n, int h, int w, uint32_t seed) {
  int n_threads = std::min<int>(std::thread::hardware_concurrency(), n);
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; t++) {
    ts.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        uint32_t rs = seed * 2654435761u + i * 40503u + 1u;
        float base[3], k1[3], k2[3], ph[3];
        for (int c0 = 0; c0 < 3; c0++) {
          base[c0] = 0.5f;
          k1[c0] = (frand(&rs) * 6 - 3) * 6.2831853f;
          k2[c0] = (frand(&rs) * 6 - 3) * 6.2831853f;
          ph[c0] = frand(&rs) * 6.2831853f;
        }
        uint8_t* img = out + (size_t)i * h * w * 3;
        for (int y = 0; y < h; y++) {
          float fy = (float)y / h;
          for (int x = 0; x < w; x++) {
            float fx = (float)x / w;
            for (int c0 = 0; c0 < 3; c0++) {
              float v = base[c0] + 0.4f * sinf(k1[c0] * fx + k2[c0] * fy + ph[c0]);
              v += (frand(&rs) - 0.5f) * 0.1f;
              if (v < 0) v = 0; if (v > 1) v = 1;
              img[((size_t)y * w + x) * 3 + c0] = (uint8_t)(v * 255.0f);
            }
          }
        }
        // random rectangles ("objects")
        int n_rect = 3 + (int)(frand(&rs) * 6);
        for (int rct = 0; rct < n_rect; rct++) {
          int x0 = (int)(frand(&rs) * (w - 6));
          int y0 = (int)(frand(&rs) * (h - 6));
          int rw = 4 + (int)(frand(&rs) * w / 2);
          int rh = 4 + (int)(frand(&rs) * h / 2);
          float col[3] = {frand(&rs) * 255, frand(&rs) * 255, frand(&rs) * 255};
          for (int y = y0; y < y0 + rh && y < h; y++)
            for (int x = x0; x < x0 + rw && x < w; x++)
              for (int c0 = 0; c0 < 3; c0++) {
                uint8_t* px = &img[((size_t)y * w + x) * 3 + c0];
                *px = (uint8_t)(0.5f * *px + 0.5f * col[c0]);
              }
        }
      }
    });
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"
