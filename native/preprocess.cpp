// Native host-side image preprocessing for the VLA control loop.
//
// The per-control-step host work in the eval loop is dominated by the camera
// frame resize (the reference uses cv2.resize INTER_LANCZOS4,
// reference src/agent/env_adapter/simpler.py:59-69). This library provides a
// dependency-free, OpenMP-parallel Lanczos-4 resampler plus the fused
// uint8 -> normalized-float conversion, exposed over a C ABI for ctypes.
//
// Semantics: separable 8-tap Lanczos (a = 4) interpolation with
// source coordinate x_s = (x_d + 0.5) * scale - 0.5, edge clamping, and
// weight normalization — the same interpolation family as OpenCV's
// INTER_LANCZOS4 (float path; OpenCV's fixed-point quantization may differ
// by ~1 intensity level).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kA = 4;       // Lanczos window half-width
constexpr int kTaps = 2 * kA;
constexpr double kPi = 3.14159265358979323846;

inline double lanczos(double x) {
  if (x == 0.0) return 1.0;
  if (x <= -kA || x >= kA) return 0.0;
  const double px = kPi * x;
  return kA * std::sin(px) * std::sin(px / kA) / (px * px);
}

struct TapTable {
  // For each output index: first source tap and kTaps normalized weights.
  std::vector<int> start;
  std::vector<float> weights;
};

TapTable build_taps(int src_size, int dst_size) {
  TapTable t;
  t.start.resize(dst_size);
  t.weights.resize(static_cast<size_t>(dst_size) * kTaps);
  const double scale = static_cast<double>(src_size) / dst_size;
  for (int d = 0; d < dst_size; ++d) {
    const double center = (d + 0.5) * scale - 0.5;
    const int first = static_cast<int>(std::floor(center)) - (kA - 1);
    t.start[d] = first;
    double sum = 0.0;
    double w[kTaps];
    for (int k = 0; k < kTaps; ++k) {
      w[k] = lanczos(center - (first + k));
      sum += w[k];
    }
    for (int k = 0; k < kTaps; ++k) {
      t.weights[static_cast<size_t>(d) * kTaps + k] =
          static_cast<float>(w[k] / sum);
    }
  }
  return t;
}

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// uint8 HxWxC -> uint8 OHxOWxC, Lanczos-4, separable (rows then cols).
void lanczos4_resize_u8(const uint8_t* src, int src_h, int src_w, int channels,
                        uint8_t* dst, int dst_h, int dst_w) {
  const TapTable tx = build_taps(src_w, dst_w);
  const TapTable ty = build_taps(src_h, dst_h);

  // Horizontal pass: src_h x dst_w x C floats.
  std::vector<float> tmp(static_cast<size_t>(src_h) * dst_w * channels);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < src_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * src_w * channels;
    float* out_row = tmp.data() + static_cast<size_t>(y) * dst_w * channels;
    for (int x = 0; x < dst_w; ++x) {
      const int first = tx.start[x];
      const float* w = &tx.weights[static_cast<size_t>(x) * kTaps];
      for (int c = 0; c < channels; ++c) {
        float acc = 0.f;
        for (int k = 0; k < kTaps; ++k) {
          const int sx = clampi(first + k, 0, src_w - 1);
          acc += w[k] * row[sx * channels + c];
        }
        out_row[x * channels + c] = acc;
      }
    }
  }

  // Vertical pass + clamp to u8.
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dst_h; ++y) {
    const int first = ty.start[y];
    const float* w = &ty.weights[static_cast<size_t>(y) * kTaps];
    uint8_t* out_row = dst + static_cast<size_t>(y) * dst_w * channels;
    for (int x = 0; x < dst_w; ++x) {
      for (int c = 0; c < channels; ++c) {
        float acc = 0.f;
        for (int k = 0; k < kTaps; ++k) {
          const int sy = clampi(first + k, 0, src_h - 1);
          acc += w[k] *
                 tmp[(static_cast<size_t>(sy) * dst_w + x) * channels + c];
        }
        const float v = std::nearbyint(acc);
        out_row[x * channels + c] =
            static_cast<uint8_t>(v < 0.f ? 0 : (v > 255.f ? 255 : v));
      }
    }
  }
}

// Fused resize + rescale/normalize: uint8 HxWx3 -> float32 CHW
// (x/255 - mean) / std, the PaliGemma processor math.
void lanczos4_resize_normalize_chw(const uint8_t* src, int src_h, int src_w,
                                   float* dst, int dst_h, int dst_w,
                                   float mean, float std) {
  std::vector<uint8_t> resized(static_cast<size_t>(dst_h) * dst_w * 3);
  lanczos4_resize_u8(src, src_h, src_w, 3, resized.data(), dst_h, dst_w);
  const float inv = 1.0f / (255.0f * std);
  const float shift = mean / std;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dst_h; ++y) {
    for (int x = 0; x < dst_w; ++x) {
      for (int c = 0; c < 3; ++c) {
        dst[(static_cast<size_t>(c) * dst_h + y) * dst_w + x] =
            resized[(static_cast<size_t>(y) * dst_w + x) * 3 + c] * inv - shift;
      }
    }
  }
}

int blurr_native_version() { return 1; }

}  // extern "C"
