// Native batch assembly for the training data pipeline.
//
// TPU-host equivalent of the reference's native data layer (tf.data's C++
// runtime feeding `datasets.py:266-282`, plus the per-step dequantization
// at `run_lib.py:86`): one fused pass over the batch doing
//   gather(uint8 dataset, indices)
//   -> optional horizontal flip
//   -> uniform dequantization (255*x/255 + u)/256 == (pixel + u)/256
//   -> optional centering to [-1, 1]
// writing float32 NHWC output. OpenMP across batch elements; a counter-based
// xorshift RNG makes every (seed, element) reproducible independent of
// thread scheduling.
//
// Built at import time by indm_tpu.native (g++ -O3 -fopenmp -shared);
// bound via ctypes — no pybind11 dependency.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// splitmix64: well-distributed 64-bit mixer for counter-based streams.
inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(splitmix64(seed)) {}
  inline uint64_t next() {
    state = splitmix64(state);
    return state;
  }
  // float in [0, 1)
  inline float uniform() {
    return static_cast<float>(next() >> 40) * (1.0f / 16777216.0f);
  }
};

}  // namespace

extern "C" {

// out:      [batch, h, w, c] float32
// data:     [n, h, w, c] uint8 (full dataset)
// indices:  [batch] int64 rows of `data`
// seed:     RNG stream id for this batch (flips + dequant noise)
// flags:    bit 0 = random_flip, bit 1 = dequantize, bit 2 = center [-1,1]
void indm_fill_batch(float* out, const uint8_t* data, const int64_t* indices,
                     int64_t batch, int64_t h, int64_t w, int64_t c,
                     uint64_t seed, int flags) {
  const bool flip = flags & 1;
  const bool dequant = flags & 2;
  const bool center = flags & 4;
  const int64_t row = w * c;
  const int64_t img = h * row;

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t b = 0; b < batch; ++b) {
    Rng rng(splitmix64(seed) ^ static_cast<uint64_t>(b));
    const uint8_t* src = data + indices[b] * img;
    float* dst = out + b * img;
    const bool do_flip = flip && (rng.next() & 1);
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t* srow = src + y * row;
      float* drow = dst + y * row;
      for (int64_t x = 0; x < w; ++x) {
        const uint8_t* sp = srow + (do_flip ? (w - 1 - x) : x) * c;
        float* dp = drow + x * c;
        for (int64_t ch = 0; ch < c; ++ch) {
          float v = static_cast<float>(sp[ch]);
          if (dequant) {
            v = (v + rng.uniform()) * (1.0f / 256.0f);
          } else {
            v *= (1.0f / 255.0f);
          }
          if (center) v = v * 2.0f - 1.0f;
          dp[ch] = v;
        }
      }
    }
  }
}

int indm_loader_version() { return 1; }

int indm_loader_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
