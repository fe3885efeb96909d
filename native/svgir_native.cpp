// svgir_tpu native runtime helpers (C++, ctypes ABI).
//
// TPU-native framework policy: device compute lives in jax/XLA/Pallas; the
// host runtime around it is native where the reference's was.  This module
// covers the host-side hot paths of the data/IO layer:
//   * interleave/deinterleave for the PLY codec (AoS record <-> SoA columns
//     — the python fallback materializes per-column numpy copies; this does
//     one threaded pass),
//   * 30-bit Morton-3D encode/decode (the spatial bucketing used by the
//     grid tracer, the LBVH-equivalent culling structure; mirrors
//     submodules/bvh/src/construct.cu:23-48's morton codes).
//
// Build: cc -O3 -march=native -shared -fPIC -o libsvgir_native.so \
//            svgir_native.cpp -lpthread   (see native/build.py)

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = hw ? (hw < 16 ? hw : 16) : 4;
  if (n < 1 << 16) nthreads = 1;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  std::vector<std::thread> ts;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

inline uint32_t expand_bits(uint32_t v) {
  // spread 10 bits to every 3rd position (construct.cu expandBits)
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

}  // namespace

extern "C" {

// rows [n, k] f32 (contiguous)  ->  k column arrays cols[c][n]
void svgir_deinterleave_f32(const float* rows, int64_t n, int64_t k,
                            float** cols) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      for (int64_t c = 0; c < k; ++c) cols[c][i] = rows[i * k + c];
  });
}

// k column arrays -> rows [n, k] f32
void svgir_interleave_f32(const float* const* cols, int64_t n, int64_t k,
                          float* rows) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      for (int64_t c = 0; c < k; ++c) rows[i * k + c] = cols[c][i];
  });
}

// 30-bit morton codes for points normalized into [0,1)^3
void svgir_morton3d(const float* xyz, int64_t n, const float* lo3,
                    const float* inv_extent3, uint32_t* codes) {
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint32_t c[3];
      for (int d = 0; d < 3; ++d) {
        float v = (xyz[i * 3 + d] - lo3[d]) * inv_extent3[d];
        v = v < 0.f ? 0.f : (v > 0.99999f ? 0.99999f : v);
        c[d] = expand_bits((uint32_t)(v * 1024.0f));
      }
      codes[i] = (c[0] << 2) | (c[1] << 1) | c[2];
    }
  });
}

int svgir_version() { return 1; }

}  // extern "C"
