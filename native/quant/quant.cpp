// Row quantizer + normalizer: the host-side ingest hot path.
//
// Bulk-loading a shard means normalizing + symmetric int8-quantizing
// millions of rows before the device transfer. numpy does this in ~6
// full-array passes (abs, max, divide, round, clip, astype) — ~45s for
// 1M x 384 f32 on a single core. One fused pass with the data hot in
// cache does it in a few seconds. (Replaces no reference component —
// the reference never bulk-loads; its insert path rewrites the whole
// HNSW file per document, lib/libmemex/src/storage/local.rs:62-69.)
//
// Exposed via ctypes (no pybind11 in the image): plain C ABI.

#include <cmath>
#include <cstdint>

extern "C" {

// In-place L2 normalization of [n, d] f32 rows. Zero rows stay zero.
void normalize_rows(float* data, int64_t n, int64_t d) {
  for (int64_t i = 0; i < n; ++i) {
    float* row = data + i * d;
    float sq = 0.f;
    for (int64_t j = 0; j < d; ++j) sq += row[j] * row[j];
    if (sq <= 1e-24f) continue;
    const float inv = 1.0f / std::sqrt(sq);
    for (int64_t j = 0; j < d; ++j) row[j] *= inv;
  }
}

// Symmetric per-row int8 quantization: out[i,:] = round(in[i,:] / s_i),
// s_i = max(|in[i,:]|, 1e-12) / 127. One pass per row (max + quantize
// while the row is in L1).
void quantize_rows_int8(const float* in, int64_t n, int64_t d,
                        int8_t* out, float* scales) {
  for (int64_t i = 0; i < n; ++i) {
    const float* row = in + i * d;
    float absmax = 0.f;
    for (int64_t j = 0; j < d; ++j) {
      const float a = std::fabs(row[j]);
      if (a > absmax) absmax = a;
    }
    if (absmax < 1e-12f) absmax = 1e-12f;
    const float s = absmax / 127.0f;
    const float inv = 1.0f / s;
    int8_t* qrow = out + i * d;
    for (int64_t j = 0; j < d; ++j) {
      float v = row[j] * inv;
      v = v > 127.f ? 127.f : (v < -127.f ? -127.f : v);
      qrow[j] = static_cast<int8_t>(std::lrintf(v));
    }
    scales[i] = s;
  }
}

}  // extern "C"

extern "C" {

// Two-stage quantization for the residual-refinement store: one pass
// computes the coarse int8 code AND an int8 code of the quantization
// residual (v - code*scale), each with its own per-row scale. The
// reconstruction code*s + rcode*rs carries ~14 effective bits — enough
// that an exact-rerank over refined rows matches f32 ordering, which the
// coarse int8 tier cannot do on near-tie corpora (the reference never
// has this problem: HNSW scores original f32 vectors,
// lib/libmemex/src/storage/local.rs:71-91). Fused here because the host
// has ONE core: a numpy dequant+subtract+requant at 1M x 384 costs
// ~100s; this pass reuses the row while it is hot in L1.
void quantize_rows_int8_refine(const float* in, int64_t n, int64_t d,
                               int8_t* out, float* scales,
                               int8_t* rout, float* rscales) {
  for (int64_t i = 0; i < n; ++i) {
    const float* row = in + i * d;
    float absmax = 0.f;
    for (int64_t j = 0; j < d; ++j) {
      const float a = std::fabs(row[j]);
      if (a > absmax) absmax = a;
    }
    if (absmax < 1e-12f) absmax = 1e-12f;
    const float s = absmax / 127.0f;
    const float inv = 1.0f / s;
    int8_t* qrow = out + i * d;
    int8_t* rrow = rout + i * d;
    // Residual absmax <= s/2 + eps by construction; still measure it so
    // the second scale adapts to the actual rounding error distribution.
    float rmax = 0.f;
    for (int64_t j = 0; j < d; ++j) {
      float v = row[j] * inv;
      v = v > 127.f ? 127.f : (v < -127.f ? -127.f : v);
      const int8_t q = static_cast<int8_t>(std::lrintf(v));
      qrow[j] = q;
      const float r = row[j] - static_cast<float>(q) * s;
      const float a = std::fabs(r);
      if (a > rmax) rmax = a;
    }
    if (rmax < 1e-14f) rmax = 1e-14f;
    const float rs = rmax / 127.0f;
    const float rinv = 1.0f / rs;
    for (int64_t j = 0; j < d; ++j) {
      const float r = row[j] - static_cast<float>(qrow[j]) * s;
      float v = r * rinv;
      v = v > 127.f ? 127.f : (v < -127.f ? -127.f : v);
      rrow[j] = static_cast<int8_t>(std::lrintf(v));
    }
    scales[i] = s;
    rscales[i] = rs;
  }
}

}  // extern "C"
