// Native C3D point-data codec for moshpp_tpu.
//
// Plays the role ezc3d (C++) plays in the reference's mocap ingest
// (tools/mocap_interface.py:41): the bulk decode/encode of the C3D data
// section — per-frame XYZW point records in float or scaled-int16 layout,
// Intel/DEC/MIPS float formats — parallelized over frames with OpenMP.
// The Python layer (moshpp_tpu/io/c3d.py) handles the small parameter
// section and falls back to a pure-numpy path when this library is absent.
//
// Build: make -C native   (produces libmoshpp_c3d.so next to this file)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int kProcIntel = 84;
constexpr int kProcDec = 85;
constexpr int kProcMips = 86;

inline float decode_f32(const uint8_t* p, int proc) {
  uint32_t bits;
  switch (proc) {
    case kProcMips:
      bits = (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
             (uint32_t(p[2]) << 8) | uint32_t(p[3]);
      break;
    case kProcDec: {
      // DEC float: 16-bit word swap of the little-endian layout, value / 4
      uint8_t sw[4] = {p[2], p[3], p[0], p[1]};
      std::memcpy(&bits, sw, 4);
      float v;
      std::memcpy(&v, &bits, 4);
      return v / 4.0f;
    }
    default:
      std::memcpy(&bits, p, 4);
  }
  float v;
  std::memcpy(&v, &bits, 4);
  return v;
}

inline int16_t decode_i16(const uint8_t* p, int proc) {
  if (proc == kProcMips) {
    return int16_t((uint16_t(p[0]) << 8) | uint16_t(p[1]));
  }
  int16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

}  // namespace

extern "C" {

// Decode the point block of a C3D data section.
//   data:        raw bytes starting at the data section
//   nbytes:      available bytes
//   n_frames:    frames to decode (caller computed from available data)
//   n_points:    markers per frame
//   frame_words: total 16-bit words per frame (points*4*wsize + analog)
//   is_float:    1 for float records, 0 for int16 (then |scale| applies)
//   scale:       |POINT:SCALE| for int16 data
//   proc:        84 Intel / 85 DEC / 86 MIPS
// Outputs:
//   out_points (n_frames*n_points*3) floats, NaN where residual < 0
//   out_resid  (n_frames*n_points) floats
// Returns 0 on success.
int moshpp_c3d_decode_points(const uint8_t* data, int64_t nbytes,
                             int64_t n_frames, int32_t n_points,
                             int32_t frame_words, int32_t is_float,
                             float scale, int32_t proc, float* out_points,
                             float* out_resid) {
  const int wsize = is_float ? 4 : 2;
  const int64_t frame_bytes = int64_t(frame_words) * wsize;
  if (frame_bytes * n_frames > nbytes) return 1;
  const float nanf = std::numeric_limits<float>::quiet_NaN();

#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < n_frames; ++f) {
    const uint8_t* rec = data + f * frame_bytes;
    float* pts = out_points + f * int64_t(n_points) * 3;
    float* res = out_resid + f * int64_t(n_points);
    for (int32_t m = 0; m < n_points; ++m) {
      const uint8_t* q = rec + int64_t(m) * 4 * wsize;
      float x, y, z, w;
      if (is_float) {
        x = decode_f32(q, proc);
        y = decode_f32(q + 4, proc);
        z = decode_f32(q + 8, proc);
        w = decode_f32(q + 12, proc);
      } else {
        x = decode_i16(q, proc) * scale;
        y = decode_i16(q + 2, proc) * scale;
        z = decode_i16(q + 4, proc) * scale;
        w = float(decode_i16(q + 6, proc));
      }
      const bool invalid = w < 0.0f;
      pts[m * 3 + 0] = invalid ? nanf : x;
      pts[m * 3 + 1] = invalid ? nanf : y;
      pts[m * 3 + 2] = invalid ? nanf : z;
      res[m] = w;
    }
  }
  return 0;
}

// Encode points into Intel float XYZW records. NaN coordinates are written
// as 0 with residual -1 (the invalid-marker convention).
int moshpp_c3d_encode_points(const float* points, const float* residuals,
                             int64_t n_frames, int32_t n_points,
                             uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < n_frames; ++f) {
    const float* pts = points + f * int64_t(n_points) * 3;
    const float* res = residuals ? residuals + f * int64_t(n_points) : nullptr;
    uint8_t* rec = out + f * int64_t(n_points) * 16;
    for (int32_t m = 0; m < n_points; ++m) {
      float x = pts[m * 3], y = pts[m * 3 + 1], z = pts[m * 3 + 2];
      float w = res ? res[m] : 0.0f;
      const bool invalid = std::isnan(x) || std::isnan(y) || std::isnan(z);
      if (invalid) {
        x = y = z = 0.0f;
        w = -1.0f;
      }
      std::memcpy(rec + m * 16 + 0, &x, 4);
      std::memcpy(rec + m * 16 + 4, &y, 4);
      std::memcpy(rec + m * 16 + 8, &z, 4);
      std::memcpy(rec + m * 16 + 12, &w, 4);
    }
  }
  return 0;
}

int moshpp_c3d_version() { return 1; }

}  // extern "C"
