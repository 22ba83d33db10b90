// Packed sample-format unpackers — native equivalents of the reference's
// custom GR unpack blocks (src/algorithms/signal_source/gnuradio_blocks/
// unpack_2bit_samples.cc, unpack_byte_2bit_cpx_samples.cc, ...) and the
// data-type adapter conversions (ibyte/ishort -> complex float).
// Hot on ingest of multi-GB capture files, hence C++.

#include <cstdint>
#include <cstring>

extern "C" {

// 2-bit sign/magnitude samples packed 4-per-byte -> float {-3,-1,+1,+3}
// (LSB-first pairs: bit0 = sign of sample0? we follow: value = 2*b1+b0,
//  map 0,1,2,3 -> +1,+3,-1,-3 — the reference's sign/mag table)
void unpack_2bit_samples(const uint8_t* in, int64_t n_bytes, float* out) {
  static const float lut[4] = {+1.0f, +3.0f, -1.0f, -3.0f};
  for (int64_t i = 0; i < n_bytes; ++i) {
    const uint8_t b = in[i];
    out[4 * i + 0] = lut[b & 0x3];
    out[4 * i + 1] = lut[(b >> 2) & 0x3];
    out[4 * i + 2] = lut[(b >> 4) & 0x3];
    out[4 * i + 3] = lut[(b >> 6) & 0x3];
  }
}

// interleaved int8 I/Q -> complex64 (float pairs)
void ibyte_to_cfloat(const int8_t* in, int64_t n_complex, float* out) {
  for (int64_t i = 0; i < 2 * n_complex; ++i)
    out[i] = static_cast<float>(in[i]);
}

// interleaved int16 I/Q -> complex64 (float pairs)
void ishort_to_cfloat(const int16_t* in, int64_t n_complex, float* out) {
  for (int64_t i = 0; i < 2 * n_complex; ++i)
    out[i] = static_cast<float>(in[i]);
}

}  // extern "C"
