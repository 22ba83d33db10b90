// Viterbi decoder, K=7 rate-1/2 (G1=0171, G2=0133 octal) — the
// convolutional code shared by Galileo I/NAV, F/NAV, C/NAV and GPS CNAV.
// Native-path equivalent of the reference's viterbi_decoder.cc (Galileo)
// and libswiftcnav viterbi27 (src/algorithms/telemetry_decoder/libs/):
// block decoder with full traceback, soft-decision float inputs.
//
// Built as a plain C ABI shared library; Python binds via ctypes
// (gnss_sim_receiver_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int K = 7;
constexpr int NSTATES = 1 << (K - 1);  // 64

// branch output bits for (state, input) under G1/G2 (computed at init)
struct Tables {
  uint8_t out[NSTATES][2][2];  // [state][input] -> (g1, g2)
  Tables() {
    const uint32_t g1 = 0171, g2 = 0133;  // octal, MSB = newest bit
    for (int s = 0; s < NSTATES; ++s) {
      for (int in = 0; in < 2; ++in) {
        uint32_t reg = (in << (K - 1)) | s;  // newest bit on top of state
        out[s][in][0] = __builtin_parity(reg & g1);
        out[s][in][1] = __builtin_parity(reg & g2);
      }
    }
  }
};
const Tables kTables;
}  // namespace

extern "C" {

// sym: 2*n_bits soft symbols (positive ~ bit 1, e.g. correlator outputs);
// bits_out: n_bits hard decisions. Terminated or truncated blocks both
// work (traceback from best end state). Returns best path metric.
float viterbi27_decode(const float* sym, int n_bits, uint8_t* bits_out) {
  std::vector<float> pm(NSTATES, -1e30f);
  std::vector<float> pm_next(NSTATES);
  std::vector<uint8_t> decisions(static_cast<size_t>(n_bits) * NSTATES);
  pm[0] = 0.0f;

  for (int t = 0; t < n_bits; ++t) {
    const float s0 = sym[2 * t];
    const float s1 = sym[2 * t + 1];
    for (int ns = 0; ns < NSTATES; ++ns) pm_next[ns] = -1e30f;
    uint8_t* dec = &decisions[static_cast<size_t>(t) * NSTATES];
    for (int s = 0; s < NSTATES; ++s) {
      const float m = pm[s];
      if (m <= -1e29f) continue;
      for (int in = 0; in < 2; ++in) {
        const int ns = ((in << (K - 1)) | s) >> 1;
        const float b0 = kTables.out[s][in][0] ? s0 : -s0;
        const float b1 = kTables.out[s][in][1] ? s1 : -s1;
        const float nm = m + b0 + b1;
        if (nm > pm_next[ns]) {
          pm_next[ns] = nm;
          // remember the OLD state's low bit + input to walk back
          dec[ns] = static_cast<uint8_t>((s & 1) | (in << 1));
        }
      }
    }
    pm.swap(pm_next);
  }

  // best end state
  int best = 0;
  for (int s = 1; s < NSTATES; ++s)
    if (pm[s] > pm[best]) best = s;

  // traceback
  int state = best;
  for (int t = n_bits - 1; t >= 0; --t) {
    const uint8_t d = decisions[static_cast<size_t>(t) * NSTATES + state];
    bits_out[t] = (d >> 1) & 1;
    state = ((state << 1) | (d & 1)) & (NSTATES - 1);
  }
  return pm[best];
}

// Convolutionally encode (for tests/simulator): bits in -> 2*n symbols
// {0,1}. Encoder starts in state 0.
void conv27_encode(const uint8_t* bits, int n_bits, uint8_t* sym_out) {
  uint32_t state = 0;
  for (int t = 0; t < n_bits; ++t) {
    const int in = bits[t] & 1;
    sym_out[2 * t] = kTables.out[state][in][0];
    sym_out[2 * t + 1] = kTables.out[state][in][1];
    state = ((in << (K - 1)) | state) >> 1;
  }
}

}  // extern "C"
