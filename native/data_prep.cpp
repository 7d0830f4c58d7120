// Native training-data preparation: the augmentation + pair-building
// runtime equivalent of the reference's dump_data tool
// (reference src/dump_data.c:46-108 biquad/noise/write_audio,
// :230-280 augmentation schedule).
//
// The feature extraction itself runs batched in JAX; this library covers
// the inherently streaming/sequential host-side work:
//   * random-response biquads, gain ramps, pre-emphasis, dither
//   * mu-law-domain excitation noise
//   * the autoregressive (sig_in, sig_out) pair construction, which feeds
//     back noised excitation through the LPC predictor sample by sample
// All randomness comes from a caller-seeded xorshift128 so datasets are
// reproducible.
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kFrameSize = 160;
constexpr int kLpcOrder = 16;
constexpr float kPreemph = 0.85f;

// xorshift128 PRNG (seedable, deterministic across platforms)
struct Rng {
  uint32_t s[4];
  explicit Rng(uint64_t seed) {
    uint64_t z = seed + 0x9E3779B97F4A7C15ull;
    for (int i = 0; i < 4; i++) {
      z ^= z >> 30; z *= 0xBF58476D1CE4E5B9ull;
      z ^= z >> 27; z *= 0x94D049BB133111EBull;
      z ^= z >> 31;
      s[i] = static_cast<uint32_t>(z >> (8 * i)) | 1u;
    }
  }
  uint32_t next() {
    uint32_t t = s[3];
    uint32_t v = s[0];
    s[3] = s[2]; s[2] = s[1]; s[1] = v;
    t ^= t << 11;
    t ^= t >> 8;
    s[0] = t ^ v ^ (v >> 19);
    return s[0];
  }
  // uniform in [0, 1)
  double uni() { return next() * (1.0 / 4294967296.0); }
};

// mu-law pair matching reference common.h:18-58 (incl. approximate log)
float log2_approx(float x) {
  union { float f; int32_t i; } in;
  in.f = x;
  int integer = (in.i >> 23) - 127;
  in.i -= integer << 23;
  float frac = in.f - 1.5f;
  frac = -0.41445418f +
         frac * (0.95909232f + frac * (-0.33951290f + frac * 0.16541097f));
  return 1 + integer + frac;
}
float log_approx(float x) { return 0.69315f * log2_approx(x); }

int lin2ulaw(float x) {
  float scale = 255.f / 32768.f;
  int s = x >= 0 ? 1 : -1;
  x = std::fabs(x);
  float u = s * (128 * log_approx(1 + scale * x) / 5.5451774445f);
  u = 128 + u;
  if (u < 0) u = 0;
  if (u > 255) u = 255;
  return (int)std::floor(.5 + u);
}

float ulaw2lin(float u) {
  float scale_1 = 32768.f / 255.f;
  u = u - 128.f;
  float s = u >= 0 ? 1.f : -1.f;
  u = std::fabs(u);
  // the reference (common.h:37-45) promotes to DOUBLE here: the `128.`
  // literal makes the whole exp expression double, rounded to float
  // once on return — ops/mulaw.ULAW2LIN_TABLE is built the same way
  return (float)(s * scale_1 *
                 (std::exp((double)u / 128. * 5.5451774445f) - 1));
}

short float2short(float x) {
  int i = (int)std::floor(.5 + x);
  if (i < -32767) i = -32767;
  if (i > 32767) i = 32767;
  return (short)i;
}

// biquad with double-precision accumulators (dump_data.c:46-56)
void biquad(float* y, float mem[2], const float* x, const float* b,
            const float* a, int n) {
  for (int i = 0; i < n; i++) {
    float xi = x[i];
    float yi = x[i] + mem[0];
    mem[0] = mem[1] + (float)(b[0] * (double)xi - a[0] * (double)yi);
    mem[1] = (float)(b[1] * (double)xi - a[1] * (double)yi);
    y[i] = yi;
  }
}

struct AugmentState {
  Rng rng;
  float mem_hp[2] = {0, 0};
  float mem_resp[2] = {0, 0};
  float mem_preemph = 0;
  float a_sig[2] = {0, 0};
  float b_sig[2] = {0, 0};
  float speech_gain = 1.f;
  float old_speech_gain = 1.f;
  float noise_std = 0;
  int gain_change_count = 10000;  // force a draw on first frame
  explicit AugmentState(uint64_t seed) : rng(seed) {}
};

}  // namespace

extern "C" {

void* dp_augment_create(uint64_t seed) { return new AugmentState(seed); }
void dp_augment_destroy(void* st) { delete static_cast<AugmentState*>(st); }

// Standalone DC-blocking high-pass over n samples (dump_data.c:114-115,258)
// for the clean -test/-btest feature path (no augmentation).
void dp_hp_biquad(float* y, const float* x, int n) {
  static const float a_hp[2] = {-1.99599f, 0.99600f};
  static const float b_hp[2] = {-2.f, 1.f};
  float mem[2] = {0.f, 0.f};
  biquad(y, mem, x, b_hp, a_hp, n);
}

// Augment n_frames*160 samples in place: HP biquad + random-response biquad
// + gain ramp + pre-emphasis + dither (dump_data.c:245-272). Also fills
// noise[] with per-sample mu-law-domain noise (compute_noise,
// dump_data.c:69-74). x: float in int16 range.
void dp_augment_frames(void* handle, float* x, int* noise, int n_frames) {
  AugmentState* st = static_cast<AugmentState*>(handle);
  static const float a_hp[2] = {-1.99599f, 0.99600f};
  static const float b_hp[2] = {-2.f, 1.f};
  for (int f = 0; f < n_frames; f++) {
    float* xf = x + f * kFrameSize;
    if (++st->gain_change_count > 2821) {
      st->speech_gain =
          std::pow(10., (-30 + (int)(st->rng.next() % 40)) / 20.);
      if (st->rng.next() & 1) st->speech_gain = -st->speech_gain;
      if (st->rng.next() % 20 == 0) st->speech_gain *= .01f;
      if (st->rng.next() % 100 == 0) st->speech_gain = 0;
      st->gain_change_count = 0;
      st->a_sig[0] = .75f * (float)(st->rng.uni() - .5);
      st->a_sig[1] = .75f * (float)(st->rng.uni() - .5);
      st->b_sig[0] = .75f * (float)(st->rng.uni() - .5);
      st->b_sig[1] = .75f * (float)(st->rng.uni() - .5);
      double t1 = st->rng.uni();
      double t2 = st->rng.uni();
      st->noise_std = std::fabs(-1.5 * std::log(1e-4 + t1) -
                                .5 * std::log(1e-4 + t2));
    }
    biquad(xf, st->mem_hp, xf, b_hp, a_hp, kFrameSize);
    biquad(xf, st->mem_resp, xf, st->b_sig, st->a_sig, kFrameSize);
    for (int i = 0; i < kFrameSize; i++) {
      float fr = (float)i / kFrameSize;
      xf[i] *= fr * st->speech_gain + (1 - fr) * st->old_speech_gain;
    }
    st->old_speech_gain = st->speech_gain;
    // pre-emphasis (lpcnet_enc.c:872-880)
    for (int i = 0; i < kFrameSize; i++) {
      float yi = xf[i] + st->mem_preemph;
      st->mem_preemph = -kPreemph * xf[i];
      xf[i] = yi;
    }
    // dither
    for (int i = 0; i < kFrameSize; i++)
      xf[i] += (float)st->rng.uni() - .5f;
    // excitation noise for this frame (dump_data.c:69-74)
    for (int i = 0; i < kFrameSize; i++) {
      noise[f * kFrameSize + i] = (int)std::floor(
          .5 + st->noise_std * .707f *
                   (log_approx((float)st->rng.uni()) -
                    log_approx((float)st->rng.uni())));
    }
  }
}

// Build interleaved (sig_in, sig_out) int16 pairs with noised-excitation
// feedback (write_audio, dump_data.c:84-108).
//   pcm: n_frames*160 int16 target samples (already delayed/aligned)
//   lpc: n_frames*16 floats (per-frame LPC from the feature extractor)
//   noise: n_frames*160 ints
//   sig_mem: 16 floats carried across calls; exc_mem: 1 int carried
//   out: n_frames*160*2 int16
void dp_build_pairs(const short* pcm, const float* lpc, const int* noise,
                    int n_frames, float* sig_mem, int* exc_mem, short* out) {
  for (int k = 0; k < n_frames; k++) {
    const float* A = lpc + k * kLpcOrder;
    for (int i = 0; i < kFrameSize; i++) {
      float p = 0;
      for (int j = 0; j < kLpcOrder; j++) p -= A[j] * sig_mem[j];
      float e = (float)lin2ulaw(pcm[k * kFrameSize + i] - p);
      out[2 * (k * kFrameSize + i)] = float2short(sig_mem[0]);
      out[2 * (k * kFrameSize + i) + 1] = pcm[k * kFrameSize + i];
      e += noise[k * kFrameSize + i];
      if (e > 255) e = 255;
      if (e < 0) e = 0;
      memmove(sig_mem + 1, sig_mem, (kLpcOrder - 1) * sizeof(float));
      sig_mem[0] = p + ulaw2lin(e);
      *exc_mem = (int)e;
    }
  }
}

}  // extern "C"
