// Standalone validation oracle for the reference RNG semantics.
//
// Re-creates the Intel "fast rand" SSE LCG used by the reference
// (win32-raytracer/RayTracer.cpp:31-66, itself derived from Intel's
// Pentium-4 fast-random article) with actual SSE2 intrinsics, and prints
// the first N rand4 vectors.  tests/test_rng.py compares this stream
// against the framework's scalar-lane reformulation (core/rng.py), which
// is the version used for scene-building parity.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <emmintrin.h>

static __m128i g_state;

static void seed_lcg(unsigned int seed) {
  g_state = _mm_set_epi32(seed, seed + 1, seed, seed + 1);
}

static void rand4(float* out) {
  const __m128i adder = _mm_setr_epi32(2531011, 10395331, 13737667, 1);
  __m128i mult = _mm_setr_epi32(214013, 17405, 214013, 69069);
  const __m128i keep_even = _mm_setr_epi32(0xFFFFFFFF, 0, 0xFFFFFFFF, 0);

  __m128i split = _mm_shuffle_epi32(g_state, _MM_SHUFFLE(2, 3, 0, 1));
  g_state = _mm_mul_epu32(g_state, mult);
  mult = _mm_shuffle_epi32(mult, _MM_SHUFFLE(2, 3, 0, 1));
  split = _mm_mul_epu32(split, mult);
  g_state = _mm_and_si128(g_state, keep_even);
  split = _mm_and_si128(split, keep_even);
  split = _mm_shuffle_epi32(split, _MM_SHUFFLE(2, 3, 0, 1));
  g_state = _mm_or_si128(g_state, split);
  g_state = _mm_add_epi32(g_state, adder);

  const __m128 fmax = _mm_cvtepi32_ps(_mm_set1_epi32(INT32_MAX));
  __m128 r = _mm_cvtepi32_ps(g_state);
  r = _mm_div_ps(r, fmax);
  r = _mm_add_ps(r, _mm_set1_ps(1.0f));
  r = _mm_mul_ps(r, _mm_set1_ps(0.5f));
  _mm_storeu_ps(out, r);
}

int main(int argc, char** argv) {
  unsigned seed = argc > 1 ? (unsigned)strtoul(argv[1], nullptr, 10) : 666u;
  int n = argc > 2 ? atoi(argv[2]) : 16;
  seed_lcg(seed);
  float r[4];
  for (int i = 0; i < n; ++i) {
    rand4(r);
    printf("%.9e %.9e %.9e %.9e\n", r[0], r[1], r[2], r[3]);
  }
  return 0;
}
