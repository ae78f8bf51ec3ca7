// VOLK shim for golden-vector generation (no VOLK on this system).
// Implements exactly the functions the reference's CPU DSP lib calls
// (/root/reference/lib/{fft_filter,fir_filter}.cc), with the semantics of
// VOLK's *generic* kernels: serial loops, float accumulation, and
// volk_32f_x2_dot_prod_16i's C truncation cast — the numeric contract the
// golden vectors pin.
#ifndef GOLDEN_VOLK_SHIM_H
#define GOLDEN_VOLK_SHIM_H

#include <cstdlib>
#include <complex>
#include <cstdint>

typedef std::complex<float> lv_32fc_t;

static inline size_t volk_get_alignment() { return 32; }

static inline void* volk_malloc(size_t size, size_t alignment) {
    void* p = nullptr;
    if (posix_memalign(&p, alignment, size ? size : alignment)) return nullptr;
    return p;
}

static inline void volk_free(void* p) { free(p); }

// c[i] = a[i] * b[i]  (complex multiply; generic kernel is a plain loop)
static inline void volk_32fc_x2_multiply_32fc_a(
        std::complex<float>* c, const std::complex<float>* a,
        const std::complex<float>* b, unsigned int n) {
    for (unsigned int i = 0; i < n; i++) c[i] = a[i] * b[i];
}

static inline void volk_32f_x2_dot_prod_32f_a(
        float* result, const float* input, const float* taps,
        unsigned int n) {
    float acc = 0.0f;
    for (unsigned int i = 0; i < n; i++) acc += input[i] * taps[i];
    *result = acc;
}

// float dot product, result narrowed with a C cast (VOLK generic:
// "*result = (int16_t)dotProduct" — truncation toward zero)
static inline void volk_32f_x2_dot_prod_16i_a(
        short* result, const float* input, const float* taps,
        unsigned int n) {
    float acc = 0.0f;
    for (unsigned int i = 0; i < n; i++) acc += input[i] * taps[i];
    *result = (short)acc;
}

static inline void volk_32fc_32f_dot_prod_32fc_a(
        std::complex<float>* result, const std::complex<float>* input,
        const float* taps, unsigned int n) {
    float ar = 0.0f, ai = 0.0f;
    for (unsigned int i = 0; i < n; i++) {
        ar += input[i].real() * taps[i];
        ai += input[i].imag() * taps[i];
    }
    *result = std::complex<float>(ar, ai);
}

static inline void volk_32fc_x2_dot_prod_32fc_a(
        std::complex<float>* result, const std::complex<float>* input,
        const std::complex<float>* taps, unsigned int n) {
    float ar = 0.0f, ai = 0.0f;
    for (unsigned int i = 0; i < n; i++) {
        ar += input[i].real() * taps[i].real()
            - input[i].imag() * taps[i].imag();
        ai += input[i].real() * taps[i].imag()
            + input[i].imag() * taps[i].real();
    }
    *result = std::complex<float>(ar, ai);
}

// int16 input widened to float, complex taps
static inline void volk_16i_32fc_dot_prod_32fc_a(
        std::complex<float>* result, const short* input,
        const std::complex<float>* taps, unsigned int n) {
    float ar = 0.0f, ai = 0.0f;
    for (unsigned int i = 0; i < n; i++) {
        ar += (float)input[i] * taps[i].real();
        ai += (float)input[i] * taps[i].imag();
    }
    *result = std::complex<float>(ar, ai);
}

#endif
