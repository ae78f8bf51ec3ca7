// Golden-vector generator #2 (round 3): streaming/numeric semantics the
// reference self-tests with dual CPU paths (VERDICT r2 item 4).
//
// Compiles the REFERENCE's own C++ for:
//   * fft_filter_ccf overlap-add streaming (multi-call tail carry,
//     decimation counter carry) — /root/reference/lib/fft_filter.cc:133-175
//   * fir_filter scc / fsf short-dtype rounding —
//     /root/reference/lib/fir_filter.cc (volk generic-kernel semantics via
//     shims/volk/volk.h; (int16_t) truncation cast for fsf)
//   * fast_atan2f LUT quad-demod — /root/reference/lib/fast_atan2f.cc
//     (quantifies the LUT-vs-libm-atan2 delta)
// and transcribes (with citation) the Costas-loop recurrence exactly as the
// reference bakes it into its OpenCL kernel string — the float32 non-FMA
// variant of /root/reference/lib/clCostasLoop_impl.cc:236-312, with
// d_alpha/d_beta from GR control_loop's critically-damped formula (the
// values the reference bakes as #defines at :135-137).
//
// Build/run: see README.md in this directory.
#include "firdes.h"
#include "fft_filter.h"
#include "fir_filter.h"
#include <cstdio>
#include <cmath>
#include <cstdint>
#include <vector>

using namespace gr::clenabled;

namespace gr { namespace clenabled { float fast_atan2f(float y, float x); } }

// ---- deterministic input streams (LCG mirrored by the Python tests) ----
static uint32_t lcg_state = 12345u;
static float lcg() {  // uniform in [-1, 1)
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)((double)lcg_state / 2147483648.0 - 1.0);
}
static void lcg_reset(uint32_t seed) { lcg_state = seed; }

static void dump(const char* name, const std::vector<float>& v) {
    printf("\"%s\": [", name);
    for (size_t i = 0; i < v.size(); i++) printf("%s%.9e", i ? "," : "", v[i]);
    printf("],\n");
}
static void dumpc(const char* name, const std::vector<gr_complex>& v) {
    printf("\"%s\": [", name);
    for (size_t i = 0; i < v.size(); i++)
        printf("%s[%.9e,%.9e]", i ? "," : "", v[i].real(), v[i].imag());
    printf("],\n");
}
static void dumps(const char* name, const std::vector<short>& v) {
    printf("\"%s\": [", name);
    for (size_t i = 0; i < v.size(); i++) printf("%s%d", i ? "," : "", (int)v[i]);
    printf("],\n");
}
static void dumpi(const char* name, long v) { printf("\"%s\": %ld,\n", name, v); }

// ---- fft_filter_ccf streaming (3 calls, tail carried between them) ----
static void gen_fft_filter(const char* tag, int decimation,
                           const std::vector<float>& taps, int ncalls,
                           int chunks_per_call) {
    fft_filter_ccf f(decimation, taps);
    int nsamples = f.set_taps(taps);  // also what the ctor computed
    char name[128];
    snprintf(name, sizeof name, "fftfilt_%s_nsamples", tag);
    dumpi(name, nsamples);
    snprintf(name, sizeof name, "fftfilt_%s_fftsize", tag);
    dumpi(name, f.d_fftsize);
    lcg_reset(777);
    for (int c = 0; c < ncalls; c++) {
        int nitems = chunks_per_call * nsamples / decimation;
        int nin = nitems * decimation;
        std::vector<gr_complex> in(nin), out(nitems);
        for (int i = 0; i < nin; i++) { float re = lcg(); in[i] = gr_complex(re, lcg()); }
        f.filter(nitems, in.data(), out.data());
        snprintf(name, sizeof name, "fftfilt_%s_call%d_in", tag, c);
        dumpc(name, in);
        snprintf(name, sizeof name, "fftfilt_%s_call%d_out", tag, c);
        dumpc(name, out);
    }
}

// ---- Costas loop trajectory: f32 non-FMA kernel recurrence -----------
// (clCostasLoop_impl.cc:236-312; alpha/beta per GR control_loop:
//  damping = sqrt(2)/2, denom = 1 + 2*d*bw + bw^2,
//  alpha = 4*d*bw/denom, beta = 4*bw^2/denom; max/min freq = ±1.0 :136-140)
static void gen_costas(const char* tag, int order, float loop_bw, int n) {
    const double damping = std::sqrt(2.0) / 2.0;
    const double denom = 1.0 + 2.0 * damping * loop_bw
                         + (double)loop_bw * loop_bw;
    const float d_alpha = (float)(4.0 * damping * loop_bw / denom);
    const float d_beta = (float)(4.0 * (double)loop_bw * loop_bw / denom);
    const float TWO_PI = 6.28318530717958647692f;
    float l_phase = 0.0f, l_freq = 0.0f, l_error = 0.0f;
    // input: PSK-ish stream with a real frequency offset + LCG noise, so
    // the trajectory covers acquisition AND locked behavior
    lcg_reset(999 + order);
    std::vector<gr_complex> in(n), out(n);
    double sym_phase = 0.0, carrier = 0.0;
    const double w = 0.002 * TWO_PI;  // offset the loop must acquire
    for (int i = 0; i < n; i++) {
        if (i % 8 == 0)  // new symbol every 8 samples
            sym_phase = (order == 2)
                ? (lcg() > 0 ? 0.0 : M_PI)
                : (M_PI / 4.0 + M_PI / 2.0 * (int)((lcg() * 0.5 + 0.5) * 4));
        carrier += w;
        double ph = sym_phase + carrier;
        in[i] = gr_complex((float)(std::cos(ph) + 0.02 * lcg()),
                           (float)(std::sin(ph) + 0.02 * lcg()));
    }
    for (int i = 0; i < n; i++) {
        float n_i = std::sin(-l_phase);
        float n_r = std::cos(-l_phase);
        float i_r = in[i].real(), i_i = in[i].imag();
        float o_r = (i_r * n_r) - (i_i * n_i);
        float o_i = (i_r * n_i) + (i_i * n_r);
        out[i] = gr_complex(o_r, o_i);
        if (order == 2)
            l_error = o_r * o_i;
        else
            l_error = (o_r > 0 ? 1.0f : -1.0f) * o_i
                      - (o_i > 0 ? 1.0f : -1.0f) * o_r;
        l_error = 0.5f * (std::fabs(l_error + 1) - std::fabs(l_error - 1));
        l_freq = l_freq + d_beta * l_error;
        l_phase = l_phase + l_freq + d_alpha * l_error;
        if ((l_phase > TWO_PI) || (l_phase < -TWO_PI)) {
            l_phase = l_phase / TWO_PI - (float)((int)(l_phase / TWO_PI));
            l_phase = l_phase * TWO_PI;
        }
        if (l_freq > 1.0f) l_freq = 1.0f;
        else if (l_freq < -1.0f) l_freq = -1.0f;
    }
    char name[128];
    snprintf(name, sizeof name, "costas_%s_in", tag);
    dumpc(name, in);
    snprintf(name, sizeof name, "costas_%s_out", tag);
    dumpc(name, out);
    snprintf(name, sizeof name, "costas_%s_final", tag);
    dump(name, {l_phase, l_freq, l_error});
}

// ---- quadrature demod: fast_atan2f (CPU ref) vs libm atan2 (kernel) ---
static void gen_qdemod(float gain, int n) {
    lcg_reset(4242);
    std::vector<gr_complex> in(n + 1);
    for (int i = 0; i <= n; i++) { float re = lcg(); in[i] = gr_complex(re, lcg()); }
    std::vector<float> out_fast(n), out_libm(n);
    for (int i = 0; i < n; i++) {
        // the f32 non-FMA kernel product (clQuadratureDemod_impl.cc:151-176)
        float a_r = in[i + 1].real(), a_i = in[i + 1].imag();
        float b_r = in[i].real(), b_i = -1.0f * in[i].imag();
        float mr = (a_r * b_r) - (a_i * b_i);
        float mi = (a_r * b_i) + (a_i * b_r);
        out_fast[i] = gain * gr::clenabled::fast_atan2f(mi, mr);
        out_libm[i] = (float)(gain * std::atan2(mi, mr));
    }
    dumpc("qdemod_in", in);
    dump("qdemod_fast_atan2f", out_fast);
    dump("qdemod_libm_atan2", out_libm);
}

// ---- fir scc / fsf ----------------------------------------------------
static void gen_fir_short(const std::vector<gr_complex>& ctaps,
                          const std::vector<float>& ftaps, int n) {
    // scc: int16 input, complex taps, complex out
    {
        fir_filter_scc f(1, ctaps);
        int ntaps = (int)ctaps.size();
        lcg_reset(31337);
        std::vector<short> in(n + ntaps - 1);
        for (size_t i = 0; i < in.size(); i++)
            in[i] = (short)(lcg() * 2047.0f);
        std::vector<gr_complex> out(n);
        f.filterN(out.data(), in.data(), n);
        dumps("fir_scc_in", in);
        dumpc("fir_scc_out", out);
    }
    // fsf: float input, float taps, int16 out (truncation cast)
    {
        fir_filter_fsf f(1, ftaps);
        int ntaps = (int)ftaps.size();
        lcg_reset(2718);
        std::vector<float> in(2 * n + ntaps - 1);
        for (size_t i = 0; i < in.size(); i++) in[i] = lcg() * 300.0f;
        std::vector<short> out(n), outdec(n);
        f.filterN(out.data(), in.data(), n);
        f.filterNdec(outdec.data(), in.data(), n, 2);
        dump("fir_fsf_in", in);
        dumps("fir_fsf_out", out);
        dumps("fir_fsf_outdec2", outdec);
    }
}

// ---- remaining FIR variants (fff / ccf / fcc / ccc) -------------------
static void gen_fir_float(const std::vector<float>& ftaps,
                          const std::vector<gr_complex>& ctaps, int n) {
    int nf = (int)ftaps.size(), nc = (int)ctaps.size();
    {
        fir_filter_fff f(1, ftaps);
        lcg_reset(111);
        std::vector<float> in(n + nf - 1);
        for (auto& v : in) v = lcg();
        std::vector<float> out(n);
        f.filterN(out.data(), in.data(), n);
        dump("fir_fff_in", in);
        dump("fir_fff_out", out);
    }
    {
        fir_filter_ccf f(2, ftaps);
        lcg_reset(222);
        std::vector<gr_complex> in(2 * n + nf - 1), out(n);
        for (auto& v : in) { float re = lcg(); v = gr_complex(re, lcg()); }
        f.filterNdec(out.data(), in.data(), n, 2);
        dumpc("fir_ccf_in", in);
        dumpc("fir_ccf_outdec2", out);
    }
    {
        fir_filter_fcc f(1, ctaps);
        lcg_reset(333);
        std::vector<float> in(n + nc - 1);
        for (auto& v : in) v = lcg();
        std::vector<gr_complex> out(n);
        f.filterN(out.data(), in.data(), n);
        dump("fir_fcc_in", in);
        dumpc("fir_fcc_out", out);
    }
    {
        fir_filter_ccc f(1, ctaps);
        lcg_reset(444);
        std::vector<gr_complex> in(n + nc - 1), out(n);
        for (auto& v : in) { float re = lcg(); v = gr_complex(re, lcg()); }
        f.filterN(out.data(), in.data(), n);
        dumpc("fir_ccc_in", in);
        dumpc("fir_ccc_out", out);
    }
}

int main() {
    printf("{\n");
    std::vector<float> lp = firdes::low_pass(1.0, 1e6, 100e3, 50e3);
    dumpi("fftfilt_lp_ntaps", (long)lp.size());
    gen_fft_filter("d1", 1, lp, 3, 2);   // decim 1, 3 calls × 2 OFA chunks
    gen_fft_filter("d2", 2, lp, 3, 2);   // decim 2 exercises dec_ctr carry
    gen_costas("o2", 2, 0.0628318f, 512);
    gen_costas("o4", 4, 0.0628318f, 512);
    gen_qdemod(2.5f, 256);
    std::vector<gr_complex> ctaps = firdes::complex_band_pass(
        1.0, 1e6, -100e3, 200e3, 50e3, firdes::WIN_HAMMING, 6.76);
    gen_fir_short(ctaps, lp, 128);
    gen_fir_float(lp, ctaps, 128);
    printf("\"_end\": []\n}\n");
    return 0;
}
