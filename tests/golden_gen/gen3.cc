// gen3 — golden vectors for the reference's GENERATED (OpenCL kernel-string)
// semantics, transcribed into host loops with citations (round 4, VERDICT r3
// item 1).  Unlike gen/gen2 these paths have no reference C++ to compile —
// the reference builds them as OpenCL source strings at runtime — so each
// section below is a deliberate, cited transcription of the kernel string
// plus the host-side buffer choreography around it.
//
// Conventions (as gen2): DFTs computed in double precision and rounded to
// float32 — the goldens pin indexing/ordering/shift/rotation/accumulation
// SEMANTICS, not FFT last-ulp.  Kernel-side float math uses float32
// accumulation exactly as the kernel strings do.
//
// Build:  g++ -O2 -o gen3 gen3.cc   (self-contained)
// Run:    ./gen3 > ../golden/kernels_golden.json

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

using std::vector;

// ---------------------------------------------------------------- utilities
struct C { float re, im; };

static uint64_t rng_state = 0x243F6A8885A308D3ull;
static double urand() {            // deterministic xorshift64*, (-1, 1)
    rng_state ^= rng_state >> 12;
    rng_state ^= rng_state << 25;
    rng_state ^= rng_state >> 27;
    uint64_t r = rng_state * 0x2545F4914F6CDD1Dull;
    return ((r >> 11) * (1.0 / 9007199254740992.0)) * 2.0 - 1.0;
}
static float frand() { return (float)urand(); }

static void emit_floats(const vector<float>& v) {
    printf("[");
    for (size_t i = 0; i < v.size(); i++)
        printf("%s%.9g", i ? "," : "", v[i]);
    printf("]");
}
static void emit_complex(const vector<C>& v) {   // interleaved re,im
    printf("[");
    for (size_t i = 0; i < v.size(); i++)
        printf("%s%.9g,%.9g", i ? "," : "", v[i].re, v[i].im);
    printf("]");
}

// Unscaled DFT, double precision, rounded to f32.  sign=-1: FORWARD,
// sign=+1: BACKWARD — the reference forces scale 1.0 in BOTH directions
// (clFFT_impl.cc:121-122, clPolyphaseChannelizer_impl.cc:224 BACKWARD 1.0f).
static vector<C> dft(const vector<C>& x, int sign) {
    size_t n = x.size();
    vector<C> out(n);
    for (size_t k = 0; k < n; k++) {
        double sr = 0, si = 0;
        for (size_t j = 0; j < n; j++) {
            double a = sign * 2.0 * M_PI * (double)j * (double)k / (double)n;
            double c = cos(a), s = sin(a);
            sr += x[j].re * c - x[j].im * s;
            si += x[j].re * s + x[j].im * c;
        }
        out[k].re = (float)sr;
        out[k].im = (float)si;
    }
    return out;
}

// ------------------------------------------------------- 1. PFB channelizer
// filterpfb2 + rotation + BACKWARD(scale 1) DFT + channel_map, streaming
// over multiple work() calls (clPolyphaseChannelizer_impl.cc:156-177 kernel
// string; work() choreography :95-108: consume buf_items per call, device
// buffer holds buf_items + ntaps - M items starting ntaps-1 samples back).
//
// NOTE (pinned on purpose): for R < M the kernel's deepest reads on the
// last L-1 = (M-R)/R output groups index past the device buffer
// (in[i*R - k + ntaps - 1] reaches buf_items + ntaps - R - 1, but the
// buffer holds only buf_items + ntaps - M items — an out-of-bounds read in
// the reference).  Those groups are emitted here from the TRUE stream (what
// a correct streaming implementation produces) and the JSON records
// skip_last_groups so parity tests may exclude them.
static void gen_pfb() {
    struct Cfg { int m, r, ntaps, buf_items, ncalls; vector<int> ch_map; };
    vector<Cfg> cfgs = {
        {8, 8, 48, 64, 3, {0,1,2,3,4,5,6,7}},        // critical-sampled
        {8, 4, 40, 64, 3, {0,1,2,3,4,5,6,7}},        // oversampled (rotation)
        {8, 4, 40, 64, 3, {5,2,7}},                  // oversampled + ch_map
    };
    printf("\"pfb\":[");
    for (size_t ci = 0; ci < cfgs.size(); ci++) {
        Cfg& cf = cfgs[ci];
        int M = cf.m, R = cf.r, T = cf.ntaps, B = cf.buf_items;
        vector<float> taps(T);
        for (int i = 0; i < T; i++)
            taps[i] = (float)(0.02 + 0.5 * urand());
        // continuous stream; GR pre-fills history with ntaps-1 ZEROS
        int total = (T - 1) + B * cf.ncalls + M;     // +M lookahead margin
        vector<C> stream(total);
        for (int i = 0; i < T - 1; i++) stream[i] = {0.f, 0.f};
        for (int i = T - 1; i < total; i++) stream[i] = {frand(), frand()};

        int groups = B / R;
        int nch = (int)cf.ch_map.size();
        vector<vector<C>> calls;
        for (int call = 0; call < cf.ncalls; call++) {
            const C* in = &stream[(size_t)call * B];  // ntaps-1 back incl.
            vector<C> filt((size_t)groups * M);
            for (int i = 0; i < groups; i++) {
                for (int j = 0; j < M; j++) {
                    // acc = fma(in[i*R - k + T - 1], taps[k], acc), k=j,+M
                    // (clPolyphaseChannelizer_impl.cc:160-166)
                    float ar = 0.f, ai = 0.f;
                    for (int k = j; k < T; k += M) {
                        const C& v = in[i * R - k + T - 1];
                        ar = fmaf(v.re, taps[k], ar);
                        ai = fmaf(v.im, taps[k], ai);
                    }
                    // rotation store (:167): (j + i*(M-R)) % M
                    filt[(size_t)i * M + (j + i * (M - R)) % M] = {ar, ai};
                }
            }
            // per-group BACKWARD DFT, scale 1.0 (init_clfft :218-228)
            vector<C> ffted((size_t)groups * M);
            for (int i = 0; i < groups; i++) {
                vector<C> g(filt.begin() + (size_t)i * M,
                            filt.begin() + (size_t)(i + 1) * M);
                vector<C> y = dft(g, +1);
                for (int k = 0; k < M; k++) ffted[(size_t)i * M + k] = y[k];
            }
            // channel_map (:169-177): out[i*C + j] = fft[i*M + ch_map[j]]
            vector<C> out((size_t)groups * nch);
            for (int i = 0; i < groups; i++)
                for (int j = 0; j < nch; j++)
                    out[(size_t)i * nch + j] =
                        ffted[(size_t)i * M + cf.ch_map[j]];
            calls.push_back(out);
        }
        printf("%s{\"m\":%d,\"r\":%d,\"ntaps\":%d,\"buf_items\":%d,"
               "\"skip_last_groups\":%d,\"ch_map\":[",
               ci ? "," : "", M, R, T, B, R < M ? (M - R) / R : 0);
        for (size_t j = 0; j < cf.ch_map.size(); j++)
            printf("%s%d", j ? "," : "", cf.ch_map[j]);
        printf("],\"taps\":");
        emit_floats(taps);
        printf(",\"stream\":");
        emit_complex(vector<C>(stream.begin(),
                               stream.begin() + (T - 1) + B * cf.ncalls));
        printf(",\"calls\":[");
        for (size_t k = 0; k < calls.size(); k++) {
            printf("%s", k ? "," : "");
            emit_complex(calls[k]);
        }
        printf("]}");
    }
    printf("]");
}

// ----------------------------------------------------------------- 2. clFFT
// The three output-assembly cases + window (clFFT_impl.cc:544-630; plan:
// both scales forced 1.0 :121-122; REAL input -> HERMITIAN_INTERLEAVED
// :114).  Cases: (a) complex FORWARD + shift: halves swapped AFTER
// (:594-605, vlen_2 = N/2); (b) complex BACKWARD + shift: halves swapped at
// LOAD (:549-553); (c) float FORWARD: hermitian half + conjugate mirror
// out[N/2+j] = conj(X[N/2-j]) for j>=1 (:607-630) — out[N/2] reads an
// uninitialized tmp element in the reference and is NOT pinned (the JSON
// stores 0 there and "hermitian_mid_unspecified": true); (d) window:
// element-wise multiply before the transform (:566-580).
static void gen_clfft() {
    int n = 16, v2 = n / 2;
    printf("\"clfft\":[");

    vector<C> x(n);
    for (int i = 0; i < n; i++) x[i] = {frand(), frand()};
    {   // (a) forward complex + shift
        vector<C> y = dft(x, -1), out(n);
        for (int i = 0; i < n - v2; i++) out[i] = y[v2 + i];
        for (int i = 0; i < v2; i++) out[n - v2 + i] = y[i];
        printf("{\"case\":\"fwd_shift\",\"n\":%d,\"input\":", n);
        emit_complex(x); printf(",\"output\":"); emit_complex(out); printf("}");
    }
    {   // (b) backward complex + shift (shift on load)
        vector<C> xin(n);
        for (int i = 0; i < v2; i++) xin[i] = x[v2 + i];
        for (int i = 0; i < v2; i++) xin[v2 + i] = x[i];
        vector<C> out = dft(xin, +1);
        printf(",{\"case\":\"rev_shift\",\"n\":%d,\"input\":", n);
        emit_complex(x); printf(",\"output\":"); emit_complex(out); printf("}");
    }
    {   // (c) float input forward (hermitian mirror)
        vector<float> xf(n);
        for (int i = 0; i < n; i++) xf[i] = frand();
        vector<C> xc(n);
        for (int i = 0; i < n; i++) xc[i] = {xf[i], 0.f};
        vector<C> y = dft(xc, -1), out(n);
        for (int i = 0; i < v2; i++) out[i] = y[i];
        out[v2] = {0.f, 0.f};                       // unspecified in ref
        for (int j = 1; j < v2; j++)
            out[v2 + j] = {y[v2 - j].re, -y[v2 - j].im};
        printf(",{\"case\":\"float_fwd\",\"n\":%d,"
               "\"hermitian_mid_unspecified\":true,\"input\":", n);
        emit_floats(xf); printf(",\"output\":"); emit_complex(out); printf("}");
    }
    {   // (d) forward complex + Blackman-Harris-ish window, no shift
        vector<float> w(n);
        for (int i = 0; i < n; i++)
            w[i] = (float)(0.35875 - 0.48829 * cos(2 * M_PI * i / (n - 1))
                           + 0.14128 * cos(4 * M_PI * i / (n - 1))
                           - 0.01168 * cos(6 * M_PI * i / (n - 1)));
        vector<C> xw(n);
        for (int i = 0; i < n; i++) xw[i] = {x[i].re * w[i], x[i].im * w[i]};
        vector<C> out = dft(xw, -1);
        printf(",{\"case\":\"fwd_window\",\"n\":%d,\"window\":", n);
        emit_floats(w); printf(",\"input\":"); emit_complex(x);
        printf(",\"output\":"); emit_complex(out); printf("}");
    }
    printf("]");
}

// ----------------------------------------------- 3. TD xcorr lag scan + max
// XCorrelate kernel (clXCorrelate_impl.cc:843-903): normalized lag scan
// over g in [0, 2*max_shift) with ref_start = |g - max_shift|; window
// energies from the squared-mag buffers; denom==0 -> -2.  Mag pre-pass:
// sqrt(re^2+im^2) f32 (:934-960 ComplexToMag), xx/yy = mag^2.  find_max
// (:1011-1068) is a plain max reduction -> argmax (strict >, first-wins on
// exact ties).
static void gen_td_xcorr() {
    int L = 64, max_shift = 8;
    vector<C> ref(L), sig(L);
    for (int i = 0; i < L; i++) ref[i] = {frand(), frand()};
    for (int i = 0; i < L; i++) {
        int j = i - 3;                              // a real lag to find
        sig[i] = (j >= 0 && j < L) ? C{ref[j].re * 0.9f, ref[j].im * 0.9f}
                                   : C{frand() * 0.1f, frand() * 0.1f};
    }
    vector<float> rm(L), sm(L), xx(L), yy(L);
    for (int i = 0; i < L; i++) {
        rm[i] = sqrtf(ref[i].re * ref[i].re + ref[i].im * ref[i].im);
        sm[i] = sqrtf(sig[i].re * sig[i].re + sig[i].im * sig[i].im);
        xx[i] = rm[i] * rm[i];
        yy[i] = sm[i] * sm[i];
    }
    vector<float> corr(2 * max_shift);
    for (int g = 0; g < 2 * max_shift; g++) {
        int shift = g - max_shift;
        int rs = shift >= 0 ? shift : -shift;
        int len = L - rs;
        float sxy = 0, sx2 = 0, sy2 = 0;
        if (shift > 0) {
            for (int i = 0; i < len; i++) {
                sxy += rm[rs + i] * sm[i];
                sx2 += xx[rs + i];
                sy2 += yy[i];
            }
        } else {
            for (int i = 0; i < len; i++) {
                sxy += rm[i] * sm[rs + i];
                sx2 += xx[i];
                sy2 += yy[rs + i];
            }
        }
        float denom = sx2 * sy2;
        corr[g] = denom != 0.f ? sxy / sqrtf(denom) : -2.0f;
    }
    int best = 0;
    for (int g = 1; g < 2 * max_shift; g++)
        if (corr[g] > corr[best]) best = g;
    printf("\"td_xcorr\":{\"signal_length\":%d,\"max_shift\":%d,\"ref\":",
           L, max_shift);
    emit_complex(ref);
    printf(",\"sig\":");
    emit_complex(sig);
    printf(",\"corr\":");
    emit_floats(corr);
    printf(",\"max_index\":%d}", best);
}

// -------------------------------------------------- 4. FD xcorr (fft_vcf)
// MultConj stores ref*conj(sig) (clxcorrelate_fft_vcf_impl.cc:886-910),
// BACKWARD unscaled FFT, mag sqrt(r^2+i^2) (:913-937), halves swapped into
// the output (:1131-1141); input_type=2 forward-FFTs both inputs first
// (:1079-1100).
static void gen_fd_xcorr() {
    int n = 16, v2 = n / 2;
    vector<C> ref(n), sig(n);
    for (int i = 0; i < n; i++) ref[i] = {frand(), frand()};
    for (int i = 0; i < n; i++) sig[i] = {frand(), frand()};
    printf("\"fd_xcorr\":[");
    for (int fft_first = 0; fft_first < 2; fft_first++) {
        vector<C> a = ref, b = sig;
        if (fft_first) { a = dft(a, -1); b = dft(b, -1); }
        vector<C> prod(n);
        for (int i = 0; i < n; i++) {
            float br = b[i].re, bi = -b[i].im;      // conj flip (:903)
            prod[i] = {a[i].re * br - a[i].im * bi,
                       a[i].re * bi + a[i].im * br};
        }
        vector<C> z = dft(prod, +1);
        vector<float> mag(n), out(n);
        for (int i = 0; i < n; i++)
            mag[i] = sqrtf(z[i].re * z[i].re + z[i].im * z[i].im);
        for (int i = 0; i < v2; i++) out[i] = mag[v2 + i];
        for (int i = 0; i < v2; i++) out[v2 + i] = mag[i];
        printf("%s{\"n\":%d,\"fft_first\":%s,\"ref\":", fft_first ? "," : "",
               n, fft_first ? "true" : "false");
        emit_complex(ref);
        printf(",\"sig\":");
        emit_complex(sig);
        printf(",\"output\":");
        emit_floats(out);
        printf("}");
    }
    printf("]");
}

// --------------------------------------- 5. X-Engine cxmac + char decodes
// XCorrelate kernel (clXEngine_impl.cc:727-790, [t][station][freq][pol]
// index form :765-767): per (f, baseline k) station1 = floor(-0.5 +
// sqrt(0.25 + 2k)), station2 = k - (station1+1)*station1/2; cxmac accum +=
// z0*conj(z1) (:727-736); outputs [f][baseline][XX,XY,YX,YY] (:789-805);
// pipeline_integration accumulates += across calls (:791-800).
// CharToComplex (:831-858): IChar mode c = a/127 pairs; PACKEDXY mode
// uchar2 per (t,a,f) holding X,Y bytes, hi nibble real / lo nibble imag
// through twosComplementLUT {0..7, 0,-7,-6,...,-1} scaled 1/7 — note 0x8
// decodes to 0, NOT -8.
static void gen_xengine() {
    static const int LUT[16] = {0, 1, 2, 3, 4, 5, 6, 7, 0, -7, -6, -5,
                                -4, -3, -2, -1};
    int A = 3, P = 2, F = 2, T = 4, NCALLS = 2;
    int nb = A * (A + 1) / 2;
    int frame = A * F * P;
    printf("\"xengine\":[");
    for (int mode = 0; mode < 2; mode++) {          // 0=ichar, 1=packed4
        // raw bytes per call
        vector<vector<int>> calls_bytes;
        vector<vector<float>> calls_out;
        // interleaved re,im per [f][baseline][XX,XY,YX,YY]
        vector<float> accum((size_t)F * nb * 4 * 2, 0.f);
        for (int call = 0; call < NCALLS; call++) {
            int nbytes = mode == 0 ? T * frame * 2 : T * A * F * 2;
            vector<int> bytes(nbytes);
            for (int i = 0; i < nbytes; i++)
                bytes[i] = (int)(rng_state = rng_state * 6364136223846793005ull
                                 + 1442695040888963407ull, (rng_state >> 33) & 0xFF);
            // decode to the [t][station][freq][pol] complex matrix
            vector<C> mat((size_t)T * frame);
            if (mode == 0) {
                // IChar: consecutive signed char pairs, scale 1/127 (:852-857)
                for (size_t i = 0; i < mat.size(); i++) {
                    int8_t r = (int8_t)bytes[2 * i], m = (int8_t)bytes[2 * i + 1];
                    mat[i] = {(float)r * (1.0f / 127.0f),
                              (float)m * (1.0f / 127.0f)};
                }
            } else {
                // PACKEDXY: uchar2 per (t, station, freq): X byte then Y
                // byte, hi nibble real / lo imag via LUT, scale 1/7
                // (:836-850); npol=2 required
                for (int t = 0; t < T; t++)
                    for (int a = 0; a < A; a++)
                        for (int f = 0; f < F; f++) {
                            int base = 2 * ((t * A + a) * F + f);
                            for (int p = 0; p < 2; p++) {
                                int by = bytes[base + p];
                                size_t mi = ((size_t)t * A + a) * F * P
                                            + (size_t)f * P + p;
                                mat[mi] = {
                                    (float)LUT[(by >> 4) & 0xF] / 7.0f,
                                    (float)LUT[by & 0xF] / 7.0f};
                            }
                        }
            }
            // cxmac integration
            for (int f = 0; f < F; f++)
                for (int k = 0; k < nb; k++) {
                    int s1 = (int)(-0.5 + sqrt(0.25 + 2.0 * k));
                    int s2 = k - ((s1 + 1) * s1) / 2;
                    float acc[8] = {0};
                    for (int t = 0; t < T; t++) {
                        size_t i1 = (size_t)t * frame + ((size_t)s1 * F + f) * P;
                        size_t i2 = (size_t)t * frame + ((size_t)s2 * F + f) * P;
                        const C zr[2] = {mat[i1], mat[i1 + 1]};
                        const C zc[2] = {mat[i2], mat[i2 + 1]};
                        const int prod[4][2] = {{0, 0}, {0, 1}, {1, 0}, {1, 1}};
                        for (int q = 0; q < 4; q++) {
                            const C& z0 = zr[prod[q][0]];
                            const C& z1 = zc[prod[q][1]];
                            acc[2 * q] += z0.re * z1.re + z0.im * z1.im;
                            acc[2 * q + 1] += z0.im * z1.re - z0.re * z1.im;
                        }
                    }
                    // accumulate across calls (pipeline_integration > 1
                    // uses '+=', clXEngine_impl.cc:791-800)
                    for (int q = 0; q < 4; q++) {
                        size_t oi = (((size_t)f * nb + k) * 4 + q) * 2;
                        accum[oi] += acc[2 * q];
                        accum[oi + 1] += acc[2 * q + 1];
                    }
                }
            calls_bytes.push_back(bytes);
            calls_out.push_back(accum);             // snapshot after call
        }
        printf("%s{\"mode\":\"%s\",\"num_inputs\":%d,\"npol\":%d,"
               "\"num_channels\":%d,\"integration_time\":%d,\"calls\":[",
               mode ? "," : "", mode ? "packed4" : "ichar", A, P, F, T);
        for (int call = 0; call < NCALLS; call++) {
            printf("%s{\"bytes\":[", call ? "," : "");
            for (size_t i = 0; i < calls_bytes[call].size(); i++)
                printf("%s%d", i ? "," : "", calls_bytes[call][i]);
            printf("],\"accum\":");
            emit_floats(calls_out[call]);
            printf("}");
        }
        printf("]}");
    }
    printf("]");
}

int main() {
    printf("{");
    gen_pfb();
    printf(",");
    gen_clfft();
    printf(",");
    gen_td_xcorr();
    printf(",");
    gen_fd_xcorr();
    printf(",");
    gen_xengine();
    printf("}\n");
    return 0;
}
