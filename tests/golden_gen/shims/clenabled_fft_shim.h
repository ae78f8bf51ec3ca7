// fft_complex shim for golden-vector generation: stands in for the
// reference's FFTW wrapper (/root/reference/lib/fft.{h,cc} — guard-skipped
// with -D_FFT_FFT_H_ because FFTW3F/boost aren't on this system).
//
// The transform itself is an unscaled iterative radix-2 FFT computed in
// DOUBLE precision with results rounded to float32 — i.e. correctly-rounded
// DFT values, matching FFTW's float32 output to within ~1 ulp.  The golden
// vectors pin the reference's overlap-add STREAMING semantics
// (lib/fft_filter.cc:133-175 sizing / taps pre-scale / tail carry /
// decimating copy-out), not FFTW's last-ulp rounding; parity tests compare
// at fp32 tolerances accordingly.
#ifndef GOLDEN_FFT_SHIM_H
#define GOLDEN_FFT_SHIM_H

#include <algorithm>  // the reference's fir_filter.cc uses std::reverse and
#include <complex>    // fft_filter.cc memcpy without the includes (FFTW /
#include <cmath>      // VOLK headers pulled them in transitively)
#include <cstring>
#include <vector>

#ifndef CLENABLED_API
#define CLENABLED_API
#endif
typedef std::complex<float> gr_complex;

namespace gr {
namespace clenabled {

class fft_complex {
    int d_fft_size;
    bool d_forward;
    std::vector<gr_complex> d_inbuf, d_outbuf;

  public:
    fft_complex(int fft_size, bool forward = true, int /*nthreads*/ = 1)
        : d_fft_size(fft_size), d_forward(forward),
          d_inbuf(fft_size), d_outbuf(fft_size) {}
    virtual ~fft_complex() {}

    gr_complex* get_inbuf() { return d_inbuf.data(); }
    gr_complex* get_outbuf() { return d_outbuf.data(); }
    int inbuf_length() const { return d_fft_size; }
    int outbuf_length() const { return d_fft_size; }
    void set_nthreads(int) {}
    int nthreads() const { return 1; }

    void execute() {
        const int n = d_fft_size;
        std::vector<std::complex<double>> a(n);
        for (int i = 0; i < n; i++)
            a[i] = std::complex<double>(d_inbuf[i].real(), d_inbuf[i].imag());
        // bit-reversal permutation
        for (int i = 1, j = 0; i < n; i++) {
            int bit = n >> 1;
            for (; j & bit; bit >>= 1) j ^= bit;
            j ^= bit;
            if (i < j) std::swap(a[i], a[j]);
        }
        const double sgn = d_forward ? -1.0 : 1.0;  // FFTW sign convention
        for (int len = 2; len <= n; len <<= 1) {
            const double ang = sgn * 2.0 * M_PI / len;
            const std::complex<double> wl(std::cos(ang), std::sin(ang));
            for (int i = 0; i < n; i += len) {
                std::complex<double> w(1.0, 0.0);
                for (int k = 0; k < len / 2; k++) {
                    std::complex<double> u = a[i + k];
                    std::complex<double> v = a[i + k + len / 2] * w;
                    a[i + k] = u + v;
                    a[i + k + len / 2] = u - v;
                    w *= wl;
                }
            }
        }
        for (int i = 0; i < n; i++)
            d_outbuf[i] = gr_complex((float)a[i].real(), (float)a[i].imag());
    }
};

}  // namespace clenabled
}  // namespace gr

#endif
