// Golden-vector generator: runs the reference's CPU firdes/window designers
// and dumps JSON. Links against the read-only reference sources (not copied).
#include "firdes.h"
#include "window.h"
#include <cstdio>
#include <vector>
#include <string>
using namespace gr::clenabled;

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
int main() {
    printf("{\n");
    dump("window_hamming_53", window::build(window::WIN_HAMMING, 53, 0));
    dump("window_hann_64", window::build(window::WIN_HANN, 64, 0));
    dump("window_blackman_47", window::build(window::WIN_BLACKMAN, 47, 0));
    dump("window_blackman_harris_128", window::build(window::WIN_BLACKMAN_hARRIS, 128, 0));
    dump("window_kaiser_65_b7.5", window::build(window::WIN_KAISER, 65, 7.5));
    dump("window_bartlett_33", window::build(window::WIN_BARTLETT, 33, 0));
    dump("window_flattop_50", window::build(window::WIN_FLATTOP, 50, 0));
    dump("window_rect_17", window::build(window::WIN_RECTANGULAR, 17, 0));
    dump("lp_g1_fs1M_c100k_t50k_hamming", firdes::low_pass(1.0, 1e6, 100e3, 50e3, firdes::WIN_HAMMING, 6.76));
    dump("lp2_g2_fs1M_c150k_t40k_70db_blackman", firdes::low_pass_2(2.0, 1e6, 150e3, 40e3, 70.0, firdes::WIN_BLACKMAN, 6.76));
    dump("hp_g1_fs1M_c200k_t60k_hann", firdes::high_pass(1.0, 1e6, 200e3, 60e3, firdes::WIN_HANN, 6.76));
    dump("hp2_g1_fs2M_c300k_t80k_60db_kaiser", firdes::high_pass_2(1.0, 2e6, 300e3, 80e3, 60.0, firdes::WIN_KAISER, 6.76));
    dump("bp_g1_fs1M_l100k_h200k_t50k_hamming", firdes::band_pass(1.0, 1e6, 100e3, 200e3, 50e3, firdes::WIN_HAMMING, 6.76));
    dump("bp2_g1_fs1M_l50k_h250k_t40k_70db_bh", firdes::band_pass_2(1.0, 1e6, 50e3, 250e3, 40e3, 70.0, firdes::WIN_BLACKMAN_hARRIS, 6.76));
    dumpc("cbp_g1_fs1M_ln100k_h200k_t50k_hamming", firdes::complex_band_pass(1.0, 1e6, -100e3, 200e3, 50e3, firdes::WIN_HAMMING, 6.76));
    dumpc("cbp2_g1_fs1M_l10k_h90k_t30k_60db_hann", firdes::complex_band_pass_2(1.0, 1e6, 10e3, 90e3, 30e3, 60.0, firdes::WIN_HANN, 6.76));
    dump("br_g1_fs1M_l100k_h200k_t50k_hamming", firdes::band_reject(1.0, 1e6, 100e3, 200e3, 50e3, firdes::WIN_HAMMING, 6.76));
    dump("br2_g1_fs1M_l80k_h220k_t45k_60db_hann", firdes::band_reject_2(1.0, 1e6, 80e3, 220e3, 45e3, 60.0, firdes::WIN_HANN, 6.76));
    dump("hilbert_19_hamming", firdes::hilbert(19, firdes::WIN_HAMMING, 6.76));
    dump("rrc_g1_fs1M_sym250k_a035_41", firdes::root_raised_cosine(1.0, 1e6, 250e3, 0.35, 41));
    dump("rrc_241_g1_fs10M_sym1M_a022", firdes::root_raised_cosine(1.0, 10e6, 1e6, 0.22, 241));
    dump("gaussian_g1_spb4_bt035_32", firdes::gaussian(1.0, 4.0, 0.35, 32));
    printf("\"_end\": []\n}\n");
    return 0;
}
