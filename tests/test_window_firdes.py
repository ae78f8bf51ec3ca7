"""Parity tests: window & firdes vs golden vectors from the reference's own
CPU implementations (see tests/golden_gen/README.md)."""

import json
import os

import numpy as np
import pytest

from clenabled_tpu.dsp import firdes, window

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "firdes_golden.json"))
)


def golden(name):
    return np.asarray(GOLDEN[name], dtype=np.float32)


def golden_c(name):
    a = np.asarray(GOLDEN[name], dtype=np.float32)
    return (a[:, 0] + 1j * a[:, 1]).astype(np.complex64)


WINDOW_CASES = [
    ("window_hamming_53", lambda: window.hamming(53)),
    ("window_hann_64", lambda: window.hann(64)),
    ("window_blackman_47", lambda: window.blackman(47)),
    ("window_blackman_harris_128", lambda: window.blackman_harris(128)),
    ("window_kaiser_65_b7.5", lambda: window.kaiser(65, 7.5)),
    ("window_bartlett_33", lambda: window.bartlett(33)),
    ("window_flattop_50", lambda: window.flattop(50)),
    ("window_rect_17", lambda: window.rectangular(17)),
]


@pytest.mark.parametrize("name,fn", WINDOW_CASES, ids=[c[0] for c in WINDOW_CASES])
def test_window_parity(name, fn):
    np.testing.assert_allclose(fn(), golden(name), rtol=2e-5, atol=2e-6)


FIRDES_CASES = [
    ("lp_g1_fs1M_c100k_t50k_hamming",
     lambda: firdes.low_pass(1.0, 1e6, 100e3, 50e3, firdes.WIN_HAMMING, 6.76)),
    ("lp2_g2_fs1M_c150k_t40k_70db_blackman",
     lambda: firdes.low_pass_2(2.0, 1e6, 150e3, 40e3, 70.0, firdes.WIN_BLACKMAN, 6.76)),
    ("hp_g1_fs1M_c200k_t60k_hann",
     lambda: firdes.high_pass(1.0, 1e6, 200e3, 60e3, firdes.WIN_HANN, 6.76)),
    ("hp2_g1_fs2M_c300k_t80k_60db_kaiser",
     lambda: firdes.high_pass_2(1.0, 2e6, 300e3, 80e3, 60.0, firdes.WIN_KAISER, 6.76)),
    ("bp_g1_fs1M_l100k_h200k_t50k_hamming",
     lambda: firdes.band_pass(1.0, 1e6, 100e3, 200e3, 50e3, firdes.WIN_HAMMING, 6.76)),
    ("bp2_g1_fs1M_l50k_h250k_t40k_70db_bh",
     lambda: firdes.band_pass_2(1.0, 1e6, 50e3, 250e3, 40e3, 70.0,
                                firdes.WIN_BLACKMAN_HARRIS, 6.76)),
    ("br_g1_fs1M_l100k_h200k_t50k_hamming",
     lambda: firdes.band_reject(1.0, 1e6, 100e3, 200e3, 50e3, firdes.WIN_HAMMING, 6.76)),
    ("br2_g1_fs1M_l80k_h220k_t45k_60db_hann",
     lambda: firdes.band_reject_2(1.0, 1e6, 80e3, 220e3, 45e3, 60.0,
                                  firdes.WIN_HANN, 6.76)),
    ("hilbert_19_hamming", lambda: firdes.hilbert(19, firdes.WIN_HAMMING, 6.76)),
    ("rrc_g1_fs1M_sym250k_a035_41",
     lambda: firdes.root_raised_cosine(1.0, 1e6, 250e3, 0.35, 41)),
    ("rrc_241_g1_fs10M_sym1M_a022",
     lambda: firdes.root_raised_cosine(1.0, 10e6, 1e6, 0.22, 241)),
    ("gaussian_g1_spb4_bt035_32", lambda: firdes.gaussian(1.0, 4.0, 0.35, 32)),
]


@pytest.mark.parametrize("name,fn", FIRDES_CASES, ids=[c[0] for c in FIRDES_CASES])
def test_firdes_parity(name, fn):
    got = fn()
    want = golden(name)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


COMPLEX_CASES = [
    ("cbp_g1_fs1M_ln100k_h200k_t50k_hamming",
     lambda: firdes.complex_band_pass(1.0, 1e6, -100e3, 200e3, 50e3,
                                      firdes.WIN_HAMMING, 6.76)),
    ("cbp2_g1_fs1M_l10k_h90k_t30k_60db_hann",
     lambda: firdes.complex_band_pass_2(1.0, 1e6, 10e3, 90e3, 30e3, 60.0,
                                        firdes.WIN_HANN, 6.76)),
]


@pytest.mark.parametrize("name,fn", COMPLEX_CASES, ids=[c[0] for c in COMPLEX_CASES])
def test_complex_band_pass_parity(name, fn):
    got = fn()
    want = golden_c(name)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-6)


def test_compute_ntaps_matches_reference_sizing():
    # 53 dB Hamming: ntaps = 53*fs/(22*tw) forced odd (lib/firdes.cc:675-686)
    assert firdes.compute_ntaps(1e6, 50e3, firdes.WIN_HAMMING) == 49
    assert firdes.compute_ntaps_windes(1e6, 40e3, 70.0) == 79
    assert firdes.compute_ntaps_windes(1e6, 40e3, 70.0) % 2 == 1


def test_hilbert_antisymmetric():
    t = firdes.hilbert(31, firdes.WIN_HAMMING, 6.76)
    np.testing.assert_allclose(t, -t[::-1], atol=1e-7)
    assert t[15] == 0.0
