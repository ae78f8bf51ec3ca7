"""CLI tools mirroring the reference's benchmark/info binaries
(lib/CMakeLists.txt:103-289): clview, test-clenabled, test-clfilter,
test-clkernel, test-clxcorrelate, test-clxengine, test-clenabled-fft.

Run as modules, e.g.:

    python -m clenabled_tpu.tools.clview
    python -m clenabled_tpu.tools.test_clenabled --cpu 8192
    python -m clenabled_tpu.tools.test_clfilter --ntaps=241
    python -m clenabled_tpu.tools.test_clxcorrelate --num_inputs=4
    python -m clenabled_tpu.tools.test_clxengine --num_inputs=16
    python -m clenabled_tpu.tools.test_clenabled_fft --fft-size=2048
"""
