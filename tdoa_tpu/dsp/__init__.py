from tdoa_tpu.dsp.windows import hann, blackman_harris
from tdoa_tpu.dsp.filters import (
    remove_dc,
    lowpass_taps,
    bandpass_taps,
    fir_filter,
    fir_decimate,
    hilbert_taps,
    resample_fft,
)
from tdoa_tpu.dsp.fm import (
    am_demodulate,
    fm_discriminate,
    fm_demodulate,
    fm_modulate,
    ssb_demodulate,
)
from tdoa_tpu.dsp.snr import spectral_snr, psd_welch

__all__ = [
    "hann",
    "blackman_harris",
    "remove_dc",
    "lowpass_taps",
    "bandpass_taps",
    "fir_filter",
    "fir_decimate",
    "hilbert_taps",
    "resample_fft",
    "am_demodulate",
    "fm_discriminate",
    "fm_demodulate",
    "fm_modulate",
    "ssb_demodulate",
    "spectral_snr",
    "psd_welch",
]
