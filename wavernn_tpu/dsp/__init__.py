"""DSP / signal-processing layer (ref: utils/dsp.py, utils/distribution.py).

Two backends, one set of conventions:

* :mod:`wavernn_tpu.dsp.audio` — numpy implementations used by the host-side
  (multiprocess) preprocessing pipeline.  These reproduce librosa's STFT /
  Slaney-mel conventions exactly (centered reflect-pad STFT, periodic Hann
  window padded to n_fft, Slaney-normalized mel filterbank) so features match
  the PyTorch reference bit-for-bit at the algorithm level.
* :mod:`wavernn_tpu.dsp.jax_audio` — jittable JAX versions of the same math
  for fused on-device feature extraction and the Griffin-Lim fallback vocoder.

The hp-bound convenience API (``melspectrogram(y)``, ``encode_mu_law`` …)
mirrors the reference's function names.
"""

from wavernn_tpu.dsp.audio import (  # noqa: F401
    amp_to_db,
    db_to_amp,
    combine_signal,
    decode_mu_law,
    de_emphasis,
    denormalize,
    encode_16bits,
    encode_mu_law,
    float_2_label,
    label_2_float,
    linear_to_mel,
    load_wav,
    melspectrogram,
    mel_filterbank,
    normalize,
    pre_emphasis,
    save_wav,
    spectrogram,
    split_signal,
    stft,
)
from wavernn_tpu.dsp.jax_audio import reconstruct_waveform  # noqa: F401
