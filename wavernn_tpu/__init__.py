"""wavernn_tpu — a TPU-native neural text-to-speech framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
fatchord/WaveRNN reference system (Tacotron seq2seq TTS + WaveRNN neural
vocoder + DSP/text/data pipeline), built TPU-first:

  * functional models (flax.linen) with explicit PRNG threading,
  * ``lax.scan`` autoregressive loops compiled once under ``jit``,
  * a Pallas fused sample-loop kernel for the 22 kHz decode hot path,
  * ``jax.sharding.Mesh`` + NamedSharding parallelism (data/model/fold axes)
    instead of the reference's single-process DataParallel.

Layout (mirrors the reference's implicit layering, SURVEY.md §1):
  config.py      - runtime-loadable hyperparameter singleton  (ref: utils/__init__.py:40-104)
  paths.py       - artifact tree management                   (ref: utils/paths.py)
  dsp/           - mel/STFT/mu-law/Griffin-Lim signal ops     (ref: utils/dsp.py)
  text/          - text normalization frontend                (ref: utils/text/)
  data/          - preprocessing + dataset loaders            (ref: preprocess.py, utils/dataset.py)
  models/        - WaveRNN, Tacotron, DeepMind-variant        (ref: models/)
  ops/           - GRU/fold/MOL/Pallas kernels                (ref: implicit in torch cuDNN)
  parallel/      - device mesh + sharding helpers             (ref: utils/__init__.py:19-36)
  training/      - train loops, checkpointing integration     (ref: train_*.py)
  utils/         - display, files, checkpoints                (ref: utils/)
"""

__version__ = "0.1.0"

from wavernn_tpu.config import hp  # noqa: F401
