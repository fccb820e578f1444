"""Objective vocoder evaluation: copy-synthesis MCD over the held-out set.

The reference's only quality check is human A/B listening of checkpoint
audition wavs (SURVEY.md §4.1).  This adds a number: vocode each held-out
utterance from its ground-truth mel, re-extract the mel of the generated
audio, and report the mel-cepstral distortion against the target mel —
aligned, objective, trackable across checkpoints.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from wavernn_tpu.config import hp
from wavernn_tpu.dsp import audio
from wavernn_tpu.dsp.metrics import mcd
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.ops.decode import Generator


def copy_synthesis_mcd(gen: Generator, mel: np.ndarray, *, batched: bool,
                       target: int, overlap: int, mu_law: bool,
                       seed: int = 0,
                       to_float=None) -> Tuple[float, np.ndarray]:
    """Vocode one utterance from its mel; return (MCD vs target mel, wav).

    ``to_float`` converts a packed-egress generator's wire bytes (int16 /
    mulaw8) back to float audio before spectral analysis — scoring exactly
    what a client of that serving format hears."""
    wav = gen(mel, batched=batched, target=target, overlap=overlap,
              mu_law=mu_law, seed=seed)
    if to_float is not None:
        wav = to_float(wav)
    regen_mel = audio.melspectrogram(np.asarray(wav, np.float32))
    T = min(mel.shape[1], regen_mel.shape[1])
    return mcd(mel[:, :T], regen_mel[:, :T]), wav


def eval_testset_mcd(cfg: WaveRNNConfig, state, test_set, samples: int,
                     batched: bool, target: int, overlap: int) -> List[float]:
    """MCD of copy-synthesis for the first ``samples`` held-out utterances."""
    from wavernn_tpu.infer.wavernn import make_generator

    gen = make_generator(cfg, state)
    scores = []
    for i, (m, _x) in enumerate(test_set, 1):
        if i > samples:
            break
        score, _ = copy_synthesis_mcd(
            gen, np.asarray(m), batched=batched, target=target,
            overlap=overlap, mu_law=hp.mu_law,
        )
        scores.append(score)
        print(f"| eval {i}/{samples}: copy-synthesis MCD = {score:.2f} dB")
    if scores:
        print(f"| mean copy-synthesis MCD over {len(scores)} utterances: "
              f"{np.mean(scores):.2f} dB")
    return scores
