"""Unified text→speech serving pipeline.

Composes the batched Tacotron generator and the fold-packed WaveRNN decoder
into one call: N texts in, N waveforms out, with both stages batching across
utterances (the reference synthesizes strictly one utterance at a time,
ref: gen_tacotron.py:281-308).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from wavernn_tpu.infer.tacotron import TTSGenerator
from wavernn_tpu.models.tacotron import TacotronConfig
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.ops.decode import Generator
from wavernn_tpu.text import text_to_sequence


def mel_from_linear(m_linear) -> np.ndarray:
    """Tacotron decoder output on its [-4, 4] training scale → the
    vocoder's normalized [0, 1] mel convention (ref: gen_tacotron.py:144-145).
    The single denormalization every serving path shares."""
    return np.clip((np.asarray(m_linear) + 4) / 8, 0, 1)


class TTSPipeline:
    """End-to-end synthesis: text strings → waveforms.

    Args:
      tts_cfg / tts_variables: Tacotron config + params.
      voc_cfg / voc_variables: WaveRNN config + params.
      cleaner_names: text-normalization pipelines.
      r: frames per decoder step (use the final curriculum r).
      backend: WaveRNN decode backend ('pallas' on TPU, 'scan' elsewhere).
      int8_gates: opt-in int8 weight streaming in the pallas vocoder kernel
        (default off: measured slower than bf16 at production fold widths,
        docs/ROADMAP.md).
      deterministic: mode/argmax vocoder draws instead of sampling
        (reproducible serving; used by equality tests).
      mesh: optional parallel.mesh.MeshPlan — vocoder decodes shard their
        fold axis over the mesh's 'data' axis (multi-chip
        sequence-parallel generation, as gen_wavernn.py --mesh).
    """

    def __init__(self, tts_cfg: TacotronConfig, tts_variables,
                 voc_cfg: WaveRNNConfig, voc_variables,
                 cleaner_names: Sequence[str], r: int,
                 backend: str = "scan", tts_steps: int = 2000,
                 tts_backend: str = "auto", int8_gates: bool = False,
                 deterministic: bool = False, mesh=None,
                 output_dtype: str = "float64",
                 input_dtype: str = "float16"):
        self.r = r
        self.cleaners = list(cleaner_names)
        self.tts = TTSGenerator(tts_cfg, tts_variables, steps=tts_steps,
                                backend=tts_backend)
        # output_dtype='int16' serves device-faded 16-bit PCM end to end
        # (one-shot AND streamed chunks): half the transfer bytes, no
        # host-side quantization — the production serving default
        # (serve.py --output_dtype).  input_dtype='float16' stages the
        # Tacotron-produced mels at half the upload bytes (measured MCD
        # delta ~1/8 of the scan seed spread; ops/decode.py); 'uint8'
        # quarters them (8-bit mel steps, serve.py --input_dtype,
        # measured in tools/wire_format_probe.py).
        self.voc = Generator(voc_cfg, voc_variables, backend=backend,
                             fold_bucket=16, int8_gates=int8_gates,
                             deterministic=deterministic, mesh=mesh,
                             output_dtype=output_dtype,
                             input_dtype=input_dtype)

    def __call__(self, texts: Sequence[str], target: int = 11_000,
                 overlap: int = 550, mu_law: bool = True,
                 seed: int = 0) -> List[np.ndarray]:
        """Synthesize every text; returns float64 waveforms."""
        seqs = [text_to_sequence(t.strip(), self.cleaners) for t in texts]
        mels = []
        for _, m_linear, _ in self.tts.batch(seqs, r=self.r):
            mels.append(mel_from_linear(m_linear))
        return self.voc.generate_batch(
            mels, target=target, overlap=overlap, mu_law=mu_law, seed=seed
        )

    def stream_synthesize(self, texts: Sequence[str], target: int = 11_000,
                          overlap: int = 550, mu_law: bool = True,
                          seed: int = 0, lookahead: int = 1):
        """Two-stage pipelined serving: YIELDS each text's waveform as soon
        as it is ready, keeping the device queue primed throughout.

        Both stages expose submit/collect, so text→mel decodes of upcoming
        utterances and mel→wave decodes of finished ones interleave in the
        device's in-order queue while the host does its transfers —
        utterance i's audio streams out while utterance i+1 is still
        decoding.  ``lookahead`` TTS decodes are kept in flight ahead of
        the vocoder."""
        seqs = [text_to_sequence(t.strip(), self.cleaners) for t in texts]
        n = len(seqs)
        tts_h = {}
        for i in range(min(lookahead + 1, n)):
            tts_h[i] = self.tts.submit(seqs[i], r=self.r)
        voc_prev = None
        for i in range(n):
            _, m_linear, _ = self.tts.collect(tts_h.pop(i))
            mel = mel_from_linear(m_linear)
            vh = self.voc.submit(mel, True, target, overlap, mu_law,
                                 seed + i)
            # start the result's device->host copy as soon as its in-order
            # program finishes, overlapping with later utterances' compute
            self.voc.prefetch(vh)
            nxt = i + lookahead + 1
            if nxt < n:
                tts_h[nxt] = self.tts.submit(seqs[nxt], r=self.r)
            if voc_prev is not None:
                yield self.voc.collect(voc_prev)
            voc_prev = vh
        if voc_prev is not None:
            yield self.voc.collect(voc_prev)
