"""Artifact-tree management.

Capability parity with the reference ``Paths`` (ref: utils/paths.py:5-62):
computes and creates the directory tree connecting the pipeline stages —
preprocessed features, per-model-id checkpoints, outputs, logs, plots.

Checkpoint files use ``.msgpack`` (flax serialization) instead of torch
pickles; the latest/named pairing contract is unchanged.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union


class Paths:
    """Manages the paths used by the vocoder, the TTS model, and the data."""

    def __init__(self, data_path: Union[str, Path], voc_id: str, tts_id: str,
                 base: Union[str, Path, None] = None):
        self.base = (
            Path(base).expanduser().resolve()
            if base is not None
            else Path(os.getcwd()).resolve()
        )

        # Data paths
        self.data = Path(data_path).expanduser().resolve()
        self.quant = self.data / "quant"
        self.mel = self.data / "mel"
        self.gta = self.data / "gta"

        # Vocoder paths
        self.voc_checkpoints = self.base / "checkpoints" / f"{voc_id}.wavernn"
        self.voc_latest_weights = self.voc_checkpoints / "latest_weights.msgpack"
        self.voc_latest_optim = self.voc_checkpoints / "latest_optim.msgpack"
        self.voc_output = self.base / "model_outputs" / f"{voc_id}.wavernn"
        self.voc_step = self.voc_checkpoints / "step.npy"
        self.voc_log = self.voc_checkpoints / "log.txt"

        # TTS paths
        self.tts_checkpoints = self.base / "checkpoints" / f"{tts_id}.tacotron"
        self.tts_latest_weights = self.tts_checkpoints / "latest_weights.msgpack"
        self.tts_latest_optim = self.tts_checkpoints / "latest_optim.msgpack"
        self.tts_output = self.base / "model_outputs" / f"{tts_id}.tacotron"
        self.tts_step = self.tts_checkpoints / "step.npy"
        self.tts_log = self.tts_checkpoints / "log.txt"
        self.tts_attention = self.tts_checkpoints / "attention"
        self.tts_mel_plot = self.tts_checkpoints / "mel_plots"

        self.create_paths()

    def create_paths(self) -> None:
        for p in (
            self.data, self.quant, self.mel, self.gta,
            self.voc_checkpoints, self.voc_output,
            self.tts_checkpoints, self.tts_output,
            self.tts_attention, self.tts_mel_plot,
        ):
            os.makedirs(p, exist_ok=True)

    def get_tts_named_weights(self, name: str) -> Path:
        return self.tts_checkpoints / f"{name}_weights.msgpack"

    def get_tts_named_optim(self, name: str) -> Path:
        return self.tts_checkpoints / f"{name}_optim.msgpack"

    def get_voc_named_weights(self, name: str) -> Path:
        return self.voc_checkpoints / f"{name}_weights.msgpack"

    def get_voc_named_optim(self, name: str) -> Path:
        return self.voc_checkpoints / f"{name}_optim.msgpack"
