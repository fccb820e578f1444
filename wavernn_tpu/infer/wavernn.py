"""Vocoder inference entry points (ref: gen_wavernn.py:11-65).

``gen_testset`` renders held-out audition utterances next to their ground
truth at checkpoint time — the reference's in-loop human A/B quality check.
``gen_from_file`` copy-synthesizes an external .wav or .npy mel.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from wavernn_tpu.config import hp
from wavernn_tpu.dsp import audio
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.ops.decode import Generator
from wavernn_tpu.utils.display import progbar, stream


_GENERATOR_CACHE = {}


def make_generator(cfg: WaveRNNConfig, state, backend: str = None,
                   int8_gates: bool = None, mesh=None) -> Generator:
    """Build (or reuse) a Generator for this config.  Cached per
    (cfg, backend, int8, mesh) so checkpoint-time auditions reuse compiled
    programs — fresh variables are swapped in as program inputs.

    ``mesh``: a parallel.mesh.MeshPlan — batched decode fans the fold axis
    out over the mesh's 'data' axis (multi-chip sequence-parallel
    generation)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if backend is None:
        import jax

        on_tpu = jax.devices()[0].platform == "tpu"
        backend = "pallas" if (on_tpu and hp.get("gen_use_pallas", True)) else "scan"
    if int8_gates is None:
        int8_gates = bool(hp.get("gen_int8", False))
    key = (cfg, backend, int8_gates, id(mesh) if mesh is not None else None)
    gen = _GENERATOR_CACHE.get(key)
    if gen is None:
        gen = Generator(cfg, variables, backend=backend,
                        int8_gates=int8_gates, mesh=mesh)
        _GENERATOR_CACHE[key] = gen
    else:
        gen.update_variables(variables)
    return gen


def _timed_generate(gen: Generator, mel, batched, target, overlap, mu_law,
                    save_path: Path, sample_rate: int):
    start = time.time()
    wav = gen(mel, batched=batched, target=target, overlap=overlap, mu_law=mu_law)
    elapsed = time.time() - start
    khz = len(wav) / elapsed / 1000.0
    xrt = khz * 1000.0 / sample_rate
    stream(f"| Gen Rate: {khz:.1f}kHz ({xrt:.1f}x realtime) | {len(wav)} samples | \n")
    audio.save_wav(wav, save_path)
    return wav


def gen_testset(cfg: WaveRNNConfig, state, test_set, samples: int, batched: bool,
                target: int, overlap: int, save_path: Path, mesh=None):
    """Vocode the first ``samples`` held-out utterances alongside targets."""
    gen = make_generator(cfg, state, mesh=mesh)
    k = state.get_step() // 1000

    for i, (m, x) in enumerate(test_set, 1):
        if i > samples:
            break
        print(f"\n| Generating: {i}/{samples}")

        x = np.asarray(x)
        bits = 16 if hp.voc_mode == "MOL" else hp.bits
        if hp.mu_law and hp.voc_mode != "MOL":
            x = audio.decode_mu_law(x, 2 ** bits, from_labels=True)
        else:
            x = audio.label_2_float(x, bits)
        audio.save_wav(x, save_path / f"{k}k_steps_{i}_target.wav")

        batch_str = (
            f"gen_batched_target{target}_overlap{overlap}" if batched
            else "gen_NOT_BATCHED"
        )
        _timed_generate(
            gen, m, batched, target, overlap, hp.mu_law,
            save_path / f"{k}k_steps_{i}_{batch_str}.wav", cfg.sample_rate,
        )


def gen_from_file(cfg: WaveRNNConfig, state, load_path: Path, save_path: Path,
                  batched: bool, target: int, overlap: int, mesh=None):
    """Copy-synthesis from a .wav (re-vocoded) or .npy mel file."""
    k = state.get_step() // 1000
    load_path = Path(load_path)
    file_name = load_path.stem

    if load_path.suffix == ".wav":
        wav = audio.load_wav(load_path)
        audio.save_wav(wav, save_path / f"__{file_name}__{k}k_steps_target.wav")
        mel = audio.melspectrogram(wav)
    elif load_path.suffix == ".npy":
        mel = np.load(load_path)
        if mel.ndim != 2 or mel.shape[0] != hp.num_mels:
            raise ValueError(
                f"Expected a numpy array shaped (n_mels, n_hops), got {mel.shape}!"
            )
        _max, _min = np.max(mel), np.min(mel)
        if _max >= 1.01 or _min <= -0.01:
            raise ValueError(
                f"Expected spectrogram range in [0,1] but was [{_min}, {_max}]"
            )
    else:
        raise ValueError(f"Expected .wav or .npy, got {load_path.suffix}!")

    batch_str = (
        f"gen_batched_target{target}_overlap{overlap}" if batched
        else "gen_NOT_BATCHED"
    )
    gen = make_generator(cfg, state, mesh=mesh)
    _timed_generate(
        gen, mel, batched, target, overlap, hp.mu_law,
        save_path / f"__{file_name}__{k}k_steps_{batch_str}.wav", cfg.sample_rate,
    )
