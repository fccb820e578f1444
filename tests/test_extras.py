"""Tests for auxiliary subsystems: pruning, DeepMind variant, MCD metric,
profiling meters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# -- pruning ----------------------------------------------------------------------


def test_sparsity_ramp_shape():
    from wavernn_tpu.pruning import PruneConfig, sparsity_at

    cfg = PruneConfig(target_sparsity=0.9, start_step=100, ramp_steps=1000)
    assert float(sparsity_at(0, cfg)) == 0.0
    assert float(sparsity_at(100, cfg)) == 0.0
    mid = float(sparsity_at(600, cfg))
    assert 0.0 < mid < 0.9
    assert float(sparsity_at(1100, cfg)) == pytest.approx(0.9, abs=1e-6)
    assert float(sparsity_at(99999, cfg)) == pytest.approx(0.9, abs=1e-6)
    # cubic: more than half the sparsity arrives in the first half of the ramp
    assert mid > 0.45


def test_prune_masks_hit_target():
    from wavernn_tpu.pruning import PruneConfig, Pruner, measured_sparsity

    cfg = PruneConfig(target_sparsity=0.75, start_step=0, ramp_steps=1,
                      prune_every=1)
    pruner = Pruner(cfg)
    rng = np.random.default_rng(0)
    params = {
        "rnn1": {"cell": {"w_ih": jnp.asarray(rng.standard_normal((64, 192)), jnp.float32)}},
        "fc": {"kernel": jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)},
        "small": {"bias": jnp.asarray(rng.standard_normal(8), jnp.float32)},
    }
    masks = pruner.maybe_update(pruner.init_masks(params), params, step=100)
    # gated + full leaves pruned, bias untouched
    w_mask = np.asarray(masks["rnn1"]["cell"]["w_ih"])
    assert abs(1 - w_mask.mean() - 0.75) < 0.02
    # per-gate: each 64-col block has the same sparsity
    for g in range(3):
        block = w_mask[:, g * 64:(g + 1) * 64]
        assert abs(1 - block.mean() - 0.75) < 0.03
    assert np.asarray(masks["small"]["bias"]).all()
    pruned = Pruner.apply(masks, params)
    assert float((np.asarray(pruned["fc"]["kernel"]) == 0).mean()) > 0.7


def test_prune_cadence():
    from wavernn_tpu.pruning import PruneConfig, Pruner

    cfg = PruneConfig(start_step=10, prune_every=5)
    pruner = Pruner(cfg)
    params = {"k": {"kernel": jnp.ones((64, 64))}}
    masks0 = pruner.init_masks(params)
    assert pruner.maybe_update(masks0, params, 7) is masks0     # before start
    assert pruner.maybe_update(masks0, params, 12) is masks0    # off-cadence
    m = pruner.maybe_update(masks0, params, 15)
    assert m is not masks0


# -- deepmind variant ----------------------------------------------------------------


def test_deepmind_forward_and_generate():
    from wavernn_tpu.models.deepmind_wavernn import (
        DeepMindWaveRNN,
        DeepMindWaveRNNConfig,
        generate,
    )

    cfg = DeepMindWaveRNNConfig(hidden_size=64, quantisation=256)
    model = DeepMindWaveRNN(cfg)
    B, T = 2, 7
    rng = np.random.default_rng(0)
    prev_y = jnp.asarray(rng.uniform(-1, 1, (B, T, 2)), jnp.float32)
    coarse_t = jnp.asarray(rng.uniform(-1, 1, (B, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), prev_y, coarse_t)
    oc, of = model.apply(variables, prev_y, coarse_t)
    assert oc.shape == (B, T, 256) and of.shape == (B, T, 256)

    wav = generate(model, variables, seq_len=50, key=jax.random.PRNGKey(1))
    assert wav.shape == (50,)
    assert np.abs(wav).max() <= 1.0


def test_deepmind_split_combine_consistency():
    """Sampled (coarse, fine) pairs must reassemble to valid 16-bit range."""
    from wavernn_tpu.dsp.audio import combine_signal, split_signal

    x = np.arange(-2 ** 15, 2 ** 15, 997)
    c, f = split_signal(x)
    np.testing.assert_array_equal(combine_signal(c, f), x)


# -- metrics -----------------------------------------------------------------------


def test_mcd_zero_for_identical():
    from wavernn_tpu.dsp.metrics import mcd

    m = np.random.default_rng(0).uniform(0, 1, (80, 50))
    assert mcd(m, m) == 0.0


def test_mcd_monotone_in_noise():
    from wavernn_tpu.dsp.metrics import mcd

    rng = np.random.default_rng(0)
    m = rng.uniform(0, 1, (80, 50))
    small = mcd(m, np.clip(m + rng.normal(0, 0.001, m.shape), 0, 1))
    large = mcd(m, np.clip(m + rng.normal(0, 0.05, m.shape), 0, 1))
    assert 0 < small < large


def test_rate_meter():
    from wavernn_tpu.utils.profiling import RateMeter

    meter = RateMeter()
    meter.update(100)
    assert meter.rate > 0
    assert meter.khz(22050) > 0
