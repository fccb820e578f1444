"""Op-level tests: GRU/LSTM cells vs torch goldens, MOL loss vs independent
float64 reference, fold/unfold algebra."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# -- recurrent cells vs torch oracle -------------------------------------------


def test_gru_cell_matches_torch():
    import torch

    from wavernn_tpu.ops.rnn import gru_cell_step

    torch.manual_seed(0)
    B, I, H = 3, 7, 5
    cell = torch.nn.GRUCell(I, H)
    x = torch.randn(B, I)
    h = torch.randn(B, H)
    expected = cell(x, h).detach().numpy()

    out = gru_cell_step(
        jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
        jnp.asarray(cell.weight_ih.detach().numpy().T),
        jnp.asarray(cell.weight_hh.detach().numpy().T),
        jnp.asarray(cell.bias_ih.detach().numpy()),
        jnp.asarray(cell.bias_hh.detach().numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_lstm_cell_matches_torch():
    import torch

    from wavernn_tpu.ops.rnn import lstm_cell_step

    torch.manual_seed(1)
    B, I, H = 2, 6, 4
    cell = torch.nn.LSTMCell(I, H)
    x = torch.randn(B, I)
    h = torch.randn(B, H)
    c = torch.randn(B, H)
    h_t, c_t = cell(x, (h, c))

    h_j, c_j = lstm_cell_step(
        jnp.asarray(x.numpy()), jnp.asarray(h.numpy()), jnp.asarray(c.numpy()),
        jnp.asarray(cell.weight_ih.detach().numpy().T),
        jnp.asarray(cell.weight_hh.detach().numpy().T),
        jnp.asarray(cell.bias_ih.detach().numpy()),
        jnp.asarray(cell.bias_hh.detach().numpy()),
    )
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.detach().numpy(), atol=1e-5)


def test_gru_sequence_matches_torch():
    import torch

    from wavernn_tpu.ops.rnn import GRU

    torch.manual_seed(2)
    B, T, I, H = 2, 11, 4, 6
    tgru = torch.nn.GRU(I, H, batch_first=True)
    x = torch.randn(B, T, I)
    expected, _ = tgru(x)

    gru = GRU(H)
    params = {
        "cell": {
            "w_ih": jnp.asarray(tgru.weight_ih_l0.detach().numpy().T),
            "w_hh": jnp.asarray(tgru.weight_hh_l0.detach().numpy().T),
            "b_ih": jnp.asarray(tgru.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(tgru.bias_hh_l0.detach().numpy()),
        }
    }
    ys, h = gru.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(ys), expected.detach().numpy(), atol=1e-5
    )


def test_bigru_matches_torch_bidirectional():
    import torch

    from wavernn_tpu.ops.rnn import BiGRU

    torch.manual_seed(3)
    B, T, I, H = 2, 9, 4, 5
    tgru = torch.nn.GRU(I, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, I)
    expected, _ = tgru(x)

    def cell(prefix):
        return {
            "w_ih": jnp.asarray(getattr(tgru, f"weight_ih_l0{prefix}").detach().numpy().T),
            "w_hh": jnp.asarray(getattr(tgru, f"weight_hh_l0{prefix}").detach().numpy().T),
            "b_ih": jnp.asarray(getattr(tgru, f"bias_ih_l0{prefix}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(tgru, f"bias_hh_l0{prefix}").detach().numpy()),
        }

    params = {"fwd": {"cell": cell("")}, "bwd": {"cell": cell("_reverse")}}
    ys = BiGRU(H).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ys), expected.detach().numpy(), atol=1e-5)


def test_pre_de_emphasis_roundtrip(hp_default):
    from wavernn_tpu.dsp import audio

    hp_default.preemphasis = 0.97
    x = np.random.default_rng(0).uniform(-0.5, 0.5, 1000)
    y = audio.pre_emphasis(x)
    back = audio.de_emphasis(y)
    np.testing.assert_allclose(back, x, atol=1e-10)


# -- MOL loss vs independent float64 reference ------------------------------------


def _mol_nll_reference(y_hat, y, num_classes=65536):
    """Brute-force float64 NLL of the discretized MoL, computed directly from
    the definition: mass of the quantization bin under each logistic CDF."""
    nr_mix = y_hat.shape[-1] // 3
    logit = y_hat[..., :nr_mix].astype(np.float64)
    means = y_hat[..., nr_mix:2 * nr_mix].astype(np.float64)
    log_scales = np.maximum(y_hat[..., 2 * nr_mix:].astype(np.float64), np.log(1e-14))
    y = y.astype(np.float64)[..., None]

    def logistic_cdf(v):
        return 1.0 / (1.0 + np.exp(-(v - means) / np.exp(log_scales)))

    h = 1.0 / (num_classes - 1)
    mass = np.where(
        y < -0.999,
        logistic_cdf(y + h),
        np.where(y > 0.999, 1.0 - logistic_cdf(y - h),
                 logistic_cdf(y + h) - logistic_cdf(y - h)),
    )
    # density fallback for underflowed bins (matches the convention)
    centered = (y - means) / np.exp(log_scales)
    pdf = np.exp(centered - log_scales - 2 * np.logaddexp(0.0, centered))
    # full bin width is 2h (y±h are the bin edges)
    mass = np.where(mass > 1e-5, mass,
                    pdf * 2 * h * (np.abs(y) <= 0.999) + mass * (np.abs(y) > 0.999))

    pi = np.exp(logit - logit.max(-1, keepdims=True))
    pi = pi / pi.sum(-1, keepdims=True)
    p = (pi * mass).sum(-1)
    return -np.mean(np.log(p))


def test_mol_loss_matches_reference():
    from wavernn_tpu.ops.mol import discretized_mix_logistic_loss

    rng = np.random.default_rng(3)
    B, T, M = 2, 50, 10
    y_hat = rng.standard_normal((B, T, 3 * M)).astype(np.float32)
    # keep scales in a sane range
    y_hat[..., 2 * M:] = rng.uniform(-6, -1, (B, T, M))
    y = rng.uniform(-1, 1, (B, T)).astype(np.float32)

    got = float(discretized_mix_logistic_loss(jnp.asarray(y_hat), jnp.asarray(y)))
    want = _mol_nll_reference(y_hat, y)
    assert abs(got - want) < 5e-3


def test_mol_loss_edges_finite_and_grad_clean():
    from wavernn_tpu.ops.mol import discretized_mix_logistic_loss

    rng = np.random.default_rng(4)
    M = 10
    y_hat = jnp.asarray(rng.standard_normal((1, 6, 3 * M)).astype(np.float32))
    y = jnp.asarray(np.array([[-1.0, -0.9995, 0.0, 0.9995, 1.0, 0.5]], np.float32))

    loss, grad = jax.value_and_grad(
        lambda p: discretized_mix_logistic_loss(p, y)
    )(y_hat)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()


def test_mol_sampling_statistics():
    from wavernn_tpu.ops.mol import sample_from_discretized_mix_logistic

    M = 10
    # single dominant mixture with mean 0.3 and tiny scale
    y = np.zeros((1, 4000, 3 * M), np.float32)
    y[..., 0] = 10.0          # logit for mixture 0
    y[..., M] = 0.3           # mean of mixture 0
    y[..., 2 * M:] = -7.0     # log scale
    s = np.asarray(
        sample_from_discretized_mix_logistic(jax.random.PRNGKey(0), jnp.asarray(y))
    )
    assert abs(s.mean() - 0.3) < 0.01
    assert s.std() < 0.01
    assert s.min() >= -1 and s.max() <= 1


# -- fold / unfold -----------------------------------------------------------------


def test_fold_with_overlap_matches_docstring():
    from wavernn_tpu.ops.fold import fold_with_overlap

    x = jnp.arange(1, 11, dtype=jnp.float32).reshape(1, 10, 1)
    folded = np.asarray(fold_with_overlap(x, target=2, overlap=1))[..., 0]
    np.testing.assert_array_equal(
        folded, [[1, 2, 3, 4], [4, 5, 6, 7], [7, 8, 9, 10]]
    )


def test_fold_pads_remainder():
    from wavernn_tpu.ops.fold import fold_shape, fold_with_overlap

    x = jnp.ones((1, 11, 3))
    num_folds, padding = fold_shape(11, 2, 1)
    folded = fold_with_overlap(x, 2, 1)
    assert folded.shape == (num_folds, 4, 3)
    assert padding > 0


def test_xfade_unfold_length_and_partition():
    from wavernn_tpu.ops.fold import xfade_and_unfold, xfade_envelopes

    target, overlap, folds = 100, 20, 5
    y = jnp.ones((folds, target + 2 * overlap))
    out = np.asarray(xfade_and_unfold(y, overlap))
    assert out.shape == (folds * (target + overlap) + overlap,)
    # interior of each fold is untouched (gain 1)
    np.testing.assert_allclose(out[overlap + 5: target + overlap - 5], 1.0)
    # crossfade region: fades must be complementary in *power*
    fi, fo = xfade_envelopes(overlap)
    power = np.asarray(fi) ** 2 + np.asarray(fo) ** 2
    np.testing.assert_allclose(power[overlap // 2:], 1.0, atol=1e-6)


def test_roundtrip_fold_xfade_on_smooth_signal():
    """Folding a signal and unfolding (without RNN in between) must
    reconstruct the interior exactly where envelopes sum correctly."""
    from wavernn_tpu.ops.fold import fold_with_overlap, xfade_and_unfold

    target, overlap = 200, 40
    t = np.arange(1000, dtype=np.float32)
    sig = np.sin(0.01 * t).astype(np.float32)
    folded = fold_with_overlap(jnp.asarray(sig).reshape(1, -1, 1), target, overlap)
    out = np.asarray(xfade_and_unfold(folded[..., 0], overlap))
    # fold boundaries introduce the warmup-silence gap by design; check the
    # non-boundary interior of each fold reproduces the signal
    for i in range(folded.shape[0] - 1):
        s = i * (target + overlap) + overlap
        e = s + target - overlap
        np.testing.assert_allclose(out[s:e], sig[s:e], atol=1e-5)
