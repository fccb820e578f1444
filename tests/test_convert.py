"""Torch-checkpoint converter test: a synthetic state dict with the
reference's key names converts into a pytree that our WaveRNN accepts, and
GRU/Linear layouts map correctly (transpose conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def synth_wavernn_state_dict(rnn_dims=32, fc_dims=32, feat=80, compute=16,
                             res_out=16, res_blocks=2, bits=9,
                             factors=(5, 5, 11), pad=2):
    rng = np.random.default_rng(0)
    sd = {}

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    k_in = pad * 2 + 1
    sd["upsample.resnet.conv_in.weight"] = w(compute, feat, k_in)
    for name in ("weight", "bias", "running_mean", "running_var"):
        sd[f"upsample.resnet.batch_norm.{name}"] = (
            np.abs(w(compute)) + 0.5 if "var" in name else w(compute)
        )
    for i in range(res_blocks):
        base = f"upsample.resnet.layers.{i}"
        sd[f"{base}.conv1.weight"] = w(compute, compute, 1)
        sd[f"{base}.conv2.weight"] = w(compute, compute, 1)
        for bn in ("batch_norm1", "batch_norm2"):
            for name in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{base}.{bn}.{name}"] = (
                    np.abs(w(compute)) + 0.5 if "var" in name else w(compute)
                )
    sd["upsample.resnet.conv_out.weight"] = w(res_out, compute, 1)
    sd["upsample.resnet.conv_out.bias"] = w(res_out)
    for i, s in enumerate(factors):
        sd[f"upsample.up_layers.{2 * i + 1}.weight"] = w(1, 1, 1, 2 * s + 1)

    aux = res_out // 4
    sd["I.weight"] = w(rnn_dims, feat + aux + 1)
    sd["I.bias"] = w(rnn_dims)
    for rnn, in_dim in (("rnn1", rnn_dims), ("rnn2", rnn_dims + aux)):
        sd[f"{rnn}.weight_ih_l0"] = w(3 * rnn_dims, in_dim)
        sd[f"{rnn}.weight_hh_l0"] = w(3 * rnn_dims, rnn_dims)
        sd[f"{rnn}.bias_ih_l0"] = w(3 * rnn_dims)
        sd[f"{rnn}.bias_hh_l0"] = w(3 * rnn_dims)
    sd["fc1.weight"] = w(fc_dims, rnn_dims + aux)
    sd["fc1.bias"] = w(fc_dims)
    sd["fc2.weight"] = w(fc_dims, fc_dims + aux)
    sd["fc2.bias"] = w(fc_dims)
    sd["fc3.weight"] = w(2 ** bits, fc_dims)
    sd["fc3.bias"] = w(2 ** bits)
    sd["step"] = np.array([12345], np.int64)
    return sd


def test_wavernn_conversion_structure_and_forward():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from convert_torch_checkpoint import convert_wavernn

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=9, pad=2, upsample_factors=(5, 5, 11),
        feat_dims=80, compute_dims=16, res_out_dims=16, res_blocks=2,
        mode="RAW",
    )
    sd = synth_wavernn_state_dict()
    params, stats, step = convert_wavernn(sd, cfg.res_blocks, cfg.upsample_factors)
    assert step == 12345

    model = WaveRNN(cfg)
    x = jnp.zeros((1, 5 * 275))
    m = jnp.zeros((1, 5 + 2 * cfg.pad, cfg.feat_dims))
    ref = model.init(jax.random.PRNGKey(0), x, m, True)

    # identical tree structure
    ref_paths = set(jax.tree_util.tree_leaves_with_path(ref["params"]) and
                    [jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_leaves_with_path(ref["params"])])
    got_paths = set(jax.tree_util.keystr(p) for p, _ in
                    jax.tree_util.tree_leaves_with_path(params))
    assert ref_paths == got_paths, (ref_paths ^ got_paths)

    # identical shapes
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(ref["params"]),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(params),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
    ):
        assert a.shape == b.shape, (jax.tree_util.keystr(pa), a.shape, b.shape)

    # the converted checkpoint actually runs
    out = model.apply(
        {"params": params, "batch_stats": stats}, x, m, False
    )
    assert out.shape == (1, 5 * 275, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_gru_weight_transpose_convention():
    """Converted GRU must equal torch's cell on the same inputs."""
    import sys
    from pathlib import Path

    import torch

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from convert_torch_checkpoint import _gru

    from wavernn_tpu.ops.rnn import gru_cell_step

    torch.manual_seed(0)
    cell = torch.nn.GRUCell(6, 5)
    sd = {f"g.{k}": v.detach().numpy() for k, v in cell.state_dict().items()}
    w = _gru(sd, "g", cell=True)

    x = torch.randn(3, 6)
    h = torch.randn(3, 5)
    want = cell(x, h).detach().numpy()
    got = gru_cell_step(
        jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
        jnp.asarray(w["w_ih"]), jnp.asarray(w["w_hh"]),
        jnp.asarray(w["b_ih"]), jnp.asarray(w["b_hh"]),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
