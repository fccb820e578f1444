"""Pallas decode kernel tests (interpret mode on CPU).

The kernel must match the lax.scan reference decoder in deterministic
(argmax) sampling mode up to bf16 trajectory noise, and pack weights /
conditioning into the aligned layout correctly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.ops.decode import decode_scan, extract_decode_weights


def small_cfg(mode):
    return WaveRNNConfig(
        rnn_dims=128, fc_dims=128, mode=mode,
        compute_dims=32, res_out_dims=32, res_blocks=2,
    )


def make_inputs(cfg, B=4, T=256):
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    w = extract_decode_weights(v["params"])
    rng = np.random.default_rng(0)
    mels_up = jnp.asarray(rng.uniform(0, 1, (B, T, cfg.feat_dims)), jnp.float32)
    aux = jnp.asarray(rng.uniform(0, 1, (B, T, cfg.res_out_dims)), jnp.float32)
    return w, mels_up, aux


def test_pack_conditioning_layout():
    from wavernn_tpu.ops.pallas_decode import LANE, pack_conditioning

    B, T, feat, aux_d = 2, 8, 80, 8
    rng = np.random.default_rng(1)
    mels = jnp.asarray(rng.uniform(0, 1, (B, T, feat)), jnp.float32)
    aux = jnp.asarray(rng.uniform(0, 1, (B, T, 4 * aux_d)), jnp.float32)
    cond = np.asarray(pack_conditioning(mels, aux, B_pad=16, T_pad=128))
    assert cond.shape == (128, 16, 2 * LANE)
    # seg0 = [mel | a1 | 0]
    np.testing.assert_allclose(cond[:T, :B, :feat],
                               np.swapaxes(np.asarray(mels, np.float32), 0, 1),
                               atol=1e-2)
    np.testing.assert_allclose(cond[:T, :B, feat:feat + aux_d],
                               np.swapaxes(np.asarray(aux[..., :aux_d]), 0, 1),
                               atol=1e-2)
    assert (cond[:, :, feat + aux_d:LANE] == 0).all()
    # seg1 = [a2 a3 a4 | 0]
    np.testing.assert_allclose(cond[:T, :B, LANE:LANE + 3 * aux_d],
                               np.swapaxes(np.asarray(aux[..., aux_d:]), 0, 1),
                               atol=1e-2)
    assert (cond[:, :, LANE + 3 * aux_d:] == 0).all()
    # padding rows/batches are zero
    assert (cond[T:] == 0).all() and (cond[:, B:] == 0).all()


def test_pack_weights_shapes():
    from wavernn_tpu.ops.pallas_decode import LANE, pack_weights

    cfg = small_cfg("RAW")
    w, _, _ = make_inputs(cfg)
    H = cfg.rnn_dims
    packed = pack_weights(w, cfg.feat_dims, cfg.aux_dims, 512)
    assert packed["w_x"].shape == (1, H)
    assert packed["w_Im"].shape == (LANE, H)
    # gru1's input projection is precomposed through the I layer
    assert packed["u1"].shape == (1, 3 * H)
    assert packed["w_Im1"].shape == (LANE, 3 * H)
    assert "w_ih1" not in packed
    # fused aux projection: [gru2 (3H) | fc1 (F) | fc2 (F)]
    assert packed["w_aux"].shape == (LANE, 3 * H + 2 * cfg.fc_dims)
    assert packed["w_fc3"].shape == (cfg.fc_dims, 512)
    # padded logits blocked by -1e30 bias (MOL: 30 → 128 lanes)
    mol = pack_weights(
        extract_decode_weights(
            WaveRNN(small_cfg("MOL")).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                jnp.zeros((1, 5, 80)), True,
            )["params"]
        ),
        cfg.feat_dims, cfg.aux_dims, 128,
    )
    assert mol["w_fc3"].shape[1] == 128
    assert float(mol["b_fc3"][0, -1]) < -1e29
    assert float(mol["b_fc3"][0, 29]) > -1e29
    # aux row placement in the fused matrix: fc1 (a3) block sits at column
    # offset 3H with its rows shifted by aux_d
    w1a = np.asarray(packed["w_aux"], np.float32)[:, 3 * H: 3 * H + cfg.fc_dims]
    assert (w1a[: cfg.aux_dims] == 0).all()
    np.testing.assert_allclose(
        w1a[cfg.aux_dims: 2 * cfg.aux_dims],
        np.asarray(w.fc1_w[H:], np.float32).astype(np.float32),
        atol=1e-2,
    )


@pytest.mark.parametrize("mode", ["RAW", "MOL"])
def test_kernel_matches_scan_deterministic(mode):
    """Interpret-mode kernel vs lax.scan decoder, argmax sampling."""
    from wavernn_tpu.ops import pallas_decode

    cfg = small_cfg(mode)
    w, mels_up, aux = make_inputs(cfg, B=4, T=256)
    key = jax.random.PRNGKey(0)

    try:
        out_k = np.asarray(pallas_decode.decode(
            w, mels_up, aux, key, mode=mode, n_classes=cfg.n_classes,
            deterministic=True, interpret=True,
        ))
    except Exception as e:  # pragma: no cover - interpreter gaps
        pytest.skip(f"pallas interpret mode unavailable: {e}")

    out_s = np.asarray(decode_scan(
        w, mels_up, aux, key, mode=mode, n_classes=cfg.n_classes,
        deterministic=True,
    ))
    agree = np.mean(np.abs(out_k - out_s) < 2e-2)
    assert agree > 0.95, f"agreement {agree}"
    if mode == "MOL":
        # MOL means are smooth in the logits: the first steps must match
        # tightly before bf16 trajectory drift compounds.  (RAW argmax over
        # 512 near-uniform random logits can flip on bf16 rounding.)
        assert np.abs(out_k[:, :20] - out_s[:, :20]).max() < 2e-2


def test_pack_cond_stream_matches_fold_plus_pack():
    """The fused packed-stream conditioning (one gather from a sample-rate
    stream, aux broadcast from mel rate) must reproduce EXACTLY what the
    legacy path (fold_with_overlap per input + stretch + pack_conditioning
    transpose) feeds the kernel."""
    from wavernn_tpu.models.wavernn import stretch_time
    from wavernn_tpu.ops import fold as fold_ops
    from wavernn_tpu.ops.pallas_decode import (
        CHUNK, pack_cond_stream, pack_conditioning,
    )

    rng = np.random.default_rng(5)
    total_scale, feat, aux_d = 20, 80, 8
    T_mel, target, overlap = 40, 100, 20
    L = T_mel * total_scale
    mels_up = jnp.asarray(rng.uniform(0, 1, (1, L, feat)), jnp.float32)
    aux_mel = jnp.asarray(rng.uniform(0, 1, (1, T_mel, 4 * aux_d)), jnp.float32)

    aux_s = stretch_time(aux_mel, total_scale)
    num_folds, _ = fold_ops.fold_shape(L, target, overlap)
    nfp = ((num_folds + 15) // 16) * 16
    mf = fold_ops.fold_with_overlap(mels_up, target, overlap)
    af = fold_ops.fold_with_overlap(aux_s, target, overlap)
    mf = jnp.pad(mf, ((0, nfp - num_folds), (0, 0), (0, 0)))
    af = jnp.pad(af, ((0, nfp - num_folds), (0, 0), (0, 0)))
    fold_T = target + 2 * overlap
    T_pad = ((fold_T + CHUNK - 1) // CHUNK) * CHUNK
    want = np.asarray(pack_conditioning(mf, af, nfp, T_pad))

    got = np.asarray(pack_cond_stream(
        mels_up, aux_mel, total_scale, nfp, target, overlap, T_pad))
    assert got.shape == want.shape
    # compare the region the kernel's output is consumed from: the first
    # fold_T steps of the real folds.  (Padding folds/steps may read real
    # stream samples instead of zeros — their outputs are discarded by the
    # out_T slice and the finalize num_folds mask.)
    np.testing.assert_array_equal(got[:fold_T, :num_folds],
                                  want[:fold_T, :num_folds])


@pytest.mark.parametrize("mode", ["RAW", "MOL"])
def test_kernel_int8_gates_close_to_scan(mode):
    """int8 GRU-gate weights (per-column scales + dynamic per-row activation
    quant) stay distributionally close to the f32 scan decoder."""
    from wavernn_tpu.ops import pallas_decode

    cfg = small_cfg(mode)
    w, mels_up, aux = make_inputs(cfg, B=4, T=256)
    key = jax.random.PRNGKey(0)

    try:
        out_k = np.asarray(pallas_decode.decode(
            w, mels_up, aux, key, mode=mode, n_classes=cfg.n_classes,
            deterministic=True, interpret=True, int8_gates=True,
        ))
    except Exception as e:  # pragma: no cover - interpreter gaps
        pytest.skip(f"pallas interpret mode unavailable: {e}")

    out_s = np.asarray(decode_scan(
        w, mels_up, aux, key, mode=mode, n_classes=cfg.n_classes,
        deterministic=True,
    ))
    agree = np.mean(np.abs(out_k - out_s) < 3e-2)
    assert agree > 0.9, f"agreement {agree}"


@pytest.mark.parametrize("mode", ["RAW", "MOL"])
def test_kernel_int8_ff_close_to_scan(mode):
    """int8 feed-forward weights (per-column scales fused with CALIBRATED
    fixed activation bounds, ops/decode.py ff_ranges) stay distributionally
    close to the f32 scan decoder — composed with int8_hh, the production
    int8 stack."""
    from wavernn_tpu.ops import pallas_decode
    from wavernn_tpu.ops.decode import ff_ranges

    cfg = small_cfg(mode)
    w, mels_up, aux = make_inputs(cfg, B=4, T=256)
    key = jax.random.PRNGKey(0)

    # calibration rows from fold 0, in the kernel's packed lane layout
    d = cfg.res_out_dims // 4
    feat = cfg.feat_dims
    LANE = pallas_decode.LANE
    z = lambda k: jnp.zeros((mels_up.shape[1], k), jnp.float32)
    rows = jnp.concatenate(
        [mels_up[0], aux[0][:, :d], z(LANE - feat - d),
         aux[0][:, d:], z(LANE - 3 * d)], axis=-1)
    ffs = ff_ranges(w, rows, jax.random.PRNGKey(17), mode, cfg.n_classes)
    assert np.all(np.asarray(ffs) > 0)

    try:
        out_k = np.asarray(pallas_decode.decode(
            w, mels_up, aux, key, mode=mode, n_classes=cfg.n_classes,
            deterministic=True, interpret=True, int8_ff=True, int8_hh=True,
            ff_scales=ffs,
        ))
    except Exception as e:  # pragma: no cover - interpreter gaps
        pytest.skip(f"pallas interpret mode unavailable: {e}")

    out_s = np.asarray(decode_scan(
        w, mels_up, aux, key, mode=mode, n_classes=cfg.n_classes,
        deterministic=True,
    ))
    agree = np.mean(np.abs(out_k - out_s) < 3e-2)
    assert agree > 0.9, f"agreement {agree}"


def test_fold_major_cond_matches_gather_interpret():
    """The fold-major conditioning path (fold_major_cond + in-kernel
    staged transpose) must be BIT-EXACT vs the gathered time-major layout
    — it is a pure data-movement change (also verified max|diff|=0.0 on
    real TPU hardware, docs/ROADMAP.md round 4)."""
    from wavernn_tpu.ops import pallas_decode

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    w = extract_decode_weights(v["params"])
    rng = np.random.default_rng(0)
    L, B, T = 96 * 127 + 256, 128, 128  # 2 kernel grid groups
    flat = jnp.asarray(rng.uniform(-1, 1, (L, pallas_decode.SEG)),
                       jnp.bfloat16)
    starts = jnp.asarray(np.arange(B) * 96, jnp.int32)
    cond = pallas_decode.gather_cond(flat, starts, 128)
    fm = pallas_decode.fold_major_cond(flat, starts, 128)
    # b_tile=64 forces 2 sequential grid groups (the production default is
    # 128-wide groups; the multi-group path is what this exercises)
    ref = pallas_decode.decode(
        w, None, None, jax.random.PRNGKey(0), mode="MOL", n_classes=30,
        cond=cond, out_T=T, deterministic=True, interpret=True, b_tile=64)
    out = pallas_decode.decode(
        w, None, None, jax.random.PRNGKey(0), mode="MOL", n_classes=30,
        cond_fm=fm, out_T=T, deterministic=True, interpret=True, b_tile=64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ffs_calibration_is_eager_and_cached():
    """int8_ff calibration runs ONCE, eagerly, on CONCRETE conditioning.
    Before round 5 the calibration was reached only from inside the jitted
    pipeline traces, so the 4096-step B=1 scan was baked into the compiled
    program and re-executed on EVERY generate call (ADVICE r4); now
    :meth:`Generator._ensure_ff_scales` populates a device-array cache
    from a prestaged mel before the pipeline is entered, and the scales
    flow in as a program ARGUMENT."""
    from wavernn_tpu.ops.decode import Generator

    cfg = small_cfg("MOL")
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    gen = Generator(cfg, v, backend="pallas", int8_ff=True)

    mel = np.random.default_rng(3).uniform(0, 1, (80, 12)).astype(np.float32)
    staged = gen.prestage(mel, batched=True, target=550, overlap=275)
    ffs = gen._ensure_ff_scales(staged.mels_dev, 16)
    assert gen._ff_scales is not None
    arr = np.asarray(ffs)
    assert arr.shape == (3,) and (arr > 0).all()
    # second call returns the cache (same object, no recalibration)
    assert gen._ensure_ff_scales(staged.mels_dev, 16) is ffs
    # the streaming front-end reuses the same cache
    assert gen._calibrate_ff(jnp.zeros((8, 256))) is ffs
    # a scan-backend generator calibrates nothing even when forced on
    gen2 = Generator(cfg, v, backend="scan", int8_ff=True)
    assert gen2._ensure_ff_scales(staged.mels_dev, 256) is None


def test_ff_policy_width_adaptive():
    """Default int8_ff='auto': ON only for kernel fold widths at/above the
    measured crossover (FF_AUTO_MIN_KERNEL_B); True/False force globally;
    never under a mesh or the scan backend.  Calibration is skipped
    entirely for dispatches the policy rejects."""
    from wavernn_tpu.ops.decode import FF_AUTO_MIN_KERNEL_B, Generator

    cfg = small_cfg("MOL")
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    gen = Generator(cfg, v, backend="pallas")  # default: auto
    assert gen.int8_ff == "auto"
    assert not gen._ff_policy(16)
    assert not gen._ff_policy(48)
    assert gen._ff_policy(FF_AUTO_MIN_KERNEL_B)
    assert gen._ff_policy(240)  # 2x120 balanced groups
    # narrow dispatch in auto mode: no calibration scan at all
    mel = np.random.default_rng(3).uniform(0, 1, (80, 12)).astype(np.float32)
    staged = gen.prestage(mel, batched=True, target=550, overlap=275)
    assert gen._ensure_ff_scales(staged.mels_dev, 48) is None
    assert gen._ff_scales is None

    forced = Generator(cfg, v, backend="pallas", int8_ff=True)
    assert forced._ff_policy(16) and forced._ff_policy(128)
    off = Generator(cfg, v, backend="pallas", int8_ff=False)
    assert not off._ff_policy(128)
    assert not off._ff_policy(FF_AUTO_MIN_KERNEL_B)


def test_prestaged_geometry_mismatch_raises():
    """Submitting a prestaged handle with a different target/overlap than
    it was staged for must raise (stale fold geometry, ADVICE r4), and the
    typed handle can't be confused with a caller's raw tuple of arrays."""
    import pytest

    from wavernn_tpu.ops.decode import Generator, Prestaged, PrestagedBatch

    cfg = small_cfg("RAW")
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    gen = Generator(cfg, v, backend="scan", frame_bucket=8, fold_bucket=4)
    mel = np.random.default_rng(0).uniform(0, 1, (80, 8)).astype(np.float32)

    staged = gen.prestage(mel, batched=True, target=550, overlap=275)
    assert isinstance(staged, Prestaged)
    with pytest.raises(ValueError, match="re-prestage"):
        gen.submit(staged, batched=True, target=1100, overlap=275,
                   mu_law=True)
    with pytest.raises(ValueError, match="re-prestage"):
        gen.submit(staged, batched=False, target=550, overlap=275,
                   mu_law=True)

    staged_b = gen.prestage_batch([mel, mel], target=550, overlap=275)
    assert isinstance(staged_b, PrestagedBatch)
    with pytest.raises(ValueError, match="re-prestage"):
        gen.submit_batch(staged_b, target=550, overlap=137, mu_law=True)
    # a plain LIST of exactly five mels is a batch of mels, not a handle
    waves = gen.generate_batch([mel] * 5, target=550, overlap=275,
                               mu_law=True)
    assert len(waves) == 5 and all(len(w) == 7 * 275 for w in waves)


def test_fold_tiling_geometry():
    """Balanced fold-group tiling: sublane-aligned single groups up to one
    tile, equal-width groups past it, and idempotence (a caller that
    pre-pads conditioning with fold_tiling always agrees with decode())."""
    from wavernn_tpu.ops.pallas_decode import B_TILE, SUBLANE_BF16, fold_tiling

    assert fold_tiling(1) == (16, 1, 16)
    assert fold_tiling(48) == (48, 1, 48)
    assert fold_tiling(128) == (128, 1, 128)
    # balanced splits, not round-up-to-tile
    assert fold_tiling(129) == (160, 2, 80)
    assert fold_tiling(160) == (160, 2, 80)
    assert fold_tiling(240) == (256, 2, 128)
    assert fold_tiling(257) == (288, 3, 96)
    for b in list(range(1, 300)) + [511, 512, 513, 1000]:
        b_pad, n_groups, kernel_b = fold_tiling(b)
        assert b_pad == n_groups * kernel_b >= b
        assert kernel_b <= B_TILE and kernel_b % SUBLANE_BF16 == 0
        assert fold_tiling(b_pad) == (b_pad, n_groups, kernel_b), b


def test_kernel_balanced_multigroup_matches_scan():
    """Multi-group balanced tiling (B=40, b_tile=16 -> 3 groups of 16 with
    8 zero-pad rows) must decode every REAL fold identically to the
    single-group layout's guarantees (interpret mode vs scan)."""
    from wavernn_tpu.ops import pallas_decode

    cfg = small_cfg("MOL")
    w, mels_up, aux = make_inputs(cfg, B=40, T=256)
    key = jax.random.PRNGKey(0)

    try:
        out_k = np.asarray(pallas_decode.decode(
            w, mels_up, aux, key, mode="MOL", n_classes=cfg.n_classes,
            deterministic=True, interpret=True, b_tile=16,
        ))
    except Exception as e:  # pragma: no cover - interpreter gaps
        pytest.skip(f"pallas interpret mode unavailable: {e}")

    out_s = np.asarray(decode_scan(
        w, mels_up, aux, key, mode="MOL", n_classes=cfg.n_classes,
        deterministic=True,
    ))
    assert out_k.shape == out_s.shape == (40, 256)
    agree = np.mean(np.abs(out_k - out_s) < 2e-2)
    assert agree > 0.95, f"agreement {agree}"
