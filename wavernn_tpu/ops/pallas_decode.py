"""Fused Pallas TPU kernel for the WaveRNN sample loop (SURVEY.md C22).

The reference spends its entire generation budget in a Python loop calling
cuDNN GRUCells once per audio sample (ref: models/fatchord_version.py:201-241).
The lax.scan port removes dispatch overhead but still re-streams ~17 MB of
f32 weights from HBM every step (~30 µs/step measured on v5e).

This kernel instead:
  * pins ALL network weights in VMEM as bf16 (~9 MB) for the whole decode —
    per-step weight traffic drops from HBM bandwidth to VMEM bandwidth,
  * streams the conditioning features from HBM in double-buffered chunks,
    overlapping DMA with compute,
  * fuses the two GRUs, three FC heads, and the categorical/MOL sampling
    (on-core PRNG) into one program — zero HBM round-trips per step,
  * writes samples back chunk-wise.

Lane-alignment layout: per-step conditioning is packed into two 128-lane
segments — seg0 = [mel(80) | a1(aux_d) | 0...], seg1 = [a2 | a3 | a4 | 0...]
— and every weight matrix is split/row-padded so all matmul contraction dims
are multiples of 128.  The scalar feedback sample enters via a broadcast
multiply with the first row of the I matrix (no unaligned concat).

Matmuls accumulate in f32 (preferred_element_type); recurrent state stays
f32.  Batch (fold) dimension is padded to the bf16 sublane tile (16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavernn_tpu.ops.decode import DecodeWeights

LANE = 128
SUBLANE_BF16 = 16
CHUNK = 128   # decode steps per conditioning DMA chunk
UNROLL = 8    # steps per unrolled inner block (state in registers)
SEG = 2 * LANE  # packed conditioning width per step
B_TILE = 128  # max folds per grid program (bounds VMEM scratch).
              # Throughput rises with width — measured fold-samples/us on
              # v5e (int8_hh, T=12160): 11.5 at B=48, 14.9 at 128, 17.5 at
              # 256 as 2x128 groups (beats one 256-wide group, 16.9) — so
              # 128 rows = the MXU-full sweet spot per grid program; wide
              # co-batched serving rides it (generate_batch).  Widths past
              # one tile split into BALANCED equal-width groups
              # (fold_tiling: 160 -> 2x80, not 2x128), so mid-range fold
              # counts never pay round-up-to-tile padding.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_tiling(B: int, b_tile: int = None):
    """Fold-group geometry: (B_pad, n_groups, kernel_B).

    One group when B fits in a tile; otherwise the rows split into
    ceil(B / b_tile) BALANCED groups of equal sublane-aligned width —
    e.g. 160 folds run as 2x80-row programs, not 2x128 (round-up-to-tile
    wasted up to ~60% MXU rows for widths just past a tile boundary).
    Idempotent: fold_tiling(B_pad) returns the same geometry, so callers
    that pre-pad conditioning with this function always agree with
    decode()'s own computation.
    """
    b_tile = B_TILE if b_tile is None else b_tile
    assert b_tile % SUBLANE_BF16 == 0, (
        f"b_tile={b_tile} must be sublane-aligned ({SUBLANE_BF16}) — a "
        "non-aligned tile would round kernel_B past it, silently exceeding "
        "the VMEM bound b_tile exists to enforce")
    if B <= b_tile:
        return _round_up(max(B, SUBLANE_BF16), SUBLANE_BF16), 1, \
            _round_up(max(B, SUBLANE_BF16), SUBLANE_BF16)
    n_groups = -(-B // b_tile)
    kernel_B = _round_up(-(-B // n_groups), SUBLANE_BF16)
    return kernel_B * n_groups, n_groups, kernel_B


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 random bits → uniform floats in (0, 1)."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0 + 1e-7


def _gumbel(bits: jnp.ndarray) -> jnp.ndarray:
    u = _uniform_from_bits(bits)
    return -jnp.log(-jnp.log(u))


def _row_argmax(x: jnp.ndarray) -> jnp.ndarray:
    """Argmax along the last axis (B, N) → (B, 1) int32 (first max wins)."""
    n = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    m = jnp.max(x, axis=-1, keepdims=True)
    hit = jnp.where(x >= m, idx, n)
    return jnp.min(hit, axis=-1, keepdims=True)


def _decode_kernel(
    # scalar prefetch
    seed_ref,             # (1,) int32 in SMEM
    # inputs: [int8_ff: ffq quant multipliers in SMEM], cond stream, then
    # the packed weights in _weight_order (int8 variants append their
    # scale rows), then outputs/scratch
    *rest,
    T: int,
    mode: str,
    n_classes: int,
    deterministic: bool,
    chunk: int = CHUNK,
    unroll: int = UNROLL,
    ablate: frozenset = frozenset(),
    int8_gates: bool = False,
    int8_hh: bool = False,
    fold_major: bool = False,
    int8_ff: bool = False,
):
    # Rejected dev A/B variants (per-block output transpose, legacy argmax
    # MOL selection, Padé-poly gates, bf16 gate transcendentals, ghfirst
    # dot scheduling, UNROLL-batched conditioning dots) were measured and
    # removed in round 5 — docs/ROADMAP.md keeps the numbers.
    if int8_ff:
        # (3,) f32 in SMEM: 127/S for the gru2-input / fc1-input / fc2-input
        # activations (S = calibrated |max| bound, ops/decode.py ff_ranges)
        ffq_ref, rest = rest[0], rest[1:]
    # cond_hbm: time-major pre-gathered (T, B, SEG), or fold-major
    # (B_total, T, SEG) built by fold_major_cond (contiguous per-fold
    # slices; the time-major gather costs ~10x HBM speed-of-light)
    cond_hbm, rest = rest[0], rest[1:]
    names = _weight_order(int8_gates, int8_hh, int8_ff)
    ws = dict(zip(names, rest))
    if fold_major:
        (out_hbm,         # f32 in HBM — (T,B) time-major or (B,T)
         cond_vmem,       # (2, CHUNK, B, SEG) bf16 (time-major, compute)
         stage_vmem,      # (2, B, CHUNK, SEG) bf16 (fold-major DMA stage)
         out_vmem,        # f32 — (2,CHUNK,B) time-major or (2,B,CHUNK)
         x_ref,           # (B, 1) f32 — current sample
         h1_ref, h2_ref,  # (B, H) f32
         in_sems, out_sems) = rest[len(names):]
    else:
        (out_hbm,
         cond_vmem,
         out_vmem,
         x_ref,
         h1_ref, h2_ref,
         in_sems, out_sems) = rest[len(names):]
    w_x, w_Im, b_I = ws["w_x"], ws["w_Im"], ws["b_I"]
    u1, w_Im1 = ws["u1"], ws["w_Im1"]            # precomposed gru1 inputs
    w_hh1, b1, b_hh1_n = ws["w_hh1"], ws["b1"], ws["b_hh1_n"]
    w_ih2x, w_hh2, b2, b_hh2_n = (ws["w_ih2x"], ws["w_hh2"], ws["b2"],
                                  ws["b_hh2_n"])
    w_fc1x, b_fc1 = ws["w_fc1x"], ws["b_fc1"]
    w_fc2x, b_fc2 = ws["w_fc2x"], ws["b_fc2"]
    w_aux, w_fc3, b_fc3 = ws["w_aux"], ws["w_fc3"], ws["b_fc3"]
    # ``ablate`` is a dev-only knob (tools/kernel_breakdown.py): drop named
    # pieces of the per-step work to attribute time. Production passes none.
    CHUNK_ = chunk
    UNROLL_ = unroll
    B = x_ref.shape[0]
    H = h1_ref.shape[1]
    # time-major output works at ANY fold width: the (CHUNK, L_pad) buffer
    # keeps a 128-aligned lane dim (folds padded to L_pad lanes), each block
    # is one aligned (U, L_pad) sublane store (U a multiple of the f32
    # sublane tile), and the DMA lane-slices the real B folds out
    TIME_MAJOR_OUT = UNROLL_ % 8 == 0
    L_PAD = out_vmem.shape[-1] if TIME_MAJOR_OUT else None

    if not deterministic:  # static: deterministic mode uses no RNG at all
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    n_chunks = T // CHUNK_

    g = pl.program_id(0)  # fold-group index
    b0 = pl.multiple_of(g * B, B)

    if fold_major:
        # one strided DMA per chunk: (B, CHUNK, SEG) from each fold's own
        # contiguous row into the fold-major stage; the (B, CHUNK)
        # transpose into the compute buffer happens on-core after the wait
        # (8-sublane blocks), trading ~1.5 MB/chunk of VPU shuffles for
        # the HBM row-gather the time-major layout needed on the host side
        def in_dma(slot, c):
            return pltpu.make_async_copy(
                cond_hbm.at[pl.ds(b0, B), pl.ds(c * CHUNK_, CHUNK_)],
                stage_vmem.at[slot],
                in_sems.at[slot],
            )
    else:
        def in_dma(slot, c):
            return pltpu.make_async_copy(
                cond_hbm.at[pl.ds(c * CHUNK_, CHUNK_), pl.ds(b0, B)],
                cond_vmem.at[slot],
                in_sems.at[slot],
            )

    def out_dma(slot, c):
        if TIME_MAJOR_OUT:
            # out_hbm (T, n_groups*L_PAD) time-major, lane-PADDED per group
            # (DMA lane slices must be 128-aligned, so the full padded lane
            # window is written; the caller strips the padding outside)
            src = out_vmem.at[slot]
            dst = out_hbm.at[pl.ds(pl.multiple_of(c * CHUNK_, CHUNK_),
                                   CHUNK_),
                             pl.ds(pl.multiple_of(g * L_PAD, L_PAD), L_PAD)]
        else:                # out_hbm (B_pad, T): lane-major
            src = out_vmem.at[slot]
            dst = out_hbm.at[pl.ds(b0, B),
                             pl.ds(pl.multiple_of(c * CHUNK_, CHUNK_),
                                   CHUNK_)]
        return pltpu.make_async_copy(src, dst, out_sems.at[slot])

    x_ref[...] = jnp.zeros_like(x_ref)
    h1_ref[...] = jnp.zeros_like(h1_ref)
    h2_ref[...] = jnp.zeros_like(h2_ref)

    in_dma(0, 0).start()

    def bf(x):
        return x.astype(jnp.bfloat16)

    def gdot(a, wq, scale_name):
        """Gate matmul: bf16 (default), or int8 weights + per-row dynamic
        activation quantization (acc in int32, rescaled by act-row x
        weight-column scales).  int8 halves the streamed bytes but its
        serial quant chain costs more than the savings at production fold
        widths (docs/ROADMAP.md round-3 measurements) — kept as an opt-in."""
        if not int8_gates:
            return jnp.dot(bf(a), wq[...], preferred_element_type=jnp.float32)
        sa = jnp.maximum(jnp.max(jnp.abs(a), axis=1, keepdims=True),
                         1e-8) * (1.0 / 127.0)
        qa = jnp.round(a / sa).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qa, wq[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sa * ws[scale_name][...])

    def gdot_ff(a, wq, scale_name, fs_name, qi):
        """Feed-forward gate matmul.  With int8_ff, the matrix streams as
        int8 (per-column scales folded with the activation bound into
        ``fs_name`` at pack time) and the activation quantizes at a FIXED
        calibrated scale — one multiply+clip+round, none of full int8's
        per-row max/divide chain.  Outliers beyond the calibrated bound
        saturate (the bound carries a 1.3x margin; ops/decode.py)."""
        if int8_ff:
            qa = jnp.round(
                jnp.clip(a * ffq_ref[qi], -127.0, 127.0)).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qa, wq[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * ws[fs_name][...]
        return gdot(a, wq, scale_name)

    def gdot_h(h, wq, scale_name):
        """Recurrent-state gate matmul.  With int8_hh, the two big w_hh
        matrices stream as int8 with per-column scales and the state is
        quantized at a FIXED scale — h stays in [-1, 1] by GRU
        construction (n = tanh, update a convex combination), so the
        per-row dynamic max/divide chain that made full int8 a net loss
        (docs/ROADMAP.md round 3) is one multiply+round here."""
        if int8_hh:
            qa = jnp.round(h * 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qa, wq[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (
                ws[scale_name][...] * (1.0 / 127.0))
        return gdot(h, wq, scale_name)

    def gru_gates(gi, gh, h, b_r, b_hh_n_r):
        """Torch-convention GRU update from precomputed input/hidden gate
        pre-activations (f32).  b_r packs b_ih+b_hh for r/z and b_ih for n;
        the hh-side n bias is scaled by r, so it stays separate.

        sigmoid(x) = 0.5*(tanh(x/2)+1) — the same function, but Mosaic's
        tanh lowering is cheaper than sigmoid's, and the gate
        transcendentals are the kernel's largest non-matmul cost
        (1.16 us/step of ~4.5 at B=64, tools/kernel_breakdown.py);
        measured -0.1..-0.2 us/step at narrow widths."""
        if "gates" in ablate:  # dev ablation: linear state update
            return 0.5 * h + 0.01 * (gi[:, :H] + gh[:, :H])
        sg = lambda x: 0.5 * jnp.tanh(0.5 * x) + 0.5
        tot = gi + b_r[...]
        r = sg(tot[:, :H] + gh[:, :H])
        z = sg(tot[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(tot[:, 2 * H:] + r * (gh[:, 2 * H:] + b_hh_n_r[...]))
        return (1.0 - z) * n + z * h

    def chunk_body(chunk, _):
        slot = chunk % 2

        @pl.when(chunk + 1 < n_chunks)
        def _():
            in_dma((chunk + 1) % 2, chunk + 1).start()

        in_dma(slot, chunk).wait()
        if fold_major:
            # stage (B, CHUNK, SEG) -> compute (CHUNK, B, SEG), 8 rows at
            # a time (f32-sublane-aligned stores)
            for kb in range(CHUNK_ // 8):
                cond_vmem[slot, pl.ds(kb * 8, 8)] = jnp.swapaxes(
                    stage_vmem[slot, :, pl.ds(kb * 8, 8)], 0, 1)

        @pl.when(chunk >= 2)
        def _():
            out_dma(slot, chunk - 2).wait()

        if not TIME_MAJOR_OUT and "out_write" not in ablate:
            out_vmem[slot] = jnp.zeros_like(out_vmem[slot])

        H3 = 3 * H
        F = w_fc1x.shape[1]

        def one_step(i, x, h1, h2):
            """One sample step on register-resident state; returns
            (sample, x', h1', h2').  (Cross-step software pipelining of the
            hidden gate dots was tried and measured SLOWER on v5e — the
            carried (B,3H) pre-activations cost more VMEM traffic than the
            overlap saves.)"""
            if "cond_read" in ablate:  # dev ablation
                cond = jnp.zeros((B, SEG), jnp.bfloat16)
            else:
                cond = cond_vmem[slot, i]      # (B, SEG) bf16
            seg0 = cond[:, :LANE]              # [mel | a1 | 0]
            seg1 = cond[:, LANE:]              # [a2 | a3 | a4 | 0]

            # All aux-segment projections in ONE dot (w_aux columns =
            # [gru2-a2 | fc1-a3 | fc2-a4]): fewer MXU launches per step.
            aux_all = jnp.dot(seg1, w_aux[...],
                              preferred_element_type=jnp.float32)

            # gru1's input gates, PRECOMPOSED through the I projection
            # (gi1 = xi @ w_ih1 with xi linear in [x, seg0] — the
            # product matrices are folded at pack time, removing a
            # serial dot and shrinking the contraction from H to LANE
            # rows):
            gi1 = x * u1[...] + jnp.dot(
                seg0, w_Im1[...], preferred_element_type=jnp.float32)

            # I projection (still needed for the residual path)
            xi = (
                x * w_x[...]
                + jnp.dot(seg0, w_Im[...],
                          preferred_element_type=jnp.float32)
                + b_I[...]
            )

            gh1 = gdot_h(h1, w_hh1, "w_hh1_s")
            h1 = gru_gates(gi1, gh1, h1, b1, b_hh1_n)
            xr = xi + h1

            gi2 = gdot_ff(xr, w_ih2x, "w_ih2x_s", "w_ih2x_fs", 0) \
                + aux_all[:, :H3]
            gh2 = gdot_h(h2, w_hh2, "w_hh2_s")
            h2 = gru_gates(gi2, gh2, h2, b2, b_hh2_n)
            xr = xr + h2

            f1 = jax.nn.relu(
                gdot_ff(xr, w_fc1x, "w_fc1x_s", "w_fc1x_fs", 1)
                + aux_all[:, H3: H3 + F]
                + b_fc1[...]
            )
            f2 = jax.nn.relu(
                gdot_ff(f1, w_fc2x, "w_fc2x_s", "w_fc2x_fs", 2)
                + aux_all[:, H3 + F:]
                + b_fc2[...]
            )
            logits = (
                jnp.dot(bf(f2), w_fc3[...], preferred_element_type=jnp.float32)
                + b_fc3[...]
            )  # (B, n_out_pad); padded logits carry a -1e30 bias

            if "sample" in ablate:  # dev ablation: tanh of one logit lane
                s = jnp.tanh(logits[:, :1])
                return s, s, h1, h2

            if mode == "RAW":
                if deterministic:
                    scores = logits
                else:
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits(logits.shape), jnp.uint32
                    )
                    scores = logits + _gumbel(bits)
                cls = _row_argmax(scores)
                sample = 2.0 * cls.astype(jnp.float32) / (n_classes - 1.0) - 1.0
            else:  # MOL
                nm = n_classes // 3
                pi = logits[:, :nm]
                mu = logits[:, nm: 2 * nm]
                ls = jnp.maximum(
                    logits[:, 2 * nm: 3 * nm], jnp.float32(np.log(1e-14))
                )
                if deterministic:
                    sel = _row_argmax(pi)
                    idx = jax.lax.broadcasted_iota(jnp.int32, pi.shape, 1)
                    onehot = (idx == sel).astype(jnp.float32)
                else:
                    # max-mask mixture pick: skip the argmax/iota/compare
                    # chain — mask at the max directly.  Equal to argmax
                    # selection except exact f32 score ties (probability ~0
                    # with Gumbel noise; a tie averages the tied mixtures'
                    # parameters for one sample).  Measured -0.07..-0.19
                    # us/step vs argmax (tools/step_opt_probe.py).  ONE PRNG
                    # call per step: lanes [0,nm) drive the Gumbel mixture
                    # pick, lane nm drives the logistic draw.
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits((pi.shape[0], nm + 1)),
                        jnp.uint32,
                    )
                    scores = pi + _gumbel(bits[:, :nm])
                    mx = jnp.max(scores, axis=1, keepdims=True)
                    hit = (scores >= mx).astype(jnp.float32)
                    onehot = hit / jnp.sum(hit, axis=1, keepdims=True)
                mean = jnp.sum(mu * onehot, axis=1, keepdims=True)
                log_scale = jnp.sum(ls * onehot, axis=1, keepdims=True)
                if deterministic:
                    sample = mean
                else:
                    u = jnp.clip(_uniform_from_bits(bits[:, nm:]),
                                 1e-5, 1.0 - 1e-5)
                    sample = mean + jnp.exp(log_scale) * (
                        jnp.log(u) - jnp.log(1.0 - u)
                    )
                sample = jnp.clip(sample, -1.0, 1.0)

            return sample, sample, h1, h2

        # UNROLL steps per loop iteration: recurrent state stays in
        # registers across the block, output is written once per block
        # (lane stores must be tile-aligned, so the (B, CHUNK) tile is
        # read-modify-written — 1/UNROLL as often as a per-step write).
        def block_body(jb, _):
            x = x_ref[...]
            h1 = h1_ref[...]
            h2 = h2_ref[...]
            samples = []
            for u in range(UNROLL_):
                s, x, h1, h2 = one_step(jb * UNROLL_ + u, x, h1, h2)
                samples.append(s)
            x_ref[...] = x
            h1_ref[...] = h1
            h2_ref[...] = h2
            if "out_write" in ablate:  # dev ablation
                return 0
            if TIME_MAJOR_OUT:
                # rows are steps: each block is ONE aligned (U, L_pad)
                # sublane store — no zero/roll/RMW of the chunk tile.  The
                # caller transposes (T, B) → (B, T) outside the kernel.
                # (U per-step (B,1)→(1,B) transposes + lane concat measured
                # no slower than one (B,U)→(U,B) block transpose.)
                blk = jnp.concatenate([s.T for s in samples], axis=0)
                out_vmem[slot, pl.ds(pl.multiple_of(jb * UNROLL_, UNROLL_),
                                     UNROLL_), :] = jnp.pad(
                    blk, ((0, 0), (0, L_PAD - B)))
                return 0
            blk = jnp.concatenate(samples, axis=1)  # (B, UNROLL_)
            # lane-major fallback: place blk at lanes [jb*UNROLL_, ...) by
            # pad→roll→accumulate (tile is zeroed once per chunk; the rolled
            # block is zero outside its lane window, so += is exact and
            # cheaper than an iota/mask/select RMW)
            full = jnp.pad(blk, ((0, 0), (0, CHUNK_ - UNROLL_)))
            rolled = pltpu.roll(full, shift=jb * UNROLL_, axis=1)
            out_vmem[slot] = out_vmem[slot] + rolled
            return 0

        jax.lax.fori_loop(0, CHUNK_ // UNROLL_, block_body, 0)
        out_dma(slot, chunk).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    @pl.when(n_chunks >= 2)
    def _():
        out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

    out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()


def pack_conditioning(mels_up: jnp.ndarray, aux: jnp.ndarray,
                      B_pad: int, T_pad: int) -> jnp.ndarray:
    """(B,T,feat) + (B,T,4*aux_d) → (T_pad, B_pad, SEG) bf16 aligned stream."""
    B, T, feat = mels_up.shape
    aux_d = aux.shape[-1] // 4
    assert feat + aux_d <= LANE, "mel+a1 must fit one lane segment"
    assert 3 * aux_d <= LANE, "a2..a4 must fit one lane segment"

    seg0 = jnp.concatenate(
        [mels_up, aux[..., :aux_d],
         jnp.zeros((B, T, LANE - feat - aux_d), mels_up.dtype)], axis=-1
    )
    seg1 = jnp.concatenate(
        [aux[..., aux_d:], jnp.zeros((B, T, LANE - 3 * aux_d), aux.dtype)],
        axis=-1,
    )
    cond = jnp.concatenate([seg0, seg1], axis=-1)  # (B, T, SEG)
    cond = jnp.pad(cond, ((0, B_pad - B), (0, T_pad - T), (0, 0)))
    return jnp.swapaxes(cond, 0, 1).astype(jnp.bfloat16)


def pack_stream(mels_up: jnp.ndarray, aux_mel: jnp.ndarray,
                total_scale: int) -> jnp.ndarray:
    """(1, L, feat) sample-rate mels + (1, T_m, 4d) MEL-rate aux → one
    packed (L, SEG) bf16 conditioning stream: seg0 = [mel|a1|0],
    seg1 = [a2|a3|a4|0], aux broadcast lazily from mel rate."""
    L, feat = mels_up.shape[1], mels_up.shape[2]
    aux_d = aux_mel.shape[-1] // 4
    assert feat + aux_d <= LANE and 3 * aux_d <= LANE
    a = aux_mel[0]                                  # (T_m, 4d) mel rate
    a_s = jnp.broadcast_to(
        a[:, None, :], (a.shape[0], total_scale, a.shape[-1])
    ).reshape(-1, a.shape[-1])                      # (T_m*ts = L, 4d)
    z = lambda n: jnp.zeros((L, n), mels_up.dtype)
    return jnp.concatenate(
        [mels_up[0], a_s[:, :aux_d], z(LANE - feat - aux_d),
         a_s[:, aux_d:], z(LANE - 3 * aux_d)], axis=-1,
    ).astype(jnp.bfloat16)                          # (L, SEG)


def gather_cond(packed: jnp.ndarray, starts: jnp.ndarray,
                T_pad: int) -> jnp.ndarray:
    """(L, SEG) stream + (B_pad,) fold start offsets → the kernel's
    (T_pad, B_pad, SEG) conditioning, in ONE gather."""
    idx = starts[None, :] + jnp.arange(T_pad)[:, None]
    return packed[idx]


def fold_major_cond(packed: jnp.ndarray, starts, T_pad: int) -> jnp.ndarray:
    """(L, SEG) flat stream + fold start offsets → FOLD-MAJOR
    (B_pad, T_pad, SEG) conditioning via B contiguous dynamic slices.
    Runs at HBM copy speed; the row-gather form (gather_cond) measured
    ~10x slower on v5e because each gathered row is only 512 B.  ``starts``
    may be a traced int32 array (program reuse across fold layouts)."""
    starts = jnp.asarray(starts, jnp.int32)
    return jnp.stack([
        jax.lax.dynamic_slice(packed, (starts[b], 0),
                              (T_pad, packed.shape[1]))
        for b in range(starts.shape[0])
    ])


def pack_cond_stream(mels_up: jnp.ndarray, aux_mel: jnp.ndarray,
                     total_scale: int, num_folds_padded: int,
                     target: int, overlap: int, T_pad: int) -> jnp.ndarray:
    """Build the kernel's (T_pad, B_pad, SEG) bf16 conditioning directly
    from the UNfolded sample-rate mels and MEL-rate aux features.

    Equivalent to ``pack_conditioning(fold(mels_up), fold(stretch(aux)))``
    but with one packed (L, SEG) stream + one fold gather instead of
    per-fold f32 copies, a sample-rate aux materialization, and a
    (B,T,SEG)→(T,B,SEG) transpose — measured ~24.5 ms → ~3 ms of HBM churn
    for 24 s of audio on v5e.
    """
    packed = pack_stream(mels_up, aux_mel, total_scale)
    stride = target + overlap
    max_needed = (num_folds_padded - 1) * stride + T_pad
    if max_needed > packed.shape[0]:
        packed = jnp.pad(packed, ((0, max_needed - packed.shape[0]), (0, 0)))
    starts = jnp.arange(num_folds_padded) * stride
    return gather_cond(packed, starts, T_pad)


def pack_weights(w: DecodeWeights, feat: int, aux_d: int, n_out_pad: int,
                 int8_gates: bool = False, int8_hh: bool = False,
                 int8_ff: bool = False, ff_scales=None):
    """Split/pad the decode weights into the kernel's aligned layout.

    ``int8_gates`` stores the three big GRU matrices (w_hh1, gru2's w_ih,
    w_hh2) and the two FC head matrices (~80% of the per-step weight
    bytes) as int8 with per-column
    symmetric scales (activations are dynamically quantized per row
    in-kernel; gate math stays f32).  Round-3 pipelined timing found the
    kernel serial-chain bound rather than weight-streaming bound, so int8
    measures SLOWER at production widths and is opt-in (docs/ROADMAP.md)."""
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    bf = lambda a: jnp.asarray(a, jnp.bfloat16)
    H = w.gru1_w_hh.shape[0]
    F = w.fc1_w.shape[1]

    def q8(mat):
        mat = f32(mat)
        m = jnp.max(jnp.abs(mat), axis=0, keepdims=True)
        s = jnp.where(m > 0, m, 1.0) / 127.0
        return jnp.round(mat / s).astype(jnp.int8), s  # (rows,N) i8, (1,N)

    def pad_rows(mat, row_offset, total_rows):
        out = jnp.zeros((total_rows, mat.shape[1]), mat.dtype)
        return out.at[row_offset: row_offset + mat.shape[0]].set(mat)

    def gru_bias(b_ih, b_hh):
        b = jnp.concatenate([
            f32(b_ih[:H] + b_hh[:H]),
            f32(b_ih[H:2 * H] + b_hh[H:2 * H]),
            f32(b_ih[2 * H:]),
        ])[None]
        return b, f32(b_hh[2 * H:])[None]

    b1, b_hh1_n = gru_bias(w.gru1_b_ih, w.gru1_b_hh)
    b2, b_hh2_n = gru_bias(w.gru2_b_ih, w.gru2_b_hh)

    # precompose gru1's input projection through the (linear) I layer:
    # gi1 = xi @ w_ih1, xi = x*w_x + seg0 @ w_Im + b_I
    #     = x*(w_x @ w_ih1) + seg0 @ (w_Im @ w_ih1) + (b_I @ w_ih1)
    ih1 = f32(w.gru1_w_ih)
    u1 = (f32(w.I_w[0])[None] @ ih1)                        # (1, 3H)
    w_Im1 = f32(pad_rows(jnp.asarray(w.I_w[1:], jnp.float32), 0, LANE)) @ ih1
    b1 = b1 + f32(w.I_b)[None] @ ih1

    n_out = w.fc3_w.shape[1]
    pad = n_out_pad - n_out
    w_fc3 = jnp.pad(bf(w.fc3_w), ((0, 0), (0, pad)))
    b_fc3 = jnp.pad(f32(w.fc3_b), (0, pad), constant_values=-1e30)[None]

    if int8_gates:
        w_hh1_q, w_hh1_s = q8(w.gru1_w_hh)
        w_ih2x_q, w_ih2x_s = q8(w.gru2_w_ih[:H])
        w_hh2_q, w_hh2_s = q8(w.gru2_w_hh)
        w_fc1x_q, w_fc1x_s = q8(w.fc1_w[:H])
        w_fc2x_q, w_fc2x_s = q8(w.fc2_w[:F])
        gate_entries = dict(
            w_hh1=w_hh1_q, w_hh1_s=w_hh1_s,
            w_ih2x=w_ih2x_q, w_ih2x_s=w_ih2x_s,
            w_hh2=w_hh2_q, w_hh2_s=w_hh2_s,
            w_fc1x=w_fc1x_q, w_fc1x_s=w_fc1x_s,
            w_fc2x=w_fc2x_q, w_fc2x_s=w_fc2x_s,
        )
    else:
        if int8_hh:
            # the two recurrent matrices (the largest per-step streams):
            # int8 weights + per-column scales; the state side quantizes at
            # a FIXED scale in-kernel (h bounded in [-1,1]), no dynamic chain
            w_hh1_q, w_hh1_s = q8(w.gru1_w_hh)
            w_hh2_q, w_hh2_s = q8(w.gru2_w_hh)
            gate_entries = dict(
                w_hh1=w_hh1_q, w_hh1_s=w_hh1_s,
                w_hh2=w_hh2_q, w_hh2_s=w_hh2_s,
            )
        else:
            gate_entries = dict(
                w_hh1=bf(w.gru1_w_hh),
                w_hh2=bf(w.gru2_w_hh),
            )
        if int8_ff:
            # the three feed-forward matrices on the serial path: int8 with
            # per-column weight scales FUSED with the calibrated activation
            # bound (S/127), so the kernel's rescale is one vector multiply.
            # ff_scales is a traced (3,) f32 [S_xr, S_xr2, S_f1] — changing
            # the calibration never recompiles.
            assert ff_scales is not None
            s_act = jnp.asarray(ff_scales, jnp.float32) * (1.0 / 127.0)
            w_ih2x_q, w_ih2x_s = q8(w.gru2_w_ih[:H])
            w_fc1x_q, w_fc1x_s = q8(w.fc1_w[:H])
            w_fc2x_q, w_fc2x_s = q8(w.fc2_w[:F])
            gate_entries.update(
                w_ih2x=w_ih2x_q, w_ih2x_fs=w_ih2x_s * s_act[0],
                w_fc1x=w_fc1x_q, w_fc1x_fs=w_fc1x_s * s_act[1],
                w_fc2x=w_fc2x_q, w_fc2x_fs=w_fc2x_s * s_act[2],
            )
        else:
            gate_entries.update(
                w_ih2x=bf(w.gru2_w_ih[:H]),
                w_fc1x=bf(w.fc1_w[:H]),
                w_fc2x=bf(w.fc2_w[:F]),
            )

    return dict(
        **gate_entries,
        w_x=f32(w.I_w[0])[None],                               # (1, H)
        w_Im=bf(pad_rows(w.I_w[1:], 0, LANE)),                 # (LANE, H)
        b_I=f32(w.I_b)[None],
        u1=u1, w_Im1=bf(w_Im1),
        b1=b1, b_hh1_n=b_hh1_n,
        b2=b2, b_hh2_n=b_hh2_n,
        b_fc1=f32(w.fc1_b)[None],
        b_fc2=f32(w.fc2_b)[None],
        # fused aux projection: seg1 = [a2|a3|a4|0] rows; columns are
        # [gru2 gates (3H) | fc1 (F) | fc2 (F)]
        w_aux=bf(jnp.concatenate([
            pad_rows(w.gru2_w_ih[H:], 0, LANE),            # a2 rows at 0
            pad_rows(w.fc1_w[H:], aux_d, LANE),            # a3 rows at aux_d
            pad_rows(w.fc2_w[F:], 2 * aux_d, LANE),        # a4 rows at 2*aux_d
        ], axis=1)),
        w_fc3=w_fc3, b_fc3=b_fc3,
    )


def _weight_order(int8_gates: bool, int8_hh: bool = False,
                  int8_ff: bool = False):
    order = [
        "w_x", "w_Im", "b_I",
        "u1", "w_Im1", "w_hh1", "b1", "b_hh1_n",
        "w_ih2x", "w_hh2", "b2", "b_hh2_n",
        "w_fc1x", "b_fc1",
        "w_fc2x", "b_fc2",
        "w_aux",
        "w_fc3", "b_fc3",
    ]
    if int8_gates:
        order += ["w_hh1_s", "w_ih2x_s", "w_hh2_s", "w_fc1x_s", "w_fc2x_s"]
    else:
        if int8_hh:
            order += ["w_hh1_s", "w_hh2_s"]
        if int8_ff:
            order += ["w_ih2x_fs", "w_fc1x_fs", "w_fc2x_fs"]
    return order


@functools.partial(
    jax.jit,
    static_argnames=("mode", "n_classes", "deterministic", "interpret",
                     "b_tile", "chunk", "unroll", "ablate", "out_T",
                     "int8_gates", "int8_hh", "int8_ff"),
)
def decode(
    weights: DecodeWeights,
    mels_up: jnp.ndarray,   # (B, T, feat) f32
    aux: jnp.ndarray,       # (B, T, 4*aux_d) f32
    key: jax.Array,
    mode: str,
    n_classes: int,
    deterministic: bool = False,
    interpret: bool = False,
    b_tile: int = B_TILE,
    chunk: int = CHUNK,
    unroll: int = UNROLL,
    ablate: frozenset = frozenset(),
    cond: jnp.ndarray = None,   # prebuilt (T_pad, B_pad, SEG) bf16 stream
    out_T: int = None,          # real step count when cond is prebuilt
    int8_gates: bool = False,   # int8 GRU gate weights (see pack_weights)
    int8_hh: bool = False,        # int8 w_hh1/w_hh2 + FIXED-scale state quant
    cond_fm: jnp.ndarray = None,  # fold-major (B_pad, T_pad, SEG) bf16
    int8_ff: bool = False,        # int8 w_ih2x/w_fc1x/w_fc2x + calibrated
                                  # FIXED activation scales (ff_scales)
    ff_scales: jnp.ndarray = None,  # traced (3,) f32 activation |max| bounds
) -> jnp.ndarray:
    """Drop-in replacement for ops.decode.decode_scan: (B, T) f32 samples.

    ``b_tile``/``chunk``/``unroll`` tune grid/DMA granularity (defaults are
    the measured-best production values); ``ablate`` is the dev-only
    cost-attribution knob (tools/kernel_breakdown.py).  When ``cond`` is
    given (built by pack_cond_stream), mels_up/aux are ignored and the
    packing stage is skipped.  ``cond_fm`` is the FOLD-MAJOR conditioning
    (fold_major_cond: B contiguous slices of the flat packed stream —
    HBM-speed, no transpose) and the kernel DMAs each fold's chunk window
    from its own row; the time-major row-gather this replaces measured
    ~8 ms of HBM churn per 24 s utterance on v5e."""
    H = weights.gru1_w_hh.shape[0]
    flat = cond_fm is not None
    if flat:
        assert out_T is not None
        B, T = cond_fm.shape[0], out_T
        aux_d = weights.fc1_w.shape[0] - H
        feat = weights.I_w.shape[0] - 1 - aux_d
    elif cond is not None:
        T_pad_c, B_c, _ = cond.shape
        B, T = B_c, (out_T if out_T is not None else T_pad_c)
        aux_d = weights.fc1_w.shape[0] - H
        feat = weights.I_w.shape[0] - 1 - aux_d
    else:
        B, T, feat = mels_up.shape
        aux_d = aux.shape[-1] // 4

    # fold-group tiling: ≤ b_tile folds per grid program (bounds VMEM),
    # balanced widths past one tile (fold_tiling docstring)
    B_pad, n_groups, kernel_B = fold_tiling(B, b_tile)
    T_pad = _round_up(T, chunk)
    time_major_out = unroll % 8 == 0

    if flat:
        assert B_pad == B, (
            f"fold-major decode needs sublane/tile-aligned fold counts: "
            f"got {B}, need {B_pad} (pad with zero rows)")
        assert cond_fm.shape[1] >= T_pad, (cond_fm.shape, T_pad)
        cond = cond_fm
    elif cond is None:
        cond = pack_conditioning(mels_up, aux, B_pad, T_pad)
    else:
        assert cond.shape[0] >= T_pad and cond.shape[1] == B_pad, (
            cond.shape, T_pad, B_pad)
        cond = cond[:T_pad]

    n_out = weights.fc3_w.shape[1]
    n_out_pad = _round_up(n_out, LANE)
    assert not (int8_gates and (int8_hh or int8_ff)), (
        "int8_gates is exclusive with int8_hh/int8_ff")
    if int8_ff:
        assert ff_scales is not None, "int8_ff needs calibrated ff_scales"
    packed = pack_weights(weights, feat, aux_d, n_out_pad,
                          int8_gates=int8_gates, int8_hh=int8_hh,
                          int8_ff=int8_ff, ff_scales=ff_scales)

    seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max, jnp.int32)

    kernel = functools.partial(
        _decode_kernel,
        T=T_pad, mode=mode, n_classes=n_classes, deterministic=deterministic,
        chunk=chunk, unroll=unroll, ablate=ablate,
        int8_gates=int8_gates, int8_hh=int8_hh, fold_major=flat,
        int8_ff=int8_ff,
    )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # cond stays in HBM
    order = _weight_order(int8_gates, int8_hh, int8_ff)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in order]

    # scalar prefetch: seed, plus (int8_ff) the 127/S activation quant
    # multipliers — traced, so recalibration never recompiles
    prefetch = (seed,)
    if int8_ff:
        prefetch += (127.0 / jnp.asarray(ff_scales, jnp.float32),)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(n_groups,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, kernel_B, SEG), jnp.bfloat16),
            ] + ([pltpu.VMEM((2, kernel_B, chunk, SEG), jnp.bfloat16)]
                 if flat else []) + [
                pltpu.VMEM((2, chunk, _round_up(kernel_B, LANE))
                           if time_major_out
                           else (2, kernel_B, chunk), jnp.float32),
                pltpu.VMEM((kernel_B, 1), jnp.float32),
                pltpu.VMEM((kernel_B, H), jnp.float32),
                pltpu.VMEM((kernel_B, H), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (T_pad, n_groups * _round_up(kernel_B, LANE)) if time_major_out
            else (B_pad, T_pad),
            jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*prefetch, cond, *[packed[k] for k in order])

    if time_major_out:
        L_pad = _round_up(kernel_B, LANE)
        out = out.reshape(T_pad, n_groups, L_pad)[:, :, :kernel_B]
        out = out.reshape(T_pad, B_pad)
        return jnp.swapaxes(out, 0, 1)[:B, :T]
    return out[:B, :T]
