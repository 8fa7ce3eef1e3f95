"""Fused vocoder resblock-group stage as a Pallas TPU kernel.

A HiFi-GAN stage's resblock group — ``mean_j(resblock_j(x))`` over 3
parallel residual branches of dilated convs (phoonnx_train/vits/
models.py:335-346, our modules.resblock{1,2}) — is the HBM-bandwidth
hot spot of synthesis: XLA materializes every conv's input/output in
HBM, ~14 full-tensor passes per stage over tensors that reach 16.8 MB
(T=131072 at 128 packed lanes). The arithmetic is tiny by comparison
(bandwidth-bound at <10% MXU utilization).

This kernel computes the ENTIRE group tile-by-tile in VMEM: exactly one
HBM read of the stage input and one write of the stage output. Halo
context comes from a rolling carry — the sequential Pallas grid keeps
the previous tile (and the tail of the one before it) in persistent
scratch, and step ``t`` computes output tile ``t - 1`` using the head
of the tile fetched at step ``t`` (one extra drain step per element). Convs are expressed in tap form — a channel-packed conv
is a sum over a few static row offsets of ``x[t+off] @ W_off`` with
dense ``[L, L]`` tap matrices (L = pack_r * C lanes, built by the same
placement transform as nn.build_packed_kernel) — so every tap is one
MXU matmul over a [TILE, L] row window and all intermediates stay
on-chip.

Halo correctness: each tile is computed on a window extended by
``halo = sum of per-conv extents along the deepest branch``; values
near the extended edges are inexact (their own context is missing) but
the inexactness penetrates at most one conv-extent per conv, so the
central TILE rows are EXACT — the standard overlap-compute scheme. At
the true array edges the in-kernel validity mask (``bound``) zeroes
every activation outside ``[0, valid)``, which reproduces the convs'
zero padding exactly (and neutralizes stale carry scratch at element
boundaries).

Inference-only by construction: specs are attached by the engine's
pack_decoder_params step (prebuilt packed kernels), which training
never uses; the scan/XLA path keeps autodiff.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from phoonnx_tpu.models.vits import nn
from phoonnx_tpu.models.vits.statics import (StaticFloat, StaticInt,
                                             StaticTuple)

Array = jax.Array

TILE_CANDIDATES = (1024, 512, 256, 128)
_VMEM_BUDGET = 12 * 1024 * 1024

# Test hook: run the kernel in interpreter mode on non-TPU backends so
# CPU CI exercises the exact kernel semantics.
FORCE_INTERPRET = False

# Perf-decomposition experiment knobs (bench tooling only; NOT correct):
# "nomask" skips the validity-bound multiplies, "nodots" skips the tap
# matmuls, "nodma"  feeds the assembled window from the center block only.
import os as _os
_EXPERIMENT = _os.environ.get("PHOONNX_FUSED_STAGE_EXPERIMENT", "")


def enabled() -> bool:
    return jax.default_backend() == "tpu" or FORCE_INTERPRET


def _conv_taps(weight: Array, bias: Optional[Array], r: int,
               dilation: int, padding: int):
    """Torch-layout [O, I, K] conv -> tap form for the packed view.

    Returns (offsets, mats [n_taps, L_in, L_out], bias [L_out]): the conv
    over the packed [B, T/r, r*C] view is y[t] = sum_j x[t+off_j] @ M_j.
    Mirrors nn.conv1d_packed_io's two construction paths exactly
    (block-diagonal when r | dilation, dense spread otherwise). Runs in
    numpy — specs are built at engine init from concrete weights, and
    eager jnp placement ops serialize into per-op device programs on a
    remote-compile relay.
    """
    weight = np.asarray(weight)
    bias = None if bias is None else np.asarray(bias)
    out_ch, in_ch, kernel = weight.shape
    if r == 1:
        offsets = tuple(j * dilation - padding for j in range(kernel))
        mats = np.transpose(weight, (2, 1, 0))  # [K, I, O]
        b = bias
    elif dilation % r == 0 and padding % r == 0:
        wb = np.zeros((r * out_ch, r * in_ch, kernel), weight.dtype)
        for phi in range(r):
            wb[phi * out_ch:(phi + 1) * out_ch,
               phi * in_ch:(phi + 1) * in_ch, :] = weight
        dd, pad = dilation // r, padding // r
        offsets = tuple(j * dd - pad for j in range(kernel))
        mats = np.transpose(wb, (2, 1, 0))
        b = None if bias is None else np.tile(bias, r)
    else:
        wp, pad_l, _pad_r = nn.build_packed_kernel_np(weight, r, dilation,
                                                      padding)
        offsets = tuple(j - pad_l for j in range(wp.shape[-1]))
        mats = np.transpose(wp, (2, 1, 0))
        b = None if bias is None else np.tile(bias, r)
    if b is None:
        b = np.zeros((mats.shape[-1],), weight.dtype)
    return offsets, mats, b


def build_group_spec(blocks, pack_r: int, lrelu_slope: float,
                     dtype=jnp.float32, post=None, dil_scale: int = 1):
    """Spec for one stage's resblock group, or None if it won't pay.

    blocks: the stage's resblock param subtrees (modules.init_resblock1/2
    layout). The spec carries the stacked tap matrices (one traced array,
    part of the params pytree) plus a static program of branches ->
    residual units -> convs.

    post: optional (weight [1, C, K], bias, padding, slope) — fuses the
    generator's tail (leaky_relu(slope) -> conv_post -> tanh) as a
    kernel epilogue. The group's full-width output is then never written
    to HBM; the kernel's only output is the r-lane packed audio block
    (saves a write+read of the widest tensor in the model).

    dil_scale: BATCH-PACKED lane mode (the r4 #3 experiment,
    COMPONENTS.md "batch-packing the packed stages"): with
    ``dil_scale == pack_r`` the lane blocks hold ``pack_r`` independent
    BATCH elements at full time resolution instead of ``pack_r`` time
    phases of one element — mathematically identical to scaling every
    conv's dilation/padding by ``pack_r`` over the packed view, which
    routes _conv_taps to its block-diagonal branch (identical weight
    blocks per lane group, offsets in full-resolution rows). Input
    layout: ``[B/r, T, r*C]`` with lane block e = batch element
    ``bg*r + e``. Equal-length elements only (the in-kernel validity
    mask is per lane GROUP, phase semantics).
    """
    branches = []
    all_mats, all_biases = [], []
    n_taps_total = 0
    lanes = None
    for block in blocks:
        k = int(block["kernel_size"])
        if "convs1" in block:  # resblock1: (conv1 at d, conv2 at 1) units
            units_src = [
                ((c1, int(d)), (c2, 1))
                for c1, c2, d in zip(block["convs1"], block["convs2"],
                                     block["dilations"])
            ]
        else:  # resblock2: single-conv units
            units_src = [((c, int(d)),)
                         for c, d in zip(block["convs"], block["dilations"])]
        units = []
        for unit_src in units_src:
            convs = []
            for conv, d in unit_src:
                pad = (k * d - d) // 2
                offsets, mats, b = _conv_taps(
                    nn.resolve_weight(conv).astype(dtype),
                    None if conv.get("bias") is None
                    else conv["bias"].astype(dtype),
                    pack_r, d * dil_scale, pad * dil_scale)
                lanes = mats.shape[-1]
                convs.append((n_taps_total, offsets, len(all_biases)))
                n_taps_total += len(offsets)
                all_mats.append(mats)
                all_biases.append(b)
            units.append(tuple(convs))
        branches.append(tuple(units))

    # halo: worst-case exactness loss per branch chain (one max-extent
    # per conv, sequentially); MAXOFF: single-conv tap reach
    max_off = 0
    halo = 0
    for branch in branches:
        h = 0
        for unit in branch:
            for _w0, offsets, _b in unit:
                ext = max(-min(offsets), max(offsets))
                h += ext
                max_off = max(max_off, ext)
        halo = max(halo, h)
    post_spec = None
    if post is not None:
        pw, pb, ppad, pslope = post
        p_off, p_mats, p_bias = _conv_taps(
            pw.astype(dtype), None if pb is None else pb.astype(dtype),
            pack_r, 1, ppad)
        p_ext = max(-min(p_off), max(p_off))
        halo += p_ext
        max_off = max(max_off, p_ext)
        post_spec = (p_off, p_mats, p_bias, float(pslope))
    hb = halo + max_off

    # adaptive tile: big specs (resblock1's 126-tap stages) trade tile
    # rows for weight residency; halo-recompute overhead grows as the
    # tile shrinks, so prefer the largest tile that fits
    esize = np.dtype(dtype).itemsize
    tile = None
    for cand in TILE_CANDIDATES:
        if hb > cand:
            continue
        rows = cand + 2 * hb
        n_work = 1 + 3 * len(branches)                 # asm + cur/act/tmp
        vmem = (n_taps_total * lanes * lanes * esize   # taps
                + n_work * rows * lanes * esize        # work buffers
                + (cand + hb) * lanes * esize          # carry scratch
                + 4 * cand * lanes * esize)            # pipeline blocks
        if vmem <= _VMEM_BUDGET:
            tile = cand
            break
    if tile is None:
        return None  # oversized taps or degenerate halo; keep XLA path

    spec = {
        "tile": StaticInt(tile),
        "W": jnp.asarray(np.concatenate(all_mats, axis=0)),  # [n_taps, L, L]
        "b": jnp.asarray(np.stack(all_biases, axis=0)),      # [n_convs, L]
        "branches": StaticTuple(branches),
        "r": StaticInt(pack_r),
        "L": StaticInt(lanes),
        "hb": StaticInt(hb),
        "max_off": StaticInt(max_off),
        "slope": StaticFloat(lrelu_slope),
    }
    if post_spec is not None:
        p_off, p_mats, p_bias, pslope = post_spec
        spec["postW"] = jnp.asarray(p_mats)       # [p_taps, L, r_out]
        spec["postB"] = jnp.asarray(p_bias)       # [r_out]
        spec["post_offsets"] = StaticTuple(p_off)
        spec["post_slope"] = StaticFloat(pslope)
    return spec


def usable(spec, pack_r: int, x: Array) -> bool:
    """Measured policy (v5e, chained A/B, tools/bench_tail_zero.py +
    tools/bench_vocoder_parts.py): the fused stage wins at every batch
    and dtype for packed (r > 1) stages — fp32 batch-1 decode
    1.57->0.71 ms, bf16 batched decode -11/-14% at b16/b64 vs the
    XLA path with its padding-parity tail zeroing. The exception is
    unpacked full-lane stages (r == 1, C >= 128) at batch: the kernel's
    sequential (batch, tile) grid gives zero batch amortization
    (~0.038 ms/utt flat), while XLA's native batched convs amortize
    nearly perfectly above the algorithm-selection hump at small batch
    (0.035 b1, ~0.10 b2-b4, 0.021 b8, 0.016 ms/utt b16) — so r == 1
    stages hand off to the XLA conv path from batch 8 up."""
    return (spec is not None and enabled()
            and int(spec["r"]) == pack_r and int(spec["L"]) == x.shape[-1]
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and not (int(spec["r"]) == 1 and x.shape[0] >= 8))


def _kernel(len_ref, xc_ref, w_ref, b_ref, out_ref,
            tail, prev, asm, cur, act, tmp, *, branches, tile, hb,
            max_off, slope, n_blocks, out_dtype, t_true, pack_r, lane_c,
            n_tiles, precision=None, pw_ref=None, pb_ref=None,
            post_offsets=None, post_slope=None):
    """cur/act/tmp are per-branch tuples of scratch refs."""
    from jax.experimental import pallas as pl

    rows = tile + 2 * hb
    wlen = rows - 2 * max_off
    win = slice(max_off, rows - max_off)
    t_step = pl.program_id(1)
    # hoisted out of pl.when: program_id inside a cond branch has no
    # CPU lowering in interpret mode
    valid = len_ref[pl.program_id(0)]
    g0 = (t_step - 1) * tile - hb

    # Rolling-carry pipeline: the grid runs one extra step per element;
    # step t computes output tile j = t-1 from the PREVIOUS step's block
    # (carried in ``prev``), the tail of the block before it (``tail``),
    # and the head of the block read THIS step. Each input tile is read
    # from HBM exactly once (the old 3-block halo scheme read everything
    # three times, and its wrapper pre-padded the whole array in HBM).
    # Cross-element carry garbage at j == 0 and rows past the array end
    # are neutralized by the ``bound`` mask below (g < 0 / g >= t_true),
    # exactly as the old scheme's zero pre-padding was.

    @pl.when(t_step > 0)
    def _compute():
        # assemble [prev-prev tail | prev | current head]
        asm[0:hb, :] = tail[:, :]
        asm[hb:hb + tile, :] = prev[:, :]
        asm[hb + tile:rows, :] = xc_ref[0, 0:hb, :]
        _compute_group(valid, g0, asm, w_ref, b_ref, out_ref,
                       cur, act, tmp, branches=branches, tile=tile,
                       hb=hb, max_off=max_off, slope=slope,
                       n_blocks=n_blocks, out_dtype=out_dtype,
                       t_true=t_true, pack_r=pack_r, lane_c=lane_c,
                       precision=precision, pw_ref=pw_ref, pb_ref=pb_ref,
                       post_offsets=post_offsets, post_slope=post_slope)

    # carry for the next step (the last step's update is dead)
    @pl.when(t_step == 0)
    def _init_tail():
        # never read uninitialized ``prev``: fresh VMEM may hold NaN/Inf
        # bit patterns and the multiply-mask cannot cancel those
        tail[:, :] = jnp.zeros_like(tail)

    @pl.when(t_step > 0)
    def _carry_tail():
        tail[:, :] = prev[tile - hb:tile, :]

    prev[:, :] = xc_ref[0, :, :]


def _compute_group(valid, g0, asm, w_ref, b_ref, out_ref, cur, act, tmp,
                   *, branches, tile, hb, max_off, slope, n_blocks,
                   out_dtype, t_true, pack_r, lane_c, precision=None,
                   pw_ref=None, pb_ref=None, post_offsets=None,
                   post_slope=None):
    rows = tile + 2 * hb
    wlen = rows - 2 * max_off
    win = slice(max_off, rows - max_off)

    # XLA-path parity at the true edges: every conv zero-pads its OWN
    # input, so intermediate time positions outside [0, valid) must read
    # as zeros — zero-extended x alone lets biases/residuals propagate
    # into the edge region (same effect engine._get_decode_chunk
    # documents). ``valid`` is the per-batch-element true length in TIME
    # positions (callers pass t_true * pack_r when unmasked), so a
    # bucket-padded decode is bit-equal to the exact-length decode.
    g = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + g0
    # float multiply-mask: [rows, 1] i1 broadcasts hit Mosaic relayout
    # limits, a dtype-matched multiplicand doesn't. Select in f32 (the
    # i32 compare's native (8,128) tiling) and cast — selecting straight
    # into bf16's (16,128) tiling is itself an unsupported i1 relayout.
    if pack_r == 1:
        keep = (g >= 0) & (g < jnp.minimum(valid, t_true))
        bound = jnp.where(keep, jnp.ones((rows, 1), jnp.float32),
                          jnp.zeros((rows, 1), jnp.float32)).astype(
                              out_dtype)
    else:
        # packed rows carry pack_r time positions across the lane dim
        # (lane block phi = lane // C): mask at sample granularity
        lanes = asm.shape[-1]
        phi = (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
               // lane_c)
        pos = g * pack_r + phi
        keep = (g >= 0) & (g < t_true) & (pos < valid)
        bound = jnp.where(keep, jnp.ones((rows, lanes), jnp.float32),
                          jnp.zeros((rows, lanes), jnp.float32)).astype(
                              out_dtype)

    if "nomask" in _EXPERIMENT:
        bound = jnp.ones((), out_dtype)

    def lrelu(v):
        # max form, exact for 0 < slope < 1 (bf16 vector compares are
        # unsupported on some Mosaic targets; maximum lowers natively)
        return jnp.maximum(v, slope * v) * bound

    def lrelu_at(v, s_):
        return jnp.maximum(v, s_ * v) * bound

    # Per-branch scratch streams (cur/act/tmp) break the write-after-read
    # hazards a single shared buffer set imposes: with distinct refs the
    # branches' op chains are truly independent, so Mosaic's async MXU
    # and VPU queues overlap one branch's tap matmuls with another's
    # activation passes instead of serializing the whole group. Units
    # are walked in lockstep across branches to put independent work
    # adjacent in program order.
    nb = len(branches)
    for bi in range(nb):
        cur[bi][:, :] = asm[:, :]
    max_units = max(len(br) for br in branches)
    for ui in range(max_units):
        for bi, branch in enumerate(branches):
            if ui >= len(branch):
                continue
            src = cur[bi]
            unit = branch[ui]
            for ci, (w0, offsets, b_idx) in enumerate(unit):
                act[bi][:, :] = lrelu(src[:, :])
                y = None
                if "nodots" in _EXPERIMENT:
                    y = act[bi][max_off:max_off + wlen, :].astype(
                        jnp.float32)
                else:
                    for j, off in enumerate(offsets):
                        xs = act[bi][max_off + off: max_off + off + wlen, :]
                        c = jnp.dot(xs, w_ref[w0 + j], precision=precision,
                                    preferred_element_type=jnp.float32)
                        y = c if y is None else y + c
                y = y + b_ref[b_idx, :].astype(jnp.float32)
                if ci + 1 == len(unit):
                    # last conv of the unit: fuse the residual add —
                    # skips a tmp write + read-back pass per unit
                    cur[bi][win, :] = (cur[bi][win, :]
                                       + y.astype(out_dtype))
                else:
                    tmp[bi][win, :] = y.astype(out_dtype)
                    src = tmp[bi]
    # mask the OUTPUT rows too: the residual path carries biases into
    # positions >= valid, and the NEXT stage's transposed conv (or the
    # iSTFT head's convs) would tap them back into the valid span
    acc = cur[0][:, :]
    for bi in range(1, nb):
        acc = acc + cur[bi][:, :]
    mean = (acc / jnp.asarray(n_blocks, out_dtype)) * bound
    if pw_ref is None:
        out_ref[0, :, :] = mean[hb:hb + tile, :]
        return
    # fused tail: leaky_relu(post_slope) -> conv_post taps -> tanh; the
    # full-width group output never touches HBM
    act[0][:, :] = lrelu_at(mean, post_slope)
    y = None
    for j, off in enumerate(post_offsets):
        xs = act[0][max_off + off: max_off + off + wlen, :]
        c = jnp.dot(xs, pw_ref[j], precision=precision,
                    preferred_element_type=jnp.float32)
        y = c if y is None else y + c
    y = y + pb_ref[:].astype(jnp.float32)
    audio = jnp.tanh(y).astype(out_dtype)
    lo = hb - max_off  # window coords -> center tile
    out_ref[0, :, :] = audio[lo:lo + tile, :]


def apply_group(spec, x: Array, valid: Optional[Array] = None) -> Array:
    """Fused mean-of-resblocks over a packed stage tensor [B, Tp, L].

    valid: optional [B] per-element true length in TIME positions
    (t_len * r units); positions past it are re-zeroed between convs so
    bucket-padded decodes match exact-length decodes (see
    nn.time_mask_lanes). Defaults to the full array.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, t_len, lanes = x.shape
    hb = int(spec["hb"])
    tile = int(spec["tile"])
    pack_r = int(spec["r"])
    n_tiles = -(-t_len // tile)
    t_pad = n_tiles * tile
    # tile-alignment pad only (identity when already aligned) — the
    # rolling-carry kernel needs no halo pre-padding in HBM
    xp = x if t_pad == t_len else jnp.pad(
        x, ((0, 0), (0, t_pad - t_len), (0, 0)))
    if valid is None:
        lengths = jnp.full((batch,), t_len * pack_r, jnp.int32)
    else:
        lengths = valid.astype(jnp.int32)

    from phoonnx_tpu.models.vits.fused_encoder import resolve_precision

    has_post = "postW" in spec
    rows = tile + 2 * hb
    precision = resolve_precision(None)
    kw = {}
    extra_in = []
    extra_specs = []
    out_lanes = lanes
    if has_post:
        kw = dict(post_offsets=tuple(spec["post_offsets"]),
                  post_slope=float(spec["post_slope"]))
        out_lanes = spec["postW"].shape[-1]
        extra_in = [spec["postW"], spec["postB"]]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)]

    nb = len(spec["branches"])

    def kernel(lens, xc, w, b, *rest):
        if has_post:
            pw, pb, out = rest[0], rest[1], rest[2]
            scratch = rest[3:]
        else:
            pw = pb = None
            out = rest[0]
            scratch = rest[1:]
        tail, prev, asm = scratch[0], scratch[1], scratch[2]
        cur = tuple(scratch[3:3 + nb])
        act = tuple(scratch[3 + nb:3 + 2 * nb])
        tmp = tuple(scratch[3 + 2 * nb:3 + 3 * nb])
        _kernel(lens, xc, w, b, out, tail, prev, asm, cur, act, tmp,
                branches=tuple(spec["branches"]), tile=tile, hb=hb,
                max_off=int(spec["max_off"]),
                slope=float(spec["slope"]),
                n_blocks=nb, out_dtype=x.dtype,
                t_true=t_len, pack_r=pack_r, lane_c=lanes // pack_r,
                n_tiles=n_tiles, precision=precision,
                pw_ref=pw, pb_ref=pb, **kw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lengths [B] lands whole in SMEM
        grid=(batch, n_tiles + 1),
        in_specs=[
            # one read per tile: step t fetches block t (clamped on the
            # carry-drain step, where the unchanged index skips the DMA)
            pl.BlockSpec(
                (1, tile, lanes),
                lambda b, t, *_: (b, jnp.minimum(t, n_tiles - 1), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),   # biases
        ] + extra_specs,
        out_specs=pl.BlockSpec(
            (1, tile, out_lanes),
            lambda b, t, *_: (b, jnp.maximum(t - 1, 0), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hb, lanes), x.dtype),    # tail carry
            pltpu.VMEM((tile, lanes), x.dtype),  # prev block carry
            pltpu.VMEM((rows, lanes), x.dtype),  # asm
        ] + [pltpu.VMEM((rows, lanes), x.dtype)  # per-branch cur/act/tmp
             for _ in range(3 * nb)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, t_pad, out_lanes), x.dtype),
        interpret=FORCE_INTERPRET and jax.default_backend() != "tpu",
    )(lengths, xp, spec["W"], spec["b"], *extra_in)
    return out[:, :t_len]
