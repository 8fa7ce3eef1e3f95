"""Piecewise rational-quadratic spline flows, jittable.

Reimplementation of the RQS coupling transform used by the stochastic
duration predictor (reference: phoonnx_train/vits/transforms.py:10-212),
restructured for XLA: no boolean indexing or in-place edits — the spline is
evaluated everywhere and combined with the identity tail via ``where``.
Static shapes throughout; ``inverse`` is a trace-time constant.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _bin_positions(unnormalized: Array, num_bins: int, min_size: float,
                   low: float, high: float) -> Tuple[Array, Array]:
    """Softmax-normalised bin sizes -> (cumulative_knots, bin_sizes)."""
    sizes = jax.nn.softmax(unnormalized, axis=-1)
    sizes = min_size + (1.0 - min_size * num_bins) * sizes
    cum = jnp.cumsum(sizes, axis=-1)
    cum = jnp.pad(cum, [(0, 0)] * (cum.ndim - 1) + [(1, 0)])
    cum = (high - low) * cum + low
    # Pin the endpoints exactly (cumsum rounding would otherwise drift).
    cum = cum.at[..., 0].set(low)
    cum = cum.at[..., -1].set(high)
    return cum, cum[..., 1:] - cum[..., :-1]


def _searchsorted(bin_locations: Array, inputs: Array, eps: float = 1e-6) -> Array:
    locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= locations, axis=-1) - 1


def rational_quadratic_spline(
    inputs: Array,
    unnormalized_widths: Array,
    unnormalized_heights: Array,
    unnormalized_derivatives: Array,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[Array, Array]:
    """Monotone RQS on the box [left,right]x[bottom,top].

    inputs [...]; unnormalized_{widths,heights} [..., K];
    unnormalized_derivatives [..., K+1]. Returns (outputs, logabsdet)
    in the input dtype.

    Half-precision inputs are UPCAST and the spline computed in f32:
    knot positions span [-tail_bound, tail_bound] (±5 here), where
    bf16's 8-bit mantissa quantizes to 0.03125 — wider than the 0.01
    minimum bin, so two consecutive cumsum knots can round to the SAME
    value, collapsing a bin to zero width and sending delta = h/w to
    inf (NaN downstream). Found in round 5 by a real bf16 training
    run: the NaN lived in masked lanes (finite losses!) and poisoned
    every duration-predictor parameter gradient from step ~20 on
    (TRAINING.md "bf16 NaN" note). The spline tensors are [B, T, 1, K]
    — f32 here costs nothing next to the convs around it.
    """
    orig_dtype = inputs.dtype
    if orig_dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
        unnormalized_widths = unnormalized_widths.astype(jnp.float32)
        unnormalized_heights = unnormalized_heights.astype(jnp.float32)
        unnormalized_derivatives = unnormalized_derivatives.astype(
            jnp.float32)
    num_bins = unnormalized_widths.shape[-1]

    cumwidths, widths = _bin_positions(
        unnormalized_widths, num_bins, min_bin_width, left, right
    )
    cumheights, heights = _bin_positions(
        unnormalized_heights, num_bins, min_bin_height, bottom, top
    )
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    bin_idx = _searchsorted(cumheights if inverse else cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    # One-hot contraction instead of take_along_axis: K is tiny (10
    # bins) and TPU lowers the per-element gather terribly (measured
    # 0.146 ms for a [16,128,1] spline batch — most of the SDP's device
    # time); the masked sum is exact (one 1.0 per row, adding zeros)
    # and fuses into plain vector ops.
    onehot = (bin_idx[..., None]
              == jnp.arange(num_bins, dtype=bin_idx.dtype)).astype(
                  inputs.dtype)

    def pick(table: Array) -> Array:
        # tables may carry K+1 knots; indices are clipped to [0, K-1]
        return jnp.sum(table[..., :num_bins] * onehot, axis=-1)

    in_cumwidths = pick(cumwidths)
    in_widths = pick(widths)
    in_cumheights = pick(cumheights)
    in_heights = pick(heights)
    delta = heights / widths
    in_delta = pick(delta)
    in_deriv = pick(derivatives)
    in_deriv_p1 = pick(derivatives[..., 1:])

    if inverse:
        term = inputs - in_cumheights
        a = term * (in_deriv + in_deriv_p1 - 2 * in_delta) + in_heights * (
            in_delta - in_deriv
        )
        b = in_heights * in_deriv - term * (
            in_deriv + in_deriv_p1 - 2 * in_delta
        )
        c = -in_delta * term
        discriminant = jnp.maximum(b * b - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * in_widths + in_cumwidths

        theta_1m = root * (1 - root)
        denominator = in_delta + (
            (in_deriv + in_deriv_p1 - 2 * in_delta) * theta_1m
        )
        deriv_numerator = jnp.square(in_delta) * (
            in_deriv_p1 * jnp.square(root)
            + 2 * in_delta * theta_1m
            + in_deriv * jnp.square(1 - root)
        )
        logabsdet = jnp.log(deriv_numerator) - 2 * jnp.log(denominator)
        return outputs.astype(orig_dtype), (-logabsdet).astype(orig_dtype)

    theta = (inputs - in_cumwidths) / in_widths
    theta_1m = theta * (1 - theta)
    numerator = in_heights * (
        in_delta * jnp.square(theta) + in_deriv * theta_1m
    )
    denominator = in_delta + (
        (in_deriv + in_deriv_p1 - 2 * in_delta) * theta_1m
    )
    outputs = in_cumheights + numerator / denominator

    deriv_numerator = jnp.square(in_delta) * (
        in_deriv_p1 * jnp.square(theta)
        + 2 * in_delta * theta_1m
        + in_deriv * jnp.square(1 - theta)
    )
    logabsdet = jnp.log(deriv_numerator) - 2 * jnp.log(denominator)
    return outputs.astype(orig_dtype), logabsdet.astype(orig_dtype)


def unconstrained_rational_quadratic_spline(
    inputs: Array,
    unnormalized_widths: Array,
    unnormalized_heights: Array,
    unnormalized_derivatives: Array,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[Array, Array]:
    """RQS with identity linear tails outside [-tail_bound, tail_bound].

    Boundary derivatives are pinned to 1 via softplus^-1(1 - min_derivative)
    so the spline meets the identity tails smoothly (reference:
    transforms.py:68-76).
    """
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    constant = math.log(math.exp(1 - min_derivative) - 1)
    pad_spec = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    derivs = jnp.pad(
        unnormalized_derivatives, pad_spec, constant_values=constant
    )

    # Evaluate the spline on clamped inputs (keeps padded/outside lanes
    # numerically safe), then select identity for the tails.
    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    spline_out, spline_ld = rational_quadratic_spline(
        clamped,
        unnormalized_widths,
        unnormalized_heights,
        derivs,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_ld, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse=False,
    tails=None,
    tail_bound=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """Dispatcher matching the reference call surface (transforms.py:10-41)."""
    if tails is None:
        return rational_quadratic_spline(
            inputs, unnormalized_widths, unnormalized_heights,
            unnormalized_derivatives, inverse=inverse,
            min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")
    return unconstrained_rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
