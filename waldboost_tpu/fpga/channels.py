"""FPGA integer channel functions: uint8-in / uint8-out gradient features.

Parity with /root/reference/waldboost/fpga/channels.py (numba stencils):
3x3 Sobel gradients computed in int32 with *zero borders* (stencil default),
fixed-orientation responses, ``min(abs(y)//4, 255)`` uint8 quantization with
truncation-toward-zero on the half-integer orientations (int32 array
assignment semantics of the reference, fpga/channels.py:46-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..channels import ChannelFunction, register_channel_function

__all__ = ["grad_hist_4_u1", "grad_mag_u1"]


def _sobel_int32(image: jax.Array):
    """(H, W) any-int/uint image -> (dx, dy) int32 with zero 1px borders.

    dx kernel [[-1,0,1],[-2,0,2],[-1,0,1]], dy its transpose
    (/root/reference/waldboost/fpga/channels.py:5-27).
    """
    x = image.astype(jnp.int32)
    # valid-region correlations via shifted adds
    c0 = x[:, :-2]
    c2 = x[:, 2:]
    dx_rows = c2 - c0                       # per-row [-1, 0, 1]
    dx = dx_rows[:-2, :] + 2 * dx_rows[1:-1, :] + dx_rows[2:, :]
    r0 = x[:-2, :]
    r2 = x[2:, :]
    dy_cols = r2 - r0
    dy = dy_cols[:, :-2] + 2 * dy_cols[:, 1:-1] + dy_cols[:, 2:]
    pad = ((1, 1), (1, 1))
    return jnp.pad(dx, pad), jnp.pad(dy, pad)


def _grad_hist_4_u1_fn(image: jax.Array) -> jax.Array:
    """4 fixed orientations {dx, (dx-dy)/2, dy, (dx+dy)/2} ->
    min(|y|//4, 255) uint8 (/root/reference/waldboost/fpga/channels.py:29-53).
    The half-integer orientations truncate toward zero (int32 assignment)."""
    dx, dy = _sobel_int32(image)
    y0 = dx
    # 0.5*dx - 0.5*dy assigned into an int32 array -> C truncation toward zero
    y1 = (0.5 * dx - 0.5 * dy).astype(jnp.int32)
    y2 = dy
    y3 = (0.5 * dx + 0.5 * dy).astype(jnp.int32)
    y = jnp.stack([y0, y1, y2, y3], axis=0)
    return jnp.minimum(jnp.abs(y) // 4, 255).astype(jnp.uint8)


def _grad_mag_u1_fn(image: jax.Array) -> jax.Array:
    """max(|dx|, |dy|)//4 clamped to 255, 1 channel
    (/root/reference/waldboost/fpga/channels.py:56-67)."""
    dx, dy = _sobel_int32(image)
    y = jnp.maximum(jnp.abs(dx), jnp.abs(dy))
    return jnp.minimum(y // 4, 255).astype(jnp.uint8)[None]


def _grad_hist_4_u1_canvas_fn(canvas, ctx):
    """Canvas mode: one Sobel pass over the packed canvas; the numba-stencil
    zero-border convention is restored by masking each level's 1px ring."""
    out = _grad_hist_4_u1_fn(canvas)
    if ctx.border_mask is not None:
        out = jnp.where(ctx.border_mask[None], out, jnp.uint8(0))
    return out


def _grad_mag_u1_canvas_fn(canvas, ctx):
    out = _grad_mag_u1_fn(canvas)
    if ctx.border_mask is not None:
        out = jnp.where(ctx.border_mask[None], out, jnp.uint8(0))
    return out


grad_hist_4_u1 = register_channel_function(
    ChannelFunction(
        name="waldboost_tpu.fpga.channels.grad_hist_4_u1",
        fn=_grad_hist_4_u1_fn,
        n_channels=4,
        aliases=("grad_hist_4_u1", "waldboost.fpga.channels.grad_hist_4_u1",
                 "waldboost.fpga.nb_channels.grad_hist_4_u1"),
        halo=0,
        boundary="stencil_zero",
        canvas_fn=_grad_hist_4_u1_canvas_fn,
    )
)

grad_mag_u1 = register_channel_function(
    ChannelFunction(
        name="waldboost_tpu.fpga.channels.grad_mag_u1",
        fn=_grad_mag_u1_fn,
        n_channels=1,
        aliases=("grad_mag_u1", "waldboost.fpga.channels.grad_mag_u1",
                 "waldboost.fpga.nb_channels.grad_mag_u1"),
        halo=0,
        boundary="stencil_zero",
        canvas_fn=_grad_mag_u1_canvas_fn,
    )
)
