"""Fused skip-MLP evaluation as a single Pallas TPU kernel.

The field MLPs (blend-weight trunk, NeRF trunk, SDF trunk — SURVEY.md
§2.3) are stacks of 256-wide dense layers with an input re-concat skip.
XLA runs them as a chain of HBM-separated matmuls; here the ENTIRE stack
runs as one kernel per point tile: every weight matrix is resident in
VMEM across the grid (a few MB), activations never touch HBM, and each
layer is one MXU matmul + VPU activation.

Feature dims are zero-padded to lane multiples (128) by the wrapper;
zero-padded weight rows/cols make the padding exact, not approximate.

Backward: `make_fused_skip_mlp` wraps the kernel in a custom_vjp whose
backward pass re-derives gradients through the pure-XLA twin — the fused
kernel stays forward-only (it is the eval/render hot path), training
gets standard XLA autodiff numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "none": lambda x: x,
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ref_forward(x, layers, skips, act_name: str, act_last: bool = False):
    """Pure-XLA twin (numerics oracle + backward-pass path)."""
    act = _ACTS[act_name]
    inp = x
    h = x
    n = len(layers)
    for i, (w, b) in enumerate(layers):
        h = h @ w + b
        if i < n - 1 or act_last:
            h = act(h)
            if i in skips and i < n - 1:
                h = jnp.concatenate([inp, h], axis=-1)
    return h


def _pad_layers(layers, skips, din_p):
    """Zero-pad every weight to lane-aligned in/out dims.

    Layer input layouts: plain layers see [h (w_prev)], post-skip layers
    see [x (din), h (w_prev)]; padded versions see the same segments at
    their padded offsets, so padded weights scatter the true rows into
    segment-aligned blocks (zeros elsewhere).
    """
    din = layers[0][0].shape[0]
    padded = []
    # (true_size, padded_size) per input segment of the current layer
    segs = [(din, din_p)]
    for i, (w, b) in enumerate(layers):
        dout = w.shape[1]
        dout_p = _round_up(dout, 128)
        in_p = sum(p for _, p in segs)
        wp = jnp.zeros((in_p, dout_p), jnp.float32)
        row = 0
        row_p = 0
        for (t, p) in segs:
            wp = wp.at[row_p:row_p + t, :dout].set(w[row:row + t])
            row += t
            row_p += p
        bp = jnp.zeros((1, dout_p), jnp.float32).at[0, :dout].set(b)
        padded.append((wp, bp))
        segs = [(dout, dout_p)]
        if i in skips:
            segs = [(din, din_p), (dout, dout_p)]
    return padded


def _mlp_kernel(*refs, n_layers: int, skips, act_name: str,
                act_last: bool):
    x_ref = refs[0]
    out_ref = refs[-1]
    wb = refs[1:-1]
    act = _ACTS[act_name]
    x = x_ref[:]
    h = x
    for i in range(n_layers):
        w = wb[2 * i][:]
        b = wb[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1 or act_last:
            h = act(h)
            if i in skips and i < n_layers - 1:
                h = jnp.concatenate([x, h], axis=-1)
    out_ref[:] = h


@functools.partial(
    jax.jit, static_argnames=("skips", "act", "tile", "interpret",
                              "act_last")
)
def fused_skip_mlp(x, layers, skips=(), act: str = "relu",
                   tile: int = 512, interpret: bool = False,
                   act_last: bool = False):
    """Run the full MLP stack as one Pallas kernel.

    Args:
      x: (N, Din) inputs.
      layers: sequence of (W (din, dout), b (dout,)) incl. the output
        head; activation runs after every layer but the last.
      skips: layer indices after whose activation the ORIGINAL input is
        re-concatenated (SkipMLP wiring, fields/mlp.py).
    Returns: (N, Dout).
    """
    skips = tuple(skips)
    N, din = x.shape
    dout = layers[-1][0].shape[1]
    din_p = _round_up(din, 128)
    dout_p = _round_up(dout, 128)
    Np = _round_up(max(N, tile), tile)

    xp = jnp.zeros((Np, din_p), jnp.float32).at[:N, :din].set(
        x.astype(jnp.float32)
    )
    padded = _pad_layers(layers, skips, din_p)

    n_layers = len(layers)
    kernel = functools.partial(
        _mlp_kernel, n_layers=n_layers, skips=skips, act_name=act,
        act_last=act_last,
    )
    in_specs = [
        pl.BlockSpec((tile, din_p), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    flat_wb = []
    for (wp, bp) in padded:
        in_specs.append(
            pl.BlockSpec(wp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec(bp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        flat_wb.extend([wp, bp])

    flops = 2 * sum(wp.shape[0] * wp.shape[1] for wp, _ in padded) * Np
    out = pl.pallas_call(
        kernel,
        grid=(Np // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, dout_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, dout_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (Np * (din_p + dout_p)
                                + sum(w.size + b.size for w, b in padded)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, *flat_wb)
    return out[:N, :dout]


def make_fused_skip_mlp(skips=(), act: str = "relu", tile: int = 512,
                        act_last: bool = False):
    """Differentiable fused MLP: Pallas forward, XLA-twin backward."""
    skips = tuple(skips)

    @jax.custom_vjp
    def f(x, layers):
        if jax.default_backend() != "tpu":
            return _ref_forward(x, layers, skips, act, act_last)
        return fused_skip_mlp(x, layers, skips=skips, act=act, tile=tile,
                              act_last=act_last)

    def fwd(x, layers):
        return f(x, layers), (x, layers)

    def bwd(res, g):
        x, layers = res
        _, vjp = jax.vjp(
            lambda xx, ll: _ref_forward(xx, ll, skips, act, act_last),
            x, layers,
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def flax_skipmlp_layers(params, depth: int):
    """Extract (W, b) pairs from a fields.mlp.SkipMLP param tree."""
    p = params
    layers = [
        (p[f"lin{i}"]["kernel"], p[f"lin{i}"]["bias"]) for i in range(depth)
    ]
    layers.append((p["out"]["kernel"], p["out"]["bias"]))
    return layers
