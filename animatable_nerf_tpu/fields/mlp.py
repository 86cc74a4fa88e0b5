"""MLP building blocks: skip-concat MLPs, weight-normalized dense layers
and the IDR/NeuS geometric initialization.

The reference implements its MLPs as stacks of 1x1 Conv1d over a
channels-first (B, C, N) layout (tpose_nerf_network.py:25-29); on TPU a
1x1 conv over points IS a dense layer over a channels-last (N, C) matrix,
which maps straight onto the MXU — so everything here is `Dense`.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def dense_param_init(in_dim: int, out_dim: int,
                     kernel_init: Callable = None):
    """Init fn for a {kernel, bias} param matching nn.Dense defaults
    (lecun_normal kernel, zero bias) — keeps the param tree identical
    to an nn.Dense child of the same name."""
    kinit = kernel_init or nn.initializers.lecun_normal()

    def init(key):
        return {
            "kernel": kinit(key, (in_dim, out_dim)),
            "bias": jnp.zeros((out_dim,), jnp.float32),
        }

    return init


class SkipMLP(nn.Module):
    """D-layer, W-wide ReLU MLP; at each index in `skips` the ORIGINAL
    input is re-concatenated to the activations after that layer runs
    (reference wiring: tpose_nerf_network.py:66-71 — the concat happens
    after the skip layer's activation, widening the NEXT layer's input).

    Output head is a final linear with `out_dim` units (no activation).

    Execution: on TPU (`fused=True`) the entire stack runs as ONE Pallas
    kernel with VMEM-resident weights (ops/mlp_pallas.py) — inter-layer
    activations never touch HBM, the hot path's bandwidth bound.
    Otherwise a plain XLA loop in `dtype` compute precision (params are
    always float32; output float32). Param tree: lin0..lin{D-1} + out,
    each {kernel, bias} — identical either way.
    """

    depth: int = 8
    width: int = 256
    out_dim: int = 24
    skips: Sequence[int] = (4,)
    dtype: Any = jnp.float32
    # fused=True routes through the Pallas kernel (ops/mlp_pallas.py).
    # Default False: measured end-to-end on v5e the XLA loop wins (229ms
    # vs 359ms per 65k-ray render) — the pad/slice round-trips and lost
    # cross-op fusion outweigh VMEM weight residency at 256-wide trunks.
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        din = x.shape[-1]
        layers = []
        d_in = din
        for i in range(self.depth):
            p = self.param(f"lin{i}", dense_param_init(d_in, self.width))
            layers.append((p["kernel"], p["bias"]))
            d_in = self.width + (din if i in self.skips else 0)
        p = self.param("out", dense_param_init(d_in, self.out_dim))
        layers.append((p["kernel"], p["bias"]))

        # on TPU: the whole stack as one Pallas kernel, VMEM-resident
        # weights, no inter-layer HBM traffic (ops/mlp_pallas.py)
        if self.fused and jax.default_backend() == "tpu":
            from ..ops.mlp_pallas import make_fused_skip_mlp

            f = make_fused_skip_mlp(skips=tuple(self.skips), act="relu")
            return f(x.astype(jnp.float32), layers)

        inp = x.astype(self.dtype)
        h = inp
        n = len(layers)
        for i, (w, b) in enumerate(layers):
            h = h @ w.astype(self.dtype) + b.astype(self.dtype)
            if i < n - 1:
                h = nn.relu(h)
                if i in self.skips:
                    h = jnp.concatenate([inp, h], axis=-1)
        return h.astype(jnp.float32)


def _wn_init(v_init: Callable, in_dim: int, out_dim: int):
    """Initializer for a weight-normalized layer: returns {v, g, b} with
    g = ||v|| per output unit (torch weight_norm's init convention)."""

    def init(key):
        v = v_init(key, (in_dim, out_dim))
        g = jnp.linalg.norm(v, axis=0)
        b = jnp.zeros((out_dim,), v.dtype)
        return {"v": v, "g": g, "b": b}

    return init


def wn_apply(p, x, dtype=None):
    """Apply a weight-normalized dense layer given params {v, g, b}.

    `dtype` (optional) is the matmul compute dtype: the norm and the
    normalized weight are always formed in the param dtype (f32 — the
    per-unit norm is a reduction over 256+ rows and bf16 round-off
    there would rescale whole output units), then weight, input and
    bias are cast for the matmul. Output stays in `dtype` so stacked
    layers keep their activations narrow (the trunk's HBM traffic is
    the bound, not the MXU)."""
    v, g, b = p["v"], p["g"], p["b"]
    w = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
        x = x.astype(dtype)
    return x @ w + b


class WNDense(nn.Module):
    """Weight-normalized dense layer: y = x @ (g * v / ||v||) + b.

    Norms are per output unit (torch nn.utils.weight_norm dim=0 on the
    (out, in) weight — anisdf_pdf_network.py:410-411). `v_init` draws the
    initial direction. Params stay float32; `dtype` only sets the
    matmul compute precision.
    """

    features: int
    v_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        p = self.param("wn", _wn_init(self.v_init, in_dim, self.features))
        return wn_apply(p, x, dtype=self.dtype)


def geometric_mlp_params(
    key,
    dims: Sequence[int],
    skip_in: Sequence[int],
    bias: float = 0.5,
    d_raw_in: int = 3,
):
    """IDR geometric initialization for an SDF MLP with weight norm.

    Returns a list of {v, g, b} dicts, one per linear layer, matching
    anisdf_pdf_network.py:379-413:
      * last layer: w ~ N(sqrt(pi)/sqrt(in_dim), 1e-4), b = -bias
      * first layer: PE columns zeroed, xyz columns ~ N(0, sqrt(2)/sqrt(out))
      * skip layers: the PE part of the re-concatenated input zeroed
      * others: w ~ N(0, sqrt(2)/sqrt(out))
    and g = per-unit norm of the initialized weight.
    """
    n_layers = len(dims)
    params = []
    for l in range(n_layers - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        in_dim = dims[l]
        key, sub = jax.random.split(key)
        if l == n_layers - 2:
            w = (
                jax.random.normal(sub, (in_dim, out_dim)) * 1e-4
                + np.sqrt(np.pi) / np.sqrt(in_dim)
            )
            b = jnp.full((out_dim,), -bias)
        elif l == 0:
            w = jnp.zeros((in_dim, out_dim))
            w = w.at[:d_raw_in].set(
                jax.random.normal(sub, (d_raw_in, out_dim))
                * np.sqrt(2)
                / np.sqrt(out_dim)
            )
            b = jnp.zeros((out_dim,))
        elif l in skip_in:
            w = jax.random.normal(sub, (in_dim, out_dim)) * np.sqrt(2) / np.sqrt(out_dim)
            # zero the PE channels of the re-concatenated input (the last
            # dims[0]-3 rows — reference indexes the torch (out, in) weight)
            w = w.at[-(dims[0] - d_raw_in):].set(0.0)
            b = jnp.zeros((out_dim,))
        else:
            w = jax.random.normal(sub, (in_dim, out_dim)) * np.sqrt(2) / np.sqrt(out_dim)
            b = jnp.zeros((out_dim,))
        g = jnp.linalg.norm(w, axis=0)
        params.append({"v": w.astype(jnp.float32), "g": g.astype(jnp.float32), "b": b.astype(jnp.float32)})
    return params
