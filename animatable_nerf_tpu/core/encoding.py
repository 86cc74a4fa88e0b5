"""NeRF positional encoding.

Reference semantics: lib/networks/embedder.py:5-54 — output is the
concatenation of the raw input followed by, for each of `multires`
log-spaced frequencies 2^0 .. 2^(multires-1), sin(x*f) then cos(x*f),
each spanning all input dims. Output dim = d * (1 + 2 * multires).
"""

from __future__ import annotations

import jax.numpy as jnp


def encoding_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode positions/directions with log-spaced sin/cos bands.

    Args:
      x: (..., d) input.
      multires: number of frequency bands (10 for xyz, 4 for view dirs
        in the reference configs: cfg.xyz_res / cfg.view_res).

    Returns:
      (..., d * (1 + 2 * multires)) encoding; band ordering is
      [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] so that
      converted PyTorch checkpoints map weight columns one-to-one.
    """
    if multires == 0:
        return x
    # freq bands: 2 ** linspace(0, multires-1, multires)
    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires, dtype=x.dtype)
    # (..., multires, d): x scaled per band
    xb = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave sin/cos per band: (..., multires, 2, d) -> flatten
    sc = jnp.stack([sin, cos], axis=-2)
    enc = sc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
