"""JAX environment setup shared by the CLIs and bench.

- `ANVTPU_PLATFORM=cpu|axon|tpu` overrides the platform. This must go
  through jax.config (NOT the JAX_PLATFORMS env var): TPU plugins may
  force their platform order at interpreter start, silently winning over
  the env var.
- Enables the persistent compilation cache: in tunneled/remote-compile
  environments a cold compile can take minutes; the cache makes every
  subsequent process start fast.
"""

from __future__ import annotations

import os


def setup(cache_dir: str = "/tmp/anvtpu_jax_cache"):
    import jax

    plat = os.environ.get("ANVTPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # separate cache per platform: AOT artifacts from the remote-compile
    # relay are built for a different host microarchitecture and make the
    # CPU loader warn/fall back
    jax.config.update(
        "jax_compilation_cache_dir", cache_dir + "_" + (plat or "default")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax
