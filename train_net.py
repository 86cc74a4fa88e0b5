"""Training CLI.

Usage mirrors the reference (train_net.py):
    python train_net.py --cfg_file configs/aninerf_313.yaml exp_name aninerf_313 resume False
Stage 2:
    python train_net.py --cfg_file configs/aninerf_313.yaml exp_name aninerf_313_full \
        aninerf_animation True init_aninerf aninerf_313 resume False

Multi-host: jax.distributed.initialize() replaces the reference's NCCL
env:// rendezvous (train_net.py:93-98); per-host data sharding is keyed
on jax.process_index() inside the engine.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from animatable_nerf_tpu import jaxenv
from animatable_nerf_tpu.config import parse_cli

jaxenv.setup()


def main():
    args, cfg = parse_cli()
    import jax

    if args.launcher == "jax" or cfg.distributed:
        import jax.distributed

        jax.distributed.initialize()

    if cfg.fix_random:
        # reference seeds torch + cudnn deterministic (train_net.py:12-15);
        # JAX is deterministic given fixed PRNG keys — seed numpy for the
        # host-side ray sampling
        import numpy as np

        np.random.seed(0)

    from animatable_nerf_tpu.engine import run_train
    from animatable_nerf_tpu.parallel import make_mesh

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    run_train(cfg, mesh=mesh)


if __name__ == "__main__":
    main()
