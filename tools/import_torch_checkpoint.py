"""Import a reference PyTorch checkpoint (.pth) into this framework.

The reference trains with xx-peach/animatable_nerf and saves
`{net, optim, scheduler, recorder, epoch}` snapshots
(lib/utils/net_utils.py:325-338). This tool converts the `net` state
dict tensor-for-tensor into this framework's flax param tree
(animatable_nerf_tpu/compat/torch_import.py) and writes a `.flax`
checkpoint into the config's model dir, where `run.py --type
evaluate/visualize` picks it up like any natively trained model.
Optimizer state is NOT transferred (torch Adam moments do not map onto
the optax tree; training resumed from an import starts with fresh
moments, matching the reference's own `load_network` eval loads,
net_utils.py:357-396).

Usage:
    python tools/import_torch_checkpoint.py \
        --cfg_file configs/aninerf_313.yaml --pth /path/to/latest.pth \
        [--out DIR] [--no-verify] [opts key value ...]

The converter is selected by `cfg.network_module`. By default the
converted tree is verified structurally (same tree paths + shapes)
against `model.init` on a synthetic frame before anything is written.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _converter_for(cfg):
    from animatable_nerf_tpu import compat
    from animatable_nerf_tpu import models as M
    from animatable_nerf_tpu.models import MODELS

    cls = MODELS[cfg.network_module]
    table = {
        M.AniNeRF: compat.convert_aninerf,
        M.AlignedLBW: compat.convert_aligned_lbw,
        M.AlignedPBW: compat.convert_aligned_pbw,
        M.AlignedSMPL: compat.convert_aligned_smpl,
        M.AlignedLBWPDF: compat.convert_aligned_lbw_pdf,
        M.NeRFPDF: compat.convert_nerf_pdf,
        M.SDFPDF: compat.convert_sdf_pdf,
        M.NeuSPDF: compat.convert_neus_pdf,
    }
    if cls not in table:
        raise SystemExit(
            f"no torch converter for network_module={cfg.network_module!r} "
            f"({cls.__name__}); importable families: "
            + ", ".join(c.__name__ for c in table)
        )
    return cls, table[cls]


def _verify(cfg, converted):
    """Structural check: converted tree paths/shapes == model.init's."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from animatable_nerf_tpu.models import make_model

    rng = np.random.RandomState(0)
    model = make_model(cfg)
    frame = {k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()}
    rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 4).items()}
    wpts = jnp.zeros((4, 4, 3))
    z = jnp.ones((4, 4))
    # stage-2 checkpoints carry the novel-pose bw subtree; the template
    # must declare it (Engine.init_params passes the same kwarg)
    kwargs = (
        {"novel_pose": True}
        if cfg.test_novel_pose or cfg.aninerf_animation else {}
    )
    template = model.init(
        jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False,
        **kwargs,
    )
    shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
    want, got = shapes(template), shapes(converted)
    # the converted tree may be a SUPERSET of the eval template: a
    # stage-2 checkpoint carries bw_field AND novel_pose_bw, while the
    # novel-pose eval template only traces novel_pose_bw (flax init
    # creates params for called modules only); eval's from_state_dict
    # restores the template subset. Verify every template path exists
    # in the conversion with the right shape.
    def subset_ok(w, g, path=""):
        if isinstance(w, dict):
            return isinstance(g, dict) and all(
                k in g and subset_ok(v, g[k], f"{path}/{k}")
                for k, v in w.items()
            )
        return w == g

    if want != got and subset_ok(want, got):
        extra = sorted(set(got.get("params", {})) - set(want.get("params", {})))
        print(f"note: checkpoint carries extra subtrees {extra} beyond "
              "the eval template (stage-2 superset) — verified on the "
              "template subset")
    elif want != got:
        import difflib

        w = repr(want).replace("), ", "),\n")
        g = repr(got).replace("), ", "),\n")
        diff = "\n".join(
            difflib.unified_diff(w.splitlines(), g.splitlines(),
                                 "model.init", "converted", lineterm="")
        )
        raise SystemExit(
            "converted tree does not match the model built from this "
            "config (check num_train_frame / num_eval_frame / "
            "num_latent_code and the network_module):\n" + diff
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--pth", required=True,
                        help="reference .pth checkpoint to import")
    parser.add_argument("--out", default="",
                        help="output dir (default: the config's model dir)")
    parser.add_argument("--no-verify", action="store_true",
                        help="skip the structural check against model.init")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)

    # pure host-side conversion: never route through the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    from animatable_nerf_tpu.config import load_config
    from animatable_nerf_tpu.compat import load_torch_state_dict
    from animatable_nerf_tpu.train.checkpoints import save_checkpoint

    cfg = load_config(args.cfg_file, args.opts or [])
    cls, convert = _converter_for(cfg)
    state, epoch = load_torch_state_dict(args.pth)
    converted = convert(state)
    if not args.no_verify:
        _verify(cfg, converted)

    out_dir = args.out or cfg.trained_model_dir
    save_checkpoint(out_dir, converted, {}, epoch=epoch,
                    step=epoch * max(cfg.ep_iter, 1), latest=True)
    save_checkpoint(out_dir, converted, {}, epoch=epoch,
                    step=epoch * max(cfg.ep_iter, 1))
    print(f"imported {args.pth} ({cls.__name__}, epoch {epoch}) "
          f"-> {out_dir}/latest.flax")


if __name__ == "__main__":
    main()
