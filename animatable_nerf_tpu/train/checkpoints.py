"""Checkpoint I/O with the reference's directory semantics.

Reference: lib/utils/net_utils.py:288-347 — `<epoch>.pth` snapshots +
`latest.pth`, pruned to the 20 newest, full training state (net + optim +
scheduler step + recorder); :357-396 partial loads (`strict=False`,
`only=[prefix]`) powering stage-2 init and SDF warm starts.

Format: flax msgpack of {params, opt_state, epoch, step, recorder} in
`<epoch>.flax` / `latest.flax`; torch `.pth` files are importable through
animatable_nerf_tpu.compat.

Beyond the reference (VERDICT-r4 item 2): mechanized best-checkpoint
retention — `best.flax` + a `best.json` sidecar {metric, epoch, step}
written whenever the recorded val PSNR improves (the reference's only
mitigation for non-monotone training curves is a human reading the
scalars and picking a snapshot by hand). Eval prefers `best.flax` when
present (Engine.load_params; opt out with `test.use_best False`).
"""

from __future__ import annotations

import json
import os

import numpy as np
from flax import serialization


def _to_state_dict(tree):
    return serialization.to_state_dict(tree)


def save_checkpoint(
    model_dir: str,
    params,
    opt_state,
    epoch: int,
    step: int,
    recorder_state: dict | None = None,
    latest: bool = False,
    keep: int = 20,
):
    os.makedirs(model_dir, exist_ok=True)
    blob = serialization.msgpack_serialize(
        {
            "params": _to_state_dict(params),
            "opt_state": _to_state_dict(opt_state),
            "epoch": np.asarray(epoch),
            "step": np.asarray(step),
            "recorder": recorder_state or {},
        }
    )
    name = "latest.flax" if latest else f"{epoch}.flax"
    with open(os.path.join(model_dir, name), "wb") as f:
        f.write(blob)
    if not latest:
        _prune(model_dir, keep)


def best_metric(model_dir: str):
    """The retained best-checkpoint record ({metric, epoch, step}) or
    None. The sidecar (not the msgpack) carries the comparison value so
    resume keeps improving on the previous run's best."""
    path = os.path.join(model_dir, "best.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_best_checkpoint(
    model_dir: str,
    params,
    opt_state,
    epoch: int,
    step: int,
    metric: float,
    recorder_state: dict | None = None,
) -> bool:
    """Write `best.flax` iff `metric` (higher is better, e.g. val PSNR)
    improves on the retained best. Returns True when written."""
    prev = best_metric(model_dir)
    if prev is not None and float(prev["metric"]) >= float(metric):
        return False
    os.makedirs(model_dir, exist_ok=True)
    blob = serialization.msgpack_serialize(
        {
            "params": _to_state_dict(params),
            "opt_state": _to_state_dict(opt_state),
            "epoch": np.asarray(epoch),
            "step": np.asarray(step),
            "recorder": recorder_state or {},
        }
    )
    with open(os.path.join(model_dir, "best.flax"), "wb") as f:
        f.write(blob)
    with open(os.path.join(model_dir, "best.json"), "w") as f:
        json.dump(
            {"metric": float(metric), "epoch": int(epoch),
             "step": int(step)}, f,
        )
    return True


def _prune(model_dir, keep):
    snaps = sorted(
        int(p[:-5])
        for p in os.listdir(model_dir)
        if p.endswith(".flax") and p[:-5].isdigit()
    )
    if len(snaps) > keep:
        for e in snaps[: len(snaps) - keep]:
            os.remove(os.path.join(model_dir, f"{e}.flax"))


def latest_epoch(model_dir: str) -> int:
    """Largest snapshot epoch, or -1 (net_utils.py:305-310)."""
    if not os.path.isdir(model_dir):
        return -1
    snaps = [
        int(p[:-5])
        for p in os.listdir(model_dir)
        if p.endswith(".flax") and p[:-5].isdigit()
    ]
    return max(snaps) if snaps else -1


def load_checkpoint(model_dir: str, params_template, opt_state_template=None,
                    epoch: int = -1, use_latest: bool = True,
                    use_best: bool = False):
    """Restore full training state. Returns (params, opt_state, epoch,
    step, recorder_state) or None if nothing to resume.

    An explicitly requested `epoch` always wins over latest.flax;
    `use_best` prefers `best.flax` (val-PSNR retained snapshot) when it
    exists, falling back to the latest/snapshot chain."""
    if epoch >= 0:
        path = os.path.join(model_dir, f"{epoch}.flax")
        if not os.path.exists(path):
            return None
    elif use_best and os.path.exists(os.path.join(model_dir, "best.flax")):
        path = os.path.join(model_dir, "best.flax")
    elif use_latest and os.path.exists(os.path.join(model_dir, "latest.flax")):
        path = os.path.join(model_dir, "latest.flax")
    else:
        e = latest_epoch(model_dir)
        path = os.path.join(model_dir, f"{e}.flax")
        if e < 0 or not os.path.exists(path):
            return None
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template, raw["params"])
    opt_state = None
    if opt_state_template is not None:
        opt_state = serialization.from_state_dict(
            opt_state_template, raw["opt_state"]
        )
    return (
        params,
        opt_state,
        int(raw["epoch"]),
        int(raw["step"]),
        raw.get("recorder", {}),
    )


def load_params_partial(path_or_dir: str, params_template, only=None,
                        strict: bool = True):
    """Load network params only, optionally filtered to subtree prefixes
    (net_utils.py:357-396 `only=[prefix]` / strict=False semantics).

    `only`: list of top-level module-path prefixes like
    ['tpose_human/sdf_network'].
    """
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = os.path.join(path_or_dir, "latest.flax")
        if not os.path.exists(path):
            e = latest_epoch(path_or_dir)
            path = os.path.join(path_or_dir, f"{e}.flax")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    loaded = raw["params"] if "params" in raw else raw

    def merge(tmpl, src, prefix=""):
        out = {}
        for k, v in tmpl.items():
            p = f"{prefix}{k}"
            if k in src:
                if isinstance(v, dict):
                    out[k] = merge(v, src[k], p + "/")
                elif only is None or any(p.startswith(o) for o in only):
                    out[k] = np.asarray(src[k]).reshape(np.shape(v))
                else:
                    out[k] = v
            else:
                if strict and (only is None):
                    raise KeyError(f"missing parameter {p} in checkpoint")
                out[k] = v
        return out

    tmpl_sd = serialization.to_state_dict(params_template)
    merged = merge(tmpl_sd, loaded)
    return serialization.from_state_dict(params_template, merged)
