"""Load the ACTUAL reference PyTorch code as a golden oracle.

Round-1 parity tests re-transcribed the torch architectures inside the
tests (tests/test_parity_torch.py); a transcription mistake made twice
would pass undetected. This shim imports the reference's own modules
from /root/reference (read-only) so golden tests run the reference
network code itself as the oracle:

  /root/reference/lib/networks/bw_deform/tpose_nerf_network.py
  /root/reference/lib/networks/bw_deform/aligned_*.py
  /root/reference/lib/networks/bw_deform/anisdf_*.py
  /root/reference/lib/networks/renderer/tpose_renderer.py

Three shims make the 2019-era code importable on Python 3.12 + torch
2.x cpu without its CUDA deps:

  1. `imp` polyfill — `imp.load_source` via importlib (the module was
     removed in Python 3.12; used by lib/networks/make_network.py).
  2. `lib.config` stub — a dict-backed attribute object replacing the
     global yacs cfg built by argparse at import time
     (lib/config/config.py:183-194). Tests mutate it per family.
  3. `pytorch3d` stub — brute-force exact-arithmetic `knn_points`
     (squared distances + topk; exact at test scales) standing in for
     the CUDA kernel; the mesh-sampling entry points are present but
     unused by the model forward paths (sample_utils.py:20-25).

Nothing from the reference tree is copied — its modules are imported
in place and executed as the test oracle.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from collections import namedtuple

REF_ROOT = "/root/reference"


class RefCfg:
    """Attribute/dict hybrid standing in for the reference's yacs cfg
    (lib/config/yacs.py CfgNode): attribute reads, `.get`, and the
    `'key' in cfg` membership test used by tpose_nerf_network.py:34."""

    def __init__(self, **kw):
        self.__dict__["_d"] = dict(kw)

    def __getattr__(self, k):
        try:
            return self.__dict__["_d"][k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self.__dict__["_d"][k] = v

    def __contains__(self, k):
        return k in self.__dict__["_d"]

    def get(self, k, default=None):
        return self.__dict__["_d"].get(k, default)

    def update(self, **kw):
        self.__dict__["_d"].update(kw)


# Defaults matching the shipped configs' common surface
# (configs/aninerf_s9p.yaml; lib/config/config.py:9-137). Small frame
# counts keep the latent tables test-sized — layer dims don't depend on
# them.
_DEFAULTS = dict(
    num_train_frame=3,
    num_eval_frame=2,
    num_latent_code=3,
    norm_th=0.05,
    train_th=0.1,
    xyz_res=10,
    view_res=4,
    tpose_viewdir=True,
    test_novel_pose=False,
    aninerf_animation=False,
    task="oracle_task",
    exp_name="oracle_exp",
    N_samples=8,
    perturb=0,
    white_bkgd=False,
    raw_noise_std=0.0,
    color_with_viewdir=True,
    erode_edge=True,
    trained_model_dir="/tmp/oracle_trained_model",
)

_installed_cfg = None


def _exact_knn_points(src, ref, K=1, **_kw):
    """pytorch3d.ops.knn_points replacement: exact squared distances
    (no matmul cancellation) + topk-smallest. Matches the CUDA kernel's
    contract used by sample_utils.guard_knn_points (:310-312): returns
    SQUARED dists and vertex indices.

    Chunked over the query axis: the reference's training forward sends
    ~64k queries against 6890 verts, and the unchunked (B, N, M, 3)
    broadcast would materialize ~21 GB (the parity-protocol CPU training
    runs through this stub, tools/ref_cli.py). Same arithmetic per
    query; autograd flows through the cat."""
    import torch

    KNN = namedtuple("KNN", ["dists", "idx"])
    chunk = 8192
    dists_parts, idx_parts = [], []
    for s in range(0, src.shape[1], chunk):
        part = src[:, s:s + chunk]
        d2 = ((part[:, :, None, :] - ref[:, None, :, :]) ** 2).sum(-1)
        d, i = torch.topk(d2, K, dim=-1, largest=False)
        dists_parts.append(d)
        idx_parts.append(i)
    return KNN(
        dists=torch.cat(dists_parts, dim=1),
        idx=torch.cat(idx_parts, dim=1),
    )


def _install_pytorch3d_stub():
    if "pytorch3d" in sys.modules:
        return
    pkg = types.ModuleType("pytorch3d")
    pkg.__path__ = []
    _c = types.ModuleType("pytorch3d._C")
    structures = types.ModuleType("pytorch3d.structures")

    class Meshes:  # only constructed by unused mesh-sampling helpers
        def __init__(self, *a, **k):
            raise NotImplementedError("oracle stub: Meshes unused")

    structures.Meshes = Meshes
    ops = types.ModuleType("pytorch3d.ops")
    ops.__path__ = []
    p2p = types.ModuleType("pytorch3d.ops.packed_to_padded")
    p2p.packed_to_padded = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("oracle stub: packed_to_padded unused")
    )
    knn = types.ModuleType("pytorch3d.ops.knn")
    knn.knn_points = _exact_knn_points
    mfan = types.ModuleType("pytorch3d.ops.mesh_face_areas_normals")
    mfan.mesh_face_areas_normals = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("oracle stub: mesh_face_areas_normals unused")
    )
    spfm = types.ModuleType("pytorch3d.ops.sample_points_from_meshes")
    spfm.sample_points_from_meshes = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("oracle stub: sample_points_from_meshes unused")
    )
    spfm._rand_barycentric_coords = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("oracle stub: _rand_barycentric_coords unused")
    )
    pkg._C = _c
    pkg.structures = structures
    pkg.ops = ops
    ops.packed_to_padded = p2p
    ops.knn = knn
    ops.mesh_face_areas_normals = mfan
    ops.sample_points_from_meshes = spfm
    for name, mod in [
        ("pytorch3d", pkg),
        ("pytorch3d._C", _c),
        ("pytorch3d.structures", structures),
        ("pytorch3d.ops", ops),
        ("pytorch3d.ops.packed_to_padded", p2p),
        ("pytorch3d.ops.knn", knn),
        ("pytorch3d.ops.mesh_face_areas_normals", mfan),
        ("pytorch3d.ops.sample_points_from_meshes", spfm),
    ]:
        sys.modules[name] = mod


def _install_misc_stubs():
    """Import-time-only deps of the trainer chain that are absent from
    this image (lib/utils/if_nerf/if_nerf_net_utils.py imports trimesh/
    imageio at module level; the oracle wrappers never call into them)."""
    for name in ("trimesh", "imageio", "plyfile"):
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except ImportError:
            stub = types.ModuleType(name)

            def _poison(attr, _n=name):
                # dunder probes must fail like a normal module attribute
                # miss: inspect.getmodule scans EVERY sys.modules entry
                # for `__file__`, and handing it a poison class crashes
                # torch's own import (inspect filename.endswith)
                if attr.startswith("__"):
                    raise AttributeError(attr)

                # `from plyfile import PlyData` resolves the attribute at
                # import time — hand back an object that only fails on USE
                class _Unused:
                    def __init__(self, *a, **k):
                        raise NotImplementedError(
                            f"oracle stub: {_n}.{attr} unused"
                        )

                    __call__ = __init__

                _Unused.__name__ = attr
                return _Unused

            stub.__getattr__ = _poison
            sys.modules[name] = stub


def _install_pointnet2_stub():
    """CPU reimplementation of the lib/csrc/pointnet2 CUDA surface
    (pointnet2_utils), registered under the csrc module path BEFORE the
    reference pointnet2 modules import it. Semantics transcribed from
    the kernels: ball_query fills empty slots with the FIRST in-ball
    index ascending (ball_query_gpu.cu:28-44, zeros when none), FPS
    seeds at index 0 (sampling_gpu.cu), three_nn returns ascending
    3-NN sqrt distances. Forward-only (the golden tests run no_grad);
    formulations deliberately differ from ops/pointnet2.py's XLA ones
    (sort-based vs top_k) so a shared bug cannot cancel out."""
    name = "lib.csrc.pointnet2.pointnet2_utils"
    if name in sys.modules:
        return
    import torch

    mod = types.ModuleType(name)

    def furthest_point_sample(xyz, npoint):
        B, N, _ = xyz.shape
        out = torch.zeros(B, npoint, dtype=torch.int64)
        mind = torch.full((B, N), 1e10)
        last = torch.zeros(B, dtype=torch.int64)
        ar = torch.arange(B)
        for i in range(1, npoint):
            d = ((xyz - xyz[ar, last][:, None]) ** 2).sum(-1)
            mind = torch.minimum(mind, d)
            last = mind.argmax(1)
            out[:, i] = last
        return out

    def gather_operation(features, idx):
        # features (B, C, N), idx (B, S) -> (B, C, S)
        B, C, N = features.shape
        return torch.gather(
            features, 2, idx.long()[:, None, :].expand(B, C, idx.shape[1])
        )

    def ball_query(radius, nsample, xyz, new_xyz):
        B, N, _ = xyz.shape
        S = new_xyz.shape[1]
        d2 = ((new_xyz[:, :, None] - xyz[:, None, :]) ** 2).sum(-1)
        inball = d2 < radius * radius
        col = torch.arange(N)[None, None].expand(B, S, N)
        # stable in-ball-first ascending-index order via argsort
        key = torch.where(inball, col, col + 2 * N)
        order = torch.argsort(key, dim=2)[:, :, :nsample]
        picked = torch.gather(inball, 2, order)
        first = order[:, :, :1]
        fill = torch.where(picked[:, :, :1], first,
                           torch.zeros_like(first))
        return torch.where(picked, order, fill)

    def grouping_operation(features, idx):
        # features (B, C, N), idx (B, S, ns) -> (B, C, S, ns)
        B, C, N = features.shape
        S, ns = idx.shape[1], idx.shape[2]
        flat = idx.long().reshape(B, 1, S * ns).expand(B, C, S * ns)
        return torch.gather(features, 2, flat).reshape(B, C, S, ns)

    def three_nn(unknown, known):
        d2 = ((unknown[:, :, None] - known[:, None, :]) ** 2).sum(-1)
        dist2, idx = torch.topk(d2, 3, dim=2, largest=False)
        return torch.sqrt(dist2), idx

    def three_interpolate(features, idx, weight):
        # features (B, C, M), idx/weight (B, n, 3) -> (B, C, n)
        g = grouping_operation(features, idx)  # (B, C, n, 3)
        return (g * weight[:, None]).sum(-1)

    class QueryAndGroup(torch.nn.Module):
        def __init__(self, radius, nsample, use_xyz=True):
            super().__init__()
            self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

        def forward(self, xyz, new_xyz, features=None):
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = grouping_operation(
                xyz.transpose(1, 2).contiguous(), idx
            )
            grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
            if features is not None:
                gf = grouping_operation(features, idx)
                return (
                    torch.cat([grouped_xyz, gf], dim=1)
                    if self.use_xyz else gf
                )
            return grouped_xyz

    class GroupAll(torch.nn.Module):
        def __init__(self, use_xyz=True):
            super().__init__()
            self.use_xyz = use_xyz

        def forward(self, xyz, new_xyz, features=None):
            grouped_xyz = xyz.transpose(1, 2).unsqueeze(2)
            if features is not None:
                gf = features.unsqueeze(2)
                return (
                    torch.cat([grouped_xyz, gf], dim=1)
                    if self.use_xyz else gf
                )
            return grouped_xyz

    mod.furthest_point_sample = furthest_point_sample
    mod.gather_operation = gather_operation
    mod.ball_query = ball_query
    mod.grouping_operation = grouping_operation
    mod.three_nn = three_nn
    mod.three_interpolate = three_interpolate
    mod.QueryAndGroup = QueryAndGroup
    mod.GroupAll = GroupAll
    sys.modules[name] = mod


def _install_imp_polyfill():
    if "imp" in sys.modules:
        return
    imp_mod = types.ModuleType("imp")

    def load_source(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    imp_mod.load_source = load_source
    sys.modules["imp"] = imp_mod


_PINS_PATH = __file__.rsplit("/", 1)[0] + "/ref_pins.json"
_pins_checked = False


def verify_reference_pins():
    """Pin the untrusted /root/reference tree to the reviewed snapshot
    (ADVICE r3): the oracle imports and EXECUTES reference Python
    in-process, so refuse to run if any reference source drifted from
    the hashes recorded at review time. Regenerate (after re-review)
    with: python tests/ref_oracle.py --update-pins."""
    global _pins_checked
    if _pins_checked:
        return
    import hashlib
    import json
    import os

    with open(_PINS_PATH) as f:
        pins = json.load(f)
    drifted = []
    for rel, want in pins["sha256"].items():
        path = os.path.join(REF_ROOT, rel)
        try:
            with open(path, "rb") as f:
                got = hashlib.sha256(f.read()).hexdigest()
        except OSError:
            got = "<missing>"
        if got != want:
            drifted.append(rel)
    if drifted:
        raise RuntimeError(
            "reference tree drifted from the reviewed snapshot "
            f"(tests/ref_pins.json): {drifted[:5]}"
            f"{' ...' if len(drifted) > 5 else ''} — re-review "
            "/root/reference and regenerate pins with "
            "`python tests/ref_oracle.py --update-pins` before running "
            "the golden oracle."
        )
    _pins_checked = True


def _collect_pins():
    import hashlib
    import os

    sha = {}
    for root, _dirs, files in os.walk(REF_ROOT):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, REF_ROOT)
            with open(path, "rb") as f:
                sha[rel] = hashlib.sha256(f.read()).hexdigest()
    return {"sha256": sha}


def install(**overrides) -> RefCfg:
    """Install all shims and return the mutable oracle cfg. Idempotent;
    later calls update the existing cfg in place (module-level state is
    shared by design — the reference reads the global at call time)."""
    global _installed_cfg
    verify_reference_pins()
    _install_imp_polyfill()
    _install_pytorch3d_stub()
    _install_misc_stubs()
    _install_pointnet2_stub()
    if _installed_cfg is None:
        cfg = RefCfg(**_DEFAULTS)
        libcfg = types.ModuleType("lib.config")
        libcfg.cfg = cfg
        sys.modules["lib.config"] = libcfg
        # the trainer import chain also reaches the submodule spelling
        # (lib/train/recorder.py: `from lib.config.config import cfg`)
        libcfgcfg = types.ModuleType("lib.config.config")
        libcfgcfg.cfg = cfg
        sys.modules["lib.config.config"] = libcfgcfg
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        _installed_cfg = cfg
    _installed_cfg.update(**_DEFAULTS)
    _installed_cfg.update(**overrides)
    return _installed_cfg


def load(name: str):
    """Import a reference module (e.g.
    'lib.networks.bw_deform.tpose_nerf_network') after install()."""
    assert _installed_cfg is not None, "call install() first"
    return importlib.import_module(name)


if __name__ == "__main__":
    import json
    import sys as _sys

    if "--update-pins" in _sys.argv:
        with open(_PINS_PATH, "w") as f:
            json.dump(_collect_pins(), f, indent=1, sort_keys=True)
        print(f"wrote {_PINS_PATH}")
    else:
        verify_reference_pins()
        print("reference pins OK")
