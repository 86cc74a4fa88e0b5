"""Run the reference's OWN CLIs (train_net.py / run.py) on this
CPU-only machine — the instrument for the trained-checkpoint parity
contract (VERDICT-r3 item 1).

The reference code (/root/reference, pinned by tests/ref_pins.json) is
2019-era torch CUDA code; this launcher makes its unmodified entry
points executable here:

  * tests/ref_oracle.py shims: `imp` polyfill (py3.12), pytorch3d
    brute-force-exact KNN stub, pointnet2 CPU stub, trimesh/imageio/
    plyfile stubs — the same reviewed shims the golden tests run under.
  * tensorboardX stub (recorder.py:3) — no-op SummaryWriter.
  * skimage stub (evaluators/if_nerf.py:3) — structural_similarity
    backed by our skimage-default reimplementation
    (animatable_nerf_tpu/evaluators/image.py ssim_metric; PSNR — the
    contract metric — is plain numpy on each side).
  * CUDA->CPU shim: torch.Tensor.to maps cuda devices to cpu,
    .cuda() returns self, torch.cuda.* telemetry no-ops. The math is
    untouched — every op runs through stock torch CPU kernels.

The working directory is switched to --work so the reference's
relative output dirs (data/trained_model, data/result — yacs
parse_cfg) land in a scratch tree, while module *_path entries in the
config yaml point absolutely into /root/reference.

Usage:
  python tools/ref_cli.py --work /tmp/parity/ref run \
      --type evaluate --cfg_file /tmp/parity/aninerf_ref.yaml ...
  python tools/ref_cli.py --work /tmp/parity/ref train_net \
      --cfg_file /tmp/parity/aninerf_ref.yaml resume False
"""

from __future__ import annotations

import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = "/root/reference"


def _install_tensorboardx_stub():
    if "tensorboardX" in sys.modules:
        return
    mod = types.ModuleType("tensorboardX")

    class SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

        def close(self):
            pass

    mod.SummaryWriter = SummaryWriter
    sys.modules["tensorboardX"] = mod


def _install_skimage_stub():
    if "skimage" in sys.modules:
        return
    from animatable_nerf_tpu.evaluators.image import ssim_metric

    pkg = types.ModuleType("skimage")
    pkg.__path__ = []
    metrics = types.ModuleType("skimage.metrics")

    def structural_similarity(im1, im2, multichannel=False, **kw):
        # the reference calls compare_ssim(pred, gt, multichannel=True)
        # on float crops (if_nerf.py:55); ssim_metric reproduces
        # skimage's float defaults (win 7, data_range 2.0, per-channel
        # mean)
        assert multichannel or kw.get("channel_axis") is not None
        return float(ssim_metric(im1, im2))

    metrics.structural_similarity = structural_similarity
    pkg.metrics = metrics
    sys.modules["skimage"] = pkg
    sys.modules["skimage.metrics"] = metrics


def _install_cuda_cpu_shim():
    import torch

    def _map_dev(x):
        if isinstance(x, str) and x.startswith("cuda"):
            return "cpu"
        if isinstance(x, torch.device) and x.type == "cuda":
            return torch.device("cpu")
        return x

    _tensor_to = torch.Tensor.to

    def _to(self, *args, **kw):
        args = tuple(_map_dev(a) for a in args)
        if "device" in kw:
            kw["device"] = _map_dev(kw["device"])
        return _tensor_to(self, *args, **kw)

    torch.Tensor.to = _to
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.synchronize = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None
    torch.cuda.max_memory_allocated = lambda *a, **k: 0
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.device_count = lambda: 1
    torch.cuda.is_available = lambda: False


def _install_neus_gradient_fix():
    """Patch the NeuS SDFNetwork.gradient for no_grad eval
    (env ANV_REF_NEUS_GRAD_FIX=1).

    Workaround for a genuine reference bug: anisdf_neus_pdf_network.py
    :360-370 `SDFNetwork.gradient` calls torch.autograd.grad WITHOUT
    the `with torch.enable_grad():` guard its anisdf_pdf twin has
    (anisdf_pdf_network.py:306-308), so the reference's own
    `run.py --type evaluate` (which wraps rendering in torch.no_grad,
    run.py:44) crashes on the NeuS family — and the repo ships no NeuS
    eval command in test.sh/extension.sh, so the path was never
    exercised upstream. The patch hooks the dynamic module loader and
    wraps ONLY that method in enable_grad (+ a detached input clone so
    requires_grad_ works on the no_grad-born tensor) — exactly the pdf
    twin's semantics; forward values are unchanged."""
    import functools

    import imp  # the ref_oracle polyfill
    import torch

    orig = imp.load_source

    @functools.wraps(orig)
    def load_source(name, path):
        mod = orig(name, path)
        if path.endswith("anisdf_neus_pdf_network.py"):
            raw = mod.SDFNetwork.gradient

            def gradient(self, x, batch):
                with torch.enable_grad():
                    return raw(self, x.detach().clone(), batch)

            mod.SDFNetwork.gradient = gradient
        return mod

    imp.load_source = load_source


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    assert argv and argv[0] == "--work", (
        "usage: ref_cli.py --work DIR {train_net|run} <reference argv>"
    )
    work = os.path.abspath(argv[1])
    script = argv[2]
    rest = argv[3:]
    assert script in ("train_net", "run"), script

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import ref_oracle

    ref_oracle.verify_reference_pins()
    ref_oracle._install_imp_polyfill()
    ref_oracle._install_pytorch3d_stub()
    ref_oracle._install_misc_stubs()
    ref_oracle._install_pointnet2_stub()
    _install_tensorboardx_stub()
    _install_skimage_stub()
    _install_cuda_cpu_shim()
    if os.environ.get("ANV_REF_NEUS_GRAD_FIX") == "1":
        _install_neus_gradient_fix()

    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    # the reference resolves its intra-package imports via sys.path and
    # its pluggable modules via absolute *_path entries in the yaml
    sys.path.insert(0, REF_ROOT)
    sys.argv = [f"{script}.py"] + rest
    runpy.run_path(os.path.join(REF_ROOT, f"{script}.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
