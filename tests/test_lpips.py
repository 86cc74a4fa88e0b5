"""LPIPS metric tests: parity against a torch oracle (the published
lpips/lpips.py computation: scaling layer, backbone taps, channel
unit-normalize, squared diff, non-negative 1x1 lin conv, spatial mean,
layer sum), the torch-checkpoint converter round-trip, and the CLI
scoring path.

The oracle runs with RANDOM weights — parity of the computation graph is
what turns "user supplies the real torchvision + LPIPS checkpoints" into
"user gets the real metric" (reference run.py:138-140's dangling lpips
entry)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from animatable_nerf_tpu.evaluators.lpips import (
    lpips_distance,
    load_lpips,
    random_params,
    score_comparison_dir,
    SPECS,
    _SHIFT,
    _SCALE,
)
from tools.convert_lpips_weights import convert, BACKBONE_CONV_IDX


def _torch_lpips(convs, lins, arch, a, b):
    """Oracle forward in torch, following lpips/lpips.py LPIPS.forward +
    the torchvision feature stacks (inputs already in [-1, 1])."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def taps(x):
        x = (x - shift) / scale
        outs, ci = [], 0
        for op in SPECS[arch]:
            if op[0] == "conv":
                x = tF.relu(convs[ci](x))
                ci += 1
            elif op[0] == "tap":
                outs.append(x)
            elif op[0] == "pool":
                x = tF.max_pool2d(x, 3, 2)
            elif op[0] == "pool2":
                x = tF.max_pool2d(x, 2, 2)
        return outs

    fa, fb = taps(a), taps(b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        nx = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        ny = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (nx - ny) ** 2
        w = lins[i].view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean(dim=(1, 2))
    return total


@pytest.mark.parametrize("arch", ["alex", "vgg"])
def test_lpips_matches_torch_oracle(arch, tmp_path):
    """Random torch state_dicts -> converter -> our JAX forward equals
    the torch oracle with the same weights."""
    torch.manual_seed(3)
    r = np.random.RandomState(3)

    convs, tap_ch = [], []
    in_ch = 3
    for op in SPECS[arch]:
        if op[0] == "conv":
            _, out_ch, k, s, p = op
            convs.append(tnn.Conv2d(in_ch, out_ch, k, stride=s, padding=p))
            in_ch = out_ch
        elif op[0] == "tap":
            tap_ch.append(in_ch)

    # torchvision-style backbone state_dict (features.<i>.weight/bias)
    conv_idx = BACKBONE_CONV_IDX[arch]
    assert len(convs) == len(conv_idx)
    sd = {}
    for mi, m in zip(conv_idx, convs):
        sd[f"features.{mi}.weight"] = m.weight.detach().clone()
        sd[f"features.{mi}.bias"] = m.bias.detach().clone()
    bb_path = tmp_path / "backbone.pth"
    torch.save(sd, bb_path)

    # lpips-style calibration weights (lin<i>.model.1.weight, (1,C,1,1))
    lins = [torch.tensor(r.rand(c).astype(np.float32) * 0.2) for c in tap_ch]
    lin_path = tmp_path / "lin.pth"
    torch.save(
        {f"lin{i}.model.1.weight": w.view(1, -1, 1, 1).clone()
         for i, w in enumerate(lins)},
        lin_path,
    )

    params = convert(arch, str(bb_path), str(lin_path))
    npz_path = tmp_path / "lpips.npz"
    np.savez(npz_path, **params)
    jparams = load_lpips(str(npz_path))
    assert jparams["arch"] == arch

    size = 64
    a = r.rand(2, size, size, 3).astype(np.float32)
    b = np.clip(a + r.randn(2, size, size, 3).astype(np.float32) * 0.1, 0, 1)

    ours = np.asarray(lpips_distance(jparams, jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        ta = torch.tensor(a).permute(0, 3, 1, 2) * 2 - 1
        tb = torch.tensor(b).permute(0, 3, 1, 2) * 2 - 1
        ref = _torch_lpips(convs, lins, arch, ta, tb).numpy()

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    # metric sanity: identity -> 0, perturbed -> positive
    same = np.asarray(lpips_distance(jparams, jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(same, 0.0, atol=1e-7)
    assert (ours > 0).all()


def test_score_comparison_dir(tmp_path):
    """CLI path: pred/gt pairs on disk -> lpips.npy + summary."""
    cv2 = pytest.importorskip("cv2")
    comp = tmp_path / "comparison"
    comp.mkdir()
    r = np.random.RandomState(0)
    for fi in range(2):
        img = (r.rand(64, 64, 3) * 255).astype(np.uint8)
        noisy = np.clip(
            img.astype(int) + r.randint(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        cv2.imwrite(str(comp / f"frame{fi:04d}_view0000.png"), noisy)
        cv2.imwrite(str(comp / f"frame{fi:04d}_view0000_gt.png"), img)
    # stray non-pair files must be ignored
    cv2.imwrite(str(comp / "depth0000.png"), np.zeros((8, 8), np.uint8))

    params = random_params("alex", seed=1)
    wpath = tmp_path / "w.npz"
    np.savez(wpath, **params)

    out = score_comparison_dir(str(tmp_path), str(wpath))
    assert len(out["lpips"]) == 2
    assert np.isfinite(out["mean"]) and out["mean"] > 0
    saved = np.load(tmp_path / "lpips.npy", allow_pickle=True).item()
    assert saved["names"] == ["frame0000_view0000", "frame0001_view0000"]
