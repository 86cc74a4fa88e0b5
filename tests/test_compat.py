"""Torch-checkpoint import (compat/): primitive-level functional
equivalence against real torch layers, and full-tree structural
round-trips into AniNeRF / SDFPDF."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from animatable_nerf_tpu.compat import (
    conv1d_to_dense,
    linear_to_dense,
    weight_norm_to_wn,
    convert_aninerf,
    convert_sdf_pdf,
)
from animatable_nerf_tpu.fields.mlp import wn_apply


class TestPrimitives:
    def test_conv1d_k1_equals_dense(self, rng):
        conv = torch.nn.Conv1d(7, 5, 1)
        x = rng.randn(1, 7, 11).astype(np.float32)
        want = conv(torch.from_numpy(x)).detach().numpy()[0].T  # (11, 5)
        k = conv1d_to_dense(conv.weight.detach().numpy())
        b = conv.bias.detach().numpy()
        got = x[0].T @ k + b
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_weight_norm_linear_equals_wn_apply(self, rng):
        lin = torch.nn.utils.weight_norm(torch.nn.Linear(9, 4))
        x = rng.randn(13, 9).astype(np.float32)
        want = lin(torch.from_numpy(x)).detach().numpy()
        sd = {k: v.detach().numpy() for k, v in lin.state_dict().items()}
        p = weight_norm_to_wn(sd["weight_v"], sd["weight_g"], sd["bias"])
        got = np.asarray(wn_apply(p, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _conv_entry(rng, cin, cout):
    return (
        (rng.randn(cout, cin, 1) * 0.05).astype(np.float32),
        (rng.randn(cout) * 0.01).astype(np.float32),
    )


def _skip_stack(rng, state, prefix_lin, prefix_fc, cin, width, cout):
    w, b = _conv_entry(rng, cin, width)
    state[f"{prefix_lin}.0.weight"], state[f"{prefix_lin}.0.bias"] = w, b
    for i in range(1, 8):
        ci = width + cin if i == 5 else width
        w, b = _conv_entry(rng, ci, width)
        state[f"{prefix_lin}.{i}.weight"] = w
        state[f"{prefix_lin}.{i}.bias"] = b
    w, b = _conv_entry(rng, width, cout)
    state[f"{prefix_fc}.weight"], state[f"{prefix_fc}.bias"] = w, b


def _wn_entry(rng, state, prefix, cin, cout):
    v = (rng.randn(cout, cin) * 0.05).astype(np.float32)
    state[prefix + ".weight_v"] = v
    state[prefix + ".weight_g"] = np.linalg.norm(v, axis=1, keepdims=True)
    state[prefix + ".bias"] = (rng.randn(cout) * 0.01).astype(np.float32)


def _aninerf_state(rng, n_train=4, n_eval=0):
    s = {}
    s["bw_latent.weight"] = rng.randn(n_train + 1, 128).astype(np.float32)
    _skip_stack(rng, s, "bw_linears", "bw_fc", 191, 256, 24)
    th = "tpose_human."
    _skip_stack(rng, s, th + "pts_linears", th + "alpha_fc", 63, 256, 1)
    # fix alpha head input: alpha_fc comes off the trunk (256)
    w, b = _conv_entry(rng, 256, 1)
    s[th + "alpha_fc.weight"], s[th + "alpha_fc.bias"] = w, b
    for name, ci, co in [
        ("feature_fc", 256, 256),
        ("latent_fc", 384, 256),
        ("view_fc", 283, 128),
        ("rgb_fc", 128, 3),
    ]:
        w, b = _conv_entry(rng, ci, co)
        s[th + name + ".weight"], s[th + name + ".bias"] = w, b
    s[th + "nf_latent.weight"] = rng.randn(n_train, 128).astype(np.float32)
    if n_eval:
        s["novel_pose_bw.bw_latent.weight"] = rng.randn(n_eval, 128).astype(
            np.float32
        )
        _skip_stack(
            rng, s, "novel_pose_bw.bw_linears", "novel_pose_bw.bw_fc",
            191, 256, 24,
        )
    return s


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)


class TestConvertAniNeRF:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.models import AniNeRF

        state = _aninerf_state(rng, n_train=4)
        converted = convert_aninerf(state)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 16).items()}
        model = AniNeRF(num_train_frames=4)
        z = jnp.ones((16, 8))
        wpts = jnp.zeros((16, 8, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        assert np.isfinite(np.asarray(out["raw"])).all()


class TestConvertSDFPDF:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.models import SDFPDF

        s = {}
        _skip_stack(rng, s, "resd_linears", "resd_fc", 135, 256, 3)
        th = "tpose_human."
        dims = [39] + [256] * 8 + [257]
        skip_in = (4,)
        for l in range(9):
            cout = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
            _wn_entry(rng, s, f"{th}sdf_network.lin{l}", dims[l], cout)
        s[th + "beta_network.beta"] = np.asarray(0.1, np.float32)
        color_dims = [(289, 256), (256, 256), (256, 256), (384, 256), (256, 3)]
        for l, (ci, co) in enumerate(color_dims):
            _wn_entry(rng, s, f"{th}color_network.lin{l}", ci, co)
        s[th + "color_network.color_latent.weight"] = rng.randn(4, 128).astype(
            np.float32
        )
        converted = convert_sdf_pdf(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = SDFPDF(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        assert np.isfinite(np.asarray(out["raw"])).all()


def _geometric_head_state(rng, s, n_latents=4):
    """tpose_human.{nerf_network, color_network} entries shared by the
    NeRF-PDF and aligned families (weight-normed geometric NeRF +
    no-normals IDR color net)."""
    th = "tpose_human."
    dims = [39] + [256] * 8 + [257]
    skip_in = (4,)
    for l in range(9):
        cout = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        _wn_entry(rng, s, f"{th}nerf_network.lin{l}", dims[l], cout)
    # no-normals color input: pts (3) + view PE (27) + feature (256)
    color_dims = [(286, 256), (256, 256), (256, 256), (384, 256), (256, 3)]
    for l, (ci, co) in enumerate(color_dims):
        _wn_entry(rng, s, f"{th}color_network.lin{l}", ci, co)
    s[th + "color_network.color_latent.weight"] = rng.randn(
        n_latents, 128
    ).astype(np.float32)


class TestConvertNeRFPDF:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.compat import convert_nerf_pdf
        from animatable_nerf_tpu.models import NeRFPDF

        s = {}
        _skip_stack(rng, s, "resd_linears", "resd_fc", 135, 256, 3)
        _geometric_head_state(rng, s)
        converted = convert_nerf_pdf(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = NeRFPDF(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        assert np.isfinite(np.asarray(out["raw"])).all()


class TestConvertAlignedLBW:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.compat import convert_aligned_lbw
        from animatable_nerf_tpu.models import AlignedLBW

        s = {}
        s["bw_latent.weight"] = rng.randn(5, 128).astype(np.float32)
        _skip_stack(rng, s, "bw_linears", "bw_fc", 191, 256, 24)
        _geometric_head_state(rng, s)
        converted = convert_aligned_lbw(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = AlignedLBW(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()


class TestConvertAlignedPBW:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.compat import convert_aligned_pbw
        from animatable_nerf_tpu.models import AlignedPBW

        s = {}
        # pose-conditioned bw MLP: input 63 PE + 72 poses = 135
        s["bw_latent.weight"] = rng.randn(5, 128).astype(np.float32)  # dead
        _skip_stack(rng, s, "bw_linears", "bw_fc", 135, 256, 24)
        _geometric_head_state(rng, s)
        converted = convert_aligned_pbw(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = AlignedPBW(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()


class TestConvertAlignedSMPL:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.compat import convert_aligned_smpl
        from animatable_nerf_tpu.models import AlignedSMPL

        s = {"resd_latent.weight": rng.randn(4, 128).astype(np.float32)}  # dead
        _geometric_head_state(rng, s)
        converted = convert_aligned_smpl(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = AlignedSMPL(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()


class TestConvertAlignedLBWPDF:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.compat import convert_aligned_lbw_pdf
        from animatable_nerf_tpu.models import AlignedLBWPDF

        s = {}
        s["bw_latent.weight"] = rng.randn(5, 128).astype(np.float32)
        _skip_stack(rng, s, "bw_linears", "bw_fc", 191, 256, 24)
        _skip_stack(rng, s, "resd_linears", "resd_fc", 135, 256, 3)
        _geometric_head_state(rng, s)
        converted = convert_aligned_lbw_pdf(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = AlignedLBWPDF(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()


class TestConvertNeuSPDF:
    def test_structure_matches_init_and_runs(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.compat import convert_neus_pdf
        from animatable_nerf_tpu.models import NeuSPDF

        s = {}
        _skip_stack(rng, s, "resd_linears", "resd_fc", 135, 256, 3)
        th = "tpose_human."
        dims = [39] + [256] * 8 + [257]
        skip_in = (4,)
        for l in range(9):
            cout = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
            _wn_entry(rng, s, f"{th}sdf_network.lin{l}", dims[l], cout)
        s[th + "variance_network.variance"] = np.asarray(0.3, np.float32)
        color_dims = [(289, 256), (256, 256), (256, 256), (384, 256), (256, 3)]
        for l, (ci, co) in enumerate(color_dims):
            _wn_entry(rng, s, f"{th}color_network.lin{l}", ci, co)
        s[th + "color_network.color_latent.weight"] = rng.randn(4, 128).astype(
            np.float32
        )
        converted = convert_neus_pdf(s)

        frame = {
            k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 8).items()}
        model = NeuSPDF(num_latents=4)
        z = jnp.ones((8, 4))
        wpts = jnp.zeros((8, 4, 3))
        init_params = model.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], z, frame, train=False
        )
        assert _tree_shapes(init_params) == _tree_shapes(converted)

        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        out = model.apply(
            converted, wpts, rays["ray_d"], z, frame, train=False
        )
        assert np.isfinite(np.asarray(out["raw"])).all()


class TestImportToolEndToEnd:
    def test_pth_to_flax_roundtrip(self, rng, tmp_path):
        """tools/import_torch_checkpoint.py: save a reference-format
        .pth, import it through the CLI entry, and restore it through
        the engine's load path (train/checkpoints.py)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
        )
        import __graft_entry__ as ge
        import import_torch_checkpoint as tool
        from animatable_nerf_tpu.config import load_config
        from animatable_nerf_tpu.models import make_model
        from animatable_nerf_tpu.train.checkpoints import load_checkpoint

        state = _aninerf_state(rng, n_train=4)
        pth = tmp_path / "latest.pth"
        torch.save(
            {"net": {k: torch.from_numpy(v) for k, v in state.items()},
             "epoch": 7},
            str(pth),
        )

        out = tmp_path / "model"
        tool.main([
            "--cfg_file", "configs/aninerf_313.yaml",
            "--pth", str(pth),
            "--out", str(out),
            "num_train_frame", "4", "exp_name", "import_test",
        ])
        assert (out / "latest.flax").exists()
        assert (out / "7.flax").exists()

        cfg = load_config(
            "configs/aninerf_313.yaml",
            ["num_train_frame", "4", "exp_name", "import_test"],
        )
        model = make_model(cfg)
        frame = {k: jnp.asarray(v) for k, v in ge._synthetic_frame(rng).items()}
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 4).items()}
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((4, 4, 3)), rays["ray_d"],
            jnp.ones((4, 4)), frame, train=False,
        )
        params, _, epoch, _, _ = load_checkpoint(str(out), template)
        assert epoch == 7
        got = np.asarray(
            jax.tree_util.tree_leaves(params)[0], dtype=np.float32
        )
        want = np.asarray(
            jax.tree_util.tree_leaves(convert_aninerf(state))[0],
            dtype=np.float32,
        )
        np.testing.assert_array_equal(got, want)

    def test_wrong_config_shape_rejected(self, rng, tmp_path):
        """The structural verify refuses a checkpoint whose latent table
        disagrees with the config's frame count."""
        import sys, os
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
        )
        import import_torch_checkpoint as tool

        state = _aninerf_state(rng, n_train=4)
        pth = tmp_path / "latest.pth"
        torch.save(
            {"net": {k: torch.from_numpy(v) for k, v in state.items()},
             "epoch": 1},
            str(pth),
        )
        with pytest.raises(SystemExit):
            tool.main([
                "--cfg_file", "configs/aninerf_313.yaml",
                "--pth", str(pth),
                "--out", str(tmp_path / "m"),
                "num_train_frame", "9", "exp_name", "import_test",
            ])
