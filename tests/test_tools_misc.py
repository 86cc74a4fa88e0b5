"""ply_to_occupancy tool, external-evaluation run type, and the extra
loss criterions."""

import os
import struct
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

import ply_to_occupancy as p2o
from animatable_nerf_tpu.train.losses import elastic_crit, normal_crit


def _write_ascii_ply(path, pts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def _write_binary_ply(path, pts):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(pts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        for p in pts:
            f.write(struct.pack("<3f", *p))


class TestPlyToOccupancy:
    def test_ply_readers(self, rng, tmp_path):
        pts = rng.randn(50, 3).astype(np.float32)
        a = tmp_path / "a.ply"
        b = tmp_path / "b.ply"
        _write_ascii_ply(a, pts)
        _write_binary_ply(b, pts)
        np.testing.assert_allclose(p2o.load_ply(str(a)), pts, rtol=1e-5)
        np.testing.assert_allclose(p2o.load_ply(str(b)), pts, rtol=1e-6)

    def test_voxelize_nearest_cell(self):
        # a point exactly on a grid node occupies exactly that cell
        step = 1.0 / (p2o.RES - 1)
        model = np.array([[p2o.BB_MIN + 3 * step, 0.0, 0.0]], np.float32)
        packed = p2o.voxelize(model)
        grid = np.unpackbits(packed).reshape(p2o.RES, p2o.RES, p2o.RES)
        assert grid.sum() == 1
        mid = (p2o.RES - 1) // 2  # 0.0 maps between cells; nearest-round
        xs, ys, zs = np.where(grid)
        assert xs[0] == 3

    def test_end_to_end_layout(self, rng, tmp_path):
        root = tmp_path / "light_stage"
        pc = root / "point_cloud" / "H1"
        pc.mkdir(parents=True)
        for i in range(2):
            _write_binary_ply(
                pc / f"{i}.ply", rng.randn(100, 3).astype(np.float32)
            )
        p2o.ply_to_occupancy(str(root))
        for i in range(2):
            data = np.load(root / "voxel" / "H1" / f"{i}.npz")
            occ = np.unpackbits(data["compressed_occupancies"])
            assert occ.shape[0] == p2o.RES**3
            assert 0 < occ.sum() <= 100
            assert data["bounds"].shape == (2, 3)


class TestExtraCrits:
    def test_elastic_identity_zero(self):
        jac = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (5, 1, 1)))
        assert float(elastic_crit(jac)) < 1e-8
        assert float(elastic_crit(jac * 2.0)) > 0.1

    def test_normal_crit_masked(self, rng):
        n = jnp.asarray(rng.randn(6, 3).astype(np.float32))
        v = jnp.asarray(rng.randn(6, 3).astype(np.float32))
        m = jnp.asarray(np.array([1, 1, 1, 0, 0, 0], bool))
        assert np.isfinite(float(normal_crit(n, n, v, m)))


class TestEvaluateExternal:
    def test_rescore_saved_renders(self, tmp_path, rng):
        import cv2
        from animatable_nerf_tpu.config import load_config
        from animatable_nerf_tpu.data import generate_synthetic_dataset
        from animatable_nerf_tpu import engine

        root = str(tmp_path / "human")
        generate_synthetic_dataset(
            root, n_frames=2, n_views=2, image_size=48, n_verts=200,
            n_blobs=32,
        )
        opts = [
            "train_dataset.data_root", root,
            "train_dataset.ann_file", os.path.join(root, "annots.npy"),
            "test_dataset.data_root", root,
            "test_dataset.ann_file", os.path.join(root, "annots.npy"),
            "training_view", "[0]", "test_view", "[1]",
            "num_train_frame", "2", "H", "48", "W", "48",
            "result_dir", str(tmp_path / "res"),
        ]
        cfg = load_config("configs/synthetic.yaml", opts=opts)
        ds = engine.make_dataset(cfg, "test")
        item = ds[0]
        # save the GT image itself as the "external prediction"
        pred_dir = tmp_path / "preds"
        pred_dir.mkdir()
        H, W = int(item["H"]), int(item["W"])
        mab = np.asarray(item["mask_at_box"]).reshape(H, W)
        img = np.zeros((H, W, 3), np.float32)
        img[mab] = np.asarray(item["rgb"])
        fi, vi = int(item["frame_index"]), int(item["cam_ind"])
        cv2.imwrite(
            str(pred_dir / f"frame{fi:04d}_view{vi:04d}.png"),
            (img[..., ::-1] * 255).astype(np.uint8),
        )
        out = engine.run_evaluate_external(
            cfg, pred_dir=str(pred_dir), max_items=1
        )
        assert out["psnr"] > 35  # self-comparison, only 8-bit quantization


class TestValidateDataset:
    """tools/validate_dataset.py — the real-data dress rehearsal
    (VERDICT-r3 item 7): clean synthetic layout passes, broken layouts
    produce targeted errors."""

    @pytest.fixture(scope="class")
    def vroot(self, tmp_path_factory):
        from animatable_nerf_tpu.data import generate_synthetic_dataset

        root = str(tmp_path_factory.mktemp("validate") / "human")
        generate_synthetic_dataset(
            root, n_frames=2, n_views=2, image_size=48,
            n_verts=120, n_blobs=16, seed=2,
        )
        return root

    def test_clean_dataset_passes(self, vroot):
        import validate_dataset as vd

        report = vd.validate(vroot, n_check_frames=2)
        assert report.errors == []
        assert any("frames x" in m for m in report.infos)

    def test_cli_exit_codes(self, vroot, tmp_path):
        import validate_dataset as vd

        assert vd.main([vroot]) == 0
        empty = tmp_path / "empty"
        empty.mkdir()
        assert vd.main([str(empty)]) == 1

    def test_broken_shapes_reported(self, vroot, tmp_path):
        import shutil

        import validate_dataset as vd

        broken = str(tmp_path / "broken")
        shutil.copytree(vroot, broken)
        # wrong weights shape + params missing a key + truncated verts
        np.save(os.path.join(broken, "lbs", "weights.npy"),
                np.zeros((7, 3), np.float32))
        p = np.load(os.path.join(broken, "params", "0.npy"),
                    allow_pickle=True).item()
        del p["poses"]
        np.save(os.path.join(broken, "params", "0.npy"), p)
        v = np.load(os.path.join(broken, "vertices", "1.npy"))
        np.save(os.path.join(broken, "vertices", "1.npy"), v[:10])
        report = vd.validate(broken, n_check_frames=2)
        msgs = "\n".join(report.errors)
        assert "weights.npy shape" in msgs
        assert "missing 'poses'" in msgs
        assert "vertices" in msgs and "10 vertices" in msgs

    def test_nonzero_distortion_reported_as_info(self, vroot, tmp_path):
        import shutil

        import validate_dataset as vd

        dist = str(tmp_path / "dist")
        shutil.copytree(vroot, dist)
        ann_path = os.path.join(dist, "annots.npy")
        ann = np.load(ann_path, allow_pickle=True).item()
        ann["cams"]["D"] = [
            np.array([[-0.2], [0.05], [0.001], [0.0], [0.0]])
            for _ in ann["cams"]["D"]
        ]
        np.save(ann_path, ann)
        report = vd.validate(dist, n_check_frames=1)
        assert report.errors == []
        assert any("nonzero distortion" in m for m in report.infos)
