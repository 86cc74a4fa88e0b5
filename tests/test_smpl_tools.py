"""SMPL body model, point-mesh queries, and the dataset-prep tools
(SURVEY.md §2.10)."""

import os
import sys
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from animatable_nerf_tpu.smpl import (
    SMPLModel,
    load_smpl,
    big_pose_vector,
    barycentric_interpolation,
    closest_point_on_mesh,
    smplx_full_pose,
    smplx_lbs,
)


def _fake_smpl(rng, V=40, S=10):
    """A tiny random 'SMPL' dict with the real keys/shapes (scaled V)."""
    tmpl = rng.randn(V, 3).astype(np.float64) * 0.3
    J = np.zeros((24, V))
    for j in range(24):
        J[j, rng.randint(0, V, 3)] = 1.0 / 3.0
    w = rng.rand(V, 24) ** 4
    w /= w.sum(-1, keepdims=True)
    kt = np.zeros((2, 24), np.int64)
    kt[0] = np.array(
        [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
         18, 19, 20, 21]
    )
    # simple faces: a strip over vertex triples
    faces = np.stack(
        [np.arange(V - 2), np.arange(1, V - 1), np.arange(2, V)], axis=1
    )
    return {
        "v_template": tmpl,
        "shapedirs": rng.randn(V, 3, S) * 0.01,
        "J_regressor": J,
        "weights": w,
        "kintree_table": kt,
        "f": faces,
    }


class TestSMPLModel:
    def test_load_pickle_roundtrip(self, rng, tmp_path):
        smpl = _fake_smpl(rng)
        p = tmp_path / "smpl.pkl"
        with open(p, "wb") as f:
            pickle.dump(smpl, f)
        loaded = load_smpl(str(p))
        np.testing.assert_allclose(loaded["v_template"], smpl["v_template"])
        model = SMPLModel(loaded)
        assert model.weights.shape == (40, 24)
        np.testing.assert_allclose(model.weights.sum(-1), 1.0, atol=1e-6)

    def test_zero_pose_is_identity(self, rng):
        model = SMPLModel(_fake_smpl(rng))
        posed, joints, A = model.lbs(np.zeros((24, 3)))
        np.testing.assert_allclose(posed, model.v_template, atol=1e-5)
        # all bone transforms are identity at rest
        np.testing.assert_allclose(
            A, np.tile(np.eye(4), (24, 1, 1)), atol=1e-5
        )

    def test_lbs_inverse_roundtrip(self, rng):
        model = SMPLModel(_fake_smpl(rng))
        poses = (rng.randn(24, 3) * 0.2).astype(np.float32)
        posed, _, A = model.lbs(poses)
        recovered = model.inverse_lbs(posed, A)
        np.testing.assert_allclose(
            recovered, model.v_template, atol=1e-4
        )

    def test_shape_blendshapes(self, rng):
        model = SMPLModel(_fake_smpl(rng))
        betas = rng.randn(10)
        v = model.shaped_vertices(betas)
        assert not np.allclose(v, model.v_template)
        np.testing.assert_allclose(
            v - model.v_template,
            np.einsum("vcs,s->vc", model.shapedirs, betas),
        )

    def test_big_pose_vector(self):
        bp = big_pose_vector()
        assert bp.shape == (24, 3)
        assert bp[1, 2] == pytest.approx(np.deg2rad(30))
        assert bp[2, 2] == pytest.approx(-np.deg2rad(30))
        assert np.count_nonzero(bp) == 2


    def test_smplh_style_auto_bones(self, rng):
        """SMPL-H/X raw pickles carry more joints (52/55); the bone
        count derives from the kinematic tree and every path is
        joint-count-generic (the reference vendors smplx for this,
        lib/utils/smplx/body_models.py)."""
        V, B = 40, 52
        smpl = _fake_smpl(rng, V=V)
        J = np.zeros((B, V))
        for j in range(B):
            J[j, rng.randint(0, V, 3)] = 1.0 / 3.0
        w = rng.rand(V, B) ** 4
        w /= w.sum(-1, keepdims=True)
        kt = np.zeros((2, B), np.int64)
        kt[0, 1:] = rng.randint(0, np.arange(1, B))  # valid tree: parent < child
        smpl.update(J_regressor=J, weights=w, kintree_table=kt)

        model = SMPLModel(smpl)
        assert model.n_bones == B
        posed, joints, A = model.lbs(np.zeros((B, 3)))
        np.testing.assert_allclose(posed, model.v_template, atol=1e-5)
        poses = (rng.randn(B, 3) * 0.2).astype(np.float32)
        posed, _, A = model.lbs(poses)
        np.testing.assert_allclose(
            model.inverse_lbs(posed, A), model.v_template, atol=1e-4
        )
        bp = big_pose_vector(B)
        assert bp.shape == (B, 3) and np.count_nonzero(bp) == 2
        # explicit n_bones truncates to the SMPL body skeleton
        assert SMPLModel(smpl, n_bones=24).n_bones == 24


class TestPointMesh:
    def test_matches_naive_brute_force(self, rng):
        verts = rng.randn(20, 3).astype(np.float32)
        faces = rng.randint(0, 20, (30, 3))
        faces = faces[
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        ]
        pts = rng.randn(50, 3).astype(np.float32)
        res = closest_point_on_mesh(pts, verts, faces, chunk=16)
        got_d = np.asarray(res["dist"])

        # naive: dense sampling of each triangle
        u = np.linspace(0, 1, 60)
        uu, vv = np.meshgrid(u, u)
        keep = uu + vv <= 1.0
        bu, bv = uu[keep], vv[keep]
        bw = 1.0 - bu - bv
        tri = verts[faces]  # (F, 3, 3)
        samples = (
            bw[None, :, None] * tri[:, None, 0]
            + bu[None, :, None] * tri[:, None, 1]
            + bv[None, :, None] * tri[:, None, 2]
        ).reshape(-1, 3)
        naive_d = np.sqrt(
            ((pts[:, None] - samples[None]) ** 2).sum(-1)
        ).min(1)
        np.testing.assert_allclose(got_d, naive_d, atol=2e-2)
        assert (got_d <= naive_d + 1e-5).all()  # exact <= sampled

    def test_barycentric_consistency(self, rng):
        verts = rng.randn(9, 3).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
        pts = rng.randn(20, 3).astype(np.float32)
        res = closest_point_on_mesh(pts, verts, faces, chunk=8)
        bary = np.asarray(res["bary"])
        fidx = np.asarray(res["face"])
        np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
        assert (bary >= -1e-5).all()
        recon = np.einsum("nk,nkc->nc", bary, verts[faces[fidx]])
        np.testing.assert_allclose(
            recon, np.asarray(res["point"]), atol=1e-5
        )

    def test_point_on_surface_zero_dist(self, rng):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2]])
        pts = np.array([[0.2, 0.2, 0.0], [0.2, 0.2, 0.5]], np.float32)
        res = closest_point_on_mesh(pts, verts, faces, chunk=8)
        d = np.asarray(res["dist"])
        assert d[0] == pytest.approx(0.0, abs=1e-6)
        assert d[1] == pytest.approx(0.5, abs=1e-6)


class TestPrepTools:
    @pytest.fixture
    def data_root(self, rng, tmp_path):
        smpl = _fake_smpl(rng)
        smpl_path = tmp_path / "smpl.pkl"
        with open(smpl_path, "wb") as f:
            pickle.dump(smpl, f)
        model = SMPLModel(smpl)
        human = tmp_path / "data" / "H1"
        (human / "params").mkdir(parents=True)
        (human / "vertices").mkdir(parents=True)
        for i in range(3):
            poses = (rng.randn(24, 3) * 0.1).astype(np.float64)
            Rh = rng.randn(3) * 0.1
            Th = rng.randn(1, 3) * 0.1
            params = {
                "poses": poses.reshape(1, 72),
                "shapes": rng.randn(1, 10) * 0.03,
                "Rh": Rh.reshape(1, 3),
                "Th": Th,
            }
            np.save(human / "params" / f"{i}.npy", params)
            A, R, T, _, _, vs = model.transform_params(params)
            tv = model.inverse_lbs(vs, np.tile(np.eye(4), (24, 1, 1)))
            posed, _, A2 = model.lbs(poses, params["shapes"])
            world = posed @ R.T + T
            np.save(human / "vertices" / f"{i}.npy", world.astype(np.float32))
        return str(tmp_path / "data"), str(smpl_path)

    def test_prepare_lbs_meta(self, data_root):
        import prepare_lbs_meta

        root, smpl_path = data_root
        out = prepare_lbs_meta.prepare_human(root, "H1", smpl_path)
        for name, shape in [
            ("parents.npy", (24,)),
            ("joints.npy", (24, 3)),
            ("weights.npy", (40, 24)),
            ("tvertices.npy", (40, 3)),
            ("bigpose_vertices.npy", (40, 3)),
            ("training_joints.npy", (3, 24, 3)),
        ]:
            arr = np.load(os.path.join(out, name))
            assert arr.shape == shape, name
            assert np.isfinite(arr).all(), name

    def test_prepare_blend_weights(self, data_root):
        import prepare_blend_weights

        root, smpl_path = data_root
        out = prepare_blend_weights.prepare_human(
            root, "H1", smpl_path, frame_interval=2
        )
        tbw = np.load(os.path.join(out, "tbw.npy"))
        assert tbw.ndim == 4 and tbw.shape[-1] == 25
        # weight channels are a convex combination
        np.testing.assert_allclose(
            tbw[..., :24].sum(-1), 1.0, atol=1e-4
        )
        assert (tbw[..., 24] >= 0).all()
        for i in (0, 2):
            bw = np.load(os.path.join(out, "bweights", f"{i}.npy"))
            assert bw.ndim == 4 and bw.shape[-1] == 25


class TestRenderTools:
    @pytest.fixture
    def synth(self, tmp_path):
        from animatable_nerf_tpu.data import generate_synthetic_dataset

        root = str(tmp_path / "human")
        generate_synthetic_dataset(
            root, n_frames=2, n_views=2, image_size=40, n_verts=150,
            n_blobs=24,
        )
        return str(tmp_path), root

    def test_render_uv_maps(self, synth):
        import render_uv_maps

        base, root = synth
        out = render_uv_maps.render_human(base, "human", ratio=1.0)
        uv = np.load(os.path.join(out, "0_0.npy"))
        assert uv.ndim == 3 and uv.shape[-1] == 2
        assert np.isfinite(uv).all()
        assert (np.abs(uv).sum(-1) > 0).sum() > 10  # some coverage

    def test_render_skeleton(self, synth):
        import render_skeleton

        base, root = synth
        out = render_skeleton.render_human(base, "human", max_frames=1)
        import cv2

        img = cv2.imread(os.path.join(out, "0_0.png"))
        assert img is not None and img.sum() > 0

    def test_obj_uv_parser(self, tmp_path):
        import render_uv_maps

        obj = tmp_path / "m.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vt 0.1 0.2\nvt 0.9 0.2\nvt 0.1 0.8\n"
            "f 1/1 2/2 3/3\n"
        )
        uv, faces = render_uv_maps.load_obj_uv(str(obj))
        np.testing.assert_allclose(uv[0], [0.1, 0.2])
        np.testing.assert_allclose(uv[2], [0.1, 0.8])
        assert faces.tolist() == [[0, 1, 2]]


class TestSMPLXGolden:
    """Golden parity of the SMPL-X surface (smplx_full_pose + smplx_lbs)
    against the reference's OWN vendored smplx code run in place
    (lib/utils/smplx/lbs.py:152-248 lbs, body_models.py:1295-1312 pose
    assembly) on an SMPL-X-shaped random model (55 joints, expression
    dirs at column 300, raw-pickle posedirs layout, hand PCA)."""

    SMPLX_PARENTS = np.array(
        [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
         18, 19, 15, 15, 15,
         20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
         21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53]
    )

    def _fake_smplx(self, rng, V=60):
        J = 55
        reg = np.zeros((J, V))
        for j in range(J):
            reg[j, rng.randint(0, V, 3)] = 1.0 / 3.0
        w = rng.rand(V, J) ** 4
        w /= w.sum(-1, keepdims=True)
        kt = np.zeros((2, J), np.int64)
        kt[0] = self.SMPLX_PARENTS
        return {
            "v_template": rng.randn(V, 3) * 0.3,
            # real SMPL-X layout: 400 columns (300 shape + 100 expr;
            # the class treats anything narrower as the reduced
            # 10-shape+10-expr layout, body_models.py:1143-1152)
            "shapedirs": rng.randn(V, 3, 400) * 0.01,
            # raw pickle layout (V, 3, 54*9)
            "posedirs": rng.randn(V, 3, (J - 1) * 9) * 0.001,
            "J_regressor": reg,
            "weights": w,
            "kintree_table": kt,
            "hands_componentsl": rng.randn(6, 45) * 0.5,
            "hands_componentsr": rng.randn(6, 45) * 0.5,
            "hands_meanl": rng.randn(45) * 0.1,
            "hands_meanr": rng.randn(45) * 0.1,
        }

    def test_lbs_golden_vs_reference(self):
        torch = pytest.importorskip("torch")
        import ref_oracle

        ref_oracle.install()
        lbs_mod = ref_oracle.load("lib.utils.smplx.lbs")

        rng = np.random.RandomState(3)
        m = self._fake_smplx(rng)
        betas = rng.randn(10) * 0.5
        expression = rng.randn(10) * 0.5
        pose_parts = dict(
            global_orient=rng.randn(3) * 0.3,
            body_pose=rng.randn(63) * 0.3,
            jaw_pose=rng.randn(3) * 0.1,
            leye_pose=rng.randn(3) * 0.1,
            reye_pose=rng.randn(3) * 0.1,
            left_hand_pose=rng.randn(6),
            right_hand_pose=rng.randn(6),
        )

        # ours
        full = smplx_full_pose(
            **pose_parts,
            hands_componentsl=m["hands_componentsl"],
            hands_componentsr=m["hands_componentsr"],
            hands_meanl=m["hands_meanl"],
            hands_meanr=m["hands_meanr"],
            use_pca=True, num_pca_comps=6,
        )
        verts, joints = smplx_lbs(m, betas, expression, full)

        # reference: assemble the pose exactly like SMPLX.forward
        # (body_models.py:1295-1312) and call its lbs directly
        t = lambda x: torch.as_tensor(np.asarray(x), dtype=torch.float64)
        lh = t(pose_parts["left_hand_pose"])[None] @ t(
            m["hands_componentsl"])
        rh = t(pose_parts["right_hand_pose"])[None] @ t(
            m["hands_componentsr"])
        full_ref = torch.cat([
            t(pose_parts["global_orient"])[None],
            t(pose_parts["body_pose"])[None],
            t(pose_parts["jaw_pose"])[None],
            t(pose_parts["leye_pose"])[None],
            t(pose_parts["reye_pose"])[None],
            lh, rh,
        ], dim=1).reshape(1, 165)
        pose_mean = torch.cat([
            torch.zeros(75, dtype=torch.float64),
            t(m["hands_meanl"]), t(m["hands_meanr"]),
        ])
        full_ref = full_ref + pose_mean
        np.testing.assert_allclose(
            full, full_ref[0].numpy(), rtol=1e-12, atol=1e-12,
        )

        shape_components = torch.cat(
            [t(betas)[None], t(expression)[None]], dim=-1)
        shapedirs = torch.cat([
            t(m["shapedirs"][..., :10]),
            t(m["shapedirs"][..., 300:310]),
        ], dim=-1)
        # the smplx class reshapes raw (V, 3, P) posedirs to (P, V*3)
        V = m["v_template"].shape[0]
        posedirs_ref = t(
            np.reshape(m["posedirs"], (V * 3, -1)).T
        )
        verts_ref, joints_ref = lbs_mod.lbs(
            shape_components, full_ref, t(m["v_template"])[None],
            shapedirs, posedirs_ref, t(m["J_regressor"]),
            torch.as_tensor(self.SMPLX_PARENTS).long(),
            t(m["weights"]), pose2rot=True,
        )
        np.testing.assert_allclose(
            verts, verts_ref[0].numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            joints, joints_ref[0].numpy(), rtol=1e-5, atol=1e-6,
        )

    def test_forward_golden_vs_reference_class(self, tmp_path):
        """smplx_forward vs the reference's OWN vendored SMPLX class
        (body_models.py:1295-1382) run in place on a random
        SMPL-X-shaped pickle: vertices, the full joint set (55 LBS +
        21 vertex joints + 51 static + 17 contour landmarks),
        full_pose, and the transl shift must all match.

        V = 10475 (the class hard-codes VERTEX_IDS['smplx'] vertex
        joints, whose largest index is 9929)."""
        torch = pytest.importorskip("torch")
        import pickle as pkl

        import ref_oracle

        ref_oracle.install()
        bm = ref_oracle.load("lib.utils.smplx.body_models")

        from animatable_nerf_tpu.smpl.body_model import smplx_forward

        rng = np.random.RandomState(11)
        V, J, F = 10475, 55, 200
        reg = np.zeros((J, V), np.float32)
        for j in range(J):
            reg[j, rng.randint(0, V, 3)] = 1.0 / 3.0
        w = (rng.rand(V, J) ** 4).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        kt = np.zeros((2, J), np.int64)
        kt[0] = self.SMPLX_PARENTS
        model = {
            "v_template": (rng.randn(V, 3) * 0.3).astype(np.float32),
            "shapedirs": (rng.randn(V, 3, 400) * 0.01).astype(np.float32),
            "posedirs": (
                rng.randn(V, 3, (J - 1) * 9) * 0.001
            ).astype(np.float32),
            "J_regressor": reg,
            "weights": w,
            "kintree_table": kt,
            "f": rng.randint(0, V, (F, 3)).astype(np.int64),
            "hands_componentsl": (rng.randn(6, 45) * 0.5).astype(np.float32),
            "hands_componentsr": (rng.randn(6, 45) * 0.5).astype(np.float32),
            "hands_meanl": (rng.randn(45) * 0.1).astype(np.float32),
            "hands_meanr": (rng.randn(45) * 0.1).astype(np.float32),
            "lmk_faces_idx": rng.randint(0, F, 51).astype(np.int64),
            "lmk_bary_coords": rng.dirichlet(
                np.ones(3), 51
            ).astype(np.float32),
            "dynamic_lmk_faces_idx": rng.randint(
                0, F, (79, 17)
            ).astype(np.int64),
            "dynamic_lmk_bary_coords": rng.dirichlet(
                np.ones(3), (79, 17)
            ).astype(np.float32),
        }
        path = str(tmp_path / "SMPLX_NEUTRAL.pkl")
        with open(path, "wb") as fh:
            pkl.dump(model, fh)

        args = dict(
            betas=rng.randn(10) * 0.5,
            expression=rng.randn(10) * 0.5,
            global_orient=rng.randn(3) * 0.3,
            body_pose=rng.randn(63) * 0.2,
            jaw_pose=rng.randn(3) * 0.1,
            leye_pose=rng.randn(3) * 0.1,
            reye_pose=rng.randn(3) * 0.1,
            left_hand_pose=rng.randn(6) * 0.5,
            right_hand_pose=rng.randn(6) * 0.5,
            transl=rng.randn(3) * 0.2,
        )
        ref = bm.SMPLX(
            path, ext="pkl", use_pca=True, num_pca_comps=6,
            flat_hand_mean=False, use_face_contour=True, batch_size=1,
        )
        t = {k: torch.as_tensor(
            np.asarray(v, np.float32)
        ).reshape(1, -1) for k, v in args.items()}
        out_ref = ref.forward(return_verts=True, return_full_pose=True, **t)

        ours = smplx_forward(
            model, use_pca=True, num_pca_comps=6, flat_hand_mean=False,
            use_face_contour=True, **args,
        )
        np.testing.assert_allclose(
            ours["vertices"], out_ref.vertices.detach().numpy()[0],
            atol=2e-5,
        )
        assert ours["joints"].shape == (J + 21 + 51 + 17, 3)
        np.testing.assert_allclose(
            ours["joints"], out_ref.joints.detach().numpy()[0], atol=2e-5,
        )
        np.testing.assert_allclose(
            ours["full_pose"], out_ref.full_pose.detach().numpy()[0],
            atol=1e-5,
        )

    def test_no_pca_flat_hands(self):
        """use_pca=False + flat_hand_mean=True: raw 45-dof hands, no
        mean shift (body_models.py:700-716)."""
        rng = np.random.RandomState(5)
        m = self._fake_smplx(rng)
        lh = rng.randn(45)
        full = smplx_full_pose(
            global_orient=np.zeros(3), body_pose=np.zeros(63),
            left_hand_pose=lh, right_hand_pose=np.zeros(45),
            use_pca=False, flat_hand_mean=True,
        )
        np.testing.assert_allclose(full[75:120], lh)
        assert np.all(full[120:] == 0) and np.all(full[:75] == 0)
