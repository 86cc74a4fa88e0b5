"""Validate a ZJU-MoCap / Human3.6M-layout dataset directory before
training (VERDICT-r3 item 7: the real-data dress rehearsal).

Checks the on-disk schema both dataset families read
(animatable_nerf_tpu/data/dataset.py; reference
lib/datasets/tpose_dataset.py:15-161 / tpose_pdf_dataset.py:15-90):

  <root>/annots.npy          dict {cams: {K,R,T,D}, ims: [{ims: [...]}]}
  <root>/images...           per the ims table (any relative layout)
  <root>/mask|mask_cihp/...  one of the four mask path candidates
  <root>/params/<i>.npy      dict {poses (72|J*3), Rh (3), Th (3), shapes}
  <root>/vertices/<i>.npy    (V, 3) float posed SMPL vertices
  <root>/lbs/joints.npy      (J, 3)      lbs/parents.npy  (J,)
  <root>/lbs/weights.npy     (V, J)      lbs/tvertices.npy (V, 3)
  <root>/lbs/tbw.npy         (D,H,W,J+1) [grid family]
  <root>/lbs/bweights/<i>.npy            [grid family, per frame]
  <root>/lbs/bigpose_vertices.npy        [use_bigpose pdf configs]
  <root>/lbs/training_joints.npy         [novel-pose eval]

Usage:
  python tools/validate_dataset.py <data_root> [--frames N] [--family all|grid|knn]

Exit code 0 = usable (warnings allowed), 1 = schema errors. Prints a
report of every check. `--frames` bounds how many frames get their
params/vertices/bweights opened (default 5, spread over the table).

Note on distortion: nonzero cams.D is NORMAL for real ZJU/H36M data —
the loader undistorts images and masks (data/dataset.py:142-144,
exercised with D != 0 by tests/test_golden_data.py). The validator
reports whether D is zero or not so a surprising value is visible.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


class Report:
    def __init__(self):
        self.errors = []
        self.warnings = []
        self.infos = []

    def error(self, msg):
        self.errors.append(msg)
        print(f"  ERROR: {msg}")

    def warn(self, msg):
        self.warnings.append(msg)
        print(f"  warn:  {msg}")

    def info(self, msg):
        self.infos.append(msg)
        print(f"  ok:    {msg}")


def _load(report, path, what):
    if not os.path.exists(path):
        report.error(f"{what}: missing file {path}")
        return None
    try:
        return np.load(path, allow_pickle=True)
    except Exception as e:  # corrupt / wrong format
        report.error(f"{what}: failed to load {path}: {e}")
        return None


def _check_cams(report, cams, n_views):
    for key in ("K", "R", "T", "D"):
        if key not in cams:
            report.error(f"annots.cams missing '{key}'")
            return
        if len(cams[key]) != n_views:
            report.error(
                f"annots.cams['{key}'] has {len(cams[key])} entries, "
                f"ims table has {n_views} views"
            )
    shapes = {"K": (3, 3), "R": (3, 3)}
    for key, want in shapes.items():
        arr = np.asarray(cams[key][0], dtype=np.float64)
        if arr.shape != want:
            report.error(f"cams['{key}'][0] shape {arr.shape}, want {want}")
    t = np.asarray(cams["T"][0], dtype=np.float64).reshape(-1)
    if t.size != 3:
        report.error(f"cams['T'][0] has {t.size} elements, want 3")
    d = np.asarray(cams["D"][0], dtype=np.float64).reshape(-1)
    if d.size not in (4, 5, 8):
        report.error(
            f"cams['D'][0] has {d.size} coefficients (cv2.undistort "
            "accepts 4, 5 or 8)"
        )
    d_all = np.concatenate(
        [np.asarray(x, dtype=np.float64).reshape(-1) for x in cams["D"]]
    )
    if np.any(d_all != 0):
        report.info(
            "nonzero distortion coefficients present (undistort path "
            f"active; max |D| = {np.abs(d_all).max():.4g})"
        )
    else:
        report.info("all distortion coefficients are zero")
    # ZJU-MoCap stores T in millimetres (the loader divides by 1000,
    # data/dataset.py:146); a camera 3 m away reads as ~3000
    t_norms = [
        np.linalg.norm(np.asarray(x, dtype=np.float64).reshape(-1))
        for x in cams["T"]
    ]
    if max(t_norms) < 50:
        report.warn(
            f"cams.T norms are small (max {max(t_norms):.2f}) — the "
            "loader divides T by 1000 (ZJU millimetre convention); "
            "metres-unit T will place cameras ~1000x too close"
        )


def _frame_id_of(im, human=""):
    base = os.path.basename(im)
    if human in ("CoreView_313", "CoreView_315") or base.count("_") >= 4:
        try:
            return int(base.split("_")[4])
        except (IndexError, ValueError):
            pass
    try:
        return int(os.path.splitext(base)[0])
    except ValueError:
        return None


def _mask_candidates(root, im):
    return [
        os.path.join(root, "mask_cihp", im)[:-4] + ".png",
        os.path.join(root, im.replace("images", "mask"))[:-4] + ".png",
        os.path.join(root, im.replace("images", "mask"))[:-4] + ".jpg",
        os.path.join(root, "mask", im)[:-4] + ".png",
    ]


def validate(root, n_check_frames=5, family="all", human=""):
    report = Report()
    print(f"[validate_dataset] {root}")

    # ------------------------------------------------------- annots
    print("annots.npy")
    ann = _load(report, os.path.join(root, "annots.npy"), "annots")
    if ann is None:
        return report
    try:
        ann = ann.item()
    except Exception:
        report.error("annots.npy is not a pickled dict")
        return report
    for key in ("cams", "ims"):
        if key not in ann:
            report.error(f"annots.npy missing top-level key '{key}'")
            return report
    ims_table = ann["ims"]
    if not len(ims_table):
        report.error("annots['ims'] is empty")
        return report
    n_views = len(ims_table[0]["ims"])
    bad_rows = [
        i for i, row in enumerate(ims_table) if len(row["ims"]) != n_views
    ]
    if bad_rows:
        report.error(
            f"ims rows {bad_rows[:5]} have a different view count than "
            f"row 0 ({n_views})"
        )
    report.info(f"{len(ims_table)} frames x {n_views} views")
    _check_cams(report, ann["cams"], n_views)

    # frame ids resolvable + sample images/masks exist
    sample_rows = np.linspace(
        0, len(ims_table) - 1, min(n_check_frames, len(ims_table)), dtype=int
    )
    frame_ids = []
    for r in sample_rows:
        im = ims_table[r]["ims"][0]
        fid = _frame_id_of(im, human)
        if fid is None:
            report.error(f"cannot parse a frame id from image name '{im}'")
            continue
        # CoreView_313/315 store 1-based ids in the name (loader uses
        # id-1 for params/vertices); plain layouts use the id directly
        frame_ids.append(fid - 1 if human in ("CoreView_313", "CoreView_315")
                         else fid)
        for v in range(n_views):
            imv = ims_table[r]["ims"][v]
            if not os.path.exists(os.path.join(root, imv)):
                report.error(f"image missing: {imv}")
                break
            if not any(os.path.exists(p) for p in _mask_candidates(root, imv)):
                report.error(
                    f"no mask found for {imv} (tried mask_cihp/, mask/, "
                    "images->mask)"
                )
                break
        else:
            continue
        break
    if frame_ids:
        report.info(
            f"sampled {len(sample_rows)} frames: images + masks resolve"
        )

    # ------------------------------------------------------- lbs meta
    print("lbs/")
    lbs = os.path.join(root, "lbs")
    joints = _load(report, os.path.join(lbs, "joints.npy"), "lbs/joints")
    parents = _load(report, os.path.join(lbs, "parents.npy"), "lbs/parents")
    weights = _load(report, os.path.join(lbs, "weights.npy"), "lbs/weights")
    tverts = _load(report, os.path.join(lbs, "tvertices.npy"), "lbs/tvertices")
    n_joints = None
    n_verts = None
    if joints is not None:
        if joints.ndim != 2 or joints.shape[1] != 3:
            report.error(f"lbs/joints.npy shape {joints.shape}, want (J, 3)")
        else:
            n_joints = joints.shape[0]
            report.info(f"joints: {n_joints} (SMPL uses 24)")
    if parents is not None and n_joints is not None:
        if parents.shape != (n_joints,):
            report.error(
                f"lbs/parents.npy shape {parents.shape}, want ({n_joints},)"
            )
        elif int(parents[0]) not in (-1, 0) or np.any(
            np.asarray(parents[1:], dtype=np.int64)
            >= np.arange(1, n_joints)
        ):
            report.error(
                "lbs/parents.npy is not a topologically-ordered kinematic "
                "chain (parent index must precede child)"
            )
    if tverts is not None:
        if tverts.ndim != 2 or tverts.shape[1] != 3:
            report.error(
                f"lbs/tvertices.npy shape {tverts.shape}, want (V, 3)"
            )
        else:
            n_verts = tverts.shape[0]
            report.info(f"vertices: {n_verts} (SMPL uses 6890)")
    if weights is not None and None not in (n_joints, n_verts):
        if weights.shape != (n_verts, n_joints):
            report.error(
                f"lbs/weights.npy shape {weights.shape}, want "
                f"({n_verts}, {n_joints})"
            )
        else:
            rs = np.asarray(weights, dtype=np.float64).sum(1)
            if not np.allclose(rs, 1.0, atol=1e-3):
                report.warn(
                    "lbs/weights.npy rows do not sum to 1 "
                    f"(max |sum-1| = {np.abs(rs - 1).max():.3g})"
                )

    big = os.path.join(lbs, "bigpose_vertices.npy")
    if os.path.exists(big):
        report.info("bigpose_vertices.npy present (use_bigpose configs ok)")
    else:
        report.warn(
            "lbs/bigpose_vertices.npy missing — sdf_pdf/use_bigpose "
            "configs need it (tools/prepare_lbs_meta.py writes it)"
        )
    tj = os.path.join(lbs, "training_joints.npy")
    if os.path.exists(tj):
        report.info("training_joints.npy present (novel-pose latents ok)")
    else:
        report.warn(
            "lbs/training_joints.npy missing — test_novel_pose falls back "
            "to the last training latent"
        )

    # grid family: tbw + per-frame bweights
    if family in ("all", "grid"):
        tbw = _load(report, os.path.join(lbs, "tbw.npy"), "lbs/tbw")
        if tbw is not None:
            if tbw.ndim != 4 or (
                n_joints is not None and tbw.shape[3] != n_joints + 1
            ):
                report.error(
                    f"lbs/tbw.npy shape {tbw.shape}, want (D, H, W, "
                    f"{(n_joints or 24) + 1}) — 24 weights + distance"
                )
            else:
                report.info(f"tbw grid {tbw.shape}")
        for fid in frame_ids:
            bw = _load(
                report, os.path.join(lbs, f"bweights/{fid}.npy"),
                f"lbs/bweights/{fid}",
            )
            if bw is not None and (
                bw.ndim != 4
                or (n_joints is not None and bw.shape[3] != n_joints + 1)
            ):
                report.error(
                    f"lbs/bweights/{fid}.npy shape {bw.shape}, want "
                    f"(D, H, W, {(n_joints or 24) + 1})"
                )
        if frame_ids:
            report.info(f"bweights checked for frames {list(frame_ids)}")

    # ------------------------------------------------- per-frame data
    print("params/ + vertices/")
    params_dir = next(
        (d for d in ("params", "new_params")
         if os.path.isdir(os.path.join(root, d))), "params",
    )
    verts_dir = next(
        (d for d in ("vertices", "new_vertices")
         if os.path.isdir(os.path.join(root, d))), "vertices",
    )
    report.info(f"using {params_dir}/ and {verts_dir}/ "
                "(configs name these via cfg.params / cfg.vertices)")
    for fid in frame_ids:
        p = _load(
            report, os.path.join(root, params_dir, f"{fid}.npy"),
            f"{params_dir}/{fid}",
        )
        if p is not None:
            try:
                p = p.item()
            except Exception:
                report.error(f"{params_dir}/{fid}.npy is not a pickled dict")
                continue
            for key in ("poses", "Rh", "Th"):
                if key not in p:
                    report.error(f"{params_dir}/{fid}.npy missing '{key}'")
                    continue
            poses = np.asarray(p.get("poses", ()), dtype=np.float64).reshape(-1)
            if n_joints is not None and poses.size != n_joints * 3:
                report.error(
                    f"{params_dir}/{fid}.npy poses has {poses.size} "
                    f"elements, want {n_joints * 3}"
                )
            for key in ("Rh", "Th"):
                if key in p and np.asarray(p[key]).reshape(-1).size != 3:
                    report.error(
                        f"{params_dir}/{fid}.npy {key} has "
                        f"{np.asarray(p[key]).reshape(-1).size} elements, want 3"
                    )
        v = _load(
            report, os.path.join(root, verts_dir, f"{fid}.npy"),
            f"{verts_dir}/{fid}",
        )
        if v is not None:
            if v.ndim != 2 or v.shape[1] != 3:
                report.error(
                    f"{verts_dir}/{fid}.npy shape {v.shape}, want (V, 3)"
                )
            elif n_verts is not None and v.shape[0] != n_verts:
                report.error(
                    f"{verts_dir}/{fid}.npy has {v.shape[0]} vertices, "
                    f"lbs/weights.npy has {n_verts}"
                )
    if frame_ids:
        report.info(f"params/vertices checked for frames {list(frame_ids)}")

    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("root", help="dataset directory (contains annots.npy)")
    ap.add_argument("--frames", type=int, default=5,
                    help="how many frames to spot-check")
    ap.add_argument("--family", choices=("all", "grid", "knn"), default="all",
                    help="grid checks bweights/tbw; knn skips them")
    ap.add_argument("--human", default="",
                    help="subject name (CoreView_313/315 use 1-based ids)")
    args = ap.parse_args(argv)
    report = validate(
        args.root, n_check_frames=args.frames, family=args.family,
        human=args.human,
    )
    print(
        f"\n{len(report.errors)} errors, {len(report.warnings)} warnings, "
        f"{len(report.infos)} checks passed"
    )
    return 1 if report.errors else 0


if __name__ == "__main__":
    sys.exit(main())
