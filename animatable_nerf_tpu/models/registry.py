"""Name -> model-class registry. Replaces the reference's
`imp.load_source` dynamic-import factories (lib/networks/make_network.py)
with an explicit registry keyed by the same module names so existing
yaml configs resolve unchanged."""

from __future__ import annotations

import jax.numpy as jnp

from .aninerf import AniNeRF
from .pdf import NeRFPDF, SDFPDF, NeuSPDF
from .aligned import AlignedLBW, AlignedPBW, AlignedSMPL, AlignedLBWPDF

MODELS = {
    # canonical names
    "aninerf": AniNeRF,
    "aligned_lbw": AlignedLBW,
    "aligned_pbw": AlignedPBW,
    "aligned_smpl": AlignedSMPL,
    "aligned_lbw_pdf": AlignedLBWPDF,
    "nerf_pdf": NeRFPDF,
    "sdf_pdf": SDFPDF,
    "neus_pdf": NeuSPDF,
    # reference network_module paths (configs/*.yaml compatibility)
    "lib.networks.bw_deform.tpose_nerf_network": AniNeRF,
    "lib.networks.bw_deform.aligned_aninerf_lbw_network": AlignedLBW,
    "lib.networks.bw_deform.aligned_aninerf_pbw_network": AlignedPBW,
    "lib.networks.bw_deform.aligned_aninerf_smpl_network": AlignedSMPL,
    "lib.networks.bw_deform.aligned_aninerf_lbw_pdf_network": AlignedLBWPDF,
    "lib.networks.bw_deform.aligned_aninerf_pdf_network": NeRFPDF,
    "lib.networks.bw_deform.anisdf_pdf_network": SDFPDF,
    "lib.networks.bw_deform.anisdf_neus_pdf_network": NeuSPDF,
}


def _baseline_classes():
    # imported lazily: the baselines pull in conv/UNet modules that the
    # NeRF families never need
    from ..baselines import NHR, NT

    return {"nhr": NHR, "lib.networks.nhr.nhr": NHR,
            "nt": NT, "lib.networks.nt.nt": NT}


def is_image_space(cfg) -> bool:
    """True when the config names an image-space baseline (NHR/NT),
    whose forward is full-image rather than ray-batched."""
    return cfg.network_module in (
        "nhr", "nt", "lib.networks.nhr.nhr", "lib.networks.nt.nt"
    )


_COMPUTE_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def compute_dtype(cfg):
    """Resolve the `compute_dtype` config key to the MLP-trunk dtype
    (every family's `dtype` field: params, geometry, KNN, filtering and
    compositing stay f32 — see models/pdf.py _PDFBase.dtype). bf16 is
    the eval fast-variant bench.py quality-guards (max rgb delta vs the
    f32 render < 0.02 measured; BASELINE.md). Unknown values raise loud
    (the config contract: no silent no-op keys)."""
    name = str(cfg.get("compute_dtype", "float32"))
    if name not in _COMPUTE_DTYPES:
        raise ValueError(
            f"compute_dtype must be one of {sorted(_COMPUTE_DTYPES)}, "
            f"got {name!r}"
        )
    return _COMPUTE_DTYPES[name]


def make_model(cfg):
    """Instantiate a model from a config object (see config/)."""
    if is_image_space(cfg):
        from ..baselines import NHR, NT

        cls = _baseline_classes()[cfg.network_module]
        if cls is NHR:
            return NHR(
                H=int(cfg.H * cfg.ratio), W=int(cfg.W * cfg.ratio),
                feature_dim=18,
            )
        return NT(size=1024, feature_dim=16)
    cls = MODELS[cfg.network_module]
    keep_frac = float(cfg.get("eval_keep_frac", 0.25))
    kwargs = dict(
        num_eval_frames=cfg.num_eval_frame if cfg.aninerf_animation or cfg.test_novel_pose else 0,
        dtype=compute_dtype(cfg),
    )
    if cls is AniNeRF:
        return AniNeRF(
            num_train_frames=cfg.num_train_frame,
            norm_th=cfg.norm_th,
            train_th=cfg.train_th,
            xyz_res=cfg.xyz_res,
            view_res=cfg.view_res,
            eval_keep_frac=keep_frac,
            train_keep_frac=float(cfg.get("train_keep_frac", 0.0)),
            # slab pre-filter (render_rays/render_image satisfy the
            # wpts = ray_o + viewdir * z invariant it requires). Opt-in
            # while its measured overhead (candidate expansion + second
            # compaction) still outweighs the pass-1 savings at
            # whole-frame scale — see BASELINE.md.
            slab_filter=int(cfg.get("slab_filter", 0)),
            slab_supercell=int(cfg.get("slab_supercell", 4)),
            slab_box_capacity=int(cfg.get("slab_box_capacity", 1024)),
            **kwargs,
        )
    if cls in (NeRFPDF, SDFPDF, NeuSPDF):
        return cls(
            num_latents=cfg.num_latent_code,
            tpose_viewdir=cfg.tpose_viewdir,
            xyz_res=cfg.xyz_res,
            eval_keep_frac=keep_frac,
            train_keep_frac=float(cfg.get("train_keep_frac", 0.0)),
            # eval stage-2 trunk compaction ratio (models/pdf.py);
            # 0 disables
            stage2_ratio=float(cfg.get("stage2_ratio", 0.85)),
            dtype=compute_dtype(cfg),
        )
    # aligned family
    return cls(
        num_latents=cfg.num_train_frame,
        norm_th=cfg.norm_th,
        train_th=cfg.train_th,
        tpose_viewdir=cfg.tpose_viewdir,
        xyz_res=cfg.xyz_res,
        eval_keep_frac=keep_frac,
        train_keep_frac=float(cfg.get("train_keep_frac", 0.0)),
        **kwargs,
    )
