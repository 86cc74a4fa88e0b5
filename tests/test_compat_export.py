"""Round-trip checkpoint conversion (VERDICT-r3 item 1, reverse half):
reference state dict -> torch_import -> torch_export -> bit-identical
state dict that strict-loads back into the reference's own module, for
every volumetric family. The forward half (import parity) is pinned by
tests/test_golden_reference.py; together they certify the converters are
exact inverses, which is what the trained-checkpoint cross-evaluation
protocol (tools/parity_runs/cross_parity.py) relies on.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import ref_oracle
from test_golden_reference import _ref_net
from animatable_nerf_tpu.compat import torch_import, torch_export

FAMILIES = [
    # family key, reference module, importer, install overrides
    ("aninerf", "tpose_nerf_network", torch_import.convert_aninerf,
     dict(aninerf_animation=True)),
    ("nerf_pdf", "aligned_aninerf_pdf_network",
     torch_import.convert_nerf_pdf, {}),
    ("aligned_lbw", "aligned_aninerf_lbw_network",
     torch_import.convert_aligned_lbw, {}),
    ("aligned_pbw", "aligned_aninerf_pbw_network",
     torch_import.convert_aligned_pbw, {}),
    ("aligned_smpl", "aligned_aninerf_smpl_network",
     torch_import.convert_aligned_smpl, {}),
    ("aligned_lbw_pdf", "aligned_aninerf_lbw_pdf_network",
     torch_import.convert_aligned_lbw_pdf, {}),
    ("sdf_pdf", "anisdf_pdf_network", torch_import.convert_sdf_pdf,
     dict(init_sdf="")),
    ("neus_pdf", "anisdf_neus_pdf_network", torch_import.convert_neus_pdf,
     dict(init_sdf="")),
]


@pytest.mark.parametrize(
    "family,module,importer,over", FAMILIES, ids=[f[0] for f in FAMILIES]
)
def test_roundtrip_bit_exact_and_strict_loads(family, module, importer, over):
    net, state = _ref_net(module, seed=51, **over)
    params = importer(state)
    exported = torch_export.export_state_dict(
        family, params, template=net.state_dict()
    )
    # every key present, every produced tensor bit-equal (transposes and
    # weight-norm splits are lossless permutations)
    assert set(exported) == set(state)
    produced = set(torch_export.EXPORTERS[family](params))
    for k in state:
        if k in produced:
            np.testing.assert_array_equal(
                exported[k], state[k], err_msg=f"{family}:{k}"
            )
        else:
            # dead (forward-inert) parameter passed through the template
            np.testing.assert_array_equal(exported[k], state[k])
    # and the reference's own module strict-loads it
    net.load_state_dict(
        {k: torch.as_tensor(np.ascontiguousarray(v))
         for k, v in exported.items()},
        strict=True,
    )


def test_missing_template_key_raises():
    net, state = _ref_net("tpose_nerf_network", seed=52,
                          aninerf_animation=True)
    params = torch_import.convert_aninerf(state)
    bad_template = {
        k: v for k, v in net.state_dict().items()
        if not k.startswith("bw_latent")
    }
    with pytest.raises(KeyError):
        torch_export.export_state_dict("aninerf", params, bad_template)


def test_save_reference_checkpoint_loads_via_reference(tmp_path):
    """The written .pth round-trips through the reference's OWN
    load_network (net_utils.py:357-396) with strict=True."""
    net, state = _ref_net("anisdf_pdf_network", seed=53, init_sdf="")
    params = torch_import.convert_sdf_pdf(state)
    path = str(tmp_path / "latest.pth")
    torch_export.save_reference_checkpoint(
        path, "sdf_pdf", params, epoch=7, template=net.state_dict()
    )
    net_utils = ref_oracle.load("lib.utils.net_utils")
    fresh, _ = _ref_net("anisdf_pdf_network", seed=54, init_sdf="")
    epoch = net_utils.load_network(fresh, str(tmp_path), resume=True)
    assert epoch == 8  # reference returns saved epoch + 1
    for k, v in fresh.state_dict().items():
        np.testing.assert_array_equal(v.numpy(), state[k])


@pytest.mark.parametrize(
    "family,module,importer,over", FAMILIES, ids=[f[0] for f in FAMILIES]
)
def test_templateless_export_strict_loads(family, module, importer, over):
    """Template-LESS export (the TPU-trained-checkpoint path,
    tools/parity_protocol.py cmd_export) must still produce every key
    the reference module strict-loads — forward-dead params
    (resd_latent, anisdf_pdf_network.py:19) are synthesized as zeros.
    Caught live: the first sdf_pdf direction-B parity run failed the
    reference's load_state_dict on the missing resd_latent."""
    net, state = _ref_net(module, seed=61, **over)
    params = importer(state)
    exported = torch_export.export_state_dict(family, params)
    missing = set(state) - set(exported)
    assert not missing, f"{family}: missing {sorted(missing)}"
    net.load_state_dict(
        {k: torch.as_tensor(
            np.ascontiguousarray(v).reshape(tuple(state[k].shape)))
         for k, v in exported.items()},
        strict=True,
    )
