"""Shape/behavior tests for the flax field modules."""

import jax
import jax.numpy as jnp
import numpy as np

from animatable_nerf_tpu import fields


def test_blend_weight_field_softmax_and_prior():
    m = fields.BlendWeightField(num_latents=5)
    pts = jnp.zeros((16, 3))
    smpl_bw = jax.nn.softmax(jnp.ones((16, 24)), -1)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), pts, smpl_bw, jnp.asarray(1)))()
    out = jax.jit(lambda: m.apply(params, pts, smpl_bw, jnp.asarray(1)))()
    assert out.shape == (16, 24)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # a one-hot prior dominates the uninitialized logits direction-wise:
    # log(1e-9) ~ -20.7 suppresses the other bones
    hot = jnp.zeros((16, 24)).at[:, 3].set(1.0)
    out = jax.jit(lambda: m.apply(params, pts, hot, jnp.asarray(1)))()
    assert float(out[:, 3].min()) > 0.99


def test_residual_field_initially_small():
    m = fields.ResidualField()
    pts = jnp.linspace(-1, 1, 30).reshape(10, 3)
    pose = jnp.zeros((72,))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), pts, pose))()
    out = jax.jit(lambda: m.apply(params, pts, pose))()
    assert out.shape == (10, 3)
    assert float(jnp.abs(out).max()) <= 0.05  # 0.05 * tanh bound


def test_tpose_nerf_shapes():
    m = fields.TPoseNeRF(num_latents=4)
    pts = jnp.ones((8, 3))
    vd = jnp.ones((8, 3))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), pts, vd, jnp.asarray(0)))()
    sigma, rgb = jax.jit(lambda: m.apply(params, pts, vd, jnp.asarray(0)))()
    assert sigma.shape == (8,)
    assert rgb.shape == (8, 3)


def test_geometric_field_sdf_sphere_like_init():
    """Geometric init should yield an approximately radial SDF
    (IDR init: sdf(x) ~ |x| - bias)."""
    m = fields.GeometricFieldNetwork()
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((4, 3))))()
    pts_near = jnp.array([[0.05, 0.0, 0.0]])
    pts_far = jnp.array([[1.2, 0.0, 0.0]])
    sdf_near = float(m.apply(params, pts_near)[0, 0])
    sdf_far = float(m.apply(params, pts_far)[0, 0])
    assert sdf_near < sdf_far  # increases with radius
    assert sdf_near < 0 < sdf_far  # crosses zero around |x| ~ bias=0.5
    out = jax.jit(lambda: m.apply(params, jnp.zeros((4, 3))))()
    assert out.shape == (4, 257)


def test_color_network_sigmoid_range():
    m = fields.ColorNetwork(num_latents=3, use_normals=True)
    n = 12
    args = (jnp.ones((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)),
            jnp.ones((n, 256)), jnp.asarray(0))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), *args))()
    rgb = jax.jit(lambda: m.apply(params, *args))()
    assert rgb.shape == (n, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0


def test_color_network_no_normals_matches_aligned_dims():
    m = fields.ColorNetwork(num_latents=3, use_normals=False)
    n = 4
    args = (jnp.ones((n, 3)), None, jnp.ones((n, 3)),
            jnp.ones((n, 256)), jnp.asarray(0))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), *args))()
    # input dim = 3 + 27 + 256 = 286 (aligned_aninerf_pdf_network.py:301-330)
    assert params["params"]["lin0"]["wn"]["v"].shape[0] == 286


def test_beta_and_variance_networks():
    b = fields.BetaNetwork()
    p = b.init(jax.random.PRNGKey(0))
    assert abs(float(b.apply(p)) - 0.1) < 1e-6
    v = fields.SingleVarianceNetwork()
    pv = v.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(v.apply(pv)), np.exp(2.0), rtol=1e-5)


def test_weight_norm_g_initialized_to_norm():
    m = fields.WNDense(7)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), jnp.ones((2, 5))))()
    wn = params["params"]["wn"]
    np.testing.assert_allclose(
        np.asarray(wn["g"]), np.linalg.norm(np.asarray(wn["v"]), axis=0), rtol=1e-6
    )
