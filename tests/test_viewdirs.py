"""use_viewdirs=True path: SH-encoded directions enter the color net
(reference: models/instant_nsr.py:564-567 -- off by default, still a required
capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    RenderConfig,
    forward_color,
    init_field_params,
    render_rays,
)
from avatarcraft_tpu.ops.hash_encoder import HashGridSpec

VD_FIELD = FieldConfig(
    grid=HashGridSpec(num_levels=4, base_resolution=4, log2_hashmap_size=10, desired_resolution=32),
    use_viewdirs=True,
    sh_degree=4,
)


def test_color_in_dim_includes_sh():
    assert VD_FIELD.color_in_dim == 15 + 6 + 16


def test_color_depends_on_direction():
    params = init_field_params(jax.random.PRNGKey(0), VD_FIELD)
    x = jnp.zeros((4, 3))
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    feat = jnp.ones((4, VD_FIELD.geo_feat_dim)) * 0.3
    d1 = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    d2 = jnp.asarray([[1.0, 0.0, 0.0]] * 4)
    c1 = forward_color(params, x, d1, n, feat, VD_FIELD)
    c2 = forward_color(params, x, d2, n, feat, VD_FIELD)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))

    # the default (no viewdirs) config must NOT depend on direction
    base = FieldConfig(grid=VD_FIELD.grid, use_viewdirs=False)
    params_b = init_field_params(jax.random.PRNGKey(0), base)
    b1 = forward_color(params_b, x, d1, n, feat, base)
    b2 = forward_color(params_b, x, d2, n, feat, base)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_render_with_viewdirs_end_to_end():
    params = init_field_params(jax.random.PRNGKey(1), VD_FIELD)
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    rcfg = RenderConfig(num_steps=8, upsample_steps=8, upsample_round=8)
    out = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(2), VD_FIELD, rcfg, 1.0)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    g = jax.grad(
        lambda p: render_rays(p, rays_o, rays_d, jax.random.PRNGKey(2), VD_FIELD, rcfg, 0.5)["rgb"].sum()
    )(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree_util.tree_leaves(g))
