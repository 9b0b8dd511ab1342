"""TPU-native pyramid/triplane encoder: exactness of packing, interpolation
properties, gradients, and field integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatarcraft_tpu.ops.grid_encoder import (
    PyramidSpec,
    init_pyramid_params,
    materialize_packed,
    pack_grid,
    pack_plane,
    pyramid_encode,
    pyramid_encode_unpacked,
)

SMALL = PyramidSpec(grid_resolutions=(5, 9), grid_dim=2, plane_resolutions=(17,), plane_dim=3)


def test_output_dim_and_gather_count():
    assert SMALL.output_dim == 2 * 2 + 1 * 3
    assert SMALL.gathers_per_point == 2 + 3
    default = PyramidSpec()
    assert default.gathers_per_point == 12  # vs 128 for the 16-level hash


def test_pack_grid_layout(rng):
    R, C = 4, 2
    grid = jnp.asarray(rng.normal(size=(R, R, R, C)).astype(np.float32))
    packed = pack_grid(grid)
    assert packed.shape == ((R - 1) ** 3, 8 * C)
    # cell (1,2,0) -> C-order row (1*3 + 2)*3 + 0 = 15; corner bit0=x,bit1=y,bit2=z
    row = np.asarray(packed[(1 * 3 + 2) * 3 + 0]).reshape(8, C)
    np.testing.assert_array_equal(row[0], np.asarray(grid[1, 2, 0]))
    np.testing.assert_array_equal(row[1], np.asarray(grid[2, 2, 0]))  # +x
    np.testing.assert_array_equal(row[2], np.asarray(grid[1, 3, 0]))  # +y
    np.testing.assert_array_equal(row[4], np.asarray(grid[1, 2, 1]))  # +z
    np.testing.assert_array_equal(row[7], np.asarray(grid[2, 3, 1]))


def test_grid_lookup_exact_at_vertices(rng):
    """Sampling exactly at grid vertices returns the stored features."""
    params = init_pyramid_params(jax.random.PRNGKey(0), SMALL)
    # zero the planes so only the grids contribute
    params["planes"] = [jnp.zeros_like(p) for p in params["planes"]]
    R = 5
    g = jnp.asarray(rng.normal(size=(R, R, R, 2)).astype(np.float32))
    params["grids"][0] = g
    params["grids"][1] = jnp.zeros_like(params["grids"][1])

    iv = np.array([1, 3, 2])
    x01 = iv / (R - 1)
    x = jnp.asarray((x01 * 2.0 - 1.0)[None], jnp.float32)  # size=1 mapping
    out = pyramid_encode_unpacked(params, x, SMALL, size=1.0)
    np.testing.assert_allclose(np.asarray(out)[0, :2], np.asarray(g[tuple(iv)]), atol=1e-5)


def test_trilinear_against_manual(rng):
    R = 5
    spec = PyramidSpec(grid_resolutions=(R,), grid_dim=1, plane_resolutions=(), plane_dim=1)
    g = jnp.asarray(rng.normal(size=(R, R, R, 1)).astype(np.float32))
    params = {"grids": [g], "planes": []}
    pts01 = rng.uniform(0.02, 0.98, size=(32, 3)).astype(np.float32)
    x = jnp.asarray(pts01 * 2 - 1)
    out = np.asarray(pyramid_encode_unpacked(params, x, spec, size=1.0))[:, 0]

    # manual trilinear
    gn = np.asarray(g)[..., 0]
    pos = pts01 * (R - 1)
    b = np.floor(pos).astype(int)
    f = pos - b
    want = np.zeros(32)
    for c in range(8):
        bx, by, bz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        w = (
            (f[:, 0] if bx else 1 - f[:, 0])
            * (f[:, 1] if by else 1 - f[:, 1])
            * (f[:, 2] if bz else 1 - f[:, 2])
        )
        want += w * gn[b[:, 0] + bx, b[:, 1] + by, b[:, 2] + bz]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_plane_lookup_bilinear(rng):
    R = 17
    spec = PyramidSpec(grid_resolutions=(), grid_dim=1, plane_resolutions=(R,), plane_dim=2)
    p = jnp.asarray(rng.normal(size=(3, R, R, 2)).astype(np.float32))
    params = {"grids": [], "planes": [p]}
    # at a vertex, output = sum over 3 planes at their projected vertex coords
    iv = np.array([4, 8, 12])
    x01 = iv / (R - 1)
    x = jnp.asarray((x01 * 2 - 1)[None], jnp.float32)
    out = np.asarray(pyramid_encode_unpacked(params, x, spec, size=1.0))[0]
    pn = np.asarray(p)
    want = pn[0, iv[0], iv[1]] + pn[1, iv[0], iv[2]] + pn[2, iv[1], iv[2]]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_continuity_across_cell_boundary():
    params = init_pyramid_params(jax.random.PRNGKey(1), SMALL)
    packed = materialize_packed(params, SMALL)
    # approach a vertex plane x01=0.5 (grid res 5 -> cell boundary at 2/4)
    eps = 1e-4
    xa = jnp.asarray([[0.5 - eps, 0.3, 0.3]]) * 2 - 1
    xb = jnp.asarray([[0.5 + eps, 0.3, 0.3]]) * 2 - 1
    fa = pyramid_encode(packed, xa, SMALL, size=1.0)
    fb = pyramid_encode(packed, xb, SMALL, size=1.0)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


def test_gradients_flow_to_shared_tables():
    params = init_pyramid_params(jax.random.PRNGKey(2), SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-0.9, maxval=0.9)

    def loss(p):
        return pyramid_encode_unpacked(p, x, SMALL, size=1.0).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["grids"][0]).sum()) > 0
    assert float(jnp.abs(g["planes"][0]).sum()) > 0
    # interpolation weights per level sum to 1 per point: total grid-grad mass
    # = n_points * grid_dim per level
    np.testing.assert_allclose(
        float(g["grids"][0].sum()), 64 * SMALL.grid_dim, rtol=1e-4
    )


def test_field_integration_pyramid_encoder():
    from avatarcraft_tpu.models.instant_nsr import (
        FieldConfig,
        RenderConfig,
        init_field_params,
        render_rays,
    )

    fcfg = FieldConfig(encoder="tpu_pyramid", pyramid=SMALL, packed_dtype="float32")
    params = init_field_params(jax.random.PRNGKey(0), fcfg)
    assert "table" not in params and "grids" in params

    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    rcfg = RenderConfig(num_steps=8, upsample_steps=8, upsample_round=8)
    out = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), fcfg, rcfg, 1.0)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    def loss(p):
        o = render_rays(p, rays_o, rays_d, jax.random.PRNGKey(1), fcfg, rcfg, 0.5)
        return o["rgb"].sum() + o["gradient_error"]

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert float(jnp.abs(g["sdf"][0]["v"]).sum()) > 0
