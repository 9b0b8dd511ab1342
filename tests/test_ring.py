"""Table all-gather over the virtual 8-device mesh (XLA fallback path) and
the Pallas ring kernel in interpreter mode where supported."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatarcraft_tpu.parallel.mesh import make_mesh
from avatarcraft_tpu.parallel.ring import all_gather_table


def test_all_gather_table_roundtrip():
    mesh = make_mesh(8)
    table = jnp.arange(8 * 16 * 4, dtype=jnp.float32).reshape(8 * 16, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = jax.device_put(table, NamedSharding(mesh, P("data", None)))
    gathered = all_gather_table(sharded, mesh)
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(table))


def test_sharded_table_encode_matches_replicated():
    """Pyramid plane rows sharded over the mesh, re-gathered, encode equal."""
    from avatarcraft_tpu.ops.grid_encoder import (
        PyramidSpec,
        init_pyramid_params,
        pyramid_encode_unpacked,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = PyramidSpec(grid_resolutions=(5,), grid_dim=2, plane_resolutions=(17,), plane_dim=2)
    params = init_pyramid_params(jax.random.PRNGKey(0), spec)
    mesh = make_mesh(8)

    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    want = pyramid_encode_unpacked(params, x, spec, size=1.0)

    # shard the plane level's rows (3*17*17 is not divisible by 8 -> pad)
    p = params["planes"][0].reshape(-1, 2)
    pad = (-p.shape[0]) % 8
    p_pad = jnp.concatenate([p, jnp.zeros((pad, 2))])
    sharded = jax.device_put(p_pad, NamedSharding(mesh, P("data", None)))
    regathered = all_gather_table(sharded, mesh)[: p.shape[0]]
    params2 = dict(params)
    params2["planes"] = [regathered.reshape(3, 17, 17, 2)]
    got = pyramid_encode_unpacked(params2, x, spec, size=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
