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


def test_pallas_ring_kernel_interpret_mode():
    """Run the ACTUAL Pallas ring kernel (remote DMAs, semaphores, comm
    buffers) under the TPU interpreter on the 8-device CPU mesh — not the
    lax.all_gather fallback — with race detection on."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P

    from avatarcraft_tpu.parallel.ring import ring_all_gather

    mesh = make_mesh(8)
    S, F = 8, 128
    table = (
        jnp.arange(8 * S * F, dtype=jnp.float32).reshape(8 * S, F) / 100.0
    )

    params = pltpu.InterpretParams(detect_races=True)

    def gather(shard):
        return ring_all_gather(shard, "data", interpret=params)

    got = jax.shard_map(
        gather, mesh=mesh, in_specs=P("data", None), out_specs=P(), check_vma=False
    )(table)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table))


def test_pallas_ring_kernel_two_devices():
    """Smallest nontrivial ring (one RDMA hop each way)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P

    from avatarcraft_tpu.parallel.ring import ring_all_gather

    mesh = make_mesh(2)
    S, F = 16, 128
    table = jax.random.normal(jax.random.PRNGKey(0), (2 * S, F))

    def gather(shard):
        return ring_all_gather(shard, "data", interpret=pltpu.InterpretParams())

    got = jax.shard_map(
        gather, mesh=mesh, in_specs=P("data", None), out_specs=P(), check_vma=False
    )(table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table), atol=1e-6)


def test_ring_all_gather_grad_matches_dense():
    """ring_all_gather_grad: the reduce-scatter VJP reproduces the dense
    gradient of an embedding-lookup loss over a row-sharded table (XLA
    collective path on the CPU mesh; the Pallas forward is pinned by the
    interpret-mode tests above and tools/ring_mosaic_check.py on TPU)."""
    from jax.sharding import PartitionSpec as P

    from avatarcraft_tpu.parallel.ring import all_gather_table

    mesh = make_mesh(8)
    T, F = 64, 8
    table = jax.random.normal(jax.random.PRNGKey(0), (T, F))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, T, 32))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (32, F))

    def loss_sharded(tbl):
        full = all_gather_table(tbl, mesh, use_pallas=False)
        return jnp.mean((full[idx] - tgt) ** 2)

    def loss_plain(tbl):
        return jnp.mean((tbl[idx] - tgt) ** 2)

    g1 = jax.grad(loss_sharded)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
