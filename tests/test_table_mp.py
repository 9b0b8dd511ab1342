"""Table model parallelism: the ring collective's consuming workload
(VERDICT r4 Next #7) — a train step with the finest pyramid grid row-sharded
must follow the replicated trajectory exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    RenderConfig,
    init_field_params,
    render_rays,
)
from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
from avatarcraft_tpu.parallel.mesh import data_sharding, make_mesh, replicate
from avatarcraft_tpu.parallel.table_mp import (
    make_table_mp_train_step,
    shard_grid_rows,
)

FCFG = FieldConfig(
    encoder="tpu_pyramid",
    pyramid=PyramidSpec(
        grid_resolutions=(4, 8), grid_dim=2, plane_resolutions=(17,), plane_dim=2
    ),
    packed_dtype="float32",
)
# perturb=False: stratified-jitter draws depend on the call's ray-batch
# shape, so a sharded (4-ray/device) call and the replicated 32-ray call
# would follow different random trajectories — equivalence needs the
# deterministic sampler
RCFG = RenderConfig(num_steps=6, upsample_steps=6, upsample_round=6, perturb=False)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.zeros((n, 3), np.float32) + np.asarray([0, 0, -2.0], np.float32)
    gt = rng.random((n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(gt)


def test_table_mp_step_matches_replicated():
    mesh = make_mesh(8)
    params = init_field_params(jax.random.PRNGKey(0), FCFG)
    # sgd: linear in the gradient, so sharded-vs-replicated equivalence is
    # checked without Adam's 1/sqrt(v) amplification of fp32 reduction-order
    # noise on near-zero gradient entries
    tx = optax.sgd(0.5)

    n = 32
    ro, rd, gt = _rays(n)
    key = jax.random.PRNGKey(7)
    w_eik, bg = 0.1, 1.0

    # replicated single-program reference step
    def loss_fn(p):
        out = render_rays(p, ro, rd, key, FCFG, RCFG, bg)
        return jnp.mean((out["rgb"] - gt) ** 2) + w_eik * out["gradient_error"]

    loss_ref, g_ref = jax.value_and_grad(loss_fn)(params)
    opt_ref = tx.init(params)
    up, _ = tx.update(g_ref, opt_ref, params)
    params_ref = optax.apply_updates(params, up)

    # table-MP step: finest grid [512, 2] sharded 64 rows/device
    params_rest, table, splice = shard_grid_rows(params, mesh, leaf=-1)
    step = make_table_mp_train_step(
        mesh, FCFG, RCFG, tx, splice, w_eikonal=w_eik, bg_value=bg,
        use_pallas=False,
    )
    params_rest = replicate(mesh, params_rest)
    opt_rest = replicate(mesh, tx.init(params_rest))
    opt_table = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, table.sharding) if x.ndim else x,
        tx.init(table),
    )
    sh2 = data_sharding(mesh, 2)
    params_rest, table, opt_rest, opt_table, loss_mp = step(
        params_rest, table,
        opt_rest, opt_table,
        jax.device_put(ro, sh2), jax.device_put(rd, sh2), jax.device_put(gt, sh2),
        key,
    )
    assert np.isfinite(float(loss_mp))
    np.testing.assert_allclose(float(loss_mp), float(loss_ref), rtol=1e-5)

    # spliced updated table == replicated updated params
    full = params_rest | {}
    updated = splice(full, table.reshape(-1, table.shape[-1]))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(updated)[0],
        jax.tree_util.tree_flatten_with_path(params_ref)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=f"leaf {jax.tree_util.keystr(pa)} diverged",
        )


def test_shard_grid_rows_roundtrip():
    mesh = make_mesh(8)
    params = init_field_params(jax.random.PRNGKey(1), FCFG)
    params_rest, table, splice = shard_grid_rows(params, mesh, leaf=-1)
    rebuilt = splice(params_rest, table)
    for a, b in zip(
        jax.tree_util.tree_leaves(rebuilt), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
