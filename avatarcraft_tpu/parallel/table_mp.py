"""Table model parallelism: train with an encoder table row-sharded across
the mesh, reassembled inside the loss by the differentiable Pallas ICI ring
(SURVEY §2.5 table-TP; the consuming workload for parallel/ring.py).

The flagship pyramid/triplane tables fit one chip comfortably today, but the
scaling axis matters for larger scenes: rows shard as P(axis, None), every
step all-gathers the shard ring-wise (forward = Pallas ICI ring /
lax.all_gather, backward = psum_scatter — the exact VJP), and each device
keeps only its shard's optimizer state. Combined with the data-parallel ray
axis this is the standard megatron-style 1-D TP layout, expressed with
jax.shard_map + XLA collectives instead of NCCL (reference contrast: the
reference is single-GPU only — hashencoder/hashgrid.cu holds the whole
table per device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_grid_rows(params: dict, mesh: Mesh, leaf: int = -1):
    """Split the pyramid grid leaf ``grids[leaf]`` into a row-sharded
    [T, C] table (device-put P(axis, None)) + the remaining (replicated)
    params with that leaf zeroed out as a placeholder.

    Returns (params_rest, table_sharded, splice) where
    ``splice(params_rest, table)`` rebuilds the full tree from a gathered
    [T, C] table — usable inside jit/shard_map.
    """
    axis = mesh.axis_names[0]
    grid = params["grids"][leaf]
    shape = grid.shape  # [R, R, R, C]
    table = jnp.asarray(grid).reshape(-1, shape[-1])
    n = mesh.devices.size
    if table.shape[0] % n:
        raise ValueError(
            f"table rows {table.shape[0]} not divisible by mesh size {n}"
        )
    table = jax.device_put(table, NamedSharding(mesh, P(axis, None)))
    li = leaf % len(params["grids"])

    def splice(params_rest: dict, full_table: jnp.ndarray) -> dict:
        grids = list(params_rest["grids"])
        grids[li] = full_table.reshape(shape)
        return {**params_rest, "grids": grids}

    params_rest = {
        **params,
        "grids": [
            jnp.zeros_like(g) if i == li else g
            for i, g in enumerate(params["grids"])
        ],
    }
    return params_rest, table, splice


def make_table_mp_train_step(
    mesh: Mesh,
    fcfg,
    rcfg,
    tx: optax.GradientTransformation,
    splice,
    *,
    w_eikonal: float = 0.1,
    bg_value: float = 1.0,
    use_pallas: bool | None = None,
):
    """One photometric train step with the spliced table row-sharded.

    step(params_rest, table_shard, opt_rest, opt_table, rays_o, rays_d, gt,
    key) -> (params_rest, table_shard, opt_rest, opt_table, loss) with
    rays_o/rays_d/gt sharded P(axis) (data parallel) and table P(axis, None)
    (model parallel); params_rest replicated. The table gradient arrives
    already sharded through the all-gather VJP (psum_scatter), so its Adam
    state lives shard-local — memory scales 1/n with the mesh.
    """
    from avatarcraft_tpu.models.instant_nsr import render_rays
    from avatarcraft_tpu.parallel.ring import all_gather_table

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    if use_pallas is None:
        use_pallas = n > 1 and mesh.devices.flatten()[0].platform == "tpu"

    # Only the ring gather is manual (shard_map wrapping the Pallas kernel,
    # psum_scatter backward); the rest of the step is a plain jit over
    # sharded inputs so GSPMD keeps batch-coupled reductions exact — the
    # eikonal term is a data-dependent weighted mean over the WHOLE ray
    # batch (models/instant_nsr.py gradient_error), which per-shard
    # pmean-of-means cannot reproduce.
    def loss_fn(params_rest, table_sharded, ro, rd, gt, key):
        table = all_gather_table(table_sharded, mesh, use_pallas=use_pallas)
        params = splice(params_rest, table)
        out = render_rays(params, ro, rd, key, fcfg, rcfg, bg_value)
        mse = jnp.mean((out["rgb"] - gt) ** 2)
        return mse + w_eikonal * out["gradient_error"]

    @jax.jit
    def step(params_rest, table_shard, opt_rest, opt_table, ro, rd, gt, key):
        loss, (g_rest, g_table) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params_rest, table_shard, ro, rd, gt, key
        )
        up_r, opt_rest = tx.update(g_rest, opt_rest, params_rest)
        params_rest = optax.apply_updates(params_rest, up_r)
        up_t, opt_table = tx.update(g_table, opt_table, table_shard)
        table_shard = optax.apply_updates(table_shard, up_t)
        return params_rest, table_shard, opt_rest, opt_table, loss

    return step
