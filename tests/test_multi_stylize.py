"""Multi-prompt batched (vmapped) avatar creation."""

import dataclasses

import jax
import numpy as np

from avatarcraft_tpu.models.diffusion import SDSGuidance, make_dummy_modules
from avatarcraft_tpu.models.instant_nsr import init_field_params
from avatarcraft_tpu.workloads.multi_stylize import (
    MultiPromptTrainer,
    stack_params,
    unstack_params,
)
from avatarcraft_tpu.workloads.stylize import StylizeConfig
from tests.test_render_core import SMALL_FIELD


def test_stack_unstack_roundtrip():
    ps = [init_field_params(jax.random.PRNGKey(i), SMALL_FIELD) for i in range(3)]
    stacked = stack_params(ps)
    assert stacked["variance"].shape == (3,)
    back = unstack_params(stacked, 3)
    for a, b in zip(jax.tree_util.tree_leaves(ps[1]), jax.tree_util.tree_leaves(back[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_prompt_step_diverges_fields():
    """Two prompts, shared init: one step must move BOTH fields, differently."""
    cfg = StylizeConfig(
        H=16, W=16, subsample_scale=1, batch_size=64, n_cap=4,
        coarse_epochs=1, fine_epochs=0, stylize_head=False, use_opacity=False,
    )
    base = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    stacked = stack_params([base, base])
    trainer = MultiPromptTrainer(
        cfg, SMALL_FIELD, SDSGuidance(make_dummy_modules(image_size=64)),
        ["a zombie", "a clown"], stacked,
        jax.tree_util.tree_map(lambda x: x.copy(), base),
    )
    trainer.rcfg = dataclasses.replace(
        trainer.rcfg, num_steps=8, upsample_steps=8, upsample_round=8
    )
    steps = trainer.train(max_steps=1)
    assert steps == 1
    out = unstack_params(trainer.params_style, 2)
    l0 = jax.tree_util.tree_leaves(out[0])
    l1 = jax.tree_util.tree_leaves(out[1])
    lb = jax.tree_util.tree_leaves(base)
    moved0 = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l0, lb))
    moved1 = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l1, lb))
    differ = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l0, l1))
    assert moved0 and moved1 and differ


def test_multi_prompt_fast_sampler():
    """Multi-prompt SDS through the occupancy fast path: per-prompt grids,
    vmapped phases, fields diverge per prompt."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.models.diffusion import SDSGuidance, make_dummy_modules
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        init_field_params,
    )
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
    from avatarcraft_tpu.workloads.multi_stylize import (
        MultiPromptTrainer,
        stack_params,
        unstack_params,
    )
    from avatarcraft_tpu.workloads.stylize import StylizeConfig

    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(4, 8), grid_dim=2, plane_resolutions=(17,), plane_dim=2
        ),
        packed_dtype="float32",
    )
    gt = init_field_params(jax.random.PRNGKey(0), fcfg)
    prompts = ["hulk", "zombie"]
    stacked = stack_params([gt, gt])

    cfg = StylizeConfig(
        coarse_epochs=1, fine_epochs=0, n_cap=6, H=16, W=16,
        subsample_scale=1, batch_size=64, sampler="fast", grid_update_every=1,
    )
    trainer = MultiPromptTrainer(
        cfg, fcfg, SDSGuidance(make_dummy_modules(image_size=16)),
        prompts, stacked, gt,
        fast_cfg=FastRenderConfig(n_probes=16, k_samples=6, bound=1.6),
    )
    # tiny grids for the test (129^3 x P is heavy on CPU)
    trainer.grids = jnp.full((2, 129, 129, 129), 100.0)
    steps = trainer.train(max_steps=2)
    assert steps == 2
    p0, p1 = unstack_params(trainer.params_style, 2)
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))
    )
    assert diff > 0, "different prompts must diverge the fields"
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree_util.tree_leaves(trainer.params_style)
    )


def test_multi_prompt_phaseB_matches_single_prompt_trainer():
    """Cross-trainer parity (VERDICT r4 Weak #4): the multi-prompt phase-B
    gradient must carry the SAME loss semantics as the single-prompt
    make_phaseB_step — cfg.w_opacity (not a hardcoded 1e5) and the
    reg_scale = chunk/4096 patch-balance correction. Recover the
    single-prompt gradient through an sgd(1.0) step and compare."""
    import jax.numpy as jnp
    import optax

    from avatarcraft_tpu.models.instant_nsr import RenderConfig
    from avatarcraft_tpu.workloads.multi_stylize import _phaseB_grads
    from avatarcraft_tpu.workloads.stylize import make_phaseB_step

    cfg = StylizeConfig(
        batch_size=64, w_eikonal=0.3, w_opacity=7.0, use_opacity=True,
    )
    rcfg = RenderConfig(num_steps=8, upsample_steps=8, upsample_round=8,
                        bound=1.6, perturb=True)
    params = init_field_params(jax.random.PRNGKey(1), SMALL_FIELD)
    params_gt = init_field_params(jax.random.PRNGKey(2), SMALL_FIELD)
    n = 128  # 2 patches of chunk 64 (chunk != 4096 exercises reg_scale)
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 4)
    rays_o = jnp.full((n, 3), 0.0).at[:, 2].set(-2.0) + 0.01 * jax.random.normal(ks[0], (n, 3))
    rays_d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1)) + 0.05 * jax.random.normal(ks[1], (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    g_rgb = jax.random.normal(ks[2], (n, 3))
    bg = jnp.ones((n, 3))
    key = ks[3]

    grads_multi = _phaseB_grads(
        params, params_gt, rays_o, rays_d, g_rgb, bg, key,
        SMALL_FIELD, rcfg, cfg,
    )
    step = make_phaseB_step(
        SMALL_FIELD, rcfg, optax.sgd(1.0), cfg.w_eikonal, cfg.use_opacity,
        cfg.batch_size, cfg.w_opacity,
    )
    opt_state = optax.sgd(1.0).init(params)
    new_params, _ = step(
        params, params_gt, opt_state, rays_o, rays_d, g_rgb, bg, key
    )
    grads_single = jax.tree_util.tree_map(lambda a, b: a - b, params, new_params)
    for gm, gs in zip(
        jax.tree_util.tree_leaves(grads_multi), jax.tree_util.tree_leaves(grads_single)
    ):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gs), rtol=2e-4, atol=2e-6)


def test_multi_prompt_budget_and_clip_guard():
    """derive_budget sizes compaction from the schedule's own poses vs the
    per-prompt grids; the refresh clip guard disables compaction (rather
    than silently clipping) when the live grids outgrow the budget."""
    import dataclasses

    import jax.numpy as jnp

    from avatarcraft_tpu.models.diffusion import SDSGuidance, make_dummy_modules
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, init_field_params
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
    from avatarcraft_tpu.models.instant_nsr import FieldConfig

    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(4, 8), grid_dim=2, plane_resolutions=(17,), plane_dim=2
        ),
        packed_dtype="float32",
    )
    gt = init_field_params(jax.random.PRNGKey(0), fcfg)
    cfg = StylizeConfig(
        coarse_epochs=1, fine_epochs=0, n_cap=4, H=16, W=16,
        subsample_scale=1, batch_size=64, sampler="fast", grid_update_every=1,
    )
    trainer = MultiPromptTrainer(
        cfg, fcfg, SDSGuidance(make_dummy_modules(image_size=16)),
        ["hulk", "zombie"], stack_params([gt, gt]), gt,
        fast_cfg=FastRenderConfig(n_probes=16, k_samples=6, bound=1.6),
    )
    trainer.grids = jnp.full((2, 129, 129, 129), 100.0)  # saturated
    budget = trainer.derive_budget(n_poses=3)
    # saturated grids select every slot: budget = chunk * k * safety
    assert budget == int(64 * 6 * 1.1)
    assert trainer.fast_cfg.sample_budget == budget

    # honest budget -> a step must run without the guard tripping
    steps = trainer.train(max_steps=1)
    assert steps == 1
    assert trainer.fast_cfg.sample_budget == budget, "guard must not trip"

    # starve the budget -> the next refresh must disable compaction loudly
    trainer.fast_cfg = dataclasses.replace(trainer.fast_cfg, sample_budget=3)
    if hasattr(trainer, "_count_jit"):
        del trainer._count_jit
    trainer.train(max_steps=1)
    assert trainer.fast_cfg.sample_budget == 0, "clip guard must disable compaction"
