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
