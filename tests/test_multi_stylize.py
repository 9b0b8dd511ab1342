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
