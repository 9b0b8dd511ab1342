"""Miniature end-to-end toy-guidance stylize (VERDICT r2 item 1 regression).

The committed full-scale evidence is the 6k-step lava run in docs/ROUND3.md;
this test keeps the whole pipeline honest at CPU scale: train the TINY toy
conditional denoiser for a few hundred DDPM steps, drive the real
StylizeTrainer (fast sampler, phase A/B, augmented prompts) with it for ~28
SDS steps from the same random field for two different style prompts, and
assert the rendered foreground hue separates in the palette direction
(lava = red-dominant vs emerald = green-dominant).

Reference workload being modeled: /root/reference/stylize.py:47-211.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from avatarcraft_tpu.models.diffusion import SDSGuidance
from avatarcraft_tpu.models.instant_nsr import (
    FastRenderConfig,
    FieldConfig,
    init_field_params,
)
from avatarcraft_tpu.models.toy_guidance import (
    STYLES,
    init_toy_params,
    make_toy_modules,
    make_toy_train_scan,
    style_map,
)
from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
from avatarcraft_tpu.workloads.stylize import (
    StylizeConfig,
    StylizeTrainer,
    make_phaseA_render_fast,
)

from tests.test_toy_guidance import TINY, _toy_dataset


@pytest.fixture(scope="module")
def trained_toy_guidance():
    imgs, ids = _toy_dataset(n=48)
    tx = optax.adam(2e-3)
    params = init_toy_params(jax.random.PRNGKey(0), TINY)
    opt_state = tx.init(params)
    scan_steps = make_toy_train_scan(TINY, tx, uncond_dropout=0.1)
    rng = np.random.default_rng(1)
    for k in range(4):
        sel = rng.integers(0, len(imgs), (40, 8))
        params, opt_state, _ = scan_steps(
            params, opt_state, jnp.asarray(imgs[sel]), jnp.asarray(ids[sel]),
            jax.random.PRNGKey(10 + k),
        )
    return params


def test_toy_embeds_ignore_view_augmentation(trained_toy_guidance):
    """The trainer feeds AUGMENTED prompts ("the front view of the body of
    the lava"); the toy text encoder must map them to the plain style."""
    g = SDSGuidance(make_toy_modules(trained_toy_guidance, TINY))
    plain = np.asarray(g.get_text_embeds(["lava"]))
    aug = np.asarray(g.get_text_embeds(["the front view of the body of the lava"]))
    np.testing.assert_array_equal(plain, aug)
    other = np.asarray(g.get_text_embeds([STYLES[1]]))
    assert np.abs(plain - other).max() > 1e-3


def _run_mini_stylize(toy_params, style: str, steps: int):
    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(4, 8), grid_dim=2, plane_resolutions=(17,), plane_dim=2
        ),
        packed_dtype="float32",
    )
    params = init_field_params(jax.random.PRNGKey(3), fcfg)
    params_gt = jax.tree_util.tree_map(lambda x: x.copy(), params)
    cfg = StylizeConfig(
        tgt_text=style, coarse_epochs=10, fine_epochs=0, n_cap=4, H=16, W=16,
        subsample_scale=1, batch_size=64, sampler="fast", grid_update_every=10,
        stylize_head=False, augment_cam=False, augment_bkg=False,
        augment_text=True, lr=1e-2, guidance_scale=10.0,
    )
    fast_cfg = FastRenderConfig(n_probes=16, k_samples=6, bound=1.6)
    guidance = SDSGuidance(make_toy_modules(toy_params, TINY))
    trainer = StylizeTrainer(
        cfg, fcfg, guidance, params, params_gt,
        grid=jnp.full((9, 9, 9), 100.0), fast_cfg=fast_cfg,
    )
    done = trainer.train(max_steps=steps)
    assert done == steps
    flat = jax.tree_util.tree_leaves(trainer.params_style)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)

    # front-view renders on white and black backgrounds: per-ray
    # rgb = fg*alpha + bg*(1-alpha), so alpha = 1 - mean(rgb_w - rgb_b)
    # and the alpha-weighted foreground color is rgb_black / sum(alpha).
    poses, _ = trainer.epoch_poses(0)
    from avatarcraft_tpu.cameras.rays import pose2rays

    ro, rd = pose2rays(16, 16, poses[0])
    render = make_phaseA_render_fast(fcfg, fast_cfg, 64)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    rgb_w, _ = render(
        trainer.params_style, ro, rd, jnp.ones((256, 3)), trainer.grid,
        jax.random.PRNGKey(0),
    )
    rgb_b, _ = render(
        trainer.params_style, ro, rd, jnp.zeros((256, 3)), trainer.grid,
        jax.random.PRNGKey(0),
    )
    rgb_w = np.asarray(rgb_w).reshape(-1, 3)
    rgb_b = np.asarray(rgb_b).reshape(-1, 3)
    alpha = np.clip(1.0 - (rgb_w - rgb_b).mean(axis=1), 0.0, 1.0)
    assert alpha.sum() > 1.0, "field collapsed to empty"
    return rgb_b.sum(axis=0) / alpha.sum()


def test_mini_stylize_separates_palettes(trained_toy_guidance):
    lava = _run_mini_stylize(trained_toy_guidance, "lava", steps=28)
    emerald = _run_mini_stylize(trained_toy_guidance, "emerald", steps=28)
    # lava palette is red-dominant, emerald green-dominant: the (R-G)
    # separation between the two runs must have the right sign.
    sep = (lava[0] - lava[1]) - (emerald[0] - emerald[1])
    assert sep > 0.01, f"style separation {sep:.4f}; lava={lava}, emerald={emerald}"
