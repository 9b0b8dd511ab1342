"""SDS guidance math + two-phase stylize step."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.diffusion import (
    DiffusionSchedule,
    SDSGuidance,
    make_dummy_modules,
)


def test_schedule_matches_sd_constants():
    s = DiffusionSchedule()
    a = s.alphas_cumprod
    assert a.shape == (1000,)
    # known SD v1 endpoints of scaled-linear alphas_cumprod
    np.testing.assert_allclose(a[0], 1 - 0.00085, rtol=1e-5)
    assert 0.0045 < a[-1] < 0.005  # ~0.00466
    assert (np.diff(a) < 0).all()
    assert s.min_step == 20 and s.max_step == 980


def test_text_embeds_cfg_pair():
    g = SDSGuidance(make_dummy_modules())
    emb = g.get_text_embeds(["a zombie"])
    assert emb.shape[0] == 2  # [uncond; cond]
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))
    # deterministic cache-ability
    emb2 = g.get_text_embeds(["a zombie"])
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(emb2))


def test_sds_grad_shape_and_clamp_pullback():
    g = SDSGuidance(make_dummy_modules(image_size=64))
    emb = g.get_text_embeds(["x"])
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32)), 0, 1)
    grad = g.sds_image_grad(jax.random.PRNGKey(1), emb, img, guidance_scale=100.0)
    assert grad.shape == img.shape
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_sds_grad_is_vjp_of_encoder():
    """With guidance pinned so eps_hat-noise is constant, the image grad must
    equal the analytic VJP of (resize o vae_encode)."""
    mods = make_dummy_modules(image_size=64)
    g = SDSGuidance(mods)
    emb = g.get_text_embeds(["x"])
    img = jnp.ones((1, 3, 32, 32)) * 0.5

    key = jax.random.PRNGKey(7)
    grad = g.sds_image_grad(key, emb, img, guidance_scale=0.0)

    # replicate internals
    def encode(im):
        im512 = jax.image.resize(im, (1, 3, 64, 64), method="bilinear")
        return mods.vae_encode(im512)

    latents, vjp_fn = jax.vjp(encode, img)
    k_t, k_noise = jax.random.split(key)
    t = jax.random.randint(k_t, (), g.schedule.min_step, g.schedule.max_step + 1)
    noise = jax.random.normal(k_noise, latents.shape)
    a_t = g.alphas[t]
    lat_noisy = jnp.sqrt(a_t) * latents + jnp.sqrt(1 - a_t) * noise
    eps = mods.unet(
        jnp.concatenate([lat_noisy] * 2), jnp.full((2,), t, jnp.int32), emb
    )
    eps_hat = jnp.split(eps, 2)[0]  # scale 0 -> uncond only
    want = vjp_fn(jnp.clip((1 - a_t) * (eps_hat - noise), -1, 1))[0]
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want), atol=1e-6)


def test_produce_latents_runs():
    g = SDSGuidance(make_dummy_modules(image_size=64))
    emb = g.get_text_embeds(["y"])
    lat = g.produce_latents(
        jax.random.PRNGKey(0), emb, height=64, width=64, num_inference_steps=5
    )
    assert lat.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()


def test_stylize_two_phase_step_updates_params():
    from avatarcraft_tpu.models.instant_nsr import init_field_params
    from avatarcraft_tpu.workloads.stylize import StylizeConfig, StylizeTrainer
    from tests.test_render_core import SMALL_FIELD

    cfg = StylizeConfig(
        H=16, W=16, subsample_scale=1, batch_size=64, n_cap=4,
        coarse_epochs=1, fine_epochs=0, stylize_head=False,
    )
    p_style = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    p_gt = jax.tree_util.tree_map(lambda x: x.copy(), p_style)
    trainer = StylizeTrainer(
        cfg, SMALL_FIELD, SDSGuidance(make_dummy_modules(image_size=64)),
        p_style, p_gt,
    )
    # shrink the render for test speed
    import dataclasses as dc

    trainer.rcfg = dc.replace(trainer.rcfg, num_steps=8, upsample_steps=8, upsample_round=8)
    before = jax.tree_util.tree_leaves(trainer.params_style)[1].copy()
    steps = trainer.train(max_steps=2)
    assert steps == 2
    after = jax.tree_util.tree_leaves(trainer.params_style)[1]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # frozen gt field untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(p_gt), jax.tree_util.tree_leaves(trainer.params_gt)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stylize_fast_sampler_smoke():
    """Fast-sampler SDS: phase A + phase B + grid refresh run end-to-end with
    the dummy guidance at tiny scale and update the style field."""
    import dataclasses

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
    from avatarcraft_tpu.workloads.stylize import StylizeConfig, StylizeTrainer

    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(4, 8), grid_dim=2, plane_resolutions=(17,), plane_dim=2
        ),
        packed_dtype="float32",
    )
    params = init_field_params(jax.random.PRNGKey(0), fcfg)
    params_gt = jax.tree_util.tree_map(lambda x: x.copy(), params)

    cfg = StylizeConfig(
        tgt_text="tiny", coarse_epochs=1, fine_epochs=0, n_cap=6, H=16, W=16,
        subsample_scale=1, batch_size=64, sampler="fast", grid_update_every=1,
    )
    fast_cfg = FastRenderConfig(n_probes=16, k_samples=6, bound=1.6)
    guidance = SDSGuidance(make_dummy_modules(image_size=16))
    trainer = StylizeTrainer(
        cfg, fcfg, guidance, params, params_gt,
        grid=jnp.full((9, 9, 9), 100.0), fast_cfg=fast_cfg,
    )
    before = jax.device_get(trainer.params_style)
    steps = trainer.train(max_steps=2)
    assert steps == 2
    after = jax.device_get(trainer.params_style)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        )
    )
    assert moved, "fast-sampler SDS step did not update the style field"
    flat = jax.tree_util.tree_leaves(after)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_sds_image_grad_jit_matches_eager():
    """The shape-cached jitted wrapper is numerically the eager path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.models.diffusion import SDSGuidance, make_dummy_modules

    g = SDSGuidance(make_dummy_modules(image_size=32))
    emb = g.get_text_embeds(["x"])
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 24, 24)), 0, 1)
    key = jax.random.PRNGKey(7)
    eager = np.asarray(g.sds_image_grad(key, emb, img, 50.0))
    jitted = np.asarray(g.sds_image_grad_jit(key, emb, img, 50.0))
    np.testing.assert_allclose(jitted, eager, atol=1e-6)
    # a second shape reuses the same wrapper (jax.jit specializes per shape
    # internally; the hand cache only keys on depth-vs-no-depth)
    img2 = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16)), 0, 1)
    out2 = np.asarray(g.sds_image_grad_jit(key, emb, img2, 50.0))
    assert out2.shape == (1, 3, 16, 16) and np.isfinite(out2).all()
    assert len(g._sds_jit) == 1
