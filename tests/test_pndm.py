"""PNDM (PLMS) txt2img sampler parity (reference: models/diffusion.py:63-64,
266-290 samples with diffusers' PNDMScheduler in the SD pipeline config).

Three layers of checks:
* coefficient sanity: with a constant eps-predictor every linear-multistep
  history combination must collapse to that constant (the Adams-Bashforth
  weights sum to 1), so the PLMS trajectory equals the one-step PNDM
  transfer applied repeatedly — computed independently in numpy;
* trajectory parity vs a torch transcription of the scheduler around the
  independent torch UNet oracle (tests/test_sd_converters.py), identical
  weights/latents, float64;
* prompt_to_img end-to-end shape/range on tiny modules.

Scheduler semantics transcribed from diffusers scheduling_pndm.py
(set_timesteps / step_plms / _get_prev_sample; skip_prk_steps=True,
steps_offset=1, set_alpha_to_one=False — the SD v1.5 scheduler config the
reference downloads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from avatarcraft_tpu.models.diffusion import (
    DiffusionSchedule,
    GuidanceModules,
    SDSGuidance,
)
from avatarcraft_tpu.models.sd import unet_apply, unet_params_from_torch
from tests.test_sd_converters import TINY_UNET, build_unet_sd, torch_unet

torch.manual_seed(11)


def _guidance_with_unet(unet_fn, latent_scale=2, image_size=32):
    mods = GuidanceModules(
        unet=unet_fn,
        vae_encode=lambda im: im,
        text_encode=lambda ps: None,
        latent_scale=latent_scale,
        image_size=image_size,
    )
    return SDSGuidance(mods)


# ---------------------------------------------------------------------------
# Independent numpy PLMS oracle
# ---------------------------------------------------------------------------


def numpy_plms(eps_fn, x, alphas, T, n_steps, guidance_scale, text_emb):
    """diffusers PNDMScheduler (skip_prk_steps) transcription in numpy.

    eps_fn(x [B,C,h,w], t int, text_emb) -> eps [B,C,h,w] (CFG already
    applied by the caller contract used here)."""
    ratio = T // n_steps
    base = (np.arange(0, n_steps) * ratio).round().astype(np.int64) + 1
    plms_ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    final_alpha = alphas[0]

    def prev_sample(sample, t, t_prev, eps):
        a_t = alphas[t]
        a_prev = alphas[t_prev] if t_prev >= 0 else final_alpha
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev**0.5 + (a_t * b_t * a_prev) ** 0.5
        return coeff * sample - (a_prev - a_t) * eps / denom

    ets = []
    cur_sample = None
    for counter, t in enumerate(plms_ts):
        t = int(t)
        t_prev = t - ratio
        e = eps_fn(x, t, text_emb)
        if counter != 1:
            ets = ets[-3:] + [e]
        else:
            t_prev = t
            t = t + ratio
        if len(ets) == 1 and counter == 0:
            e_lms = e
            cur_sample = x
        elif len(ets) == 1 and counter == 1:
            e_lms = (e + ets[-1]) / 2.0
            x = cur_sample
        elif len(ets) == 2:
            e_lms = (3.0 * ets[-1] - ets[-2]) / 2.0
        elif len(ets) == 3:
            e_lms = (23.0 * ets[-1] - 16.0 * ets[-2] + 5.0 * ets[-3]) / 12.0
        else:
            e_lms = (
                55.0 * ets[-1] - 59.0 * ets[-2] + 37.0 * ets[-3] - 9.0 * ets[-4]
            ) / 24.0
        x = prev_sample(x, t, t_prev, e_lms)
    return x


def test_pndm_constant_eps_collapses_to_first_order():
    """Every multistep weight set sums to 1, so a constant eps-predictor must
    give exactly the first-order PNDM trajectory — computed independently."""
    sched = DiffusionSchedule()
    alphas = sched.alphas_cumprod.astype(np.float64)
    T = sched.num_train_timesteps
    const = 0.37
    B, C, H = 1, 2, 4
    x0 = np.full((B, C, H, H), 0.9)

    def unet(lat, t, emb):  # both CFG branches agree -> eps_hat == const
        return jnp.full_like(lat, const)

    g = _guidance_with_unet(unet)
    out = np.asarray(
        g.produce_latents(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 3, 8)),
            height=H * 2, width=H * 2,
            num_inference_steps=5, guidance_scale=7.5,
            latents=jnp.asarray(x0), latent_channels=C,
        )
    )

    # independent first-order replay over the same PLMS timestep list
    alphas32 = sched.alphas_cumprod  # f32 like the sampler's constants
    ref = numpy_plms(
        lambda x, t, e: np.full_like(x, const), x0.copy(), alphas32, T, 5, 7.5, None
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pndm_trajectory_matches_torch_oracle():
    """Full trajectory vs the torch UNet oracle + numpy scheduler, identical
    weights and latents, float64 (same pattern as tests/test_sds_torch_parity)."""
    unet_sd = {k: v.double() for k, v in build_unet_sd(TINY_UNET).items()}
    sched = DiffusionSchedule()
    T = sched.num_train_timesteps
    alphas = sched.alphas_cumprod  # f32 constants on both sides

    B, C, H = 1, 4, 8
    x0 = np.random.default_rng(3).normal(size=(B, C, H, H))
    text_emb = torch.randn(2, 6, TINY_UNET.cross_attention_dim, dtype=torch.float64) * 0.3
    gs = 7.5
    n_steps = 6

    def torch_eps(x, t, emb):
        lat = torch.tensor(np.concatenate([x, x]), dtype=torch.float64)
        tt = torch.full((2,), t, dtype=torch.long)
        with torch.no_grad():
            eps = torch_unet(unet_sd, TINY_UNET, lat, tt, emb).numpy()
        return eps[:1] + gs * (eps[1:] - eps[:1])

    ref = numpy_plms(torch_eps, x0.copy(), alphas, T, n_steps, gs, text_emb)

    jax.config.update("jax_enable_x64", True)
    try:
        params = unet_params_from_torch(unet_sd, TINY_UNET)
        g = _guidance_with_unet(
            lambda l, t, c: unet_apply(params, TINY_UNET, l, t, c)
        )
        out = np.asarray(
            g.produce_latents(
                jax.random.PRNGKey(0),
                jnp.asarray(text_emb.numpy()),
                height=H * 2, width=H * 2,
                num_inference_steps=n_steps, guidance_scale=gs,
                latents=jnp.asarray(x0), latent_channels=C,
            )
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    scale = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(out, ref, atol=1e-8 * scale, rtol=1e-7)


def test_prompt_to_img_end_to_end():
    """embeds -> PNDM latents -> VAE decode -> uint8 HWC images
    (reference: models/diffusion.py:314-333)."""

    def unet(lat, t, emb):
        return jnp.tanh(lat) * 0.1

    mods = GuidanceModules(
        unet=unet,
        vae_encode=lambda im: im,
        text_encode=lambda ps: jnp.zeros((len(ps), 4, 8)),
        vae_decode=lambda lat: jnp.clip(
            jax.image.resize(
                (lat[:, :3] + 1.0) / 2.0,
                (lat.shape[0], 3, lat.shape[2] * 2, lat.shape[3] * 2),
                method="nearest",
            ),
            0.0, 1.0,
        ),
        latent_scale=2,
        image_size=16,
    )
    g = SDSGuidance(mods)
    imgs = g.prompt_to_img(
        "a test prompt", height=16, width=16, num_inference_steps=4,
        key=jax.random.PRNGKey(5),
    )
    assert imgs.shape == (1, 16, 16, 3)
    assert imgs.dtype == np.uint8
