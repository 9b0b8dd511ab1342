"""Pin the whole SDS pullback to torch autograd.

VERDICT round-2 item 2: the reference computes the SDS image gradient with
``latents.backward(gradient=grad)`` through a REAL conv VAE encoder
(reference: models/diffusion.py:92-149). tests/test_sds.py exercises our
machinery only against dummy modules whose VJP is nothing like a conv
encoder's. This test closes that blind spot:

* build tiny torch VAE/UNet state_dicts in the diffusers key layout
  (the independent torch oracle from tests/test_sd_converters.py),
* transcribe ``mannual_backward`` in torch around them, with torch autograd
  providing the encoder pullback,
* load the SAME weights into the JAX modules via the sd.py converters,
* inject identical t / noise / text embeddings,
* require ``sds_image_grad``'s image-space gradient to match torch autograd.

It therefore doubles as an end-to-end converter test with a real conv VJP.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from avatarcraft_tpu.models.diffusion import (
    DiffusionSchedule,
    GuidanceModules,
    SDSGuidance,
)
from avatarcraft_tpu.models.sd import (
    unet_apply,
    unet_params_from_torch,
    vae_encode_apply,
    vae_encoder_params_from_torch,
)
from tests.test_sd_converters import (
    TINY_UNET,
    TINY_VAE,
    build_unet_sd,
    build_vae_sd,
    torch_unet,
    torch_vae_encode,
)

torch.manual_seed(7)

S = 32  # guidance image size (reference uses 512; semantics are size-free)


def torch_mannual_backward(
    vae_sd,
    unet_sd,
    vcfg,
    ucfg,
    text_emb: torch.Tensor,  # [2, L, D] = [uncond; cond]
    pred_rgb: torch.Tensor,  # [1, 3, H, W] in [0, 1]
    guidance_scale: float,
    t: int,
    noise: torch.Tensor,
    alphas: np.ndarray,
    pred_depth: torch.Tensor | None = None,
) -> torch.Tensor:
    """The reference's mannual_backward (models/diffusion.py:92-149), torch
    autograd providing the VAE-encoder pullback. Deterministic: t and noise
    are injected; the VAE uses the posterior mean (our documented
    determinism choice, models/diffusion.py docstring)."""
    rgb = pred_rgb.clone().requires_grad_(True)
    rgb512 = F.interpolate(rgb, (S, S), mode="bilinear", align_corners=False)
    latents = torch_vae_encode(vae_sd, vcfg, rgb512)

    # the schedule constants are float32 on both sides (DiffusionSchedule
    # stores f32 like the reference's torch buffers); take sqrt/1-x at f32 so
    # a float64 run compares semantics, not constant-precision
    a32 = np.float32(alphas[t])
    sqrt_a = float(np.sqrt(a32, dtype=np.float32))
    sqrt_1ma = float(np.sqrt(np.float32(1.0) - a32, dtype=np.float32))
    a_t = float(a32)
    with torch.no_grad():
        latents_noisy = sqrt_a * latents + sqrt_1ma * noise
        lat2 = torch.cat([latents_noisy] * 2)
        if pred_depth is not None:
            d = F.interpolate(
                pred_depth, size=lat2.shape[-2:], mode="bicubic", align_corners=False
            )
            d = 2.0 * (d - d.min()) / (d.max() - d.min()) - 1.0
            lat2 = torch.cat([lat2, torch.cat([d] * 2)], dim=1)
        t2 = torch.full((2,), t, dtype=torch.long)
        eps = torch_unet(unet_sd, ucfg, lat2, t2, text_emb)
        eps_u, eps_c = eps.chunk(2)
        eps_hat = eps_u + guidance_scale * (eps_c - eps_u)
        w = float(np.float32(1.0) - a32)
        grad = (w * (eps_hat - noise)).clamp(-1.0, 1.0)

    latents.backward(gradient=grad)
    return rgb.grad


def _make_jax_guidance(vae_sd, unet_sd, use_depth=False):
    vae_params = vae_encoder_params_from_torch(vae_sd, TINY_VAE)
    ucfg = TINY_UNET if not use_depth else _DEPTH_UNET
    unet_params = unet_params_from_torch(unet_sd, ucfg)
    mods = GuidanceModules(
        unet=lambda l, t, c: unet_apply(unet_params, ucfg, l, t, c),
        vae_encode=lambda im: vae_encode_apply(vae_params, TINY_VAE, im),
        text_encode=lambda ps: None,  # embeddings are passed in directly
        latent_scale=2,
        image_size=S,
        use_depth=use_depth,
    )
    return SDSGuidance(mods)


_DEPTH_UNET = TINY_UNET.__class__(
    **{**TINY_UNET.__dict__, "in_channels": TINY_UNET.in_channels + 1}
)


def _double_sd(sd):
    return {k: v.double() for k, v in sd.items()}


@pytest.mark.parametrize("guidance_scale,t", [(7.5, 500), (100.0, 47), (100.0, 930)])
def test_sds_image_grad_matches_torch_autograd(guidance_scale, t):
    """Both sides run in float64 so the assertion pins SEMANTICS, not conv
    roundoff (at float32 the group-norm/attention stacks already diverge by
    ~2e-4 between torch and XLA on identical weights)."""
    vae_sd = _double_sd(build_vae_sd(TINY_VAE))
    unet_sd = _double_sd(build_unet_sd(TINY_UNET))
    alphas = DiffusionSchedule().alphas_cumprod

    rgb = torch.rand(1, 3, 24, 24, dtype=torch.float64)
    text_emb = torch.randn(2, 6, TINY_UNET.cross_attention_dim, dtype=torch.float64) * 0.3
    # latent grid: S / (VAE downsampling 2) = 16
    noise = torch.randn(1, TINY_VAE.latent_channels, S // 2, S // 2, dtype=torch.float64)

    ref = torch_mannual_backward(
        vae_sd, unet_sd, TINY_VAE, TINY_UNET, text_emb, rgb,
        guidance_scale, t, noise, alphas,
    ).numpy()

    jax.config.update("jax_enable_x64", True)
    try:
        g = _make_jax_guidance(vae_sd, unet_sd)
        out = g.sds_image_grad(
            jax.random.PRNGKey(0),  # consumed but overridden
            jnp.asarray(text_emb.numpy()),
            jnp.asarray(rgb.numpy()),
            guidance_scale,
            t_override=t,
            noise_override=jnp.asarray(noise.numpy()),
        )
        out = np.asarray(out)
    finally:
        jax.config.update("jax_enable_x64", False)

    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    scale = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(out, ref, atol=1e-8 * scale, rtol=1e-7)
    # the gradient must be non-trivial for the comparison to mean anything
    assert np.abs(ref).max() > 1e-8


def test_sds_depth_conditioned_grad_matches_torch_autograd():
    """SD-2.0-depth: the depth channel rides the UNet input (no gradient
    flows through it — eps is no-grad in both frameworks); injecting depth
    at the latent resolution sidesteps the torch-bicubic vs jax-cubic kernel
    difference so the min-max normalization + concat semantics are pinned."""
    vae_sd = _double_sd(build_vae_sd(TINY_VAE))
    unet_sd = _double_sd(build_unet_sd(_DEPTH_UNET))
    alphas = DiffusionSchedule().alphas_cumprod

    rgb = torch.rand(1, 3, 24, 24, dtype=torch.float64)
    text_emb = torch.randn(2, 6, TINY_UNET.cross_attention_dim, dtype=torch.float64) * 0.3
    noise = torch.randn(1, TINY_VAE.latent_channels, S // 2, S // 2, dtype=torch.float64)
    # already latent-sized (resize is the identity on both sides)
    depth = torch.rand(1, 1, S // 2, S // 2, dtype=torch.float64) * 4.0 + 1.0

    ref = torch_mannual_backward(
        vae_sd, unet_sd, TINY_VAE, _DEPTH_UNET, text_emb, rgb,
        100.0, 333, noise, alphas, pred_depth=depth,
    ).numpy()

    jax.config.update("jax_enable_x64", True)
    try:
        g = _make_jax_guidance(vae_sd, unet_sd, use_depth=True)
        out = np.asarray(
            g.sds_image_grad(
                jax.random.PRNGKey(0),
                jnp.asarray(text_emb.numpy()),
                jnp.asarray(rgb.numpy()),
                100.0,
                pred_depth=jnp.asarray(depth.numpy()),
                t_override=333,
                noise_override=jnp.asarray(noise.numpy()),
            )
        )
    finally:
        jax.config.update("jax_enable_x64", False)
    scale = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(out, ref, atol=1e-8 * scale, rtol=1e-7)
    assert np.abs(ref).max() > 1e-8
