"""Stable Diffusion architecture modules at tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.sd import (
    CLIPTextConfig,
    UNetConfig,
    VAEConfig,
    clip_text_apply,
    init_clip_text_params,
    init_unet_params,
    init_vae_encoder_params,
    timestep_embedding,
    unet_apply,
    vae_encode_apply,
)

TINY_UNET = UNetConfig(
    block_out_channels=(8, 16),
    layers_per_block=1,
    cross_attention_dim=12,
    attention_head_dim=2,
    norm_groups=4,
    attn_blocks=(True, False),
)
TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_groups=4)
TINY_CLIP = CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2, max_len=8)


def test_timestep_embedding_properties():
    emb = np.asarray(timestep_embedding(jnp.asarray([0, 10, 999]), 32))
    assert emb.shape == (3, 32)
    # t=0: cos part all ones, sin part all zeros
    np.testing.assert_allclose(emb[0, :16], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 16:], 0.0, atol=1e-6)
    assert not np.allclose(emb[1], emb[2])


def test_unet_shapes_and_conditioning():
    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.asarray([100, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 12))
    out = unet_apply(params, TINY_UNET, lat, t, ctx)
    assert out.shape == (2, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    # text conditioning changes the output
    ctx2 = ctx + 1.0
    out2 = unet_apply(params, TINY_UNET, lat, t, ctx2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # timestep changes the output
    out3 = unet_apply(params, TINY_UNET, lat, jnp.asarray([100, 501]), ctx)
    assert not np.allclose(np.asarray(out)[1], np.asarray(out3)[1])
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out3)[0], atol=1e-5)


def test_unet_jits_and_grads():
    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 12))
    f = jax.jit(lambda p, l: unet_apply(p, TINY_UNET, l, jnp.asarray([3]), ctx).sum())
    v = float(f(params, lat))
    assert np.isfinite(v)
    g = jax.grad(lambda l: f(params, l))(lat)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_vae_encoder_downsamples_8x_equiv():
    """At 2 blocks the VAE downsamples 2x; latent scaling applied."""
    params = init_vae_encoder_params(jax.random.PRNGKey(0), TINY_VAE)
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 32)), 0, 1)
    lat = vae_encode_apply(params, TINY_VAE, img)
    assert lat.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(lat)).all()
    # differentiable w.r.t. the image (the SDS pullback path)
    g = jax.grad(lambda im: vae_encode_apply(params, TINY_VAE, im).sum())(img)
    assert float(jnp.abs(g).sum()) > 0


def test_clip_text_causal():
    params = init_clip_text_params(jax.random.PRNGKey(0), TINY_CLIP)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    out = clip_text_apply(params, TINY_CLIP, ids)
    assert out.shape == (1, 8, 16)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 5].set(9)
    out2 = clip_text_apply(params, TINY_CLIP, ids2)
    np.testing.assert_allclose(np.asarray(out)[0, :5], np.asarray(out2)[0, :5], atol=1e-5)
    assert not np.allclose(np.asarray(out)[0, 5:], np.asarray(out2)[0, 5:])


def test_sds_guidance_with_sd_architecture():
    """Wire the tiny SD modules into the SDS machinery end-to-end."""
    from avatarcraft_tpu.models.diffusion import GuidanceModules, SDSGuidance

    up = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    vp = init_vae_encoder_params(jax.random.PRNGKey(1), TINY_VAE)
    cp = init_clip_text_params(jax.random.PRNGKey(2), TINY_CLIP)

    def text_encode(prompts):
        ids = jnp.asarray(
            [[(abs(hash(p + str(i))) % 60) + 1 for i in range(8)] for p in prompts]
        )
        h = clip_text_apply(cp, TINY_CLIP, ids)
        return h @ jnp.ones((16, 12)) / 16.0  # project to ctx dim

    mods = GuidanceModules(
        unet=lambda l, t, c: unet_apply(up, TINY_UNET, l, t, c),
        vae_encode=lambda im: vae_encode_apply(vp, TINY_VAE, im),
        text_encode=text_encode,
        latent_scale=2,
        image_size=32,
    )
    g = SDSGuidance(mods)
    emb = g.get_text_embeds(["a tiny test"])
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 16, 16)), 0, 1)
    grad = g.sds_image_grad(jax.random.PRNGKey(4), emb, img)
    assert grad.shape == img.shape
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0
