"""In-environment trainable SDS guidance (the "toy" conditional denoiser).

This container ships no Stable Diffusion weights (the reference gates them
behind a HuggingFace TOKEN download, reference: models/diffusion.py:31-37), so
the flagship stylize loop cannot be driven by real SD here. This module makes
the loop *demonstrable end-to-end* with guidance that carries actual signal:

* a tiny pixel-space conditional denoiser (the same UNet2DCondition code path
  as the full SD architecture, ``models/sd.py``, at miniature config) is
  DDPM-trained in-env on **procedural style targets** — renders of the
  committed canonical avatar whose foreground is re-mapped through a
  per-style luminance palette, over the same camera/background augmentations
  the stylize schedule uses;
* the trained denoiser plugs into :class:`GuidanceModules` unchanged — SDS,
  CFG, t-sampling, the image-gradient pullback all run exactly the code the
  real SD weights would (reference semantics: models/diffusion.py:92-149);
* conditioning is a fixed embedding per style keyword, with the empty prompt
  mapping to a null embedding (classifier-free guidance pair, reference:
  models/diffusion.py:72-89). View-augmented prompts ("front view of the
  body of the lava") resolve to the style keyword they contain.

The result: ``stylize --guidance_type toy`` optimizes the avatar toward a
visible, measurable target style through the full coarse-to-fine schedule.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.diffusion import DiffusionSchedule, GuidanceModules
from avatarcraft_tpu.models.sd import UNetConfig, init_unet_params, unet_apply

# ---------------------------------------------------------------------------
# Procedural style targets
# ---------------------------------------------------------------------------

# luminance -> color control points (evenly spaced in [0, 1])
STYLE_PALETTES: dict[str, tuple] = {
    "lava": ((0.10, 0.00, 0.00), (0.62, 0.05, 0.00),
             (0.95, 0.45, 0.05), (1.00, 0.95, 0.30)),
    "emerald": ((0.00, 0.05, 0.02), (0.02, 0.35, 0.15),
                (0.10, 0.70, 0.35), (0.80, 1.00, 0.85)),
    "porcelain": ((0.20, 0.25, 0.35), (0.55, 0.60, 0.70),
                  (0.85, 0.88, 0.95), (1.00, 1.00, 1.00)),
}

STYLES: tuple = tuple(STYLE_PALETTES)


def style_index(prompt: str) -> int:
    """Style id carried by a (possibly view-augmented) prompt; -1 = uncond.

    The stylize schedule prefixes prompts with view descriptors
    (reference: render_utils.py:80-90), so match by keyword containment."""
    for i, name in enumerate(STYLES):
        if name in prompt:
            return i
    return -1


def style_map(rgb: jnp.ndarray, style: int | str) -> jnp.ndarray:
    """Pure palette mapping: [..., 3] colors -> [..., 3] palette colors by
    luminance (piecewise-linear over the control points)."""
    if isinstance(style, str):
        style = STYLES.index(style)
    pal = jnp.asarray(list(STYLE_PALETTES.values()))[style]  # [K, 3]
    lum = jnp.clip(
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2], 0.0, 1.0
    )
    k = pal.shape[0]
    x = lum * (k - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, k - 2)
    f = (x - i0)[..., None]
    return pal[i0] * (1.0 - f) + pal[i0 + 1] * f


def apply_style(rgb: jnp.ndarray, alpha: jnp.ndarray, style: int | str) -> jnp.ndarray:
    """Procedural target: foreground luminance mapped through the style
    palette, background (1 - alpha) left as-is.

    rgb:   [..., 3] composited render colors in [0, 1]
    alpha: [...] foreground coverage (render weight_sum)
    """
    styled = style_map(rgb, style)
    return styled * alpha[..., None] + rgb * (1.0 - alpha[..., None])


# ---------------------------------------------------------------------------
# The denoiser
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ToyGuidanceConfig:
    image_size: int = 64
    emb_dim: int = 24
    seq_len: int = 4
    block_out_channels: tuple = (32, 64, 96)
    layers_per_block: int = 1
    attention_head_dim: int = 4
    norm_groups: int = 8
    attn_blocks: tuple = (False, True, True)
    styles: tuple = STYLES
    seed: int = 1234

    @property
    def unet(self) -> UNetConfig:
        return UNetConfig(
            in_channels=3,
            out_channels=3,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            cross_attention_dim=self.emb_dim,
            attention_head_dim=self.attention_head_dim,
            norm_groups=self.norm_groups,
            attn_blocks=self.attn_blocks,
        )


def style_embeddings(cfg: ToyGuidanceConfig) -> jnp.ndarray:
    """[n_styles + 1, L, D] fixed conditioning tokens; last row = null
    (empty prompt / classifier-free uncond)."""
    n = len(cfg.styles)
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), n + 1)
    rows = [jax.random.normal(k, (cfg.seq_len, cfg.emb_dim)) for k in keys]
    return jnp.stack(rows)


def init_toy_params(key: jax.Array, cfg: ToyGuidanceConfig) -> dict:
    return init_unet_params(key, cfg.unet)


def make_toy_modules(params: dict, cfg: ToyGuidanceConfig) -> GuidanceModules:
    embs = style_embeddings(cfg)

    def text_encode(prompts):
        idx = [style_index(p) if p else -1 for p in prompts]
        # -1 (uncond/unknown) -> the null row (last)
        rows = jnp.asarray([i if i >= 0 else len(cfg.styles) for i in idx])
        return embs[rows]

    return GuidanceModules(
        unet=lambda l, t, c: unet_apply(params, cfg.unet, l, t, c),
        # pixel-space diffusion: the "latent" IS the [-1,1]-scaled image
        # (DreamFusion's original formulation); the SDS pullback then runs
        # through this scaling + the bilinear resize
        vae_encode=lambda im: im * 2.0 - 1.0,
        text_encode=text_encode,
        latent_scale=1,
        latent_channels=3,
        image_size=cfg.image_size,
        # pixel-space "decoder": unscale [-1,1] -> [0,1] (prompt_to_img /
        # txt2img sample grids work against the toy guidance too)
        vae_decode=lambda lat: jnp.clip((lat + 1.0) / 2.0, 0.0, 1.0),
        configs={"toy": cfg},
    )


# ---------------------------------------------------------------------------
# DDPM training
# ---------------------------------------------------------------------------


def _make_ddpm_loss(cfg, schedule, uncond_dropout):
    ucfg = cfg.unet
    alphas = jnp.asarray(schedule.alphas_cumprod)
    embs_const = style_embeddings(cfg)
    n_styles = len(cfg.styles)

    def loss_fn(params, imgs, style_ids, key):
        B = imgs.shape[0]
        k_t, k_n, k_d = jax.random.split(key, 3)
        x0 = imgs.transpose(0, 3, 1, 2) * 2.0 - 1.0  # NCHW in [-1,1]
        t = jax.random.randint(k_t, (B,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k_n, x0.shape, x0.dtype)
        a_t = alphas[t][:, None, None, None]
        xt = jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * noise
        drop = jax.random.uniform(k_d, (B,)) < uncond_dropout
        ids = jnp.where(drop, n_styles, style_ids)
        eps = unet_apply(params, ucfg, xt, t, embs_const[ids])
        return jnp.mean((eps - noise) ** 2)

    return loss_fn


def make_toy_train_step(
    cfg: ToyGuidanceConfig,
    tx,
    schedule: DiffusionSchedule = DiffusionSchedule(),
    uncond_dropout: float = 0.1,
):
    """One Adam step of the eps-prediction objective over a batch.

    imgs: [B, H, W, 3] in [0,1]; style_ids: [B] int32. With probability
    ``uncond_dropout`` a row's conditioning is replaced by the null embedding
    so classifier-free guidance has a trained uncond branch."""
    import optax

    loss_fn = _make_ddpm_loss(cfg, schedule, uncond_dropout)

    @jax.jit
    def step(params, opt_state, imgs, style_ids, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, style_ids, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_toy_train_scan(
    cfg: ToyGuidanceConfig,
    tx,
    schedule: DiffusionSchedule = DiffusionSchedule(),
    uncond_dropout: float = 0.1,
):
    """Scan S steps inside one executable (this environment's execution relay
    costs ~30 ms/call — amortize it; docs/PERFORMANCE.md)."""
    import optax

    loss_fn = _make_ddpm_loss(cfg, schedule, uncond_dropout)

    @jax.jit
    def scan_steps(params, opt_state, imgs_batches, ids_batches, key):
        """imgs_batches: [S, B, H, W, 3]; ids_batches: [S, B]."""
        S = imgs_batches.shape[0]
        keys = jax.random.split(key, S)

        def body(carry, xs):
            params, opt_state = carry
            imgs, ids, k = xs
            loss, grads = jax.value_and_grad(loss_fn)(params, imgs, ids, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (imgs_batches, ids_batches, keys)
        )
        return params, opt_state, losses

    return scan_steps


# ---------------------------------------------------------------------------
# Persistence
# ---------------------------------------------------------------------------


def save_toy_guidance(path: str, params: dict, cfg: ToyGuidanceConfig) -> None:
    from avatarcraft_tpu.utils.checkpoint import save_checkpoint

    os.makedirs(path, exist_ok=True)
    save_checkpoint(os.path.join(path, "params"), {"params": jax.device_get(params)})
    with open(os.path.join(path, "config.json"), "w") as fp:
        json.dump(
            {k: getattr(cfg, k) for k in (
                "image_size", "emb_dim", "seq_len", "block_out_channels",
                "layers_per_block", "attention_head_dim", "norm_groups",
                "attn_blocks", "styles", "seed",
            )},
            fp, indent=1,
        )


def load_toy_guidance(path: str):
    """(params, ToyGuidanceConfig)."""
    from avatarcraft_tpu.utils.checkpoint import load_checkpoint

    with open(os.path.join(path, "config.json")) as fp:
        d = json.load(fp)
    cfg = ToyGuidanceConfig(**{
        k: tuple(v) if isinstance(v, list) else v for k, v in d.items()
    })
    # build the like-tree on the LOCAL CPU: the eager per-leaf random inits
    # otherwise dispatch one-by-one through the TPU execution relay
    # (~30 ms/call floor -> minutes for the UNet's hundreds of leaves)
    with jax.default_device(jax.devices("cpu")[0]):
        like = {
            "params": jax.device_get(init_toy_params(jax.random.PRNGKey(0), cfg))
        }
    state = load_checkpoint(os.path.join(path, "params"), like)
    return state["params"], cfg
