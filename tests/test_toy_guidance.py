"""Toy conditional-diffusion guidance: palettes, DDPM training, SDS wiring.

The full-scale evidence (the committed stylize run) lives in docs/; these
tests keep the machinery honest at miniature scale on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from avatarcraft_tpu.models.diffusion import DiffusionSchedule, SDSGuidance
from avatarcraft_tpu.models.toy_guidance import (
    STYLE_PALETTES,
    STYLES,
    ToyGuidanceConfig,
    apply_style,
    init_toy_params,
    load_toy_guidance,
    make_toy_modules,
    make_toy_train_scan,
    save_toy_guidance,
    style_embeddings,
    style_index,
    style_map,
)

TINY = ToyGuidanceConfig(
    image_size=16,
    emb_dim=8,
    seq_len=2,
    block_out_channels=(8, 16),
    layers_per_block=1,
    attention_head_dim=2,
    norm_groups=4,
    attn_blocks=(False, True),
)


def test_style_index_parses_augmented_prompts():
    assert style_index("lava") == 0
    assert style_index("the front view of the body of the lava") == 0
    assert style_index(f"side view of the face of the {STYLES[2]}") == 2
    assert style_index("") == -1
    assert style_index("zombie") == -1


def test_style_map_hits_palette_endpoints():
    for name, pal in STYLE_PALETTES.items():
        black = style_map(jnp.zeros((4, 3)), name)
        white = style_map(jnp.ones((4, 3)), name)
        np.testing.assert_allclose(np.asarray(black), np.tile(pal[0], (4, 1)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(white), np.tile(pal[-1], (4, 1)), atol=1e-6)


def test_apply_style_preserves_background():
    rgb = jnp.full((5, 3), 0.25)
    alpha = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    out = np.asarray(apply_style(rgb, alpha, "lava"))
    np.testing.assert_allclose(out[0], [0.25] * 3, atol=1e-6)  # pure background
    target = np.asarray(style_map(rgb, "lava"))[4]
    np.testing.assert_allclose(out[4], target, atol=1e-6)  # pure foreground


def test_embeddings_distinct_and_null():
    embs = np.asarray(style_embeddings(TINY))
    assert embs.shape == (len(STYLES) + 1, TINY.seq_len, TINY.emb_dim)
    for i in range(len(STYLES)):
        assert np.abs(embs[i] - embs[-1]).max() > 0.1


def _toy_dataset(n=24, size=16):
    """Blobby foregrounds with per-style palette colors on random backgrounds."""
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:size, 0:size]
    imgs, ids = [], []
    for i in range(n):
        s = i % len(STYLES)
        cy, cx = rng.uniform(4, size - 4, 2)
        alpha = (np.hypot(y - cy, x - cx) < size * 0.3).astype(np.float32)
        lum = rng.uniform(0.2, 0.9)
        rgb = np.full((size, size, 3), lum, np.float32)
        styled = np.asarray(style_map(jnp.asarray(rgb), s))
        bkg = rng.choice([0.0, 1.0])
        imgs.append(styled * alpha[..., None] + bkg * (1 - alpha[..., None]))
        ids.append(s)
    return np.stack(imgs).astype(np.float32), np.asarray(ids, np.int32)


def test_ddpm_training_reduces_loss_and_conditions():
    imgs, ids = _toy_dataset()
    tx = optax.adam(2e-3)
    params = init_toy_params(jax.random.PRNGKey(0), TINY)
    opt_state = tx.init(params)
    scan_steps = make_toy_train_scan(TINY, tx, uncond_dropout=0.1)

    B, S = 8, 30
    rng = np.random.default_rng(1)
    sel = rng.integers(0, len(imgs), (S, B))
    batches = jnp.asarray(imgs[sel])
    id_batches = jnp.asarray(ids[sel])
    params, opt_state, losses1 = scan_steps(
        params, opt_state, batches, id_batches, jax.random.PRNGKey(2)
    )
    params, opt_state, losses2 = scan_steps(
        params, opt_state, batches, id_batches, jax.random.PRNGKey(3)
    )
    l1 = np.asarray(losses1)
    l2 = np.asarray(losses2)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    # 60 steps on a tiny net: clear downward trend
    assert l2[-5:].mean() < l1[:5].mean()

    # conditioning reaches the output: cond vs uncond eps differ
    mods = make_toy_modules(params, TINY)
    g = SDSGuidance(mods)
    emb = g.get_text_embeds([STYLES[0]])
    lat = jnp.zeros((2, 3, 16, 16))
    t = jnp.full((2,), 500, jnp.int32)
    eps = np.asarray(mods.unet(lat, t, emb))
    assert np.abs(eps[0] - eps[1]).max() > 1e-4


def test_sds_grad_through_toy_guidance_runs_and_points_toward_style():
    """At high noise (t large), the conditional score of a palette-trained
    denoiser should push a mid-gray foreground image's red channel UP for
    lava (a red-dominant palette) relative to emerald (green-dominant)."""
    imgs, ids = _toy_dataset(n=48)
    tx = optax.adam(2e-3)
    params = init_toy_params(jax.random.PRNGKey(0), TINY)
    opt_state = tx.init(params)
    scan_steps = make_toy_train_scan(TINY, tx, uncond_dropout=0.1)
    rng = np.random.default_rng(1)
    for k in range(4):
        sel = rng.integers(0, len(imgs), (40, 8))
        params, opt_state, losses = scan_steps(
            params, opt_state, jnp.asarray(imgs[sel]), jnp.asarray(ids[sel]),
            jax.random.PRNGKey(10 + k),
        )
    g = SDSGuidance(make_toy_modules(params, TINY))
    img = jnp.full((1, 3, 16, 16), 0.5)
    grads = {}
    for s in ("lava", "emerald"):
        emb = g.get_text_embeds([s])
        acc = np.zeros(3)
        for i in range(8):
            gr = g.sds_image_grad(
                jax.random.PRNGKey(100 + i), emb, img, guidance_scale=10.0
            )
            acc += np.asarray(gr).mean(axis=(0, 2, 3))
        grads[s] = acc / 8
    assert np.isfinite(list(grads.values())).all()
    # SDS DESCENDS along grad: more-negative red grad => red increases.
    # lava is red-dominant, emerald green-dominant.
    assert grads["lava"][0] - grads["lava"][1] < grads["emerald"][0] - grads["emerald"][1]


def test_save_load_roundtrip(tmp_path):
    params = init_toy_params(jax.random.PRNGKey(0), TINY)
    save_toy_guidance(str(tmp_path / "g"), params, TINY)
    params2, cfg2 = load_toy_guidance(str(tmp_path / "g"))
    assert cfg2 == TINY
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert all(np.allclose(a, b) for a, b in zip(flat1, flat2))
