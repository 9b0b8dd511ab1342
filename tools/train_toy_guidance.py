"""Train the in-env toy conditional diffusion guidance on procedural targets.

Builds the dataset by rendering the committed canonical artifact from the
stylize camera distribution (style_360_path with noise aug + head boxes,
reference: stylize.py:59-71), re-mapping the foreground through each style's
luminance palette (models/toy_guidance.STYLE_PALETTES), compositing onto the
stylize background augmentations (white/black/gray-noise,
reference: render_utils.py:953-987), and DDPM-training the tiny conditional
UNet on the result with classifier-free dropout.

The output directory plugs straight into the flagship loop:

    python stylize.py --guidance_type toy --toy_weights artifacts/toy_guidance \
        --tgt_text lava --sampler fast ...

Usage:
    python tools/train_toy_guidance.py --steps 4000 [--out artifacts/toy_guidance]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default="artifacts/canonical")
    ap.add_argument("--out", default="artifacts/toy_guidance")
    ap.add_argument("--views", default=192, type=int)
    ap.add_argument("--res", default=64, type=int)
    ap.add_argument("--steps", default=4000, type=int)
    ap.add_argument("--batch", default=32, type=int)
    ap.add_argument("--scan", default=50, type=int, help="steps per jit call")
    ap.add_argument("--lr", default=3e-4, type=float)
    ap.add_argument("--warmup", default=200, type=int)
    ap.add_argument("--head_rate", default=0.35, type=float)
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    opt = ap.parse_args(argv)

    if opt.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from avatarcraft_tpu.cameras import pose2rays, style_360_path
    from avatarcraft_tpu.constants import (
        CAN_HEAD_CAMERA_DIST,
        CAN_HEAD_OFFSET,
        CANONICAL_CAMERA_DIST_TRAIN,
        NSR_BOUND,
    )
    from avatarcraft_tpu.models.diffusion import DiffusionSchedule
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, render_rays_fast
    from avatarcraft_tpu.models.toy_guidance import (
        STYLES,
        ToyGuidanceConfig,
        _make_ddpm_loss,
        init_toy_params,
        save_toy_guidance,
        style_map,
    )
    from avatarcraft_tpu.utils.checkpoint import (
        artifact_normal_mode,
        load_params_with_config,
    )

    # ---- render the canonical avatar from the stylize camera distribution --
    ckpt = os.path.join(opt.artifact, "bare_smpl_tpu.pth.tar")
    params_field, fcfg = load_params_with_config(ckpt)
    grid = jnp.asarray(np.load(os.path.join(opt.artifact, "grid.npy")))
    normal_mode = artifact_normal_mode(ckpt) or "fd4"
    R = opt.res
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND,
        sample_budget=R * R * 5, normal_mode=normal_mode,
    )

    rng = np.random.default_rng(opt.seed)
    poses, _descs = style_360_path(
        np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_TRAIN,
        opt.views, add_noise=True, noise_scale=2.0, style_head=True,
        head_offset=CAN_HEAD_OFFSET, head_rate=opt.head_rate,
        head_dist=CAN_HEAD_CAMERA_DIST, rng=rng,
    )

    def _render_group(p, ros, rds, g):
        def body(c, xr):
            ro, rd = xr
            out = render_rays_fast(p, ro, rd, fcfg, fast_cfg, g, 0.0)
            return c, (out["rgb"], out["weight_sum"])

        _, (rgbs, alphas) = jax.lax.scan(body, 0.0, (ros, rds))
        return rgbs, alphas

    render_group = jax.jit(_render_group)

    t0 = time.time()
    group = 8
    all_rgb, all_alpha = [], []
    for i in range(0, len(poses), group):
        chunk = poses[i : i + group]
        rays = [pose2rays(R, R, c2w) for c2w in chunk]
        ros = jnp.stack([r[0] for r in rays])
        rds = jnp.stack([r[1] for r in rays])
        rgbs, alphas = render_group(params_field, ros, rds, grid)
        all_rgb.append(np.asarray(rgbs))
        all_alpha.append(np.asarray(alphas))
        print(f"  rendered {min(i + group, len(poses))}/{len(poses)} views",
              file=sys.stderr)
    rgb_pre = np.concatenate(all_rgb).reshape(-1, R, R, 3)  # premult (black bg)
    alpha = np.concatenate(all_alpha).reshape(-1, R, R).clip(0.0, 1.0)
    print(f"dataset render: {len(poses)} views in {time.time() - t0:.1f}s",
          file=sys.stderr)

    unpremult = rgb_pre / np.maximum(alpha[..., None], 1e-3)
    unpremult = unpremult.clip(0.0, 1.0)

    cfg = ToyGuidanceConfig(image_size=R)
    n_styles = len(STYLES)
    # [S_styles, V, H, W, 3] premultiplied styled foregrounds
    styled_fg = np.stack([
        np.asarray(style_map(jnp.asarray(unpremult), s)) * alpha[..., None]
        for s in range(n_styles)
    ])
    styled_fg_d = jnp.asarray(styled_fg)
    alpha_d = jnp.asarray(alpha)
    V = len(poses)

    # ---- DDPM training, scan-batched ---------------------------------------
    sched = optax.warmup_cosine_decay_schedule(
        0.0, opt.lr, opt.warmup, max(opt.steps, opt.warmup + 1), opt.lr * 0.05
    )
    tx = optax.adamw(sched, weight_decay=1e-4)
    params = init_toy_params(jax.random.PRNGKey(opt.seed + 1), cfg)
    opt_state = tx.init(params)
    loss_fn = _make_ddpm_loss(cfg, DiffusionSchedule(), 0.1)

    B = opt.batch

    @jax.jit
    def scan_train(params, opt_state, key):
        keys = jax.random.split(key, opt.scan)

        def body(carry, k):
            params, opt_state = carry
            k1, k2, k3, k4, k5 = jax.random.split(k, 5)
            vi = jax.random.randint(k1, (B,), 0, V)
            si = jax.random.randint(k2, (B,), 0, n_styles)
            bi = jax.random.randint(k3, (B,), 0, 3)
            fg = styled_fg_d[si, vi]  # [B, H, W, 3]
            al = alpha_d[vi][..., None]
            noise_b = jnp.clip(
                0.5 + 0.1 * jax.random.normal(k4, (B, R, R, 1)), 0.0, 1.0
            )
            bsel = bi[:, None, None, None]
            bkg = jnp.where(bsel == 0, 1.0, jnp.where(bsel == 1, 0.0, noise_b))
            imgs = fg + bkg * (1.0 - al)
            loss, grads = jax.value_and_grad(loss_fn)(params, imgs, si, k5)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses

    key = jax.random.PRNGKey(opt.seed + 2)
    n_calls = (opt.steps + opt.scan - 1) // opt.scan
    t0 = time.time()
    for c in range(n_calls):
        key, sub = jax.random.split(key)
        params, opt_state, losses = scan_train(params, opt_state, sub)
        if c == 0 or (c + 1) % 5 == 0 or c == n_calls - 1:
            lo = np.asarray(losses)
            dt = time.time() - t0
            print(
                f"step {(c + 1) * opt.scan}/{opt.steps} "
                f"loss {lo[-10:].mean():.4f} ({(c + 1) * opt.scan / dt:.1f} steps/s)",
                file=sys.stderr,
            )
    losses_final = float(np.asarray(losses)[-10:].mean())

    save_toy_guidance(opt.out, params, cfg)
    meta = {
        "steps": opt.steps, "batch": B, "views": V, "res": R,
        "styles": list(STYLES), "final_loss": losses_final,
        "artifact": opt.artifact, "normal_mode": normal_mode,
        "lr": opt.lr, "seed": opt.seed,
    }
    with open(os.path.join(opt.out, "TRAIN_META.json"), "w") as fp:
        json.dump(meta, fp, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
