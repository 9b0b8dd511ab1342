"""Quantify how far a (stylized) field is from its procedural style target.

Metric for the toy-guidance stylize demonstration (VERDICT r2 item 1): render
N holdout orbit views of the evaluated field and of the bare canonical
artifact, build the per-view style target by palette-remapping the bare
render's foreground (models/toy_guidance.apply_style), and report the mean
absolute color distance over the bare foreground mask.

A successful stylize run drives style_dist(styled field) far below
style_dist(bare field) — the "before" number — while keeping the silhouette
(opacity loss) intact.

Usage:
    python tools/eval_style.py --ckpt <styled.pth.tar> --style lava \
        [--bare artifacts/canonical] [--out eval_style.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="field checkpoint to evaluate")
    ap.add_argument("--grid_path", default=None,
                    help="density grid for --ckpt (default: the bare grid)")
    ap.add_argument("--bare", default="artifacts/canonical",
                    help="bare canonical artifact dir (target source)")
    ap.add_argument("--style", required=True)
    ap.add_argument("--views", default=4, type=int)
    ap.add_argument("--res", default=128, type=int)
    ap.add_argument("--out", default=None)
    ap.add_argument("--save_pngs", default=None, help="dump renders here")
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    opt = ap.parse_args(argv)

    if opt.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.cameras import default_360_path, pose2rays
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL, NSR_BOUND
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, render_rays_fast
    from avatarcraft_tpu.models.toy_guidance import STYLES, apply_style
    from avatarcraft_tpu.utils.checkpoint import (
        artifact_normal_mode,
        load_params_with_config,
    )

    bare_ckpt = os.path.join(opt.bare, "bare_smpl_tpu.pth.tar")
    params_bare, fcfg_bare = load_params_with_config(bare_ckpt)
    params_eval, fcfg_eval = load_params_with_config(opt.ckpt)
    grid_bare = jnp.asarray(np.load(os.path.join(opt.bare, "grid.npy")))
    grid_eval = (
        jnp.asarray(np.load(opt.grid_path)) if opt.grid_path else grid_bare
    )
    normal_mode = artifact_normal_mode(bare_ckpt) or "fd4"
    R = opt.res
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND,
        sample_budget=R * R * 5, probe_pool=2, normal_mode=normal_mode,
    )
    s_idx = STYLES.index(opt.style)

    # fixed holdout angles (no noise aug -> never in the training distribution)
    poses, _ = default_360_path(
        np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_VAL,
        opt.views,
    )

    def render(params, fcfg, grid, ro, rd):
        out = render_rays_fast(params, ro, rd, fcfg, fast_cfg, grid, 1.0)
        return out["rgb"], out["weight_sum"]

    render_j = jax.jit(render, static_argnums=(1,))

    rows = []
    for vi, c2w in enumerate(poses):
        ro, rd = pose2rays(R, R, c2w)
        rgb_b, a_b = render_j(params_bare, fcfg_bare, grid_bare, ro, rd)
        rgb_e, a_e = render_j(params_eval, fcfg_eval, grid_eval, ro, rd)
        rgb_b = np.asarray(rgb_b).reshape(R, R, 3).clip(0, 1)
        rgb_e = np.asarray(rgb_e).reshape(R, R, 3).clip(0, 1)
        a_b = np.asarray(a_b).reshape(R, R).clip(0, 1)
        target = np.asarray(
            apply_style(jnp.asarray(rgb_b), jnp.asarray(a_b), s_idx)
        )
        fg = a_b > 0.5
        dist = float(np.abs(rgb_e - target)[fg].mean()) if fg.any() else 0.0
        bare_dist = float(np.abs(rgb_b - target)[fg].mean()) if fg.any() else 0.0
        # Palette-ramp affinity: SDS is a distributional objective (it pulls
        # toward the guidance's mode, not a per-pixel remap), so also measure
        # the distance to the NEAREST color on the style's luminance ramp.
        from avatarcraft_tpu.models.toy_guidance import style_map

        ramp = np.asarray(
            style_map(jnp.tile(jnp.linspace(0, 1, 64)[:, None], (1, 3)), s_idx)
        )  # [64, 3]
        def ramp_dist(img):
            d = np.abs(img[fg][:, None, :] - ramp[None, :, :]).mean(axis=2)
            return float(d.min(axis=1).mean()) if fg.any() else 0.0
        rows.append({"view": vi, "style_dist": dist, "bare_dist": bare_dist,
                     "palette_dist": ramp_dist(rgb_e),
                     "bare_palette_dist": ramp_dist(rgb_b),
                     "fg_frac": float(fg.mean())})
        if opt.save_pngs:
            import imageio.v2 as imageio

            os.makedirs(opt.save_pngs, exist_ok=True)
            for tag, img in (("eval", rgb_e), ("bare", rgb_b), ("target", target)):
                imageio.imwrite(
                    os.path.join(opt.save_pngs, f"v{vi:02d}_{tag}.png"),
                    (img * 255).round().astype(np.uint8),
                )

    mean_dist = float(np.mean([r["style_dist"] for r in rows]))
    mean_bare = float(np.mean([r["bare_dist"] for r in rows]))
    mean_pal = float(np.mean([r["palette_dist"] for r in rows]))
    mean_pal_bare = float(np.mean([r["bare_palette_dist"] for r in rows]))
    result = {
        "ckpt": opt.ckpt, "style": opt.style, "res": R,
        "mean_style_dist": mean_dist, "mean_bare_dist": mean_bare,
        "improvement_factor": (mean_bare / mean_dist) if mean_dist > 0 else None,
        "mean_palette_dist": mean_pal, "mean_bare_palette_dist": mean_pal_bare,
        "palette_improvement_factor": (
            (mean_pal_bare / mean_pal) if mean_pal > 0 else None
        ),
        "views": rows,
    }
    if opt.out:
        with open(opt.out, "w") as fp:
            json.dump(result, fp, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
