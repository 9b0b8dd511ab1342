"""Quantify how far a (stylized) field is from its style target.

Three tiers of evidence, two of them independent of the palette map that
built the guidance's training targets (de-circularization, VERDICT r3 #9):

1. **Palette distance** (original metric): per-view target built by
   palette-remapping the bare render's foreground
   (models/toy_guidance.apply_style) — informative but CIRCULAR w.r.t. the
   toy guidance's training targets, since both use the same palette map.
2. **Foreground hue/saturation shift** (guidance-independent): the styled
   render's saturation-weighted circular hue mean + mean foreground
   saturation vs the bare render's. References only the two renders.
3. **txt2img hue-distribution match** (independent target construction):
   circular earth-mover distance between the render's foreground hue
   histogram and the hue histogram of the GUIDANCE'S OWN txt2img samples
   for the style prompt, plus the chroma-centroid ANGLE to those samples
   (scale-invariant; defined even when the bare render's histogram is
   empty) — "did SDS pull the field toward what the guidance actually
   generates", with the target re-fit from samples rather than from
   apply_style. Enabled with --guidance.

A successful stylize run drives the distances (1) and (3) far below the
bare field's numbers while keeping the silhouette (opacity loss) intact.

Usage:
    python tools/eval_style.py --ckpt <styled.pth.tar> --style lava \
        [--bare artifacts/canonical] [--guidance artifacts/toy_guidance] \
        [--out eval_style.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


N_HUE_BINS = 16


def rgb_to_hsv(rgb):
    """[..., 3] in [0,1] -> (hue [0,1), sat [0,1], val [0,1]). numpy."""
    import numpy as np

    mx = rgb.max(axis=-1)
    mn = rgb.min(axis=-1)
    c = mx - mn
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.where(
            c == 0,
            0.0,
            np.where(
                mx == r,
                ((g - b) / c) % 6.0,
                np.where(mx == g, (b - r) / c + 2.0, (r - g) / c + 4.0),
            ),
        ) / 6.0
        s = np.where(mx == 0, 0.0, c / mx)
    return h, s, mx


HUE_WEIGHT_FLOOR = 0.05


def hue_stats(rgb, mask=None):
    """Saturation-weighted hue histogram + circular hue mean + mean sat over
    ``mask`` (or all pixels). Gray/white/black pixels carry ~zero weight, so
    the statistic reads the styled foreground, not the background.

    Pixels whose chroma weight (s*v) falls below ``HUE_WEIGHT_FLOOR`` are
    excluded outright: the hue of a near-gray pixel is numerical noise (the
    hue formula divides by chroma), and because ties resolve toward h=0
    (red), an unstyled gray avatar would otherwise register a spurious
    red-concentrated histogram — which accidentally *scores well* against
    warm-hued style targets and corrupts the bare-vs-styled comparison."""
    import numpy as np

    h, s, v = rgb_to_hsv(rgb)
    if mask is not None:
        h, s, v = h[mask], s[mask], v[mask]
    w_raw = (s * v).ravel()
    w = np.where(w_raw < HUE_WEIGHT_FLOOR, 0.0, w_raw)
    h = h.ravel()
    # chroma vector: per-pixel mean of w*(cos 2πh, sin 2πh) — a chromaticity
    # centroid (Lab-a/b-like). No floor needed: gray pixels contribute ~0
    # naturally (w multiplies, nothing divides by chroma), so it is defined
    # and smooth for ANY image, including fully achromatic ones (→ origin).
    ang_all = 2.0 * np.pi * h
    chroma_vec = (
        [float((np.cos(ang_all) * w_raw).mean()),
         float((np.sin(ang_all) * w_raw).mean())]
        if h.size else [0.0, 0.0]
    )
    hist = np.histogram(h, bins=N_HUE_BINS, range=(0.0, 1.0), weights=w)[0]
    tot = hist.sum()
    hist = hist / tot if tot > 0 else hist
    ang = 2.0 * np.pi * h
    cw = w.sum()
    if cw > 0:
        mean_vec = ((np.cos(ang) * w).sum() / cw, (np.sin(ang) * w).sum() / cw)
        mean_hue = float((np.arctan2(mean_vec[1], mean_vec[0]) / (2 * np.pi)) % 1.0)
    else:
        mean_hue = 0.0
    return {
        "hue_hist": [round(float(x), 4) for x in hist],
        "mean_hue": round(mean_hue, 4),
        "mean_sat": round(float(s.mean()), 4) if h.size else 0.0,
        "chroma_vec": [round(c, 5) for c in chroma_vec],
    }


def circular_emd(p, q):
    """1-D circular earth-mover distance between two histograms on the hue
    circle (bins as unit mass points): min over rotations reduces to the
    median-centered cumulative-difference formula.

    Returns None when either side has (near-)zero mass: an achromatic image
    has NO hue distribution, and transporting to/from an empty histogram is
    not a distance (for a gray avatar it would read ~0 against red targets
    and ~0.3 against green ones, purely from bin position). Compare
    achromatic renders with ``chroma_dist`` instead."""
    import numpy as np

    p, q = np.asarray(p), np.asarray(q)
    if p.sum() < 1e-9 or q.sum() < 1e-9:
        return None
    d = np.cumsum(p - q)
    return float(np.abs(d - np.median(d)).sum() / len(d))


def chroma_dist(a, b):
    """Euclidean distance between two chromaticity centroids (``chroma_vec``
    of hue_stats) — defined for any pair of images, achromatic included."""
    import numpy as np

    return float(np.hypot(a[0] - b[0], a[1] - b[1]))


def chroma_angle_deg(a, b):
    """Angle (degrees) between two chromaticity centroids — the
    scale-invariant alignment of their dominant hues.

    Centroid MAGNITUDE depends on how much of each image is chromatic
    (txt2img samples are mostly background, so their centroid is short;
    a foreground-masked render's is long), which makes Euclidean distance
    between centroids read an aligned-but-longer vector as "far". Direction
    is the comparable quantity. Returns None when either magnitude is below
    1e-3 (an achromatic image has no hue direction)."""
    import numpy as np

    ma = np.hypot(a[0], a[1])
    mb = np.hypot(b[0], b[1])
    if ma < 1e-3 or mb < 1e-3:
        return None
    cos = (a[0] * b[0] + a[1] * b[1]) / (ma * mb)
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def guidance_txt2img_hue(guidance_dir, style, n=8, steps=25, seed=0):
    """Hue histogram of the guidance's OWN txt2img samples for the style
    prompt — the de-circularized target distribution (no apply_style)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.models.diffusion import SDSGuidance
    from avatarcraft_tpu.models.toy_guidance import (
        load_toy_guidance,
        make_toy_modules,
    )

    params, tcfg = load_toy_guidance(guidance_dir)
    g = SDSGuidance(make_toy_modules(params, tcfg))
    emb1 = g.get_text_embeds([style])
    # batch the prompt axis: repeat the CFG pair n times
    emb = jnp.concatenate([jnp.repeat(e, n, axis=0) for e in jnp.split(emb1, 2)], 0)
    lat = g.produce_latents(
        jax.random.PRNGKey(seed), emb, height=tcfg.image_size,
        width=tcfg.image_size, num_inference_steps=steps, guidance_scale=4.0,
    )
    imgs = np.asarray(g.m.vae_decode(lat))  # [n, 3, H, W] in [0,1]
    imgs = imgs.transpose(0, 2, 3, 1).reshape(-1, 3)
    return hue_stats(imgs.reshape(1, -1, 3)), imgs


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
    ap.add_argument("--guidance", default=None,
                    help="toy-guidance dir (e.g. artifacts/toy_guidance): "
                         "also score hue-EMD against the guidance's own "
                         "txt2img samples (de-circularized target)")
    ap.add_argument("--txt2img_n", default=8, type=int)
    ap.add_argument("--txt2img_steps", default=25, type=int)
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
    s_idx = STYLES.index(opt.style)

    # fixed holdout angles (no noise aug -> never in the training distribution)
    poses, _ = default_360_path(
        np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_VAL,
        opt.views,
    )

    # honest zero-clip budget over the eval views and BOTH grids (SDS
    # inflates occupancy; a fixed cap could silently zero trailing rays)
    from avatarcraft_tpu.models.instant_nsr import count_fast_samples

    probe_cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND)
    _counter = jax.jit(
        lambda ro, rd, g: count_fast_samples(ro, rd, probe_cfg, g)
    )
    worst = max(
        int(_counter(*pose2rays(R, R, pose), g))
        for pose in poses
        for g in (grid_bare, grid_eval)
    )
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND,
        sample_budget=int(worst * 1.02), normal_mode=normal_mode,
    )
    print(f"[eval_style] derived budget {fast_cfg.sample_budget} "
          f"(worst probe count {worst} over {len(poses)} views x 2 grids)",
          file=sys.stderr)

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
                     "fg_frac": float(fg.mean()),
                     # guidance-independent tier: foreground hue/sat stats
                     "hue_eval": hue_stats(rgb_e, fg),
                     "hue_bare": hue_stats(rgb_b, fg)})
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

    # tier 2 summary: aggregate fg hue histogram / sat shift (independent of
    # the palette map — pure render statistics)
    agg_e = np.mean([r["hue_eval"]["hue_hist"] for r in rows], axis=0)
    agg_b = np.mean([r["hue_bare"]["hue_hist"] for r in rows], axis=0)
    cv_e = np.mean([r["hue_eval"]["chroma_vec"] for r in rows], axis=0)
    cv_b = np.mean([r["hue_bare"]["chroma_vec"] for r in rows], axis=0)
    result["fg_sat_eval"] = float(np.mean([r["hue_eval"]["mean_sat"] for r in rows]))
    result["fg_sat_bare"] = float(np.mean([r["hue_bare"]["mean_sat"] for r in rows]))
    result["fg_mean_hue_eval"] = rows[0]["hue_eval"]["mean_hue"]
    result["fg_mean_hue_bare"] = rows[0]["hue_bare"]["mean_hue"]
    # None when either render is achromatic (see circular_emd docstring);
    # chroma_shift covers that case (gray → origin of the chroma plane)
    result["hue_hist_shift_emd"] = circular_emd(agg_e, agg_b)
    result["chroma_shift"] = chroma_dist(cv_e, cv_b)

    # tier 3: distance to the guidance's own generated hue distribution
    if opt.guidance:
        g_stats, _ = guidance_txt2img_hue(
            opt.guidance, opt.style, n=opt.txt2img_n, steps=opt.txt2img_steps
        )
        result["txt2img_mean_hue"] = g_stats["mean_hue"]
        result["txt2img_hue_emd_eval"] = circular_emd(agg_e, g_stats["hue_hist"])
        result["txt2img_hue_emd_bare"] = circular_emd(agg_b, g_stats["hue_hist"])
        e = result["txt2img_hue_emd_eval"]
        b = result["txt2img_hue_emd_bare"]
        result["txt2img_hue_improvement_factor"] = (
            b / e if e and b else None
        )
        # chroma-plane version, split into the two comparable quantities:
        # DIRECTION (angle to the txt2img centroid — scale-invariant, the
        # alignment measure) and MAGNITUDE (how chromatic each render is).
        # The bare avatar has no direction (angle None) and ~zero magnitude;
        # a successful stylize run shows a small eval angle + large eval
        # magnitude. Raw Euclidean centroid distance is NOT reported: the
        # txt2img centroid is short (samples are mostly background), so it
        # penalizes an aligned-but-saturated render for its length.
        cv_t = g_stats["chroma_vec"]
        result["txt2img_chroma_vec"] = [round(float(c), 5) for c in cv_t]
        result["txt2img_chroma_mag"] = float(np.hypot(cv_t[0], cv_t[1]))
        result["chroma_mag_eval"] = float(np.hypot(cv_e[0], cv_e[1]))
        result["chroma_mag_bare"] = float(np.hypot(cv_b[0], cv_b[1]))
        result["txt2img_chroma_angle_eval_deg"] = chroma_angle_deg(cv_e, cv_t)
        result["txt2img_chroma_angle_bare_deg"] = chroma_angle_deg(cv_b, cv_t)
    if opt.out:
        with open(opt.out, "w") as fp:
            json.dump(result, fp, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
