"""Constructive verification of the native-512 saturation claim
(VERDICT r4 Next #9 / docs/PERFORMANCE.md "where the native-512 protocol
saturates").

Claim under test: the residual native-512 PSNR gap lives in the ~3%
silhouette band because the dataset's GT renders composite edges with
*geometric coverage* (a mesh rasterizer's fractional pixel coverage of an
opaque surface), which a black-composited volumetric render (pixel value
w·c, w the ray's transmittance-weighted opacity) cannot reproduce exactly —
even for the SAME geometry.

Construction: take the committed field as the only geometry in play.
  * synthetic "mesh-like GT": render a view at ss·512 per side with HARD
    coverage — each subsample is surface color where w > 0.5 else
    background — then box-downsample; edges become coverage blends, exactly
    the dataset renderer's compositing model;
  * eval render: the standard protocol's soft render (w·c, black bg, ss=2).
Identical geometry, identical field, only the compositing differs. If the
claim is right, PSNR(eval render vs synthetic GT) shows the SAME error
signature as against the real dataset GT: interior ≈ lossless, nearly all
MSE inside the few-% silhouette band, overall PSNR around the observed
~32 dB plateau.

    python tools/synth_gt_band_check.py [--view 13] [--ss 4] [--out docs/eval/synth_band_view13.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="artifacts/canonical/bare_smpl_tpu.pth.tar")
    ap.add_argument("--grid_path", default="artifacts/canonical/grid.npy")
    ap.add_argument("--data_path", default="/root/reference/data/smpl_da_512")
    ap.add_argument("--view", default=13, type=int)
    ap.add_argument("--side", default=512, type=int)
    ap.add_argument("--ss_gt", default=4, type=int, help="GT supersampling")
    ap.add_argument("--ss_eval", default=2, type=int, help="eval-protocol ss")
    ap.add_argument("--band_px", default=2, type=int)
    ap.add_argument("--chunk", default=65536, type=int)
    ap.add_argument("--out", default="docs/eval/synth_band_view13.json")
    opt = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.data import SMPLMultiviewDataset
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        render_rays_fast,
    )
    from avatarcraft_tpu.utils.checkpoint import (
        artifact_normal_mode,
        load_params_with_config,
    )

    params, fcfg = load_params_with_config(opt.ckpt)
    grid = jnp.asarray(np.load(opt.grid_path))
    ds = SMPLMultiviewDataset(opt.data_path)
    pose = ds.poses[opt.view]
    try:
        nm = artifact_normal_mode(opt.ckpt)
    except Exception:
        nm = "fd4"
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND, normal_mode=nm or "fd4"
    )

    render = jax.jit(
        lambda p, ro, rd, g: (
            lambda o: (o["rgb"], o["weight_sum"])
        )(render_rays_fast(p, ro, rd, fcfg, fast_cfg, g, 0.0))
    )

    def rays_at(ss):
        """Subpixel rays covering every output pixel with an ss x ss box."""
        side = opt.side
        offs = ((np.arange(ss) + 0.5) / ss - 0.5)
        centers = np.round(np.linspace(0, ds.H - 1, side)).astype(float)
        coords = (centers[:, None] + offs[None, :]).reshape(-1)
        px, py = np.meshgrid(coords, coords, indexing="xy")
        K = ds.K
        p = np.stack(
            [(px - K[0, 2]) / K[0, 0], -(py - K[1, 2]) / K[1, 1],
             -np.ones_like(px)], axis=-1).astype(np.float32)
        vv = p / np.linalg.norm(p, axis=-1, keepdims=True)
        rd = vv @ pose[:3, :3].T
        ro = np.broadcast_to(pose[:3, 3], rd.shape)
        return ro.reshape(-1, 3).astype(np.float32), rd.reshape(-1, 3).astype(np.float32)

    def render_all(ro, rd):
        rgbs, ws = [], []
        n = ro.shape[0]
        for i in range(0, n, opt.chunk):
            r, w = render(params, jnp.asarray(ro[i:i + opt.chunk]),
                          jnp.asarray(rd[i:i + opt.chunk]), grid)
            rgbs.append(np.asarray(r))
            ws.append(np.asarray(w))
        return np.concatenate(rgbs), np.concatenate(ws)

    side = opt.side

    # --- synthetic mesh-like GT: hard coverage at ss_gt, box-downsampled ----
    ro, rd = rays_at(opt.ss_gt)
    rgb, w = render_all(ro, rd)
    covered = w > 0.5
    # surface color of the covered subsamples (un-premultiplied), bg black
    surf = np.where(covered[:, None], rgb / np.maximum(w[:, None], 1e-6), 0.0)
    s = opt.ss_gt
    gt = surf.reshape(side, s, side, s, 3).mean(axis=(1, 3))
    gt_cov = covered.reshape(side, s, side, s).mean(axis=(1, 3))

    # --- eval-protocol render: soft w*c, ss_eval box ------------------------
    ro, rd = rays_at(opt.ss_eval)
    rgb_e, w_e = render_all(ro, rd)
    s = opt.ss_eval
    img = rgb_e.reshape(side, s, side, s, 3).mean(axis=(1, 3))

    se = ((img - gt) ** 2).mean(axis=-1)
    mse = float(se.mean())
    psnr = float(-10 * np.log10(max(mse, 1e-12)))

    # silhouette band: fractional-coverage pixels +- band_px dilation
    from scipy.ndimage import binary_dilation

    frac = (gt_cov > 0.0) & (gt_cov < 1.0)
    band = binary_dilation(frac, iterations=opt.band_px)
    share = float(se[band].sum() / max(se.sum(), 1e-12))
    interior_mse = float(se[~band].mean()) if (~band).any() else 0.0
    out = {
        "view": opt.view,
        "side": side,
        "ss_gt_hard": opt.ss_gt,
        "ss_eval_soft": opt.ss_eval,
        "psnr_vs_synthetic_gt": round(psnr, 3),
        "band_frac_of_pixels": round(float(band.mean()), 5),
        "band_mse_share": round(share, 5),
        "interior_psnr": round(float(-10 * np.log10(max(interior_mse, 1e-12))), 3),
        "observed_against_real_gt": {
            "psnr": 33.46, "note": "ftedge native-512 view 13 (ss=2, raw GT)",
        },
    }
    os.makedirs(os.path.dirname(opt.out), exist_ok=True)
    with open(opt.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
