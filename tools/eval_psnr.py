"""Offline PSNR evaluation of a reconstruction train state.

Loads an orbax train state (params + density grid) saved by
``reconstruct --sampler fast --save_state_every N`` and renders chosen
dataset views through the occupancy-guided fast path, reporting PSNR vs the
mask-composited ground truth. Runs on CPU (default, so it can evaluate WHILE
the TPU chip trains) or on the TPU.

Usage:
    python tools/eval_psnr.py --state style/canonical_360/recon_r2/state_latest \
        --views 13,62,95 --level 4 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default=None, help="orbax train-state dir")
    ap.add_argument("--ckpt", default=None,
                    help="baked .pth.tar artifact (e.g. artifacts/canonical/"
                         "bare_smpl_tpu.pth.tar) — evaluates EXACTLY what "
                         "bench.py and the render CLIs load (fp16 tables); "
                         "requires --grid_path")
    ap.add_argument("--grid_path", default=None, help="density grid .npy for --ckpt")
    ap.add_argument("--data_path", default="/root/reference/data/smpl_da_512")
    ap.add_argument("--views", default="13,62,95")
    ap.add_argument("--level", default=4, type=int, help="resolution divisor")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    ap.add_argument("--encoder", default="tpu_pyramid")
    ap.add_argument("--chunk", default=16384, type=int)
    ap.add_argument("--n_probes", default=192, type=int)
    ap.add_argument("--k_samples", default=32, type=int)
    ap.add_argument("--normal_mode", default=None,
                    choices=["fd7", "fd4", "analytic"],
                    help="default: the artifact's PROVENANCE.json normal_mode "
                         "when evaling --ckpt, else fd4")
    ap.add_argument("--white_bkg", default=True)
    ap.add_argument("--out_dir", default=None, help="save rendered PNGs here")
    ap.add_argument("--supersample", default=1, type=int,
                    help="render at Nx resolution and box-downsample: gives "
                         "the render true partial edge coverage, matching the "
                         "dataset's antialiasing")
    ap.add_argument("--gt_box", action="store_true",
                    help="at level>1, box-downsample the GT (and cover each "
                         "coarse pixel's footprint with the supersamples) "
                         "instead of point-sampling pixels")
    ap.add_argument("--band_stats", action="store_true",
                    help="also report the silhouette-band error decomposition "
                         "per view: share of total MSE inside the band "
                         "(mask-boundary dilation +- band_px, plus fractional-"
                         "coverage pixels) and the interior-only PSNR")
    ap.add_argument("--band_px", default=2, type=int)
    ap.add_argument("--gt_mode", default="composite", choices=["composite", "raw"],
                    help="composite = GT mask-composited onto the render bg; "
                         "raw = raw dataset image vs a BLACK-background "
                         "render (the dataset's own background), the fully "
                         "consistent protocol for antialiased GT edges")
    opt = ap.parse_args(argv)

    if opt.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.data import SMPLMultiviewDataset
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        init_field_params,
        render_rays_fast,
    )
    from avatarcraft_tpu.utils.checkpoint import load_checkpoint
    from avatarcraft_tpu.workloads.reconstruct import ReconstructConfig, make_optimizer

    ds = SMPLMultiviewDataset(opt.data_path)

    if opt.ckpt:
        from avatarcraft_tpu.utils.checkpoint import load_params_with_config

        if not opt.grid_path:
            ap.error("--ckpt requires --grid_path")
        params, fcfg = load_params_with_config(opt.ckpt)
        grid = jnp.asarray(np.load(opt.grid_path))
        state = {"step": -1}
        if opt.normal_mode is None:
            from avatarcraft_tpu.utils.checkpoint import artifact_normal_mode

            opt.normal_mode = artifact_normal_mode(opt.ckpt)
        print(f"loaded baked artifact {opt.ckpt} (encoder={fcfg.encoder})",
              file=sys.stderr)
    elif opt.state:
        fcfg = FieldConfig(encoder=opt.encoder)
        # build a like-tree to restore into
        params_like = jax.device_get(init_field_params(jax.random.PRNGKey(0), fcfg))
        tx = make_optimizer(ReconstructConfig(), 1000)
        like = {
            "params": params_like,
            "opt_state": jax.device_get(tx.init(params_like)),
            "grid": np.zeros((129,) * 3, np.float32),
            "step": 0,
        }
        state = load_checkpoint(opt.state, like)
        params = state["params"]
        grid = jnp.asarray(state["grid"])
        print(f"loaded step {state['step']} from {opt.state}", file=sys.stderr)
    else:
        ap.error("one of --state / --ckpt is required")

    opt.normal_mode = opt.normal_mode or "fd4"
    fast_cfg = FastRenderConfig(
        n_probes=opt.n_probes, k_samples=opt.k_samples, bound=NSR_BOUND,
        normal_mode=opt.normal_mode,
    )
    bg = 0.0 if opt.gt_mode == "raw" else (1.0 if opt.white_bkg else 0.0)
    render = jax.jit(
        lambda p, ro, rd, g: render_rays_fast(p, ro, rd, fcfg, fast_cfg, g, bg)["rgb"]
    )

    ss = max(1, opt.supersample)
    side = ds.H // opt.level
    rside = side * ss
    ys = np.round(np.linspace(0, ds.H - 1, side)).astype(int)
    xs = np.round(np.linspace(0, ds.W - 1, side)).astype(int)

    def subpixel_rays(pose, centers, span=1.0):
        """Rays at pixel centers +- subpixel offsets covering a ``span``-pixel
        footprint (proper box coverage)."""
        import jax.numpy as jnp

        offs = ((np.arange(ss) + 0.5) / ss - 0.5) * span
        coords = (centers[:, None] + offs[None, :]).reshape(-1)  # [side*ss]
        px, py = np.meshgrid(coords, coords, indexing="xy")
        K = ds.K
        p = np.stack(
            [(px - K[0, 2]) / K[0, 0], -(py - K[1, 2]) / K[1, 1],
             -np.ones_like(px)], axis=-1).astype(np.float32)
        vv = p / np.linalg.norm(p, axis=-1, keepdims=True)
        rd = vv @ pose[:3, :3].T
        ro = np.broadcast_to(pose[:3, 3], rd.shape)
        return jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3))

    results = {}
    band_stats = {}
    for v in [int(x) for x in opt.views.split(",") if x.strip()]:
        if opt.level > 1 and opt.gt_box:
            L = opt.level
            centers = np.arange(side) * L + (L - 1) / 2.0
            rays_o, rays_d = subpixel_rays(ds.poses[v], centers, span=float(L))
        else:
            rays_o, rays_d = subpixel_rays(ds.poses[v], ys.astype(np.float64))
        outs = []
        n = rays_o.shape[0]
        for i in range(0, n, opt.chunk):
            outs.append(np.asarray(render(params, rays_o[i : i + opt.chunk],
                                          rays_d[i : i + opt.chunk], grid)))
        img = np.concatenate(outs).reshape(rside, rside, 3)
        if ss > 1:  # box-downsample: true partial edge coverage
            img = img.reshape(side, ss, side, ss, 3).mean(axis=(1, 3))
        if opt.level > 1 and opt.gt_box:
            # box-downsample the GT too (consistent with the box render)
            L = opt.level
            gt_full = ds.images[v]
            gt = gt_full.reshape(side, L, side, L, 3).mean(axis=(1, 3))
            if opt.gt_mode != "raw":
                m_full = ds.masks[v][..., None]
                gt = (gt_full * m_full + (1 - m_full) * bg).reshape(
                    side, L, side, L, 3
                ).mean(axis=(1, 3))
        elif opt.gt_mode == "raw":
            gt = ds.images[v][np.ix_(ys, xs)]
        else:
            m = ds.masks[v][np.ix_(ys, xs)][..., None]
            gt = ds.images[v][np.ix_(ys, xs)] * m + (1.0 - m) * bg
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        results[v] = psnr
        print(f"view {v} @{side}x{side} (ss={ss}, {opt.gt_mode}): "
              f"PSNR {psnr:.2f} dB", file=sys.stderr)
        if opt.band_stats:
            m_full = ds.masks[v].astype(np.float32)
            if opt.level > 1 and opt.gt_box:
                mm = m_full.reshape(side, opt.level, side, opt.level).mean(
                    axis=(1, 3))
            else:
                mm = m_full[np.ix_(ys, xs)]
            mb = mm > 0.5
            b = opt.band_px
            lo, hi = mb.copy(), mb.copy()
            for dy in range(-b, b + 1):
                for dx in range(-b, b + 1):
                    if dy == 0 and dx == 0:
                        continue
                    sh = np.roll(np.roll(mb, dy, axis=0), dx, axis=1)
                    lo &= sh
                    hi |= sh
            band = (hi & ~lo) | ((mm > 0.0) & (mm < 1.0))
            se = ((img - gt) ** 2).mean(axis=-1)
            share = float(se[band].sum() / max(se.sum(), 1e-12))
            mse_int = float(se[~band].mean()) if (~band).any() else 0.0
            band_stats[v] = {
                "band_frac": float(band.mean()),
                "band_mse_share": share,
                "interior_psnr": -10.0 * np.log10(max(mse_int, 1e-12)),
            }
            print(f"  band {100 * band.mean():.1f}% of px carries "
                  f"{100 * share:.0f}% of MSE; interior "
                  f"{band_stats[v]['interior_psnr']:.2f} dB", file=sys.stderr)
        if opt.out_dir:
            import imageio.v2 as imageio

            os.makedirs(opt.out_dir, exist_ok=True)
            imageio.imwrite(
                os.path.join(opt.out_dir, f"eval_v{v}_s{state['step']}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )

    out = {
        "step": int(state["step"]),
        "level": opt.level,
        "supersample": ss,
        "gt_mode": opt.gt_mode,
        "normal_mode": opt.normal_mode,
        "psnr": results,
        "mean_psnr": sum(results.values()) / max(len(results), 1),
    }
    if band_stats:
        out["band_stats"] = band_stats
    print(json.dumps(out))


if __name__ == "__main__":
    main()
