"""CLI: pretrain the canonical bare-SMPL NeuS (reference: reconstruct.py).

Usage parity:
    python reconstruct.py --data_format neus --data_path data/smpl_da_512 \
        --exp_name recon --epochs 2 ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from avatarcraft_tpu.cli import options
from avatarcraft_tpu.constants import NSR_BOUND


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    options.set_general_option(parser)
    options.set_nerf_option(parser)
    options.set_pe_option(parser)
    options.set_render_option(parser)
    options.set_trajectory_option(parser)
    parser.add_argument("--data_format", default="neus", choices=["neuman", "neus"])
    parser.add_argument("--data_path", default="data/smpl_da_512", type=str)
    parser.add_argument("--implicit_model", default="instant_nsr", choices=["neus", "instant_nsr"])
    parser.add_argument("--exp_name", type=str, default="recon")
    parser.add_argument("--epochs", default=2, type=int)
    parser.add_argument("--lr", default=5e-4, type=float)
    parser.add_argument("--batch_size", default=1600, type=int)
    parser.add_argument("--i_val", default=2000, type=int)
    parser.add_argument("--i_save", default=2000, type=int)
    parser.add_argument("--i_mesh", default=10000, type=int)
    parser.add_argument("--mesh_resolution", default=512, type=int)
    parser.add_argument("--out_dir", default="./style/canonical_360", type=str)
    parser.add_argument("--max_steps", default=None, type=int)
    parser.add_argument(
        "--sampler", default="parity", choices=["parity", "fast"],
        help="parity = reference 64+64 importance pipeline; fast = occupancy-"
             "guided K-sample training (TPU-native, far smaller compiled program)",
    )
    parser.add_argument(
        "--encoder", default=None, choices=["hashgrid", "tpu_pyramid"],
        help="spatial encoder (default: hashgrid for parity, tpu_pyramid for fast)",
    )
    parser.add_argument("--resume_from", default=None, type=str,
                        help="orbax train-state dir (params + optimizer moments)")
    parser.add_argument("--holdout_views", default="", type=str,
                        help="comma-separated view indices excluded from "
                             "training (kept for honest PSNR evaluation)")
    parser.add_argument("--save_state_every", default=0, type=int,
                        help="write resumable orbax train state every N steps "
                             "(fast sampler only)")
    parser.add_argument("--n_probes", default=128, type=int,
                        help="occupancy probes per ray (fast sampler)")
    parser.add_argument("--k_samples", default=32, type=int,
                        help="field samples per ray (fast sampler)")
    parser.add_argument("--sample_budget", default=0, type=int,
                        help="global field-sample budget per batch (adaptive "
                             "K compaction; 0 = off)")
    parser.add_argument("--scan_steps", default=0, type=int,
                        help="optimizer steps per jit call (lax.scan over "
                             "on-device batches); 0 = one step per call. "
                             "Pick a divisor of the grid refresh interval.")
    parser.add_argument("--grid_warmup_steps", default=2000, type=int,
                        help="steps with a saturated grid before the first "
                             "real occupancy refresh (fast sampler)")
    parser.add_argument("--normal_mode", default=None,
                        choices=["fd7", "fd4", "analytic"],
                        help="normal estimator (default: fd7 for parity, fd4 "
                             "for fast). 'analytic' (exact piecewise-trilinear "
                             "jvp) is a RENDER-TIME option only: its cell-slope "
                             "|grad| noise feeds the eikonal loss and destroys "
                             "a converged field (measured PSNR 31->1 dB in 1k "
                             "steps; tools/finetune_color.py). Training with "
                             "it is rejected.")
    parser.add_argument(
        "--bkg_mode", default="raw",
        choices=["raw", "composite", "composite_random"],
        help="GT background handling: raw = reference parity (stored images "
             "vs renders on the white_bkg color); composite = mask-composite "
             "GT onto the training bg; composite_random = random gray bg per "
             "step (forces clean empty space)")
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    options.apply_platform(opt)
    options.print_opt(opt, os.path.join(opt.out_dir, opt.exp_name))

    import imageio.v2 as imageio
    import jax

    from avatarcraft_tpu.data import SMPLMultiviewDataset
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        RenderConfig,
        extract_geometry,
        render_rays_chunked,
    )
    from avatarcraft_tpu.utils.checkpoint import save_params_with_config
    from avatarcraft_tpu.utils.mesh_export import save_ply
    from avatarcraft_tpu.utils.metrics import integerify_img
    from avatarcraft_tpu.workloads.reconstruct import (
        ReconstructConfig,
        train,
        train_fast,
    )

    if opt.data_format == "neuman":
        raise NotImplementedError("neuman data format is dead in the reference too")
    if opt.normal_mode == "analytic":
        # reconstruction always trains with a nonzero eikonal weight (0.1,
        # reference: reconstruct.py:105-106); the analytic normal's exact
        # cell-slope |grad| is the wrong signal for that loss and crushes the
        # tables (measured PSNR 31->1 dB in 1k steps). Render-time use is
        # fine: pass --normal_mode analytic to the render CLIs instead.
        raise SystemExit(
            "--normal_mode analytic is a render-time option; training under "
            "the analytic eikonal destroys the field. Use fd7/fd4 for "
            "training and 'analytic' only in render/eval CLIs."
        )

    ds = SMPLMultiviewDataset(opt.data_path)
    encoder = opt.encoder or ("tpu_pyramid" if opt.sampler == "fast" else "hashgrid")
    fcfg = FieldConfig(encoder=encoder)
    rcfg = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND, perturb=True,
                        normal_mode=opt.normal_mode or "fd7")
    rcfg_val = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND, perturb=False)
    cfg = ReconstructConfig(
        batch_size=opt.batch_size,
        lr=opt.lr,
        epochs=opt.epochs,
        white_bkg=opt.white_bkg,
        bkg_mode=opt.bkg_mode,
    )

    exp_dir = os.path.join(opt.out_dir, opt.exp_name)
    os.makedirs(exp_dir, exist_ok=True)

    if opt.sampler == "fast":
        import jax.numpy as jnp

        _fast_val_cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND)

        from avatarcraft_tpu.models.instant_nsr import render_rays_fast

        # grid is the LIVE training grid: with a saturated grid the top-K
        # nearest probes never reach the subject, so a real grid is essential
        _val_fast = jax.jit(
            lambda p, ro, rd, grid: render_rays_fast(
                p, ro, rd, fcfg, _fast_val_cfg, grid,
                1.0 if opt.white_bkg else 0.0,
            )["rgb"]
        )

        def val_render(p, ro, rd, k, grid=None):
            if grid is None:
                grid = jnp.full((129,) * 3, 100.0, jnp.float32)
            return _val_fast(p, ro, rd, grid)
    else:
        _val_parity = jax.jit(
            lambda p, ro, rd, k: render_rays_chunked(
                p, ro, rd, k, fcfg, rcfg_val, 1.0 if opt.white_bkg else 0.0, chunk=8192
            )["rgb"]
        )

        def val_render(p, ro, rd, k, grid=None):
            return _val_parity(p, ro, rd, k)

    val_level = 4  # 128² val render: one compiled shape, no OOM risk
    vh, vw = ds.H // val_level, ds.W // val_level

    def log_val(step, params, grid=None):
        rays_o, rays_d = ds.gen_rays_at(62, resolution_level=val_level)
        rgb = val_render(params, rays_o, rays_d, jax.random.PRNGKey(0), grid)
        img = np.asarray(rgb).reshape(vh, vw, 3)
        ys = np.round(np.linspace(0, ds.H - 1, vh)).astype(int)
        xs = np.round(np.linspace(0, ds.W - 1, vw)).astype(int)
        bgv = 1.0 if opt.white_bkg else 0.0
        m = ds.masks[62][np.ix_(ys, xs)][..., None]
        gt = ds.images[62][np.ix_(ys, xs)] * m + (1.0 - m) * bgv
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-10))
        path = os.path.join(exp_dir, f"{opt.exp_name}_{step + 1:04d}.png")
        imageio.imwrite(path, integerify_img(img))
        print(f"val view 62 @{vh}x{vw}: PSNR {psnr:.2f} dB | saved {path}")

    def on_step(step, params, loss, grid=None):
        if step % 200 == 0:
            print(f"step {step}: loss {float(loss):.5f}")
        if (step + 1) % opt.i_val == 0:
            log_val(step, params, grid)
        if (step + 1) % opt.i_save == 0:
            path = os.path.join(exp_dir, f"{opt.exp_name}_{step + 1:04d}.pth.tar")
            save_params_with_config(jax.device_get(params), path, fcfg)
            print(f"weights saved: {path}")
        if (step + 1) % opt.i_mesh == 0:
            verts, faces = extract_geometry(params, fcfg, NSR_BOUND, opt.mesh_resolution)
            path = os.path.join(exp_dir, f"{opt.exp_name}_{step + 1:04d}.ply")
            save_ply(verts, faces, path)
            print(f"mesh saved: {path}")

    if opt.sampler == "fast":
        holdout = [int(v) for v in opt.holdout_views.split(",") if v.strip()]
        view_ids = None
        if holdout:
            view_ids = np.array(
                [v for v in range(ds.n_images) if v not in set(holdout)], np.int32
            )
            print(f"holding out views {holdout} ({len(view_ids)} train views)")
        fast_cfg = FastRenderConfig(
            n_probes=opt.n_probes, k_samples=opt.k_samples, bound=NSR_BOUND,
            sample_budget=opt.sample_budget,
            normal_mode=opt.normal_mode or "fd4",
        )
        params, grid, stats = train_fast(
            ds, fcfg, fast_cfg, cfg,
            max_steps=opt.max_steps, callbacks={"on_step": on_step},
            view_ids=view_ids, state_dir=exp_dir,
            save_state_every=opt.save_state_every, resume_from=opt.resume_from,
            grid_warmup_steps=opt.grid_warmup_steps, scan_steps=opt.scan_steps,
        )
        np.save(os.path.join(exp_dir, f"{opt.exp_name}_grid.npy"),
                np.asarray(jax.device_get(grid)))
    else:
        params, stats = train(
            ds, fcfg, rcfg, cfg, max_steps=opt.max_steps,
            callbacks={"on_step": on_step}, resume_from=opt.resume_from,
        )

    final = os.path.join(exp_dir, f"{opt.exp_name}_final.pth.tar")
    save_params_with_config(jax.device_get(params), final, fcfg)
    print(f"weights saved: {final}")
    print(
        f"done: {stats['steps']} steps, {stats.get('steps_per_sec', 0):.2f} steps/s, "
        f"{stats.get('rays_per_sec', 0):.0f} rays/s"
    )
    return params, stats


if __name__ == "__main__":
    main()
