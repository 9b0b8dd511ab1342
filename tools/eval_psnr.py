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
    ap.add_argument("--state", required=True, help="orbax train-state dir")
    ap.add_argument("--data_path", default="/root/reference/data/smpl_da_512")
    ap.add_argument("--views", default="13,62,95")
    ap.add_argument("--level", default=4, type=int, help="resolution divisor")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    ap.add_argument("--encoder", default="tpu_pyramid")
    ap.add_argument("--chunk", default=16384, type=int)
    ap.add_argument("--n_probes", default=192, type=int)
    ap.add_argument("--k_samples", default=32, type=int)
    ap.add_argument("--white_bkg", default=True)
    ap.add_argument("--out_dir", default=None, help="save rendered PNGs here")
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

    fast_cfg = FastRenderConfig(
        n_probes=opt.n_probes, k_samples=opt.k_samples, bound=NSR_BOUND
    )
    bg = 1.0 if opt.white_bkg else 0.0
    render = jax.jit(
        lambda p, ro, rd, g: render_rays_fast(p, ro, rd, fcfg, fast_cfg, g, bg)["rgb"]
    )

    side = ds.H // opt.level
    ys = np.round(np.linspace(0, ds.H - 1, side)).astype(int)
    xs = np.round(np.linspace(0, ds.W - 1, side)).astype(int)

    results = {}
    for v in [int(x) for x in opt.views.split(",") if x.strip()]:
        rays_o, rays_d = ds.gen_rays_at(v, resolution_level=opt.level)
        outs = []
        n = rays_o.shape[0]
        for i in range(0, n, opt.chunk):
            outs.append(np.asarray(render(params, rays_o[i : i + opt.chunk],
                                          rays_d[i : i + opt.chunk], grid)))
        img = np.concatenate(outs).reshape(side, side, 3)
        m = ds.masks[v][np.ix_(ys, xs)][..., None]
        gt = ds.images[v][np.ix_(ys, xs)] * m + (1.0 - m) * bg
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        results[v] = psnr
        print(f"view {v} @{side}x{side}: PSNR {psnr:.2f} dB", file=sys.stderr)
        if opt.out_dir:
            import imageio.v2 as imageio

            os.makedirs(opt.out_dir, exist_ok=True)
            imageio.imwrite(
                os.path.join(opt.out_dir, f"eval_v{v}_s{state['step']}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )

    print(json.dumps({
        "step": int(state["step"]),
        "level": opt.level,
        "psnr": results,
        "mean_psnr": sum(results.values()) / max(len(results), 1),
    }))


if __name__ == "__main__":
    main()
