"""Supersampled-coverage fine-tune: close the native-512 PSNR gap.

The converged artifact measures ~35.8 dB under the 128-square box protocol
but ~31.5 dB at native 512-square, and the decomposition shows ~92% of the
native-res MSE in the ~3.5% silhouette band (docs/PERFORMANCE.md): the
dataset's GT edges are antialiased (partial coverage), while a 1-ray-per-
pixel render is a point sample. This fine-tune renders ss^2 box sub-rays
per training pixel and box-filters them BEFORE the photometric loss
(workloads.reconstruct.make_batch_ray_fn_ss + make_train_scan_fast(ss=..)),
against the RAW dataset GT on the dataset's own black background — the
fully consistent protocol — so the field learns true partial edge coverage.

Usage:
    python tools/finetune_ss.py --state <orbax dir> --out <orbax dir> \
        [--ss 2] [--steps 3000]
    python tools/bake_artifact.py --state <out> ... ; tools/eval_psnr.py --level 1
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
    ap.add_argument("--state", default=None, help="orbax train-state dir to start from")
    ap.add_argument("--ckpt", default=None,
                    help="alternative start: baked .pth.tar artifact "
                         "(params via the fieldcfg sidecar; fresh opt state)")
    ap.add_argument("--grid_path", default=None,
                    help="density grid .npy for --ckpt (e.g. "
                         "artifacts/canonical/grid.npy)")
    ap.add_argument("--out", required=True, help="output orbax state dir")
    ap.add_argument("--data_path", default="/root/reference/data/smpl_da_512")
    ap.add_argument("--holdout_views", default="13,62,95")
    ap.add_argument("--normal_mode", default="fd4")
    ap.add_argument("--ss", default=2, type=int)
    ap.add_argument("--steps", default=3000, type=int)
    ap.add_argument("--scan", default=25, type=int)
    ap.add_argument("--batch", default=2048, type=int, help="PIXELS per step")
    ap.add_argument("--lr", default=1e-4, type=float)
    ap.add_argument("--eikonal", default=0.1, type=float)
    ap.add_argument("--grid_refresh", default=1000, type=int)
    ap.add_argument("--encoder", default="tpu_pyramid")
    ap.add_argument("--edge_frac", default=0.0, type=float,
                    help="fraction of each batch importance-sampled from the "
                         "silhouette band (mask-boundary dilation), where "
                         "~92%% of the native-res MSE lives "
                         "(docs/PERFORMANCE.md); rest uniform")
    ap.add_argument("--edge_band", default=3, type=int,
                    help="half-width in pixels of the silhouette band")
    ap.add_argument("--save_every", default=0, type=int,
                    help="also save to <out>_latest every N steps (crash "
                         "insurance; the TPU relay can stall mid-run)")
    opt = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.data import SMPLMultiviewDataset
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        init_field_params,
    )
    from avatarcraft_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from avatarcraft_tpu.workloads.reconstruct import (
        ReconstructConfig,
        make_batch_ray_fn_ss,
        make_grid_update_fn,
        make_optimizer,
        make_train_scan_fast,
    )

    ds = SMPLMultiviewDataset(opt.data_path)
    tx = make_optimizer(ReconstructConfig(lr=opt.lr, epochs=1), opt.steps)
    if opt.ckpt is not None:
        from avatarcraft_tpu.utils.checkpoint import load_params_with_config

        if opt.grid_path is None:
            raise SystemExit("--ckpt requires --grid_path")
        params, fcfg = load_params_with_config(opt.ckpt)
        grid = jnp.asarray(np.load(opt.grid_path))
        start_step = 0
        print(f"loaded baked artifact {opt.ckpt} (encoder={fcfg.encoder})",
              file=sys.stderr)
    else:
        fcfg = FieldConfig(encoder=opt.encoder)
        with jax.default_device(jax.devices("cpu")[0]):
            params_like = jax.device_get(init_field_params(jax.random.PRNGKey(0), fcfg))
        like = {
            "params": params_like,
            "opt_state": jax.device_get(tx.init(params_like)),
            "grid": np.zeros((129,) * 3, np.float32),
            "step": 0,
        }
        state = load_checkpoint(opt.state, like)
        params, grid = state["params"], jnp.asarray(state["grid"])
        start_step = int(state["step"])
        print(f"loaded step {start_step} from {opt.state}", file=sys.stderr)
    opt_state = tx.init(params)

    ss2 = opt.ss * opt.ss
    fast_cfg = FastRenderConfig(
        n_probes=128, k_samples=32, bound=NSR_BOUND,
        normal_mode=opt.normal_mode,
        sample_budget=opt.batch * ss2 * 8,
    )
    ray_fn = make_batch_ray_fn_ss(ds.K, ds.H, ds.W, opt.ss)
    # raw protocol: render on the dataset's own black background
    scan_fn = make_train_scan_fast(
        fcfg, fast_cfg, tx, ray_fn, opt.eikonal, "raw", False, ss=opt.ss
    )
    refresh = make_grid_update_fn(fcfg, NSR_BOUND)

    holdout = {int(v) for v in opt.holdout_views.split(",") if v.strip()}
    train_views = np.asarray(
        [v for v in range(ds.n_images) if v not in holdout], np.int32
    )
    poses = jnp.asarray(ds.poses)
    images_flat = jnp.asarray(ds.images.reshape(ds.n_images, -1, 3))
    masks_flat = jnp.asarray(ds.masks.reshape(ds.n_images, -1).astype(np.float32))

    # Silhouette-band pixel lists (host-side, per view): the band is the
    # set of pixels within --edge_band of the mask boundary, found by
    # comparing the mask to its min/max over a (2b+1)^2 shift window.
    edge_lists = None
    if opt.edge_frac > 0:
        b = opt.edge_band
        m = ds.masks.astype(bool)  # [V, H, W]
        lo, hi = m.copy(), m.copy()
        for dy in range(-b, b + 1):
            for dx in range(-b, b + 1):
                if dy == 0 and dx == 0:
                    continue
                sh = np.roll(np.roll(m, dy, axis=1), dx, axis=2)
                lo &= sh
                hi |= sh
        band = hi & ~lo  # dilation minus erosion: the boundary band
        per_view = [np.flatnonzero(band[v].reshape(-1)).astype(np.int32)
                    for v in range(ds.n_images)]
        edge_len = np.asarray([len(e) for e in per_view], np.int64)
        edge_mat = np.zeros((ds.n_images, int(edge_len.max())), np.int32)
        for v, e in enumerate(per_view):
            edge_mat[v, : len(e)] = e
        edge_lists = (edge_mat, edge_len)
        print(f"silhouette band: mean {edge_len.mean():.0f} px/view "
              f"({100 * edge_len.mean() / (ds.H * ds.W):.1f}%)", file=sys.stderr)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    B, S = opt.batch, opt.scan
    B_edge = int(round(B * opt.edge_frac))
    n_calls = (opt.steps + S - 1) // S
    t0 = None
    done = 0
    for c in range(n_calls):
        vis = train_views[rng.integers(0, len(train_views), (S, B))].astype(np.int32)
        pis = rng.integers(0, ds.H * ds.W, (S, B)).astype(np.int32)
        if B_edge:
            edge_mat, edge_len = edge_lists
            vi = vis[:, :B_edge].astype(np.int64)
            r = rng.integers(0, 1 << 62, (S, B_edge)) % edge_len[vi]
            pis[:, :B_edge] = edge_mat[vi, r]
        key, sub = jax.random.split(key)
        params, opt_state, losses = scan_fn(
            params, opt_state, poses, images_flat, masks_flat,
            jnp.asarray(vis), jnp.asarray(pis), grid, sub,
        )
        done += S
        if c == 0:
            jax.block_until_ready(losses)
            t0 = time.perf_counter()
        if c % 5 == 0 or c == n_calls - 1:
            lo = np.asarray(losses)
            rate = (done - S) / max(time.perf_counter() - (t0 or 0), 1e-9)
            print(f"step {done}: loss {lo[-5:].mean():.5f} ({rate:.1f} steps/s)",
                  file=sys.stderr)
        if opt.grid_refresh and done % opt.grid_refresh < S:
            grid = refresh(params, grid)
        if opt.save_every and done % opt.save_every < S and done < opt.steps:
            save_checkpoint(opt.out + "_latest", {
                "params": jax.device_get(params),
                "opt_state": jax.device_get(opt_state),
                "grid": np.asarray(jax.device_get(grid)),
                "step": start_step + done,
            })
            print(f"saved {opt.out}_latest at step {done}", file=sys.stderr)

    save_checkpoint(opt.out, {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "grid": np.asarray(jax.device_get(grid)),
        "step": start_step + opt.steps,
    })
    print(json.dumps({"out": opt.out, "steps": opt.steps, "ss": opt.ss,
                      "final_loss": float(np.asarray(losses)[-5:].mean())}))


if __name__ == "__main__":
    main()
