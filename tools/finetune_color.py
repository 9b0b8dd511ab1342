"""Color-net-only fine-tune to adapt a trained field to a different normal
estimator (e.g. fd4 -> analytic).

The color MLP conditions on the normal (reference: models/instant_nsr.py
:644-663 feeds [x, normal, geo_feat]); a field trained with FD4 normals
loses ~1 dB when rendered with analytic normals. Re-fitting ONLY the color
net (SDF MLP, encoder tables, variance all frozen via optax.masked; eikonal
weight 0) closes the gap with zero risk to the geometry: the analytic
eikonal term is a different regularization regime (the exact cell slope of
the trilinear field is noisy where FD's ~3-cell stencil smooths) and a
naive full fine-tune under it was measured to destroy the field.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/finetune_color.py \
        --state style/.../state_final --out style/.../state_color_ana \
        [--normal_mode analytic] [--steps 800]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default=None, help="orbax train-state dir")
    ap.add_argument("--ckpt", default=None,
                    help="alternative source: a baked reference-format "
                         ".pth.tar (e.g. the committed artifact) + --grid_path")
    ap.add_argument("--grid_path", default="artifacts/canonical/grid.npy")
    ap.add_argument("--out", required=True, help="output orbax state dir")
    ap.add_argument("--data_path", default="/root/reference/data/smpl_da_512")
    ap.add_argument("--holdout_views", default="13,62,95")
    ap.add_argument("--normal_mode", default="analytic")
    ap.add_argument("--steps", default=800, type=int)
    ap.add_argument("--batch", default=4096, type=int)
    ap.add_argument("--lr", default=5e-4, type=float)
    ap.add_argument("--encoder", default="tpu_pyramid")
    opt = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

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
        make_batch_ray_fn,
        make_optimizer,
        make_train_step_fast,
    )

    ds = SMPLMultiviewDataset(opt.data_path)
    if opt.ckpt:
        from avatarcraft_tpu.utils.checkpoint import load_params_with_config

        params, fcfg = load_params_with_config(opt.ckpt)
        params = jax.device_get(params)
        grid = jnp.asarray(np.load(opt.grid_path))
        tx_like = make_optimizer(ReconstructConfig(), 1000)
        state = {
            "params": params,
            "opt_state": jax.device_get(tx_like.init(params)),
            "step": 0,
        }
        print(f"loaded baked artifact {opt.ckpt} (encoder={fcfg.encoder})",
              file=sys.stderr)
    elif opt.state:
        fcfg = FieldConfig(encoder=opt.encoder)
        params_like = jax.device_get(init_field_params(jax.random.PRNGKey(0), fcfg))
        tx_like = make_optimizer(ReconstructConfig(), 1000)
        like = {
            "params": params_like,
            "opt_state": jax.device_get(tx_like.init(params_like)),
            "grid": np.zeros((129,) * 3, np.float32),
            "step": 0,
        }
        state = load_checkpoint(opt.state, like)
        params, grid = state["params"], jnp.asarray(state["grid"])
        print(f"loaded step {state['step']} from {opt.state}", file=sys.stderr)
    else:
        ap.error("one of --state / --ckpt is required")

    # train ONLY the color subtree. NOT optax.masked: masked applies the inner
    # transform to masked leaves but passes the RAW GRADIENT through as the
    # update for unmasked ones — apply_updates would then do params += grad on
    # the frozen subtrees (unscaled ascent), which destroys the field.
    labels = {k: ("train" if k == "color" else "freeze") for k in params}
    tx = optax.multi_transform(
        {"train": optax.adam(opt.lr, eps=1e-15), "freeze": optax.set_to_zero()},
        labels,
    )
    opt_state = tx.init(params)

    fast_cfg = FastRenderConfig(
        n_probes=128, k_samples=32, bound=NSR_BOUND, normal_mode=opt.normal_mode
    )
    ray_fn = make_batch_ray_fn(ds.K, ds.H, ds.W)
    step_fn = make_train_step_fast(fcfg, fast_cfg, tx, ray_fn, 0.0, 0.0)

    holdout = {int(v) for v in opt.holdout_views.split(",") if v.strip()}
    train_views = np.asarray(
        [v for v in range(ds.n_images) if v not in holdout], np.int32
    )
    poses = jnp.asarray(ds.poses)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    t0 = None
    for step in range(opt.steps):
        vi = train_views[rng.integers(0, len(train_views), opt.batch)]
        pi = rng.integers(0, ds.H * ds.W, opt.batch).astype(np.int32)
        gt = jnp.asarray(ds.gather_rgb(vi, pi))  # raw GT, black bg
        key, sub = jax.random.split(key)
        params, opt_state, loss, _ = step_fn(
            params, opt_state, poses, jnp.asarray(vi), jnp.asarray(pi), gt,
            grid, sub, jnp.float32(0.0),
        )
        if step == 0:
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
        if step % 100 == 0:
            print(f"step {step}: loss {float(loss):.5f}", file=sys.stderr)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0 if t0 else 0.0
    print(f"{opt.steps} steps in {dt:.1f}s ({(opt.steps - 1) / max(dt, 1e-9):.2f} steps/s)",
          file=sys.stderr)

    out_state = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(state["opt_state"]),  # original moments
        "grid": np.asarray(grid),
        "step": int(state["step"]) + opt.steps,
    }
    save_checkpoint(os.path.abspath(opt.out), out_state)
    print(f"saved {opt.out}")


if __name__ == "__main__":
    main()
