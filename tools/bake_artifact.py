"""Bake a reconstruction train state into the repo's bench/demo artifact.

Reads an orbax train state (params + optimizer moments + density grid + step,
written by ``reconstruct --sampler fast --save_state_every N``) and writes the
artifact layout ``bench.py`` and the render CLIs consume:

    artifacts/canonical/bare_smpl_tpu.pth.tar   (fp16 encoder tables)
    artifacts/canonical/bare_smpl_tpu.pth.tar.fieldcfg.json
    artifacts/canonical/grid.npy                (129^3 density grid)
    artifacts/canonical/PROVENANCE.json         (step, source, eval numbers)

The .pth.tar is the reference-compatible torch state_dict format
(reference: reconstruct.py:143-148 saves the same suffix), so the artifact
doubles as a canonical-avatar checkpoint for stylize/render_warp.

Usage:
    python tools/bake_artifact.py --state style/canonical_360/recon_r2b/state_latest \
        [--out artifacts/canonical] [--psnr_json eval.json]
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
    ap.add_argument("--out", default="artifacts/canonical")
    ap.add_argument("--encoder", default="tpu_pyramid")
    ap.add_argument(
        "--fp16_tables", default=True,
        type=lambda s: s.strip().lower() not in ("false", "0", "no"),
    )
    ap.add_argument("--psnr_json", default=None,
                    help="eval_psnr.py JSON output to embed as provenance")
    ap.add_argument("--normal_mode", default=None,
                    help="normal estimator the field was trained/evaled with "
                         "(fd4|fd7|analytic); recorded in PROVENANCE.json and "
                         "picked up by bench.py and the render CLIs")
    opt = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from avatarcraft_tpu.models.instant_nsr import FieldConfig, init_field_params
    from avatarcraft_tpu.utils.checkpoint import (
        load_checkpoint,
        save_params_with_config,
    )
    from avatarcraft_tpu.workloads.reconstruct import ReconstructConfig, make_optimizer

    fcfg = FieldConfig(encoder=opt.encoder)
    params_like = jax.device_get(init_field_params(jax.random.PRNGKey(0), fcfg))
    tx = make_optimizer(ReconstructConfig(), 1000)
    like = {
        "params": params_like,
        "opt_state": jax.device_get(tx.init(params_like)),
        "grid": np.zeros((129,) * 3, np.float32),
        "step": 0,
    }
    state = load_checkpoint(opt.state, like)
    step = int(state["step"])
    print(f"loaded step {step} from {opt.state}", file=sys.stderr)

    os.makedirs(opt.out, exist_ok=True)
    ckpt = os.path.join(opt.out, "bare_smpl_tpu.pth.tar")
    save_params_with_config(
        state["params"], ckpt, fcfg,
        table_dtype=torch.float16 if opt.fp16_tables else None,
    )
    np.save(os.path.join(opt.out, "grid.npy"), np.asarray(state["grid"], np.float32))

    prov = {"source_state": opt.state, "step": step, "encoder": opt.encoder,
            "fp16_tables": bool(opt.fp16_tables)}
    if opt.normal_mode:
        prov["normal_mode"] = opt.normal_mode
    if opt.psnr_json and os.path.exists(opt.psnr_json):
        with open(opt.psnr_json) as f:
            prov["eval"] = json.load(f)
    with open(os.path.join(opt.out, "PROVENANCE.json"), "w") as f:
        json.dump(prov, f, indent=2)
    sizes = {p: os.path.getsize(os.path.join(opt.out, p))
             for p in os.listdir(opt.out)}
    print(json.dumps({"out": opt.out, "step": step, "bytes": sizes}))


if __name__ == "__main__":
    main()
