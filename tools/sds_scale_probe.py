"""SDS memory/step-time probe at the reference's real sizes (VERDICT r1 #3).

Builds the FULL SD-1.5 architecture with random weights (no checkpoint
needed; identical shapes/compute to converted weights), then drives one
stylize step at the reference's fine-stage load (reference: stylize.py:98-199):

  * phase A: full 256^2 frame render (fast sampler),
  * SDS image gradient: resize 512^2 -> VAE encode (grad) -> UNet eps x2 (CFG)
    -> clamped latent gradient pulled back through the encoder,
  * phase B: 16 patches x 4096 rays with VJP injection + opacity/eikonal.

Reports per-phase wall time and device memory stats where the runtime
exposes them. Run on the real chip:  python tools/sds_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mem_stats():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        if s:
            return {
                k: round(v / 2**30, 3)
                for k, v in s.items()
                if "bytes" in k and isinstance(v, (int, float))
            }
    except Exception:
        pass
    return {}


def main(steps: int = 2, H: int = 256, W: int = 256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.models.diffusion import GuidanceModules, SDSGuidance
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        init_field_params,
    )
    from avatarcraft_tpu.models.sd import (
        CLIPTextConfig,
        UNetConfig,
        VAEConfig,
        clip_text_apply,
        init_clip_text_params,
        init_unet_params,
        init_vae_encoder_params,
        unet_apply,
        vae_encode_apply,
    )
    from avatarcraft_tpu.workloads.stylize import StylizeConfig, StylizeTrainer

    report = {"H": H, "W": W}

    t0 = time.perf_counter()
    ucfg, vcfg, tcfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
    key = jax.random.PRNGKey(0)
    unet_params = init_unet_params(key, ucfg)
    vae_params = init_vae_encoder_params(jax.random.fold_in(key, 1), vcfg)
    clip_params = init_clip_text_params(jax.random.fold_in(key, 2), tcfg)
    n_unet = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(unet_params))
    report["unet_params_M"] = round(float(n_unet) / 1e6, 1)
    report["init_s"] = round(time.perf_counter() - t0, 1)
    print(f"[probe] SD init: {report['unet_params_M']}M UNet params, "
          f"{report['init_s']}s", file=sys.stderr)

    def text_encode(prompts):
        # random-but-valid token ids (tokenizer assets are user-supplied)
        ids = jnp.asarray(
            [[(abs(hash(p + str(i))) % (tcfg.vocab_size - 2)) for i in range(tcfg.max_len)]
             for p in prompts], jnp.int32)
        return clip_text_apply(clip_params, tcfg, ids)

    mods = GuidanceModules(
        unet=lambda l, t, c: unet_apply(unet_params, ucfg, l, t, c),
        vae_encode=lambda im: vae_encode_apply(vae_params, vcfg, im),
        text_encode=text_encode,
        latent_scale=8,
        image_size=512,
    )
    guidance = SDSGuidance(mods)

    fcfg = FieldConfig(encoder="tpu_pyramid", mlp_dtype="bfloat16")
    params = init_field_params(jax.random.fold_in(key, 3), fcfg)
    params_gt = jax.tree_util.tree_map(lambda x: x.copy(), params)

    cfg = StylizeConfig(
        tgt_text="probe", coarse_epochs=0, fine_epochs=1, n_cap=8,
        H=H, W=W, subsample_scale=4, batch_size=4096,
        sampler="fast", grid_update_every=0,
    )
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND,
        sample_budget=H * W * 12,
    )
    trainer = StylizeTrainer(
        cfg, fcfg, guidance, params, params_gt,
        grid=jnp.full((129,) * 3, 100.0), fast_cfg=fast_cfg,
    )

    report["mem_after_init_GiB"] = mem_stats()

    times = []
    for s in range(steps):
        t0 = time.perf_counter()
        n = trainer.train(max_steps=1)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"[probe] SDS step {s}: {dt:.1f}s (incl. compile on step 0)",
              file=sys.stderr)
    report["step0_s_with_compile"] = round(times[0], 1)
    if len(times) > 1:
        report["steady_step_s"] = round(min(times[1:]), 2)
        report["sds_iters_per_sec"] = round(1.0 / min(times[1:]), 3)
    report["mem_after_steps_GiB"] = mem_stats()
    print(json.dumps(report))


if __name__ == "__main__":
    main(steps=int(sys.argv[1]) if len(sys.argv) > 1 else 2)
