"""Preflight a user-supplied Stable Diffusion checkpoint for stylize.

No SD weights ship in this container (the reference gates the same download
behind an HF TOKEN, reference: models/diffusion.py:31-37,53-64), so the day
real weights appear this tool is the one documented command that validates
them end to end BEFORE a multi-hour stylize run:

  1. **Key audit** — every converter (models/sd.py unet/vae/clip *_from_torch)
     runs against a KeyAudit-wrapped state_dict; missing keys fail loudly and
     keys the converter never consumed are listed (the symptom of a diffusers
     layout/era or config mismatch — silently dropping them would mean
     rendering with partially-random weights).
  2. **Shape audit** — the converted pytree is compared leaf-by-leaf (tree
     path + shape) against ``jax.eval_shape`` of the matching ``init_*``
     pytree, so transposed/truncated tensors are caught without allocating.
  3. **Smoke run** — assembles GuidanceModules from the converted params and
     executes one jitted SDS image-gradient step plus a short PNDM txt2img
     (the two runtime paths stylize exercises; reference:
     models/diffusion.py:92-149,266-290), checking finiteness.

Prints human-readable findings and ONE final JSON line; exit 0 = GO,
exit 2 = NO-GO.

Usage:
    # flat layout (unet.pt / vae.pt / text_encoder.pt [+ tokenizer/])
    python tools/preflight_sd.py --weights /path/to/dir --version 1.5

    # diffusers snapshot layout (unet/diffusion_pytorch_model.safetensors,
    # vae/..., text_encoder/model.safetensors, tokenizer/)
    python tools/preflight_sd.py --weights /path/to/snapshot --version 2.0

    # then: stylize.py ... --sd_weights /path/to/dir
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# substrings of keys that are expected to go unconsumed (buffer/meta entries
# that carry no learned weights)
IGNORABLE_KEY_PARTS = (
    "position_ids",
    "num_batches_tracked",
    "model_ema",
    "logit_scale",
)

_FLAT = {
    "unet": ("unet.pt",),
    "vae": ("vae.pt",),
    "text_encoder": ("text_encoder.pt",),
}
_DIFFUSERS = {
    "unet": (
        "unet/diffusion_pytorch_model.safetensors",
        "unet/diffusion_pytorch_model.bin",
    ),
    "vae": (
        "vae/diffusion_pytorch_model.safetensors",
        "vae/diffusion_pytorch_model.bin",
    ),
    "text_encoder": (
        "text_encoder/model.safetensors",
        "text_encoder/pytorch_model.bin",
    ),
}


def _find_module_files(root: str) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for mod in ("unet", "vae", "text_encoder"):
        out[mod] = None
        for rel in _FLAT[mod] + _DIFFUSERS[mod]:
            p = os.path.join(root, rel)
            if os.path.exists(p):
                out[mod] = p
                break
    return out


def _load_sd(path: str) -> dict:
    """Load a state_dict file (.pt/.bin via torch, .safetensors natively)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        try:
            with safe_open(path, framework="numpy") as f:
                return {k: f.get_tensor(k) for k in f.keys()}
        except Exception:
            # bf16 etc. aren't numpy-native; go through torch
            from safetensors.torch import load_file

            return {k: v.float().numpy() for k, v in load_file(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return dict(sd)


def _leaf_shapes(tree) -> dict[str, tuple]:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): tuple(leaf.shape) for path, leaf in flat}


def _audit_one(name, sd, converter, init_shapes) -> dict:
    """Run one converter under a KeyAudit; return findings + converted params."""
    from avatarcraft_tpu.models.sd import KeyAudit

    res = {
        "file_keys": len(sd),
        "missing": [],
        "unconsumed": [],
        "shape_mismatches": [],
        "params": None,
    }
    audited = KeyAudit(sd)
    try:
        res["params"] = converter(audited)
    except KeyError as e:
        res["missing"].append(str(e.args[0]))
        return res
    res["consumed"] = len(audited.consumed)
    res["unconsumed"] = sorted(
        k
        for k in sd
        if k not in audited.consumed
        and not any(part in k for part in IGNORABLE_KEY_PARTS)
    )
    got = _leaf_shapes(res["params"])
    for path in sorted(set(init_shapes) | set(got)):
        e, g = init_shapes.get(path), got.get(path)
        if e != g:
            res["shape_mismatches"].append(
                f"{name}{path}: expected {e}, converted {g}"
            )
    return res


def preflight(
    weights: str,
    version: str = "1.5",
    smoke: bool = True,
    smoke_res: int = 128,
    smoke_steps: int = 5,
    cast: str = "float32",
    unet_config=None,
    vae_config=None,
    clip_config=None,
    log=print,
) -> dict:
    """Full preflight; returns the report dict (report['go'] is the verdict)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.models.sd import (
        CLIPTextConfig,
        UNetConfig,
        VAEConfig,
        clip_text_params_from_torch,
        init_clip_text_params,
        init_unet_params,
        init_vae_decoder_params,
        init_vae_encoder_params,
        unet_params_from_torch,
        vae_decoder_params_from_torch,
        vae_encoder_params_from_torch,
    )

    if version == "2.0":
        ucfg = unet_config or UNetConfig(
            in_channels=5,
            cross_attention_dim=1024,
            attention_head_dim=(5, 10, 20, 20),
        )
        tcfg = clip_config or CLIPTextConfig(
            hidden_size=1024, num_layers=23, num_heads=16
        )
    else:
        ucfg = unet_config or UNetConfig()
        tcfg = clip_config or CLIPTextConfig()
    vcfg = vae_config or VAEConfig()

    report: dict = {"weights": weights, "version": version, "modules": {}, "go": True}
    files = _find_module_files(weights)
    for mod, path in files.items():
        if path is None:
            report["modules"][mod] = {"error": "file not found"}
            report["go"] = False
            log(f"[preflight] {mod}: NO file found under {weights} "
                f"(looked for {_FLAT[mod] + _DIFFUSERS[mod]})")
    if not report["go"]:
        return report

    key = jax.random.PRNGKey(0)
    plan = [
        (
            "unet",
            lambda sd: unet_params_from_torch(sd, ucfg),
            lambda: init_unet_params(key, ucfg),
        ),
        (
            "vae.encoder",
            lambda sd: vae_encoder_params_from_torch(sd, vcfg),
            lambda: init_vae_encoder_params(key, vcfg),
        ),
        (
            "vae.decoder",
            lambda sd: vae_decoder_params_from_torch(sd, vcfg),
            lambda: init_vae_decoder_params(key, vcfg),
        ),
        (
            "text_encoder",
            lambda sd: clip_text_params_from_torch(sd, tcfg),
            lambda: init_clip_text_params(key, tcfg),
        ),
    ]
    loaded = {mod: _load_sd(p) for mod, p in files.items()}
    converted: dict = {}
    for name, conv, init in plan:
        sd = loaded[name.split(".")[0]]
        init_shapes = _leaf_shapes(jax.eval_shape(init))
        if name == "text_encoder":
            # vocab rides with the checkpoint, not the config
            emb = sd.get("text_model.embeddings.token_embedding.weight",
                         sd.get("embeddings.token_embedding.weight"))
            if emb is not None and hasattr(emb, "shape"):
                v = int(emb.shape[0])
                vcfg_t = dataclasses.replace(tcfg, vocab_size=v)
                init_shapes = _leaf_shapes(
                    jax.eval_shape(lambda: init_clip_text_params(key, vcfg_t))
                )
        res = _audit_one(name, sd, conv, init_shapes)
        converted[name] = res.pop("params")
        report["modules"][name] = res

    # the two VAE halves share one file: a key is truly unconsumed only if
    # NEITHER half's converter touched it
    enc, dec = report["modules"]["vae.encoder"], report["modules"]["vae.decoder"]
    if not enc["missing"] and not dec["missing"]:
        both = sorted(set(enc["unconsumed"]) & set(dec["unconsumed"]))
        enc["unconsumed"] = dec["unconsumed"] = both

    for name, res in report["modules"].items():
        n_param = 0
        if converted.get(name) is not None:
            import jax as _jax

            n_param = sum(
                int(np.prod(l.shape))
                for l in _jax.tree_util.tree_leaves(converted[name])
            )
        res["params_M"] = round(n_param / 1e6, 1)
        ok = not (res["missing"] or res["unconsumed"] or res["shape_mismatches"])
        log(
            f"[preflight] {name}: {'OK' if ok else 'FAIL'} "
            f"({res['file_keys']} file keys, {res['params_M']}M params"
            + (f", missing={res['missing'][:3]}" if res["missing"] else "")
            + (
                f", unconsumed={len(res['unconsumed'])} e.g. {res['unconsumed'][:3]}"
                if res["unconsumed"]
                else ""
            )
            + (
                f", shape_mismatches={res['shape_mismatches'][:3]}"
                if res["shape_mismatches"]
                else ""
            )
            + ")"
        )
        if not ok:
            report["go"] = False

    if not report["go"] or not smoke:
        report["smoke"] = None
        return report

    # ---- smoke: one SDS grad + a short PNDM txt2img ------------------------
    from avatarcraft_tpu.models.diffusion import GuidanceModules, SDSGuidance
    from avatarcraft_tpu.models.sd import (
        clip_text_apply,
        unet_apply,
        vae_decode_apply,
        vae_encode_apply,
    )

    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(cast)
    if dt is not None:
        converted = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dt), converted
        )
    unet_p, enc_p, dec_p, clip_p = (
        converted["unet"],
        converted["vae.encoder"],
        converted["vae.decoder"],
        converted["text_encoder"],
    )

    tok_dir = os.path.join(weights, "tokenizer")
    tokenizer = None
    if os.path.exists(os.path.join(tok_dir, "merges.txt")):
        from avatarcraft_tpu.models.clip_tokenizer import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(tok_dir)

    def text_encode(prompts):
        if tokenizer is None:
            # tokenizer assets absent: exercise the text encoder with fixed
            # ids (the conversion under test is the weights, not the BPE)
            ids = jnp.full((len(prompts), tcfg.max_len), 49406 % tcfg.vocab_size,
                           jnp.int32)
        else:
            ids = jnp.asarray(tokenizer(list(prompts), max_length=tcfg.max_len),
                              jnp.int32)
        return clip_text_apply(clip_p, tcfg, ids)

    mods = GuidanceModules(
        unet=lambda l, t, c: unet_apply(unet_p, ucfg, l, t, c),
        vae_encode=lambda im: vae_encode_apply(enc_p, vcfg, im),
        text_encode=text_encode,
        latent_scale=2 ** (len(vcfg.block_out_channels) - 1),
        image_size=smoke_res,
        vae_decode=lambda lat: vae_decode_apply(dec_p, vcfg, lat),
        tokenizer=tokenizer,
        use_depth=(version == "2.0"),
    )
    g = SDSGuidance(mods)
    log(f"[preflight] smoke: text_encode + SDS grad + {smoke_steps}-step PNDM "
        f"txt2img at {smoke_res}^2 (first call compiles; full-size timing is "
        f"tools/sds_scale_probe.py's job)")
    emb = g.get_text_embeds(["a DSLR photo of a bronze statue"])
    img = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (1, 3, smoke_res, smoke_res)),
        0.0,
        1.0,
    )
    depth = (
        jax.random.uniform(jax.random.PRNGKey(2), (1, 1, smoke_res, smoke_res))
        if version == "2.0"
        else None
    )
    t0 = time.perf_counter()
    grad = g.sds_image_grad_jit(jax.random.PRNGKey(3), emb, img, 100.0, depth)
    grad = np.asarray(grad)
    sds_s = time.perf_counter() - t0
    lat = g.produce_latents(
        jax.random.PRNGKey(4), emb, height=smoke_res, width=smoke_res,
        num_inference_steps=smoke_steps,
    )
    dec = np.asarray(mods.vae_decode(lat))
    report["smoke"] = {
        "text_embeds_finite": bool(np.isfinite(np.asarray(emb)).all()),
        "sds_grad_finite": bool(np.isfinite(grad).all()),
        "sds_grad_nonzero": bool(np.abs(grad).sum() > 0),
        "sds_first_call_s": round(sds_s, 1),
        "txt2img_decoded_finite": bool(np.isfinite(dec).all()),
        "tokenizer": "real" if tokenizer is not None else "absent (fixed ids)",
    }
    if not (
        report["smoke"]["text_embeds_finite"]
        and report["smoke"]["sds_grad_finite"]
        and report["smoke"]["sds_grad_nonzero"]
        and report["smoke"]["txt2img_decoded_finite"]
    ):
        report["go"] = False
    log(f"[preflight] smoke: {report['smoke']}")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="directory holding the checkpoint (flat unet.pt/"
                         "vae.pt/text_encoder.pt or a diffusers snapshot)")
    ap.add_argument("--version", default="1.5", choices=["1.5", "2.0"])
    ap.add_argument("--no_smoke", action="store_true",
                    help="audit keys/shapes only (no device execution)")
    ap.add_argument("--smoke_res", default=128, type=int)
    ap.add_argument("--smoke_steps", default=5, type=int)
    ap.add_argument("--cast", default="float32",
                    choices=["float32", "bfloat16", "none"],
                    help="cast converted params before the smoke run")
    opt = ap.parse_args(argv)

    report = preflight(
        opt.weights,
        version=opt.version,
        smoke=not opt.no_smoke,
        smoke_res=opt.smoke_res,
        smoke_steps=opt.smoke_steps,
        cast=opt.cast,
    )
    report_out = {
        k: v for k, v in report.items() if k != "modules"
    } | {
        "modules": {
            m: {k: v for k, v in r.items() if k != "params"}
            for m, r in report["modules"].items()
        }
    }
    print(json.dumps(report_out))
    print(f"[preflight] verdict: {'GO' if report['go'] else 'NO-GO'}",
          file=sys.stderr)
    return 0 if report["go"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
