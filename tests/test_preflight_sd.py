"""tools/preflight_sd.py: go/no-go audit of a user-supplied SD checkpoint.

Builds tiny-but-layout-exact diffusers state_dicts (the same builders the
converter oracle tests use) and drives the full preflight: key-coverage
audit (KeyAudit), shape audit vs jax.eval_shape of the init pytrees, and the
SDS + PNDM smoke run. Then mutates the checkpoint three ways — missing key,
stray key, transposed tensor — and asserts each is caught loudly (NO-GO),
never silently dropped. Reference being preflighted for:
/root/reference/models/diffusion.py:53-64 (from_pretrained load of
vae/tokenizer/text_encoder/unet).
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from test_sd_converters import TINY_UNET, TINY_VAE, build_unet_sd, build_vae_sd

from avatarcraft_tpu.models.sd import CLIPTextConfig

from preflight_sd import preflight  # noqa: E402  (tools/ on path above)


def _write_checkpoint(tmp_path):
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    from avatarcraft_tpu.models.clip_tokenizer import make_toy_tokenizer

    tok = make_toy_tokenizer()
    vocab_size = len(tok.encoder)
    hf_cfg = HFConfig(
        vocab_size=vocab_size, hidden_size=12, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    text_model = CLIPTextModel(hf_cfg).eval()
    torch.save(build_unet_sd(TINY_UNET), tmp_path / "unet.pt")
    torch.save(build_vae_sd(TINY_VAE), tmp_path / "vae.pt")
    torch.save(text_model.state_dict(), tmp_path / "text_encoder.pt")
    tok.save_assets(str(tmp_path / "tokenizer"))
    tcfg = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=12, num_layers=2, num_heads=2,
        max_len=16,
    )
    return tcfg


TINY_KW = dict(
    unet_config=TINY_UNET, vae_config=TINY_VAE,
    smoke_res=16, smoke_steps=2, log=lambda *a, **k: None,
)


def test_preflight_go(tmp_path):
    tcfg = _write_checkpoint(tmp_path)
    report = preflight(str(tmp_path), clip_config=tcfg, **TINY_KW)
    assert report["go"], report
    for mod in ("unet", "vae.encoder", "vae.decoder", "text_encoder"):
        r = report["modules"][mod]
        assert not r["missing"] and not r["unconsumed"] and not r["shape_mismatches"], (mod, r)
    s = report["smoke"]
    assert s["sds_grad_finite"] and s["sds_grad_nonzero"]
    assert s["txt2img_decoded_finite"]
    assert s["tokenizer"] == "real"


def test_preflight_missing_key_is_nogo(tmp_path):
    tcfg = _write_checkpoint(tmp_path)
    sd = torch.load(tmp_path / "unet.pt", weights_only=True)
    del sd["mid_block.resnets.1.conv2.weight"]
    torch.save(sd, tmp_path / "unet.pt")
    report = preflight(str(tmp_path), clip_config=tcfg, smoke=False, **TINY_KW)
    assert not report["go"]
    assert any(
        "mid_block.resnets.1.conv2.weight" in m
        for m in report["modules"]["unet"]["missing"]
    )


def test_preflight_stray_key_is_nogo(tmp_path):
    """An unconsumed key (layout/config mismatch symptom) must fail the
    audit — silently dropping it would mean partially-random weights."""
    tcfg = _write_checkpoint(tmp_path)
    sd = torch.load(tmp_path / "unet.pt", weights_only=True)
    sd["down_blocks.0.attentions.1.proj_in.weight"] = torch.zeros(2, 2)
    torch.save(sd, tmp_path / "unet.pt")
    report = preflight(str(tmp_path), clip_config=tcfg, smoke=False, **TINY_KW)
    assert not report["go"]
    assert "down_blocks.0.attentions.1.proj_in.weight" in (
        report["modules"]["unet"]["unconsumed"]
    )


def test_preflight_bad_shape_is_nogo(tmp_path):
    tcfg = _write_checkpoint(tmp_path)
    sd = torch.load(tmp_path / "vae.pt", weights_only=True)
    sd["encoder.conv_in.weight"] = sd["encoder.conv_in.weight"].transpose(0, 1)
    torch.save(sd, tmp_path / "vae.pt")
    report = preflight(str(tmp_path), clip_config=tcfg, smoke=False, **TINY_KW)
    assert not report["go"]
    assert report["modules"]["vae.encoder"]["shape_mismatches"]


def test_preflight_missing_file_is_nogo(tmp_path):
    tcfg = _write_checkpoint(tmp_path)
    os.remove(tmp_path / "vae.pt")
    report = preflight(str(tmp_path), clip_config=tcfg, smoke=False, **TINY_KW)
    assert not report["go"]
    assert report["modules"]["vae"]["error"] == "file not found"


def test_preflight_position_ids_ignorable(tmp_path):
    """transformers<4.31 CLIP checkpoints carry a position_ids buffer; it
    holds no weights and must not fail the audit."""
    tcfg = _write_checkpoint(tmp_path)
    sd = torch.load(tmp_path / "text_encoder.pt", weights_only=True)
    sd["text_model.embeddings.position_ids"] = torch.arange(16)[None]
    torch.save(sd, tmp_path / "text_encoder.pt")
    report = preflight(str(tmp_path), clip_config=tcfg, smoke=False, **TINY_KW)
    assert report["go"], report["modules"]["text_encoder"]


def test_preflight_safetensors_layout(tmp_path):
    """Diffusers snapshot layout (unet/diffusion_pytorch_model.safetensors,
    ...) loads through the same audit."""
    from safetensors.torch import save_file

    tcfg = _write_checkpoint(tmp_path)
    for mod, fname in (
        ("unet", "diffusion_pytorch_model.safetensors"),
        ("vae", "diffusion_pytorch_model.safetensors"),
        ("text_encoder", "model.safetensors"),
    ):
        sd = torch.load(tmp_path / f"{mod}.pt", weights_only=True)
        os.remove(tmp_path / f"{mod}.pt")
        os.makedirs(tmp_path / mod, exist_ok=True)
        save_file({k: v.contiguous() for k, v in sd.items()}, tmp_path / mod / fname)
    report = preflight(str(tmp_path), clip_config=tcfg, smoke=False, **TINY_KW)
    assert report["go"], {
        m: {k: v for k, v in r.items() if k != "params"}
        for m, r in report["modules"].items()
    }
