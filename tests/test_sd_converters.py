"""Torch -> pytree converter round-trips for the SD guidance modules.

Pattern (VERDICT round 1 / tests/test_checkpoint.py): build a SMALL random
torch state_dict in the exact diffusers/transformers key layout, run an
independent torch forward over it, convert with the sd.py converters, and
require numeric agreement with our JAX apply functions.

The CLIP test uses the real ``transformers.CLIPTextModel``; the VAE/UNet
torch forwards are transcribed here from the diffusers architecture
definitions so they are independent of our JAX code.

ORACLE PROVENANCE (diffusers is not installable in this container, so the
torch oracle is derived from the upstream sources; each transcription cites
the upstream module + class it mirrors — diffusers @ v0.14-v0.2x line):

* ``t_resnet``      <- diffusers/models/resnet.py ResnetBlock2D.forward
                       (norm1->silu->conv1 -> +time_emb_proj(silu(temb)) ->
                        norm2->silu->conv2 -> +shortcut)
* ``t_attnblock``   <- diffusers/models/attention.py AttentionBlock.forward
                       (<=0.16 era: query/key/value/proj_attn keys, single
                        head here as in the SD VAE config) and its >=0.17
                        rename to Attention (to_q/to_k/to_v/to_out.0) —
                        both key eras covered by test_vae_attn_new_key_style
* ``t_transformer`` <- diffusers/models/attention.py Transformer2DModel +
                       BasicTransformerBlock.forward (norm->proj_in ->
                        self-attn(ln1) -> cross-attn(ln2, encoder states) ->
                        GEGLU ff(ln3): proj->chunk->a*gelu(gate)->out ->
                        proj_out + residual); GEGLU uses EXACT erf gelu
                       (diffusers/models/attention.py GEGLU.forward -> F.gelu)
* ``torch_unet``    <- diffusers/models/unet_2d_condition.py
                       UNet2DConditionModel.forward (conv_in -> down blocks
                        w/ per-layer skips + downsampler skip -> mid
                        res/attn/res -> up blocks popping skips ->
                        norm_out/silu/conv_out; Timesteps embedding with
                        flip_sin_to_cos=True, downscale_freq_shift=0)
* ``torch_vae_*``   <- diffusers/models/vae.py Encoder/Decoder.forward +
                       autoencoder_kl.py AutoencoderKL.encode/decode
                       (asymmetric (0,1),(0,1) pad before stride-2
                        downsample: diffusers/models/resnet.py
                        Downsample2D.forward with use_conv, padding=0)

A wiring mistake made identically in BOTH the converter and this oracle
would still pass — that residual risk is flagged in docs/PARITY.md and is
retired the first time real diffusers weights are loaded (the torch-parity
SDS/PNDM tests then pin gradients/trajectories against torch autograd
end-to-end, tests/test_sds_torch_parity.py / tests/test_pndm.py).
"""

import math

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from avatarcraft_tpu.models.sd import (
    CLIPTextConfig,
    UNetConfig,
    VAEConfig,
    clip_text_apply,
    clip_text_params_from_torch,
    unet_apply,
    unet_params_from_torch,
    vae_decode_apply,
    vae_decoder_params_from_torch,
    vae_encode_apply,
    vae_encoder_params_from_torch,
)

torch.manual_seed(0)

TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_groups=4)
TINY_UNET = UNetConfig(
    block_out_channels=(8, 16),
    layers_per_block=1,
    cross_attention_dim=12,
    attention_head_dim=2,
    norm_groups=4,
    attn_blocks=(True, False),
)


def _r(*shape):
    return torch.randn(*shape) * 0.2


def _conv_sd(sd, pre, cin, cout, k=3):
    sd[f"{pre}.weight"] = _r(cout, cin, k, k)
    sd[f"{pre}.bias"] = _r(cout)


def _lin_sd(sd, pre, cin, cout, bias=True):
    sd[f"{pre}.weight"] = _r(cout, cin)
    if bias:
        sd[f"{pre}.bias"] = _r(cout)


def _norm_sd(sd, pre, c):
    sd[f"{pre}.weight"] = 1.0 + 0.1 * _r(c)
    sd[f"{pre}.bias"] = 0.1 * _r(c)


def _resnet_sd(sd, pre, cin, cout, temb=None):
    _norm_sd(sd, f"{pre}.norm1", cin)
    _conv_sd(sd, f"{pre}.conv1", cin, cout)
    if temb:
        _lin_sd(sd, f"{pre}.time_emb_proj", temb, cout)
    _norm_sd(sd, f"{pre}.norm2", cout)
    _conv_sd(sd, f"{pre}.conv2", cout, cout)
    if cin != cout:
        _conv_sd(sd, f"{pre}.conv_shortcut", cin, cout, k=1)


def _attnblock_sd(sd, pre, c):
    _norm_sd(sd, f"{pre}.group_norm", c)
    for n in ("query", "key", "value", "proj_attn"):
        _lin_sd(sd, f"{pre}.{n}", c, c)


# ---------------------------------------------------------------------------
# Independent torch forwards (diffusers semantics)
# ---------------------------------------------------------------------------


def t_gn(sd, pre, x, groups):
    return F.group_norm(x, groups, sd[f"{pre}.weight"], sd[f"{pre}.bias"], eps=1e-5)


def t_conv(sd, pre, x, stride=1, padding=1):
    return F.conv2d(x, sd[f"{pre}.weight"], sd[f"{pre}.bias"], stride, padding)


def t_lin(sd, pre, x):
    b = sd.get(f"{pre}.bias")
    return F.linear(x, sd[f"{pre}.weight"], b)


def t_resnet(sd, pre, x, groups, temb=None):
    h = t_conv(sd, f"{pre}.conv1", F.silu(t_gn(sd, f"{pre}.norm1", x, groups)))
    if temb is not None:
        h = h + t_lin(sd, f"{pre}.time_emb_proj", F.silu(temb))[:, :, None, None]
    h = t_conv(sd, f"{pre}.conv2", F.silu(t_gn(sd, f"{pre}.norm2", h, groups)))
    if f"{pre}.conv_shortcut.weight" in sd:
        x = t_conv(sd, f"{pre}.conv_shortcut", x, padding=0)
    return x + h


def t_attnblock(sd, pre, x, groups):
    B, C, H, W = x.shape
    a = t_gn(sd, f"{pre}.group_norm", x, groups).reshape(B, C, H * W).transpose(1, 2)
    q = t_lin(sd, f"{pre}.query", a)
    k = t_lin(sd, f"{pre}.key", a)
    v = t_lin(sd, f"{pre}.value", a)
    attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(C), dim=-1)
    o = t_lin(sd, f"{pre}.proj_attn", attn @ v)
    return x + o.transpose(1, 2).reshape(B, C, H, W)


def torch_vae_encode(sd, cfg, img):
    g = cfg.norm_groups
    x = img * 2.0 - 1.0
    h = t_conv(sd, "encoder.conv_in", x)
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h, g)
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            h = F.pad(h, (0, 1, 0, 1))
            h = t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", h, stride=2, padding=0)
    h = t_resnet(sd, "encoder.mid_block.resnets.0", h, g)
    h = t_attnblock(sd, "encoder.mid_block.attentions.0", h, g)
    h = t_resnet(sd, "encoder.mid_block.resnets.1", h, g)
    h = F.silu(t_gn(sd, "encoder.conv_norm_out", h, g))
    h = t_conv(sd, "encoder.conv_out", h)
    h = t_conv(sd, "quant_conv", h, padding=0)
    mean, _ = torch.chunk(h, 2, dim=1)
    return mean * cfg.scaling_factor


def torch_vae_decode(sd, cfg, lat):
    g = cfg.norm_groups
    z = lat / cfg.scaling_factor
    h = t_conv(sd, "post_quant_conv", z, padding=0)
    h = t_conv(sd, "decoder.conv_in", h)
    h = t_resnet(sd, "decoder.mid_block.resnets.0", h, g)
    h = t_attnblock(sd, "decoder.mid_block.attentions.0", h, g)
    h = t_resnet(sd, "decoder.mid_block.resnets.1", h, g)
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block + 1):
            h = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, g)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(t_gn(sd, "decoder.conv_norm_out", h, g))
    h = t_conv(sd, "decoder.conv_out", h)
    return torch.clamp((h + 1.0) / 2.0, 0.0, 1.0)


def t_transformer(sd, pre, x, ctx, heads, groups):
    B, C, H, W = x.shape
    res = x
    h = t_gn(sd, f"{pre}.norm", x, groups)
    h = t_conv(sd, f"{pre}.proj_in", h, padding=0)
    h = h.reshape(B, C, H * W).transpose(1, 2)
    blk = f"{pre}.transformer_blocks.0"

    def ln(p, y):
        return F.layer_norm(y, (C,), sd[f"{p}.weight"], sd[f"{p}.bias"], eps=1e-5)

    def attn(p, q_in, kv_in):
        q = t_lin(sd, f"{p}.to_q", q_in)
        k = t_lin(sd, f"{p}.to_k", kv_in)
        v = t_lin(sd, f"{p}.to_v", kv_in)
        hd = C // heads

        def split(y):
            return y.reshape(B, -1, heads, hd).transpose(1, 2)

        a = torch.softmax(split(q) @ split(k).transpose(2, 3) / math.sqrt(hd), dim=-1)
        o = (a @ split(v)).transpose(1, 2).reshape(B, -1, C)
        return t_lin(sd, f"{p}.to_out.0", o)

    h = h + attn(f"{blk}.attn1", ln(f"{blk}.norm1", h), ln(f"{blk}.norm1", h))
    h = h + attn(f"{blk}.attn2", ln(f"{blk}.norm2", h), ctx)
    ff_in = ln(f"{blk}.norm3", h)
    a, gate = t_lin(sd, f"{blk}.ff.net.0.proj", ff_in).chunk(2, dim=-1)
    h = h + t_lin(sd, f"{blk}.ff.net.2", a * F.gelu(gate))
    h = h.transpose(1, 2).reshape(B, C, H, W)
    return t_conv(sd, f"{pre}.proj_out", h, padding=0) + res


def torch_unet(sd, cfg, lat, t, ctx):
    g = cfg.norm_groups
    ch = cfg.block_out_channels
    half = ch[0] // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=lat.dtype) / half)
    args = t[:, None].to(lat.dtype) * freqs[None]
    temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = t_lin(sd, "time_embedding.linear_2", F.silu(t_lin(sd, "time_embedding.linear_1", temb)))

    h = t_conv(sd, "conv_in", lat)
    skips = [h]
    n = len(ch)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = t_resnet(sd, f"down_blocks.{i}.resnets.{j}", h, g, temb)
            if cfg.attn_blocks[i]:
                h = t_transformer(sd, f"down_blocks.{i}.attentions.{j}", h, ctx, cfg.heads_at(i), g)
            skips.append(h)
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            h = t_conv(sd, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            skips.append(h)

    h = t_resnet(sd, "mid_block.resnets.0", h, g, temb)
    h = t_transformer(sd, "mid_block.attentions.0", h, ctx, cfg.heads_at(n - 1), g)
    h = t_resnet(sd, "mid_block.resnets.1", h, g, temb)

    for i in range(n):
        attn_here = list(reversed(cfg.attn_blocks))[i]
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = t_resnet(sd, f"up_blocks.{i}.resnets.{j}", h, g, temb)
            if attn_here:
                h = t_transformer(sd, f"up_blocks.{i}.attentions.{j}", h, ctx, cfg.heads_at(n - 1 - i), g)
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = t_conv(sd, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(t_gn(sd, "conv_norm_out", h, g))
    return t_conv(sd, "conv_out", h)


# ---------------------------------------------------------------------------
# State-dict builders
# ---------------------------------------------------------------------------


def build_vae_sd(cfg):
    sd = {}
    ch = cfg.block_out_channels
    _conv_sd(sd, "encoder.conv_in", cfg.in_channels, ch[0])
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(cfg.layers_per_block):
            _resnet_sd(sd, f"encoder.down_blocks.{i}.resnets.{j}", cin, cout)
            cin = cout
        if i < len(ch) - 1:
            _conv_sd(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout)
    _resnet_sd(sd, "encoder.mid_block.resnets.0", ch[-1], ch[-1])
    _attnblock_sd(sd, "encoder.mid_block.attentions.0", ch[-1])
    _resnet_sd(sd, "encoder.mid_block.resnets.1", ch[-1], ch[-1])
    _norm_sd(sd, "encoder.conv_norm_out", ch[-1])
    _conv_sd(sd, "encoder.conv_out", ch[-1], 2 * cfg.latent_channels)
    _conv_sd(sd, "quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)

    rev = tuple(reversed(ch))
    _conv_sd(sd, "post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    _conv_sd(sd, "decoder.conv_in", cfg.latent_channels, rev[0])
    _resnet_sd(sd, "decoder.mid_block.resnets.0", rev[0], rev[0])
    _attnblock_sd(sd, "decoder.mid_block.attentions.0", rev[0])
    _resnet_sd(sd, "decoder.mid_block.resnets.1", rev[0], rev[0])
    cin = rev[0]
    for i, cout in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            _resnet_sd(sd, f"decoder.up_blocks.{i}.resnets.{j}", cin, cout)
            cin = cout
        if i < len(rev) - 1:
            _conv_sd(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout)
    _norm_sd(sd, "decoder.conv_norm_out", rev[-1])
    _conv_sd(sd, "decoder.conv_out", rev[-1], cfg.in_channels)
    return sd


def _transformer_sd(sd, pre, c, ctx):
    _norm_sd(sd, f"{pre}.norm", c)
    _conv_sd(sd, f"{pre}.proj_in", c, c, k=1)
    blk = f"{pre}.transformer_blocks.0"
    _norm_sd(sd, f"{blk}.norm1", c)
    _lin_sd(sd, f"{blk}.attn1.to_q", c, c, bias=False)
    _lin_sd(sd, f"{blk}.attn1.to_k", c, c, bias=False)
    _lin_sd(sd, f"{blk}.attn1.to_v", c, c, bias=False)
    _lin_sd(sd, f"{blk}.attn1.to_out.0", c, c)
    _norm_sd(sd, f"{blk}.norm2", c)
    _lin_sd(sd, f"{blk}.attn2.to_q", c, c, bias=False)
    _lin_sd(sd, f"{blk}.attn2.to_k", ctx, c, bias=False)
    _lin_sd(sd, f"{blk}.attn2.to_v", ctx, c, bias=False)
    _lin_sd(sd, f"{blk}.attn2.to_out.0", c, c)
    _norm_sd(sd, f"{blk}.norm3", c)
    _lin_sd(sd, f"{blk}.ff.net.0.proj", c, 8 * c)
    _lin_sd(sd, f"{blk}.ff.net.2", 4 * c, c)
    _conv_sd(sd, f"{pre}.proj_out", c, c, k=1)


def build_unet_sd(cfg):
    sd = {}
    ch = cfg.block_out_channels
    temb = cfg.time_embed_dim
    _conv_sd(sd, "conv_in", cfg.in_channels, ch[0])
    _lin_sd(sd, "time_embedding.linear_1", ch[0], temb)
    _lin_sd(sd, "time_embedding.linear_2", temb, temb)
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(cfg.layers_per_block):
            _resnet_sd(sd, f"down_blocks.{i}.resnets.{j}", cin, cout, temb)
            if cfg.attn_blocks[i]:
                _transformer_sd(sd, f"down_blocks.{i}.attentions.{j}", cout, cfg.cross_attention_dim)
            cin = cout
        if i < len(ch) - 1:
            _conv_sd(sd, f"down_blocks.{i}.downsamplers.0.conv", cout, cout)
    _resnet_sd(sd, "mid_block.resnets.0", ch[-1], ch[-1], temb)
    _transformer_sd(sd, "mid_block.attentions.0", ch[-1], cfg.cross_attention_dim)
    _resnet_sd(sd, "mid_block.resnets.1", ch[-1], ch[-1], temb)
    rev = list(reversed(ch))
    cin = ch[-1]
    for i, cout in enumerate(rev):
        attn_here = list(reversed(cfg.attn_blocks))[i]
        for j in range(cfg.layers_per_block + 1):
            skip_ch = rev[min(i + 1, len(ch) - 1)] if j == cfg.layers_per_block else cout
            _resnet_sd(sd, f"up_blocks.{i}.resnets.{j}", cin + skip_ch, cout, temb)
            if attn_here:
                _transformer_sd(sd, f"up_blocks.{i}.attentions.{j}", cout, cfg.cross_attention_dim)
            cin = cout
        if i < len(ch) - 1:
            _conv_sd(sd, f"up_blocks.{i}.upsamplers.0.conv", cout, cout)
    _norm_sd(sd, "conv_norm_out", ch[0])
    _conv_sd(sd, "conv_out", ch[0], cfg.out_channels)
    return sd


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_vae_encoder_converter_matches_torch():
    sd = build_vae_sd(TINY_VAE)
    img = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        ref = torch_vae_encode(sd, TINY_VAE, img).numpy()
    params = vae_encoder_params_from_torch(sd, TINY_VAE)
    out = np.asarray(vae_encode_apply(params, TINY_VAE, jax.numpy.asarray(img.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_vae_decoder_converter_matches_torch():
    sd = build_vae_sd(TINY_VAE)
    lat = torch.randn(2, 4, 16, 16) * 0.2
    with torch.no_grad():
        ref = torch_vae_decode(sd, TINY_VAE, lat).numpy()
    params = vae_decoder_params_from_torch(sd, TINY_VAE)
    out = np.asarray(vae_decode_apply(params, TINY_VAE, jax.numpy.asarray(lat.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_vae_attn_new_key_style():
    """>=0.17 diffusers renames query/key/value/proj_attn -> to_q/... ."""
    sd = build_vae_sd(TINY_VAE)
    ren = {}
    for k, v in sd.items():
        k = k.replace(".attentions.0.query", ".attentions.0.to_q")
        k = k.replace(".attentions.0.key", ".attentions.0.to_k")
        k = k.replace(".attentions.0.value", ".attentions.0.to_v")
        k = k.replace(".attentions.0.proj_attn", ".attentions.0.to_out.0")
        ren[k] = v
    img = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        ref = torch_vae_encode(sd, TINY_VAE, img).numpy()
    params = vae_encoder_params_from_torch(ren, TINY_VAE)
    out = np.asarray(vae_encode_apply(params, TINY_VAE, jax.numpy.asarray(img.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_unet_converter_matches_torch():
    sd = build_unet_sd(TINY_UNET)
    lat = torch.randn(2, 4, 16, 16) * 0.5
    t = torch.tensor([7, 423])
    ctx = torch.randn(2, 6, TINY_UNET.cross_attention_dim) * 0.3
    with torch.no_grad():
        ref = torch_unet(sd, TINY_UNET, lat, t, ctx).numpy()
    params = unet_params_from_torch(sd, TINY_UNET)
    out = np.asarray(
        unet_apply(
            params,
            TINY_UNET,
            jax.numpy.asarray(lat.numpy()),
            jax.numpy.asarray(t.numpy()),
            jax.numpy.asarray(ctx.numpy()),
        )
    )
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_clip_converter_matches_transformers():
    """Round-trip vs a REAL (random-init) transformers CLIPTextModel."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=64,
        hidden_size=16,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=8,
        hidden_act="quick_gelu",
    )
    model = CLIPTextModel(hf_cfg).eval()
    ids = torch.randint(0, 64, (2, 8))
    with torch.no_grad():
        ref = model(ids).last_hidden_state.numpy()

    cfg = CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2, max_len=8)
    params = clip_text_params_from_torch(model.state_dict(), cfg)
    out = np.asarray(clip_text_apply(params, cfg, jax.numpy.asarray(ids.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_sd2_per_block_heads_config():
    """SD2-style per-block head counts run through the same UNet."""
    cfg = UNetConfig(
        block_out_channels=(8, 16),
        layers_per_block=1,
        cross_attention_dim=12,
        attention_head_dim=(2, 4),
        norm_groups=4,
        attn_blocks=(True, True),
        in_channels=5,
    )
    sd = build_unet_sd(cfg)
    lat = torch.randn(1, 5, 16, 16) * 0.5
    t = torch.tensor([99])
    ctx = torch.randn(1, 4, 12) * 0.3
    with torch.no_grad():
        ref = torch_unet(sd, cfg, lat, t, ctx).numpy()
    params = unet_params_from_torch(sd, cfg)
    out = np.asarray(
        unet_apply(
            params,
            cfg,
            jax.numpy.asarray(lat.numpy()),
            jax.numpy.asarray(t.numpy()),
            jax.numpy.asarray(ctx.numpy()),
        )
    )
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_load_stable_diffusion_modules_end_to_end(tmp_path):
    """Full loader: torch files + tokenizer assets -> working GuidanceModules
    driving get_text_embeds + sds_image_grad (the reference's runtime path,
    models/diffusion.py:53-64,72-149), at tiny scale."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    from avatarcraft_tpu.models.clip_tokenizer import make_toy_tokenizer
    from avatarcraft_tpu.models.diffusion import SDSGuidance
    from avatarcraft_tpu.models.sd import load_stable_diffusion_modules

    tok = make_toy_tokenizer()
    vocab_size = len(tok.encoder)
    hf_cfg = HFConfig(
        vocab_size=vocab_size, hidden_size=12, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    text_model = CLIPTextModel(hf_cfg).eval()

    ucfg = UNetConfig(
        block_out_channels=(8, 16), layers_per_block=1, cross_attention_dim=12,
        attention_head_dim=2, norm_groups=4, attn_blocks=(True, False),
    )
    torch.save(build_unet_sd(ucfg), tmp_path / "unet.pt")
    torch.save(build_vae_sd(TINY_VAE), tmp_path / "vae.pt")
    torch.save(text_model.state_dict(), tmp_path / "text_encoder.pt")
    tok.save_assets(str(tmp_path / "tokenizer"))

    tcfg = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=12, num_layers=2, num_heads=2, max_len=16
    )
    mods = load_stable_diffusion_modules(
        str(tmp_path), unet_config=ucfg, vae_config=TINY_VAE,
        clip_config=tcfg, image_size=32,
    )
    assert mods.vae_decode is not None and mods.tokenizer is not None

    g = SDSGuidance(mods)
    emb = g.get_text_embeds(["hulk style"])
    assert emb.shape == (2, 16, 12)
    img = jax.numpy.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 24, 24)), 0, 1
    )
    grad = g.sds_image_grad(jax.random.PRNGKey(1), emb, img)
    assert grad.shape == img.shape
    assert np.isfinite(np.asarray(grad)).all()
    assert float(np.abs(np.asarray(grad)).sum()) > 0
    # txt2img decode path exists
    lat = g.produce_latents(
        jax.random.PRNGKey(2), emb, height=32, width=32, num_inference_steps=2
    )
    dec = mods.vae_decode(lat)
    assert dec.shape == (1, 3, 32, 32)


def test_sds_depth_conditioning(tmp_path):
    """SD 2.0-depth semantics: depth resized to the latent grid, min-max
    normalized to [-1,1], concatenated as a 5th latent channel
    (reference: models/diffusion.py:107-111,130-131)."""
    from avatarcraft_tpu.models.diffusion import GuidanceModules, SDSGuidance

    seen = {}

    def unet(lat, t, ctx):
        seen["in_channels"] = lat.shape[1]
        seen["depth"] = lat[:, 4]
        return jax.numpy.tanh(lat[:, :4])

    def vae_encode(images):
        B, C, H, W = images.shape
        f = 2
        lat = images.reshape(B, C, H // f, f, W // f, f).mean(axis=(3, 5))
        return jax.numpy.concatenate([lat, lat[:, :1]], axis=1) * 0.18215

    mods = GuidanceModules(
        unet=unet, vae_encode=vae_encode,
        text_encode=lambda ps: jax.numpy.zeros((len(ps), 4, 8)),
        latent_scale=2, image_size=16, use_depth=True,
    )
    g = SDSGuidance(mods)
    emb = g.get_text_embeds(["x"])
    img = jax.numpy.clip(jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16)), 0, 1)
    depth = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 16, 16)) * 5.0 + 2.0
    grad = g.sds_image_grad(jax.random.PRNGKey(2), emb, img, pred_depth=depth)
    assert grad.shape == img.shape
    assert seen["in_channels"] == 5
    d = np.asarray(seen["depth"])
    assert d.min() == pytest.approx(-1.0, abs=1e-5)
    assert d.max() == pytest.approx(1.0, abs=1e-5)
    # without depth the same modules run 4-channel (dummy tolerates both)
    mods_no = GuidanceModules(
        unet=unet, vae_encode=vae_encode,
        text_encode=lambda ps: jax.numpy.zeros((len(ps), 4, 8)),
        latent_scale=2, image_size=16, use_depth=False,
    )
    g2 = SDSGuidance(mods_no)
    grad2 = g2.sds_image_grad(jax.random.PRNGKey(2), g2.get_text_embeds(["x"]), img)
    assert seen["in_channels"] == 4
    assert np.isfinite(np.asarray(grad2)).all()
