"""Stable Diffusion modules in functional JAX: UNet2DCondition, VAE encoder,
CLIP text encoder -- plus converters from diffusers/torch checkpoints.

The reference loads these from HuggingFace at runtime
(reference: models/diffusion.py:53-64: AutoencoderKL, CLIPTextModel,
UNet2DConditionModel). This environment has no model weights and no network,
so these modules serve two purposes:

1. **capability parity** -- the full SD 1.5 architecture exists natively in
   the framework; given a torch checkpoint, :func:`load_stable_diffusion_modules`
   builds the GuidanceModules the SDS machinery consumes;
2. **scaled testing** -- every block is config-parameterized, so tiny random
   configs exercise the exact code paths in CI.

Everything is plain pytrees + pure functions; the UNet eval jits and shards
batch-parallel across the mesh like any other step.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _he_conv(key, kh, kw, cin, cout):
    bound = 1.0 / math.sqrt(cin * kh * kw)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (cout,), minval=-bound, maxval=bound),
    }


def _he_linear(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (cout, cin), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (cout,), minval=-bound, maxval=bound),
    }


def conv2d(p, x, stride=1, padding=1):
    """x: [B, H, W, C]; weights HWIO."""
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"],
            (stride, stride),
            [(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["b"]
    )


def linear(p, x):
    return x @ p["w"].T + p["b"]


def group_norm(p, x, groups=32, eps=1e-5):
    B, H, W, C = x.shape
    g = min(groups, C)
    xg = x.reshape(B, H, W, g, C // g)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(B, H, W, C) * p["scale"] + p["bias"]


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _norm_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period=10000.0, dtype=jnp.float32
) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers flip_sin_to_cos=True convention."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=dtype) / half)
    args = t[:, None].astype(dtype) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def attention(q, k, v, heads):
    """q: [B, Nq, C], k/v: [B, Nk, C] -> [B, Nq, C]."""
    B, Nq, C = q.shape
    hd = C // heads

    def split(x):
        return x.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd), axis=-1
    )
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Nq, C)


# ---------------------------------------------------------------------------
# UNet blocks
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # head COUNT, int (SD1.5: 8 everywhere) or per-down-block tuple
    # (SD2: (5, 10, 20, 20), i.e. 64-dim heads)
    attention_head_dim: int | tuple = 8
    norm_groups: int = 32
    # which down blocks carry cross-attention (SD1.5: all but the last)
    attn_blocks: tuple = (True, True, True, False)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def heads_at(self, block_idx: int) -> int:
        ahd = self.attention_head_dim
        return ahd[block_idx] if isinstance(ahd, (tuple, list)) else ahd


def _init_resnet(key, cin, cout, temb_dim):
    k = jax.random.split(key, 4)
    p = {
        "norm1": _norm_init(cin),
        "conv1": _he_conv(k[0], 3, 3, cin, cout),
        "time_emb_proj": _he_linear(k[1], temb_dim, cout),
        "norm2": _norm_init(cout),
        "conv2": _he_conv(k[2], 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _he_conv(k[3], 1, 1, cin, cout)
    return p


def _resnet(p, x, temb, groups):
    h = conv2d(p["conv1"], jax.nn.silu(group_norm(p["norm1"], x, groups)))
    h = h + linear(p["time_emb_proj"], jax.nn.silu(temb))[:, None, None, :]
    h = conv2d(p["conv2"], jax.nn.silu(group_norm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, padding=0)
    return x + h


def _init_transformer(key, c, ctx_dim, heads):
    k = jax.random.split(key, 12)
    inner = c * 4

    def attn_init(kq, ctx):
        kk = jax.random.split(kq, 4)
        return {
            "to_q": {"w": jax.random.normal(kk[0], (c, c)) * (c**-0.5), "b": jnp.zeros((c,))},
            "to_k": {"w": jax.random.normal(kk[1], (c, ctx)) * (ctx**-0.5), "b": jnp.zeros((c,))},
            "to_v": {"w": jax.random.normal(kk[2], (c, ctx)) * (ctx**-0.5), "b": jnp.zeros((c,))},
            "to_out": _he_linear(kk[3], c, c),
        }

    return {
        "norm": _norm_init(c),
        "proj_in": _he_conv(k[0], 1, 1, c, c),
        "norm1": _norm_init(c),
        "attn1": attn_init(k[1], c),
        "norm2": _norm_init(c),
        "attn2": attn_init(k[2], ctx_dim),
        "norm3": _norm_init(c),
        "ff_geglu": _he_linear(k[3], c, inner * 2),
        "ff_out": _he_linear(k[4], inner, c),
        "proj_out": _he_conv(k[5], 1, 1, c, c),
    }


def _attn_apply(p, x, ctx, heads):
    q = x @ p["to_q"]["w"].T + p["to_q"]["b"]
    k = ctx @ p["to_k"]["w"].T + p["to_k"]["b"]
    v = ctx @ p["to_v"]["w"].T + p["to_v"]["b"]
    return linear(p["to_out"], attention(q, k, v, heads))


def _transformer(p, x, ctx, heads, groups):
    B, H, W, C = x.shape
    res = x
    h = group_norm(p["norm"], x, groups)
    h = conv2d(p["proj_in"], h, padding=0).reshape(B, H * W, C)
    h = h + _attn_apply(p["attn1"], layer_norm(p["norm1"], h), layer_norm(p["norm1"], h), heads)
    h = h + _attn_apply(p["attn2"], layer_norm(p["norm2"], h), ctx, heads)
    ff_in = layer_norm(p["norm3"], h)
    a, gate = jnp.split(linear(p["ff_geglu"], ff_in), 2, axis=-1)
    # diffusers GEGLU uses exact erf-gelu; jax.nn.gelu defaults to the tanh
    # approximation (~2e-4 divergence — caught by tests/test_sds_torch_parity)
    h = h + linear(p["ff_out"], a * jax.nn.gelu(gate, approximate=False))
    return conv2d(p["proj_out"], h.reshape(B, H, W, C), padding=0) + res


def init_unet_params(key: jax.Array, cfg: UNetConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    ch = cfg.block_out_channels
    temb = cfg.time_embed_dim

    params = {
        "conv_in": _he_conv(next(keys), 3, 3, cfg.in_channels, ch[0]),
        "time_mlp1": _he_linear(next(keys), ch[0], temb),
        "time_mlp2": _he_linear(next(keys), temb, temb),
        "down": [],
        "mid": {},
        "up": [],
        "norm_out": _norm_init(ch[0]),
        "conv_out": _he_conv(next(keys), 3, 3, ch[0], cfg.out_channels),
    }

    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {"resnets": [], "attns": [], "down": None}
        for _ in range(cfg.layers_per_block):
            block["resnets"].append(_init_resnet(next(keys), cin, cout, temb))
            if cfg.attn_blocks[i]:
                block["attns"].append(
                    _init_transformer(next(keys), cout, cfg.cross_attention_dim, cfg.attention_head_dim)
                )
            cin = cout
        if i < len(ch) - 1:
            block["down"] = _he_conv(next(keys), 3, 3, cout, cout)
        params["down"].append(block)

    params["mid"] = {
        "res1": _init_resnet(next(keys), ch[-1], ch[-1], temb),
        "attn": _init_transformer(next(keys), ch[-1], cfg.cross_attention_dim, cfg.attention_head_dim),
        "res2": _init_resnet(next(keys), ch[-1], ch[-1], temb),
    }

    rev = list(reversed(ch))
    cin = ch[-1]
    for i, cout in enumerate(rev):
        attn_here = list(reversed(cfg.attn_blocks))[i]
        skip_chs = []
        # skip channels arriving from the down path, in pop order
        block = {"resnets": [], "attns": [], "up": None}
        for j in range(cfg.layers_per_block + 1):
            skip_ch = rev[min(i + 1, len(ch) - 1)] if j == cfg.layers_per_block else cout
            # diffusers: skip channels pattern
            block["resnets"].append(
                _init_resnet(next(keys), cin + skip_ch, cout, temb)
            )
            if attn_here:
                block["attns"].append(
                    _init_transformer(next(keys), cout, cfg.cross_attention_dim, cfg.attention_head_dim)
                )
            cin = cout
        if i < len(ch) - 1:
            block["up"] = _he_conv(next(keys), 3, 3, cout, cout)
        params["up"].append(block)
    return params


def unet_apply(
    params: dict,
    cfg: UNetConfig,
    latents: jnp.ndarray,  # [B, C, h, w] (NCHW like diffusers)
    t: jnp.ndarray,  # [B]
    ctx: jnp.ndarray,  # [B, L, D]
) -> jnp.ndarray:
    g = cfg.norm_groups
    x = latents.transpose(0, 2, 3, 1)  # NHWC

    temb = timestep_embedding(t, cfg.block_out_channels[0], dtype=latents.dtype)
    temb = linear(params["time_mlp2"], jax.nn.silu(linear(params["time_mlp1"], temb)))

    h = conv2d(params["conv_in"], x)
    skips = [h]
    for i, block in enumerate(params["down"]):
        for j, res in enumerate(block["resnets"]):
            h = _resnet(res, h, temb, g)
            if block["attns"]:
                h = _transformer(block["attns"][j], h, ctx, cfg.heads_at(i), g)
            skips.append(h)
        if block["down"] is not None:
            h = conv2d(block["down"], h, stride=2)
            skips.append(h)

    n_blocks = len(cfg.block_out_channels)
    h = _resnet(params["mid"]["res1"], h, temb, g)
    h = _transformer(params["mid"]["attn"], h, ctx, cfg.heads_at(n_blocks - 1), g)
    h = _resnet(params["mid"]["res2"], h, temb, g)

    for i, block in enumerate(params["up"]):
        for j, res in enumerate(block["resnets"]):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(res, h, temb, g)
            if block["attns"]:
                h = _transformer(
                    block["attns"][j], h, ctx, cfg.heads_at(n_blocks - 1 - i), g
                )
        if block["up"] is not None:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = conv2d(block["up"], h)

    h = jax.nn.silu(group_norm(params["norm_out"], h, g))
    h = conv2d(params["conv_out"], h)
    return h.transpose(0, 3, 1, 2)  # back to NCHW


# ---------------------------------------------------------------------------
# VAE encoder (AutoencoderKL encoder half; reference uses .encode().mean)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215  # reference: models/diffusion.py:310


def init_vae_encoder_params(key: jax.Array, cfg: VAEConfig) -> dict:
    keys = iter(jax.random.split(key, 128))
    ch = cfg.block_out_channels
    params = {
        "conv_in": _he_conv(next(keys), 3, 3, cfg.in_channels, ch[0]),
        "down": [],
        "mid": {},
        "norm_out": _norm_init(ch[-1]),
        "conv_out": _he_conv(next(keys), 3, 3, ch[-1], 2 * cfg.latent_channels),
        "quant_conv": _he_conv(next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels),
    }
    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {"resnets": [], "down": None}
        for _ in range(cfg.layers_per_block):
            block["resnets"].append(_init_resnet(next(keys), cin, cout, temb_dim=4))
            cin = cout
        if i < len(ch) - 1:
            block["down"] = _he_conv(next(keys), 3, 3, cout, cout)
        params["down"].append(block)
    params["mid"] = {
        "res1": _init_resnet(next(keys), ch[-1], ch[-1], temb_dim=4),
        "attn": {
            "norm": _norm_init(ch[-1]),
            "to_q": _he_linear(next(keys), ch[-1], ch[-1]),
            "to_k": _he_linear(next(keys), ch[-1], ch[-1]),
            "to_v": _he_linear(next(keys), ch[-1], ch[-1]),
            "to_out": _he_linear(next(keys), ch[-1], ch[-1]),
        },
        "res2": _init_resnet(next(keys), ch[-1], ch[-1], temb_dim=4),
    }
    return params


def _vae_resnet(p, x, groups):
    zero_t = jnp.zeros((x.shape[0], p["time_emb_proj"]["w"].shape[1]))
    return _resnet(p, x, zero_t, groups)


def vae_encode_apply(params: dict, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, 3, H, W] in [0,1] -> deterministic scaled latent mean
    (reference: models/diffusion.py:304-312 -- posterior mean * 0.18215;
    the reference samples the posterior, we use the mean for determinism)."""
    g = cfg.norm_groups
    x = (images * 2.0 - 1.0).transpose(0, 2, 3, 1)
    h = conv2d(params["conv_in"], x)
    for block in params["down"]:
        for res in block["resnets"]:
            h = _vae_resnet(res, h, g)
        if block["down"] is not None:
            # diffusers pads asymmetrically ((0,1),(0,1)) for stride-2
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(block["down"], h, stride=2, padding=0)
    h = _vae_resnet(params["mid"]["res1"], h, g)
    # single-head self-attention
    B, H, W, C = h.shape
    a = group_norm(params["mid"]["attn"]["norm"], h, g).reshape(B, H * W, C)
    q = linear(params["mid"]["attn"]["to_q"], a)
    k = linear(params["mid"]["attn"]["to_k"], a)
    v = linear(params["mid"]["attn"]["to_v"], a)
    a = attention(q, k, v, heads=1)
    h = h + linear(params["mid"]["attn"]["to_out"], a).reshape(B, H, W, C)
    h = _vae_resnet(params["mid"]["res2"], h, g)
    h = jax.nn.silu(group_norm(params["norm_out"], h, g))
    h = conv2d(params["conv_out"], h)
    h = conv2d(params["quant_conv"], h, padding=0)
    mean, _logvar = jnp.split(h, 2, axis=-1)
    return mean.transpose(0, 3, 1, 2) * cfg.scaling_factor


def init_vae_decoder_params(key: jax.Array, cfg: VAEConfig) -> dict:
    """Decoder half (for txt2img / latent visualization;
    reference: models/diffusion.py:292-312 decode_latents)."""
    keys = iter(jax.random.split(key, 128))
    ch = tuple(reversed(cfg.block_out_channels))
    params = {
        "post_quant_conv": _he_conv(next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels),
        "conv_in": _he_conv(next(keys), 3, 3, cfg.latent_channels, ch[0]),
        "mid": {
            "res1": _init_resnet(next(keys), ch[0], ch[0], temb_dim=4),
            "attn": {
                "norm": _norm_init(ch[0]),
                "to_q": _he_linear(next(keys), ch[0], ch[0]),
                "to_k": _he_linear(next(keys), ch[0], ch[0]),
                "to_v": _he_linear(next(keys), ch[0], ch[0]),
                "to_out": _he_linear(next(keys), ch[0], ch[0]),
            },
            "res2": _init_resnet(next(keys), ch[0], ch[0], temb_dim=4),
        },
        "up": [],
        "norm_out": _norm_init(ch[-1]),
        "conv_out": _he_conv(next(keys), 3, 3, ch[-1], cfg.in_channels),
    }
    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {"resnets": [], "up": None}
        for _ in range(cfg.layers_per_block + 1):
            block["resnets"].append(_init_resnet(next(keys), cin, cout, temb_dim=4))
            cin = cout
        if i < len(ch) - 1:
            block["up"] = _he_conv(next(keys), 3, 3, cout, cout)
        params["up"].append(block)
    return params


def vae_decode_apply(params: dict, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B, C, h, w] (scaled) -> images [B, 3, H, W] in [0, 1]."""
    g = cfg.norm_groups
    z = (latents / cfg.scaling_factor).transpose(0, 2, 3, 1)
    h = conv2d(params["post_quant_conv"], z, padding=0)
    h = conv2d(params["conv_in"], h)
    h = _vae_resnet(params["mid"]["res1"], h, g)
    B, H, W, C = h.shape
    a = group_norm(params["mid"]["attn"]["norm"], h, g).reshape(B, H * W, C)
    a = attention(
        linear(params["mid"]["attn"]["to_q"], a),
        linear(params["mid"]["attn"]["to_k"], a),
        linear(params["mid"]["attn"]["to_v"], a),
        heads=1,
    )
    h = h + linear(params["mid"]["attn"]["to_out"], a).reshape(B, H, W, C)
    h = _vae_resnet(params["mid"]["res2"], h, g)
    for block in params["up"]:
        for res in block["resnets"]:
            h = _vae_resnet(res, h, g)
        if block["up"] is not None:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = conv2d(block["up"], h)
    h = jax.nn.silu(group_norm(params["norm_out"], h, g))
    h = conv2d(params["conv_out"], h)
    img = (h.transpose(0, 3, 1, 2) + 1.0) / 2.0
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 77


def init_clip_text_params(key: jax.Array, cfg: CLIPTextConfig) -> dict:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    params = {
        "tok_emb": jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02,
        "pos_emb": jax.random.normal(next(keys), (cfg.max_len, d)) * 0.01,
        "layers": [],
        "final_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                "q": _he_linear(next(keys), d, d),
                "k": _he_linear(next(keys), d, d),
                "v": _he_linear(next(keys), d, d),
                "out": _he_linear(next(keys), d, d),
                "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                "fc1": _he_linear(next(keys), d, d * 4),
                "fc2": _he_linear(next(keys), d * 4, d),
            }
        )
    return params


def clip_text_apply(params: dict, cfg: CLIPTextConfig, input_ids: jnp.ndarray) -> jnp.ndarray:
    """input_ids: [B, L] -> [B, L, D] last hidden state (causal CLIP)."""
    B, L = input_ids.shape
    h = params["tok_emb"][input_ids] + params["pos_emb"][:L]
    causal = jnp.tril(jnp.ones((L, L), bool))
    for layer in params["layers"]:
        a_in = layer_norm(layer["ln1"], h)
        q = linear(layer["q"], a_in)
        k = linear(layer["k"], a_in)
        v = linear(layer["v"], a_in)
        hd = cfg.hidden_size // cfg.num_heads

        def split(x):
            return x.reshape(B, L, cfg.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / math.sqrt(hd)
        attn = jnp.where(causal[None, None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v)).transpose(0, 2, 1, 3).reshape(B, L, -1)
        h = h + linear(layer["out"], o)
        f_in = layer_norm(layer["ln2"], h)
        # CLIP uses quick_gelu
        f = linear(layer["fc1"], f_in)
        f = f * jax.nn.sigmoid(1.702 * f)
        h = h + linear(layer["fc2"], f)
    return layer_norm(params["final_norm"], h)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion + module assembly
# ---------------------------------------------------------------------------


class KeyAudit(dict):
    """State-dict wrapper that records which keys a converter consumed.

    ``tools/preflight_sd.py`` wraps a user-supplied diffusers/transformers
    state_dict in this before conversion; afterwards ``consumed`` holds every
    fully-prefixed key the converter read (``__getitem__``) or observed
    (``__contains__`` hits), so unconsumed keys — the symptom of a layout or
    config mismatch — can be reported loudly instead of silently dropped.
    ``_strip_prefix`` propagates the audit into prefix-stripped sub-dicts.
    """

    def __init__(self, data, consumed: set | None = None, prefix: str = ""):
        super().__init__(data)
        self.consumed = consumed if consumed is not None else set()
        self.prefix = prefix

    def __missing__(self, k):
        raise KeyError(self.prefix + k)

    def __getitem__(self, k):
        v = super().__getitem__(k)
        self.consumed.add(self.prefix + k)
        return v

    def __contains__(self, k):
        if super().__contains__(k):
            self.consumed.add(self.prefix + k)
            return True
        return False


def _t2j_conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])  # torch OIHW
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # -> HWIO
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def _t2j_linear(sd, prefix, bias=True):
    out = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]))}
    out["b"] = (
        jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
        if bias and f"{prefix}.bias" in sd
        else jnp.zeros((out["w"].shape[0],))
    )
    return out


def _t2j_norm(sd, prefix):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def unet_params_from_torch(sd: dict, cfg: UNetConfig = UNetConfig()) -> dict:
    """Convert a diffusers UNet2DConditionModel state_dict (torch tensors or
    numpy arrays) to our pytree. Key layout: diffusers >= 0.14."""

    def resnet(prefix):
        p = {
            "norm1": _t2j_norm(sd, f"{prefix}.norm1"),
            "conv1": _t2j_conv(sd, f"{prefix}.conv1"),
            "time_emb_proj": _t2j_linear(sd, f"{prefix}.time_emb_proj"),
            "norm2": _t2j_norm(sd, f"{prefix}.norm2"),
            "conv2": _t2j_conv(sd, f"{prefix}.conv2"),
        }
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["shortcut"] = _t2j_conv(sd, f"{prefix}.conv_shortcut")
        return p

    def transformer(prefix):
        blk = f"{prefix}.transformer_blocks.0"
        return {
            "norm": _t2j_norm(sd, f"{prefix}.norm"),
            "proj_in": _t2j_conv(sd, f"{prefix}.proj_in"),
            "norm1": _t2j_norm(sd, f"{blk}.norm1"),
            "attn1": {
                "to_q": _t2j_linear(sd, f"{blk}.attn1.to_q", bias=False),
                "to_k": _t2j_linear(sd, f"{blk}.attn1.to_k", bias=False),
                "to_v": _t2j_linear(sd, f"{blk}.attn1.to_v", bias=False),
                "to_out": _t2j_linear(sd, f"{blk}.attn1.to_out.0"),
            },
            "norm2": _t2j_norm(sd, f"{blk}.norm2"),
            "attn2": {
                "to_q": _t2j_linear(sd, f"{blk}.attn2.to_q", bias=False),
                "to_k": _t2j_linear(sd, f"{blk}.attn2.to_k", bias=False),
                "to_v": _t2j_linear(sd, f"{blk}.attn2.to_v", bias=False),
                "to_out": _t2j_linear(sd, f"{blk}.attn2.to_out.0"),
            },
            "norm3": _t2j_norm(sd, f"{blk}.norm3"),
            "ff_geglu": _t2j_linear(sd, f"{blk}.ff.net.0.proj"),
            "ff_out": _t2j_linear(sd, f"{blk}.ff.net.2"),
            "proj_out": _t2j_conv(sd, f"{prefix}.proj_out"),
        }

    params = {
        "conv_in": _t2j_conv(sd, "conv_in"),
        "time_mlp1": _t2j_linear(sd, "time_embedding.linear_1"),
        "time_mlp2": _t2j_linear(sd, "time_embedding.linear_2"),
        "norm_out": _t2j_norm(sd, "conv_norm_out"),
        "conv_out": _t2j_conv(sd, "conv_out"),
        "down": [],
        "up": [],
        "mid": {
            "res1": resnet("mid_block.resnets.0"),
            "attn": transformer("mid_block.attentions.0"),
            "res2": resnet("mid_block.resnets.1"),
        },
    }
    for i in range(len(cfg.block_out_channels)):
        block = {"resnets": [], "attns": [], "down": None}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(resnet(f"down_blocks.{i}.resnets.{j}"))
            if cfg.attn_blocks[i]:
                block["attns"].append(transformer(f"down_blocks.{i}.attentions.{j}"))
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["down"] = _t2j_conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
        params["down"].append(block)
    for i in range(len(cfg.block_out_channels)):
        attn_here = list(reversed(cfg.attn_blocks))[i]
        block = {"resnets": [], "attns": [], "up": None}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(resnet(f"up_blocks.{i}.resnets.{j}"))
            if attn_here:
                block["attns"].append(transformer(f"up_blocks.{i}.attentions.{j}"))
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["up"] = _t2j_conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
        params["up"].append(block)
    return params


def _strip_prefix(sd: dict, prefix: str) -> dict:
    """Sub-dict of keys under ``prefix`` (prefix removed); {} if none.
    Preserves a KeyAudit wrapper so consumption tracking survives stripping."""
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if isinstance(sd, KeyAudit) and out:
        return KeyAudit(out, sd.consumed, sd.prefix + prefix)
    return out


def _t2j_attn_block(sd, prefix):
    """Diffusers VAE mid-attention. Handles both key eras:
    <=0.16 AttentionBlock (group_norm/query/key/value/proj_attn) and
    >=0.17 Attention (group_norm/to_q/to_k/to_v/to_out.0)."""
    if f"{prefix}.query.weight" in sd:
        names = {"q": "query", "k": "key", "v": "value", "o": "proj_attn"}
    else:
        names = {"q": "to_q", "k": "to_k", "v": "to_v", "o": "to_out.0"}
    return {
        "norm": _t2j_norm(sd, f"{prefix}.group_norm"),
        "to_q": _t2j_linear(sd, f"{prefix}.{names['q']}"),
        "to_k": _t2j_linear(sd, f"{prefix}.{names['k']}"),
        "to_v": _t2j_linear(sd, f"{prefix}.{names['v']}"),
        "to_out": _t2j_linear(sd, f"{prefix}.{names['o']}"),
    }


def _t2j_vae_resnet(sd, prefix, temb_dim: int = 4):
    """VAE resnets carry no time embedding in diffusers; our shared _resnet
    block expects a time_emb_proj, so synthesize a zero one (silu(0)@0+0=0)."""
    cout = np.asarray(sd[f"{prefix}.conv2.bias"]).shape[0]
    p = {
        "norm1": _t2j_norm(sd, f"{prefix}.norm1"),
        "conv1": _t2j_conv(sd, f"{prefix}.conv1"),
        "time_emb_proj": {
            "w": jnp.zeros((cout, temb_dim)),
            "b": jnp.zeros((cout,)),
        },
        "norm2": _t2j_norm(sd, f"{prefix}.norm2"),
        "conv2": _t2j_conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["shortcut"] = _t2j_conv(sd, f"{prefix}.conv_shortcut")
    return p


def vae_encoder_params_from_torch(sd: dict, cfg: VAEConfig = VAEConfig()) -> dict:
    """Convert a diffusers AutoencoderKL state_dict (full model or encoder
    half) to our encoder pytree. Accepts ``encoder.``-prefixed keys plus the
    top-level ``quant_conv``."""
    enc = _strip_prefix(sd, "encoder.") or sd
    params = {
        "conv_in": _t2j_conv(enc, "conv_in"),
        "down": [],
        "mid": {
            "res1": _t2j_vae_resnet(enc, "mid_block.resnets.0"),
            "attn": _t2j_attn_block(enc, "mid_block.attentions.0"),
            "res2": _t2j_vae_resnet(enc, "mid_block.resnets.1"),
        },
        "norm_out": _t2j_norm(enc, "conv_norm_out"),
        "conv_out": _t2j_conv(enc, "conv_out"),
        "quant_conv": _t2j_conv(sd, "quant_conv")
        if "quant_conv.weight" in sd
        else _t2j_conv(enc, "quant_conv"),
    }
    for i in range(len(cfg.block_out_channels)):
        block = {"resnets": [], "down": None}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_t2j_vae_resnet(enc, f"down_blocks.{i}.resnets.{j}"))
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in enc:
            block["down"] = _t2j_conv(enc, f"down_blocks.{i}.downsamplers.0.conv")
        params["down"].append(block)
    return params


def vae_decoder_params_from_torch(sd: dict, cfg: VAEConfig = VAEConfig()) -> dict:
    """Decoder half + post_quant_conv (diffusers AutoencoderKL layout)."""
    dec = _strip_prefix(sd, "decoder.") or sd
    params = {
        "post_quant_conv": _t2j_conv(sd, "post_quant_conv")
        if "post_quant_conv.weight" in sd
        else _t2j_conv(dec, "post_quant_conv"),
        "conv_in": _t2j_conv(dec, "conv_in"),
        "mid": {
            "res1": _t2j_vae_resnet(dec, "mid_block.resnets.0"),
            "attn": _t2j_attn_block(dec, "mid_block.attentions.0"),
            "res2": _t2j_vae_resnet(dec, "mid_block.resnets.1"),
        },
        "up": [],
        "norm_out": _t2j_norm(dec, "conv_norm_out"),
        "conv_out": _t2j_conv(dec, "conv_out"),
    }
    for i in range(len(cfg.block_out_channels)):
        block = {"resnets": [], "up": None}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_t2j_vae_resnet(dec, f"up_blocks.{i}.resnets.{j}"))
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in dec:
            block["up"] = _t2j_conv(dec, f"up_blocks.{i}.upsamplers.0.conv")
        params["up"].append(block)
    return params


def clip_text_params_from_torch(sd: dict, cfg: CLIPTextConfig = CLIPTextConfig()) -> dict:
    """Convert a transformers CLIPTextModel state_dict to our pytree."""
    tm = _strip_prefix(sd, "text_model.") or sd
    params = {
        "tok_emb": jnp.asarray(np.asarray(tm["embeddings.token_embedding.weight"])),
        "pos_emb": jnp.asarray(np.asarray(tm["embeddings.position_embedding.weight"])),
        "layers": [],
        "final_norm": _t2j_norm(tm, "final_layer_norm"),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": _t2j_norm(tm, f"{pre}.layer_norm1"),
                "q": _t2j_linear(tm, f"{pre}.self_attn.q_proj"),
                "k": _t2j_linear(tm, f"{pre}.self_attn.k_proj"),
                "v": _t2j_linear(tm, f"{pre}.self_attn.v_proj"),
                "out": _t2j_linear(tm, f"{pre}.self_attn.out_proj"),
                "ln2": _t2j_norm(tm, f"{pre}.layer_norm2"),
                "fc1": _t2j_linear(tm, f"{pre}.mlp.fc1"),
                "fc2": _t2j_linear(tm, f"{pre}.mlp.fc2"),
            }
        )
    return params


def _load_state_dict(path: str):
    """torch.load a state_dict file; unwraps {'state_dict': ...} containers."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v for k, v in sd.items()}


def load_stable_diffusion_modules(
    path: str,
    version: str = "1.5",
    *,
    unet_config: UNetConfig | None = None,
    vae_config: VAEConfig | None = None,
    clip_config: CLIPTextConfig | None = None,
    image_size: int = 512,
):
    """Assemble GuidanceModules from a directory of user-supplied torch
    state_dicts (this container has no network access, so weights arrive as
    files the way the reference's arrive from the HF hub —
    reference: models/diffusion.py:53-64):

        <path>/unet.pt            diffusers UNet2DConditionModel state_dict
        <path>/vae.pt             diffusers AutoencoderKL state_dict
        <path>/text_encoder.pt    transformers CLIPTextModel state_dict
        <path>/tokenizer/merges.txt  (+ optional vocab.json)

    ``version='2.0'`` selects the depth-conditioned SD-2 geometry
    (in_channels=5, 1024-dim context, per-block head counts; reference:
    models/diffusion.py:44-49) — supply matching weights.
    """
    import os

    from avatarcraft_tpu.models.clip_tokenizer import CLIPTokenizer
    from avatarcraft_tpu.models.diffusion import GuidanceModules

    if version == "2.0":
        ucfg = unet_config or UNetConfig(
            in_channels=5,
            cross_attention_dim=1024,
            attention_head_dim=(5, 10, 20, 20),
        )
        tcfg = clip_config or CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16)
    else:
        ucfg = unet_config or UNetConfig()
        tcfg = clip_config or CLIPTextConfig()
    vcfg = vae_config or VAEConfig()

    unet_params = unet_params_from_torch(_load_state_dict(os.path.join(path, "unet.pt")), ucfg)
    vae_sd = _load_state_dict(os.path.join(path, "vae.pt"))
    vae_enc = vae_encoder_params_from_torch(vae_sd, vcfg)
    vae_dec = (
        vae_decoder_params_from_torch(vae_sd, vcfg)
        if any(k.startswith("decoder.") for k in vae_sd)
        else None
    )
    clip_params = clip_text_params_from_torch(
        _load_state_dict(os.path.join(path, "text_encoder.pt")), tcfg
    )
    tokenizer = CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer"))

    def text_encode(prompts: list[str]):
        ids = jnp.asarray(tokenizer(prompts, max_length=tcfg.max_len), jnp.int32)
        return clip_text_apply(clip_params, tcfg, ids)

    return GuidanceModules(
        unet=lambda l, t, c: unet_apply(unet_params, ucfg, l, t, c),
        vae_encode=lambda im: vae_encode_apply(vae_enc, vcfg, im),
        text_encode=text_encode,
        latent_scale=2 ** (len(vcfg.block_out_channels) - 1),
        image_size=image_size,
        vae_decode=(lambda lat: vae_decode_apply(vae_dec, vcfg, lat)) if vae_dec else None,
        tokenizer=tokenizer,
        configs={"unet": ucfg, "vae": vcfg, "clip": tcfg},
        use_depth=(version == "2.0"),
    )
