"""Legacy vanilla NeRF (reference: models/nerf.py:18-261).

Kept for capability parity with the reference's NeuMan-era helpers: an
8x256 density+color MLP over positional encodings (including the 45-degree
'rotate' Fourier mapping used for the canonical space,
reference: models/nerf.py:45-59) and the classic raw2outputs volume
compositing (reference: utils/render_utils.py:213-250).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.ops.freq_encoder import (
    freq_encode,
    freq_encode_dim,
    freq_encode_rotated,
)


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    depth: int = 8
    width: int = 256
    skip_layer: int = 4
    multires: int = 10
    multires_view: int = 4
    use_viewdirs: bool = True
    mapping: str = "identity"  # or "rotate"

    @property
    def pos_dim(self) -> int:
        if self.mapping == "rotate":
            return 3 + 6 * self.multires  # reference: models/nerf.py:45-59
        return freq_encode_dim(self.multires)

    @property
    def view_dim(self) -> int:
        return freq_encode_dim(self.multires_view)


def init_nerf_params(key: jax.Array, cfg: NeRFConfig) -> dict:
    keys = iter(jax.random.split(key, 64))

    def linear(i, o):
        b = 1.0 / np.sqrt(i)
        return {
            "w": jax.random.uniform(next(keys), (o, i), minval=-b, maxval=b).astype(jnp.float32),
            "b": jnp.zeros((o,), jnp.float32),
        }

    trunk = []
    in_dim = cfg.pos_dim
    for l in range(cfg.depth):
        trunk.append(linear(in_dim, cfg.width))
        # reference (models/nerf.py: skips=[4]) concatenates AFTER trunk layer
        # `skip_layer`, widening the NEXT layer's input by pos_dim (a skip at
        # the final trunk layer would feed nothing, so it is ignored there)
        skip_here = l == cfg.skip_layer and l < cfg.depth - 1
        in_dim = cfg.pos_dim + cfg.width if skip_here else cfg.width
    params = {"trunk": trunk, "sigma": linear(cfg.width, 1)}
    if cfg.use_viewdirs:
        params["feature"] = linear(cfg.width, cfg.width)
        params["view"] = linear(cfg.width + cfg.view_dim, cfg.width // 2)
        params["rgb"] = linear(cfg.width // 2, 3)
    else:
        params["rgb"] = linear(cfg.width, 3)
    return params


def _encode(x, cfg: NeRFConfig):
    if cfg.mapping == "rotate":
        return freq_encode_rotated(x, cfg.multires)
    return freq_encode(x, cfg.multires)


def nerf_forward(
    params: dict, x: jnp.ndarray, d: jnp.ndarray | None, cfg: NeRFConfig
) -> jnp.ndarray:
    """[N,3](,[N,3]) -> [N,4] (rgb logits passed through sigmoid + raw sigma)."""
    enc = _encode(x, cfg)
    h = enc
    for l, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(h @ layer["w"].T + layer["b"])
        if l == cfg.skip_layer and l < cfg.depth - 1:
            # reference order torch.cat([input_pts, h]) (models/nerf.py)
            h = jnp.concatenate([enc, h], axis=-1)
    sigma = h @ params["sigma"]["w"].T + params["sigma"]["b"]
    if cfg.use_viewdirs:
        assert d is not None
        feat = h @ params["feature"]["w"].T + params["feature"]["b"]
        h = jnp.concatenate([feat, freq_encode(d, cfg.multires_view)], axis=-1)
        h = jax.nn.relu(h @ params["view"]["w"].T + params["view"]["b"])
    rgb = h @ params["rgb"]["w"].T + params["rgb"]["b"]
    return jnp.concatenate([rgb, sigma], axis=-1)


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    white_bkg: bool = True,
) -> dict:
    """Classic NeRF compositing (reference: utils/render_utils.py:213-250).

    raw: [N, T, 4], z_vals: [N, T], rays_d: [N, 3].
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    ) * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10)
    )
    if white_bkg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return {
        "rgb": rgb_map,
        "disp": disp_map,
        "acc": acc_map,
        "weights": weights,
        "depth": depth_map,
    }


def render_nerf_rays(
    params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: NeRFConfig,
    near: float = 1.0,
    far: float = 4.0,
    n_samples: int = 128,
    white_bkg: bool = True,
) -> dict:
    """render_nerf_naive equivalent (reference: utils/render_utils.py:381-452)."""
    N = rays_o.shape[0]
    t = jnp.linspace(0.0, 1.0, n_samples)
    z_vals = near * (1 - t) + far * t
    z_vals = jnp.broadcast_to(z_vals, (N, n_samples))
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    raw = nerf_forward(
        params, pts.reshape(-1, 3), dirs.reshape(-1, 3), cfg
    ).reshape(N, n_samples, 4)
    return raw2outputs(raw, z_vals, rays_d, white_bkg=white_bkg)
