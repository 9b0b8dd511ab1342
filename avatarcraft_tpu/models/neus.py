"""Legacy frequency-encoder NeuS path (reference: models/neus.py:88-883).

The reference keeps the original NeuS networks (8x256 SDF MLP with a skip
connection and frequency encoding, IDR-style rendering network, learned
variance) as a library capability -- the entry scripts raise
NotImplementedError for ``--implicit_model neus`` but the model itself is
importable and used by older helpers. Here the same capability plugs straight
into our NeuS render core through :class:`FieldFns`, so the full renderer
(importance upsampling, FD normals, compositing) is shared rather than
duplicated (the reference carries a second 400-line renderer,
models/neus.py:333-742).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.instant_nsr import FieldFns, _softplus100
from avatarcraft_tpu.ops.freq_encoder import freq_encode, freq_encode_dim


@dataclasses.dataclass(frozen=True)
class NeuSConfig:
    """Reference defaults (models/neus.py:88-118, 243-276)."""

    d_hidden: int = 256
    n_layers: int = 8
    skip_layer: int = 4
    multires: int = 6  # positional encoding bands for x
    multires_view: int = 4  # for view dirs in the rendering network
    d_feature: int = 256
    geometric_init: bool = True
    init_radius: float = 0.5
    variance_init: float = 0.3

    @property
    def d_in(self) -> int:
        return freq_encode_dim(self.multires)

    @property
    def color_d_in(self) -> int:
        # IDR input: [x, view, normal, feature]
        return 3 + freq_encode_dim(self.multires_view) + 3 + self.d_feature


def init_neus_params(key: jax.Array, cfg: NeuSConfig) -> dict:
    """SAL geometric init (sphere of radius ``init_radius``)
    mirroring models/neus.py:120-170."""
    keys = iter(jax.random.split(key, 64))
    d_in = cfg.d_in
    dims = [d_in] + [cfg.d_hidden] * (cfg.n_layers - 1) + [1 + cfg.d_feature]

    sdf_layers = []
    for l in range(len(dims) - 1):
        in_dim = dims[l]
        out_dim = dims[l + 1]
        if l == cfg.skip_layer:
            in_dim += d_in  # skip concat
        if not cfg.geometric_init:
            w = jax.random.normal(next(keys), (out_dim, in_dim)) * np.sqrt(2.0 / in_dim)
            b = jnp.zeros((out_dim,))
        elif l == len(dims) - 2:  # last layer
            w = jnp.full((out_dim, in_dim), 0.0)
            w = w.at[0].set(
                np.sqrt(np.pi / in_dim)
                + 1e-4 * jax.random.normal(next(keys), (in_dim,))
            )
            b = jnp.zeros((out_dim,)).at[0].set(-cfg.init_radius)
        elif l == 0:
            w = jnp.zeros((out_dim, in_dim))
            w = w.at[:, :3].set(
                jax.random.normal(next(keys), (out_dim, 3)) * np.sqrt(2.0 / out_dim)
            )
            b = jnp.zeros((out_dim,))
        elif l == cfg.skip_layer:
            # zero the weights over the concatenated encoding beyond raw xyz
            # (kills the cos(0)=1 channels; reference: models/neus.py:155-158)
            w = jax.random.normal(next(keys), (out_dim, in_dim)) * np.sqrt(2.0 / out_dim)
            w = w.at[:, cfg.d_hidden + 3 :].set(0.0)
            b = jnp.zeros((out_dim,))
        else:
            w = jax.random.normal(next(keys), (out_dim, in_dim)) * np.sqrt(2.0 / out_dim)
            b = jnp.zeros((out_dim,))
        sdf_layers.append({"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)})

    color_dims = [cfg.color_d_in] + [cfg.d_hidden] * 3 + [3]
    color_layers = []
    for l in range(len(color_dims) - 1):
        bound = 1.0 / np.sqrt(color_dims[l])
        w = jax.random.uniform(
            next(keys), (color_dims[l + 1], color_dims[l]), minval=-bound, maxval=bound
        )
        b = jnp.zeros((color_dims[l + 1],))
        color_layers.append({"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)})

    return {
        "sdf": sdf_layers,
        "color": color_layers,
        "variance": jnp.asarray(cfg.variance_init, jnp.float32),
    }


def neus_sdf(params: dict, x: jnp.ndarray, cfg: NeuSConfig) -> jnp.ndarray:
    """[N,3] -> [N, 1+d_feature] (models/neus.py:172-206)."""
    enc = freq_encode(x, cfg.multires)
    h = enc
    for l, layer in enumerate(params["sdf"]):
        if l == cfg.skip_layer:
            h = jnp.concatenate([h, enc], axis=-1) / np.sqrt(2.0)
        h = h @ layer["w"].T + layer["b"]
        if l != len(params["sdf"]) - 1:
            h = _softplus100(h)
    return h


def neus_color(
    params: dict,
    x: jnp.ndarray,
    d: jnp.ndarray,
    normal: jnp.ndarray,
    feat: jnp.ndarray,
    cfg: NeuSConfig,
) -> jnp.ndarray:
    """IDR rendering network (models/neus.py:243-322)."""
    d_enc = freq_encode(d, cfg.multires_view)
    h = jnp.concatenate([x, d_enc, normal, feat], axis=-1)
    for l, layer in enumerate(params["color"]):
        h = h @ layer["w"].T + layer["b"]
        if l != len(params["color"]) - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def build_neus(params: dict, cfg: NeuSConfig) -> FieldFns:
    """Factory mirroring models/neus.py:784 -- returns field functions that
    drop into render_rays(field=...)."""
    return FieldFns(
        sdf=lambda x: neus_sdf(params, x, cfg),
        color=lambda x, d, n, f: neus_color(params, x, d, n, f, cfg),
        inv_s=lambda: jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6),
    )
