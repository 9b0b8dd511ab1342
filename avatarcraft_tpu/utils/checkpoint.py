"""Checkpointing: orbax-native save/load plus bidirectional PyTorch
state-dict interop (so reference ``.pth.tar`` checkpoints load
bit-comparably and our checkpoints can be consumed by the reference).

Reference checkpoint layout (torch.save(net.state_dict()),
reference: stylize.py:255-260, reconstruct.py:143-148):

    encoder.embeddings                 [T, 2]
    sdf_net.{l}.bias                   [out]
    sdf_net.{l}.weight_g               [out, 1]   (weight-norm magnitude)
    sdf_net.{l}.weight_v               [out, in]  (weight-norm direction)
    color_net.{l}.weight_g / weight_v
    deviation_net.variance             scalar

Our pytree stores the same (v, g, b) decomposition so the mapping is exact.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax-native checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: dict) -> None:
    """Save a pytree (params / opt_state / step) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: dict | None = None) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Torch interop
# ---------------------------------------------------------------------------


def params_from_torch_state_dict(state: dict) -> dict:
    """Convert a reference NeRFNetwork state_dict to our params pytree."""

    def arr(key):
        t = state[key]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32))

    sdf_layers = []
    l = 0
    while f"sdf_net.{l}.weight_v" in state or f"sdf_net.{l}.weight" in state:
        if f"sdf_net.{l}.weight_v" in state:
            layer = {
                "v": arr(f"sdf_net.{l}.weight_v"),
                "g": arr(f"sdf_net.{l}.weight_g").reshape(-1),
                "b": arr(f"sdf_net.{l}.bias"),
            }
        else:  # non-weight-norm checkpoint: fold into v with unit g
            w = arr(f"sdf_net.{l}.weight")
            layer = {
                "v": w,
                "g": jnp.linalg.norm(w, axis=1),
                "b": arr(f"sdf_net.{l}.bias"),
            }
        sdf_layers.append(layer)
        l += 1

    color_layers = []
    l = 0
    while f"color_net.{l}.weight_v" in state or f"color_net.{l}.weight" in state:
        if f"color_net.{l}.weight_v" in state:
            layer = {
                "v": arr(f"color_net.{l}.weight_v"),
                "g": arr(f"color_net.{l}.weight_g").reshape(-1),
            }
        else:
            w = arr(f"color_net.{l}.weight")
            layer = {"v": w, "g": jnp.linalg.norm(w, axis=1)}
        color_layers.append(layer)
        l += 1

    out = {
        "sdf": sdf_layers,
        "color": color_layers,
        "variance": arr("deviation_net.variance").reshape(()),
    }
    if "encoder.embeddings" in state:
        out["table"] = arr("encoder.embeddings")
    else:
        grids, planes = [], []
        i = 0
        while f"pyramid.grids.{i}" in state:
            grids.append(arr(f"pyramid.grids.{i}"))
            i += 1
        i = 0
        while f"pyramid.planes.{i}" in state:
            planes.append(arr(f"pyramid.planes.{i}"))
            i += 1
        out["grids"], out["planes"] = grids, planes
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth.tar`` checkpoint into our params pytree."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_torch_state_dict(state)


def params_to_torch_state_dict(params: dict, table_dtype=None):
    """Export our params pytree as a reference-compatible state_dict.

    ``table_dtype`` (e.g. torch.float16): storage dtype for the big encoder
    tables only (they are consumed as bf16 packed tables at runtime anyway);
    MLP weights always stay fp32. Halves baked-artifact size."""
    import torch

    def t(x):
        return torch.from_numpy(np.array(x, np.float32, copy=True))

    def tt(x):
        out = t(x)
        return out.to(table_dtype) if table_dtype is not None else out

    state = {}
    if "table" in params:
        state["encoder.embeddings"] = tt(params["table"])
    else:
        # pyramid encoder: framework-native keys (not loadable by the
        # reference, which has no such encoder; round-trips through ours)
        for i, g in enumerate(params.get("grids", [])):
            state[f"pyramid.grids.{i}"] = tt(g)
        for i, p in enumerate(params.get("planes", [])):
            state[f"pyramid.planes.{i}"] = tt(p)
    for l, layer in enumerate(params["sdf"]):
        state[f"sdf_net.{l}.weight_v"] = t(layer["v"])
        state[f"sdf_net.{l}.weight_g"] = t(layer["g"]).reshape(-1, 1)
        state[f"sdf_net.{l}.bias"] = t(layer["b"])
    for l, layer in enumerate(params["color"]):
        state[f"color_net.{l}.weight_v"] = t(layer["v"])
        state[f"color_net.{l}.weight_g"] = t(layer["g"]).reshape(-1, 1)
    state["deviation_net.variance"] = t(params["variance"]).reshape(())
    return state


def save_torch_checkpoint(params: dict, path: str, table_dtype=None) -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(params_to_torch_state_dict(params, table_dtype), path)


def safe_load_params(path: str, like: dict | None = None) -> dict:
    """Tolerant loader: orbax dir or torch file
    (parallels utils/utils.py:284-315 safe_load_weights)."""
    if os.path.isdir(path):
        return load_checkpoint(path, like)
    return load_torch_checkpoint(path)


# ---------------------------------------------------------------------------
# Self-describing checkpoints: FieldConfig travels with the params
# ---------------------------------------------------------------------------


def field_config_to_dict(fcfg) -> dict:
    import dataclasses

    d = dataclasses.asdict(fcfg)
    return d


def field_config_from_dict(d: dict):
    from avatarcraft_tpu.models.instant_nsr import FieldConfig
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
    from avatarcraft_tpu.ops.hash_encoder import HashGridSpec

    d = dict(d)
    if "grid" in d:
        d["grid"] = HashGridSpec(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in d["grid"].items()
        })
    if "pyramid" in d:
        d["pyramid"] = PyramidSpec(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in d["pyramid"].items()
        })
    return FieldConfig(**d)


def infer_field_config(params: dict):
    """Recover a FieldConfig from the params pytree alone (legacy
    checkpoints without a sidecar): encoder type + pyramid geometry come from
    array shapes; MLP widths/depths from the layer list; ``use_viewdirs`` /
    ``include_input`` from the in-dims. Hash-table internals are not
    separable from the flat table, so the reference HashGridSpec defaults
    apply there (they are the only configuration the reference ships)."""
    from avatarcraft_tpu.models.instant_nsr import FieldConfig
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec

    kw = {}
    if "table" in params:
        kw["encoder"] = "hashgrid"
        enc_dim = FieldConfig().grid.output_dim
    else:
        grids = params.get("grids", [])
        planes = params.get("planes", [])
        spec = PyramidSpec(
            grid_resolutions=tuple(int(g.shape[0]) for g in grids),
            grid_dim=int(grids[0].shape[-1]) if grids else 0,
            plane_resolutions=tuple(int(p.shape[1]) for p in planes),
            plane_dim=int(planes[0].shape[-1]) if planes else 0,
        )
        kw["encoder"] = "tpu_pyramid"
        kw["pyramid"] = spec
        enc_dim = spec.output_dim

    sdf = params["sdf"]
    kw["num_layers"] = len(sdf)
    kw["hidden_dim"] = int(sdf[0]["v"].shape[0]) if len(sdf) > 1 else 64
    kw["geo_feat_dim"] = int(sdf[-1]["v"].shape[0]) - 1
    sdf_in = int(sdf[0]["v"].shape[1])
    kw["include_input"] = sdf_in == enc_dim + 3

    color = params["color"]
    kw["num_layers_color"] = len(color)
    kw["hidden_dim_color"] = int(color[0]["v"].shape[0]) if len(color) > 1 else 64
    color_in = int(color[0]["v"].shape[1])
    base = 3 + 3 + kw["geo_feat_dim"]  # [x, normal, geo_feat]
    extra = color_in - base
    if extra > 0:
        kw["use_viewdirs"] = True
        kw["sh_degree"] = int(round(np.sqrt(extra)))
    else:
        kw["use_viewdirs"] = False
    return FieldConfig(**kw)


def _sidecar_path(path: str) -> str:
    return path + ".fieldcfg.json"


def save_params_with_config(params: dict, path: str, fcfg=None, table_dtype=None) -> None:
    """save_torch_checkpoint + a sidecar JSON carrying the FieldConfig (the
    state_dict itself stays reference-compatible)."""
    import json

    save_torch_checkpoint(params, path, table_dtype)
    if fcfg is not None:
        with open(_sidecar_path(path), "w") as fp:
            json.dump(field_config_to_dict(fcfg), fp, indent=1)


def load_params_with_config(path: str, like: dict | None = None):
    """(params, FieldConfig). Config source order: sidecar JSON if present,
    else inferred from the params shapes (infer_field_config)."""
    import json

    params = safe_load_params(path, like)
    sidecar = _sidecar_path(path)
    if os.path.isfile(sidecar):
        with open(sidecar) as fp:
            return params, field_config_from_dict(json.load(fp))
    return params, infer_field_config(params)


def artifact_normal_mode(ckpt_path: str) -> str | None:
    """Normal estimator recorded next to a baked artifact checkpoint.

    tools/bake_artifact.py writes PROVENANCE.json alongside the .pth.tar;
    the color net is trained against one specific normal estimator, so
    renderers should default to the recorded mode when the user does not
    override it (mismatched normals cost ~1 dB; docs/PERFORMANCE.md)."""
    import json

    prov = os.path.join(os.path.dirname(os.path.abspath(ckpt_path)),
                        "PROVENANCE.json")
    if os.path.isfile(prov):
        try:
            with open(prov) as fp:
                return json.load(fp).get("normal_mode")
        except (OSError, ValueError):
            return None
    return None
