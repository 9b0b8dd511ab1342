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


def params_to_torch_state_dict(params: dict):
    """Export our params pytree as a reference-compatible state_dict."""
    import torch

    def t(x):
        return torch.from_numpy(np.array(x, np.float32, copy=True))

    state = {}
    if "table" in params:
        state["encoder.embeddings"] = t(params["table"])
    else:
        # pyramid encoder: framework-native keys (not loadable by the
        # reference, which has no such encoder; round-trips through ours)
        for i, g in enumerate(params.get("grids", [])):
            state[f"pyramid.grids.{i}"] = t(g)
        for i, p in enumerate(params.get("planes", [])):
            state[f"pyramid.planes.{i}"] = t(p)
    for l, layer in enumerate(params["sdf"]):
        state[f"sdf_net.{l}.weight_v"] = t(layer["v"])
        state[f"sdf_net.{l}.weight_g"] = t(layer["g"]).reshape(-1, 1)
        state[f"sdf_net.{l}.bias"] = t(layer["b"])
    for l, layer in enumerate(params["color"]):
        state[f"color_net.{l}.weight_v"] = t(layer["v"])
        state[f"color_net.{l}.weight_g"] = t(layer["g"]).reshape(-1, 1)
    state["deviation_net.variance"] = t(params["variance"]).reshape(())
    return state


def save_torch_checkpoint(params: dict, path: str) -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(params_to_torch_state_dict(params), path)


def safe_load_params(path: str, like: dict | None = None) -> dict:
    """Tolerant loader: orbax dir or torch file
    (parallels utils/utils.py:284-315 safe_load_weights)."""
    if os.path.isdir(path):
        return load_checkpoint(path, like)
    return load_torch_checkpoint(path)
