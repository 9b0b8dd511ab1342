"""Checkpoint round-trips: orbax-native and torch state-dict interop."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    forward_sdf,
    init_field_params,
)
from avatarcraft_tpu.ops.hash_encoder import HashGridSpec
from avatarcraft_tpu.utils.checkpoint import (
    load_checkpoint,
    params_from_torch_state_dict,
    params_to_torch_state_dict,
    save_checkpoint,
    save_torch_checkpoint,
    load_torch_checkpoint,
)

CFG = FieldConfig(
    grid=HashGridSpec(num_levels=4, base_resolution=4, log2_hashmap_size=10, desired_resolution=32)
)


def test_orbax_roundtrip(tmp_path):
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    save_checkpoint(str(tmp_path / "ckpt"), params)
    loaded = load_checkpoint(str(tmp_path / "ckpt"), params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_statedict_roundtrip(tmp_path):
    params = init_field_params(jax.random.PRNGKey(1), CFG)
    p = str(tmp_path / "net.pth.tar")
    save_torch_checkpoint(params, p)
    loaded = load_torch_checkpoint(p)
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=-1, maxval=1)
    out_a = forward_sdf(params, x, CFG, 1.6)
    out_b = forward_sdf(loaded, x, CFG, 1.6)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_weight_norm_matches_torch_linear():
    """Our (v, g, b) forward == torch weight_norm Linear forward."""
    import torch
    import torch.nn as nn

    rng = np.random.default_rng(3)
    lin = nn.Linear(8, 5)
    lin = nn.utils.weight_norm(lin)
    x = rng.normal(size=(7, 8)).astype(np.float32)
    with torch.no_grad():
        want = lin(torch.from_numpy(x)).numpy()

    sd = {k: v.detach() for k, v in lin.state_dict().items()}
    # build a 1-layer params pytree using the converter's layout
    state = {
        "encoder.embeddings": torch.zeros(4, 2),
        "sdf_net.0.weight_v": sd["weight_v"],
        "sdf_net.0.weight_g": sd["weight_g"],
        "sdf_net.0.bias": sd["bias"],
        "deviation_net.variance": torch.tensor(0.3),
    }
    params = params_from_torch_state_dict(state)
    from avatarcraft_tpu.models.instant_nsr import _weight_norm_apply

    w = _weight_norm_apply(params["sdf"][0])
    got = np.asarray(jnp.asarray(x) @ w.T + params["sdf"][0]["b"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_layout_matches_reference_keys():
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    sd = params_to_torch_state_dict(params)
    assert "encoder.embeddings" in sd
    assert "sdf_net.0.weight_g" in sd and sd["sdf_net.0.weight_g"].shape == (64, 1)
    assert "sdf_net.1.weight_v" in sd
    assert "color_net.2.weight_v" in sd and sd["color_net.2.weight_v"].shape[0] == 3
    assert sd["deviation_net.variance"].ndim == 0


def test_field_config_sidecar_roundtrip(tmp_path):
    """save_params_with_config -> load_params_with_config restores the exact
    FieldConfig (sidecar JSON) next to a reference-compatible state_dict."""
    import dataclasses

    from avatarcraft_tpu.models.instant_nsr import FieldConfig, init_field_params
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
    from avatarcraft_tpu.utils.checkpoint import (
        load_params_with_config,
        save_params_with_config,
    )

    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(8, 16), grid_dim=2, plane_resolutions=(33,), plane_dim=2
        ),
        hidden_dim=32,
        geo_feat_dim=7,
        use_viewdirs=True,
        mlp_dtype="bfloat16",
    )
    params = init_field_params(jax.random.PRNGKey(0), fcfg)
    path = str(tmp_path / "ckpt.pth.tar")
    save_params_with_config(jax.device_get(params), path, fcfg)
    params2, fcfg2 = load_params_with_config(path)
    assert fcfg2 == fcfg
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_field_config_inference_without_sidecar(tmp_path):
    """Sidecar-less (legacy/reference) checkpoints: the config is inferred
    from the params shapes — encoder kind, pyramid geometry, MLP dims,
    include_input, use_viewdirs/sh_degree."""
    from avatarcraft_tpu.models.instant_nsr import FieldConfig, init_field_params
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
    from avatarcraft_tpu.utils.checkpoint import (
        infer_field_config,
        load_params_with_config,
        save_torch_checkpoint,
    )

    for fcfg in [
        FieldConfig(encoder="hashgrid"),
        FieldConfig(encoder="hashgrid", use_viewdirs=True),
        FieldConfig(
            encoder="tpu_pyramid",
            pyramid=PyramidSpec(
                grid_resolutions=(8, 16), grid_dim=2,
                plane_resolutions=(33, 65), plane_dim=4,
            ),
            hidden_dim=32,
            num_layers_color=2,
        ),
    ]:
        params = init_field_params(jax.random.PRNGKey(1), fcfg)
        got = infer_field_config(jax.device_get(params))
        assert got.encoder == fcfg.encoder
        assert got.hidden_dim == fcfg.hidden_dim
        assert got.geo_feat_dim == fcfg.geo_feat_dim
        assert got.use_viewdirs == fcfg.use_viewdirs
        assert got.include_input == fcfg.include_input
        if fcfg.encoder == "tpu_pyramid":
            assert got.pyramid == fcfg.pyramid

        path = str(tmp_path / f"legacy_{fcfg.encoder}_{fcfg.use_viewdirs}.pth.tar")
        save_torch_checkpoint(jax.device_get(params), path)
        _, got2 = load_params_with_config(path)
        assert got2.encoder == fcfg.encoder
