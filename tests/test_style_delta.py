"""tools/style_delta.py: sparse styled-field deltas round-trip exactly.

The verifiability artifact for styled avatars: instead of committing a full
~151 MB checkpoint per style, commit base + sparse delta (changed encoder
rows only — rows SDS never gathered have exactly zero Adam update). The
reference can only distribute full state_dicts (reference:
stylize.py:255-260)."""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from avatarcraft_tpu.models.instant_nsr import FieldConfig, init_field_params
from avatarcraft_tpu.utils.checkpoint import (
    field_config_to_dict,
    load_params_with_config,
    save_params_with_config,
)

import style_delta  # noqa: E402


def _make_pair(tmp_path):
    fcfg = FieldConfig(encoder="tpu_pyramid")
    base = jax.device_get(init_field_params(jax.random.PRNGKey(0), fcfg))
    leaves, treedef, paths = style_delta._flat_leaves(base)
    styled_leaves = [np.array(x, np.float32) for x in leaves]
    rng = np.random.default_rng(1)
    n_touched = 0
    for i, x in enumerate(styled_leaves):
        if x.size >= style_delta.SPARSE_MIN_ELEMS:
            rows = x.reshape(-1, x.shape[-1])
            idx = rng.choice(rows.shape[0], size=17, replace=False)
            rows[idx] += rng.standard_normal((17, rows.shape[1])).astype(np.float32) * 0.01
            n_touched += 17
        else:
            styled_leaves[i] = x + 0.001
    styled = jax.tree_util.tree_unflatten(treedef, styled_leaves)

    base_p = str(tmp_path / "base.pth.tar")
    styled_p = str(tmp_path / "styled.pth.tar")
    save_params_with_config(base, base_p, fcfg)
    save_params_with_config(styled, styled_p, fcfg)
    return base_p, styled_p, n_touched


def test_pack_unpack_roundtrip(tmp_path, capsys):
    base_p, styled_p, n_touched = _make_pair(tmp_path)
    delta_p = str(tmp_path / "d.npz")
    grid = np.zeros((9, 9, 9), np.float32)
    grid[4, 4, 4] = 50.0
    np.save(tmp_path / "grid.npy", grid)
    style_delta.main(
        ["pack", "--base", base_p, "--styled", styled_p, "--out", delta_p,
         "--grid", str(tmp_path / "grid.npy")]
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # sparse: only the touched rows are stored
    assert rep["sparse_rows_changed"] == n_touched
    assert os.path.getsize(delta_p) < 0.01 * os.path.getsize(styled_p)

    out_p = str(tmp_path / "restored.pth.tar")
    style_delta.main(
        ["unpack", "--base", base_p, "--delta", delta_p, "--out", out_p,
         "--grid_out", str(tmp_path / "grid_out.npy")]
    )
    restored, rcfg = load_params_with_config(out_p)
    styled, scfg = load_params_with_config(styled_p)
    assert field_config_to_dict(rcfg) == field_config_to_dict(scfg)
    rl, _, _ = style_delta._flat_leaves(restored)
    sl, _, _ = style_delta._flat_leaves(styled)
    bl, _, _ = style_delta._flat_leaves(load_params_with_config(base_p)[0])
    assert len(rl) == len(sl)
    for r, s, b in zip(rl, sl, bl):
        r = np.asarray(r, np.float32)
        s = np.asarray(s, np.float32)
        b = np.asarray(b, np.float32)
        # fp16 is applied to the DELTA, so error is bounded by the delta's
        # magnitude (~0.01 here) * fp16 eps, not the weights' magnitude
        np.testing.assert_allclose(r, s, atol=2e-5)
        if s.size >= style_delta.SPARSE_MIN_ELEMS:
            # untouched rows are bit-exact copies of the base
            rows_s = s.reshape(-1, s.shape[-1])
            rows_b = b.reshape(-1, b.shape[-1])
            rows_r = r.reshape(-1, r.shape[-1])
            mask = np.all(rows_s == rows_b, axis=1)
            np.testing.assert_array_equal(rows_r[mask], rows_b[mask])
    np.testing.assert_array_equal(np.load(tmp_path / "grid_out.npy"), grid)


def test_pack_rejects_mismatched_config(tmp_path):
    fcfg = FieldConfig(encoder="tpu_pyramid")
    base = jax.device_get(init_field_params(jax.random.PRNGKey(0), fcfg))
    base_p = str(tmp_path / "b.pth.tar")
    save_params_with_config(base, base_p, fcfg)
    other_cfg = FieldConfig(encoder="hashgrid")
    other = jax.device_get(init_field_params(jax.random.PRNGKey(1), other_cfg))
    other_p = str(tmp_path / "o.pth.tar")
    save_params_with_config(other, other_p, other_cfg)
    import pytest

    with pytest.raises(SystemExit):
        style_delta.main(
            ["pack", "--base", base_p, "--styled", other_p,
             "--out", str(tmp_path / "x.npz")]
        )
