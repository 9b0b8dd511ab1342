"""Pack / unpack a styled field as a SPARSE delta against its base artifact.

A stylized field (stylize.py / run_multi_stylize.py output) shares its base
canonical checkpoint's pytree, and SDS only ever gathers encoder rows near
the (0.4-1.6%-occupied) surface — rows never gathered get exactly zero
gradient on every step, so their Adam update is exactly zero and the delta
``styled - base`` is sparse in encoder rows. Storing just the changed rows
(indices + fp16 deltas) plus the small MLP tensors shrinks a 151 MB
checkpoint to a few MB, making committed styled-avatar claims re-checkable
in minutes instead of re-running a multi-hour SDS schedule (the reference's
styled avatars are only distributable as full ~100 MB state_dicts,
reference: stylize.py:255-260 torch.save of the whole net).

pack:   python tools/style_delta.py pack --base artifacts/canonical/bare_smpl_tpu.pth.tar \
            --styled style/toy/multi/multi_lava_2400.pth.tar --out artifacts/styled/lava_delta.npz
unpack: python tools/style_delta.py unpack --base artifacts/canonical/bare_smpl_tpu.pth.tar \
            --delta artifacts/styled/lava_delta.npz --out /tmp/lava.pth.tar
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tensors at least this many elements are stored sparsely (by changed
# last-dim rows); smaller ones (MLP weights, variance scalar) go dense fp32
SPARSE_MIN_ELEMS = 1 << 16


def _flat_leaves(params):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    return leaves, treedef, paths


def pack(base_path: str, styled_path: str, out_path: str, grid_path: str | None):
    import numpy as np

    from avatarcraft_tpu.utils.checkpoint import (
        field_config_to_dict,
        load_params_with_config,
    )

    base, fcfg_b = load_params_with_config(base_path)
    styled, fcfg_s = load_params_with_config(styled_path)
    if field_config_to_dict(fcfg_b) != field_config_to_dict(fcfg_s):
        raise SystemExit("base and styled FieldConfigs differ; delta needs a shared base")
    lb, treedef_b, paths = _flat_leaves(base)
    ls, treedef_s, _ = _flat_leaves(styled)
    if str(treedef_b) != str(treedef_s):
        raise SystemExit(f"pytree mismatch:\n{treedef_b}\n{treedef_s}")

    payload: dict = {}
    meta = {
        "base": os.path.basename(base_path),
        "tensors": [],
        "fieldcfg": field_config_to_dict(fcfg_b),
    }
    total_changed = total_rows = 0
    for i, (b, s) in enumerate(zip(lb, ls)):
        b = np.asarray(b)
        s = np.asarray(s)
        if b.shape != s.shape:
            raise SystemExit(f"leaf {i} ({paths[i]}): shape {b.shape} != {s.shape}")
        d = s.astype(np.float32) - b.astype(np.float32)
        if d.size >= SPARSE_MIN_ELEMS and d.ndim >= 1:
            rows = d.reshape(-1, d.shape[-1])
            idx = np.nonzero(np.any(rows != 0.0, axis=1))[0]
            payload[f"idx:{i}"] = idx.astype(np.int64)
            payload[f"val:{i}"] = rows[idx].astype(np.float16)
            meta["tensors"].append(
                {
                    "leaf": i,
                    "path": paths[i],
                    "mode": "sparse_rows",
                    "shape": list(d.shape),
                    "rows_changed": int(idx.size),
                    "rows_total": int(rows.shape[0]),
                }
            )
            total_changed += int(idx.size)
            total_rows += int(rows.shape[0])
        else:
            payload[f"dense:{i}"] = d.astype(np.float32)
            meta["tensors"].append(
                {"leaf": i, "path": paths[i], "mode": "dense", "shape": list(d.shape)}
            )
    if grid_path and os.path.exists(grid_path):
        payload["grid"] = np.load(grid_path).astype(np.float16)
        meta["grid"] = True
    payload["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(out_path, **payload)
    print(
        json.dumps(
            {
                "out": out_path,
                "bytes": os.path.getsize(out_path),
                "sparse_rows_changed": total_changed,
                "sparse_rows_total": total_rows,
            }
        )
    )


def unpack(base_path: str, delta_path: str, out_path: str, grid_out: str | None):
    import jax
    import numpy as np

    from avatarcraft_tpu.utils.checkpoint import (
        field_config_from_dict,
        load_params_with_config,
        save_params_with_config,
    )

    base, _ = load_params_with_config(base_path)
    z = np.load(delta_path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    leaves, treedef, _ = _flat_leaves(base)
    out_leaves = list(leaves)
    for info in meta["tensors"]:
        i = info["leaf"]
        b = np.asarray(leaves[i], np.float32)
        if info["mode"] == "sparse_rows":
            rows = b.reshape(-1, b.shape[-1]).copy()
            idx = z[f"idx:{i}"]
            rows[idx] += z[f"val:{i}"].astype(np.float32)
            out_leaves[i] = rows.reshape(info["shape"])
        else:
            out_leaves[i] = b + z[f"dense:{i}"]
    params = jax.tree_util.tree_unflatten(treedef, out_leaves)
    fcfg = field_config_from_dict(meta["fieldcfg"])
    save_params_with_config(params, out_path, fcfg)
    if meta.get("grid") and grid_out:
        np.save(grid_out, z["grid"].astype(np.float32))
    print(
        json.dumps(
            {
                "out": out_path,
                "tensors": len(meta["tensors"]),
                "grid": bool(meta.get("grid") and grid_out),
            }
        )
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("pack")
    p.add_argument("--base", required=True)
    p.add_argument("--styled", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--grid", default=None, help="styled density grid .npy to embed")
    u = sub.add_parser("unpack")
    u.add_argument("--base", required=True)
    u.add_argument("--delta", required=True)
    u.add_argument("--out", required=True)
    u.add_argument("--grid_out", default=None)
    opt = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if opt.cmd == "pack":
        pack(opt.base, opt.styled, opt.out, opt.grid)
    else:
        unpack(opt.base, opt.delta, opt.out, opt.grid_out)


if __name__ == "__main__":
    main()
