"""Micro-bench the kNN warp's internal stages on the chip.

bench_warp_split shows the kNN warp is ~85% of the warped-frame cost; this
decomposes ONE 98304-sample warp call into: distance matmul, matmul+top_k,
matmul+iterative-argmin (top_k replacement candidate), candidate gather +
Ericson, transform blend/inverse. Relay-safe: distinct inputs per timed call.

Usage: python benchmarks/bench_warp_internals.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from avatarcraft_tpu.data.amass import load_pose_sequence
    from avatarcraft_tpu.models.smpl import load_smpl
    from avatarcraft_tpu.warp import WarpData, warp_samples_to_canonical
    from avatarcraft_tpu.workloads.warp_render import calc_local_trans

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(root, "artifacts", "canonical")
    model = load_smpl(os.path.join(art, "demo_body_rig.npz"))
    poses = load_pose_sequence(os.path.join(art, "demo_poses.npy"))
    world_verts, Ts, _ = calc_local_trans(
        model, render_type="animate", poses=poses, max_frames=4, rest_pose="zero"
    )
    frames = [
        WarpData.create(world_verts[i], model.faces, Ts[i]) for i in range(4)
    ]
    n_samples = 98304
    block = 4096
    keys = [jax.random.PRNGKey(i) for i in range(8)]

    def pts_for(key):
        return jax.random.uniform(
            key, (n_samples // 64, 64, 3), minval=-1.0, maxval=1.0
        )

    def timed(name, fn, args_for):
        _ = float(fn(*args_for(0)))
        _ = float(fn(*args_for(1)))
        ts = []
        for i in (2, 3):
            t0 = time.perf_counter()
            _ = float(fn(*args_for(i)))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"what": name, "ms": round(min(ts) * 1e3, 1)}), flush=True)

    # 0) full warp (the baseline being decomposed)
    f_full = jax.jit(
        lambda wd, k: sum(
            x.sum() for x in warp_samples_to_canonical(pts_for(k), wd)[:2]
        )
        * 1.0
    )
    timed("full_warp", f_full, lambda i: (frames[i], keys[i]))

    # 1) distance matmul only
    def d2_block(pts, verts):
        return (
            jnp.sum(pts**2, -1, keepdims=True)
            - 2.0 * pts @ verts.T
            + jnp.sum(verts**2, -1)[None, :]
        )

    def matmul_only(wd, k):
        flat = pts_for(k).reshape(-1, block, 3)
        return jax.lax.map(lambda p: d2_block(p, wd.verts).min(), flat).sum()

    timed("dist_matmul_only", jax.jit(matmul_only), lambda i: (frames[i], keys[i]))

    # 2) matmul + top_k(4)
    def matmul_topk(wd, k):
        flat = pts_for(k).reshape(-1, block, 3)

        def body(p):
            d2 = d2_block(p, wd.verts)
            _, idx = jax.lax.top_k(-d2, 4)
            return idx.sum()

        return jax.lax.map(body, flat).sum()

    timed("matmul_topk4", jax.jit(matmul_topk), lambda i: (frames[i], keys[i]))

    # 3) matmul + 4x iterative argmin (top_k replacement candidate)
    def matmul_argmin4(wd, k):
        flat = pts_for(k).reshape(-1, block, 3)

        def body(p):
            d2 = d2_block(p, wd.verts)
            total = jnp.int32(0)
            for _ in range(4):
                i = jnp.argmin(d2, axis=-1)
                total = total + i.sum()
                d2 = d2.at[jnp.arange(d2.shape[0]), i].set(jnp.inf)
            return total

        return jax.lax.map(body, flat).sum()

    timed("matmul_argmin4", jax.jit(matmul_argmin4), lambda i: (frames[i], keys[i]))

    # 4) candidate gather + Ericson only (fixed fake knn indices)
    from avatarcraft_tpu.warp.warp import closest_point_on_triangles

    def ericson_only(wd, k):
        flat = pts_for(k).reshape(-1, block, 3)

        def body(p):
            B = p.shape[0]
            knn_idx = (
                jnp.arange(B * 4, dtype=jnp.int32).reshape(B, 4) % wd.verts.shape[0]
            )
            cand = wd.vert2face[knn_idx].reshape(B, -1)
            tri = wd.verts[wd.faces[cand]]
            closest, bary = closest_point_on_triangles(
                p[:, None, :], tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
            )
            cd2 = jnp.sum((closest - p[:, None, :]) ** 2, -1)
            return cd2.min(-1).sum() + bary.sum()

        return jax.lax.map(body, flat).sum()

    timed("gather_ericson_only", jax.jit(ericson_only), lambda i: (frames[i], keys[i]))

    # 5) transform blend + batched 4x4 inverse only
    def blend_inv_only(wd, k):
        flat = pts_for(k).reshape(-1, 3)
        M = flat.shape[0]
        f_id = (
            jnp.arange(M, dtype=jnp.int32) % wd.faces.shape[0]
        )
        bary = jnp.full((M, 3), 1.0 / 3.0)
        corner_T = wd.Ts[wd.faces[f_id]]
        T = jnp.sum(corner_T * bary[:, :, None, None], axis=1)
        T_inv = jnp.linalg.inv(T)
        hom = jnp.concatenate([flat, jnp.ones((M, 1))], -1)
        return jnp.einsum("mij,mj->mi", T_inv, hom).sum()

    timed("blend_inverse_only", jax.jit(blend_inv_only), lambda i: (frames[i], keys[i]))


if __name__ == "__main__":
    main()
