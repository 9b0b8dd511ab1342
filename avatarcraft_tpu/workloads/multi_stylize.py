"""Multi-prompt batched avatar creation.

BASELINE.json config 5 asks for multi-prompt batched creation: several
avatars (one per text prompt) created in a single run. TPU-idiomatically this
is a **vmap over the prompt axis**: the style-field parameters are stacked
[P, ...], every render/grad step is vmapped over that axis (so the MXU sees
P-fold larger batches), and the UNet evaluates all prompts' CFG pairs in one
[2P] batch. On a multi-chip mesh the prompt axis can additionally be sharded
(each chip creates different avatars) — params stay small enough that either
layout works.

The reference can only create one avatar per process (stylize.py trains a
single net_style).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avatarcraft_tpu.models.diffusion import SDSGuidance
from avatarcraft_tpu.models.instant_nsr import FieldConfig
from avatarcraft_tpu.workloads.stylize import StylizeConfig, make_phaseA_render


def stack_params(params_list: list[dict]) -> dict:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_params(stacked: dict, n: int) -> list[dict]:
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]


@dataclasses.dataclass
class MultiPromptTrainer:
    """Train P style fields against P prompts simultaneously."""

    cfg: StylizeConfig
    fcfg: FieldConfig
    guidance: SDSGuidance
    prompts: list[str]
    params_style: dict  # stacked [P, ...]
    params_gt: dict  # single (shared canonical field)
    fast_cfg: object | None = None

    def __post_init__(self):
        c = self.cfg
        from avatarcraft_tpu.models.instant_nsr import RenderConfig
        from avatarcraft_tpu.constants import NSR_BOUND

        self.P = len(self.prompts)
        self.rcfg = RenderConfig(
            num_steps=64, upsample_steps=64, bound=NSR_BOUND, perturb=True
        )
        self.tx = optax.adam(c.lr)
        self.opt_state = self.tx.init(self.params_style)
        self.rng = np.random.default_rng(c.seed)
        self.key = jax.random.PRNGKey(c.seed)
        self._phaseA = {}
        self._step_count = 0
        if c.sampler == "fast":
            from avatarcraft_tpu.models.instant_nsr import FastRenderConfig
            from avatarcraft_tpu.ops.occupancy import prune_grid_floaters
            from avatarcraft_tpu.workloads.reconstruct import make_grid_update_fn

            if self.fast_cfg is None:
                self.fast_cfg = FastRenderConfig(bound=NSR_BOUND)
            self._refresh_grid = jax.vmap(make_grid_update_fn(self.fcfg, NSR_BOUND))
            # in-loop SDS floater control, same as the single-prompt trainer
            # (stylize.StylizeTrainer): vmapped over the prompt axis
            self._prune_grids = jax.jit(jax.vmap(prune_grid_floaters))
            # one grid per prompt field (geometry diverges under styling)
            self.grids = self._refresh_grid(
                self.params_style,
                jnp.zeros((self.P, 129, 129, 129), jnp.float32),
            )
        # view-independent text embeddings stacked [P, 2, L, D]; view-prefixed
        # variants are cached per view descriptor in text_embeddings()
        self._text_cache: dict[str, jnp.ndarray] = {}
        self.text_embs = self.text_embeddings("")

    def text_embeddings(self, desc: str) -> jnp.ndarray:
        """Stacked [P, 2, L, D] embeddings for (optionally view-prefixed)
        prompts — the reference's view-dependent prompt augmentation
        (reference: stylize.py:84-91), applied to every prompt in the batch."""
        if desc not in self._text_cache:
            c = self.cfg
            self._text_cache[desc] = jnp.stack(
                [
                    self.guidance.get_text_embeds(
                        [f"{desc} {p}" if (desc and c.augment_text) else p]
                    )
                    for p in self.prompts
                ]
            )
        return self._text_cache[desc]

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # -- honest sample-budget compaction (multi-prompt flavor) ---------------
    def derive_budget(self, n_poses: int = 20, safety: float = 1.1) -> int:
        """Size the global compaction budget from the schedule's own pose
        distribution against every prompt's live grid — worst probe-selected
        count per batch_size-ray chunk over BOTH stride layouts (coarse
        subsampled and fine contiguous), +10%. Same zero-clip discipline as
        the single-prompt trainer/bench; the clip guard at each grid refresh
        (below) keeps it honest as SDS reshapes the geometry."""
        import dataclasses as _dc

        from avatarcraft_tpu.cameras import pose2rays, style_360_path
        from avatarcraft_tpu.cameras.rays import sparse_ray_sampling
        from avatarcraft_tpu.constants import (
            CAN_HEAD_CAMERA_DIST,
            CAN_HEAD_OFFSET,
            CANONICAL_CAMERA_DIST_TRAIN,
        )

        c = self.cfg
        rng = np.random.default_rng(c.seed + 1)
        poses, _ = style_360_path(
            np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_TRAIN,
            n_poses, add_noise=c.augment_cam, style_head=c.stylize_head,
            head_offset=CAN_HEAD_OFFSET, head_rate=0.5,
            head_dist=CAN_HEAD_CAMERA_DIST, rng=rng,
        )
        worst = 0
        for pose in poses:
            for stride in {c.subsample_scale, 1}:
                ro, rd = pose2rays(c.H, c.W, pose)
                ro = ro.reshape(c.H, c.W, 3)
                rd = rd.reshape(c.H, c.W, 3)
                ro, rd = sparse_ray_sampling(ro, rd, stride, rng)
                ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
                worst = max(worst, self._worst_chunk_count(ro, rd))
        budget = int(worst * safety)
        self.fast_cfg = _dc.replace(self.fast_cfg, sample_budget=budget)
        self._phaseA = {}
        return budget

    def _worst_chunk_count(self, rays_o, rays_d) -> int:
        from avatarcraft_tpu.models.instant_nsr import count_fast_samples

        if not hasattr(self, "_count_jit"):
            self._count_jit = jax.jit(
                jax.vmap(
                    lambda ro, rd, g: count_fast_samples(ro, rd, self.fast_cfg, g),
                    in_axes=(None, None, 0),
                )
            )
        n = rays_o.shape[0]
        chunk = min(self.cfg.batch_size, n)
        worst = 0
        for i in range(0, n - chunk + 1, chunk):
            counts = self._count_jit(
                rays_o[i : i + chunk], rays_d[i : i + chunk], self.grids
            )
            worst = max(worst, int(jnp.max(counts)))
        return worst

    def _budget_clip_guard(self, rays_o, rays_d):
        """After a grid refresh, re-count the current view against every
        prompt's LIVE grid; if any chunk would clip, disable compaction and
        rebuild the jitted phases (single-prompt trainer semantics)."""
        import dataclasses as _dc

        if not self.fast_cfg.sample_budget:
            return
        worst = self._worst_chunk_count(rays_o, rays_d)
        if worst > self.fast_cfg.sample_budget:
            print(
                f"[multi] CLIP GUARD: refresh at step {self._step_count} "
                f"selects {worst} > budget {self.fast_cfg.sample_budget}; "
                f"disabling compaction (recompiles once)",
                flush=True,
            )
            self.fast_cfg = _dc.replace(self.fast_cfg, sample_budget=0)
            if hasattr(self, "_count_jit"):
                del self._count_jit
            self._phaseA = {}

    def train_view(self, pose: np.ndarray, desc: str, epoch: int):
        """One optimizer step updating ALL prompts' fields on a shared view."""
        from avatarcraft_tpu.cameras import pose2rays
        from avatarcraft_tpu.cameras.rays import sparse_ray_sampling
        from avatarcraft_tpu.utils.background import select_background
        from avatarcraft_tpu.workloads.stylize import make_phaseA_render
        from avatarcraft_tpu.constants import BLACK_BKG, NOISE_BKG, WHITE_BKG

        c = self.cfg
        stride = c.subsample_scale if epoch < c.coarse_epochs else min(1, c.subsample_scale // 2)
        rays_o, rays_d = pose2rays(c.H, c.W, pose)
        rays_o = rays_o.reshape(c.H, c.W, 3)
        rays_d = rays_d.reshape(c.H, c.W, 3)
        rays_o, rays_d = sparse_ray_sampling(rays_o, rays_d, stride, self.rng)
        th, tw = rays_o.shape[:2]
        rays_o, rays_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
        n_rays = th * tw
        # background augmentation, same schedule as the single-prompt trainer
        # (reference: stylize.py:59-66 random white/black/noise backgrounds)
        bkg_key = (
            int(self.rng.integers(WHITE_BKG, NOISE_BKG + 1))
            if c.augment_bkg
            else (WHITE_BKG if c.white_bkg else BLACK_BKG)
        )
        bg = select_background(n_rays, bkg_key, self._next_key())
        text_embs = self.text_embeddings(desc)

        # phase A vmapped over the prompt axis
        chunk = min(c.batch_size, n_rays)
        fast = c.sampler == "fast"
        if (n_rays, chunk) not in self._phaseA:
            if fast:
                from avatarcraft_tpu.workloads.stylize import make_phaseA_render_fast

                phaseA = make_phaseA_render_fast(self.fcfg, self.fast_cfg, chunk)
                self._phaseA[(n_rays, chunk)] = jax.jit(
                    jax.vmap(phaseA, in_axes=(0, None, None, None, 0, 0))
                )
            else:
                phaseA = make_phaseA_render(self.fcfg, self.rcfg, chunk)
                self._phaseA[(n_rays, chunk)] = jax.jit(
                    jax.vmap(phaseA, in_axes=(0, None, None, None, 0))
                )
        keysA = jax.random.split(self._next_key(), self.P)
        if fast:
            rgb, _depth = self._phaseA[(n_rays, chunk)](
                self.params_style, rays_o, rays_d, bg, self.grids, keysA
            )
        else:
            rgb, _depth = self._phaseA[(n_rays, chunk)](
                self.params_style, rays_o, rays_d, bg, keysA
            )  # [P, n_rays, 3], [P, n_rays]

        imgs = rgb.reshape(self.P, th, tw, 3).transpose(0, 3, 1, 2)[:, None]
        keysG = jax.random.split(self._next_key(), self.P)
        g_imgs = jax.vmap(
            lambda k, e, im: self.guidance.sds_image_grad(k, e, im, c.guidance_scale)
        )(keysG, text_embs, imgs)
        g_rgb = g_imgs[:, 0].transpose(0, 2, 3, 1).reshape(self.P, -1, 3)

        # phase B: vmapped gradient accumulation, one Adam step on the stack
        keysB = jax.random.split(self._next_key(), self.P)
        if fast:
            grads = jax.vmap(
                lambda p, g, gr: _phaseB_grads_fast(
                    p, self.params_gt, rays_o, rays_d, g, bg, gr,
                    self.fcfg, self.fast_cfg, c,
                )
            )(self.params_style, g_rgb, self.grids)
        else:
            grads = jax.vmap(
                lambda p, g, k: _phaseB_grads(
                    p, self.params_gt, rays_o, rays_d, g, bg, k, self.fcfg, self.rcfg, c
                )
            )(self.params_style, g_rgb, keysB)
        updates, self.opt_state = self.tx.update(grads, self.opt_state, self.params_style)
        self.params_style = optax.apply_updates(self.params_style, updates)
        self._step_count += 1
        if fast and c.grid_update_every and self._step_count % c.grid_update_every == 0:
            new_grids = self._refresh_grid(self.params_style, self.grids)
            if c.prune_floaters:
                new_grids = self._prune_grids(new_grids, self.grids)
            self.grids = new_grids
            self._budget_clip_guard(rays_o, rays_d)

    def train(self, max_steps: int | None = None, on_step=None):
        from avatarcraft_tpu.cameras import style_360_path
        from avatarcraft_tpu.constants import (
            CAN_HEAD_CAMERA_DIST,
            CAN_HEAD_OFFSET,
            CANONICAL_CAMERA_DIST_TRAIN,
        )

        c = self.cfg
        step = 0
        for epoch in range(c.coarse_epochs + c.fine_epochs):
            head_rate = c.coarse_head if epoch < c.coarse_epochs else c.fine_head
            poses, descs = style_360_path(
                np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_TRAIN,
                c.n_cap, add_noise=c.augment_cam,
                noise_scale=2.0 if c.augment_cam else 1.0,
                style_head=c.stylize_head, head_offset=CAN_HEAD_OFFSET,
                head_rate=head_rate if c.stylize_head else 0.0,
                head_dist=CAN_HEAD_CAMERA_DIST, rng=self.rng,
            )
            for i in self.rng.permutation(len(poses)):
                self.train_view(poses[i], descs[i], epoch)
                step += 1
                if on_step is not None:
                    on_step(step, self.params_style)
                if max_steps is not None and step >= max_steps:
                    return step
        return step


import functools


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _phaseB_grads(params, params_gt, rays_o, rays_d, g_rgb, bg, key, fcfg, rcfg, cfg):
    """Accumulated phase-B gradients for one prompt (jitted, vmap-compatible)."""
    from avatarcraft_tpu.models.instant_nsr import render_rays

    chunk = min(cfg.batch_size, rays_o.shape[0])
    n = rays_o.shape[0]
    n_patches = n // chunk
    keys = jax.random.split(key, n_patches)
    # same 4096-ray-patch SDS:regularizer balance as the single-prompt
    # trainer (workloads/stylize.py make_phaseB_step)
    reg_scale = chunk / 4096.0

    def patch_loss(p, ro, rd, g, bgc, k):
        out = render_rays(p, ro, rd, k, fcfg, rcfg, bgc)
        loss = jnp.vdot(out["rgb"], g) + reg_scale * cfg.w_eikonal * out["gradient_error"]
        if cfg.use_opacity:
            out_gt = render_rays(params_gt, ro, rd, k, fcfg, rcfg, bgc)
            d = jnp.clip(out["weight_sum"], 0, 1) - jax.lax.stop_gradient(
                jnp.clip(out_gt["weight_sum"], 0, 1)
            )
            ad = jnp.abs(d)
            loss = loss + reg_scale * cfg.w_opacity * jnp.mean(
                jnp.where(ad < 1, 0.5 * d * d, ad - 0.5)
            )
        return loss

    grad_fn = jax.grad(patch_loss)

    def body(args):
        ro, rd, g, bgc, k = args
        return grad_fn(params, ro, rd, g, bgc, k)

    patch_grads = jax.lax.map(
        body,
        (
            rays_o.reshape(n_patches, chunk, 3),
            rays_d.reshape(n_patches, chunk, 3),
            g_rgb.reshape(n_patches, chunk, 3),
            bg.reshape(n_patches, chunk, 3),
            keys,
        ),
    )
    return jax.tree_util.tree_map(lambda g: g.sum(axis=0), patch_grads)


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _phaseB_grads_fast(
    params, params_gt, rays_o, rays_d, g_rgb, bg, grid, fcfg, fast_cfg, cfg
):
    """Fast-sampler phase-B gradients for one prompt (vmap-compatible)."""
    from avatarcraft_tpu.models.instant_nsr import render_rays_fast

    chunk = min(cfg.batch_size, rays_o.shape[0])
    n = rays_o.shape[0]
    n_patches = n // chunk
    # same 4096-ray-patch SDS:regularizer balance as the single-prompt
    # trainer (workloads/stylize.py make_phaseB_step_fast)
    reg_scale = chunk / 4096.0

    def patch_loss(p, ro, rd, g, bgc):
        out = render_rays_fast(p, ro, rd, fcfg, fast_cfg, grid, bgc)
        loss = jnp.vdot(out["rgb"], g) + reg_scale * cfg.w_eikonal * out["gradient_error"]
        if cfg.use_opacity:
            out_gt = render_rays_fast(params_gt, ro, rd, fcfg, fast_cfg, grid, bgc)
            d = jnp.clip(out["weight_sum"], 0, 1) - jax.lax.stop_gradient(
                jnp.clip(out_gt["weight_sum"], 0, 1)
            )
            ad = jnp.abs(d)
            loss = loss + reg_scale * cfg.w_opacity * jnp.mean(
                jnp.where(ad < 1, 0.5 * d * d, ad - 0.5)
            )
        return loss

    grad_fn = jax.grad(patch_loss)

    def body(args):
        ro, rd, g, bgc = args
        return grad_fn(params, ro, rd, g, bgc)

    patch_grads = jax.lax.map(
        body,
        (
            rays_o.reshape(n_patches, chunk, 3),
            rays_d.reshape(n_patches, chunk, 3),
            g_rgb.reshape(n_patches, chunk, 3),
            bg.reshape(n_patches, chunk, 3),
        ),
    )
    return jax.tree_util.tree_map(lambda g: g.sum(axis=0), patch_grads)
