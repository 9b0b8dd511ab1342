"""SDS avatar stylization -- the flagship training workload.

Re-designs the reference Trainer (reference: stylize.py:31-217) TPU-first
while keeping its NeRF-Art two-phase structure, which is also the right
memory-scaling mechanism on TPU:

* **Phase A** (no param grads): render the full (subsampled) frame through the
  style field, then compute the SDS image-space gradient with one jax.vjp
  through the VAE encoder + resize (reference: stylize.py:96-138).
* **Phase B** (param grads): re-render the frame in fixed 4096-ray patches;
  each patch's loss is  <rgb_patch, g_patch>  (VJP injection, equivalent to
  ``rgb.backward(gradient=g)``) + w_eikonal * eikonal + 1e5 * smooth_l1(
  opacity_pred, opacity_gt) against the frozen ground-truth field
  (reference: stylize.py:146-199). Patch gradients accumulate into one Adam
  step. Each patch step is ONE compiled program; the patch axis is a lax.map;
  the ray axis shards across the device mesh.

Camera/background/prompt augmentation matches the reference schedule:
style_360_path with noise scale 2, head boxes at rate coarse 0.2 / fine 0.5,
random white/black/noise backgrounds, view-dependent prompt prefixes
(reference: stylize.py:59-91).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avatarcraft_tpu.cameras import pose2rays, style_360_path
from avatarcraft_tpu.cameras.rays import sparse_ray_sampling
from avatarcraft_tpu.constants import (
    BLACK_BKG,
    CAN_HEAD_CAMERA_DIST,
    CAN_HEAD_OFFSET,
    CANONICAL_CAMERA_DIST_TRAIN,
    NOISE_BKG,
    NSR_BOUND,
    WHITE_BKG,
)
from avatarcraft_tpu.models.diffusion import SDSGuidance
from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    RenderConfig,
    render_rays,
)
from avatarcraft_tpu.utils.background import select_background


@dataclasses.dataclass(frozen=True)
class StylizeConfig:
    tgt_text: str = "zombie"
    guidance_scale: float = 100.0
    coarse_epochs: int = 40
    fine_epochs: int = 20
    n_cap: int = 100  # views per epoch (reference: stylize.py:318)
    H: int = 256
    W: int = 256
    subsample_scale: int = 4  # coarse-stage stride (reference: stylize.py:98-106)
    batch_size: int = 4096  # rays per patch (reference: stylize.py:397)
    lr: float = 5e-3
    w_eikonal: float = 0.01
    w_opacity: float = 1e5  # reference: stylize.py:193 (smooth_l1 * 1e5)
    use_opacity: bool = True
    stylize_head: bool = True
    coarse_head: float = 0.2
    fine_head: float = 0.5
    augment_bkg: bool = True
    augment_cam: bool = True
    augment_text: bool = True
    white_bkg: bool = True
    seed: int = 42
    # sampler: "parity" = the reference 64+64 importance pipeline;
    # "fast" = occupancy-guided K-sample rendering (TPU flagship — needs a
    # density grid, refreshed during training since SDS reshapes geometry)
    sampler: str = "parity"
    grid_update_every: int = 200  # fast sampler only
    # in-loop floater control (fast sampler): at every grid refresh, keep
    # only the occupied components connected to the previous grid's
    # occupancy (ops/occupancy.prune_grid_floaters) — SDS grows isolated
    # floater cells that inflate the sample budget ~4x (docs/PERFORMANCE.md)
    prune_floaters: bool = True


def make_phaseA_render(fcfg: FieldConfig, rcfg: RenderConfig, chunk: int):
    """Full-frame render, no parameter gradients, fixed chunking.

    Returns (rgb [N,3], depth [N]) — depth feeds the SD-2.0-depth latent
    conditioning when the guidance wants it (reference: stylize.py:115-130 via
    models/diffusion.py:107-111)."""

    @jax.jit
    def phaseA(params, rays_o, rays_d, bg, key):
        n = rays_o.shape[0]
        n_chunks = n // chunk
        keys = jax.random.split(key, n_chunks)

        def body(args):
            ro, rd, bgc, k = args
            out = render_rays(params, ro, rd, k, fcfg, rcfg, bgc)
            return out["rgb"], out["depth"]

        rgb, depth = jax.lax.map(
            body,
            (
                rays_o.reshape(n_chunks, chunk, 3),
                rays_d.reshape(n_chunks, chunk, 3),
                bg.reshape(n_chunks, chunk, 3),
                keys,
            ),
        )
        return (
            jax.lax.stop_gradient(rgb.reshape(n, 3)),
            jax.lax.stop_gradient(depth.reshape(n)),
        )

    return phaseA


def make_phaseB_step(
    fcfg: FieldConfig,
    rcfg: RenderConfig,
    tx: optax.GradientTransformation,
    w_eikonal: float,
    use_opacity: bool,
    chunk: int,
    w_opacity: float = 1e5,
):
    """One optimizer step: accumulate VJP-injected gradients over all patches.

    The patch loop is a lax.map inside the compiled program; gradient
    accumulation happens in-register (a tree-sum over the patch axis).
    """

    # Reference loss semantics are defined at 4096-ray patches (stylize.py:148,
    # 166-193): the per-step regularizer gradient is a SUM over patches of
    # per-patch MEANS. The SDS term is a sum over rays (patch-size invariant),
    # so running larger TPU patches must scale the regularizer means by
    # chunk/4096 to keep the same SDS:regularizer balance.
    reg_scale = chunk / 4096.0

    def patch_loss(params, params_gt, ro, rd, g_rgb, bg, key):
        out = render_rays(params, ro, rd, key, fcfg, rcfg, bg)
        # <rgb, g> == torch rgb.backward(gradient=g) (reference: stylize.py:163)
        sds_term = jnp.vdot(out["rgb"], g_rgb)
        loss = sds_term + reg_scale * w_eikonal * out["gradient_error"]
        if use_opacity:
            out_gt = render_rays(params_gt, ro, rd, key, fcfg, rcfg, bg)
            op_pred = jnp.clip(out["weight_sum"], 0.0, 1.0)
            op_gt = jax.lax.stop_gradient(jnp.clip(out_gt["weight_sum"], 0.0, 1.0))
            d = op_pred - op_gt
            ad = jnp.abs(d)
            opacity = jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))
            loss = loss + reg_scale * w_opacity * opacity
        return loss

    @jax.jit
    def step(params, params_gt, opt_state, rays_o, rays_d, g_rgb, bg, key):
        n = rays_o.shape[0]
        n_patches = n // chunk
        keys = jax.random.split(key, n_patches)

        grad_fn = jax.grad(patch_loss)

        def body(args):
            ro, rd, g, bgc, k = args
            return grad_fn(params, params_gt, ro, rd, g, bgc, k)

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
        grads = jax.tree_util.tree_map(lambda g: g.sum(axis=0), patch_grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    return step


def make_phaseA_render_fast(fcfg: FieldConfig, fast_cfg, chunk: int):
    """Occupancy-guided full-frame render (phase A, no grads)."""
    from avatarcraft_tpu.models.instant_nsr import render_rays_fast

    @jax.jit
    def phaseA(params, rays_o, rays_d, bg, grid, key):
        n = rays_o.shape[0]
        n_chunks = n // chunk

        def body(args):
            ro, rd, bgc = args
            out = render_rays_fast(params, ro, rd, fcfg, fast_cfg, grid, bgc)
            return out["rgb"], out["depth"]

        rgb, depth = jax.lax.map(
            body,
            (
                rays_o.reshape(n_chunks, chunk, 3),
                rays_d.reshape(n_chunks, chunk, 3),
                bg.reshape(n_chunks, chunk, 3),
            ),
        )
        return (
            jax.lax.stop_gradient(rgb.reshape(n, 3)),
            jax.lax.stop_gradient(depth.reshape(n)),
        )

    return phaseA


def make_phaseB_step_fast(
    fcfg: FieldConfig,
    fast_cfg,
    tx: optax.GradientTransformation,
    w_eikonal: float,
    use_opacity: bool,
    chunk: int,
    w_opacity: float = 1e5,
):
    """Fast-sampler phase B: same VJP-injection + regularizers as
    make_phaseB_step but through render_rays_fast against the density grid."""
    from avatarcraft_tpu.models.instant_nsr import render_rays_fast

    # see make_phaseB_step: keep the reference 4096-ray-patch SDS:regularizer
    # balance when running larger TPU patches
    reg_scale = chunk / 4096.0

    def patch_loss(params, params_gt, ro, rd, g_rgb, bg, grid):
        out = render_rays_fast(params, ro, rd, fcfg, fast_cfg, grid, bg)
        sds_term = jnp.vdot(out["rgb"], g_rgb)
        loss = sds_term + reg_scale * w_eikonal * out["gradient_error"]
        if use_opacity:
            out_gt = render_rays_fast(params_gt, ro, rd, fcfg, fast_cfg, grid, bg)
            op_pred = jnp.clip(out["weight_sum"], 0.0, 1.0)
            op_gt = jax.lax.stop_gradient(jnp.clip(out_gt["weight_sum"], 0.0, 1.0))
            d = op_pred - op_gt
            ad = jnp.abs(d)
            loss = loss + reg_scale * w_opacity * jnp.mean(
                jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
            )
        return loss

    @jax.jit
    def step(params, params_gt, opt_state, rays_o, rays_d, g_rgb, bg, grid, key):
        n = rays_o.shape[0]
        n_patches = n // chunk
        grad_fn = jax.grad(patch_loss)

        def body(args):
            ro, rd, g, bgc = args
            return grad_fn(params, params_gt, ro, rd, g, bgc, grid)

        patch_grads = jax.lax.map(
            body,
            (
                rays_o.reshape(n_patches, chunk, 3),
                rays_d.reshape(n_patches, chunk, 3),
                g_rgb.reshape(n_patches, chunk, 3),
                bg.reshape(n_patches, chunk, 3),
            ),
        )
        grads = jax.tree_util.tree_map(lambda g: g.sum(axis=0), patch_grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    return step


@dataclasses.dataclass
class StylizeTrainer:
    """Orchestrates the per-view SDS update (host-side schedule, jitted math).

    ``grid``: density grid for the fast sampler (from the canonical
    checkpoint's reconstruction, or refreshed from the loaded field); it is
    re-refreshed every ``cfg.grid_update_every`` SDS steps because SDS can
    reshape the geometry."""

    cfg: StylizeConfig
    fcfg: FieldConfig
    guidance: SDSGuidance
    params_style: dict
    params_gt: dict
    grid: jnp.ndarray | None = None
    fast_cfg: object | None = None

    def __post_init__(self):
        c = self.cfg
        self.rcfg = RenderConfig(
            num_steps=64, upsample_steps=64, bound=NSR_BOUND, perturb=True
        )
        self.tx = optax.adam(c.lr)
        self.opt_state = self.tx.init(self.params_style)
        self.rng = np.random.default_rng(c.seed)
        self.key = jax.random.PRNGKey(c.seed)
        self._phaseA = {}
        if c.sampler == "fast":
            from avatarcraft_tpu.models.instant_nsr import FastRenderConfig

            if self.fast_cfg is None:
                self.fast_cfg = FastRenderConfig(bound=NSR_BOUND)
            self._phaseB = make_phaseB_step_fast(
                self.fcfg, self.fast_cfg, self.tx, c.w_eikonal, c.use_opacity,
                c.batch_size, c.w_opacity,
            )
            from avatarcraft_tpu.ops.occupancy import prune_grid_floaters
            from avatarcraft_tpu.workloads.reconstruct import make_grid_update_fn

            self._refresh_grid = make_grid_update_fn(self.fcfg, NSR_BOUND)
            self._prune_grid = jax.jit(prune_grid_floaters)
            if self.grid is None:
                self.grid = self._refresh_grid(
                    self.params_style, jnp.zeros((129,) * 3, jnp.float32)
                )
        else:
            self._phaseB = make_phaseB_step(
                self.fcfg, self.rcfg, self.tx, c.w_eikonal, c.use_opacity,
                c.batch_size, c.w_opacity,
            )
        self._step_count = 0
        self._text_cache: dict[str, jnp.ndarray] = {}

    # -- schedule -----------------------------------------------------------
    def epoch_poses(self, epoch: int):
        c = self.cfg
        head_rate = c.coarse_head if epoch < c.coarse_epochs else c.fine_head
        center, up = np.zeros(3), np.array([0.0, 1.0, 0.0])
        poses, descs = style_360_path(
            center, up, CANONICAL_CAMERA_DIST_TRAIN, c.n_cap,
            add_noise=c.augment_cam, noise_scale=2.0 if c.augment_cam else 1.0,
            style_head=c.stylize_head, head_offset=CAN_HEAD_OFFSET,
            head_rate=head_rate if c.stylize_head else 0.0,
            head_dist=CAN_HEAD_CAMERA_DIST, rng=self.rng,
        )
        return poses, descs

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def text_embedding(self, prompt: str) -> jnp.ndarray:
        if prompt not in self._text_cache:
            self._text_cache[prompt] = self.guidance.get_text_embeds([prompt])
        return self._text_cache[prompt]

    # -- one view = one optimizer step ---------------------------------------
    def train_view(self, pose: np.ndarray, desc: str, epoch: int):
        c = self.cfg
        stride = (
            c.subsample_scale if epoch < c.coarse_epochs else min(1, c.subsample_scale // 2)
        )
        rays_o, rays_d = pose2rays(c.H, c.W, pose)
        rays_o = rays_o.reshape(c.H, c.W, 3)
        rays_d = rays_d.reshape(c.H, c.W, 3)
        rays_o, rays_d = sparse_ray_sampling(rays_o, rays_d, stride, self.rng)
        th, tw = rays_o.shape[:2]
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        n_rays = th * tw

        bkg_key = (
            int(self.rng.integers(WHITE_BKG, NOISE_BKG + 1))
            if c.augment_bkg
            else (WHITE_BKG if c.white_bkg else BLACK_BKG)
        )
        bg = select_background(n_rays, bkg_key, self._next_key())

        prompt = f"{desc} {c.tgt_text}" if c.augment_text else c.tgt_text
        text_emb = self.text_embedding(prompt)

        # Phase A: full-frame render + SDS image gradient
        chunk = min(c.batch_size, n_rays)
        fast = c.sampler == "fast"
        if (n_rays, chunk) not in self._phaseA:
            self._phaseA[(n_rays, chunk)] = (
                make_phaseA_render_fast(self.fcfg, self.fast_cfg, chunk)
                if fast
                else make_phaseA_render(self.fcfg, self.rcfg, chunk)
            )
        if fast:
            rgb_full, depth_full = self._phaseA[(n_rays, chunk)](
                self.params_style, rays_o, rays_d, bg, self.grid, self._next_key()
            )
        else:
            rgb_full, depth_full = self._phaseA[(n_rays, chunk)](
                self.params_style, rays_o, rays_d, bg, self._next_key()
            )
        img = rgb_full.reshape(1, th, tw, 3).transpose(0, 3, 1, 2)
        pred_depth = (
            depth_full.reshape(1, 1, th, tw) if self.guidance.m.use_depth else None
        )
        g_img = self.guidance.sds_image_grad_jit(
            self._next_key(), text_emb, img, c.guidance_scale, pred_depth=pred_depth
        )
        g_rgb = g_img.transpose(0, 2, 3, 1).reshape(-1, 3)

        # Phase B: patch re-render with VJP injection + regularizers
        if fast:
            self.params_style, self.opt_state = self._phaseB(
                self.params_style, self.params_gt, self.opt_state,
                rays_o, rays_d, g_rgb, bg, self.grid, self._next_key(),
            )
        else:
            self.params_style, self.opt_state = self._phaseB(
                self.params_style, self.params_gt, self.opt_state,
                rays_o, rays_d, g_rgb, bg, self._next_key(),
            )
        self._step_count += 1
        if (
            fast
            and c.grid_update_every
            and self._step_count % c.grid_update_every == 0
        ):
            new_grid = self._refresh_grid(self.params_style, self.grid)
            if c.prune_floaters:
                # seed chains from the trusted pre-stylize reconstruction
                # grid: each refresh keeps only components connected to the
                # previous (already-pruned) occupancy
                new_grid = self._prune_grid(new_grid, self.grid)
            self.grid = new_grid
            self._budget_clip_guard(rays_o, rays_d)

    def _budget_clip_guard(self, rays_o, rays_d):
        """Zero-clip invariant for the compaction budget (VERDICT r3 Next
        #1a): after each grid refresh, re-count the probe-selected samples of
        the current view against the LIVE grid per phase-B chunk; if the
        budget would drop samples (SDS inflates occupancy over training,
        docs/PERFORMANCE.md), disable compaction and rebuild the jitted steps
        rather than silently zeroing trailing rays (ops/occupancy.py
        compact_indices drops in flat order)."""
        c = self.cfg
        if not (self.fast_cfg and getattr(self.fast_cfg, "sample_budget", 0)):
            return
        from avatarcraft_tpu.models.instant_nsr import count_fast_samples

        if not hasattr(self, "_clip_counter"):
            self._clip_counter = jax.jit(
                lambda ro, rd, g: count_fast_samples(ro, rd, self.fast_cfg, g)
            )
        n = rays_o.shape[0]
        chunk = min(c.batch_size, n)
        worst = max(
            int(self._clip_counter(rays_o[i : i + chunk], rays_d[i : i + chunk], self.grid))
            for i in range(0, n - chunk + 1, chunk)
        )
        if worst > self.fast_cfg.sample_budget:
            print(
                f"[stylize] CLIP GUARD: grid refresh at step {self._step_count} "
                f"selects {worst} samples/chunk > budget "
                f"{self.fast_cfg.sample_budget}; disabling compaction "
                f"(recompiles phase A/B once)",
                flush=True,
            )
            self.fast_cfg = dataclasses.replace(self.fast_cfg, sample_budget=0)
            del self._clip_counter
            self._phaseA = {}
            self._phaseB = make_phaseB_step_fast(
                self.fcfg, self.fast_cfg, self.tx, c.w_eikonal, c.use_opacity,
                c.batch_size, c.w_opacity,
            )

    def train(self, max_steps: int | None = None, on_step: Callable | None = None):
        c = self.cfg
        step = 0
        for epoch in range(c.coarse_epochs + c.fine_epochs):
            poses, descs = self.epoch_poses(epoch)
            order = self.rng.permutation(len(poses))
            for i in order:
                self.train_view(poses[i], descs[i], epoch)
                if on_step is not None:
                    on_step(step, self.params_style)
                step += 1
                if max_steps is not None and step >= max_steps:
                    return step
        return step
