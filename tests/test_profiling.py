"""Profiling/observability + train-state resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.utils.profiling import MetricsLogger, StepTimer


def test_step_timer_skips_compile_step():
    t = StepTimer(skip=1)
    for _ in range(3):
        t.start()
        dt = t.stop()
    assert t.n == 3
    assert t.avg is not None and t.avg >= 0
    assert t.rate(100) > 0


def test_metrics_logger_jsonl(tmp_path):
    path = os.path.join(tmp_path, "m", "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(0, loss=1.5, rays_per_sec=1000)
    log.log(1, loss=1.2)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1


def test_metrics_logger_disabled():
    log = MetricsLogger(None)
    rec = log.log(5, x=1)
    assert rec["x"] == 1
    log.close()


def test_train_state_resume_roundtrip(tmp_path):
    import optax

    from avatarcraft_tpu.workloads.reconstruct import (
        load_train_state,
        save_train_state,
    )

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # take one step so moments are nonzero
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    path = os.path.join(tmp_path, "state")
    save_train_state(path, params, opt_state, step=17)
    like = {"params": params, "opt_state": opt_state, "step": 0}
    state = load_train_state(path, like)
    assert state["step"] == 17
    for a, b in zip(
        jax.tree_util.tree_leaves(state["params"]), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state["opt_state"]),
        jax.tree_util.tree_leaves(opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
