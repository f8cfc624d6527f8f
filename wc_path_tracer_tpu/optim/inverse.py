"""Inverse rendering: optimize scene parameters from target images.

BASELINE config (e): "optimize albedo/roughness/emission from target images,
multi-host ray-sharded with grad allreduce".  The reference has no gradients
at all (SURVEY §2.6) — this subsystem is pure extension, built on:

- render/golden.py's differentiable transport (detached-argmin estimator:
  exact in expectation for interior parameters)
- optim/params.py's trainable registry: material fields, sphere
  position/radius, mesh vertices, camera parameters
- parallel/render.py's dp-sharded loss/grad with implicit psum all-reduce
- optax optimizers, with parameter-range projections after each step
  (albedo/roughness clamped to [0,1] etc. — the headless analog of the
  reference property editor's @Range annotations, src/ui_utils.jai:120-140)
- checkpoint/resume: (params, opt_state, step) persist to a directory every
  ``checkpoint_every`` steps; ``resume=True`` continues an interrupted run
  bit-exactly (the PRNG frame is the step index, so the stochastic gradient
  sequence is reproduced).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from wc_path_tracer_tpu.optim import params as reg
from wc_path_tracer_tpu.parallel import mesh as pmesh
from wc_path_tracer_tpu.parallel import render as prender
from wc_path_tracer_tpu.scene.types import Scene
from wc_path_tracer_tpu.utils.checkpoint import load_pytree, save_pytree
from wc_path_tracer_tpu.utils.config import RenderConfig

# re-export: the projection table used to live here (round 1/2 API)
project_params = reg.project_params


@dataclasses.dataclass
class InverseRenderConfig:
    trainable: Sequence[str] = ("albedo", "emission_strength", "roughness")
    learning_rate: float = 5e-2
    steps: int = 200
    vary_seed: bool = True      # new PRNG frame per step (stochastic gradients)
    log_every: int = 10


def run_inverse_rendering(scene: Scene, camera, target,
                          render_cfg: RenderConfig,
                          inv_cfg: Optional[InverseRenderConfig] = None,
                          mesh=None, log_fn: Optional[Callable] = None,
                          checkpoint_dir: Optional[str] = None,
                          checkpoint_every: int = 0,
                          resume: bool = False):
    """Optimize ``inv_cfg.trainable`` parameters of (scene, camera) so
    renders match ``target`` (H, W, 3).

    ``camera`` may be a scene.camera.Camera (required for camera_*
    trainables; matrices are rebuilt differentiably per step) or a prebuilt
    CameraMatrices (material/geometry trainables only).

    Returns (optimized_scene, optimized_camera, history); history is a list
    of per-step dicts (step, loss, grad_norm, wall_s).
    """
    inv_cfg = inv_cfg or InverseRenderConfig()
    mesh = mesh if mesh is not None else pmesh.make_mesh()
    trainable = reg.validate(inv_cfg.trainable)

    opt = optax.adam(inv_cfg.learning_rate)
    loss_grad = prender.sharded_scene_loss_grad(mesh, render_cfg, trainable)

    params = reg.get_params(scene, camera, trainable)
    opt_state = opt.init(params)
    start_step = 0
    if resume:
        if not checkpoint_dir:
            raise ValueError("resume=True requires checkpoint_dir")
        state, start_step = load_training_state(
            checkpoint_dir, params, opt_state)
        params, opt_state = state["params"], state["opt_state"]

    @jax.jit
    def update(params, opt_state, grads):
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return reg.project_params(params), opt_state

    history = []
    t_start = time.perf_counter()
    for step in range(start_step, inv_cfg.steps):
        frame = jnp.uint32(step if inv_cfg.vary_seed else 0)
        s, cam = reg.apply_params(scene, camera, params)
        loss, grads = loss_grad(s, cam, frame, target)
        params, opt_state = update(params, opt_state, grads)
        if step % inv_cfg.log_every == 0 or step == inv_cfg.steps - 1:
            gn = float(optax.global_norm(grads))
            rec = dict(step=step, loss=float(loss), grad_norm=gn,
                       wall_s=time.perf_counter() - t_start)
            history.append(rec)
            if log_fn is not None:
                log_fn(rec)
        if (checkpoint_dir and checkpoint_every
                and (step + 1) % checkpoint_every == 0):
            save_training_state(checkpoint_dir, params, opt_state, step + 1)

    if checkpoint_dir:
        save_training_state(checkpoint_dir, params, opt_state, inv_cfg.steps)
    scene, camera = reg.apply_params(scene, camera, params)
    return scene, camera, history


def save_training_state(directory: str, params, opt_state, step: int):
    """Persist the full resumable training state: trainable params, optax
    state (moments + counts), and the step index (= PRNG frame)."""
    save_pytree(directory, {"params": params, "opt_state": opt_state},
                extra_meta={"step": int(step)})


def load_training_state(directory: str, params_template, opt_state_template):
    import json
    state = load_pytree(directory, {"params": params_template,
                                    "opt_state": opt_state_template})
    with open(os.path.join(directory, "manifest.json")) as f:
        step = int(json.load(f)["extra"]["step"])
    return state, step
