"""Inverse rendering: optimize scene parameters from target images.

BASELINE config (e): "optimize albedo/roughness/emission from target images,
multi-host ray-sharded with grad allreduce".  The reference has no gradients
at all (SURVEY §2.6) — this subsystem is pure extension, built on:

- render/golden.py's differentiable transport (detached-argmin estimator:
  exact in expectation for interior parameters)
- parallel/render.py's dp-sharded loss/grad with implicit psum all-reduce
- optax optimizers, with parameter-range projections after each step
  (albedo/roughness clamped to [0,1] etc. — the headless analog of the
  reference property editor's @Range annotations, src/ui_utils.jai:120-140)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from wc_path_tracer_tpu.parallel import mesh as pmesh
from wc_path_tracer_tpu.parallel import render as prender
from wc_path_tracer_tpu.scene.types import Scene
from wc_path_tracer_tpu.utils.config import RenderConfig


# projection ranges mirroring the reference's @Range annotations
_PARAM_RANGES = {
    "albedo": (0.0, 1.0),
    "emission": (0.0, None),
    "emission_strength": (0.0, None),
    "metallic": (0.0, 1.0),
    "roughness": (0.0, 1.0),
    "absorption": (0.0, None),
    "absorption_strength": (0.0, None),
    "ior": (1.0, None),
}


@dataclasses.dataclass
class InverseRenderConfig:
    trainable: Sequence[str] = ("albedo", "emission_strength", "roughness")
    learning_rate: float = 5e-2
    steps: int = 200
    vary_seed: bool = True      # new PRNG frame per step (stochastic gradients)
    log_every: int = 10


def project_params(params: dict) -> dict:
    out = {}
    for k, v in params.items():
        lo, hi = _PARAM_RANGES.get(k, (None, None))
        if lo is not None:
            v = jnp.maximum(v, lo)
        if hi is not None:
            v = jnp.minimum(v, hi)
        out[k] = v
    return out


def run_inverse_rendering(scene: Scene, mats, target, render_cfg: RenderConfig,
                          inv_cfg: Optional[InverseRenderConfig] = None,
                          mesh=None, log_fn: Optional[Callable] = None):
    """Optimize ``inv_cfg.trainable`` material fields of ``scene`` so renders
    match ``target`` (H, W, 3).

    Returns (optimized_scene, history) where history is a list of per-step
    dicts (step, loss, grad_norm, wall_s).
    """
    inv_cfg = inv_cfg or InverseRenderConfig()
    mesh = mesh if mesh is not None else pmesh.make_mesh()
    trainable = tuple(inv_cfg.trainable)

    opt = optax.adam(inv_cfg.learning_rate)
    loss_grad = prender.sharded_render_loss_grad(mesh, render_cfg, trainable)

    params = {k: getattr(scene.materials, k) for k in trainable}
    opt_state = opt.init(params)

    @jax.jit
    def update(params, opt_state, grads):
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return project_params(params), opt_state

    history = []
    t_start = time.perf_counter()
    for step in range(inv_cfg.steps):
        frame = jnp.uint32(step if inv_cfg.vary_seed else 0)
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, **params))
        loss, grads = loss_grad(s, mats, frame, target)
        params, opt_state = update(params, opt_state, grads)
        if step % inv_cfg.log_every == 0 or step == inv_cfg.steps - 1:
            gn = float(optax.global_norm(grads))
            rec = dict(step=step, loss=float(loss), grad_norm=gn,
                       wall_s=time.perf_counter() - t_start)
            history.append(rec)
            if log_fn is not None:
                log_fn(rec)

    scene = dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, **params))
    return scene, history
