"""End-to-end training loop (ref: src/nr/train/trainer.py:20-233), TPU-native:

  - one donated-buffer jitted train step: forward (render + volume + grasp
    head) → summed losses → grad → Adam with staircase-decay LR
  - runs under an optional (data, space) Mesh: rays/voxels sharded, params
    replicated, gradient psum inserted by XLA and overlapped with backward
  - periodic validation with `loss_vgn` as the model-selection key (lower
    better, ref configs/nrvgn_sdf.yaml:37-38), latest/best checkpoints, JSONL
    metric log

Batch contract (one scene per step, like the reference's batch_size=1):
  batch = {
    "data":   renderer data dict (+ "grasp_index" [G,3]),
    "true_depth": [V,H,W,1], "sdf_gt": [res,res,res],
    "grasp_label": [G], "grasp_rot": [G,2,4], "grasp_width": [G],
  }
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models import GraspNeRF
from . import losses as L
from .schedule import exp_decay_lr
from .checkpoint import CheckpointManager


class TrainState(train_state.TrainState):
    pass


def compute_losses(outputs, batch, train: bool = True) -> Dict[str, jnp.ndarray]:
    ld = {}
    if "pixel_colors_nr" in outputs:
        ld.update(L.render_loss(outputs))
    if "depth_mean" in outputs and "true_depth" in batch:
        ld.update(L.depth_loss(outputs, batch["true_depth"],
                               batch["data"]["ref"]["depth_range"]))
    ld.update(L.sdf_loss(outputs, batch["sdf_gt"]))
    ld.update(L.vgn_loss(outputs, batch["grasp_label"], batch["grasp_rot"],
                         batch["grasp_width"]))
    return ld


def make_loss_fn(model: GraspNeRF) -> Callable:
    def loss_fn(params, batch, key):
        outputs = model.apply({"params": params}, batch["data"], train=True,
                              key=key)
        ld = compute_losses(outputs, batch)
        total = L.total_loss(ld)
        ld["total"] = total
        return total, ld
    return loss_fn


def create_train_state(model: GraspNeRF, example_batch, key,
                       lr_cfg: Optional[dict] = None) -> TrainState:
    params = model.init(key, example_batch["data"], train=True,
                        key=jax.random.PRNGKey(0))["params"]
    tx = optax.adam(exp_decay_lr(**(lr_cfg or {})))
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_train_step(model: GraspNeRF, out_sharding=None):
    """out_sharding: optional sharding (e.g. replicated NamedSharding) applied
    to the step outputs — pins XLA's auto-propagated output shardings to
    something expressible on the mesh."""
    loss_fn = make_loss_fn(model)

    def step_fn(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        state = state.apply_gradients(grads=grads)
        return state, metrics

    kw = {} if out_sharding is None else {"out_shardings": out_sharding}
    return jax.jit(step_fn, donate_argnums=0, **kw)


def make_eval_step(model: GraspNeRF):
    def eval_fn(params, batch, key):
        outputs = model.apply({"params": params}, batch["data"], train=False,
                              key=key)
        ld = compute_losses(outputs, batch, train=False)
        if "pixel_colors_nr" in outputs:
            ld["psnr_nr"] = L.psnr(outputs["pixel_colors_nr"],
                                   outputs["pixel_colors_gt"])
        return ld
    return jax.jit(eval_fn)


class Trainer:
    """Step loop + validation + checkpointing (ref trainer.py run/val flow)."""

    def __init__(self, model: GraspNeRF, train_iter: Iterator,
                 val_batches=None, workdir: str = "data/train",
                 total_steps: int = 500_000, val_interval: int = 5000,
                 save_interval: int = 1000, lr_cfg: Optional[dict] = None,
                 key_metric: str = "loss_vgn", log_every: int = 50,
                 seed: int = 0, tensorboard: bool = True):
        self.model = model
        self.train_iter = train_iter
        self.val_batches = val_batches or []
        self.workdir = workdir
        self.total_steps = total_steps
        self.val_interval = val_interval
        self.save_interval = save_interval
        self.key_metric = key_metric
        self.log_every = log_every
        os.makedirs(workdir, exist_ok=True)
        self.ckpt = CheckpointManager(os.path.join(workdir, "ckpt"))
        self.log_path = os.path.join(workdir, "metrics.jsonl")
        self.rng = jax.random.PRNGKey(seed)
        self.lr_cfg = lr_cfg
        self.tb = None
        if tensorboard:
            try:  # TensorBoard writer (the reference logs via SummaryWriter)
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception:
                self.tb = None

    def _log(self, record: Dict[str, Any]):
        rec = {k: (float(v) if hasattr(v, "item") else v)
               for k, v in record.items()}
        with open(self.log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None and "step" in rec:
            prefix = "val/" if rec.get("val") else "train/"
            for k, v in rec.items():
                if isinstance(v, float):
                    self.tb.add_scalar(prefix + k, v, rec["step"])

    def validate(self, params) -> Dict[str, float]:
        eval_step = getattr(self, "_eval_step", None)
        if eval_step is None:
            eval_step = self._eval_step = make_eval_step(self.model)
        agg: Dict[str, list] = {}
        for batch in self.val_batches:
            out = eval_step(params, batch, jax.random.PRNGKey(0))
            for k, v in out.items():
                agg.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}

    def run(self, max_steps: Optional[int] = None):
        batch = next(self.train_iter)
        state = create_train_state(self.model, batch, self.rng, self.lr_cfg)
        best = np.inf
        restored = self.ckpt.restore(
            {"params": state.params, "opt_state": state.opt_state})
        start_step = 0
        if restored is not None:
            tree, start_step, best = restored
            state = state.replace(params=tree["params"],
                                  opt_state=tree["opt_state"],
                                  step=start_step)
        train_step = make_train_step(self.model)
        steps = max_steps or self.total_steps
        t0 = time.time()
        for step in range(start_step, steps):
            self.rng, k = jax.random.split(self.rng)
            state, metrics = train_step(state, batch, k)
            if (step + 1) % self.log_every == 0:
                sec = (time.time() - t0) / self.log_every
                n_rays = batch["data"]["que"]["coords"].shape[1]
                res = batch["sdf_gt"].shape[-1]
                rec = {"step": step + 1, "sec_per_step": sec,
                       "rays_per_s": n_rays * 80 / sec,       # 40+40 samples
                       "tsdf_queries_per_s": res ** 3 / sec,
                       **{k_: float(v) for k_, v in metrics.items()}}
                self._log(rec)
                t0 = time.time()
            if (step + 1) % self.val_interval == 0 and self.val_batches:
                val = self.validate(state.params)
                self._log({"step": step + 1, "val": True, **val})
                best = self.ckpt.save(
                    {"params": state.params, "opt_state": state.opt_state},
                    step + 1, key_metric=val.get(self.key_metric), best=best)
            elif (step + 1) % self.save_interval == 0:
                best = self.ckpt.save(
                    {"params": state.params, "opt_state": state.opt_state},
                    step + 1, best=best)
            batch = next(self.train_iter)
        return state
