"""Training driver: pjit data-parallel SGD with device-side GT synthesis.

The TPU-native analogue of reference train/train_VGG19.py:

- SGD + nesterov momentum, lr 1.0 (reference :310-313), two-phase freeze of
  the 10 pretrained VGG convs (:305-330), ReduceLROnPlateau on val loss
  (:332), best-checkpoint saving (:348-351) — plus working resume (the
  reference's TRAIN.RESUME flag is dead, SURVEY.md §5).
- One jitted train step: device GT synthesis from padded keypoints ->
  forward -> 12-term MSE -> grad -> masked update.  Batch sharded over the
  mesh `data` axis; params replicated; XLA inserts the gradient all-reduce
  (the DataParallel analogue).
- Gradient accumulation (a working version of the reference's unused
  TRAIN.STRIDE_APPLY, lib/config/default.py:96).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config
from ..data.gt import _device_impl
from ..models import get_model
from ..parallel import mesh as pmesh
from .loss import stagewise_mse
from .schedule import ReduceLROnPlateau, freeze_mask


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    model_state: Any       # batch_stats etc. (empty dict for BN-free nets)
    opt_state: Any
    lr: jax.Array          # current learning rate (host-controlled)
    grad_mask: Any         # 0/1 pytree for the freeze phase


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # lr folded in manually (state.lr) so plateau updates don't recompile
    tx = optax.sgd(learning_rate=1.0, momentum=cfg.train.momentum,
                   nesterov=cfg.train.nesterov)
    if cfg.train.clip_grad_norm > 0:
        # from-scratch training protection: one finite-but-huge step blows
        # params past the non-finite guard below (which can only skip
        # already-inf losses); global-norm clipping caps it at the source
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.train.clip_grad_norm), tx)
    if cfg.train.grad_accum_steps > 1:
        # working version of the reference's unused TRAIN.STRIDE_APPLY
        # (lib/config/default.py:96): apply every k-th microbatch
        tx = optax.MultiSteps(tx, cfg.train.grad_accum_steps)
    return tx


def _accepts_train_kwarg(model) -> bool:
    import inspect
    return "train" in inspect.signature(model.__call__).parameters


def make_train_step(model, tx, cfg: Config, gt_backend: str = "xla",
                    mesh=None):
    gt_fn = _device_impl()
    gy = gx = cfg.dataset.image_size // cfg.model.downsample
    has_train_kwarg = _accepts_train_kwarg(model)
    masked = cfg.train.masked_loss
    if gt_backend == "pallas" and mesh is not None and mesh.size > 1 \
            and mesh.shape[pmesh.MODEL_AXIS] > 1:
        # on a TP mesh the shard_map wrapper below would have to prove
        # model-axis replication through pallas_call; keep the XLA scan
        gt_backend = "xla"
    if gt_backend == "pallas":
        from ..ops.pallas_gt import gt_maps_pallas
        gt_batch = functools.partial(
            gt_maps_pallas, grid_y=gy, grid_x=gx,
            stride=cfg.model.downsample, sigma=cfg.dataset.sigma,
            limb_width=cfg.dataset.limb_width,
            interpret=jax.default_backend() != "tpu")
        if mesh is not None and mesh.size > 1:
            # pallas_call has no GSPMD partitioning rule, but GT synthesis
            # is per-image: shard_map over `data` runs the kernel on each
            # device's local batch shard (keypoints in, maps out, both
            # batch-sharded — no cross-device communication)
            from jax.sharding import PartitionSpec as P
            # check_vma off: pallas_call's out_shape ShapeDtypeStructs
            # carry no varying-mesh-axes info for the checker; the specs
            # are trivially correct (pure per-image map, batch in/out)
            gt_batch = jax.shard_map(
                gt_batch, mesh=mesh,
                in_specs=P(pmesh.DATA_AXIS),
                out_specs=(P(pmesh.DATA_AXIS), P(pmesh.DATA_AXIS)),
                check_vma=False)
    else:
        gt_batch = jax.vmap(functools.partial(
            gt_fn, grid_y=gy, grid_x=gx, stride=cfg.model.downsample,
            sigma=cfg.dataset.sigma, limb_width=cfg.dataset.limb_width))

    def _apply(params, model_state, images, train):
        variables = {"params": params, **model_state}
        kwargs = {"train": train} if has_train_kwarg else {}
        if train and model_state:
            out, new_state = model.apply(variables, images,
                                         mutable=list(model_state), **kwargs)
            return out, new_state
        return model.apply(variables, images, **kwargs), model_state

    def loss_fn(params, model_state, images, keypoints, mask, train):
        if isinstance(images, dict):
            # raw-RGB batches (NativeLoader(uint8_output=True)): ship
            # {"u8": (B,H,W,3) uint8, "window": (B,4) int32 x,y,w,h} — 4x
            # fewer host->device bytes than the float canvas — and fold
            # the loader's fused normalize + zero-pad into the graph:
            # same (v/255 - mean)/std as imgpipe.cpp, then exact 0
            # outside each image's content window (the float path's
            # canvas memset).
            from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
            u8, win = images["u8"], images["window"]
            x = (u8.astype(jnp.float32) / 255.0
                 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            ys = jnp.arange(x.shape[1])[None, :, None]
            xs = jnp.arange(x.shape[2])[None, None, :]
            x0, y0, ww, wh = (win[:, i][:, None, None] for i in range(4))
            inside = ((ys >= y0) & (ys < y0 + wh)
                      & (xs >= x0) & (xs < x0 + ww))
            images = x * inside[..., None]
        heat_gt, paf_gt = gt_batch(keypoints)
        out, new_state = _apply(params, model_state, images, train)
        hm = pm = None
        if masked and mask is not None:
            hm = pm = mask
        total, logs = stagewise_mse(out, heat_gt.astype(jnp.float32),
                                    paf_gt.astype(jnp.float32),
                                    heat_mask=hm, paf_mask=pm)
        return total, (logs, new_state)

    def train_step(state: TrainState, images, keypoints, mask):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (logs, new_model_state)), grads = grad_fn(
            state.params, state.model_state, images, keypoints, mask, True)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads,
                                       state.grad_mask)
        # failure guard: a non-finite loss (bad batch, overflow) skips the
        # whole update — params, momentum, and accumulator state all keep
        # their previous values (not just zeroed grads, which would still
        # let SGD momentum move params by lr*mu*trace) — the reference has
        # no failure handling at all (SURVEY.md §5)
        finite = jnp.isfinite(loss)
        updates, opt_state_new = tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr, updates)
        params_new = optax.apply_updates(state.params, updates)
        select = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda n, o: jnp.where(finite, n, o), new, old)
        params = select(params_new, state.params)
        opt_state = select(opt_state_new, state.opt_state)
        # model_state too: a NaN batch's BatchNorm running stats would
        # otherwise poison every subsequent eval forward permanently
        model_state = select(new_model_state, state.model_state)
        logs["loss"] = loss
        logs["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return state.replace(step=state.step + 1, params=params,
                             model_state=model_state,
                             opt_state=opt_state), logs

    def eval_step(state: TrainState, images, keypoints, mask):
        loss, (logs, _) = loss_fn(state.params, state.model_state, images,
                                  keypoints, mask, False)
        logs["loss"] = loss
        return logs

    return train_step, eval_step


from ..utils.meters import AverageMeter, MetricLogger  # noqa: E402


class Trainer:
    def __init__(self, cfg: Config, *, mesh=None, params=None,
                 log_dir: Optional[str] = None):
        self.cfg = cfg
        self.metrics = MetricLogger(log_dir, tensorboard=bool(log_dir))
        self.mesh = mesh or pmesh.make_mesh(cfg.parallel.num_data,
                                            cfg.parallel.num_model)
        dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" \
            else jnp.float32
        self.model = get_model(cfg.model.name,
                               num_stages=cfg.model.num_stages, dtype=dtype)
        if params is None:
            size = cfg.dataset.image_size

            # one jitted program for the whole init: eager flax init (and
            # he_reinit's per-leaf redraws) dispatch hundreds of tiny ops,
            # each paying the tunnel backend's ~0.4 s compile/dispatch RTT
            def _init(rng):
                p = self.model.init(
                    rng, jnp.zeros((1, size, size, 3), jnp.float32))
                if cfg.model.init_scheme == "scratch":
                    from ..models.common import he_reinit
                    p = he_reinit(p, seed=cfg.train.seed)
                return p

            params = jax.jit(_init)(jax.random.PRNGKey(cfg.train.seed))
        # split variables: trainable params vs model state (batch_stats)
        if "params" in params:
            model_state = {k: v for k, v in params.items() if k != "params"}
            params = params["params"]
        else:
            model_state = {}
        self.tx = make_optimizer(cfg)
        # pallas GT kernel on any TPU mesh: single-chip directly, sharded
        # meshes via shard_map over `data` (pallas_call itself has no
        # GSPMD rule; see make_train_step)
        gt_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        step_fn, eval_fn = make_train_step(self.model, self.tx, cfg,
                                           gt_backend=gt_backend,
                                           mesh=self.mesh)

        frozen_paths = self._frozen_paths()
        mask = freeze_mask(params, frozen_paths,
                           frozen=cfg.train.freeze_base_epochs > 0)
        state_host = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=self.tx.init(params),
            lr=jnp.asarray(cfg.train.lr, jnp.float32),
            grad_mask=mask)

        # Shardings: batch over `data`; params replicated, or channel-
        # sharded over `model` when tensor parallelism is enabled
        # (parallel/sharding.py) — gradients/momentum inherit via the
        # matching pytree.
        from ..parallel.sharding import state_shardings
        num_model = cfg.parallel.num_model
        state_sh = state_shardings(self.mesh, state_host, num_model)
        data = pmesh.batch_sharding(self.mesh)
        self.train_step = jax.jit(
            step_fn,
            in_shardings=(state_sh, data, data, data),
            out_shardings=(state_sh, pmesh.replicated(self.mesh)),
            donate_argnums=(0,))
        self.eval_step = jax.jit(
            eval_fn,
            in_shardings=(state_sh, data, data, data),
            out_shardings=pmesh.replicated(self.mesh))
        self.state = jax.tree_util.tree_map(jax.device_put, state_host,
                                            state_sh)
        self.plateau = ReduceLROnPlateau(
            lr=cfg.train.lr, factor=cfg.train.lr_factor,
            patience=cfg.train.lr_patience, cooldown=cfg.train.lr_cooldown)
        self.epoch = 0
        self.best_val = float("inf")

    def _frozen_paths(self):
        if self.cfg.model.name == "vgg19":
            from ..models.vgg19 import VGG19RTPose
            return VGG19RTPose.pretrained_conv_paths()
        return []

    # ---- phase control ----------------------------------------------------

    def maybe_release_backbone(self):
        """End of freeze phase (reference train_VGG19.py:323-330)."""
        if self.epoch == self.cfg.train.freeze_base_epochs:
            mask = freeze_mask(self.state.params, self._frozen_paths(),
                               frozen=False)
            self.state = self.state.replace(
                grad_mask=pmesh.replicate(self.mesh, mask))

    # ---- epoch loops ------------------------------------------------------

    def run_epoch(self, loader: Iterable, train: bool = True,
                  log_every: Optional[int] = None,
                  ckpt=None) -> Dict[str, float]:
        """One epoch; with `ckpt` and cfg.train.checkpoint_every_steps > 0,
        also writes mid-epoch elastic checkpoints (the reference loses all
        mid-epoch progress on a crash, SURVEY.md §5)."""
        log_every = log_every or self.cfg.train.print_freq
        every = self.cfg.train.checkpoint_every_steps
        meters: Dict[str, AverageMeter] = {}
        t_data = AverageMeter()
        t_step = AverageMeter()
        tic = time.time()
        gy = gx = self.cfg.dataset.image_size // self.cfg.model.downsample
        for i, batch in enumerate(loader):
            images = batch["image"]
            n_img = images.shape[0]
            kps = batch["keypoints"]
            mask = batch.get("mask")
            if mask is None:
                mask = np.ones((n_img, gy, gx, 1), np.float32)
            t_data.update(time.time() - tic)
            sh = pmesh.batch_sharding(self.mesh)
            if "valid_xywh" in batch:
                # NativeLoader(uint8_output=True) wire format: raw uint8
                # canvas + content window; loss_fn normalizes/zero-pads
                # in-graph (4x fewer H2D bytes than the float canvas)
                images = {"u8": images, "window": batch["valid_xywh"]}
            images = jax.device_put(images, sh)
            kps = jax.device_put(kps, sh)
            mask = jax.device_put(mask, sh)
            if train:
                self.state, logs = self.train_step(self.state, images, kps,
                                                   mask)
            else:
                logs = self.eval_step(self.state, images, kps, mask)
            # ONE host readback for all ~18 log scalars: on the tunnel
            # backend every np.asarray pays the full RTT (~0.5 s under
            # load), so per-key conversion turned a 0.4 s step into 10 s
            keys = sorted(logs)
            vals = np.asarray(jnp.stack([logs[k] for k in keys]))
            logs = {k: float(v) for k, v in zip(keys, vals)}
            for k, v in logs.items():
                meters.setdefault(k, AverageMeter()).update(v, n=n_img)
            t_step.update(time.time() - tic)
            tic = time.time()
            if i % log_every == 0:
                phase = "train" if train else "val"
                print(f"[{phase}] epoch {self.epoch} it {i} "
                      f"loss {logs['loss']:.5f} "
                      f"data {t_data.avg:.3f}s step {t_step.avg:.3f}s")
                if train:
                    self.metrics.log(int(np.asarray(self.state.step)),
                                     logs, prefix="train/")
            if (train and ckpt is not None and every
                    and (i + 1) % every == 0):
                step = int(np.asarray(self.state.step))
                ckpt.save(self.state, step=step,
                          meta={"epoch": self.epoch, "mid_epoch": True,
                                "best_val": self.best_val,
                                "plateau": self.plateau.state_dict()})
        return {k: m.avg for k, m in meters.items()}

    def fit(self, train_loader, val_loader, *, epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None):
        from .checkpoint import CheckpointManager
        ckpt = CheckpointManager(
            checkpoint_dir or self.cfg.train.checkpoint_dir,
            keep=self.cfg.train.keep_checkpoints)
        if self.cfg.train.resume:
            restored = ckpt.restore_latest(self.state)
            if restored is not None:
                self.state, meta = restored
                self.epoch = meta.get("epoch", 0)
                self.best_val = meta.get("best_val", float("inf"))
                self.plateau.load_state_dict(
                    meta.get("plateau", self.plateau.state_dict()))

        for _ in range(epochs or self.cfg.train.epochs):
            self.maybe_release_backbone()
            train_logs = self.run_epoch(train_loader, train=True,
                                        ckpt=ckpt)
            val_logs = self.run_epoch(val_loader, train=False)
            if "loss" not in val_logs:
                raise RuntimeError(
                    "validation epoch produced no batches — val set "
                    "smaller than batch_size with drop_last=True? build "
                    "the val loader with drop_last=False")
            val_loss = val_logs["loss"]
            lr = self.plateau.step(val_loss)
            self.state = self.state.replace(
                lr=jnp.asarray(lr, jnp.float32))
            is_best = val_loss < self.best_val
            self.best_val = min(val_loss, self.best_val)
            self.epoch += 1
            # epoch-end checkpoints use the GLOBAL optimizer step, the same
            # namespace as the mid-epoch elastic saves in run_epoch — a
            # per-epoch counter would collide with / sort below mid-epoch
            # step numbers, making restore_latest resume the wrong state
            # and _gc delete the newest epoch-end save
            ckpt.save(self.state, step=int(np.asarray(self.state.step)),
                      is_best=is_best,
                      meta={"epoch": self.epoch, "best_val": self.best_val,
                            "plateau": self.plateau.state_dict(),
                            "val_loss": val_loss,
                            "train_loss": train_logs["loss"]})
            print(f"epoch {self.epoch}: train {train_logs['loss']:.5f} "
                  f"val {val_loss:.5f} lr {lr:.4f} best={is_best}")
        return self.state
