"""Orbax-backed checkpointing with resume + best tracking.

Replaces the reference's save-only torch.save of the best state_dict
(reference train/train_VGG19.py:337-351); the reference's TRAIN.RESUME /
TRAIN.CHECKPOINT config keys are dead code (lib/config/default.py:98-99) —
here resume works.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)
        try:
            import orbax.checkpoint as ocp
            self._ckptr = ocp.PyTreeCheckpointer()
        except Exception:
            self._ckptr = None

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, state, *, step: int, is_best: bool = False,
             meta: Optional[Dict[str, Any]] = None) -> str:
        path = self._path(step)
        state_host = jax.tree_util.tree_map(np.asarray, state)
        if self._ckptr is not None:
            if os.path.exists(path):
                shutil.rmtree(path)
            self._ckptr.save(path, state_host)
        else:  # fallback: flat npz
            flat, _ = jax.tree_util.tree_flatten(state_host)
            np.savez(path + ".npz", *flat)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta or {}, f)
        if is_best:
            with open(os.path.join(self.directory, "best.json"), "w") as f:
                json.dump({"step": step, **(meta or {})}, f)
        self._gc()
        return path

    def _steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_") and name.endswith(".meta.json"):
                out.append(int(name[len("step_"):-len(".meta.json")]))
        return sorted(out)

    def _gc(self):
        steps = self._steps()
        best_step = self.best_step()
        for s in steps[:-self.keep]:
            if s == best_step:
                continue
            p = self._path(s)
            if os.path.isdir(p):
                shutil.rmtree(p)
            for suffix in (".npz", ".meta.json"):
                if os.path.exists(p + suffix):
                    os.remove(p + suffix)

    def best_step(self) -> Optional[int]:
        best = os.path.join(self.directory, "best.json")
        if os.path.exists(best):
            with open(best) as f:
                return json.load(f).get("step")
        return None

    def restore(self, step: int, template
                ) -> Tuple[Any, Dict[str, Any]]:
        path = self._path(step)
        template_host = jax.tree_util.tree_map(np.asarray, template)
        if self._ckptr is not None and os.path.isdir(path):
            state = self._ckptr.restore(path, item=template_host)
        else:
            flat, treedef = jax.tree_util.tree_flatten(template_host)
            data = np.load(path + ".npz")
            state = jax.tree_util.tree_unflatten(
                treedef, [data[k] for k in data.files])
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        return state, meta

    def restore_params(self, step: Optional[int] = None
                       ) -> Tuple[Any, Any, Dict[str, Any]]:
        """Serving-side restore: (params, model_state, meta) only.

        Template-free (raw orbax tree), so it works regardless of the
        optimizer the checkpoint was trained with — a plain-SGD serving
        process can load a clip_grad_norm/MultiSteps checkpoint whose
        opt_state pytree it could never reconstruct.  Orbax backend only.
        """
        if self._ckptr is None:
            raise RuntimeError("restore_params needs the orbax backend")
        if step is None:
            step = self.best_step()
        if step is None:
            steps = self._steps()
            if not steps:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}")
            step = steps[-1]
        raw = self._ckptr.restore(self._path(step))
        with open(self._path(step) + ".meta.json") as f:
            meta = json.load(f)
        return raw["params"], raw.get("model_state") or {}, meta

    def restore_latest(self, template):
        steps = self._steps()
        if not steps:
            return None
        return self.restore(steps[-1], template)

    def restore_best(self, template):
        step = self.best_step()
        if step is None:
            return self.restore_latest(template)
        return self.restore(step, template)
