"""LR scheduling + phase control.

- ReduceLROnPlateau (reference train/train_VGG19.py:332: factor 0.8,
  patience 5, cooldown 3, threshold 1e-4 rel, driven by val loss)
- the two-phase freeze schedule: pretrained backbone convs frozen for the
  first N epochs, then released (reference train_VGG19.py:305-330)
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ReduceLROnPlateau:
    lr: float
    factor: float = 0.8
    patience: int = 5
    cooldown: int = 3
    min_lr: float = 1e-8
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    best: float = float("inf")
    num_bad: int = 0
    cooldown_left: int = 0

    def _improved(self, metric: float) -> bool:
        # torch semantics (reference train_VGG19.py:332 uses
        # threshold=1e-4, threshold_mode='rel'): micro-improvements do not
        # reset the bad-epoch counter
        if self.threshold_mode == "rel":
            return metric < self.best * (1.0 - self.threshold)
        return metric < self.best - self.threshold

    def step(self, metric: float) -> float:
        """Feed a validation metric (lower=better); returns current lr.

        Exact torch order of operations: cooldown decrements EVERY epoch
        (and suppresses bad-epoch counting while active) — decrementing it
        only on non-improved epochs would let alternating improve/plateau
        epochs stretch the cooldown indefinitely and delay LR drops vs the
        reference schedule.
        """
        if self._improved(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
            self.cooldown_left = self.cooldown
        return self.lr

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


def freeze_mask(params, frozen_paths, *, frozen: bool):
    """0/1 gradient-mask pytree: 0 on `frozen_paths` during phase 1.

    frozen_paths: iterable of path tuples (module names) whose subtree is
    frozen, e.g. VGG19RTPose.pretrained_conv_paths().
    """
    import jax

    frozen_set = {tuple(p) for p in frozen_paths}

    def label(path, leaf):
        names = tuple(p.key for p in path if hasattr(p, "key"))
        is_frozen = any(names[i:i + len(fp)] == fp
                        for fp in frozen_set
                        for i in range(len(names)))
        return 0.0 if (frozen and is_frozen) else 1.0

    return jax.tree_util.tree_map_with_path(label, params)
