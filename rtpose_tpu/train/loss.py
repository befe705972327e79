"""Multi-stage MSE supervision.

Reference train/train_VGG19.py:143-174 (get_loss): every refinement stage's
PAF and heatmap output gets a mean-reduced MSE against the same targets;
the total is the sum of all 2*num_stages terms.  Per-stage values are
returned for logging (the reference logs loss_stage{t}_L{1,2} names,
build_names :134-140).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.common import ModelOutput


def stagewise_mse(out: ModelOutput, heat_gt: jax.Array, paf_gt: jax.Array,
                  heat_mask: jax.Array = None, paf_mask: jax.Array = None
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """out.pafs/heatmaps: (S, B, h, w, C); *_gt: (B, h, w, C).

    Optional masks (B, h, w, 1) implement the masked loss of the alternate
    trainers (reference train/train_SH.py:80-126).
    Returns (total, per-stage dict).
    """
    S = out.pafs.shape[0]
    logs = {}
    total = 0.0
    for s in range(S):
        dp = out.pafs[s] - paf_gt
        dh = out.heatmaps[s] - heat_gt
        if paf_mask is not None:
            dp = dp * paf_mask
        if heat_mask is not None:
            dh = dh * heat_mask
        lp = jnp.mean(dp * dp)
        lh = jnp.mean(dh * dh)
        logs[f"loss_stage{s + 1}_L1"] = lp
        logs[f"loss_stage{s + 1}_L2"] = lh
        total = total + lp + lh
    logs["max_ht"] = jnp.max(out.heatmaps[-1])
    logs["min_ht"] = jnp.min(out.heatmaps[-1])
    logs["max_paf"] = jnp.max(out.pafs[-1])
    logs["min_paf"] = jnp.min(out.pafs[-1])
    return total, logs
