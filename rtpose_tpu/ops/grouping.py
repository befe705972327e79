"""On-device PAF grouping: connection scoring + greedy person assembly.

TPU-native re-expression of the C++ grouping stage (reference
lib/pafprocess/pafprocess.cpp:22-194) as fixed-shape XLA programs:

- connection scoring: all 19 x K x K candidate pairs at once; the 10-sample
  PAF line integral becomes a vectorized gather.  The reference samples a
  nearest-neighbor x8-upsampled PAF at integer coords (paf_to_pose.py:382);
  nearest upsample by an integer factor is index division, so we gather the
  low-res PAF at (y//8, x//8) and never materialize the upsampled map.
- greedy 1-1 assignment per limb: candidates sorted by score, fixed-length
  `lax.scan` with used-row/used-col masks (semantics of pafprocess.cpp:96-124).
- person assembly: one `lax.scan` over the compacted connection list,
  maintaining a fixed (max_people, 20) subset array (pafprocess.cpp:127-191).

Peak ids are 1-based (cid = part*K + k + 1) so "slot is set" is exactly
`cid > 0` — intentionally fixing the reference's membership quirk where a
person holding global peak id 0 was invisible to the merge test
(pafprocess.cpp:153-158); the host oracle replicates both behaviors for
differential testing (ops/grouping_ref.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..skeleton import (GROUP_PAIRS, GROUP_PAIRS_NET, NUM_GROUP_PAIRS,
                        NUM_PARTS, NUM_SEED_PAIRS)
from .peaks import Peaks

STEP_PAF = 10
THRESH_VECTOR_SCORE = 0.05

_PAIR_A = np.array([p[0] for p in GROUP_PAIRS], dtype=np.int32)
_PAIR_B = np.array([p[1] for p in GROUP_PAIRS], dtype=np.int32)
_PAIR_CHX = np.array([c[0] for c in GROUP_PAIRS_NET], dtype=np.int32)
_PAIR_CHY = np.array([c[1] for c in GROUP_PAIRS_NET], dtype=np.int32)


@dataclasses.dataclass
class People:
    """Fixed-shape decoded people.

    coords: (P, 18, 2) int32 x,y in the upsampled frame (-1 if missing)
    part_score: (P, 18) float32 peak scores (0 if missing)
    score: (P,) float32 person score (score-sum / part-count)
    valid: (P,) bool
    truncated: bool scalar — True when ANY fixed-shape cap overflowed
    (max_peaks / max_candidates / max_total_conns / max_people); the
    result may then differ from the unbounded reference (pafprocess.cpp
    keeps dynamic lists).  Raise the cap at the call site and re-run.
    """
    coords: jax.Array
    part_score: jax.Array
    score: jax.Array
    valid: jax.Array
    truncated: jax.Array


jax.tree_util.register_pytree_node(
    People,
    lambda p: ((p.coords, p.part_score, p.score, p.valid, p.truncated),
               None),
    lambda _, c: People(*c),
)


def score_connections(peaks: Peaks, paf: jax.Array, *, factor: int = 8,
                      thresh_vector_cnt: int = 6,
                      sampling: str = "auto"
                      ) -> Tuple[jax.Array, jax.Array]:
    """Score all (pair, ia, ib) candidates.

    paf: (h, w, 38) low-res PAF.  Returns (scores, valid), both
    (NUM_GROUP_PAIRS, K, K); scores are criterion2 values
    (reference pafprocess.cpp:56-92).

    sampling — all modes select the exact same PAF cells (0/1 one-hot
    weights are exact in fp32; hardware-verified) and agree on the valid
    set; the accumulated sample sums can differ by ~1e-5 between backends
    (compiler FMA/accumulation choices), so candidates whose scores are
    closer than that may greedy-order differently — the same sensitivity
    any fp reimplementation of the reference C++ has (scripts/
    soak_decode.py measures the people-level effect at <0.5%).  Modes are
    chosen for speed per backend:
    - 'auto' (default): on TPU 'pallas_fused' for K <= 32 and 'pallas'
      for larger K (the K=64 retry path), 'onehot' elsewhere.  Round-5
      hardware measurement (scripts/decode_breakdown.py, SCALING.md
      decode table): full decode at K=32 fused 0.625 vs per-pair 0.674
      ms/img; at K=64 fused 1.311 vs per-pair 1.226 — the fused kernel's
      per-step win inverts once the K*K blocks grow
    - 'pallas_fused': VMEM-resident kernel, all 19 pairs per grid step
      (one step per image under vmap) — amortizes the per-step dispatch
      latency that bounds the per-pair kernel; hardware-validated round 5
      (rtpose_tpu.selftest decode parity runs this mode on TPU)
    - 'pallas': same kernel body, one PAIR per grid step — measured 0.39
      ms/img vs 0.64 for 'onehot' on the v5e (no HBM'd intermediates)
    - 'onehot': XLA scan of one-hot row/column contractions
    - 'gather': naive jnp.take (TPU has no hardware gather: ~400 ms per
      72-image batch vs ~10 ms; kept for differential tests / large-K on
      CPU)
    """
    h, w, _ = paf.shape
    h_up = h * factor
    K = peaks.x.shape[1]
    if sampling == "auto":
        if jax.default_backend() == "tpu":
            sampling = "pallas_fused" if K <= 32 else "pallas"
        else:
            sampling = "onehot"
    if sampling not in ("onehot", "gather", "pallas", "pallas_fused"):
        raise ValueError(f"sampling must be 'auto', 'onehot', 'gather', "
                         f"'pallas' or 'pallas_fused', got {sampling!r}")

    ax = peaks.x[_PAIR_A].astype(jnp.float32)      # (19, K)
    ay = peaks.y[_PAIR_A].astype(jnp.float32)
    bx = peaks.x[_PAIR_B].astype(jnp.float32)
    by = peaks.y[_PAIR_B].astype(jnp.float32)
    va = peaks.valid[_PAIR_A]
    vb = peaks.valid[_PAIR_B]

    dx = bx[:, None, :] - ax[:, :, None]           # (19, K_a, K_b)
    dy = by[:, None, :] - ay[:, :, None]
    norm = jnp.sqrt(dx * dx + dy * dy)
    nz = norm >= 1e-12
    ux = jnp.where(nz, dx / jnp.maximum(norm, 1e-12), 0.0)
    uy = jnp.where(nz, dy / jnp.maximum(norm, 1e-12), 0.0)

    # integer sample coords: int(ax + s*(dx/10) + 0.5), truncation like C++
    # — step precomputed first, the reference's exact expression
    # (pafprocess.cpp:223-229), so 1-ulp rounding matches the host backends
    step_x = dx / STEP_PAF                         # (19, Ka, Kb)
    step_y = dy / STEP_PAF
    if sampling in ("pallas", "pallas_fused"):
        # fused VMEM-resident kernels (ops/pallas_kernels.py): bit-identical
        # accumulation order, no HBM'd one-hot intermediates.  The _fused
        # variant runs all 19 pairs in one grid step (one step per image
        # under vmap) — the per-pair kernel is per-step-latency-bound.
        from .pallas_kernels import paf_sample_scores, paf_sample_scores_fused
        kern = (paf_sample_scores_fused if sampling == "pallas_fused"
                else paf_sample_scores)
        C = K * K
        pafxt = jnp.moveaxis(paf[:, :, _PAIR_CHX], -1, 0)   # (19, h, w)
        pafxt = jnp.swapaxes(pafxt, 1, 2)                    # (19, w, h)
        pafyt = jnp.swapaxes(
            jnp.moveaxis(paf[:, :, _PAIR_CHY], -1, 0), 1, 2)
        geo = jnp.stack([
            jnp.broadcast_to(ax[:, :, None], dx.shape).reshape(-1, C),
            jnp.broadcast_to(ay[:, :, None], dy.shape).reshape(-1, C),
            step_x.reshape(-1, C),
            step_y.reshape(-1, C),
            ux.reshape(-1, C),
            uy.reshape(-1, C),
        ], axis=1)                                           # (19, 6, C)
        cnt_f, ssum = kern(pafxt, pafyt, geo, factor=factor)
        cnt = cnt_f.reshape(NUM_GROUP_PAIRS, K, K).astype(jnp.int32)
        mean = ssum.reshape(NUM_GROUP_PAIRS, K, K) / STEP_PAF
    elif sampling == "onehot":
        # (19, h, w, 2): per-pair x/y channel planes stacked so one einsum
        # pass over the (large) row one-hot covers both components
        pafxy = jnp.stack([jnp.moveaxis(paf[:, :, _PAIR_CHX], -1, 0),
                           jnp.moveaxis(paf[:, :, _PAIR_CHY], -1, 0)],
                          axis=-1)

        # lax.scan over the 10 samples: bounds the one-hot intermediates at
        # (19, Ka, Kb, w, 2) per step — the fused (..., 10, h) formulation
        # OOMs at K=64 x batch 64 (XLA materializes a 19 GB buffer) — and
        # accumulates the sample sum in the C++ oracle's sequential fp32
        # order (pafprocess.cpp:76-80)
        def sample_step(carry, s):
            cnt, ssum = carry
            sf = s.astype(jnp.float32)
            lx = (ax[:, :, None] + sf * step_x + 0.5).astype(jnp.int32)
            ly = (ay[:, :, None] + sf * step_y + 0.5).astype(jnp.int32)
            # nearest-upsample sampling == low-res index division
            gx = jnp.clip(lx // factor, 0, w - 1)
            gy = jnp.clip(ly // factor, 0, h - 1)
            yoh = (gy[..., None]
                   == jnp.arange(h, dtype=jnp.int32)).astype(jnp.float32)
            xoh = (gx[..., None]
                   == jnp.arange(w, dtype=jnp.int32)).astype(jnp.float32)
            # precision=HIGHEST: the TPU default lowers fp32 einsum to a
            # single bf16 MXU pass, which rounds the PAF values (~2e-3 —
            # enough to flip threshold decisions); the multi-pass mode is
            # bit-exact for 0/1 weights
            rowxy = jnp.einsum("pabr,prcz->pabcz", yoh, pafxy,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
            pxy = jnp.sum(rowxy * xoh[..., None], axis=-2)  # (19,Ka,Kb,2)
            sc = ux * pxy[..., 0] + uy * pxy[..., 1]
            return (cnt + (sc > THRESH_VECTOR_SCORE).astype(jnp.int32),
                    ssum + sc), None

        init = (jnp.zeros(dx.shape, jnp.int32),
                jnp.zeros(dx.shape, jnp.float32))
        (cnt, ssum), _ = jax.lax.scan(sample_step, init,
                                      jnp.arange(STEP_PAF))
        mean = ssum / STEP_PAF
    else:
        s = jnp.arange(STEP_PAF, dtype=jnp.float32)    # (10,)
        lx = (ax[:, :, None, None] + s * step_x[..., None] + 0.5
              ).astype(jnp.int32)                      # (19, Ka, Kb, 10)
        ly = (ay[:, :, None, None] + s * step_y[..., None] + 0.5
              ).astype(jnp.int32)
        gx = jnp.clip(lx // factor, 0, w - 1)
        gy = jnp.clip(ly // factor, 0, h - 1)
        base = gy * (w * 38) + gx * 38
        paf_flat = paf.reshape(-1)
        chx = _PAIR_CHX[:, None, None, None]
        chy = _PAIR_CHY[:, None, None, None]
        px = jnp.take(paf_flat, base + chx)
        py = jnp.take(paf_flat, base + chy)
        sample_score = ux[..., None] * px + uy[..., None] * py
        cnt = jnp.sum(sample_score > THRESH_VECTOR_SCORE, axis=-1)
        mean = jnp.mean(sample_score, axis=-1)
    crit2 = mean + jnp.minimum(0.0, 0.5 * h_up / jnp.maximum(norm, 1e-12)
                               - 1.0)
    valid = (va[:, :, None] & vb[:, None, :] & nz
             & (cnt > thresh_vector_cnt) & (crit2 > 0))
    return crit2, valid


def greedy_connections(scores: jax.Array, valid: jax.Array,
                       max_conns: int = 256
                       ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Greedy 1-1 assignment per pair over score-sorted candidates.

    Returns per-pair connection slots (pair-major acceptance order):
    (conn_ia, conn_ib, conn_score, conn_valid), each (19, K), plus a
    scalar bool `overflow` (a pair had more valid candidates than the
    top-k window, so a low-scoring candidate was never considered).
    """
    P, Ka, Kb = scores.shape
    K = Ka
    flat_scores = jnp.where(valid, scores, -jnp.inf).reshape(P, Ka * Kb)
    C = min(max_conns, Ka * Kb)
    overflow = jnp.any(jnp.sum(valid.reshape(P, -1), axis=-1) > C)
    top_scores, top_idx = jax.lax.top_k(flat_scores, C)   # (19, C) desc
    top_ia = top_idx // Kb
    top_ib = top_idx % Kb
    top_valid = jnp.isfinite(top_scores)

    def step(state, c):
        used_a, used_b, n_acc = state
        ia = top_ia[:, c]
        ib = top_ib[:, c]
        # one-hot membership instead of take_along_axis: per-iteration
        # dynamic indexing in a scan body lowers to gathers (TPU-hostile,
        # same lesson as the PAF sampler); the one-hots are reused for the
        # update below
        oh_a = jax.nn.one_hot(ia, K, dtype=bool)
        oh_b = jax.nn.one_hot(ib, K, dtype=bool)
        ok = (top_valid[:, c]
              & ~jnp.any(used_a & oh_a, axis=1)
              & ~jnp.any(used_b & oh_b, axis=1))
        used_a = used_a | (oh_a & ok[:, None])
        used_b = used_b | (oh_b & ok[:, None])
        slot = jnp.where(ok, n_acc, K)  # K = overflow (dropped)
        n_acc = n_acc + ok.astype(jnp.int32)
        return (used_a, used_b, n_acc), (ok, slot)

    init = (jnp.zeros((P, K), bool), jnp.zeros((P, K), bool),
            jnp.zeros((P,), jnp.int32))
    _, (acc, slots) = jax.lax.scan(step, init, jnp.arange(C))
    acc = acc.T          # (19, C)
    slots = slots.T      # (19, C) target slot in [0, K)

    conn_ia = jnp.full((P, K + 1), 0, jnp.int32)
    conn_ib = jnp.full((P, K + 1), 0, jnp.int32)
    conn_score = jnp.zeros((P, K + 1), jnp.float32)
    conn_valid = jnp.zeros((P, K + 1), bool)
    rows = jnp.arange(P)[:, None]
    conn_ia = conn_ia.at[rows, slots].set(jnp.where(acc, top_ia, 0))
    conn_ib = conn_ib.at[rows, slots].set(jnp.where(acc, top_ib, 0))
    conn_score = conn_score.at[rows, slots].set(
        jnp.where(acc, top_scores, 0.0))
    conn_valid = conn_valid.at[rows, slots].set(acc)
    return (conn_ia[:, :K], conn_ib[:, :K], conn_score[:, :K],
            conn_valid[:, :K], overflow)


def assemble_people(conn_ia, conn_ib, conn_score, conn_valid,
                    peaks: Peaks, *, max_people: int = 64,
                    min_part_cnt: int = 4, min_human_score: float = 0.3,
                    max_total_conns: int = 160,
                    extra_truncated=False) -> People:
    """Sequential person assembly (reference pafprocess.cpp:127-191).

    Consumes connections in (pair, acceptance-slot) order through one
    `lax.scan` over a compacted fixed-length list.
    """
    K = peaks.x.shape[1]
    Pp = max_people
    score_flat = peaks.score.reshape(-1)      # (18*K,)
    x_flat = peaks.x.reshape(-1)
    y_flat = peaks.y.reshape(-1)

    # 1-based global cids
    part_a = jnp.asarray(_PAIR_A)
    part_b = jnp.asarray(_PAIR_B)
    k_idx = jnp.arange(K)[None, :]
    cid1 = (part_a[:, None] * K + conn_ia + 1).astype(jnp.float32)
    cid2 = (part_b[:, None] * K + conn_ib + 1).astype(jnp.float32)
    ps1 = score_flat[part_a[:, None] * K + conn_ia]
    ps2 = score_flat[part_b[:, None] * K + conn_ib]
    del k_idx

    # Compact (19, K) conns -> length-M list preserving order.
    M = min(max_total_conns, NUM_GROUP_PAIRS * K)
    flat_valid = conn_valid.reshape(-1)
    conn_overflow = jnp.sum(flat_valid) > M
    pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    pos = jnp.where(flat_valid & (pos < M), pos, M)  # M = dropped

    def compact(x, fill):
        out = jnp.full((M + 1,), fill, x.dtype)
        return out.at[pos].set(x.reshape(-1))[:M]

    pair_of = jnp.repeat(jnp.arange(NUM_GROUP_PAIRS, dtype=jnp.int32), K)
    c_pair = compact(pair_of, NUM_GROUP_PAIRS)
    c_cid1 = compact(cid1, 0.0)
    c_cid2 = compact(cid2, 0.0)
    c_ps1 = compact(ps1, 0.0)
    c_ps2 = compact(ps2, 0.0)
    c_score = compact(conn_score, 0.0)
    c_valid = compact(flat_valid, False)

    subset0 = jnp.full((Pp, 20), -1.0, jnp.float32)
    subset0 = subset0.at[:, 19].set(0.0)   # count 0 == dead row

    iota_col = jnp.arange(20)              # (20,) subset columns
    iota_row = jnp.arange(Pp)              # (Pp,) subset rows
    col18 = (iota_col == 18).astype(jnp.float32)
    col19 = (iota_col == 19).astype(jnp.float32)
    body_cols = (iota_col < NUM_PARTS).astype(jnp.float32)
    dead = jnp.full((20,), -1.0).at[19].set(0.0)

    def step(state, inp):
        # Per-iteration dynamic indexing (take / at[s].set / row select by
        # traced index) lowers to gathers + dynamic-update-slices inside
        # the scan body — TPU-hostile (same lesson as the PAF sampler and
        # sub-pixel refine); everything here is one-hot masks + selects:
        # measured: full decode 0.80 -> 0.57 ms/img (v5e, batch 64).
        subset, next_slot, dropped = state
        pair, k1, k2, s1p, s2p, cscore, cvalid = inp
        p1 = part_a[jnp.minimum(pair, NUM_GROUP_PAIRS - 1)]
        p2 = part_b[jnp.minimum(pair, NUM_GROUP_PAIRS - 1)]
        oh_p1 = (iota_col == p1).astype(jnp.float32)     # (20,)
        oh_p2 = (iota_col == p2).astype(jnp.float32)
        alive = subset[:, 19] > 0
        col1 = jnp.sum(subset * oh_p1, axis=1)           # (Pp,)
        col2 = jnp.sum(subset * oh_p2, axis=1)
        match = alive & ((col1 == k1) | (col2 == k2))
        found = jnp.sum(match.astype(jnp.int32))
        s1 = jnp.argmax(match)
        match2 = match & (iota_row != s1)
        s2 = jnp.argmax(match2)
        oh_s1 = (iota_row == s1).astype(jnp.float32)     # (Pp,)
        oh_s2 = (iota_row == s2).astype(jnp.float32)

        r1 = jnp.sum(subset * oh_s1[:, None], axis=0)    # (20,)
        r2 = jnp.sum(subset * oh_s2[:, None], axis=0)
        membership = jnp.any((r1[:NUM_PARTS] > 0) & (r2[:NUM_PARTS] > 0))

        is_seed = pair < NUM_SEED_PAIRS
        can_new = next_slot < Pp
        b_new = cvalid & (found == 0) & is_seed & can_new
        b_ext1 = cvalid & (found == 1)
        # exactly two (reference pafprocess.cpp:161 'else if (found == 2)');
        # a connection matching 3+ subset rows is dropped entirely
        b_ext2 = cvalid & (found == 2) & membership
        b_merge = cvalid & (found == 2) & ~membership

        # --- new row into slot next_slot
        oh_new = (iota_row == jnp.minimum(next_slot, Pp - 1)
                  ).astype(jnp.float32)
        new_row = (-1.0 * (1 - oh_p1 - oh_p2 - col18 - col19)
                   + k1 * oh_p1 + k2 * oh_p2
                   + 2.0 * col19 + (s1p + s2p + cscore) * col18)
        w_new = jnp.where(b_new, oh_new, 0.0)[:, None]
        subset = subset * (1 - w_new) + w_new * new_row[None, :]

        # --- extend row s1 (guarded when found==1; unconditional when
        # found==2 with membership, matching pafprocess.cpp:146-151,168-172)
        r1_p2 = jnp.sum(r1 * oh_p2)
        do_set = b_ext2 | (b_ext1 & (r1_p2 != k2))
        ext_row = (r1 * (1 - oh_p2) + k2 * oh_p2
                   + 1.0 * col19 + (s2p + cscore) * col18)
        w_ext = jnp.where(do_set, oh_s1, 0.0)[:, None]
        subset = subset * (1 - w_ext) + w_ext * ext_row[None, :]

        # --- merge rows s1 <- s2, kill s2
        merged = (r1 + (r2 + 1.0) * body_cols
                  + r2[19] * col19 + (r2[18] + cscore) * col18)
        w_mrg = jnp.where(b_merge, oh_s1, 0.0)[:, None]
        subset = subset * (1 - w_mrg) + w_mrg * merged[None, :]
        w_kill = jnp.where(b_merge, oh_s2, 0.0)[:, None]
        subset = subset * (1 - w_kill) + w_kill * dead[None, :]

        next_slot = next_slot + b_new.astype(jnp.int32)
        # a seed connection that needed a new person but found no free row
        dropped = dropped | (cvalid & (found == 0) & is_seed & ~can_new)
        return (subset, next_slot, dropped), None

    inputs = (c_pair, c_cid1, c_cid2, c_ps1, c_ps2, c_score, c_valid)
    (subset, _, people_overflow), _ = jax.lax.scan(
        step, (subset0, jnp.int32(0), jnp.asarray(False)), inputs)

    count = subset[:, 19]
    ssum = subset[:, 18]
    person_valid = ((count >= min_part_cnt)
                    & (ssum / jnp.maximum(count, 1.0) >= min_human_score)
                    & (count > 0))
    cids = subset[:, :NUM_PARTS].astype(jnp.int32)     # 1-based or -1
    has = cids > 0
    flat_cid = jnp.clip(cids - 1, 0, NUM_PARTS * K - 1)
    coords = jnp.stack([
        jnp.where(has, x_flat[flat_cid], -1),
        jnp.where(has, y_flat[flat_cid], -1)], axis=-1).astype(jnp.int32)
    part_score = jnp.where(has, score_flat[flat_cid], 0.0)
    truncated = (jnp.asarray(extra_truncated) | peaks.truncated
                 | conn_overflow | people_overflow)
    return People(coords=coords, part_score=part_score,
                  score=ssum / jnp.maximum(count, 1.0),
                  valid=person_valid, truncated=truncated)


def group_peaks_device(peaks: Peaks, paf: jax.Array, *, factor: int = 8,
                       thresh_vector_cnt: int = 6, max_people: int = 64,
                       min_part_cnt: int = 4, min_human_score: float = 0.3,
                       max_candidates: int = 256,
                       max_total_conns: int = 160,
                       sampling: str = "auto") -> People:
    """peaks + low-res PAF -> fixed-shape people.

    sampling='gather' is bit-identical but cheaper at large K on CPU
    (the one-hot contraction trades memory for TPU-friendly matmuls).
    """
    scores, valid = score_connections(peaks, paf, factor=factor,
                                      thresh_vector_cnt=thresh_vector_cnt,
                                      sampling=sampling)
    *conns, cand_overflow = greedy_connections(scores, valid,
                                               max_conns=max_candidates)
    return assemble_people(*conns, peaks, max_people=max_people,
                           min_part_cnt=min_part_cnt,
                           min_human_score=min_human_score,
                           max_total_conns=max_total_conns,
                           extra_truncated=cand_overflow)
