"""Scene-level soak: transcription oracle vs the reference's REAL code.

Round-5 re-attribution of the 0.67%-of-scenes soak divergence
(SCALING.md "Decode validation"): the device decode was soaked against
the *transcribed* numpy oracle, and the divergence was attributed to
fp-tie sensitivity.  This soak runs N rendered multi-person scenes
through the reference's own pipeline (its NMS + compiled SWIG C++
pafprocess, built by tests/ref_oracle.py) and through our transcription
oracle (ops/grouping_ref.paf_to_people), comparing people, parts,
normalized coordinates and scores.

If the transcription is faithful, every divergence the device soak found
against the oracle is a divergence against the reference itself — the
attribution question reduces to device fp behavior, which
scripts/soak_decode.py already measures.

    python scripts/soak_vs_reference.py --scenes 300
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=300)
    ap.add_argument("--score-atol", type=float, default=1e-4)
    args = ap.parse_args()

    import ref_oracle as R
    from util_synth import synth_example
    from rtpose_tpu.ops import grouping_ref as G

    p2p = R.paf_to_pose_mod()
    cfg = R.make_config()

    n_people_total = 0
    coord_div = []
    score_max = 0.0
    t0 = time.time()
    for seed in range(args.scenes):
        _, heat, paf = synth_example(seed=seed, n_people=1 + seed % 6)
        heat = heat.astype(np.float32)
        paf = paf.astype(np.float32)
        humans = p2p.paf_to_pose_cpp(heat, paf, cfg)
        ours, scores = G.paf_to_people(heat, paf)
        n_people_total += len(humans)
        ref_parts = sorted(
            frozenset((k, (round(bp.x, 6), round(bp.y, 6),
                           round(bp.score, 4)))
                      for k, bp in h.body_parts.items())
            for h in humans)
        our_parts = sorted(
            frozenset((part, (round(p[part, 0], 6), round(p[part, 1], 6),
                              round(p[part, 2], 4)))
                      for part in range(18) if p[part, 0] >= 0)
            for p, s in zip(ours, scores))
        if ref_parts != our_parts:
            coord_div.append(seed)
            continue
        rs = sorted(h.score for h in humans)
        os_ = sorted(float(s) for s in scores)
        for a, b in zip(rs, os_):
            score_max = max(score_max, abs(a - b))

    out = {
        "scenes": args.scenes,
        "people": n_people_total,
        "scene_divergences": len(coord_div),
        "diverging_seeds": coord_div[:20],
        "max_person_score_delta": score_max,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    sys.exit(0 if not coord_div and score_max < args.score_atol else 1)


if __name__ == "__main__":
    main()
