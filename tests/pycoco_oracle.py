"""A second, independent implementation of the COCO keypoint eval protocol.

Differential-testing oracle for rtpose_tpu/evalx/cocoeval.py: this file is a
deliberately literal transcription of the pycocotools COCOeval algorithm
(cocoeval.py, 'keypoints' iouType) — per-image dict records, the same sort
kinds, the same matching loop, the same accumulate indexing — so that any
protocol divergence in the production evaluator (tie-breaking, ignore
handling, 101-point interpolation edges) shows up as a stats mismatch on
randomized annotation/detection sets (tests/test_cocoeval_differential.py).

Kept under tests/ on purpose: it is an oracle, not a product API.
"""

import numpy as np

SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89]) / 10.0
IOU_THRS = np.linspace(.5, 0.95, int(np.round((0.95 - .5) / .05)) + 1)
REC_THRS = np.linspace(.0, 1.00, int(np.round((1.00 - .0) / .01)) + 1)
MAX_DET = 20
AREA_RNGS = [[0 ** 2, 1e5 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
AREA_LBLS = ["all", "medium", "large"]


def _prepare(gts_by_img, dts_by_img, img_ids):
    """pycocotools COCOeval._prepare + loadRes for keypoint results."""
    gts, dts = {}, {}
    next_dt_id = 1
    for img_id in img_ids:
        g_list = []
        for g in gts_by_img.get(img_id, []):
            g = dict(g)
            g["ignore"] = g.get("ignore", 0) or g.get("iscrowd", 0)
            # keypoints task: unlabeled gts are ignore
            g["ignore"] = (g.get("num_keypoints", 0) == 0) or g["ignore"]
            g_list.append(g)
        d_list = []
        for d in dts_by_img.get(img_id, []):
            d = dict(d)
            s = np.asarray(d["keypoints"], float)
            x, y = s[0::3], s[1::3]
            x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
            d["area"] = (x1 - x0) * (y1 - y0)          # loadRes overwrites
            d["bbox"] = [x0, y0, x1 - x0, y1 - y0]
            d["id"] = next_dt_id
            next_dt_id += 1
            d_list.append(d)
        gts[img_id] = g_list
        dts[img_id] = d_list
    return gts, dts


def compute_oks_matrix(gt, dt):
    """COCOeval.computeOks: rows = dts (score-sorted, capped), cols = gts."""
    inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dt = [dt[i] for i in inds]
    if len(dt) > MAX_DET:
        dt = dt[0:MAX_DET]
    if len(gt) == 0 or len(dt) == 0:
        return np.zeros((len(dt), len(gt)))
    ious = np.zeros((len(dt), len(gt)))
    vars_ = (SIGMAS * 2) ** 2
    k = len(SIGMAS)
    for j, g in enumerate(gt):
        xg = np.asarray(g["keypoints"], float)[0::3]
        yg = np.asarray(g["keypoints"], float)[1::3]
        vg = np.asarray(g["keypoints"], float)[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = g["bbox"]
        x0 = bb[0] - bb[2]
        x1 = bb[0] + bb[2] * 2
        y0 = bb[1] - bb[3]
        y1 = bb[1] + bb[3] * 2
        for i, d in enumerate(dt):
            xd = np.asarray(d["keypoints"], float)[0::3]
            yd = np.asarray(d["keypoints"], float)[1::3]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                z = np.zeros(k)
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1),
                                                           axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1),
                                                           axis=0)
            e = (dx ** 2 + dy ** 2) / vars_ / (g["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def evaluate_img(gt, dt, ious_full, a_rng):
    """COCOeval.evaluateImg."""
    if len(gt) == 0 and len(dt) == 0:
        return None
    for g in gt:
        if g["ignore"] or (g["area"] < a_rng[0] or g["area"] > a_rng[1]):
            g["_ignore"] = 1
        else:
            g["_ignore"] = 0
    gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dt = [dt[i] for i in dtind[0:MAX_DET]]
    iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
    ious = ious_full[:, gtind] if len(ious_full) > 0 else ious_full

    T = len(IOU_THRS)
    G = len(gt)
    D = len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gt])
    dt_ig = np.zeros((T, D))
    if len(ious) != 0:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = gt[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                  for d in dt]).reshape((1, len(dt)))
    dt_ig = np.logical_or(dt_ig, np.logical_and(
        dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dt],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def accumulate(eval_imgs):
    """COCOeval.accumulate for one (areaRng, maxDet) slot."""
    T = len(IOU_THRS)
    R = len(REC_THRS)
    precision = -np.ones((T, R))
    recall = -np.ones(T)
    E = [e for e in eval_imgs if e is not None]
    if len(E) == 0:
        return precision, recall
    dt_scores = np.concatenate([e["dtScores"][0:MAX_DET] for e in E])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"][:, 0:MAX_DET] for e in E],
                         axis=1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"][:, 0:MAX_DET] for e in E],
                           axis=1)[:, inds]
    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
    npig = np.count_nonzero(gt_ig == 0)
    if npig == 0:
        return precision, recall
    tps = np.logical_and(dtm, np.logical_not(dt_ig))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros(R)
        recall[t] = rc[-1] if nd else 0
        pr = pr.tolist()
        q = q.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds2 = np.searchsorted(rc, REC_THRS, side="left")
        for ri, pi in enumerate(inds2):
            try:
                q[ri] = pr[pi]
            except IndexError:
                pass
        precision[t] = np.array(q)
    return precision, recall


def evaluate_keypoints_oracle(gts_by_img, dts_by_img, img_ids=None):
    """Full pipeline; returns the same 10-entry stats dict layout as
    rtpose_tpu.evalx.cocoeval.evaluate_keypoints."""
    if img_ids is None:
        img_ids = sorted(gts_by_img)
    gts, dts = _prepare(gts_by_img, dts_by_img, img_ids)
    ious = {i: compute_oks_matrix(gts[i], dts[i]) for i in img_ids}
    per_area = {}
    for lbl, a_rng in zip(AREA_LBLS, AREA_RNGS):
        evs = [evaluate_img([dict(g) for g in gts[i]],
                            [dict(d) for d in dts[i]], ious[i], a_rng)
               for i in img_ids]
        per_area[lbl] = accumulate(evs)

    def _mean(x):
        x = x[x > -1]
        return float(np.mean(x)) if x.size else -1.0

    p_all, r_all = per_area["all"]
    p_m, r_m = per_area["medium"]
    p_l, r_l = per_area["large"]
    return {
        "AP": _mean(p_all), "AP50": _mean(p_all[0]), "AP75": _mean(p_all[5]),
        "APm": _mean(p_m), "APl": _mean(p_l),
        "AR": _mean(r_all), "AR50": float(r_all[0]), "AR75": float(r_all[5]),
        "ARm": _mean(r_m), "ARl": _mean(r_l),
    }
