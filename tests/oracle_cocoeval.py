"""Independent brute-force COCOeval(keypoints) oracle for property tests.

VERDICT r2 Missing #3: pycocotools is absent in this environment, so
`evaluation/oks.py` cannot be pinned against a real-COCOeval golden
fixture. This module is the suggested mitigation — a SECOND, deliberately
naive implementation of the protocol (reference runs it via pycocotools in
eval.py:39-49), written scalar-first from the cocoeval.py semantics with
no code shared with `oks.py`: per-example OKS evaluated one keypoint at a
time, matching as literal rule-following over Python lists, AP/AR from an
explicit precision-recall table. `tests/test_eval.py` drives both
implementations over randomized scenes and asserts the 10-stat vectors
agree; structural divergence between the two makes a shared latent bug
unlikely everywhere except the matching-rule core, whose branches are
additionally pinned by the hand cases in test_eval.py.
"""

import math

SIGMAS = [.026, .025, .025, .035, .035, .079, .079, .072, .072,
          .062, .062, .107, .107, .087, .087, .089, .089]
# The grids are PROTOCOL CONSTANTS incl. their exact float values:
# pycocotools builds them with np.linspace, i.e. index*step + start with
# the endpoint forced — `0.5 + 0.05*i` / `i/100.0` differ in the last
# ULP at several entries (e.g. linspace 0.55000000000000004 vs 0.55),
# and a recall value sitting exactly ON a grid point then interpolates
# to a different precision column than the real protocol would
# (measured: AP@0.55 0.948 vs 0.939 on a 20-image scene whose recall
# steps are k/20). Reproduce linspace bit-exactly, scalar-first.
THRS = [i * ((0.95 - 0.5) / 9) + 0.5 for i in range(9)] + [0.95]
RECALL_PTS = [i * (1.0 / 100) for i in range(100)] + [1.0]
MAX_DETS = 20
AREAS = {"all": (0.0, 1e10), "medium": (32.0 ** 2, 96.0 ** 2),
         "large": (96.0 ** 2, 1e10)}


def oks_one(dt_kpts, gt):
    """OKS between one detection and one GT, scalar per keypoint."""
    g = gt["keypoints"]
    area = max(float(gt.get("area", 0.0)), 0.0)
    labeled = [k for k in range(17) if g[3 * k + 2] > 0]
    total, count = 0.0, 0
    if labeled:
        for k in labeled:
            dx = dt_kpts[3 * k] - g[3 * k]
            dy = dt_kpts[3 * k + 1] - g[3 * k + 1]
            e = ((dx * dx + dy * dy) / ((2 * SIGMAS[k]) ** 2)
                 / (area + 2.220446049250313e-16) / 2.0)
            total += math.exp(-e)
            count += 1
    else:
        bb = gt.get("bbox", [0, 0, 0, 0])
        z = math.sqrt(area) * 2
        x0, x1 = bb[0] - z, bb[0] + bb[2] + z
        y0, y1 = bb[1] - z, bb[1] + bb[3] + z
        for k in range(17):
            dx = max(0.0, max(x0 - dt_kpts[3 * k], dt_kpts[3 * k] - x1))
            dy = max(0.0, max(y0 - dt_kpts[3 * k + 1],
                              dt_kpts[3 * k + 1] - y1))
            e = ((dx * dx + dy * dy) / ((2 * SIGMAS[k]) ** 2)
                 / (area + 2.220446049250313e-16) / 2.0)
            total += math.exp(-e)
            count += 1
    return total / count


def _stable_sort(items, key):
    return [items[i] for i in
            sorted(range(len(items)), key=lambda i: key(items[i]))]


def match_image(dts, gts, area_rng):
    """cocoeval.evaluateImg as literal rule-following. Returns per-image
    lists: for each threshold, (matched_gt_index|-1, dt_ignored) per
    detection in score order, plus gt ignore flags and dt scores."""
    gts = [dict(g) for g in gts]
    for g in gts:
        g["_ig"] = 1 if (g.get("ignore", 0)
                         or g["area"] < area_rng[0]
                         or g["area"] > area_rng[1]) else 0
    gts = _stable_sort(gts, key=lambda g: g["_ig"])
    dts = _stable_sort(dts, key=lambda d: -d["score"])[:MAX_DETS]

    out_matches = []
    for t in THRS:
        taken = [False] * len(gts)
        row = []
        for d in dts:
            best_iou = min(t, 1 - 1e-10)
            best = -1
            for gi, g in enumerate(gts):
                if taken[gi] and not g.get("iscrowd", 0):
                    continue
                if best > -1 and gts[best]["_ig"] == 0 and g["_ig"] == 1:
                    break
                iou = oks_one(d["keypoints"], g)
                if iou < best_iou:
                    continue
                best_iou = iou
                best = gi
            if best >= 0:
                taken[best] = True
                row.append((best, gts[best]["_ig"] == 1))
            else:
                out_of_range = (d["area"] < area_rng[0]
                                or d["area"] > area_rng[1])
                row.append((-1, out_of_range))
        out_matches.append(row)
    return {"matches": out_matches,
            "gt_ig": [g["_ig"] for g in gts],
            "scores": [d["score"] for d in dts]}


def average_precision(flat):
    """One (threshold, area) cell: detections as (score, is_tp, ignored)
    over all images, GT count npig -> (AP over 101 recall pts, final
    recall)."""
    dets, npig = flat
    if npig == 0:
        return None, None
    dets = _stable_sort(dets, key=lambda d: -d[0])
    tp = fp = 0
    rc, pr = [], []
    for _score, is_tp, ignored in dets:
        if ignored:
            continue
        if is_tp:
            tp += 1
        else:
            fp += 1
        rc.append(tp / npig)
        pr.append(tp / (tp + fp + 2.220446049250313e-16))
    for i in range(len(pr) - 2, -1, -1):
        pr[i] = max(pr[i], pr[i + 1])
    q = []
    for r in RECALL_PTS:
        # first index with recall >= r (searchsorted 'left' on a
        # nondecreasing rc)
        pi = next((i for i, v in enumerate(rc) if v >= r), len(rc))
        q.append(pr[pi] if pi < len(pr) else 0.0)
    return sum(q) / len(q), (rc[-1] if rc else 0.0)


def evaluate(gt_annotations, predictions, img_ids):
    """The 10-element stats vector [AP, AP50, AP75, APm, APl, AR, AR50,
    AR75, ARm, ARl], brute force, from RAW inputs: COCO-style gt
    annotation dicts and {"image_id", "keypoints", "score"} detections —
    normalization (gt ignore flags, gt area fallback, detection area from
    the keypoint extent as loadRes does) happens here, independently."""
    gts_by_img, dts_by_img = {}, {}
    for ann in gt_annotations:
        if ann.get("category_id", 1) != 1:
            continue
        g = dict(ann)
        g["ignore"] = 1 if (g.get("iscrowd", 0) == 1
                            or g.get("num_keypoints", 0) == 0) else 0
        if "area" not in g:
            bb = g.get("bbox", [0, 0, 0, 0])
            g["area"] = float(bb[2]) * float(bb[3])
        gts_by_img.setdefault(int(ann["image_id"]), []).append(g)
    for p in predictions:
        d = dict(p)
        xs = [p["keypoints"][3 * k] for k in range(17)]
        ys = [p["keypoints"][3 * k + 1] for k in range(17)]
        d["area"] = (max(xs) - min(xs)) * (max(ys) - min(ys))
        dts_by_img.setdefault(int(p["image_id"]), []).append(d)

    stats = {}
    for aname, rng in AREAS.items():
        per_img = [match_image(dts_by_img.get(i, []),
                               gts_by_img.get(i, []), rng)
                   for i in img_ids
                   if dts_by_img.get(i) or gts_by_img.get(i)]
        ap_t, ar_t = [], []
        for ti in range(len(THRS)):
            dets = []
            npig = 0
            for e in per_img:
                npig += sum(1 for ig in e["gt_ig"] if ig == 0)
                for di, (m, ignored) in enumerate(e["matches"][ti]):
                    dets.append((e["scores"][di], m >= 0, ignored))
            ap, ar = average_precision((dets, npig))
            ap_t.append(ap)
            ar_t.append(ar)
        stats[aname] = (ap_t, ar_t)

    def mean(vals):
        vals = [v for v in vals if v is not None]
        return sum(vals) / len(vals) if vals else -1.0

    a, r = stats["all"]
    m_ap, m_ar = stats["medium"]
    l_ap, l_ar = stats["large"]
    return [mean(a), mean([a[0]]), mean([a[5]]), mean(m_ap), mean(l_ap),
            mean(r), mean([r[0]]), mean([r[5]]), mean(m_ar), mean(l_ar)]
