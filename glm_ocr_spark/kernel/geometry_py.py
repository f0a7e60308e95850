"""Small-n geometry fast path (pure Python, tuple-based).

Layout pages carry ~5-30 blocks; at that size numpy's per-call overhead
costs more than the math. This module mirrors glm_ocr_spark.kernel.geometry
exactly (same IEEE-double arithmetic, same tie-breaking, same thresholds)
on parallel tuples instead of arrays; extract_turn dispatches here for
n <= SMALL_N and to the vectorized path above it. Equivalence between the
two paths is enforced by a dedicated randomized test
(tests/test_geometry_paths.py) on top of the kernel-vs-oracle gate.

Row format: tuple (cls_id, score, x1, y1, x2, y2, order) of Python floats.
"""

from __future__ import annotations

from glm_ocr_spark.config import (
    CONTAINMENT_OVERLAP_RATIO,
    NMS_IOU_DIFF,
    NMS_IOU_SAME,
    OVERSIZE_AREA_THRESHOLD_LANDSCAPE,
    OVERSIZE_AREA_THRESHOLD_PORTRAIT,
)

SMALL_N = 64


def iou(a, b) -> float:
    """+1-pixel IoU (layout_postprocess_utils.py:7-28 convention)."""
    ix1 = a[2] if a[2] > b[2] else b[2]
    iy1 = a[3] if a[3] > b[3] else b[3]
    ix2 = a[4] if a[4] < b[4] else b[4]
    iy2 = a[5] if a[5] < b[5] else b[5]
    iw = ix2 - ix1 + 1
    ih = iy2 - iy1 + 1
    if iw <= 0 or ih <= 0:
        inter = 0.0
    else:
        inter = iw * ih
    a1 = (a[4] - a[2] + 1) * (a[5] - a[3] + 1)
    a2 = (b[4] - b[2] + 1) * (b[5] - b[3] + 1)
    den = a1 + a2 - inter
    if den == 0:
        # zero-area pair under the +1 convention: the vectorized path yields
        # NaN here (0/0), and NaN < thr is False -> suppressed; match that
        return float("nan")
    return inter / den


def nms(rows: list[tuple], iou_same: float = NMS_IOU_SAME,
        iou_diff: float = NMS_IOU_DIFF) -> list[int]:
    """Greedy dual-threshold NMS; np.argsort(score)[::-1] tie order (later
    index first on equal scores)."""
    order = sorted(range(len(rows)), key=lambda i: (-rows[i][1], -i))
    kept: list[int] = []
    while order:
        cur = order[0]
        kept.append(cur)
        rest = []
        cur_row = rows[cur]
        cc, cx1, cy1, cx2, cy2 = (cur_row[0], cur_row[2], cur_row[3],
                                  cur_row[4], cur_row[5])
        ca = (cx2 - cx1 + 1) * (cy2 - cy1 + 1)
        for i in order[1:]:
            b = rows[i]
            # iou() inlined (the O(n^2) hot loop); same arithmetic and
            # division form, NaN (den==0) suppresses exactly as iou() does
            ix1 = cx1 if cx1 > b[2] else b[2]
            iy1 = cy1 if cy1 > b[3] else b[3]
            ix2 = cx2 if cx2 < b[4] else b[4]
            iy2 = cy2 if cy2 < b[5] else b[5]
            iw = ix2 - ix1 + 1
            ih = iy2 - iy1 + 1
            inter = iw * ih if iw > 0 and ih > 0 else 0.0
            den = ca + (b[4] - b[2] + 1) * (b[5] - b[3] + 1) - inter
            if den != 0 and inter / den < (
                    iou_same if b[0] == cc else iou_diff):
                rest.append(i)
        order = rest
    return kept


def _contained_in(a, b) -> bool:
    """a >= 0.8-contained in b (no +1 convention)."""
    area = (a[4] - a[2]) * (a[5] - a[3])
    if area <= 0:
        return False
    iw = min(a[4], b[4]) - max(a[2], b[2])
    if iw <= 0:
        return False
    ih = min(a[5], b[5]) - max(a[3], b[3])
    if ih <= 0:
        return False
    return (iw * ih) / area >= CONTAINMENT_OVERLAP_RATIO


def apply_merge_modes(rows: list[tuple], merge_modes: dict[int, str],
                      preserve_ids: frozenset[int]) -> list[int]:
    n = len(rows)
    if n == 0:
        return []
    large = {c for c, m in merge_modes.items() if m == "large"}
    small = [c for c, m in merge_modes.items() if m == "small"]
    keep = [True] * n
    large_js = [j for j in range(n) if int(rows[j][0]) in large]
    ratio = CONTAINMENT_OVERLAP_RATIO
    # 'large' pass: drop i if contained in any box whose class is large-mode
    # (containment math inlined — this is the O(n^2) hot loop)
    for i in range(n):
        ri = rows[i]
        if int(ri[0]) in preserve_ids:
            continue
        ax1, ay1, ax2, ay2 = ri[2], ri[3], ri[4], ri[5]
        area = (ax2 - ax1) * (ay2 - ay1)
        if area <= 0:
            continue
        for j in large_js:
            if i == j:
                continue
            rj = rows[j]
            iw = (ax2 if ax2 < rj[4] else rj[4]) - (ax1 if ax1 > rj[2] else rj[2])
            if iw <= 0:
                continue
            ih = (ay2 if ay2 < rj[5] else rj[5]) - (ay1 if ay1 > rj[3] else rj[3])
            if ih <= 0:
                continue
            # same division form as _contained_in / the numpy path: the
            # rearranged iw*ih >= area*ratio differs in the last ulp
            if (iw * ih) / area >= ratio:
                keep[i] = False
                break
    for category in small:
        contained_by_other = [False] * n
        contains_other = [False] * n
        for i in range(n):
            ri = rows[i]
            if int(ri[0]) != category or int(ri[0]) in preserve_ids:
                continue
            for j in range(n):
                if i == j:
                    continue
                if _contained_in(ri, rows[j]):
                    contained_by_other[i] = True
                    contains_other[j] = True
        for i in range(n):
            keep[i] = keep[i] and ((not contains_other[i])
                                   or contained_by_other[i])
    return [i for i in range(n) if keep[i]]


def filter_oversized_images(rows: list[tuple], image_cls_id: int,
                            page_w: float, page_h: float) -> list[int]:
    n = len(rows)
    if n <= 1:
        return list(range(n))
    thr = (OVERSIZE_AREA_THRESHOLD_LANDSCAPE if page_w > page_h
           else OVERSIZE_AREA_THRESHOLD_PORTRAIT)
    limit = thr * page_w * page_h
    out = []
    for i, r in enumerate(rows):
        if int(r[0]) == image_cls_id:
            x1 = r[2] if r[2] > 0 else 0.0
            y1 = r[3] if r[3] > 0 else 0.0
            x2 = r[4] if r[4] < page_w else page_w
            y2 = r[5] if r[5] < page_h else page_h
            if (x2 - x1) * (y2 - y1) <= limit:
                out.append(i)
        else:
            out.append(i)
    return out if out else list(range(n))


def unclip(rows: list[tuple], ratio) -> list[tuple]:
    """ratio: None | (w,h) | {cls_id: (w,h)} — see geometry.unclip."""
    if ratio is None or ratio == (1.0, 1.0):
        return rows
    per_class = isinstance(ratio, dict)
    out = []
    for r in rows:
        if per_class:
            pair = ratio.get(int(r[0]))
            if pair is None:
                out.append(r)
                continue
            rw, rh = pair
        else:
            rw, rh = ratio
        w = r[4] - r[2]
        h = r[5] - r[3]
        cx = r[2] + w / 2
        cy = r[3] + h / 2
        nw = w * rw
        nh = h * rh
        out.append((r[0], r[1], cx - nw / 2, cy - nh / 2,
                    cx + nw / 2, cy + nh / 2, r[6]))
    return out


def clamp_and_validate(rows: list[tuple], page_w: float,
                       page_h: float) -> tuple[list[tuple], list[int]]:
    """Clamp, drop degenerate, truncate to int — returns (surviving rows
    with int coords, their original indices), order preserved."""
    out = []
    kept = []
    for i, r in enumerate(rows):
        x1 = min(max(r[2], 0.0), page_w)
        x2 = min(max(r[4], 0.0), page_w)
        y1 = min(max(r[3], 0.0), page_h)
        y2 = min(max(r[5], 0.0), page_h)
        if x1 >= x2 or y1 >= y2:
            continue
        out.append((r[0], r[1], float(int(x1)), float(int(y1)),
                    float(int(x2)), float(int(y2)), r[6]))
        kept.append(i)
    return out, kept


def survivors_small(rows: list[tuple], spans: list, config,
                    image_cls_id: int, page_w: float, page_h: float,
                    has_order: bool) -> list[tuple]:
    """The whole small-n geometry pipeline (NMS -> oversized filter ->
    merge modes -> reading order -> unclip -> clamp/validate) fused into
    one index-based pass: stage-identical semantics to calling nms /
    filter_oversized_images / apply_merge_modes / sort-or-xy_cut / unclip /
    clamp_and_validate in sequence with list rebuilds between stages
    (equivalence enforced by tests/test_geometry_paths.py::test_fused),
    but with a single survivors materialization at the end.

    Returns [(cls_id:int, score, x1, y1, x2, y2, span), ...] with clamped
    int-truncated float coords, in final reading order.
    """
    n = len(rows)

    # ---- NMS (the working order becomes score-desc, as after
    # _pick(nms(rows))) ----
    if config.nms_enabled:
        iou_same = NMS_IOU_SAME
        iou_diff = NMS_IOU_DIFF
        # score-desc, later index first on ties: stable reverse sort over
        # descending indices == sorted(..., key=lambda i: (-score, -i))
        scores = [r[1] for r in rows]
        order = sorted(range(n - 1, -1, -1), key=scores.__getitem__,
                       reverse=True)
        # candidate-vs-kept formulation of the same greedy dual-threshold
        # NMS: a candidate is dropped iff it trips the threshold against
        # an earlier-KEPT box (boxes dropped earlier never suppress — in
        # the remaining-set formulation they left the pool the moment a
        # kept box removed them, so the pair sets tested are identical);
        # per-box +1 areas hoisted out of the pair loop
        areas = [(r[4] - r[2] + 1) * (r[5] - r[3] + 1) for r in rows]
        idx: list[int] = []
        for c in order:
            b = rows[c]
            bc = b[0]
            bx1 = b[2]
            by1 = b[3]
            bx2 = b[4]
            by2 = b[5]
            ba = areas[c]
            for k in idx:
                a = rows[k]
                ix1 = a[2] if a[2] > bx1 else bx1
                iy1 = a[3] if a[3] > by1 else by1
                ix2 = a[4] if a[4] < bx2 else bx2
                iy2 = a[5] if a[5] < by2 else by2
                iw = ix2 - ix1 + 1
                ih = iy2 - iy1 + 1
                inter = iw * ih if iw > 0 and ih > 0 else 0.0
                den = areas[k] + ba - inter
                if den == 0 or inter / den >= (
                        iou_same if bc == a[0] else iou_diff):
                    break
            else:
                idx.append(c)
    else:
        idx = list(range(n))

    # ---- oversized-image filter (keeps working order; all-oversized
    # degenerate case keeps everything, as in filter_oversized_images) ----
    if len(idx) > 1:
        thr = (OVERSIZE_AREA_THRESHOLD_LANDSCAPE if page_w > page_h
               else OVERSIZE_AREA_THRESHOLD_PORTRAIT)
        limit = thr * page_w * page_h
        out = []
        for i in idx:
            r = rows[i]
            if r[0] == image_cls_id:
                x1 = r[2] if r[2] > 0 else 0.0
                y1 = r[3] if r[3] > 0 else 0.0
                x2 = r[4] if r[4] < page_w else page_w
                y2 = r[5] if r[5] < page_h else page_h
                if (x2 - x1) * (y2 - y1) <= limit:
                    out.append(i)
            else:
                out.append(i)
        if out:
            idx = out

    # ---- containment merge modes (positional keep flags over the current
    # working list, exactly like apply_merge_modes on a materialized list:
    # the small pass pairs over ALL current members, not just large-pass
    # survivors) ----
    m = len(idx)
    if m > 1:  # a single box can neither contain nor be contained
        preserve_ids = config.preserve_ids
        # large/small id sets: precomputed on ExtractConfig; derived here
        # for plain carriers (tests). Membership checks drop the int()
        # casts — float cls ids hash/compare equal to their int values.
        large = getattr(config, "merge_large_ids", None)
        if large is None:
            large = {c for c, md in config.merge_modes.items()
                     if md == "large"}
        small = getattr(config, "merge_small_ids", None)
        if small is None:
            small = [c for c, md in config.merge_modes.items()
                     if md == "small"]
        keep = [True] * m
        large_ps = [p for p in range(m) if rows[idx[p]][0] in large]
        ratio = CONTAINMENT_OVERLAP_RATIO
        for p in range(m):
            ri = rows[idx[p]]
            if ri[0] in preserve_ids:
                continue
            ax1, ay1, ax2, ay2 = ri[2], ri[3], ri[4], ri[5]
            area = (ax2 - ax1) * (ay2 - ay1)
            if area <= 0:
                continue
            for q in large_ps:
                if p == q:
                    continue
                rj = rows[idx[q]]
                iw = ((ax2 if ax2 < rj[4] else rj[4])
                      - (ax1 if ax1 > rj[2] else rj[2]))
                if iw <= 0:
                    continue
                ih = ((ay2 if ay2 < rj[5] else rj[5])
                      - (ay1 if ay1 > rj[3] else rj[3]))
                if ih <= 0:
                    continue
                if (iw * ih) / area >= ratio:
                    keep[p] = False
                    break
        for category in small:
            contained_by_other = [False] * m
            contains_other = [False] * m
            for p in range(m):
                ri = rows[idx[p]]
                if ri[0] != category or ri[0] in preserve_ids:
                    continue
                for q in range(m):
                    if p == q:
                        continue
                    if _contained_in(ri, rows[idx[q]]):
                        contained_by_other[p] = True
                        contains_other[q] = True
            for p in range(m):
                keep[p] = keep[p] and ((not contains_other[p])
                                       or contained_by_other[p])
        idx = [i for p, i in enumerate(idx) if keep[p]]

    if not idx:
        return []

    # ---- reading order (stable by the working/score order on ties) ----
    if has_order:
        ordv = [r[6] for r in rows]
        idx.sort(key=ordv.__getitem__)
    else:
        sub = [rows[i] for i in idx]
        idx = [idx[p] for p in xy_cut_order(sub)]

    # ---- unclip (default no-op) + clamp/validate + survivors ----
    ratio_cfg = config.unclip_ratio
    unclipped = ratio_cfg is not None and ratio_cfg != (1.0, 1.0)
    out_rows: list[tuple] = []
    for i in idx:
        r = rows[i]
        if unclipped:
            r = unclip([r], ratio_cfg)[0]
        v = r[2]
        x1 = 0.0 if v < 0.0 else (page_w if v > page_w else v)
        v = r[4]
        x2 = 0.0 if v < 0.0 else (page_w if v > page_w else v)
        v = r[3]
        y1 = 0.0 if v < 0.0 else (page_h if v > page_h else v)
        v = r[5]
        y2 = 0.0 if v < 0.0 else (page_h if v > page_h else v)
        if x1 >= x2 or y1 >= y2:
            continue
        out_rows.append((int(r[0]), r[1], float(int(x1)), float(int(y1)),
                         float(int(x2)), float(int(y2)), spans[i]))
    return out_rows


def xy_cut_order(rows: list[tuple]) -> list[int]:
    """Same XY-cut spec as geometry.xy_cut_order, tuple-based."""
    n = len(rows)
    if n <= 1:
        return list(range(n))
    xs = [(min(r[2], r[4]), max(r[2], r[4])) for r in rows]
    ys = [(min(r[3], r[5]), max(r[3], r[5])) for r in rows]

    def gaps(sub: list[int], spans) -> list[float]:
        order = sorted(sub, key=lambda k: spans[k][0])
        cuts = []
        cover = spans[order[0]][1]
        for k in order[1:]:
            lo, hi = spans[k]
            if lo > cover:
                cuts.append((cover + lo) / 2.0)
            if hi > cover:
                cover = hi
        return cuts

    def rec(sub: list[int], axis_first: int) -> list[int]:
        if len(sub) <= 1:
            return sub
        for axis in (axis_first, 1 - axis_first):
            spans = ys if axis == 0 else xs
            cuts = gaps(sub, spans)
            if cuts:
                groups = []
                prev = float("-inf")
                for c in cuts + [float("inf")]:
                    grp = [k for k in sub if prev < spans[k][0] <= c]
                    if grp:
                        groups.append(grp)
                    prev = c
                if len(groups) >= 2:
                    out: list[int] = []
                    for g in groups:
                        out.extend(rec(g, 1 - axis))
                    return out
        return sorted(sub, key=lambda k: (ys[k][0], xs[k][0]))

    return rec(list(range(n)), 0)
