"""Equivalence of the two geometry paths: pure-Python small-n fast path vs
vectorized numpy path, on randomized box sets (including degenerate,
inverted, overlapping, out-of-page geometry)."""

import random

import numpy as np
import pytest

from glm_ocr_spark.config import (
    LABEL2ID,
    LAYOUT_MERGE_BBOXES_MODE,
    PRESERVE_CLASS_IDS,
)
from glm_ocr_spark.kernel import geometry as geo
from glm_ocr_spark.kernel import geometry_py as gpy

IMG = LABEL2ID["image"]


def random_rows(rng, n):
    rows = []
    for _ in range(n):
        cls = rng.choice([0, 5, 11, 14, 18, 20, 21, 22])
        score = rng.choice([0.31, 0.5, 0.55, 0.7, 0.7, 0.9, 0.95, 1.0])
        x1 = rng.uniform(-50, 1050)
        y1 = rng.uniform(-50, 1050)
        # mix of normal, degenerate, inverted boxes
        kind = rng.random()
        if kind < 0.8:
            x2, y2 = x1 + rng.uniform(0, 900), y1 + rng.uniform(0, 400)
        elif kind < 0.9:
            x2, y2 = x1, y1  # degenerate
        else:
            x2, y2 = x1 - rng.uniform(1, 200), y1 - rng.uniform(1, 100)
        order = float(rng.randint(1, n + 3))
        rows.append((float(cls), score, x1, y1, x2, y2, order))
    return rows


def run_python(rows, page_w=1000.0, page_h=1000.0, use_order=True):
    idx = list(range(len(rows)))

    def pick(sel):
        nonlocal rows, idx
        rows = [rows[i] for i in sel]
        idx = [idx[i] for i in sel]

    pick(gpy.nms(rows))
    pick(gpy.filter_oversized_images(rows, IMG, page_w, page_h))
    pick(gpy.apply_merge_modes(rows, LAYOUT_MERGE_BBOXES_MODE,
                               PRESERVE_CLASS_IDS))
    if rows:
        if use_order:
            pick(sorted(range(len(rows)), key=lambda i: rows[i][6]))
        else:
            pick(gpy.xy_cut_order(rows))
        rows2, kept = gpy.clamp_and_validate(rows, page_w, page_h)
        idx = [idx[i] for i in kept]
        rows = rows2
    return idx, [(r[2], r[3], r[4], r[5]) for r in rows]


def run_numpy(rows, page_w=1000.0, page_h=1000.0, use_order=True):
    arr = np.array(rows, dtype=np.float64)
    idx = np.arange(len(rows))

    def take(sel):
        nonlocal arr, idx
        arr = arr[sel]
        idx = idx[sel]

    take(geo.nms(arr))
    take(geo.filter_oversized_images(arr, IMG, page_w, page_h))
    take(geo.apply_merge_modes(arr, LAYOUT_MERGE_BBOXES_MODE,
                               PRESERVE_CLASS_IDS))
    if len(arr):
        if use_order:
            take(np.argsort(arr[:, geo.ORDER], kind="stable"))
        else:
            take(geo.xy_cut_order(arr[:, geo.X1:geo.Y2 + 1]))
        arr, keep = geo.clamp_and_validate(arr, page_w, page_h)
        take(keep)
    return list(idx), [tuple(arr[i, geo.X1:geo.Y2 + 1]) for i in range(len(arr))]


@pytest.mark.parametrize("seed", range(40))
@pytest.mark.parametrize("use_order", [True, False])
def test_paths_equivalent(seed, use_order):
    rng = random.Random(seed)
    n = rng.randint(1, 30)
    rows = random_rows(rng, n)
    pi, pb = run_python(list(rows), use_order=use_order)
    ni, nb = run_numpy(list(rows), use_order=use_order)
    assert pi == ni, (seed, use_order)
    assert pb == nb, (seed, use_order)


def test_large_n_equivalent():
    rng = random.Random(123)
    rows = random_rows(rng, 120)  # above SMALL_N: both paths must still agree
    pi, pb = run_python(list(rows))
    ni, nb = run_numpy(list(rows))
    assert pi == ni
    assert pb == nb


def test_infinite_coords_agree():
    rows = [
        (22.0, 0.9, 0.0, 0.0, float("inf"), 100.0, 1.0),
        (22.0, 0.8, 10.0, 10.0, 500.0, 90.0, 2.0),
    ]
    pi, _ = run_python(list(rows))
    ni, _ = run_numpy(list(rows))
    assert pi == ni


class _FusedCfg:
    """Minimal config carrier for survivors_small."""
    nms_enabled = True
    merge_modes = LAYOUT_MERGE_BBOXES_MODE
    preserve_ids = PRESERVE_CLASS_IDS
    unclip_ratio = (1.0, 1.0)


@pytest.mark.parametrize("seed", range(40))
@pytest.mark.parametrize("use_order", [True, False])
def test_fused(seed, use_order):
    """survivors_small (the fused index-based pipeline) must match the
    staged nms -> filters -> order -> clamp chain exactly, spans included."""
    rng = random.Random(seed + 7000)
    n = rng.randint(1, 30)
    rows = random_rows(rng, n)
    spans = [(i * 10, i * 10 + 5) for i in range(n)]
    pi, pb = run_python(list(rows), use_order=use_order)
    staged = [
        (int(rows_i[0]), float(rows_i[1]), b[0], b[1], b[2], b[3], spans[i])
        for i, rows_i, b in ((i, rows[i], pb[k]) for k, i in enumerate(pi))
    ]
    fused = gpy.survivors_small(list(rows), list(spans), _FusedCfg, IMG,
                                1000.0, 1000.0, use_order)
    assert fused == staged, (seed, use_order)
