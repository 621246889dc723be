"""TRAINED text detection (D1 closure — VERDICT r02 item 7, detect half).

The reference's EAST detector is a CNN whose score branch ends in a conv +
sigmoid head trained with pixel-wise cross-entropy against text-region
masks (reference: architectures/east_arch.py:95-175, models/detection/
east.py:64-95 — behavior studied, no code taken).  Round 2 decoded
score/geo maps from fixtures; this module TRAINS the score head on the
corpus and runs the full EAST decode chain (threshold -> y-sort ->
restore_polys -> filter) on the trained maps:

- model: ONE 3x5 conv + bias + sigmoid over the binarized page — exactly
  the form of a conv score head, small enough that its normal equations
  are bounded (16 weights).  The receptive field is matched to the font
  metrics: horizontal radius 2 merges every intra-word ink gap (max 3
  columns, narrow-glyph '11') and separates every inter-word gap (min 7
  columns = blank space cell + letter gaps); vertical radius 1 keeps the
  3-row line gap separating;
- labels: the text-region mask = ink dilated by the same 3x5 window (the
  shrunk-quad-style region supervision EAST uses, radius matched to the
  conv's receptive field so the task is realizable);
- training: full-batch Newton / IRLS on the logistic loss, each iteration
  ONE distributed pass that emits per-batch int64 partial sums of the
  gradient (16) and Hessian (256) quantized to nano-units — integer sums
  are associative, so the fitted weights are BIT-IDENTICAL under any
  partitioning (the determinism contract every trained operator here
  holds).  The pass also counts training errors; training stops at the
  first pass that classifies every pixel of every page correctly, which
  logistic regression reaches because the label rule ("any ink within the
  window") is linearly separable in the patch features.  Driver-side
  state: a 16-float weight vector — never data;
- inference: trained score map -> threshold 0.5 -> per-component geometry
  maps (distances to the component bbox, theta = 0, the axis-aligned
  case) -> kernels.east_decode.restore_polys_from_map (the D2 decode,
  unchanged) -> distinct polys -> reading order -> recognize each box
  with the template bank (kernels.pixel_ocr.recognize_word).

Because training provably reaches zero errors, the detected boxes are the
exact dilated-ink components and every derived quantity (decoded text,
box count, summed tight widths/heights) is arithmetic over the sanitized
source text — a HARD DuckDB oracle (contract `east_trained`).

Scale shape: training is k passes x (render + conv + bounded int sums);
at 100 TB each pass is a map-side partial agg of 273 longs per batch —
the classic distributed-Newton shape (gradient/Hessian fan-in), no
corpus-sized state anywhere.  Inference is one mapInPandas stage, maps
never leave the Arrow batch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..plans.session import widen

_Q = 10**9          # nano quantization for order-free int64 grad/hess sums
_RY, _RX = 1, 2     # conv receptive-field radii (3 rows x 5 cols)
_N_FEAT = (2 * _RY + 1) * (2 * _RX + 1) + 1  # patch + bias = 16
_RIDGE = 1e-3       # Newton step regularizer (separable data -> |w| grows)
_MAX_ITERS = 16


def _page_arrays(name, key):
    """Corpus page for part row: line 1 = sanitized name, line 2 = the
    part key (digit coverage), scale 1 so the 3x5 receptive field matches
    the font metrics.  The rendered page is padded by one blank pixel on
    every side so a dilated box at the 2-column margin never touches the
    image border (east_decode.filter_polys drops polys with 2+ corners at
    or beyond the edge)."""
    from ..kernels import pixel_ocr as px

    text = px.sanitize_for_font(str(name))
    img = np.pad(
        px.render_text_image([text, str(int(key))], scale=1),
        1,
        constant_values=255,
    )
    return img, img < 128


def _patch_features(ink: np.ndarray) -> np.ndarray:
    """(H, W) bool -> (H*W, 16) float64: 3x5 neighborhood + bias, zero
    (paper) padded at page edges."""
    h, w = ink.shape
    p = np.pad(ink, ((_RY, _RY), (_RX, _RX)))
    feats = np.stack(
        [
            p[dy : dy + h, dx : dx + w]
            for dy in range(2 * _RY + 1)
            for dx in range(2 * _RX + 1)
        ],
        axis=-1,
    ).reshape(-1, _N_FEAT - 1)
    return np.concatenate(
        [feats, np.ones((feats.shape[0], 1), dtype=bool)], axis=1
    ).astype(np.float64)


def _dilate(ink: np.ndarray) -> np.ndarray:
    """3x5 binary dilation — the text-region label mask."""
    h, w = ink.shape
    p = np.pad(ink, ((_RY, _RY), (_RX, _RX)))
    out = np.zeros_like(ink)
    for dy in range(2 * _RY + 1):
        for dx in range(2 * _RX + 1):
            out |= p[dy : dy + h, dx : dx + w]
    return out


def _newton_pass(parts: DataFrame, w: np.ndarray):
    """ONE distributed logistic-Newton pass at weights ``w``: returns
    (train_errors, gradient, hessian).  Per-example contributions are
    rounded to int64 nano-units BEFORE summation, so the totals — and
    therefore the whole training trajectory — are partitioning-invariant."""
    w_list = [float(x) for x in w]

    def gen(batches):
        import pandas as pd

        wv = np.asarray(w_list)
        for pdf in batches:
            g = np.zeros(_N_FEAT, dtype=np.int64)
            hs = np.zeros((_N_FEAT, _N_FEAT), dtype=np.int64)
            errs = 0
            for key, name in zip(pdf["p_partkey"], pdf["p_name"]):
                _, ink = _page_arrays(name, key)
                x = _patch_features(ink)
                y = _dilate(ink).reshape(-1).astype(np.float64)
                z = x @ wv
                p = 1.0 / (1.0 + np.exp(-z))
                errs += int(((z > 0) != (y > 0.5)).sum())
                g += np.rint((x * (y - p)[:, None]) * _Q).astype(np.int64).sum(axis=0)
                r = (p * (1.0 - p))[:, None, None]
                hs += (
                    np.rint(x[:, :, None] * x[:, None, :] * r * _Q)
                    .astype(np.int64)
                    .sum(axis=0)
                )
            rows = [(-1, errs)]
            rows += [(i, int(g[i])) for i in range(_N_FEAT)]
            rows += [
                (_N_FEAT + i * _N_FEAT + j, int(hs[i, j]))
                for i in range(_N_FEAT)
                for j in range(_N_FEAT)
            ]
            yield pd.DataFrame(rows, columns=["idx", "v"])

    sums = {
        int(r["idx"]): int(r["v"])
        for r in (
            widen(parts.select("p_partkey", "p_name"))
            .mapInPandas(gen, schema="idx int, v long")
            .groupBy("idx")
            .agg(F.sum("v").alias("v"))
            .collect()
        )
    }
    errs = sums.get(-1, 0)
    grad = np.array([sums.get(i, 0) for i in range(_N_FEAT)], dtype=np.float64) / _Q
    hess = (
        np.array(
            [
                [sums.get(_N_FEAT + i * _N_FEAT + j, 0) for j in range(_N_FEAT)]
                for i in range(_N_FEAT)
            ],
            dtype=np.float64,
        )
        / _Q
    )
    return errs, grad, hess


def east_train_scorer(parts: DataFrame, *, max_iters: int = _MAX_ITERS):
    """Fit the score-head conv by distributed Newton logistic regression.

    Returns (weights (16,), n_passes, train_errors).  Stops at the first
    pass whose CURRENT weights classify every training pixel correctly
    (train_errors == 0); the returned weights are the ones that pass
    verified, so detection with them reproduces the label mask exactly."""
    w = np.zeros(_N_FEAT, dtype=np.float64)
    for it in range(max_iters):
        errs, grad, hess = _newton_pass(parts, w)
        if errs == 0 and it > 0:
            return w, it, 0
        step = np.linalg.solve(hess + _RIDGE * np.eye(_N_FEAT), grad)
        w = w + step
    errs, _, _ = _newton_pass(parts, w)
    return w, max_iters, errs


EAST_TRAINED_SCHEMA = (
    "p_partkey long, decoded string, n_boxes int, sum_w long, sum_h long"
)


def east_trained_detect(parts: DataFrame, w: np.ndarray) -> DataFrame:
    """Detect with the TRAINED score head, decode through the reference
    EAST chain, recognize each surviving box.

    Per page: conv + sigmoid -> score map; per positive component the
    geometry map carries (d_top, d_bottom, d_left, d_right) to the
    component bbox with theta = 0 (EAST's axis-aligned case); the D2
    kernel restore_polys_from_map does threshold -> y-sort -> restore ->
    corner filter; distinct polys in reading order are the word boxes.
    Boxes are the ink bbox dilated by the window radius (1 px) — shrunk
    back, each crop recognizes via the template bank.  Output columns are
    pure arithmetic over the sanitized text (hard oracle): decoded =
    'sanitize(name) key', n_boxes = word count, sum_w = sum of tight ink
    widths (6*len - 1 minus narrow-glyph 'i'/'1' edge columns), sum_h =
    7 * n_boxes."""
    w_list = [float(x) for x in w]

    def gen(batches):
        import pandas as pd

        from ..kernels import pixel_ocr as px
        from ..kernels.east_decode import restore_polys_from_map

        wv = np.asarray(w_list)
        for pdf in batches:
            rows = []
            for key, name in zip(pdf["p_partkey"], pdf["p_name"]):
                img, ink = _page_arrays(name, key)
                h, wd = ink.shape
                z = (_patch_features(ink) @ wv).reshape(h, wd)
                score = 1.0 / (1.0 + np.exp(-z))
                mask = score > 0.5
                geo = np.zeros((h, wd, 4), dtype=np.float64)
                for y0, y1 in px._runs(mask.any(axis=1)):
                    band = mask[y0:y1]
                    for x0, x1 in px._runs(band.any(axis=0)):
                        ys, xs = np.nonzero(band[:, x0:x1])
                        yy, xx = ys + y0, xs + x0
                        geo[yy, xx, 0] = yy - y0
                        geo[yy, xx, 1] = y1 - yy
                        geo[yy, xx, 2] = xx - x0
                        geo[yy, xx, 3] = x1 - xx
                shape = np.array([h, wd])
                out = restore_polys_from_map(
                    score,
                    geo,
                    np.zeros((h, wd), dtype=np.float64),
                    shape,
                    shape,
                    normalize=False,
                    threshold=0.5,
                )
                polys = out["boxes"]
                boxes = []
                if len(polys):
                    corners = np.rint(
                        np.stack(
                            [polys[:, 0, 0], polys[:, 0, 1], polys[:, 2, 0], polys[:, 2, 1]],
                            axis=1,
                        )
                    ).astype(np.int64)
                    boxes = sorted(
                        set(map(tuple, corners.tolist())),
                        key=lambda t: (t[1], t[0]),
                    )
                words, sw, sh = [], 0, 0
                for bx0, by0, bx1, by1 in boxes:
                    tight = (int(bx0) + _RX, int(by0) + _RY, int(bx1) - _RX, int(by1) - _RY)
                    words.append(px.recognize_word(img, tight))
                    sw += tight[2] - tight[0]
                    sh += tight[3] - tight[1]
                rows.append(
                    {
                        "p_partkey": int(key),
                        "decoded": " ".join(words),
                        "n_boxes": len(boxes),
                        "sum_w": sw,
                        "sum_h": sh,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["p_partkey", "decoded", "n_boxes", "sum_w", "sum_h"]
            )

    return widen(parts.select("p_partkey", "p_name")).mapInPandas(
        gen, schema=EAST_TRAINED_SCHEMA
    )


def east_trained_roundtrip(parts: DataFrame) -> DataFrame:
    """Train the score head on the corpus, then detect + recognize the
    same corpus with it — the `east_trained` contract query."""
    w, _, errs = east_train_scorer(parts)
    if errs:  # pragma: no cover — separable by construction
        raise RuntimeError(f"east scorer failed to separate: {errs} errors")
    return east_trained_detect(parts, w)
