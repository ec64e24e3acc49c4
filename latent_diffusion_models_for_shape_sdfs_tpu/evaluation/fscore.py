"""F-score@tau and normal consistency (beyond-spec eval metrics).

The lineage's contract metric is Chamfer-L2 (BASELINE.json:5;
evaluation/chamfer.py). The shape-reconstruction literature that grew
around it standardized two complements, which we add for completeness:

- **F-score@tau** (precision/recall of surface points at distance
  threshold tau): unlike Chamfer it is bounded [0,1], robust to
  outlier points, and separates "extra geometry" (low precision) from
  "missing geometry" (low recall) — the same diagnostic split as
  `chamfer_l2_directed`, but threshold-based.
- **Normal consistency**: mean |cos| between each point's normal and
  its nearest neighbour's normal on the other surface; catches surfaces
  that sit at the right place with the wrong local orientation
  (e.g. thin double-walled shells), which point-distance metrics miss.

Both are host NumPy/cKDTree like chamfer.py — evaluation runs on
sampled meshes, not on the device hot path.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def fscore(pred_pts: np.ndarray, gt_pts: np.ndarray,
           tau: float = 0.01) -> dict:
    """F-score at distance threshold `tau` (absolute units; shapes here
    live in the unit sphere, so 0.01 = 0.5% of the [-1,1] box side).

    Returns {"fscore", "precision", "recall"}; all in [0,1], higher is
    better. precision = fraction of predicted points within tau of the
    GT surface; recall = fraction of GT points within tau of the
    prediction; fscore = harmonic mean (0 when both are 0).
    """
    pred = np.asarray(pred_pts, np.float64)
    gt = np.asarray(gt_pts, np.float64)
    d_pg, _ = cKDTree(gt).query(pred, k=1)
    d_gp, _ = cKDTree(pred).query(gt, k=1)
    precision = float(np.mean(d_pg <= tau))
    recall = float(np.mean(d_gp <= tau))
    f = (2 * precision * recall / (precision + recall)
         if precision + recall > 0 else 0.0)
    return {"fscore": f, "precision": precision, "recall": recall}


def normal_consistency(pred_pts: np.ndarray, pred_normals: np.ndarray,
                       gt_pts: np.ndarray,
                       gt_normals: np.ndarray) -> float:
    """Symmetric mean |cos(angle)| between NN normals, in [0,1].

    |cos| (not signed cos) so consistent-but-flipped orientation
    conventions between the two meshes do not read as error; what it
    measures is local surface *direction* agreement.
    """
    pred = np.asarray(pred_pts, np.float64)
    gt = np.asarray(gt_pts, np.float64)

    def _unit(v):
        v = np.asarray(v, np.float64)
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n, 1e-12)

    pn = _unit(pred_normals)
    gn = _unit(gt_normals)
    _, i_pg = cKDTree(gt).query(pred, k=1)
    _, i_gp = cKDTree(pred).query(gt, k=1)
    c_pg = np.abs(np.sum(pn * gn[i_pg], axis=-1)).mean()
    c_gp = np.abs(np.sum(gn * pn[i_gp], axis=-1)).mean()
    return float(0.5 * (c_pg + c_gp))


def sdf_normals(sdf_fn, pts: np.ndarray, h: float = 1e-4) -> np.ndarray:
    """Outward normals of an SDF's zero set at `pts` by central
    differences — the GT-normal source for analytic shapes (their SDFs
    are exact, so the gradient is the true surface normal field).

    data/analytic.py sdf_grad is the same 7-line stencil specialized to
    its shape dicts; kept separate deliberately — evaluation takes any
    `sdf_fn` and the data layer must not depend on evaluation."""
    pts = np.asarray(pts, np.float64)
    g = np.empty_like(pts)
    for ax in range(3):
        e = np.zeros(3)
        e[ax] = h
        g[:, ax] = (np.asarray(sdf_fn(pts + e), np.float64)
                    - np.asarray(sdf_fn(pts - e), np.float64)) / (2 * h)
    n = np.linalg.norm(g, axis=-1, keepdims=True)
    return (g / np.maximum(n, 1e-12)).astype(np.float32)
