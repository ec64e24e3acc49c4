"""Generative-set evaluation: MMD / Coverage / 1-NNA over Chamfer-L2.

The standard point-cloud generative metrics (Achlioptas et al. 2018;
used by the latent-shape-diffusion literature the reference sits in):

  - MMD (minimum matching distance): for each reference shape, the
    Chamfer distance to its nearest generated shape — fidelity.
  - COV (coverage): fraction of reference shapes that are the nearest
    neighbour of at least one generated shape — mode coverage.
  - 1-NNA (1-nearest-neighbour accuracy): leave-one-out classification
    accuracy of a 1-NN classifier separating generated from reference
    sets; 50% = indistinguishable (ideal), 100% = trivially separable.

All host-side NumPy/scipy over surface point clouds (sampled with
evaluation.mesh_sample / data.analytic.sample_surface).
"""

from __future__ import annotations

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.evaluation.chamfer import (
    chamfer_l2)


def pairwise_chamfer(set_a: list, set_b: list) -> np.ndarray:
    """Chamfer-L2 matrix [len(a), len(b)] between point-cloud lists."""
    out = np.empty((len(set_a), len(set_b)), np.float64)
    for i, a in enumerate(set_a):
        for j, b in enumerate(set_b):
            out[i, j] = chamfer_l2(a, b)
    return out


def mmd_coverage(gen_points: list, ref_points: list) -> dict:
    """MMD + COV of a generated set against a reference set."""
    d = pairwise_chamfer(gen_points, ref_points)  # [G, R]
    mmd = float(d.min(axis=0).mean())             # per-ref nearest gen
    cov = float(len(np.unique(d.argmin(axis=1))) / d.shape[1])
    return {"mmd_chamfer": mmd, "coverage": cov}


def one_nna(gen_points: list, ref_points: list) -> float:
    """1-NN accuracy between the two sets (0.5 is ideal)."""
    pts = list(gen_points) + list(ref_points)
    labels = np.array([0] * len(gen_points) + [1] * len(ref_points))
    n = len(pts)
    d = np.zeros((n, n), np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            d[i, j] = d[j, i] = chamfer_l2(pts[i], pts[j])
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    return float((labels[nn] == labels).mean())


def evaluate_generated(gen_points: list, ref_points: list) -> dict:
    out = mmd_coverage(gen_points, ref_points)
    out["one_nna"] = one_nna(gen_points, ref_points)
    return out
