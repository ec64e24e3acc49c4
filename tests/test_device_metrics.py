"""Device generative metrics vs host oracles.

- device pairwise Chamfer == host cKDTree chamfer (f32 tolerance)
- Sinkhorn-EMD vs exact assignment (scipy linear_sum_assignment) on
  small clouds: entropic bias bounded and ranking-preserving
- evaluate_generated_device (chamfer) == evaluation.generative oracle
"""

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.evaluation.generative import (
    evaluate_generated, pairwise_chamfer)
from latent_diffusion_models_for_shape_sdfs_tpu.evaluation.device_metrics import (
    evaluate_generated_device, pairwise_metric)


def _clouds(k, n, seed, spread=1.0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(k):
        c = rng.uniform(-0.5, 0.5, 3) * spread
        out.append((c + 0.2 * rng.normal(size=(n, 3))).astype(np.float32))
    return out


def test_device_pairwise_chamfer_matches_host():
    a = _clouds(5, 128, 0)
    b = _clouds(4, 128, 1)
    host = pairwise_chamfer(a, b)
    dev = pairwise_metric(a, b, "chamfer", chunk=4)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=1e-6)


def test_sinkhorn_emd_close_to_exact_assignment():
    scipy_opt = pytest.importorskip("scipy.optimize")
    a = _clouds(3, 64, 2)
    b = _clouds(3, 64, 3)
    dev = pairwise_metric(a, b, "emd", chunk=2, eps=0.005, iters=500)
    for i in range(3):
        for j in range(3):
            c = np.linalg.norm(a[i][:, None, :] - b[j][None, :, :],
                               axis=-1)
            r, cidx = scipy_opt.linear_sum_assignment(c)
            exact = c[r, cidx].mean()
            # entropic OT cost >= exact; bias small at eps=0.005
            assert dev[i, j] >= exact - 1e-4
            assert dev[i, j] - exact < 0.05 * exact + 0.01, (
                i, j, dev[i, j], exact)


def test_emd_identity_is_small_and_separates():
    a = _clouds(2, 64, 4)
    d = pairwise_metric(a, a, "emd", chunk=2, eps=0.005, iters=500)
    # diagonal (self-EMD) far below cross terms
    assert d[0, 0] < 0.05 and d[1, 1] < 0.05
    assert d[0, 1] > 3 * max(d[0, 0], d[1, 1])


def test_evaluate_generated_device_matches_oracle():
    gen = _clouds(6, 96, 5)
    ref = _clouds(6, 96, 6)
    host = evaluate_generated(gen, ref)
    dev = evaluate_generated_device(gen, ref, metrics=("chamfer",),
                                    chunk=4)
    assert abs(host["mmd_chamfer"] - dev["mmd_chamfer"]) < 2e-4
    assert host["coverage"] == dev["coverage"]
    assert host["one_nna"] == dev["one_nna"]


def test_evaluate_generated_device_emd_keys():
    gen = _clouds(3, 64, 7)
    ref = _clouds(3, 64, 8)
    out = evaluate_generated_device(gen, ref, metrics=("chamfer", "emd"),
                                    chunk=2)
    for k in ("mmd_chamfer", "coverage", "one_nna", "mmd_emd",
              "coverage_emd", "one_nna_emd"):
        assert k in out, k
    assert 0.0 <= out["coverage_emd"] <= 1.0
