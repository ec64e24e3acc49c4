"""TPU-resident set-to-set metrics: pairwise Chamfer and Sinkhorn-EMD.

The host path (evaluation.generative) computes the G x R Chamfer matrix
with per-pair KD-trees — fine for a handful of shapes, quadratic pain at
evaluation scale (a 128-cloud 1-NNA needs 16k pairs). On TPU the whole
thing is three matmuls per pair batch: |a|^2 + |b|^2 - 2 a.b^T on the
MXU, row/col minima on the VPU, all pairs vmapped and streamed through
`lax.map` chunks so the [chunk, n, m] cost tensor stays HBM-bounded.

EMD uses entropically-regularized optimal transport (Sinkhorn) on the
UNSQUARED L2 cost — the convention of the point-cloud generative-metric
literature (Achlioptas et al. 2018), where EMD(A,B) is the mean matched
distance under an optimal 1-1 assignment. With eps ~ 0.002 * cost scale
and a few hundred iterations the entropic bias is well below the metric
differences that matter for MMD/COV ranking; the exact-assignment
oracle test (scipy linear_sum_assignment) pins the error envelope.

All functions take float32 [S, n, 3] stacked clouds (equal sizes — the
samplers already produce fixed-size clouds) and return host floats /
NumPy arrays. Everything jits once per (shape, chunk) signature.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _dist2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean [n, m] between two [_, 3] clouds (MXU path)."""
    # f32 accumulation: |a-b|^2 via the expanded form is fine at cloud
    # scale (coords in [-1,1], so cancellation is bounded); clamp tiny
    # negatives from rounding before the sqrt in EMD.
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    # HIGHEST: TPU's default bf16 matmul passes cost ~1% relative error
    # on the distance matrix — visible against the f64 host oracle and
    # material for MMD ranking; full-f32 passes keep it < 1e-6.
    ab = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa[:, None] + bb[None, :] - 2.0 * ab, 0.0)


def _chamfer_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d2 = _dist2(a, b)
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


def _sinkhorn_pair(a: jnp.ndarray, b: jnp.ndarray, eps: float,
                   iters: int) -> jnp.ndarray:
    """Entropic-OT mean matched L2 distance between equal-size clouds."""
    n = a.shape[0]
    c = jnp.sqrt(_dist2(a, b))                      # unsquared L2 cost
    # log-domain Sinkhorn, uniform marginals 1/n
    f = jnp.zeros((n,), jnp.float32)
    g = jnp.zeros((n,), jnp.float32)
    loga = -math.log(n)

    def body(_, fg):
        f, g = fg
        # row constraint sum_j P_ij = 1/n with P = a b exp((f+g-c)/eps)
        # => f_i = -eps * (logsumexp_j((g_j - c_ij)/eps) + log(1/n))
        f = -eps * (jax.nn.logsumexp((g[None, :] - c) / eps, axis=1)
                    + loga)
        g = -eps * (jax.nn.logsumexp((f[:, None] - c) / eps, axis=0)
                    + loga)
        return f, g

    f, g = jax.lax.fori_loop(0, iters, body, (f, g))
    # transport plan in log space; <P, C> = mean matched distance * 1
    logp = (f[:, None] + g[None, :] - c) / eps + 2 * loga
    return jnp.sum(jnp.exp(logp) * c)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _pair_block_impl(xa: jnp.ndarray, xb: jnp.ndarray, pairs: jnp.ndarray,
                     metric: str, chunk: int, eps: float,
                     iters: int) -> jnp.ndarray:
    """Metric over an explicit [B, 2] pair-index block -> [B].

    The pair list is an ARGUMENT (fixed shape, dynamic content): the
    host slices the full S_a x S_b pair set into bounded blocks and
    re-invokes one compiled program per block. Round 2 ran the whole
    4096-pair matrix inside a single lax.map program; at ~0.5 s/pair
    (Sinkhorn, n=2048) that is a >30-minute device program, and the
    relay/worker watchdog killed it ("TPU worker crashed", the NaN-EMD
    incident). Every individual configuration passes when the program
    is seconds long — so keep programs short and loop on the host.
    """
    if metric == "chamfer":
        one = lambda i, j: _chamfer_pair(xa[i], xb[j])
    else:
        one = lambda i, j: _sinkhorn_pair(xa[i], xb[j], eps, iters)

    def do_chunk(p):
        return jax.vmap(lambda ij: one(ij[0], ij[1]))(p)

    out = jax.lax.map(do_chunk, pairs.reshape(-1, chunk, 2))
    return out.reshape(-1)


def pairwise_metric(set_a, set_b, metric: str = "chamfer",
                    chunk: int = 4, eps: float = 0.01,
                    iters: int = 200,
                    max_pairs_per_call: int = 64) -> np.ndarray:
    """Device [len(a), len(b)] matrix of chamfer-L2 or sinkhorn-EMD.

    set_a/set_b: lists (or [S, n, 3] arrays) of equal-size clouds.
    chunk: pairs per lax.map step — peak HBM ~ chunk * n * m * 4 bytes
    (a few of them live across logsumexp temporaries).
    max_pairs_per_call: pairs per compiled program invocation — bounds
    single-program runtime to seconds (see _pair_block_impl); one
    compile serves every block (fixed shapes).
    """
    xa = jnp.asarray(np.stack(set_a), jnp.float32)
    xb = jnp.asarray(np.stack(set_b), jnp.float32)
    assert metric in ("chamfer", "emd"), metric
    n, m = xa.shape[1], xb.shape[1]
    if metric == "emd":
        assert n == m, "EMD needs equal-size clouds (1-1 matching)"
    S_a, S_b = int(xa.shape[0]), int(xb.shape[0])
    pair = np.stack(np.meshgrid(np.arange(S_a), np.arange(S_b),
                                indexing="ij"), -1).reshape(-1, 2)
    total = pair.shape[0]
    block = max(chunk, (max_pairs_per_call // chunk) * chunk)
    nblocks = math.ceil(total / block)
    pad = nblocks * block - total
    pair = np.pad(pair, ((0, pad), (0, 0)), mode="edge").astype(np.int32)
    outs = [_pair_block_impl(xa, xb, jnp.asarray(pair[s:s + block]),
                             metric, chunk, eps, iters)
            for s in range(0, nblocks * block, block)]  # async dispatch
    flat = np.concatenate([np.asarray(o) for o in outs])
    return flat[:total].reshape(S_a, S_b)


def pairwise_metric_self(set_x, metric: str = "chamfer", chunk: int = 4,
                         eps: float = 0.01, iters: int = 200,
                         max_pairs_per_call: int = 64) -> np.ndarray:
    """Symmetric within-set matrix: evaluates only the i<j triangle
    (both metrics are symmetric in their arguments) and mirrors — half
    the device work of the 1-NNA's two within-set matrices."""
    xx = jnp.asarray(np.stack(set_x), jnp.float32)
    S = int(xx.shape[0])
    iu, ju = np.triu_indices(S, k=1)
    pair = np.stack([iu, ju], -1).astype(np.int32)
    total = pair.shape[0]
    block = max(chunk, (max_pairs_per_call // chunk) * chunk)
    nblocks = math.ceil(total / block)
    pad = nblocks * block - total
    pair = np.pad(pair, ((0, pad), (0, 0)), mode="edge")
    outs = [_pair_block_impl(xx, xx, jnp.asarray(pair[s:s + block]),
                             metric, chunk, eps, iters)
            for s in range(0, nblocks * block, block)]
    flat = np.concatenate([np.asarray(o) for o in outs])[:total]
    out = np.zeros((S, S), np.float64)
    out[iu, ju] = flat
    out[ju, iu] = flat
    return out


def evaluate_generated_device(gen_points, ref_points,
                              metrics=("chamfer",), chunk: int = 4,
                              eps: float = 0.01, iters: int = 200) -> dict:
    """MMD / COV / 1-NNA over device-computed distance matrices.

    Same definitions as evaluation.generative.evaluate_generated (which
    remains the host oracle); `metrics` may include "emd" for the
    MMD-EMD / COV-EMD variants of the standard benchmark table.
    """
    out = {}
    for metric in metrics:
        d_gr = pairwise_metric(gen_points, ref_points, metric, chunk,
                               eps, iters)                     # [G, R]
        suffix = "chamfer" if metric == "chamfer" else "emd"
        out[f"mmd_{suffix}"] = float(d_gr.min(axis=0).mean())
        out[f"coverage_{suffix}" if metric != "chamfer" else "coverage"] \
            = float(len(np.unique(d_gr.argmin(axis=1))) / d_gr.shape[1])
        # 1-NNA needs within-set distances too (triangle-only, mirrored)
        d_gg = pairwise_metric_self(gen_points, metric, chunk, eps, iters)
        d_rr = pairwise_metric_self(ref_points, metric, chunk, eps, iters)
        G, R = d_gr.shape
        d = np.block([[d_gg, d_gr], [d_gr.T, d_rr]])
        np.fill_diagonal(d, np.inf)
        labels = np.array([0] * G + [1] * R)
        nn = d.argmin(axis=1)
        out[f"one_nna_{suffix}" if metric != "chamfer" else "one_nna"] \
            = float((labels[nn] == labels).mean())
    return out
