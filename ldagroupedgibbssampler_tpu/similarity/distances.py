"""Distance metrics over topic/probability vectors.

TPU-native redesign of the reference's ``cc.mallet.similarity`` package
(similarity/Distance.java:3-5 and the 15 sibling metric files). The Java
interface is ``double calculate(double[] v1, double[] v2)`` — one scalar
pair at a time, called in O(tests × trains) Python-visible loops
(similarity/LDADistancer.java:distance). Here every metric is a batched
JAX function over ``(M, K) × (N, K) -> (M, N)`` so a full test-vs-train
distance matrix is ONE fused XLA program (an MXU matmul for the inner
products, fused elementwise for the rest); the scalar `calculate` parity
API is the (1, K)×(1, K) special case.

Semantics notes (matching the reference, quirks included):
  - `kl` is the *symmetrised* KL of MALLET `Maths.klDivergence` in log base
    2, with zero-coordinate terms dropped (p_i == 0 or q_i == 0 contributes
    nothing) — similarity/KLDistance.java:4-10.
  - `cosine` returns 1 - cos_sim (similarity/CosineDistance.java).
  - `hellinger` is the reference's *squared* Hellinger-style sum without
    the 1/2 factor (similarity/HellingerDistance.java).
  - `bhattacharyya` is the Gaussian-approximation Bhattacharyya distance of
    similarity/BhattacharyyaDistance.java (moments of the coordinates, not
    the BC coefficient).
  - `jaccard` returns 0 when the intersection is empty (reference quirk,
    similarity/JaccardDistance.java:13-17).
  - `statistical` is 1 - Pearson correlation (similarity/StatisticalDistance.java).
  - `ks` is the two-sample Kolmogorov-Smirnov statistic on the coordinate
    *samples* (commons-math semantics), `t` the two-sample t statistic.
  - `uber` averages canberra/chebychev/cosine/euclidean/jaccard/kl/manhattan
    (similarity/UberDistance.java:5-13).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LOG2 = float(np.log(2.0))


def _as2d(v):
    v = jnp.asarray(v, jnp.float32)
    return v[None, :] if v.ndim == 1 else v


# ---------------------------------------------------------------------------
# pairwise metric kernels: X (M, K), Y (N, K) -> (M, N)
# ---------------------------------------------------------------------------

def kl_divergence_pairwise(X, Y):
    """Asymmetric MALLET-style KL (base 2, zero terms dropped): D(X_i || Y_j)."""
    X, Y = _as2d(X), _as2d(Y)
    P = X[:, None, :]                          # (M, 1, K)
    Q = Y[None, :, :]                          # (1, N, K)
    ok = (P > 0) & (Q > 0)
    terms = jnp.where(ok, P * (jnp.log(jnp.where(P > 0, P, 1.0))
                               - jnp.log(jnp.where(Q > 0, Q, 1.0))), 0.0)
    return jnp.sum(terms, -1) / _LOG2


def kl(X, Y):
    """Symmetrised KL: (D(x||y) + D(y||x)) / 2 (KLDistance.java:6-9)."""
    return (kl_divergence_pairwise(X, Y)
            + kl_divergence_pairwise(Y, X).T) / 2.0


def js(X, Y):
    """Jensen-Shannon built from the symmetrised KL, exactly as
    JensenShannonDistance.java:6-13 (note: reference uses symmetrised KL
    against the average, not the textbook one-sided KL)."""
    X, Y = _as2d(X), _as2d(Y)
    M_, N_ = X.shape[0], Y.shape[0]
    avg = (X[:, None, :] + Y[None, :, :]) / 2.0          # (M, N, K)

    def one_pair(p, q, a):
        pa = _sym_kl_vec(p, a)
        qa = _sym_kl_vec(q, a)
        return (pa + qa) / 2.0

    Xb = jnp.broadcast_to(X[:, None, :], avg.shape)
    Yb = jnp.broadcast_to(Y[None, :, :], avg.shape)
    flat = jax.vmap(one_pair)(Xb.reshape(M_ * N_, -1), Yb.reshape(M_ * N_, -1),
                              avg.reshape(M_ * N_, -1))
    return flat.reshape(M_, N_)


def _sym_kl_vec(p, q):
    ok = (p > 0) & (q > 0)
    lp = jnp.log(jnp.where(p > 0, p, 1.0))
    lq = jnp.log(jnp.where(q > 0, q, 1.0))
    d1 = jnp.sum(jnp.where(ok, p * (lp - lq), 0.0)) / _LOG2
    d2 = jnp.sum(jnp.where(ok, q * (lq - lp), 0.0)) / _LOG2
    return (d1 + d2) / 2.0


def hellinger(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    sx, sy = jnp.sqrt(X), jnp.sqrt(Y)
    # sum (sqrt(x)-sqrt(y))^2 = |sx|^2 + |sy|^2 - 2 sx.sy  (MXU matmul)
    return (jnp.sum(X, -1)[:, None] + jnp.sum(Y, -1)[None, :]
            - 2.0 * sx @ sy.T)


def euclidean(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    sq = (jnp.sum(X * X, -1)[:, None] + jnp.sum(Y * Y, -1)[None, :]
          - 2.0 * X @ Y.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def manhattan(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    return jnp.sum(jnp.abs(X[:, None, :] - Y[None, :, :]), -1)


def chebychev(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    return jnp.max(jnp.abs(X[:, None, :] - Y[None, :, :]), -1)


def canberra(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    num = jnp.abs(X[:, None, :] - Y[None, :, :])
    den = jnp.abs(X)[:, None, :] + jnp.abs(Y)[None, :, :]
    return jnp.sum(jnp.where(den == 0.0, 0.0, num / den), -1)


def cosine(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    dot = X @ Y.T
    nx = jnp.sqrt(jnp.sum(X * X, -1))[:, None]
    ny = jnp.sqrt(jnp.sum(Y * Y, -1))[None, :]
    return 1.0 - dot / (nx * ny)


def jaccard(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    inter = jnp.sum(jnp.minimum(X[:, None, :], Y[None, :, :]), -1)
    union = jnp.sum(jnp.maximum(X[:, None, :], Y[None, :, :]), -1)
    return jnp.where(inter > 0.0, 1.0 - inter / union, 0.0)


def bhattacharyya(X, Y):
    X, Y = _as2d(X), _as2d(Y)
    m1, m2 = jnp.mean(X, -1)[:, None], jnp.mean(Y, -1)[None, :]
    v1 = jnp.var(X, -1)[:, None]
    v2 = jnp.var(Y, -1)[None, :]
    # reference formula incl. its var2/var2 == 1 term
    # (BhattacharyyaDistance.java:8-14)
    t1 = jnp.log(0.25 * (v1 / v2 + 1.0 + 2.0))
    t2 = (m1 - m2) ** 2 / (v1 + v2)
    return 0.25 * t1 + 0.25 * t2


def statistical(X, Y):
    """-(corr - 1) = 1 - Pearson correlation (StatisticalDistance.java:5-8)."""
    X, Y = _as2d(X), _as2d(Y)
    Xc = X - jnp.mean(X, -1, keepdims=True)
    Yc = Y - jnp.mean(Y, -1, keepdims=True)
    k = X.shape[-1]
    cov = (Xc @ Yc.T) / k
    sx = jnp.sqrt(jnp.mean(Xc * Xc, -1))[:, None]
    sy = jnp.sqrt(jnp.mean(Yc * Yc, -1))[None, :]
    return 1.0 - cov / (sx * sy)


def ks(X, Y):
    """Two-sample KS statistic treating coordinates as samples
    (KolmogorovSmirnovDistance.java via commons-math)."""
    X, Y = _as2d(X), _as2d(Y)
    k = X.shape[-1]
    Xs = jnp.sort(X, -1)
    Ys = jnp.sort(Y, -1)

    def one_pair(xs, ys):
        grid = jnp.concatenate([xs, ys])
        cdf_x = jnp.searchsorted(xs, grid, side="right") / k
        cdf_y = jnp.searchsorted(ys, grid, side="right") / k
        return jnp.max(jnp.abs(cdf_x - cdf_y))

    return jax.vmap(lambda xs: jax.vmap(lambda ys: one_pair(xs, ys))(Ys))(Xs)


def t_statistic(X, Y):
    """Unpaired two-sample t statistic with unequal variances
    (TDistance.java via commons-math TTest.t)."""
    X, Y = _as2d(X), _as2d(Y)
    k = X.shape[-1]
    m1, m2 = jnp.mean(X, -1)[:, None], jnp.mean(Y, -1)[None, :]
    # commons-math uses the bias-corrected sample variance
    v1 = jnp.var(X, -1, ddof=1)[:, None]
    v2 = jnp.var(Y, -1, ddof=1)[None, :]
    return (m1 - m2) / jnp.sqrt(v1 / k + v2 / k)


def uber(X, Y):
    """Mean of 7 metrics (UberDistance.java:5-19)."""
    parts = [canberra(X, Y), chebychev(X, Y), cosine(X, Y),
             euclidean(X, Y), jaccard(X, Y), kl(X, Y), manhattan(X, Y)]
    return sum(parts) / float(len(parts))


DISTANCES = {
    "kl": kl,
    "js": js,
    "hellinger": hellinger,
    "euclidean": euclidean,
    "manhattan": manhattan,
    "chebychev": chebychev,
    "canberra": canberra,
    "cosine": cosine,
    "jaccard": jaccard,
    "bhattacharyya": bhattacharyya,
    "statistical": statistical,
    "ks": ks,
    "t": t_statistic,
    "uber": uber,
}


class Distance:
    """Parity shim for the Java ``Distance`` interface
    (similarity/Distance.java:3-5): scalar `calculate` plus the batched
    `pairwise` the TPU path actually uses."""

    def __init__(self, name: str):
        if name not in DISTANCES:
            raise ValueError(f"unknown distance {name!r}; "
                             f"known: {sorted(DISTANCES)}")
        self.name = name
        self._fn = DISTANCES[name]
        self._jit = jax.jit(self._fn)

    def calculate(self, v1, v2) -> float:
        return float(self._jit(jnp.asarray(v1)[None, :],
                               jnp.asarray(v2)[None, :])[0, 0])

    def pairwise(self, X, Y) -> np.ndarray:
        return np.asarray(self._jit(X, Y))


@partial(jax.jit, static_argnames=("name",))
def pairwise(name: str, X, Y):
    """jit-compatible functional entry: distances[name] over (M,K)x(N,K)."""
    return DISTANCES[name](X, Y)
