"""FALKON — Nystrom kernel ridge regression via preconditioned CG, on TPU.

TPU-native replacement for the FalkonML/falkon CUDA/C++ solver that the
reference drives through ``FALKONWrapper_with_centers_selection.py`` (SURVEY.md
§2.3 — the "core of the rebuild"). The algorithm (Rudi, Carratino, Rosasco,
"FALKON: An Optimal Large Scale Kernel Method", NeurIPS 2017):

Solve  ``(K_NM^T W K_NM + lam * n * K_MM) alpha = K_NM^T W y``
with the Cholesky preconditioner

    ``T = chol(K_MM)``        (upper, T^T T = K_MM)
    ``A = chol(T T^T / M + lam I)``  (upper)
    ``B = T^{-1} A^{-1} / sqrt(n)``

and a DIRECT dense solve of ``(B^T H B) beta = B^T b`` — the exact fixpoint
of the reference's 20-iteration CG (``OnlineRegionClassifier_incore.py:41``),
which is stable in f32 precisely because the preconditioner makes
``cond(B^T H B)`` O(1); see the note inside :func:`falkon_fit` for why the
direct form is the TPU-native choice (one MXU Gram pass instead of 2*maxiter
latency-bound tall matvecs). ``W`` is a 0/1 diagonal validity mask — this framework represents the
reference's dynamically-sized minibootstrap caches as fixed-capacity buffers
with masks, and masked rows drop out of the normal equations exactly.

Everything is a pure jittable function; ``vmap`` over a leading class axis
trains all per-class/per-anchor classifiers concurrently — the TPU-native
equivalent of the reference's sequential class loop
(``OnlineRegionClassifier.py:100``) and of its fused ``kernel.mmv`` inference
(``rpn.py:201-227``).

Predictions use the same Gaussian-mmv primitive as training
(:mod:`online_detection_tpu.ops.gaussian_mmv`).

Nystrom center selection mirrors ``compute_indices_selection``
(``FALKONWrapper_with_centers_selection.py:83-95``): at most M/2 centers
sampled (with replacement) from the positives, the remainder filled from the
negatives; when a pool is smaller than its quota the whole pool is taken.
Unused slots are padded by repeating the first selected center — duplicated
centers span the same Nystrom subspace and the jittered Cholesky keeps the
preconditioner well-posed, so this changes nothing but padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from online_detection_tpu.ops.gaussian_mmv import gaussian_kernel, mmv

EPS_JITTER = 1e-6  # scaled by M on the K_MM diagonal, like falkon's pc_epsilon


@jax.tree_util.register_pytree_node_class
class FalkonModel:
    """A fitted (batch of) FALKON classifier(s) — a pytree.

    centers: [..., M, d] Nystrom points; alpha: [..., M] coefficients;
    exists: [...] bool — False where a class had no data (the reference keeps
    ``None`` models and scores them -2; see ``rpn.py:192-194``).

    ``sigma`` is pytree *aux data* (static under jit) so the Gaussian-kernel
    Pallas dispatch keeps it a compile-time constant.
    """

    __slots__ = ("centers", "alpha", "exists", "sigma")

    def __init__(self, centers, alpha, exists, sigma: float):
        self.centers = centers
        self.alpha = alpha
        self.exists = exists
        self.sigma = sigma

    def tree_flatten(self):
        return (self.centers, self.alpha, self.exists), self.sigma

    @classmethod
    def tree_unflatten(cls, sigma, children):
        return cls(*children, sigma)

    def __repr__(self):
        return (
            f"FalkonModel(centers={getattr(self.centers, 'shape', self.centers)}, "
            f"alpha={getattr(self.alpha, 'shape', self.alpha)}, sigma={self.sigma})"
        )


def select_nystrom_centers(
    key: jax.Array,
    is_pos: jax.Array,  # [N] bool — candidate rows that are positives
    valid: jax.Array,  # [N] bool
    m: int,
) -> jax.Array:
    """Return [m] int32 row indices into the candidate buffer.

    <= m//2 positives (all of them if fewer, else sampled with replacement),
    remainder filled with negatives likewise; leftover slots repeat the first
    chosen index.
    """
    n = is_pos.shape[0]
    pos_valid = is_pos & valid
    neg_valid = (~is_pos) & valid
    n_pos = jnp.sum(pos_valid)
    n_neg = jnp.sum(neg_valid)

    # stable partition: indices of valid positives first (order preserved)
    order_pos = jnp.argsort(~pos_valid, stable=True)  # valid-pos rows first
    order_neg = jnp.argsort(~neg_valid, stable=True)

    half = m // 2
    n_pos_sel = jnp.minimum(n_pos, half)
    n_neg_sel = jnp.minimum(n_neg, m - n_pos_sel)

    kp, kn = jax.random.split(key)
    rand_pos = jax.random.randint(kp, (m,), 0, jnp.maximum(n_pos, 1))
    rand_neg = jax.random.randint(kn, (m,), 0, jnp.maximum(n_neg, 1))

    slot = jnp.arange(m)
    # positive slots: [0, n_pos_sel)
    pos_take = jnp.where(n_pos > half, rand_pos, jnp.minimum(slot, jnp.maximum(n_pos - 1, 0)))
    pos_rows = order_pos[jnp.clip(pos_take, 0, n - 1)]
    # negative slots: [n_pos_sel, n_pos_sel + n_neg_sel)
    t = slot - n_pos_sel
    neg_take = jnp.where(
        n_neg > (m - n_pos_sel), rand_neg, jnp.minimum(t, jnp.maximum(n_neg - 1, 0))
    )
    neg_rows = order_neg[jnp.clip(neg_take, 0, n - 1)]

    idx = jnp.where(slot < n_pos_sel, pos_rows, neg_rows)
    total = n_pos_sel + n_neg_sel
    # padding: repeat the first selected index
    idx = jnp.where(slot < jnp.maximum(total, 1), idx, idx[0])
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("sigma", "maxiter"))
def falkon_fit(
    x: jax.Array,  # [N, d] (already normalized)
    y: jax.Array,  # [N] targets (+-1 labels)
    w: jax.Array,  # [N] 0/1 validity weights
    centers: jax.Array,  # [M, d]
    sigma: float,
    lam: float,
    maxiter: int = 20,
) -> jax.Array:
    """Fit and return alpha [M]. Pure function of its inputs."""
    m = centers.shape[0]
    wf = w.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(wf), 1.0)
    lam = jnp.asarray(lam, jnp.float32)

    # K_MM at TRUE f32 matmul precision: the TPU default (single bf16 pass)
    # leaves ~1e-3 entry errors that can push K_MM + jitter indefinite and
    # NaN the whole preconditioner (see gaussian_kernel docstring). This is
    # the cheap [M, M] kernel — the N-scale K_NM below keeps the fast path.
    from online_detection_tpu.ops.gaussian_mmv import kernel_precision

    # the fit's K_NM/Z/Gram chain is SOLVER-role math (training-side bulk
    # FLOPs; round-5 fix — it previously resolved the apply role, so
    # ODTPU_SOLVER_PRECISION never reached the fit's dominant matmuls and
    # the precision probe understated the solver-role cost)
    hp = kernel_precision("solver")  # HIGH default (bf16x3)
    k_mm = gaussian_kernel(
        centers, centers, sigma, precision=jax.lax.Precision.HIGHEST
    )  # [M, M] — PSD-critical, pinned HIGHEST regardless of role
    t_low = jnp.linalg.cholesky(k_mm + EPS_JITTER * m * jnp.eye(m, dtype=k_mm.dtype))
    # T upper with T^T T = K_MM  ->  T = t_low^T
    tt_t = jnp.matmul(t_low.T, t_low, precision=hp)  # = T T^T
    a_low = jnp.linalg.cholesky(tt_t / m + lam * jnp.eye(m, dtype=k_mm.dtype))

    def apply_b(v):  # B v = T^{-1} A^{-1} v  (T, A upper => solve with .T)
        u = jax.scipy.linalg.solve_triangular(a_low, v, lower=True, trans="T")
        return jax.scipy.linalg.solve_triangular(t_low, u, lower=True, trans="T")

    def apply_bt(v):  # B^T v = A^{-T} T^{-T} v
        u = jax.scipy.linalg.solve_triangular(t_low, v, lower=True, trans="N")
        return jax.scipy.linalg.solve_triangular(a_low, u, lower=True, trans="N")

    # K_NM is materialized ONCE per fit (N <= ~22k, M <= 1000 here — the
    # falkon library streams it because its N is unbounded). The classic
    # FALKON iteration then runs CG with two tall [N,M] matvecs per step:
    # 2*maxiter sequential HBM passes over K_NM, each latency-bound on TPU.
    # Materializing the Gram matrix G = K_NM^T W K_NM instead costs ONE
    # large MXU matmul (more FLOPs than all CG matvecs combined, but one
    # pass and systolic-array-shaped), after which the fully preconditioned
    # operator P = B^T (G/n + lam*K_MM) B is a dense [M,M] matrix that the
    # preconditioner makes well-conditioned BY CONSTRUCTION (that is its
    # purpose — FALKON's CG converges in ~20 steps only because cond(P) is
    # O(1)). A direct f32 Cholesky solve of P is therefore stable, and is
    # the exact limit the reference's 20-iteration CG approximates.
    k_nm = gaussian_kernel(x, centers, sigma, precision=hp)  # [N, M]
    del maxiter, apply_bt  # the direct solve IS the CG fixpoint
    # With-replacement center sampling duplicates rows, so K_MM has an EXACT
    # null space that B = T^{-1} A^{-1} amplifies ~1/sqrt(jitter*lam); naive
    # P = B^T H B then contains rounding-scale indefinite junk and Cholesky
    # NaNs. Both addends are therefore built as Grams, PSD by construction:
    #   P  = Z^T W Z / n + lam * S^T S,  Z = K_NM B,  S = A^{-1}
    # using B^T K_MM_jittered B = A^{-T} A^{-1} (exact — no cancellation;
    # the jittered K_MM is also what the falkon library's preconditioner
    # factors). Null directions get eigenvalue lam/(jitter/M + lam) = O(1),
    # data directions are O(1) by FALKON's preconditioner design, so the f32
    # Cholesky of P is safe.
    eye = jnp.eye(m, dtype=k_mm.dtype)
    s_mat = jax.scipy.linalg.solve_triangular(a_low, eye, lower=True, trans="T")
    b_mat = jax.scipy.linalg.solve_triangular(t_low, s_mat, lower=True, trans="T")
    z = jnp.matmul(k_nm, b_mat, precision=hp)  # [N, M]
    zw = z * wf[:, None]
    p_mat = (
        jnp.matmul(zw.T, z, precision=hp) / n
        + lam * jnp.matmul(s_mat.T, s_mat, precision=hp)
    )
    # zw and z round independently under reduced-precision matmul passes, so
    # the data term is only PSD up to rounding asymmetry — symmetrize (the
    # [M, M] add is free next to the Gram itself)
    p_mat = 0.5 * (p_mat + p_mat.T)
    b_rhs = jnp.matmul(
        y.astype(jnp.float32) * wf, z, precision=hp
    ) / n  # = B^T K_MN W y / n
    p_low = jnp.linalg.cholesky(p_mat)
    beta = jax.scipy.linalg.cho_solve((p_low, True), b_rhs)
    return apply_b(beta)


def falkon_predict(
    model: FalkonModel, x: jax.Array, missing_score: float = -2.0
) -> jax.Array:
    """Score features with a fitted model: K(x, centers) @ alpha.

    Missing models (exists=False) score ``missing_score`` (-2 everywhere in
    the reference, e.g. ``rpn.py:192-194``).
    """
    scores = mmv(x, model.centers, model.alpha, model.sigma)
    return jnp.where(model.exists, scores, missing_score)


# class-batched variants: vmap over a leading class axis ------------------

falkon_fit_classes = jax.vmap(falkon_fit, in_axes=(0, 0, 0, 0, None, None, None))


def falkon_predict_classes(
    models: FalkonModel, x: jax.Array, missing_score: float = -2.0
) -> jax.Array:
    """Score one feature batch against C classifiers -> [N, C].

    The TPU-native fused multi-class inference: one batched mmv replaces the
    reference's packed-alpha ``kernel.mmv`` trick (``rpn.py:201-227``,
    ``roi_box_predictors.py:140-160``).
    """
    scores = jax.vmap(lambda c, a, s: mmv(x, c, a, s), in_axes=(0, 0, None))(
        models.centers, models.alpha, models.sigma
    )  # [C, N]
    scores = jnp.where(models.exists[:, None], scores, missing_score)
    return scores.T


def direct_nystrom_solve(
    x: jax.Array, y: jax.Array, w: jax.Array, centers: jax.Array, sigma: float, lam: float
) -> jax.Array:
    """Small-problem reference solution of the same normal equations (dense,
    no CG) — for tests and debugging only."""
    k_nm = gaussian_kernel(x, centers, sigma) * w[:, None]
    k_mm = gaussian_kernel(centers, centers, sigma)
    n = jnp.maximum(jnp.sum(w), 1.0)
    m = centers.shape[0]
    del m
    h = k_nm.T @ k_nm / n + lam * k_mm
    b = k_nm.T @ (y * w) / n
    return jnp.linalg.solve(h, b)
