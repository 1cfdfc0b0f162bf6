"""RLS bounding-box refiners: ridge regression with target whitening.

TPU-native equivalent of the reference's ``RegionRefinerTrainer``
(``region-refiner/region_refiner_trainer/train_region_refiner.py:25-119``),
which per class:

1. appends a bias column to the features,
2. centers the 4-d regression targets (mu) and decorrelates them with the
   inverse-sqrt of their covariance (eig-based whitening, ``T``/``T_inv``
   with the +0.001 eigenvalue floor),
3. solves 4 independent ridge problems ``(X^T X + lam I) w = X^T y`` via
   Cholesky + two triangular solves, in float64.

TPU design: the only O(N) work — the Gram matrix ``G = X^T X`` and moment
vectors — runs on-device as f32 MXU matmuls over the *fixed-capacity masked*
COXY buffers (zero-padded rows contribute exactly zero, so masking is free),
batched over all classes at once. The tiny [d+1, d+1] solve + 4x4 eig run in
float64 NumPy on host (f64 on TPU is emulated and this is microseconds of
LAPACK); this preserves the reference's f64 numerics where they matter
without dragging f64 through the hot path.

Prediction applies ``Y = [X, 1] @ Beta @ T_inv + mu`` (``rpn.py:137-187``,
``predict_regions.py:16-80``) — here a single batched einsum over classes
replaces the reference's block-diagonal packing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RLSModel(NamedTuple):
    """Batch of per-class refiners (a pytree).

    beta: [C, d+1, 4]; t_inv: [C, 4, 4]; mu: [C, 4]; exists: [C] bool;
    mean_losses: [C, 4] (the reference stores per-sample losses and prints
    their mean, ``train_region_refiner.py:80-84``).
    """

    beta: jax.Array
    t_inv: jax.Array
    t: jax.Array
    mu: jax.Array
    exists: jax.Array
    mean_losses: jax.Array


@functools.partial(jax.jit, static_argnames=())
def _gram_stats(x: jax.Array, y: jax.Array, w: jax.Array):
    """Per-class device pass: masked Gram/moment statistics.

    x: [C, N, d]; y: [C, N, 4]; w: [C, N] 0/1.
    Returns G=[C,d+1,d+1] (bias included), B=X1^T y [C,d+1,4],
    sum_y [C,4], yty [C,4,4], n [C].
    """
    wf = w.astype(jnp.float32)
    xm = x * wf[..., None]
    ym = y * wf[..., None]
    n = jnp.sum(wf, axis=1)  # [C]

    # HIGHEST precision: TPU's default f32 matmul truncates to bf16 passes;
    # Gram error ~1e-3*||G|| then rivals small ridge lambdas (the flagship RPN
    # refiner uses lam=0.01) and can push G + lam I indefinite -> NaN Cholesky
    # downstream. These Grams are negligible FLOPs next to the CNN.
    hp = jax.lax.Precision.HIGHEST
    g_xx = jnp.einsum("cnd,cne->cde", xm, x,
                      preferred_element_type=jnp.float32, precision=hp)
    sum_x = jnp.sum(xm, axis=1)  # [C, d]
    # assemble [d+1, d+1] with bias row/col
    c, d = x.shape[0], x.shape[2]
    g = jnp.zeros((c, d + 1, d + 1), jnp.float32)
    g = g.at[:, :d, :d].set(g_xx)
    g = g.at[:, :d, d].set(sum_x)
    g = g.at[:, d, :d].set(sum_x)
    g = g.at[:, d, d].set(n)

    b_xy = jnp.einsum("cnd,cnk->cdk", xm, y,
                      preferred_element_type=jnp.float32, precision=hp)
    sum_y = jnp.sum(ym, axis=1)  # [C, 4]
    b = jnp.concatenate([b_xy, sum_y[:, None, :]], axis=1)  # [C, d+1, 4]
    yty = jnp.einsum("cnk,cnl->ckl", ym, y,
                     preferred_element_type=jnp.float32, precision=hp)
    return g, b, sum_y, yty, n


def rls_fit(
    x: jax.Array,  # [C, N, d] normalized features (masked buffers)
    y: jax.Array,  # [C, N, 4] regression targets
    w: jax.Array,  # [C, N] validity
    lam: float,
) -> RLSModel:
    """Fit all C per-class refiners. Device Gram pass + host f64 solves."""
    stats = jax.device_get(_gram_stats(x, y, w))
    return _solve_from_stats(*stats, lam)


def _solve_from_stats(g, b, sum_y, yty, n, lam) -> RLSModel:
    """Host f64 whitening + ridge solves from the per-class Gram stats."""
    g = g.astype(np.float64)
    b = b.astype(np.float64)
    c, dp1 = g.shape[0], g.shape[1]

    beta = np.zeros((c, dp1, 4))
    t_all = np.zeros((c, 4, 4))
    t_inv_all = np.zeros((c, 4, 4))
    mu_all = np.zeros((c, 4))
    exists = np.zeros((c,), bool)
    mean_losses = np.zeros((c, 4))

    for i in range(c):
        ni = float(n[i])
        if ni < 1:
            continue
        exists[i] = True
        mu = sum_y[i].astype(np.float64) / ni
        # covariance of centered targets: (Y^T Y - n mu mu^T) / n
        s = (yty[i].astype(np.float64) - ni * np.outer(mu, mu)) / ni
        dvals, wvecs = np.linalg.eig(s)
        # f32-derived Gram noise can leave tiny NEGATIVE eigenvalues on a
        # PSD covariance -> NaN through sqrt; clip before the +0.001 floor
        dvals = np.maximum(dvals.real, 0.0)
        wvecs = wvecs.real
        t = wvecs @ np.diag(1.0 / np.sqrt(dvals + 0.001)) @ wvecs.T
        t_inv = wvecs @ np.diag(np.sqrt(dvals + 0.001)) @ wvecs.T
        # whitened targets: Yw = (Y - mu) T; rhs = X1^T Yw = (B - sum_x1 mu^T) T
        sum_x1 = g[i][:, -1]  # X1^T 1 (last Gram column = column sums incl. n)
        bw = (b[i] - np.outer(sum_x1, mu)) @ t
        a = g[i] + lam * np.eye(dp1)
        # The device Gram is f32; rounding can push a near-rank-deficient
        # G + lam*I indefinite, so solve by LU instead of the reference's
        # Cholesky (same ridge solution, no PD requirement).
        beta[i] = np.linalg.solve(a, bw)
        # mean loss per target col: 0.5/n * (w^T G w - 2 w^T rhs + yw^T yw)
        ywty = t.T @ (yty[i] - ni * np.outer(mu, mu)) @ t
        for k in range(4):
            wk = beta[i][:, k]
            sq = wk @ g[i] @ wk - 2.0 * wk @ bw[:, k] + ywty[k, k]
            mean_losses[i, k] = 0.5 * sq / ni
        t_all[i] = t
        t_inv_all[i] = t_inv
        mu_all[i] = mu

    return RLSModel(
        beta=jnp.asarray(beta, jnp.float32),
        t_inv=jnp.asarray(t_inv_all, jnp.float32),
        t=jnp.asarray(t_all, jnp.float32),
        mu=jnp.asarray(mu_all, jnp.float32),
        exists=jnp.asarray(exists),
        mean_losses=jnp.asarray(mean_losses, jnp.float32),
    )


def _masked_class_moments(w_c, x, y):
    """One class's ridge moments from the shared buffer: w_c [N] (onehot
    validity weights), x [N, d], y [N, 4] -> (G [d+1,d+1], b [d+1,4], sum_y,
    yty, n). Shared by the lax.map single-device pass and the class-sharded
    vmap program."""
    d = x.shape[1]
    hp = jax.lax.Precision.HIGHEST  # see _gram_stats: bf16-pass Gram noise
    xm = x * w_c[:, None]
    ym = y * w_c[:, None]
    g_xx = jnp.matmul(xm.T, x, preferred_element_type=jnp.float32,
                      precision=hp)
    sum_x = jnp.sum(xm, axis=0)
    b_xy = jnp.matmul(xm.T, y, preferred_element_type=jnp.float32,
                      precision=hp)
    sum_y = jnp.sum(ym, axis=0)
    yty = jnp.matmul(ym.T, y, preferred_element_type=jnp.float32,
                     precision=hp)
    n = jnp.sum(w_c)
    g = jnp.zeros((d + 1, d + 1), jnp.float32)
    g = g.at[:d, :d].set(g_xx)
    g = g.at[:d, d].set(sum_x)
    g = g.at[d, :d].set(sum_x)
    g = g.at[d, d].set(n)
    b = jnp.concatenate([b_xy, sum_y[None, :]], axis=0)  # [d+1, 4]
    return g, b, sum_y, yty, n


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _gram_stats_grouped(x: jax.Array, y: jax.Array, cls1: jax.Array, w: jax.Array,
                        num_classes: int):
    """Per-class Gram stats from a SHARED row buffer: x [N, d], y [N, 4],
    cls1 [N] 1-based labels, w [N] validity.

    Computed as a ``lax.map`` over classes of plain 2-operand masked matmuls.
    The obvious one-shot formulation — a 3-operand einsum
    ``einsum('nc,nd,ne->cde', onehot, x, x)`` — sends the TPU compiler into a
    pathological pass: 289 s to compile even at [N=400, d=32, C=3] (measured
    on v5e; the round-1 bench's 143 s ``rls_fit_rpn`` setup was this). The
    scan body compiles ONCE regardless of C, runs the same FLOPs, and the
    per-class [N, d] masked copy stays a transient instead of a [C, N, d]
    blow-up."""
    onehot = jax.nn.one_hot(cls1.astype(jnp.int32) - 1, num_classes, dtype=jnp.float32)
    wc = onehot * w[:, None]  # [N, C]
    return jax.lax.map(lambda w_c: _masked_class_moments(w_c, x, y), wc.T)


@functools.lru_cache(maxsize=None)
def _make_grouped_device_program_sharded(mesh, axis_name: str):
    """Class-sharded grouped RLS: the per-class Gram moments AND the
    whitening/Cholesky solve run with the class axis sharded over a 1-D
    mesh — the same class-axis model parallelism as the sharded
    minibootstrap (SURVEY.md §2.2), with zero collectives until the final
    replicating gather of the KB-scale model. Replicated execution (the
    pre-round-5 behavior when a mesh was live) made every device redo all C
    classes' ``C*N*d^2`` Gram FLOPs; sharding makes multi-chip RLS C/n_dev
    work per device instead of C-fold redundancy. The row buffer is
    replicated (it is read by every class's mask)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cls_s = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def fn(wcT, x, y, lam):
        # wcT: [Cp, N] class-sharded onehot*validity weights; vmap (NOT
        # lax.map: a scan serializes and cannot shard its iteration axis)
        stats = jax.vmap(lambda w_c: _masked_class_moments(w_c, x, y))(wcT)
        return _device_solve_from_stats(*stats, lam)

    return jax.jit(
        fn,
        in_shardings=(cls_s, repl, repl, repl),
        out_shardings=repl,
    )


@functools.lru_cache(maxsize=None)
def _make_grouped_blocks_program_sharded(mesh, axis_name: str):
    """Class-sharded Gram+solve over COMPACTED per-class blocks
    [Cp, cap, ...]: per-device work is (Cp/n_dev)*cap row-Grams — the
    compaction win of the unsharded device path (each row multiplies into
    exactly one class's Gram) combined with the mesh split. Without this,
    the sharded masked pass costs (Cp/n_dev)*N per device, which at
    flagship scale (N >> cap) is MORE per-chip Gram work than the old
    replicated-blocks execution (round-5 review finding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cls_s = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def fn(xb, yb, vb, lam):
        return _device_solve_from_stats(*_gram_stats(xb, yb, vb), lam)

    return jax.jit(
        fn,
        in_shardings=(cls_s, cls_s, cls_s, repl),
        out_shardings=repl,
    )


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _class_counts(cls1: jax.Array, w: jax.Array, num_classes: int):
    return (
        jnp.zeros((num_classes,), jnp.int32)
        .at[cls1.astype(jnp.int32) - 1]
        .add((w > 0).astype(jnp.int32), mode="drop")
    )


@functools.partial(jax.jit, static_argnames=("num_classes", "cap"))
def _compact_class_blocks(x, y, cls1, w, num_classes: int, cap: int):
    """Gather each class's valid rows into fixed [C, cap, ...] blocks.

    One [C*cap, d] gather of data movement buys the block-batched Gram pass
    (:func:`_gram_stats`) whose FLOPs are ``C * cap * d^2`` instead of the
    masked shared-buffer pass's ``C * N * d^2`` — each row multiplies into
    exactly one class's Gram instead of being zero-masked into all C.
    """
    cls_i = cls1.astype(jnp.int32)
    n = x.shape[0]
    wb = w > 0

    def per_class(c):
        m = wb & (cls_i == c + 1)
        order = jnp.argsort(~m, stable=True)
        idx = order[jnp.minimum(jnp.arange(cap), n - 1)]
        valid = jnp.arange(cap) < jnp.minimum(jnp.sum(m), cap)
        return x[idx], y[idx], valid

    return jax.vmap(per_class)(jnp.arange(num_classes))


_BLOCK_BYTES_LIMIT = 2 * 1024**3  # skip compaction when blocks would not pay


def rls_fit_grouped(
    x: jax.Array,  # [N, d] shared rows
    y: jax.Array,  # [N, 4]
    cls1: jax.Array,  # [N] 1-based class labels (or anchor index + 1)
    w: jax.Array,  # [N] validity
    num_classes: int,
    lam: float,
    device_solve: bool = False,
    mesh=None,
    axis_name: str = "mb",
) -> RLSModel:
    """Fit all refiners from a shared COXY buffer (device grouping).

    ``device_solve=False`` (default): pull the [C, d+1, d+1] Gram matrices
    and solve in host float64 (the reference's numerics). ``device_solve=
    True``: solve on device in f32 — trades the reference's f64 for zero
    Gram transfer, which wins on thin host<->device links; the 4x4 whitening
    still runs in host f64 from KB-scale moments. The device path first
    compacts rows into per-class blocks (each row belongs to exactly one
    class, so masking the WHOLE buffer per class does C-fold redundant Gram
    FLOPs); when one class hogs the buffer the blocks stop paying and it
    falls back to the masked pass. The per-class moments are identical
    either way (row permutation only).

    ``mesh`` (device_solve only): 1-D mesh — Grams + solves run CLASS-
    SHARDED (each device its slice, model replicated at the end), like the
    sharded minibootstrap. Identical moments to the unsharded masked pass.
    """
    if mesh is not None and device_solve:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        cp = -(-num_classes // n_dev) * n_dev
        cls_s = NamedSharding(mesh, P(axis_name))
        repl = NamedSharding(mesh, P())
        lam_dev = jax.device_put(jnp.asarray(lam, jnp.float32), repl)
        # block compaction first (same moments, row permutation only): each
        # row Grams into exactly ONE class's block, so per-device work is
        # (Cp/n_dev)*cap instead of the masked pass's (Cp/n_dev)*N
        counts = jax.device_get(_class_counts(cls1, w, num_classes))
        cap = int(counts.max()) if counts.size else 0
        out = None
        if cap > 0:
            capb = min(x.shape[0], max(256, 1 << (cap - 1).bit_length()))
            blk_bytes = cp * capb * (x.shape[1] + 4) * 4
            if blk_bytes <= _BLOCK_BYTES_LIMIT and capb < x.shape[0]:
                xb, yb, vb = _compact_class_blocks(x, y, cls1, w, cp, capb)
                program = _make_grouped_blocks_program_sharded(mesh, axis_name)
                out = program(
                    jax.device_put(xb, cls_s), jax.device_put(yb, cls_s),
                    jax.device_put(vb, cls_s), lam_dev,
                )
        if out is None:  # blocks don't pay (or nothing valid): masked pass
            onehot = jax.nn.one_hot(
                cls1.astype(jnp.int32) - 1, cp, dtype=jnp.float32
            )
            wc_t = (onehot * w[:, None]).T  # [Cp, N]; padded classes zero
            program = _make_grouped_device_program_sharded(mesh, axis_name)
            out = program(
                jax.device_put(wc_t, cls_s),
                jax.device_put(x, repl),
                jax.device_put(y, repl),
                lam_dev,
            )
        beta, t_dev, t_inv_dev, mu_dev, exists, mean_losses = out
        return RLSModel(
            beta=beta[:num_classes],
            t_inv=t_inv_dev[:num_classes],
            t=t_dev[:num_classes],
            mu=mu_dev[:num_classes],
            exists=exists[:num_classes],
            mean_losses=mean_losses[:num_classes],
        )

    if not device_solve:
        stats = jax.device_get(
            _gram_stats_grouped(x, y, cls1, w, num_classes)
        )
        return _solve_from_stats(*stats, lam)

    stats = None
    counts = jax.device_get(_class_counts(cls1, w, num_classes))
    cap = int(counts.max()) if counts.size else 0
    if cap > 0:
        # pow2 cap bucket: bounds recompiles across runs with varying counts
        capb = min(x.shape[0], max(256, 1 << (cap - 1).bit_length()))
        blk_bytes = num_classes * capb * (x.shape[1] + 4) * 4
        if blk_bytes <= _BLOCK_BYTES_LIMIT and num_classes * capb < 4 * x.shape[0]:
            xb, yb, vb = _compact_class_blocks(x, y, cls1, w, num_classes, capb)
            stats = _gram_stats(xb, yb, vb)
    if stats is None:
        stats = _gram_stats_grouped(x, y, cls1, w, num_classes)
    beta, t_dev, t_inv_dev, mu_dev, exists, mean_losses = _device_solve_from_stats(
        *stats, jnp.asarray(lam, jnp.float32)
    )
    return RLSModel(
        beta=beta,
        t_inv=t_inv_dev,
        t=t_dev,
        mu=mu_dev,
        exists=exists,
        mean_losses=mean_losses,
    )


@jax.jit
def _device_solve_from_stats(g, b, sum_y, yty, n, lam):
    """Whitening + ridge solve entirely on device, ONE jitted program.

    The earlier formulation pulled the 4x4 moments to host, ran the
    whitening eig in NumPy, re-uploaded T/mu, and drove the remaining ops
    eagerly — on the remote-tunnel platform every one of those syncs is a
    round trip that costs more than the math. Batched f32 ``eigh`` on the
    symmetric 4x4 covariances replaces the host ``eig`` (same T up to
    eigenvector sign, which T = W D W^T cancels).
    """
    exists = n >= 1.0
    safe_n = jnp.maximum(n, 1.0)
    mu = jnp.where(exists[:, None], sum_y / safe_n[:, None], 0.0)
    s = (yty - n[:, None, None] * (mu[:, :, None] * mu[:, None, :]))
    s = s / safe_n[:, None, None]
    s = 0.5 * (s + s.transpose(0, 2, 1))
    dvals, wvecs = jnp.linalg.eigh(s)
    # f32-derived Gram noise can leave tiny NEGATIVE eigenvalues on a PSD
    # covariance -> NaN through sqrt; clip before the +0.001 floor
    dvals = jnp.maximum(dvals, 0.0)
    t_dev = (wvecs * (1.0 / jnp.sqrt(dvals + 0.001))[:, None, :]) @ wvecs.transpose(0, 2, 1)
    t_inv_dev = (wvecs * jnp.sqrt(dvals + 0.001)[:, None, :]) @ wvecs.transpose(0, 2, 1)
    eye4 = jnp.eye(4, dtype=g.dtype)
    t_dev = jnp.where(exists[:, None, None], t_dev, eye4)
    t_inv_dev = jnp.where(exists[:, None, None], t_inv_dev, eye4)

    dp1 = g.shape[1]
    sum_x1 = g[:, :, -1]  # [C, d+1]
    bw = jnp.einsum(
        "cdk,ckl->cdl", b - sum_x1[:, :, None] * mu[:, None, :], t_dev
    )
    # Batched Cholesky + two triangular solves. (A batched f32 LU via
    # jnp.linalg.solve compiles ~25x slower on TPU — 193 s vs 7.6 s at
    # [21, 2049, 2049] — for identical warm-run time.) G + lam*I is PD only
    # up to f32 Gram rounding, so the factorization is made robust two ways:
    # (a) Jacobi equilibration — factor D^-1/2 (G+lam I) D^-1/2, which has
    # unit diagonal, so absolute jitters are well-scaled regardless of the
    # feature magnitudes/sample counts; (b) escalating jitter — try
    # {0, 3e-5, 3e-3} on the equilibrated matrix and keep the smallest whose
    # Cholesky comes back finite per class (batched, so 3 tries cost 3
    # factorizations of a [C, d+1, d+1] — microseconds next to the Grams).
    # Observed failure this guards against: the flagship smoke config's RPN
    # refiner (lam=0.01, ~5 samples at d=1025) NaN'd the plain Cholesky on
    # TPU, which silently zeroed every proposal at inference.
    a = g + lam * jnp.eye(dp1, dtype=g.dtype)[None]
    dvec = jnp.sqrt(jnp.maximum(jnp.diagonal(a, axis1=1, axis2=2), 1e-30))
    a_eq = a / (dvec[:, :, None] * dvec[:, None, :])
    rhs = bw / dvec[:, :, None]
    eye = jnp.eye(dp1, dtype=g.dtype)[None]

    def solve_at(eps):
        am = a_eq + eps[:, None, None] * eye
        l_chol = jnp.linalg.cholesky(am)

        def tri(r_):
            u = jax.scipy.linalg.solve_triangular(l_chol, r_, lower=True)
            return jax.scipy.linalg.solve_triangular(
                l_chol, u, lower=True, trans="T"
            )

        z0 = tri(rhs)
        # one iterative-refinement step against the factored matrix: recovers
        # most of the f32 factorization error on ill-conditioned (small-lam,
        # underdetermined) classes for two extra triangular solves.
        r = rhs - jnp.einsum(
            "cde,cek->cdk", am, z0,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return z0 + tri(r)

    def pick(za, zb):
        ok = jnp.all(jnp.isfinite(za), axis=(1, 2))
        return jnp.where(ok[:, None, None], za, zb)

    # final level: Gershgorin lower bound on the equilibrated eigenvalues
    # (unit diagonal minus off-diagonal row sums) — guaranteed PD, however
    # far past PSD the noise pushed the Gram. Pessimistic, but it is the
    # last resort after 0 / 3e-5 / 3e-3 all NaN'd.
    zeros = jnp.zeros((g.shape[0],), g.dtype)
    row_abs = jnp.sum(jnp.abs(a_eq), axis=2) - 1.0  # off-diag |row| sums
    eps_pd = jnp.maximum(0.0, jnp.max(row_abs, axis=1) - 1.0) + 1e-3
    z = pick(
        solve_at(zeros),
        pick(solve_at(zeros + 3e-5),
             pick(solve_at(zeros + 3e-3), solve_at(eps_pd))),
    )
    beta = z / dvec[:, :, None]
    # per-class mean losses from the same moments (the reference prints these,
    # ``train_region_refiner.py:80-84``): for whitened targets Yw,
    # mean 0.5(Xw - yw)^2 = 0.5/n (b^T G b - 2 b^T bw + diag(T^T S T))
    q1 = jnp.einsum("cdk,cde,cek->ck", beta, g, beta)
    q2 = jnp.einsum("cdk,cdk->ck", beta, bw)
    s_c = yty - n[:, None, None] * (mu[:, :, None] * mu[:, None, :])
    st = jnp.einsum("ckl,clm->ckm", s_c, t_dev)
    ywty_diag = jnp.einsum("ckm,ckm->cm", t_dev, st)
    mean_losses = 0.5 * (q1 - 2.0 * q2 + ywty_diag) / safe_n[:, None]
    mean_losses = jnp.where(exists[:, None], mean_losses, 0.0)
    return beta, t_dev, t_inv_dev, mu, exists, mean_losses


def rls_predict(model: RLSModel, x: jax.Array) -> jax.Array:
    """Apply all class refiners to one feature batch: [N, d] -> [N, C, 4].

    ``Y = ([X,1] @ Beta) @ T_inv + mu`` per class; classes without a model
    predict zero deltas (the reference skips refinement there,
    ``rpn.py:151-153``). One einsum replaces the reference's block-diagonal
    packed matmul (``rpn.py:158-187``, ``roi_box_predictors.py:97-124``).
    """
    # kernel_precision (HIGHEST by default): box deltas are O(0.1) while
    # |x|*|beta| is O(10^2) — a single-bf16-pass x@beta error lands on the
    # deltas at full size (round-4 TPU-vs-CPU quality root cause; see
    # ops/gaussian_mmv.kernel_precision)
    from online_detection_tpu.ops.gaussian_mmv import kernel_precision

    hp = kernel_precision()
    yw = (
        jnp.einsum("nd,cdk->nck", x, model.beta[:, :-1, :],
                   preferred_element_type=jnp.float32, precision=hp)
        + model.beta[:, -1, :][None]
    )  # [N, C, 4]
    out = jnp.einsum("nck,ckl->ncl", yw, model.t_inv,
                     preferred_element_type=jnp.float32, precision=hp) + model.mu[None]
    return jnp.where(model.exists[None, :, None], out, 0.0)
