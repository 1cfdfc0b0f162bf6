"""Gaussian-kernel matrix-vector products — the workhorse op of the framework.

``mmv(X, C, V) = K(X, C) @ V`` with ``K(x, c) = exp(-||x - c||^2 / (2 sigma^2))``.

This single primitive serves (mirroring the reference's use of
``falkon.kernels.GaussianKernel.mmv`` — the native CUDA component enumerated
in SURVEY.md §2.3):

- FALKON prediction (``FALKONWrapper_with_centers_selection.py:71-78``),
- the fused multi-classifier inference paths (``rpn.py:201-227``,
  ``roi_box_predictors.py:140-160``, ``roi_mask_predictors.py:72-99``),
- the K_NM matvecs inside the FALKON preconditioned-CG fit.

TPU design: the squared distance is expanded as
``||x||^2 + ||c||^2 - 2 x.c`` so the inner loop is a plain matmul that lands
on the MXU; the exp and the second matmul (by V) fuse around it. Two
implementations:

- ``mmv_xla``     : pure jnp — XLA fuses the exp epilogue and the V reduction
                    into the distance matmul's consumer chain without
                    materialising K(X, C) in HBM.
- ``mmv_pallas``  : tiled Pallas kernel that keeps the [TM, TN] kernel-block
                    in VMEM and accumulates K-block @ V explicitly.

``mmv`` dispatches to the XLA path on every backend: measured on v5e at all
four production shapes (solver predict 20k x 1000 @ d=2048, RPN inference
15.2k x 15x1000 @ d=1024, detector 2.4k x 21x1000 @ d=2048, mask head
157k x 21x500 @ d=256), the XLA fusion beats the hand kernel — 45 vs 35,
110 vs 92, 58~63, and 91 vs 44 TFLOP/s respectively. The Pallas kernel pads
the V matvec to 128 output lanes (4x the useful MXU work at t=1) and
re-streams operand tiles that XLA's fusion keeps in registers; the lesson is
the scaling-book rule — don't hand-schedule what the compiler already fuses.
The kernel stays as an opt-in (``use_pallas=True``) and as the explicit-tiling
reference implementation.

All shapes must be static; masked rows are the caller's concern (zero rows of
V / ignore rows of the output).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; tests run on CPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _sq_norms(x: jax.Array) -> jax.Array:
    return jnp.sum(x * x, axis=-1)


#: role -> default matmul precision for the ONLINE-MODEL math. Two roles:
#:
#: - ``"apply"``  — quality-deciding score/delta products whose outputs feed
#:   ranking, NMS, thresholds, and box decoding directly: inference-time
#:   kernel scores (``falkon_predict[_classes]``, the own-class mask scores)
#:   and the RLS delta applies. Default HIGH (bf16x3 — f32-equivalent error
#:   for these ranges).
#: - ``"solver"`` — the training-side bulk FLOPs: minibootstrap hard/easy
#:   mining scores and ``falkon_fit``'s K_NM/Z/Gram chain. Also HIGH by
#:   default; measured on the real chip this is where the precision choice
#:   costs wall-clock (the solver headline ran 1.26 s at 1-pass DEFAULT vs
#:   2.38 s at HIGH), so it has its own override knob for quality/speed
#:   trades. PSD-critical factorization inputs (falkon_fit's K_MM, the RLS
#:   whitening Grams) are independently pinned HIGHEST in-place and are not
#:   governed by this table.
_ROLE_DEFAULTS = {"apply": "high", "solver": "high"}


def kernel_precision_name(role: str = "apply") -> str:
    """The RESOLVED precision-mode name (``default|high|highest``) for a
    role, after env overrides — single source of truth shared with
    :func:`kernel_precision`. Benchmarks stamp this into every metric record
    so cross-round series distinguish policy changes from code regressions
    (round-4 verdict: the mmv series silently conflated the two)."""
    import os

    return os.environ.get(
        "ODTPU_KERNEL_PRECISION",
        os.environ.get(
            f"ODTPU_{role.upper()}_PRECISION", _ROLE_DEFAULTS[role]
        ),
    ).lower()


def kernel_precision(role: str = "apply"):
    """Matmul precision for the ONLINE-MODEL math: Gaussian-kernel cross
    terms and the RLS/head applies, by role (see ``_ROLE_DEFAULTS``).

    Resolution order: ``ODTPU_KERNEL_PRECISION`` (global override, all
    roles) > ``ODTPU_SOLVER_PRECISION`` / ``ODTPU_APPLY_PRECISION`` (per
    role) > the role default. Values: ``default|high|highest``
    (name resolution shared with :func:`kernel_precision_name`).

    Why this exists (round-4 root cause of the TPU-vs-CPU quality gap): on
    TPU, XLA runs f32 matmuls as a SINGLE bf16 pass by default. The Gaussian
    kernel computes ``||x-c||^2`` via the ``||x||^2+||c||^2-2*x.c``
    expansion, where the cross term is O(||x||*||c||) while the distance of
    nearby points is near 0 — the bf16 rounding of ``x.c`` (~0.4% relative)
    passes through the cancellation at full size and corrupts exactly the
    near-center kernel values that decide FALKON scores, in minibootstrap
    hard/easy mining AND at inference; the RLS delta applies (O(0.1) deltas
    from O(10^2) products) cancel the same way. Measured on the real chip at
    smoke scale: default precision det/segm mAP 0.50/0.50 vs 0.92/0.77 at
    highest (CPU reference 0.886/0.886); the bf16 conv TRUNK is innocent
    (f32 trunk + default precision still measures 0.50). HIGH and HIGHEST
    land the identical smoke mAP while inference b8 costs 11% vs 23% over
    the corrupted single-pass default (110.7 / 95.3 / 123.4 imgs/s). The
    reference runs true-f32 CUDA throughout
    (``mrcnn_modified/config/defaults.py:466``). The conv trunk keeps the
    platform default — conv quality is insensitive and that is where the
    FLOPs are."""
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[kernel_precision_name(role)]


def gaussian_kernel(
    x: jax.Array, c: jax.Array, sigma: float, precision=None
) -> jax.Array:
    """Dense K(x, c): [N, d] x [M, d] -> [N, M].

    ``precision``: ``jax.lax.Precision`` for the distance matmul; None
    resolves to :func:`kernel_precision` at the "apply" role — see there for
    the measured quality rationale; the same class of error also seeds the
    FALKON preconditioner: a bf16-pass K_MM measured a -7e-4 eigenvalue on a
    256-center problem -> indefinite -> Cholesky NaN.
    """
    if precision is None:
        precision = kernel_precision()
    sq = (
        _sq_norms(x)[:, None]
        + _sq_norms(c)[None, :]
        - 2.0 * jnp.matmul(x, c.T, precision=precision)
    )
    sq = jnp.maximum(sq, 0.0)
    return jnp.exp(-sq / (2.0 * sigma * sigma))


@functools.partial(jax.jit, static_argnames=("sigma", "role"))
def mmv_xla(
    x: jax.Array, c: jax.Array, v: jax.Array, sigma: float,
    role: str = "apply",
) -> jax.Array:
    """K(x, c) @ v through XLA fusion. v: [M, t] (or [M] -> [N]).

    Jitted at this boundary so eager callers (bench, notebooks) get the
    fused program rather than per-op dispatch with K materialized in HBM
    (measured 9x slower eager); inside an enclosing jit this is a no-op.

    ``role``: precision role (see :func:`kernel_precision`) — ``"apply"``
    for inference scores, ``"solver"`` for the minibootstrap mining passes.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    prec = kernel_precision(role)
    k = gaussian_kernel(x, c, sigma, precision=prec)
    # K @ alpha at the same precision: FALKON alphas carry sign-alternating
    # large entries (ridge solutions), so the score sum cancels and a bf16
    # single-pass error is relative to the TERMS, not the result
    out = jnp.matmul(k, v, precision=prec)
    return out[:, 0] if squeeze else out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mmv_kernel(x_ref, c_ref, v_ref, xs_ref, cs_ref, o_ref, acc_ref, *, inv2s2,
                n_k, bf16_dot):
    """Pallas body. Grid = (N/TM, K/TK): for each X-tile, loop over C-tiles
    accumulating exp(-(|x|^2+|c|^2-2xc)/2s^2) @ V into the output tile."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # [TM, TK] kernel block via MXU matmul + VPU epilogue. With ``bf16_dot``
    # the operands are cast to bfloat16 for single-pass MXU throughput
    # (f32 accumulation): ~4x the f32 dot rate, and the same rounding XLA's
    # default TPU precision applies to f32 matmuls outside Pallas — Mosaic
    # alone defaults to full f32 passes, which capped this kernel at the
    # 49 TFLOP/s f32 peak (measured 47.9 in BENCH_r01).
    if bf16_dot:
        xc = jnp.dot(x_ref[:].astype(jnp.bfloat16),
                     c_ref[:].astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    else:
        xc = jnp.dot(x_ref[:], c_ref[:].T, preferred_element_type=jnp.float32)
    sq = xs_ref[:] + cs_ref[:].T - 2.0 * xc
    kblk = jnp.exp(-jnp.maximum(sq, 0.0) * inv2s2)
    if bf16_dot:
        acc_ref[:] += jnp.dot(kblk.astype(jnp.bfloat16),
                              v_ref[:].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
    else:
        acc_ref[:] += jnp.dot(kblk, v_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "tile_n", "tile_m", "interpret", "bf16_dot"),
)
def mmv_pallas(
    x: jax.Array,
    c: jax.Array,
    v: jax.Array,
    sigma: float,
    tile_n: int = 512,
    tile_m: int = 512,
    interpret: bool = False,
    bf16_dot: bool = True,
) -> jax.Array:
    """Tiled Pallas K(x,c)@v. x:[N,d] c:[M,d] v:[M,t] -> [N,t].

    Pads N, M to tile multiples and d, t to 128 lanes; padding rows of c get
    +inf distance contribution zeroed by padding v with zero rows, so results
    are exact.

    ``bf16_dot`` (default): run the two dots as single bfloat16 MXU passes
    with f32 accumulation — matching XLA's default f32-matmul precision on
    this TPU generation and ~4x the all-f32 kernel's throughput. Kernel-value
    relative error is ~1e-3 at the framework's feature scales (z-scored
    features, sigma 10-50); pass ``bf16_dot=False`` for bit-level parity with
    ``mmv_xla`` at "highest" precision (used by the exactness tests).
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    n, d = x.shape
    m, t = c.shape[0], v.shape[1]

    tn = min(tile_n, _round_up(n, 128))
    tm = min(tile_m, _round_up(m, 128))
    n_p = _round_up(n, tn)
    m_p = _round_up(m, tm)
    d_p = _round_up(d, 128)
    t_p = _round_up(t, 128)

    xp = jnp.zeros((n_p, d_p), x.dtype).at[:n, :d].set(x)
    cp = jnp.zeros((m_p, d_p), c.dtype).at[:m, :d].set(c)
    # zero rows in v for padded centers -> their kernel entries contribute 0
    vp = jnp.zeros((m_p, t_p), jnp.float32).at[:m, :t].set(v.astype(jnp.float32))
    xs = _sq_norms(xp)[:, None]  # [N_p, 1]
    cs = _sq_norms(cp)[:, None]  # [M_p, 1]

    n_k = m_p // tm
    grid = (n_p // tn, n_k)
    out = pl.pallas_call(
        functools.partial(
            _mmv_kernel, inv2s2=1.0 / (2.0 * sigma * sigma), n_k=n_k,
            bf16_dot=bf16_dot,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d_p), lambda i, k: (i, 0)),
            pl.BlockSpec((tm, d_p), lambda i, k: (k, 0)),
            pl.BlockSpec((tm, t_p), lambda i, k: (k, 0)),
            pl.BlockSpec((tn, 1), lambda i, k: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((tn, t_p), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_p, t_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tn, t_p), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * m_p * (d_p + t_p),
            bytes_accessed=4 * (n_p * d_p + m_p * d_p * n_k + n_p * t_p),
            transcendentals=n_p * m_p,
        ),
    )(xp, cp, vp, xs, cs)
    out = out[:n, :t]
    return out[:, 0] if squeeze else out


def mmv(
    x: jax.Array,
    c: jax.Array,
    v: jax.Array,
    sigma: float,
    use_pallas: Optional[bool] = None,
    role: str = "apply",
) -> jax.Array:
    """Dispatching K(x,c)@v. XLA fusion by default (measured faster than the
    hand kernel at every production shape — see module docstring); the Pallas
    kernel is opt-in. ``role`` selects the precision role (see
    :func:`kernel_precision`)."""
    if use_pallas:
        return mmv_pallas(x, c, v, sigma)
    return mmv_xla(x, c, v, sigma, role=role)
