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

- ``mmv_xla``     : pure jnp — XLA already fuses exp into the matmul epilogue
                    and handles arbitrary shapes; used on CPU and as reference.
- ``mmv_pallas``  : tiled Pallas kernel that keeps the [TM, TN] kernel-block
                    in VMEM and accumulates K-block @ V without ever
                    materialising K(X, C) in HBM — O(N*M) HBM traffic becomes
                    O(N*d + M*d + N*t).

``mmv`` dispatches on backend. All shapes must be static; masked rows are the
caller's concern (zero rows of V / ignore rows of the output).
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


def gaussian_kernel(x: jax.Array, c: jax.Array, sigma: float) -> jax.Array:
    """Dense K(x, c): [N, d] x [M, d] -> [N, M]. For small problems/tests."""
    sq = (
        _sq_norms(x)[:, None]
        + _sq_norms(c)[None, :]
        - 2.0 * x @ c.T
    )
    sq = jnp.maximum(sq, 0.0)
    return jnp.exp(-sq / (2.0 * sigma * sigma))


def mmv_xla(
    x: jax.Array, c: jax.Array, v: jax.Array, sigma: float
) -> jax.Array:
    """K(x, c) @ v without Pallas. v: [M, t] (or [M] -> [N])."""
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    k = gaussian_kernel(x, c, sigma)
    out = k @ v
    return out[:, 0] if squeeze else out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mmv_kernel(x_ref, c_ref, v_ref, xs_ref, cs_ref, o_ref, acc_ref, *, inv2s2, n_k):
    """Pallas body. Grid = (N/TM, K/TK): for each X-tile, loop over C-tiles
    accumulating exp(-(|x|^2+|c|^2-2xc)/2s^2) @ V into the output tile."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # [TM, TK] kernel block via MXU matmul + VPU epilogue
    xc = jnp.dot(x_ref[:], c_ref[:].T, preferred_element_type=jnp.float32)
    sq = xs_ref[:] + cs_ref[:].T - 2.0 * xc
    kblk = jnp.exp(-jnp.maximum(sq, 0.0) * inv2s2)
    acc_ref[:] += jnp.dot(kblk, v_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("sigma", "tile_n", "tile_m", "interpret")
)
def mmv_pallas(
    x: jax.Array,
    c: jax.Array,
    v: jax.Array,
    sigma: float,
    tile_n: int = 512,
    tile_m: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Tiled Pallas K(x,c)@v. x:[N,d] c:[M,d] v:[M,t] -> [N,t].

    Pads N, M to tile multiples and d, t to 128 lanes; padding rows of c get
    +inf distance contribution zeroed by padding v with zero rows, so results
    are exact.
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
            _mmv_kernel, inv2s2=1.0 / (2.0 * sigma * sigma), n_k=n_k
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
) -> jax.Array:
    """Dispatching K(x,c)@v. Pallas on TPU, XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return mmv_pallas(x, c, v, sigma)
    return mmv_xla(x, c, v, sigma)
