"""Minibootstrap: streaming hard-negative mining for FALKON classifiers.

TPU-native rebuild of ``OnlineRegionClassifier.trainWithMinibootstrap``
(``region-classifier/OnlineRegionClassifier.py:96-155``):

per class, over I negative batches of size B:
  - batch 0 seeds the cache with all positives + the first negative batch;
  - batch j>0: score the batch with the current model, keep *hard* negatives
    (score > HARD_THRESH, default -0.7) into the cache;
  - retrain FALKON on the cache (fresh Nystrom center selection each time,
    <=M/2 positives — ``FALKONWrapper_with_centers_selection.py:83-95``);
  - prune *easy* negatives (score < EASY_THRESH, default -0.9) from the cache.

TPU design differences from the reference (same fixpoint, different shape):

- The cache is a **fixed-capacity masked buffer** laid out once: a static
  positive prefix followed by one static slot-block per negative batch.
  Hard mining writes validity bits instead of concatenating; easy pruning
  clears them instead of slicing. Every iteration sees the same shapes, so
  the whole loop is ONE ``lax.scan`` body compiled once — masked-out
  future blocks simply carry zero weight in the normal equations.
- The per-class loop is **vmapped**: all C classifiers (21 detector classes,
  15 RPN anchor shapes, C segmentation heads) run their minibootstrap
  *concurrently* as one batched program — the reference trains them
  sequentially (``OnlineRegionClassifier.py:100``). The class axis is also
  the natural mesh axis for multi-chip sharding (see parallel/mesh.py).

The model-fitting and scoring steps are **injectable** (``fit_fn`` /
``score_fn``): production uses FALKON, while the differential parity suite
(``tests/test_reference_parity.py``) drives this exact loop with the same
deterministic stub classifier it plugs into the literal reference
``trainWithMinibootstrap`` and asserts identical cache membership per
iteration. The scan emits the cache-validity trace for that purpose.

Feature z-scoring (``zScores``: (x - mean) * (20 / mean_norm),
``py_od_utils.py:98-102``) is the caller's job, as in the reference
(``trainRegionClassifier`` normalizes before the loop).
"""

from __future__ import annotations

import functools
import os
import threading
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from online_detection_tpu.ops.gaussian_mmv import mmv_xla
from online_detection_tpu.solvers.falkon import (
    FalkonModel,
    falkon_fit,
    select_nystrom_centers,
)


class MinibootstrapParams(NamedTuple):
    """Static solver hyperparameters (FALKON + mining thresholds).

    Defaults mirror ``config_online_rpn_detection_segmentation_ycbv.yaml`` /
    ``defaults.py:479-499``.
    """

    m: int = 1000
    sigma: float = 15.0
    lam: float = 1e-5
    hard_thresh: float = -0.7
    easy_thresh: float = -0.9
    maxiter: int = 20


def _falkon_fit_fn(key, cache_x, y, cache_is_pos, cache_valid, params):
    """Production model update: Nystrom center re-selection + FALKON fit."""
    c_idx = select_nystrom_centers(key, cache_is_pos, cache_valid, params.m)
    centers = cache_x[c_idx]
    alpha = falkon_fit(
        cache_x,
        y,
        cache_valid.astype(jnp.float32),
        centers,
        params.sigma,
        params.lam,
        maxiter=params.maxiter,
    )
    return alpha, centers


def _falkon_score_fn(model, x, params):
    # mining scores run at the "solver" precision role: they decide WHICH
    # negatives enter the cache (a selection, not a user-facing score), and
    # they are ~35% of the solver's matmul FLOPs (see kernel_precision)
    alpha, centers = model
    return mmv_xla(x, centers, alpha, params.sigma, role="solver")


def _falkon_init_fn(p_cap, d, params):
    return (
        jnp.zeros((params.m,), jnp.float32),
        jnp.zeros((params.m, d), jnp.float32),
    )


def _use_unrolled() -> bool:
    """Production solver-program shape: the statically-unrolled prefix loop
    (True, default) or the single ``lax.scan`` body (False,
    ``ODTPU_SOLVER_UNROLL=0``). Same fixpoint — asserted by
    ``tests/test_minibootstrap.py::test_unrolled_matches_scan`` — but the
    unrolled program is ~15% faster warm on the TPU while the scan program
    compiles ~an order of magnitude faster (one iteration body vs I distinct
    prefix shapes). The CPU-mesh multichip dryrun and time-boxed CI set the
    env: there the compile, not the warm run, is the wall-clock."""
    return os.environ.get("ODTPU_SOLVER_UNROLL", "1") != "0"


def _train_one_class(
    key: jax.Array,
    pos: jax.Array,  # [P, d]
    pos_valid: jax.Array,  # [P]
    neg: jax.Array,  # [I, B, d]
    neg_valid: jax.Array,  # [I, B]
    stats,  # Optional[FeatureStats] — z-score INSIDE the program (see below)
    params: MinibootstrapParams,
    fit_fn=_falkon_fit_fn,
    score_fn=_falkon_score_fn,
    init_fn=_falkon_init_fn,
):
    if stats is not None:
        # normalizing inside the jit keeps the z-scored features a program
        # TEMPORARY instead of a second persistent HBM copy of the (GB-scale)
        # negative pools — at flagship scale the copies OOM a 16 GB chip
        from online_detection_tpu.utils.stats import zscore

        pos = zscore(pos, stats) * pos_valid[..., None]
        neg = zscore(neg, stats) * neg_valid[..., None]
    p_cap, d = pos.shape
    n_iter, batch = neg.shape[0], neg.shape[1]
    neg_flat = neg.reshape(n_iter * batch, d)

    # static cache layout: [positives | neg block 0 | ... | neg block I-1]
    cache_x = jnp.concatenate([pos, neg_flat], axis=0)
    cache_is_pos = jnp.concatenate(
        [jnp.ones((p_cap,), bool), jnp.zeros((n_iter * batch,), bool)]
    )
    y = jnp.where(cache_is_pos, 1.0, -1.0).astype(jnp.float32)

    def body(state, j):
        model, neg_mask = state
        block = jax.lax.dynamic_slice_in_dim(neg_flat, j * batch, batch, axis=0)
        block_valid = neg_valid[j]
        scores = score_fn(model, block, params)
        hard = block_valid & (scores > params.hard_thresh)
        # first batch: no model yet — everything valid goes in
        hard = jnp.where(j == 0, block_valid, hard)
        neg_mask = jax.lax.dynamic_update_slice_in_dim(neg_mask, hard, j * batch, 0)

        cache_valid = jnp.concatenate([pos_valid, neg_mask])
        model = fit_fn(
            jax.random.fold_in(key, j), cache_x, y, cache_is_pos, cache_valid,
            params,
        )

        # easy pruning over the (valid) negative slots
        neg_scores = score_fn(model, neg_flat, params)
        neg_mask = neg_mask & (neg_scores >= params.easy_thresh)
        return (model, neg_mask), (cache_valid, neg_mask)

    state0 = (init_fn(p_cap, d, params), jnp.zeros((n_iter * batch,), bool))
    (model, _), trace = jax.lax.scan(body, state0, jnp.arange(n_iter))
    exists = (jnp.sum(pos_valid) > 0) & (jnp.sum(neg_valid) > 0)
    return model, exists, trace


def _train_one_class_unrolled(
    key: jax.Array,
    pos: jax.Array,  # [P, d]
    pos_valid: jax.Array,  # [P]
    neg: jax.Array,  # [I, B, d]
    neg_valid: jax.Array,  # [I, B]
    stats,
    params: MinibootstrapParams,
    fit_fn=_falkon_fit_fn,
    score_fn=_falkon_score_fn,
    init_fn=_falkon_init_fn,
):
    """The same fixpoint as :func:`_train_one_class`, statically unrolled.

    The scan body must use one static cache shape, so every iteration fits
    and prunes over all ``P + I*B`` rows even though at iteration ``j`` only
    the first ``P + (j+1)*B`` can be live — ~43% of the matmul FLOPs at
    flagship scale (I=10) multiply exact zeros. Unrolling makes ``j`` a
    Python constant, so each iteration:

    - fits on the static prefix ``[:P + (j+1)*B]`` (masked rows outside the
      prefix are identically zero-weighted in the scan version, so the
      normal equations are unchanged);
    - scores ONE prefix ``[: (j+2)*B]`` per model update, which serves both
      the easy-prune of current members and the hard-mining of the NEXT
      block (the scan version pays two passes: the full-buffer prune plus a
      separate block-mining pass).

    Same PRNG stream, same membership, same model — locked by
    ``tests/test_minibootstrap.py`` against the scan path, which remains the
    trace source for the reference-parity suite. Compile cost grows with the
    unroll (I distinct shapes); production I<=10 keeps it in the tens of
    seconds once, persistent-cached thereafter.
    """
    if stats is not None:
        from online_detection_tpu.utils.stats import zscore

        pos = zscore(pos, stats) * pos_valid[..., None]
        neg = zscore(neg, stats) * neg_valid[..., None]
    p_cap, d = pos.shape
    n_iter, batch = neg.shape[0], neg.shape[1]
    n_neg = n_iter * batch
    neg_flat = neg.reshape(n_neg, d)

    cache_x = jnp.concatenate([pos, neg_flat], axis=0)
    cache_is_pos = jnp.concatenate(
        [jnp.ones((p_cap,), bool), jnp.zeros((n_neg,), bool)]
    )
    y = jnp.where(cache_is_pos, 1.0, -1.0).astype(jnp.float32)

    model = init_fn(p_cap, d, params)
    neg_mask = jnp.zeros((0,), bool)  # grows by one block per iteration
    block_scores = None  # block j scores under model_{j-1}, from the fused pass
    cache_valid_trace, neg_mask_trace = [], []
    for j in range(n_iter):
        if j == 0:
            hard = neg_valid[0]  # no model yet — everything valid goes in
        else:
            hard = neg_valid[j] & (block_scores > params.hard_thresh)
        neg_mask = jnp.concatenate([neg_mask, hard])
        live = p_cap + (j + 1) * batch  # static

        cache_valid = jnp.concatenate([pos_valid, neg_mask])
        model = fit_fn(
            jax.random.fold_in(key, j), cache_x[:live], y[:live],
            cache_is_pos[:live], cache_valid, params,
        )
        cache_valid_trace.append(
            jnp.concatenate([cache_valid, jnp.zeros((n_neg - (j + 1) * batch,), bool)])
        )

        # one scoring pass: prune current members + mine the next block
        upto = min((j + 2) * batch, n_neg)  # static
        scores = score_fn(model, neg_flat[:upto], params)
        neg_mask = neg_mask & (scores[: (j + 1) * batch] >= params.easy_thresh)
        block_scores = scores[(j + 1) * batch : upto]
        neg_mask_trace.append(
            jnp.concatenate([neg_mask, jnp.zeros((n_neg - (j + 1) * batch,), bool)])
        )
    exists = (jnp.sum(pos_valid) > 0) & (jnp.sum(neg_valid) > 0)
    trace = (jnp.stack(cache_valid_trace), jnp.stack(neg_mask_trace))
    return model, exists, trace


# ONE jitted program per (fit, score) pair — production always hits the same
# cache entry (a fresh jit wrapper per call would recompile the whole
# minibootstrap graph on every invocation); params determines shapes (m) ->
# static; sigma stays a Python float on the model so downstream Pallas
# dispatch keeps it compile-time constant
@functools.lru_cache(maxsize=None)
def _make_train_program(fit_fn, score_fn, init_fn, unrolled=False):
    base = _train_one_class_unrolled if unrolled else _train_one_class
    fn = functools.partial(
        base, fit_fn=fit_fn, score_fn=score_fn, init_fn=init_fn
    )
    return jax.jit(
        jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, None, None)),
        static_argnums=(6,),
    )


@functools.lru_cache(maxsize=None)
def _make_train_program_sharded(mesh, axis_name: str, unrolled: bool = True):
    """Class-sharded variant of :func:`_make_train_program`: the vmapped
    class axis of every solver buffer is sharded over a 1-D mesh, so each
    device trains its slice of the classifiers concurrently with ZERO
    collectives (the per-class minibootstrap is embarrassingly parallel —
    SURVEY.md §2.2 "make the class axis a sharded mesh axis"). The per-class
    program is the PRODUCTION one (statically unrolled prefix, optional
    stats-inside-the-program z-scoring), not a degraded scan body."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cls = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    base = _train_one_class_unrolled if unrolled else _train_one_class
    fn = functools.partial(
        base, fit_fn=_falkon_fit_fn, score_fn=_falkon_score_fn,
        init_fn=_falkon_init_fn,
    )
    return jax.jit(
        jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, None, None)),
        static_argnums=(6,),
        in_shardings=(cls, cls, cls, cls, cls, repl),
        out_shardings=cls,
    )


# ---- AOT executable registry ------------------------------------------
# On a remote/tunneled TPU backend, loading a compiled program onto the
# device is LAZY (it happens at first execution, not at compile()) and costs
# executable-bytes / link-bandwidth — the flagship unrolled minibootstrap
# serializes to ~120 MB and measured 70-90 s to ship at first call even on a
# persistent-compile-cache HIT (BASELINE.md). ``warm_train_program`` compiles
# a program for given shapes ahead of time AND forces the device upload with
# one throwaway zero-input execution, so callers (the bench, or a CLI
# overlapping solver warm-up with its feature-harvest pass) pay the load off
# the critical path. ``train_classifiers_minibootstrap`` consults the
# registry before falling back to the jit path.
_AOT_PROGRAMS: dict = {}
_AOT_EXEC_LOCK = threading.Lock()  # serialize throwaway runs (HBM + device)
# observability: how many production solver calls hit a warmed executable —
# the warm-up is a silent no-op if this stays 0 (round-3 advisor finding)
AOT_HITS: int = 0


def evict_aot_programs() -> int:
    """Drop every warmed executable from the registry (and with it the
    backend's reference to the loaded program). Returns the number evicted.

    The FAILED_PRECONDITION executable-lifecycle failure (round-3 verdict):
    a process that has loaded ~15 large executables (the unrolled
    minibootstraps serialize to ~120 MB each) can fail the NEXT large
    program load on the real backend. ``jax.clear_caches()`` releases
    jit-held executables but NOT this registry; production processes that
    harvest, train, and serve sequentially should evict between phases (or
    rely on :func:`online_detection_tpu.utils.compile_cache.
    run_with_executable_recovery`, which evicts and retries on that error)."""
    n = len(_AOT_PROGRAMS)
    _AOT_PROGRAMS.clear()
    return n


def _aot_signature(args, params):
    leaves, treedef = jax.tree_util.tree_flatten(args)
    return (
        tuple((tuple(l.shape), str(l.dtype)) for l in leaves),
        treedef,
        params,
        # realization is part of the program identity: without it, a process
        # that warms under one ODTPU_SOLVER_UNROLL value and later flips it
        # would get AOT "hits" that silently execute (and time) the other
        # loop realization (round-5 review finding)
        _use_unrolled(),
    )


def warm_train_program(
    c: int,
    p_cap: int,
    n_iter: int,
    batch: int,
    d: int,
    params: MinibootstrapParams,
    with_stats: bool = True,
    run: bool = True,
) -> None:
    """AOT-compile (and, with ``run=True``, load onto the device) the
    production minibootstrap program for the given pool shapes.

    Thread-safe: meant to run on a background thread while the caller's
    foreground work (feature harvesting, other benchmarks) proceeds; the
    one throwaway execution that forces the lazy device upload is serialized
    behind a lock so concurrent warms don't stack their pool buffers in HBM.
    """
    f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    b8 = lambda *s: jax.ShapeDtypeStruct(s, jnp.bool_)
    keys_t = jax.ShapeDtypeStruct((c,), jax.random.key(0).dtype)
    stats_t = None
    if with_stats:
        from online_detection_tpu.utils.stats import FeatureStats

        stats_t = FeatureStats(f32(d), f32(d), f32())
    args = (keys_t, f32(c, p_cap, d), b8(c, p_cap), f32(c, n_iter, batch, d),
            b8(c, n_iter, batch), stats_t)
    sig = _aot_signature(args, params)
    if sig in _AOT_PROGRAMS:
        return
    program = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn,
        unrolled=_use_unrolled(),
    )
    compiled = program.lower(*args, params).compile()
    if run:
        with _AOT_EXEC_LOCK:
            zeros = jax.jit(
                lambda: (
                    jax.random.split(jax.random.key(0), c),
                    jnp.zeros((c, p_cap, d), jnp.float32),
                    jnp.zeros((c, p_cap), bool),
                    jnp.zeros((c, n_iter, batch, d), jnp.float32),
                    jnp.zeros((c, n_iter, batch), bool),
                )
            )()
            stats_z = None
            if with_stats:
                from online_detection_tpu.utils.stats import FeatureStats

                stats_z = FeatureStats(
                    jnp.zeros((d,)), jnp.ones((d,)), jnp.asarray(1.0)
                )
            out = compiled(*zeros, stats_z)
            jax.device_get(out[1])  # force the (lazy) executable upload
            del zeros, out
    _AOT_PROGRAMS[sig] = compiled


def _train_all_classes(keys, pos, pos_valid, neg, neg_valid, stats, params,
                       mesh=None, axis_name: str = "mb"):
    args = (keys, pos, pos_valid, neg, neg_valid, stats)
    if mesh is None:
        compiled = _AOT_PROGRAMS.get(_aot_signature(args, params))
        if compiled is not None:
            global AOT_HITS
            AOT_HITS += 1
            (alpha, centers), exists, _ = compiled(*args)
            return centers, alpha, exists
        program = _make_train_program(
            _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn,
            unrolled=_use_unrolled(),
        )
    else:
        # args may arrive committed to another sharding (e.g. replicated
        # outputs of the reservoir programs); jit(in_shardings=...) raises on
        # the mismatch instead of resharding, so place them explicitly —
        # device_put is a no-op when the sharding already matches
        from jax.sharding import NamedSharding, PartitionSpec as P

        cls = NamedSharding(mesh, P(axis_name))
        repl = NamedSharding(mesh, P())
        args = tuple(
            jax.device_put(a, cls) for a in args[:5]
        ) + (jax.device_put(args[5], repl) if args[5] is not None else None,)
        program = _make_train_program_sharded(
            mesh, axis_name, unrolled=_use_unrolled()
        )
    (alpha, centers), exists, _ = program(*args, params)
    return centers, alpha, exists


def minibootstrap_trace(
    keys: jax.Array,
    pos: jax.Array,
    pos_valid: jax.Array,
    neg: jax.Array,
    neg_valid: jax.Array,
    params: MinibootstrapParams,
    fit_fn=_falkon_fit_fn,
    score_fn=_falkon_score_fn,
    init_fn=_falkon_init_fn,
):
    """Run the production mining loop and return its per-iteration cache trace.

    Returns ``(model, exists, (cache_valid [C, I, P+I*B], neg_mask
    [C, I, I*B]))`` — ``cache_valid[c, j]`` is the cache membership at the
    j-th model update (what the reference trains on at iteration j),
    ``neg_mask[c, j]`` the negative-slot membership after easy pruning.
    Pluggable ``fit_fn``/``score_fn`` let the differential parity suite drive
    the identical loop with the stub classifier it plugs into the reference.
    """
    program = _make_train_program(fit_fn, score_fn, init_fn)
    return program(keys, pos, pos_valid, neg, neg_valid, None, params)


def train_classifiers_minibootstrap(
    key: jax.Array,
    pos: jax.Array,  # [C, P, d]
    pos_valid: jax.Array,  # [C, P]
    neg: jax.Array,  # [C, I, B, d]
    neg_valid: jax.Array,  # [C, I, B]
    params: MinibootstrapParams,
    stats=None,
    class_chunk=None,
    mesh=None,
    axis_name: str = "mb",
    class_keys=None,
) -> FalkonModel:
    """Train all C classifiers concurrently. Returns a class-batched model.

    ``class_keys``: optional per-class PRNG keys [C]. When given, class i
    trains with class_keys[i] regardless of padding or chunk boundaries —
    callers that window the class axis (``_train_head_chunked``) derive
    these from ABSOLUTE class indices so multi-chip runs (whose chunk is
    rounded up to a mesh multiple) use bitwise-identical per-class streams
    to single-chip (round-3 advisor finding). When None, keys are split from
    ``key`` over the (padded) class count.

    ``stats``: optional FeatureStats — when given, features are z-scored
    INSIDE the jitted program (shared across classes), avoiding a persistent
    normalized copy of the pools in HBM. When None, inputs must already be
    normalized (masked rows zero), as the host pipeline provides.

    ``class_chunk``: train the classes in groups of this size instead of one
    C-wide vmap. The solver's per-class temporaries (z-scored pools, the
    [P+I*B, d] cache, K_NM) scale with the vmap width — at flagship scale
    (C=21, d=2048, 10x2000 pools) the full-width program overflows a 16 GB
    chip once the feature reservoirs are resident; chunks bound the working
    set while reusing ONE compiled program for every chunk (the tail chunk
    is zero-padded). None = single vmap (small problems, tests).

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — the class axis is sharded
    over its devices (each trains its slice, zero collectives). The class
    count (and any ``class_chunk``) is padded up to a mesh multiple; padded
    classes have no data and come back with exists=False.
    """
    c = pos.shape[0]
    if mesh is not None:
        n_dev = mesh.devices.size
        if class_chunk is not None and class_chunk > 0:
            # per-device chunking: each device trains chunk/n_dev classes
            # per call, so the per-device working set stays bounded exactly
            # like the single-device chunked path
            class_chunk = max(1, -(-class_chunk // n_dev)) * n_dev
        pad_c = (-c) % (class_chunk if class_chunk else n_dev)
        if pad_c:
            widths = lambda x: [(0, pad_c)] + [(0, 0)] * (x.ndim - 1)
            pos = jnp.pad(pos, widths(pos))
            pos_valid = jnp.pad(pos_valid, widths(pos_valid))
            neg = jnp.pad(neg, widths(neg))
            neg_valid = jnp.pad(neg_valid, widths(neg_valid))
    cp = pos.shape[0]
    if class_keys is not None:
        keys = class_keys
        if keys.shape[0] < cp:  # mesh padding beyond the provided classes
            keys = jnp.concatenate([keys, jax.random.split(key, cp - keys.shape[0])])
    else:
        keys = jax.random.split(key, cp)
    if class_chunk is None or class_chunk >= cp:
        centers, alpha, exists = _train_all_classes(
            keys, pos, pos_valid, neg, neg_valid, stats, params,
            mesh=mesh, axis_name=axis_name,
        )
        return FalkonModel(
            centers[:c], alpha[:c], exists[:c], params.sigma
        )

    def pad(x, lo, hi):
        sl = x[lo:hi]
        if hi - lo < class_chunk:
            widths = [(0, class_chunk - (hi - lo))] + [(0, 0)] * (x.ndim - 1)
            sl = jnp.pad(sl, widths)
        return sl

    def pad_keys(k, lo, hi):
        sl = k[lo:hi]  # key arrays can't be zero-padded; recycle real keys
        if hi - lo < class_chunk:
            sl = jnp.concatenate([sl, k[: class_chunk - (hi - lo)]])
        return sl

    outs = []
    for lo in range(0, cp, class_chunk):
        hi = min(lo + class_chunk, cp)
        centers, alpha, exists = _train_all_classes(
            pad_keys(keys, lo, hi), pad(pos, lo, hi), pad(pos_valid, lo, hi),
            pad(neg, lo, hi), pad(neg_valid, lo, hi), stats, params,
            mesh=mesh, axis_name=axis_name,
        )
        outs.append((centers[: hi - lo], alpha[: hi - lo], exists[: hi - lo]))
    centers = jnp.concatenate([o[0] for o in outs])
    alpha = jnp.concatenate([o[1] for o in outs])
    exists = jnp.concatenate([o[2] for o in outs])
    return FalkonModel(centers[:c], alpha[:c], exists[:c], params.sigma)
