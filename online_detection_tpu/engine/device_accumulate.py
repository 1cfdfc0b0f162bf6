"""Device-resident reservoir accumulation: the zero-host-roundtrip harvest.

The host accumulator (engine/accumulate.py) pulls every per-image chunk to
NumPy — fine on PCIe hosts, but per-image device->host transfers are the
throughput ceiling on tunneled dev chips and dead weight everywhere. This
module keeps the reservoirs in HBM:

- fixed-capacity pools per head (positives / negatives / COXY / mask pixels)
  as jitted scan state;
- per-image chunks are appended with the masked-append pattern: chunk rows
  arrive valid-first (masked_sample/compact guarantee it), so a
  dynamic-update-slice at the running count writes the valid rows
  contiguously and the invalid tail lands in scratch space that the next
  append overwrites;
- ``finalize`` shuffles + splits the negative pools into the [C, I, B, d]
  minibootstrap batches ON DEVICE (random-priority argsort) and computes the
  z-scoring statistics ON DEVICE, so the features feed straight into the
  solvers without ever visiting the host — the north-star "never round-trips
  to host" loop (BASELINE.md).

Capacities: negatives need ``B * I`` rows per class (the reference's exact
cap); positives/COXY are configurable (defaults sized for the flagship runs).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.harvest import DetChunk, HarvestChunk, MaskChunk, RPNChunk
from online_detection_tpu.utils.stats import FeatureStats


class Pool(NamedTuple):
    """[C, cap, d] rows + per-class counts.

    ``attempted`` counts every valid row ever offered to the pool, so
    ``attempted - counts`` is the number of rows a saturated reservoir
    DROPPED — surfaced as the ``truncated:`` result.txt line (the reference
    keeps unbounded lists, ``box_head_getProposals.py:161-172``; fixed
    capacities must not truncate silently). None on derived pools that are
    not accumulation targets."""

    rows: jax.Array
    counts: jax.Array  # [C] int32
    attempted: Optional[jax.Array] = None  # [C] int32

    @staticmethod
    def make(c: int, cap: int, d: int, extra: int) -> "Pool":
        # extra scratch rows so a full-size append at count == cap-ish never
        # writes out of bounds (offset is clamped; tail rows are scratch)
        return Pool(
            rows=jnp.zeros((c, cap + extra, d), jnp.float32),
            counts=jnp.zeros((c,), jnp.int32),
            attempted=jnp.zeros((c,), jnp.int32),
        )

    def dropped(self) -> int:
        """Host-side total of rows lost to saturation (0 if untracked)."""
        if self.attempted is None:
            return 0
        import numpy as np

        return int(np.sum(np.maximum(
            np.asarray(self.attempted) - np.asarray(self.counts), 0
        )))

    @property
    def capacity(self) -> int:
        return self.rows.shape[1]

    def valid_mask(self, cap: Optional[int] = None) -> jax.Array:
        cap = cap or self.capacity
        return jnp.arange(cap)[None, :] < self.counts[:, None]


def _append(pool: Pool, chunk_rows: jax.Array, chunk_valid: jax.Array) -> Pool:
    """Masked append, vmapped over the class axis.

    chunk_rows: [C, L, d] valid-first; chunk_valid: [C, L].
    """
    cap = pool.capacity
    l = chunk_rows.shape[1]

    def one(rows, count, ch, chv):
        n_new = jnp.sum(chv).astype(jnp.int32)
        offset = jnp.clip(count, 0, cap - l)
        rows = jax.lax.dynamic_update_slice(rows, ch, (offset, 0))
        return rows, jnp.minimum(count + n_new, cap - l), n_new

    rows, counts, n_new = jax.vmap(one)(
        pool.rows, pool.counts, chunk_rows, chunk_valid
    )
    attempted = None if pool.attempted is None else pool.attempted + n_new
    return Pool(rows, counts, attempted)


class DeviceReservoirs(NamedTuple):
    rpn_neg: Optional[Pool]
    rpn_pos: Optional[Pool]
    rpn_coxy_y: Optional[Pool]  # aligned with rpn_pos rows
    det_neg: Pool
    det_pos: Pool  # [C, cap, 2048] GT-row features routed by label
    det_coxy: Pool  # single "class": [1, cap, 2048 + 4 + 1] packed (x, y, c)
    mask_pos: Optional[Pool]
    mask_neg: Optional[Pool]
    ar_sum: jax.Array
    n_images: jax.Array
    # harvest-stage drops (per-image chunk caps: RPN PPOS, COXY/img, mask PIX)
    harvest_dropped: jax.Array


def init_reservoirs(
    num_anchor_classes: int,
    num_classes: int,
    neg_cap: int,
    rpn_pos_cap: int = 4096,
    det_pos_cap: int = 4096,
    coxy_cap: int = 30000,
    mask_cap: int = 40000,
    mask_pos_cap: int = None,
    chunk_sizes: Dict[str, int] = None,
    with_rpn: bool = True,
    with_mask: bool = True,
    rpn_dim: int = 1024,
    det_dim: int = 2048,
    mask_dim: int = 256,
    batch_size: int = 1,
) -> DeviceReservoirs:
    """``batch_size``: the canvas batch the pipeline appends per fold call
    (``accumulate_batch``) — the scratch margins scale with it so a whole
    batch's append never writes past the buffer; usable capacity (the
    ``cap`` arguments) is unchanged."""
    cs = chunk_sizes or {}
    b = max(1, int(batch_size))
    npick = cs.get("npick", 64) * b
    ppos = cs.get("rpn_pos", 64) * b
    gcap = cs.get("gt_cap", 20) * b
    ccap = cs.get("coxy", 256) * b
    pix = cs.get("mask_pix", 64)
    # mask/pos scratch widths below use gcap * pix / gcap, already b-scaled
    return DeviceReservoirs(
        rpn_neg=Pool.make(num_anchor_classes, neg_cap, rpn_dim, npick) if with_rpn else None,
        rpn_pos=Pool.make(num_anchor_classes, rpn_pos_cap, rpn_dim, ppos) if with_rpn else None,
        rpn_coxy_y=Pool.make(num_anchor_classes, rpn_pos_cap, 4, ppos) if with_rpn else None,
        det_neg=Pool.make(num_classes, neg_cap, det_dim, npick),
        det_pos=Pool.make(num_classes, det_pos_cap, det_dim, gcap),
        det_coxy=Pool.make(1, coxy_cap, det_dim + 5, ccap),
        mask_pos=Pool.make(
            num_classes, mask_pos_cap or mask_cap, mask_dim, gcap * pix
        ) if with_mask else None,
        mask_neg=Pool.make(num_classes, mask_cap, mask_dim, gcap * pix) if with_mask else None,
        ar_sum=jnp.zeros(()),
        n_images=jnp.zeros((), jnp.int32),
        harvest_dropped=jnp.zeros((), jnp.int32),
    )


def _route_by_class(rows, labels, valid, num_classes):
    """[G, d] rows with 1-based labels -> per-class valid-first chunks
    [C, G, d] (+valid)."""
    g = rows.shape[0]

    def per_class(c):
        m = valid & (labels == c + 1)
        cnt = jnp.sum(m)
        order = jnp.argsort(~m, stable=True)
        return rows[order], jnp.arange(g) < cnt

    out_rows, out_valid = jax.vmap(per_class)(jnp.arange(num_classes))
    return out_rows, out_valid


def _compact_batch(valid, *row_arrays):
    """Stable valid-first compaction of per-image chunks across the canvas
    batch: [B, C, L, d] image-major -> [C, B*L, d].

    One shared argsort order per class keeps row-aligned arrays (e.g.
    rpn_pos and its coxy targets) aligned. The stable sort preserves
    (image, slot) arrival order, so the compacted block appended in ONE
    write retains exactly the rows — in exactly the order — that B
    sequential per-image ``_append`` calls would have retained, including
    at saturation (both keep the first ``cap - count`` valid arrivals)."""
    b, c, l = valid.shape
    v = jnp.transpose(valid, (1, 0, 2)).reshape(c, b * l)
    order = jnp.argsort(~v, axis=1, stable=True)  # [C, B*L]
    v_sorted = jnp.take_along_axis(v, order, axis=1)
    outs = []
    for r in row_arrays:
        rr = jnp.transpose(r, (1, 0, 2, 3)).reshape(c, b * l, r.shape[-1])
        outs.append(jnp.take_along_axis(rr, order[..., None], axis=1))
    return v_sorted, outs


def _append_batch(pool: Pool, chunk_rows, chunk_valid) -> Pool:
    """Batched masked append: ONE write per pool per canvas batch.

    chunk_rows [B, C, L, d] / chunk_valid [B, C, L]. Semantically identical
    to folding ``_append`` image-by-image (see ``_compact_batch``), but the
    B-step scan fold cost ~1.2 ms/img on v5e in KERNEL-LAUNCH serialization
    (B steps x ~15 small fused kernels; the appends themselves are in-place
    — verified in the optimized HLO), which batch-level appends amortize.
    Requires the pool's scratch margin to cover a full batch:
    ``init_reservoirs(..., batch_size=B)``."""
    valid, (rows,) = _compact_batch(chunk_valid, chunk_rows)
    return _append(pool, rows, valid)


def accumulate_batch(
    state: DeviceReservoirs,
    chunks: HarvestChunk,  # leading batch axis on every leaf
    img_valid: jax.Array,  # [B] gates padded batch-tail images
    num_classes: int,
) -> DeviceReservoirs:
    """Whole-batch jitted fold == scanning ``accumulate`` over the batch
    (same retained rows, counts, and drop accounting), restructured as one
    compaction + append per pool."""
    gate2 = img_valid[:, None]
    gate3 = img_valid[:, None, None]
    upd = {}
    if chunks.rpn is not None and state.rpn_neg is not None:
        r: RPNChunk = chunks.rpn
        upd["rpn_neg"] = _append_batch(state.rpn_neg, r.neg, r.neg_valid & gate3)
        pv, (pos_rows, coxy_rows) = _compact_batch(
            r.pos_valid & gate3, r.pos, r.coxy_y
        )
        upd["rpn_pos"] = _append(state.rpn_pos, pos_rows, pv)
        upd["rpn_coxy_y"] = _append(state.rpn_coxy_y, coxy_rows, pv)
    d: DetChunk = chunks.det
    upd["det_neg"] = _append_batch(state.det_neg, d.neg, d.neg_valid & gate3)
    b, g = d.pos.shape[0], d.pos.shape[1]
    pos_rows, pos_valid = _route_by_class(
        d.pos.reshape(b * g, -1), d.pos_labels.reshape(b * g),
        (d.pos_valid & gate2).reshape(b * g), num_classes,
    )
    upd["det_pos"] = _append(state.det_pos, pos_rows, pos_valid)
    packed = jnp.concatenate(
        [d.coxy_x, d.coxy_y, d.coxy_c[..., None]], axis=-1
    )  # [B, L, d+5]
    upd["det_coxy"] = _append_batch(
        state.det_coxy, packed[:, None], (d.coxy_valid & gate2)[:, None]
    )
    if chunks.mask is not None and state.mask_pos is not None:
        m: MaskChunk = chunks.mask
        _, gm, pix, md = m.pos.shape
        labels = jnp.repeat(m.labels.reshape(b * gm), pix)  # image-major
        pos_rows, pos_valid = _route_by_class(
            m.pos.reshape(b * gm * pix, md), labels,
            (m.pos_valid & gate3).reshape(-1), num_classes,
        )
        upd["mask_pos"] = _append(state.mask_pos, pos_rows, pos_valid)
        neg_rows, neg_valid = _route_by_class(
            m.neg.reshape(b * gm * pix, md), labels,
            (m.neg_valid & gate3).reshape(-1), num_classes,
        )
        upd["mask_neg"] = _append(state.mask_neg, neg_rows, neg_valid)
    ok = img_valid.astype(jnp.float32)
    upd["ar_sum"] = state.ar_sum + jnp.sum(chunks.average_recall * ok)
    upd["n_images"] = state.n_images + jnp.sum(img_valid).astype(jnp.int32)
    oki = img_valid.astype(jnp.int32)
    hd = jnp.sum(chunks.det.coxy_dropped.astype(jnp.int32) * oki)
    if chunks.rpn is not None and state.rpn_neg is not None:
        hd = hd + jnp.sum(
            jnp.sum(chunks.rpn.pos_dropped, axis=1).astype(jnp.int32) * oki
        )
    if chunks.mask is not None and state.mask_pos is not None:
        hd = hd + jnp.sum(chunks.mask.dropped.astype(jnp.int32) * oki)
    upd["harvest_dropped"] = state.harvest_dropped + hd
    return state._replace(**upd)


def accumulate(state: DeviceReservoirs, chunk: HarvestChunk, num_classes: int) -> DeviceReservoirs:
    """Jitted per-image fold."""
    upd = {}
    if chunk.rpn is not None and state.rpn_neg is not None:
        r: RPNChunk = chunk.rpn
        upd["rpn_neg"] = _append(state.rpn_neg, r.neg, r.neg_valid)
        upd["rpn_pos"] = _append(state.rpn_pos, r.pos, r.pos_valid)
        upd["rpn_coxy_y"] = _append(state.rpn_coxy_y, r.coxy_y, r.pos_valid)
    d: DetChunk = chunk.det
    upd["det_neg"] = _append(state.det_neg, d.neg, d.neg_valid)
    pos_rows, pos_valid = _route_by_class(d.pos, d.pos_labels, d.pos_valid, num_classes)
    upd["det_pos"] = _append(state.det_pos, pos_rows, pos_valid)
    packed = jnp.concatenate(
        [d.coxy_x, d.coxy_y, d.coxy_c[:, None]], axis=1
    )[None]  # [1, L, d+5]
    upd["det_coxy"] = _append(state.det_coxy, packed, d.coxy_valid[None])
    if chunk.mask is not None and state.mask_pos is not None:
        m: MaskChunk = chunk.mask
        g, pix, md = m.pos.shape
        # flatten (gt, pixel) then route by the gt's class
        labels = jnp.repeat(m.labels, pix)
        pos_rows, pos_valid = _route_by_class(
            m.pos.reshape(g * pix, md), labels,
            m.pos_valid.reshape(-1), num_classes,
        )
        upd["mask_pos"] = _append(state.mask_pos, pos_rows, pos_valid)
        neg_rows, neg_valid = _route_by_class(
            m.neg.reshape(g * pix, md), labels,
            m.neg_valid.reshape(-1), num_classes,
        )
        upd["mask_neg"] = _append(state.mask_neg, neg_rows, neg_valid)
    upd["ar_sum"] = state.ar_sum + chunk.average_recall
    upd["n_images"] = state.n_images + 1
    hd = chunk.det.coxy_dropped.astype(jnp.int32)
    if chunk.rpn is not None and state.rpn_neg is not None:
        hd = hd + jnp.sum(chunk.rpn.pos_dropped).astype(jnp.int32)
    if chunk.mask is not None and state.mask_pos is not None:
        hd = hd + chunk.mask.dropped.astype(jnp.int32)
    upd["harvest_dropped"] = state.harvest_dropped + hd
    return state._replace(**upd)


def shuffle_split(key: jax.Array, pool: Pool, iterations: int, batch_size: int,
                  class_keys=None):
    """Negative pool -> shuffled [C, I, B, d] batches + validity, on device
    (``py_od_utils.shuffle_negatives`` semantics).

    ``class_keys``: optional per-class keys [C] — callers that slice class
    windows out of a wider pool pass keys derived from ABSOLUTE class
    indices, so the shuffle is invariant to the window boundaries
    (single-chip == multi-chip streams; round-3 advisor finding)."""
    c, cap, d = pool.rows.shape
    take = iterations * batch_size

    def per_class(k, rows, count):
        pri = jax.random.uniform(k, (cap,)) + (jnp.arange(cap) >= count) * 1e9
        order = jnp.argsort(pri)
        idx = order[jnp.minimum(jnp.arange(take), cap - 1)]
        valid = jnp.arange(take) < jnp.minimum(count, take)
        return rows[idx].reshape(iterations, batch_size, d), valid.reshape(
            iterations, batch_size
        )

    keys = class_keys if class_keys is not None else jax.random.split(key, c)
    return jax.vmap(per_class)(keys, pool.rows, pool.counts)


def interleave_split(pool: Pool, iterations: int, batch_size: int):
    """Round-robin deal of the arrival-order pool across batches — the
    SHUFFLE_NEGATIVES=False device analog of the reference's per-image
    round-robin filling (``rpn_getProposals.py:290-340``): every batch mixes
    rows from across the whole image stream. (The host accumulator keeps the
    exact per-image semantics; HBM reservoirs do not retain image
    boundaries, so a stride interleave is the on-device equivalent.)"""
    c, cap, d = pool.rows.shape
    b_idx = jnp.arange(iterations)[:, None]
    s_idx = jnp.arange(batch_size)[None, :]
    idx = (s_idx * iterations + b_idx).reshape(-1)  # batch b slot s <- s*I + b
    rows = pool.rows[:, jnp.minimum(idx, cap - 1)].reshape(
        c, iterations, batch_size, d
    )
    limit = jnp.minimum(pool.counts, cap)[:, None]
    valid = (idx[None] < limit).reshape(c, iterations, batch_size)
    return rows, valid


def arrival_split(pool: Pool, iterations: int, batch_size: int):
    """Arrival-order split (segmentation pools, SEGMENTATION.BATCH_SIZE)."""
    c, cap, d = pool.rows.shape
    take = iterations * batch_size
    idx = jnp.minimum(jnp.arange(take), cap - 1)
    rows = pool.rows[:, idx].reshape(c, iterations, batch_size, d)
    valid = (jnp.arange(take)[None] < pool.counts[:, None]).reshape(
        c, iterations, batch_size
    )
    return rows, valid


def device_feature_stats_pool(
    key: jax.Array,
    pos: Pool,
    neg: Pool,
    num_samples: int = 4000,
    pos_fraction: float = 0.8,
) -> FeatureStats:
    """``device_feature_stats`` sampling straight from the negative POOL
    (arrival order) instead of the batched split — lets the stats run before
    any [C, I, B, d] split is materialized (the chunked-training path)."""
    from online_detection_tpu.engine.harvest import masked_sample

    c = pos.rows.shape[0]
    take_pos = math.ceil((num_samples / c) * pos_fraction)
    take_neg = math.ceil((num_samples / c) * (1 - pos_fraction))
    kp, kn = jax.random.split(key)

    def sample_cls(k, rows, count, take):
        idx, valid = masked_sample(
            k, jnp.arange(rows.shape[0]) < count, take
        )
        return rows[idx], valid

    p_rows, p_valid = jax.vmap(
        lambda k, r, ct: sample_cls(k, r, ct, take_pos)
    )(jax.random.split(kp, c), pos.rows, pos.counts)
    n_rows, n_valid = jax.vmap(
        lambda k, r, ct: sample_cls(k, r, ct, take_neg)
    )(jax.random.split(kn, c), neg.rows, neg.counts)

    d = pos.rows.shape[-1]
    all_rows = jnp.concatenate(
        [p_rows.reshape(-1, d), n_rows.reshape(-1, d)], axis=0
    )
    all_valid = jnp.concatenate([p_valid.reshape(-1), n_valid.reshape(-1)])
    w = all_valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(all_rows * w[:, None], axis=0) / n
    var = jnp.sum(((all_rows - mean) ** 2) * w[:, None], axis=0) / jnp.maximum(
        n - 1.0, 1.0
    )
    norms = jnp.linalg.norm(all_rows, axis=1)
    mean_norm = jnp.sum(norms * w) / n
    return FeatureStats(mean=mean, std=jnp.sqrt(var), mean_norm=mean_norm)
