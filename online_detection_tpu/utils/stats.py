"""Feature statistics + z-scoring, matching the reference's quirks exactly.

``computeFeatStatistics_torch`` (``src/py_od_utils.py:59-95``): mean/std over
~4000 rows sampled per class from positives (pos_fraction) and negatives,
plus the mean L2 norm of those rows. ``zScores`` (``:98-102``):
``x <- (x - mean) * (20 / mean_norm)``.

NOTE the reference's ``std`` is computed but NEVER used in normalization —
SURVEY.md §"hard parts" flags this as parity-critical; we keep the same
behavior (std is carried for checkpoint compatibility only).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureStats(NamedTuple):
    mean: jax.Array  # [d]
    std: jax.Array  # [d] — stored, unused by zscore (reference quirk)
    mean_norm: jax.Array  # scalar

    def as_dict(self):
        return {"mean": self.mean, "std": self.std, "mean_norm": self.mean_norm}


def zscore(x: jax.Array, stats: FeatureStats, target_norm: float = 20.0) -> jax.Array:
    """(x - mean) * (target_norm / mean_norm) — ``py_od_utils.zScores``."""
    return (x - stats.mean) * (target_norm / stats.mean_norm)


def compute_feature_stats(
    rng: np.random.Generator,
    positives: jax.Array,  # [C, P, d] masked buffers
    pos_valid: jax.Array,  # [C, P]
    negatives: jax.Array,  # [C, I, B, d]
    neg_valid: jax.Array,  # [C, I, B]
    num_samples: int = 4000,
    pos_fraction: Optional[float] = None,
    index_fn=None,
) -> FeatureStats:
    """Masked-buffer port of ``computeFeatStatistics_torch``.

    Samples ``ceil(num_samples/C * pos_fraction)`` rows per class from the
    valid positives (with replacement, like torch.randint) and
    ``ceil(num_samples/C * (1-pos_fraction) / I)`` rows per (class, batch)
    from valid negatives; classes/batches with no valid rows contribute none.
    Host-side NumPy — this is a one-shot statistic, not a hot path.

    ``index_fn(n, size) -> indices`` overrides the with-replacement sampling;
    the differential parity suite pins it (and the reference's unseeded
    ``torch.randint``) to one deterministic scheme so both sides sample the
    identical rows.
    """
    if index_fn is None:
        index_fn = lambda n, size: rng.integers(0, n, size=size)
    if pos_fraction is None:
        pos_fraction = 0.1
    neg_fraction = 1.0 - pos_fraction

    pos = np.asarray(positives)
    pv = np.asarray(pos_valid)
    neg = np.asarray(negatives)
    nv = np.asarray(neg_valid)
    c = pos.shape[0]
    n_batches = neg.shape[1]

    take_pos = math.ceil((num_samples / c) * pos_fraction)
    take_neg = math.ceil(((num_samples / c) * neg_fraction) / max(n_batches, 1))

    rows = []
    for i in range(c):
        vidx = np.nonzero(pv[i])[0]
        if len(vidx):
            rows.append(pos[i][vidx[np.asarray(index_fn(len(vidx), take_pos))]])
        for j in range(n_batches):
            vj = np.nonzero(nv[i, j])[0]
            if len(vj):
                rows.append(neg[i, j][vj[np.asarray(index_fn(len(vj), take_neg))]])
    sampled = np.concatenate(rows, axis=0)
    norms = np.linalg.norm(sampled, axis=1)
    return FeatureStats(
        mean=jnp.asarray(sampled.mean(0), jnp.float32),
        std=jnp.asarray(sampled.std(0, ddof=1), jnp.float32),
        mean_norm=jnp.asarray(norms.mean(), jnp.float32),
    )


def normalize_coxy(x: jax.Array, stats: FeatureStats) -> jax.Array:
    """``normalize_COXY`` (``py_od_utils.py:105-111``): z-score the X block of
    the regression training set (targets untouched)."""
    return zscore(x, stats)
