"""Differential parity of the fused INFERENCE heads against the literal
reference modules.

The reference's production inference path packs all per-anchor / per-class
FALKON classifiers into one ``kernel.mmv`` and all RLS refiners into one
block-diagonal matmul:

- ``rpn.py`` OnlineRPNHead (``compute_objectness_FALKON[_parallel]``,
  ``refine_boxes[_parallel]``) vs ``models/rpn.rpn_features`` +
  ``models/rpn.rpn_online``;
- ``roi_box_predictors.py`` FastRCNNPredictor
  (``predict_clss_FALKON[_parallel]``, ``refine_boxes[_parallel]``) vs
  ``models/heads.box_predict``;
- ``roi_mask_predictors.py`` MaskRCNNC4Predictor (REAL torch ConvTranspose2d
  conv5_mask + ``predict_pixel_FALKON[_parallel]`` with its interleaving
  reshape) vs ``models/heads.mask_deconv`` + ``models/heads.mask_predict``.

Both sides see identical synthetic features, classifier parameters (Nystrom
centers/alphas of VARYING per-class M, with missing classes), RLS models
(with missing classes) and z-score statistics. The falkon ``kernel.mmv`` on
the torch side is a stub implementing the documented Gaussian-kernel
contract (tests/ref_shims.py: StubGaussianKernel) — the packing /
normalization / background / reshape logic under test is the reference's
literal code. Each test also runs the reference's SEQUENTIAL path and
asserts it agrees with its parallel path, so the comparison pins all three
implementations to the same numbers.

Our side represents variable per-class M by zero-padding centers+alphas to a
common M (a zero alpha contributes exactly 0 to the score) — these tests are
the proof that the padding is exact.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from online_detection_tpu.models.heads import (
    OnlineDetectorModels,
    OnlineMaskModels,
    box_predict,
    mask_deconv,
    mask_predict,
)
from online_detection_tpu.models.rpn import OnlineRPNModels, rpn_features, rpn_online
from online_detection_tpu.solvers.falkon import FalkonModel
from online_detection_tpu.solvers.rls import RLSModel
from online_detection_tpu.utils.stats import FeatureStats
from tests.ref_shims import (
    RefCfg,
    StubFalkonClassifier,
    legacy_torch,
    load_box_predictor_module,
    load_mask_predictor_module,
    load_rpn_inference_module,
)

pytestmark = pytest.mark.fast

SIGMA = 3.0


def _make_classifiers(rng, n_cls, d, sigma=SIGMA, missing=(), ms=None):
    """Torch-side list (with None gaps) + our padded FalkonModel."""
    ms = ms or [4 + 2 * (i % 3) for i in range(n_cls)]
    m_max = max(ms)
    torch_clfs = []
    centers = np.zeros((n_cls, m_max, d), np.float32)
    alpha = np.zeros((n_cls, m_max), np.float32)
    exists = np.zeros((n_cls,), bool)
    for i in range(n_cls):
        if i in missing:
            torch_clfs.append(None)
            continue
        c = rng.standard_normal((ms[i], d)).astype(np.float32)
        a = rng.standard_normal((ms[i],)).astype(np.float32)
        torch_clfs.append(StubFalkonClassifier(c, a, sigma))
        centers[i, : ms[i]] = c
        alpha[i, : ms[i]] = a
        exists[i] = True
    model = FalkonModel(
        jnp.asarray(centers), jnp.asarray(alpha), jnp.asarray(exists), sigma
    )
    return torch_clfs, model


def _make_regressors(rng, n_cls, d, missing=()):
    """Torch-side list of reference dicts + our RLSModel."""
    torch_regs = []
    beta = np.zeros((n_cls, d + 1, 4), np.float32)
    t_inv = np.zeros((n_cls, 4, 4), np.float32)
    mu = np.zeros((n_cls, 4), np.float32)
    exists = np.zeros((n_cls,), bool)
    for j in range(n_cls):
        if j in missing:
            torch_regs.append({"Beta": None})
            continue
        b = rng.standard_normal((d + 1, 4)).astype(np.float32) * 0.1
        ti = (
            np.eye(4, dtype=np.float32)
            + 0.05 * rng.standard_normal((4, 4)).astype(np.float32)
        )
        m = rng.standard_normal((4,)).astype(np.float32)
        torch_regs.append(
            {
                "Beta": {
                    str(k): {"weights": torch.tensor(b[:, k])} for k in range(4)
                },
                "T_inv": torch.tensor(ti),
                "mu": torch.tensor(m.reshape(1, 4)),
            }
        )
        beta[j], t_inv[j], mu[j], exists[j] = b, ti, m, True
    model = RLSModel(
        beta=jnp.asarray(beta),
        t_inv=jnp.asarray(t_inv),
        t=jnp.asarray(t_inv),  # unused by predict
        mu=jnp.asarray(mu),
        exists=jnp.asarray(exists),
        mean_losses=jnp.zeros((n_cls, 4)),
    )
    return torch_regs, model


def _make_stats(rng, d):
    mean = rng.standard_normal((d,)).astype(np.float32)
    mean_norm = float(rng.uniform(5.0, 15.0))
    torch_stats = {
        "mean": torch.tensor(mean),
        "mean_norm": torch.tensor(mean_norm),
        "std": torch.ones(d),
    }
    ours = FeatureStats(
        jnp.asarray(mean), jnp.ones((d,)), jnp.asarray(mean_norm)
    )
    return torch_stats, ours


# --------------------------------------------------------------------------
# On-line RPN head


def test_online_rpn_head_matches_reference():
    mod = load_rpn_inference_module()
    rng = np.random.default_rng(0)
    a_cls, d, h, w = 4, 16, 5, 6
    feat = rng.standard_normal((1, d, h, w)).astype(np.float32)

    torch_clfs, falkon = _make_classifiers(rng, a_cls, d, missing=(1,))
    torch_regs, rls = _make_regressors(rng, a_cls, d, missing=(2,))
    torch_stats, stats = _make_stats(rng, d)

    def run_ref(parallel):
        cfg = RefCfg(INFERENCE=RefCfg(PARALLEL_FALKON=parallel))
        with legacy_torch():
            torch.manual_seed(7)  # same conv init across instances
            head = mod.RPNHead(cfg, in_channels=d, num_anchors=a_cls)
            head.classifiers = torch_clfs
            head.regressors = torch_regs
            head.stats = torch_stats
            logits, bbox = head.forward([torch.tensor(feat)])
        return (
            head,
            logits[0].detach().numpy(),  # [1, A, h, w]
            bbox[0].detach().numpy(),  # [1, 4A, h, w]
        )

    head, ref_logits, ref_bbox = run_ref(parallel=True)
    _, seq_logits, seq_bbox = run_ref(parallel=False)
    # reference self-consistency: fused path == sequential path
    np.testing.assert_allclose(ref_logits, seq_logits, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ref_bbox, seq_bbox, atol=1e-5, rtol=1e-5)

    # ours: same conv weights (torch OIHW -> HWIO), conv + fused online head
    params = {
        "conv_w": jnp.asarray(
            head.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        ),
        "conv_b": jnp.asarray(head.conv.bias.detach().numpy()),
    }
    t = rpn_features(params, jnp.asarray(feat.transpose(0, 2, 3, 1)))
    models = OnlineRPNModels(falkon=falkon, rls=rls, stats=stats)
    scores, deltas = rpn_online(models, t[0])  # [h*w, A], [h*w, A, 4]
    scores = np.asarray(scores).T.reshape(a_cls, h, w)
    np.testing.assert_allclose(scores, ref_logits[0], atol=2e-4, rtol=1e-4)
    deltas = np.asarray(deltas).reshape(h * w, a_cls * 4).T.reshape(-1, h, w)
    np.testing.assert_allclose(deltas, ref_bbox[0], atol=2e-4, rtol=1e-4)
    # missing classifier scores exactly -2 (matrix_to_subtract semantics)
    assert np.all(scores[1] == -2.0)
    # missing regressor refines by exactly zero
    assert np.all(deltas[8:12] == 0.0)


# --------------------------------------------------------------------------
# On-line detection box predictor


@pytest.mark.parametrize("normalize_reg", [False, True])
def test_online_box_predictor_matches_reference(normalize_reg):
    mod = load_box_predictor_module()
    rng = np.random.default_rng(1)
    n_cls, d, r = 3, 32, 17
    feats = rng.standard_normal((r, d)).astype(np.float32)

    torch_clfs, falkon = _make_classifiers(rng, n_cls, d, missing=(2,))
    torch_regs, rls = _make_regressors(rng, n_cls, d, missing=(0,))
    torch_stats, stats = _make_stats(rng, d)

    def run_ref(parallel):
        cfg = RefCfg(
            MODEL=RefCfg(
                ROI_BOX_HEAD=RefCfg(NUM_CLASSES=n_cls + 1),
                CLS_AGNOSTIC_BBOX_REG=False,
            ),
            INFERENCE=RefCfg(PARALLEL_FALKON=parallel),
        )
        with legacy_torch():
            pred = mod.FastRCNNPredictor(cfg, in_channels=d)
            pred.classifiers = torch_clfs
            pred.regressors = np.array(torch_regs)
            pred.stats = torch_stats
            pred.feat_size = d  # read for the None-classifier gap
            pred.normalize_features_regressors = normalize_reg
            scores, bbox = pred.forward(torch.tensor(feats)[:, :, None, None])
        return scores.detach().numpy(), bbox.detach().numpy()

    ref_scores, ref_bbox = run_ref(parallel=True)
    seq_scores, seq_bbox = run_ref(parallel=False)
    # Reference quirk, surfaced by this differential: the detector's
    # PARALLEL path scores a missing classifier 0 — unlike the RPN head
    # (whose matrix_to_subtract maps it to -2, ``rpn.py:205-215``) and
    # unlike its own SEQUENTIAL path (-2, ``roi_box_predictors.py:133-136``).
    # ``roi_box_predictors.py:146-160`` never subtracts for the gap columns.
    # We follow the sequential/-2 semantics (clearly the intended contract:
    # "-2 ... smaller than all the other proposed values"); so assert
    # parallel==sequential on the EXISTING classes only, and ours==sequential
    # everywhere.
    assert np.all(ref_scores[:, 3] == 0.0) and np.all(seq_scores[:, 3] == -2.0)
    present = [0, 1, 2]
    np.testing.assert_allclose(
        ref_scores[:, present], seq_scores[:, present], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(ref_bbox, seq_bbox, atol=1e-5, rtol=1e-5)

    models = OnlineDetectorModels(falkon=falkon, rls=rls, stats=stats)
    scores, deltas = box_predict(
        models, jnp.asarray(feats), normalize_regressor_features=normalize_reg
    )
    np.testing.assert_allclose(
        np.asarray(scores), seq_scores, atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(deltas), seq_bbox, atol=2e-4, rtol=1e-4
    )
    # background column: score -2, deltas 0 (roi_box_predictors.py:131,98)
    assert np.all(np.asarray(scores)[:, 0] == -2.0)
    assert np.all(np.asarray(deltas)[:, :4] == 0.0)
    # missing classifier column -2; missing regressor block zero
    assert np.all(np.asarray(scores)[:, 3] == -2.0)
    assert np.all(np.asarray(deltas)[:, 4:8] == 0.0)


# --------------------------------------------------------------------------
# On-line per-pixel mask predictor


def test_online_mask_predictor_matches_reference():
    mod = load_mask_predictor_module()
    rng = np.random.default_rng(2)
    n_cls, in_ch, mid, r = 3, 8, 6, 4
    x = rng.standard_normal((r, in_ch, 7, 7)).astype(np.float32)

    torch_clfs, falkon = _make_classifiers(rng, n_cls, mid, missing=(1,))
    torch_stats, stats = _make_stats(rng, mid)

    def run_ref(parallel):
        cfg = RefCfg(
            MODEL=RefCfg(
                ROI_BOX_HEAD=RefCfg(NUM_CLASSES=n_cls + 1),
                ROI_MASK_HEAD=RefCfg(CONV_LAYERS=[mid]),
            ),
            INFERENCE=RefCfg(PARALLEL_FALKON=parallel),
        )
        with legacy_torch():
            torch.manual_seed(7)  # same conv5_mask init across instances
            pred = mod.MaskRCNNC4Predictor(cfg, in_channels=in_ch)
            pred.classifiers = torch_clfs
            pred.stats = torch_stats
            pred.feat_size = mid
            out = pred.forward(torch.tensor(x))
        return pred, out.detach().numpy()  # [R, C+1, 14, 14]

    pred, ref_out = run_ref(parallel=True)
    _, seq_out = run_ref(parallel=False)
    # same parallel-path missing-class quirk as the box predictor (scores 0
    # instead of -2, ``roi_mask_predictors.py:72-99``); compare present
    # channels between the two reference paths, ours vs sequential
    assert np.all(ref_out[:, 2] == 0.0) and np.all(seq_out[:, 2] == -2.0)
    present = [0, 1, 3]
    np.testing.assert_allclose(
        ref_out[:, present], seq_out[:, present], atol=1e-5, rtol=1e-5
    )
    ref_out = seq_out

    # ours: REAL conv5_mask weights (torch ConvTranspose2d [in,out,kh,kw] ->
    # our [kh,kw,in,out]), then the fused per-pixel head
    params = {
        "w": jnp.asarray(
            pred.conv5_mask.weight.detach().numpy().transpose(2, 3, 0, 1)
        ),
        "b": jnp.asarray(pred.conv5_mask.bias.detach().numpy()),
    }
    deconv = mask_deconv(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    models = OnlineMaskModels(falkon=falkon, stats=stats)
    out = mask_predict(models, deconv)  # [R, 14, 14, C+1]
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-4)
    # background channel and the missing class channel are exactly -2
    assert np.all(got[:, 0] == -2.0) and np.all(got[:, 2] == -2.0)
