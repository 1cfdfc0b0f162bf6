"""On-line model checkpointing with the reference's file-name contract.

The reference persists the on-line modules as plain ``torch.save`` files
named ``classifier_rpn`` / ``regressor_rpn`` / ``stats_rpn`` /
``classifier_detector`` / ``regressor_detector`` / ``stats_detector`` /
``classifier_segmentation`` / ``stats_segmentation``
(``run_experiment_online_rpn_ood_oos.py:117-120,236-239,264-267,281-288``),
plus feature caches named ``{positives,negatives}_cl_{i}_batch_{j}`` and
``reg_{x,c,y}_batch_{i}`` (``extract_features_rpn_detector.py:195-299``).

This framework keeps the SAME file names so experiment save/load flags
behave identically; the payload is an .npz of the flattened pytree
(portable, torch-free).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from online_detection_tpu.models.detector import OnlineModelSet
from online_detection_tpu.models.heads import OnlineDetectorModels, OnlineMaskModels
from online_detection_tpu.models.rpn import OnlineRPNModels
from online_detection_tpu.solvers.falkon import FalkonModel
from online_detection_tpu.solvers.rls import RLSModel
from online_detection_tpu.utils.stats import FeatureStats


def _save_tree(path: str, tree: Any, meta: Optional[Dict] = None):
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    np.savez(path + ".npz", **payload)


def save_falkon(path: str, model: FalkonModel):
    _save_tree(
        path,
        (model.centers, model.alpha, model.exists),
        meta={"sigma": model.sigma},
    )


def load_falkon(path: str) -> FalkonModel:
    data = np.load(path + ".npz")
    return FalkonModel(
        jnp.asarray(data["leaf_0"]),
        jnp.asarray(data["leaf_1"]),
        jnp.asarray(data["leaf_2"]),
        float(data["meta_sigma"]),
    )


def save_rls(path: str, model: RLSModel):
    _save_tree(path, tuple(model))


def load_rls(path: str) -> RLSModel:
    data = np.load(path + ".npz")
    return RLSModel(*[jnp.asarray(data[f"leaf_{i}"]) for i in range(6)])


def save_stats(path: str, stats: FeatureStats):
    _save_tree(path, tuple(stats))


def load_stats(path: str) -> FeatureStats:
    data = np.load(path + ".npz")
    return FeatureStats(*[jnp.asarray(data[f"leaf_{i}"]) for i in range(3)])


def save_online_models(output_dir: str, online: OnlineModelSet):
    """Write the reference's 8 model files (those that exist)."""
    os.makedirs(output_dir, exist_ok=True)
    j = lambda n: os.path.join(output_dir, n)
    if online.rpn is not None:
        save_falkon(j("classifier_rpn"), online.rpn.falkon)
        save_rls(j("regressor_rpn"), online.rpn.rls)
        save_stats(j("stats_rpn"), online.rpn.stats)
    save_falkon(j("classifier_detector"), online.detector.falkon)
    save_rls(j("regressor_detector"), online.detector.rls)
    save_stats(j("stats_detector"), online.detector.stats)
    if online.mask is not None:
        save_falkon(j("classifier_segmentation"), online.mask.falkon)
        save_stats(j("stats_segmentation"), online.mask.stats)


def load_online_models(output_dir: str) -> OnlineModelSet:
    j = lambda n: os.path.join(output_dir, n)
    rpn = None
    if os.path.exists(j("classifier_rpn.npz")):
        rpn = OnlineRPNModels(
            falkon=load_falkon(j("classifier_rpn")),
            rls=load_rls(j("regressor_rpn")),
            stats=load_stats(j("stats_rpn")),
        )
    det = OnlineDetectorModels(
        falkon=load_falkon(j("classifier_detector")),
        rls=load_rls(j("regressor_detector")),
        stats=load_stats(j("stats_detector")),
    )
    mask = None
    if os.path.exists(j("classifier_segmentation.npz")):
        mask = OnlineMaskModels(
            falkon=load_falkon(j("classifier_segmentation")),
            stats=load_stats(j("stats_segmentation")),
        )
    return OnlineModelSet(rpn=rpn, detector=det, mask=mask)


def save_features(output_dir: str, harvest: Dict):
    """Persist harvested feature pools with the reference's cache names."""
    os.makedirs(output_dir, exist_ok=True)

    def save_head(sub: str, head: Dict):
        d = os.path.join(output_dir, sub)
        os.makedirs(d, exist_ok=True)
        pos, pv = head["pos"], head["pos_valid"]
        for c in range(pos.shape[0]):
            np.save(
                os.path.join(d, f"positives_cl_{c}_batch_0.npy"), pos[c][pv[c]]
            )
        neg, nv = head["neg"], head["neg_valid"]
        for c in range(neg.shape[0]):
            for b in range(neg.shape[1]):
                np.save(
                    os.path.join(d, f"negatives_cl_{c}_batch_{b}.npy"),
                    neg[c, b][nv[c, b]],
                )
        if "coxy" in head:
            np.save(os.path.join(d, "reg_x_batch_0.npy"), head["coxy"]["X"])
            np.save(os.path.join(d, "reg_c_batch_0.npy"), head["coxy"]["C"])
            np.save(os.path.join(d, "reg_y_batch_0.npy"), head["coxy"]["Y"])

    if "rpn" in harvest:
        save_head("features_RPN", harvest["rpn"])
    save_head("features_detector", harvest["det"])
    if "mask" in harvest:
        save_head("features_segmentation", harvest["mask"])


def load_features(output_dir: str) -> Dict:
    """Inverse of save_features -> the finalize()-shaped dict."""
    import glob

    out: Dict = {}
    for sub, key in (
        ("features_RPN", "rpn"),
        ("features_detector", "det"),
        ("features_segmentation", "mask"),
    ):
        d = os.path.join(output_dir, sub)
        if not os.path.isdir(d):
            continue
        n_cls = len(glob.glob(os.path.join(d, "positives_cl_*_batch_0.npy")))
        pos_list = [
            np.load(os.path.join(d, f"positives_cl_{c}_batch_0.npy"))
            for c in range(n_cls)
        ]
        neg_list = []
        for c in range(n_cls):
            batches = sorted(
                glob.glob(os.path.join(d, f"negatives_cl_{c}_batch_*.npy"))
            )
            neg_list.append([np.load(b) for b in batches])
        p_cap = max(1, max(len(p) for p in pos_list))
        n_iter = max(1, max(len(n) for n in neg_list))
        b_cap = max(
            [1] + [len(b) for blist in neg_list for b in blist]
        )
        dim = pos_list[0].shape[1] if pos_list[0].size else neg_list[0][0].shape[1]
        pos = np.zeros((n_cls, p_cap, dim), np.float32)
        pv = np.zeros((n_cls, p_cap), bool)
        neg = np.zeros((n_cls, n_iter, b_cap, dim), np.float32)
        nv = np.zeros((n_cls, n_iter, b_cap), bool)
        for c in range(n_cls):
            n = len(pos_list[c])
            pos[c, :n] = pos_list[c]
            pv[c, :n] = True
            for b, rows in enumerate(neg_list[c]):
                neg[c, b, : len(rows)] = rows
                nv[c, b, : len(rows)] = True
        head = {"pos": pos, "pos_valid": pv, "neg": neg, "neg_valid": nv}
        rx = os.path.join(d, "reg_x_batch_0.npy")
        if os.path.exists(rx):
            head["coxy"] = {
                "X": np.load(rx),
                "C": np.load(os.path.join(d, "reg_c_batch_0.npy")),
                "Y": np.load(os.path.join(d, "reg_y_batch_0.npy")),
            }
        out[key] = head
    return out
