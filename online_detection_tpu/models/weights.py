"""Checkpoint conversion: Detectron/Caffe2 pkl and maskrcnn-benchmark pth
-> this framework's parameter tree.

The contract weights are ``catalog://Caffe2Detectron/COCO/35858791/
e2e_mask_rcnn_R-50-C4_1x`` (``config_feature_extraction_online_rpn_det_segm_
ycbv.yaml:4``) or iCWT feature-task ``.pth`` checkpoints
(``config_detector_icwt30.yaml:4``) loaded by ``DetectronCheckpointer``
(SURVEY.md §5 checkpoint/resume). SURVEY.md flags this converter as the
highest silent-wrongness risk — hence the dedicated layout tests in
tests/test_weights.py.

Layout conventions handled here:
- Caffe2 conv blobs are [O, I, kh, kw] -> HWIO transpose (2, 3, 1, 0).
- Caffe2 FC blobs are [O, I] -> [I, O].
- Caffe2 BN blobs are pre-folded affine (_s, _b).
- torch FrozenBatchNorm2d keeps weight/bias/running_mean/running_var;
  folding uses scale = weight / sqrt(running_var) (maskrcnn-benchmark's
  FrozenBatchNorm2d applies no eps), bias' = bias - running_mean * scale.
- torch ConvTranspose2d weights are [I, O, kh, kw] -> (2, 3, 0, 1).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

R50_STAGE_BLOCKS = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}


def _conv_c2(w):  # [O,I,kh,kw] -> [kh,kw,I,O]
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _fc_c2(w):  # [O,I] -> [I,O]
    return jnp.asarray(np.transpose(w))


def load_caffe2_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items() if not k.endswith("_momentum")}


def params_from_caffe2(blobs: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Detectron blob names -> our schema (see resnet.init_resnet50_params,
    rpn.init_rpn_params, heads.init_mask_head_params)."""

    def conv_bn(prefix_w, prefix_bn):
        return {
            "w": _conv_c2(blobs[prefix_w + "_w"]),
            "scale": jnp.asarray(blobs[prefix_bn + "_s"]),
            "bias": jnp.asarray(blobs[prefix_bn + "_b"]),
        }

    backbone: Dict[str, Any] = {
        "stem": conv_bn("conv1", "res_conv1_bn"),
    }
    for stage, n_blocks in R50_STAGE_BLOCKS.items():
        sid = stage[3]  # '2'..'5'
        blocks = []
        for b in range(n_blocks):
            p = {}
            for br in ("branch2a", "branch2b", "branch2c"):
                base = f"res{sid}_{b}_{br}"
                p[br] = conv_bn(base, base + "_bn")
            b1 = f"res{sid}_{b}_branch1"
            if b1 + "_w" in blobs:
                p["branch1"] = conv_bn(b1, b1 + "_bn")
            blocks.append(p)
        backbone[stage] = blocks

    rpn = {
        "conv_w": _conv_c2(blobs["conv_rpn_w"]),
        "conv_b": jnp.asarray(blobs["conv_rpn_b"]),
        "cls_w": _conv_c2(blobs["rpn_cls_logits_w"])[0, 0],  # 1x1 -> [I,A]
        "cls_b": jnp.asarray(blobs["rpn_cls_logits_b"]),
        "bbox_w": _conv_c2(blobs["rpn_bbox_pred_w"])[0, 0],
        "bbox_b": jnp.asarray(blobs["rpn_bbox_pred_b"]),
    }

    mask_head = {}
    if "conv5_mask_w" in blobs:
        # Caffe2 deconv blobs are [I, O, kh, kw]
        mask_head = {
            "w": jnp.asarray(np.transpose(blobs["conv5_mask_w"], (2, 3, 0, 1))),
            "b": jnp.asarray(blobs["conv5_mask_b"]),
            "logits_w": _conv_c2(blobs["mask_fcn_logits_w"])[0, 0],
            "logits_b": jnp.asarray(blobs["mask_fcn_logits_b"]),
        }

    params = {"backbone": backbone, "rpn": rpn, "mask_head": mask_head}
    # stock box-head predictor (baselines / pretrained inference)
    if "cls_score_w" in blobs:
        params["box_predictor"] = {
            "cls_w": _fc_c2(blobs["cls_score_w"]),
            "cls_b": jnp.asarray(blobs["cls_score_b"]),
            "bbox_w": _fc_c2(blobs["bbox_pred_w"]),
            "bbox_b": jnp.asarray(blobs["bbox_pred_b"]),
        }
    return params


def params_from_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """maskrcnn-benchmark .pth checkpoints (torch state_dict with
    ``backbone.body.*`` / ``rpn.head.*`` / ``roi_heads.*`` names)."""

    def t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    def conv_t(x):  # [O,I,kh,kw] -> HWIO
        return jnp.asarray(np.transpose(t(x), (2, 3, 1, 0)))

    def frozen_bn(prefix):
        w = t(sd[prefix + ".weight"]).astype(np.float64)
        b = t(sd[prefix + ".bias"]).astype(np.float64)
        rm = t(sd[prefix + ".running_mean"]).astype(np.float64)
        rv = t(sd[prefix + ".running_var"]).astype(np.float64)
        scale = w / np.sqrt(rv)  # FrozenBatchNorm2d: no eps
        return (
            jnp.asarray(scale.astype(np.float32)),
            jnp.asarray((b - rm * scale).astype(np.float32)),
        )

    def conv_bn(conv_key, bn_key):
        s, b = frozen_bn(bn_key)
        return {"w": conv_t(sd[conv_key + ".weight"]), "scale": s, "bias": b}

    backbone: Dict[str, Any] = {
        "stem": conv_bn("backbone.body.stem.conv1", "backbone.body.stem.bn1")
    }
    stage_prefix = {
        "res2": "backbone.body.layer1",
        "res3": "backbone.body.layer2",
        "res4": "backbone.body.layer3",
        # C4 arch: res5 lives in the box head feature extractor
        "res5": "roi_heads.box.feature_extractor.head.layer4",
    }
    for stage, n_blocks in R50_STAGE_BLOCKS.items():
        pre = stage_prefix[stage]
        blocks = []
        for i in range(n_blocks):
            p = {
                "branch2a": conv_bn(f"{pre}.{i}.conv1", f"{pre}.{i}.bn1"),
                "branch2b": conv_bn(f"{pre}.{i}.conv2", f"{pre}.{i}.bn2"),
                "branch2c": conv_bn(f"{pre}.{i}.conv3", f"{pre}.{i}.bn3"),
            }
            if f"{pre}.{i}.downsample.0.weight" in sd:
                p["branch1"] = conv_bn(
                    f"{pre}.{i}.downsample.0", f"{pre}.{i}.downsample.1"
                )
            blocks.append(p)
        backbone[stage] = blocks

    rpn = {
        "conv_w": conv_t(sd["rpn.head.conv.weight"]),
        "conv_b": jnp.asarray(t(sd["rpn.head.conv.bias"])),
        "cls_w": conv_t(sd["rpn.head.cls_logits.weight"])[0, 0],
        "cls_b": jnp.asarray(t(sd["rpn.head.cls_logits.bias"])),
        "bbox_w": conv_t(sd["rpn.head.bbox_pred.weight"])[0, 0],
        "bbox_b": jnp.asarray(t(sd["rpn.head.bbox_pred.bias"])),
    }

    mask_head = {}
    if "roi_heads.mask.predictor.conv5_mask.weight" in sd:
        mask_head = {
            "w": jnp.asarray(
                np.transpose(t(sd["roi_heads.mask.predictor.conv5_mask.weight"]), (2, 3, 0, 1))
            ),
            "b": jnp.asarray(t(sd["roi_heads.mask.predictor.conv5_mask.bias"])),
            "logits_w": conv_t(sd["roi_heads.mask.predictor.mask_fcn_logits.weight"])[0, 0],
            "logits_b": jnp.asarray(t(sd["roi_heads.mask.predictor.mask_fcn_logits.bias"])),
        }

    params = {"backbone": backbone, "rpn": rpn, "mask_head": mask_head}
    if "roi_heads.box.predictor.cls_score.weight" in sd:
        params["box_predictor"] = {
            "cls_w": jnp.asarray(t(sd["roi_heads.box.predictor.cls_score.weight"]).T),
            "cls_b": jnp.asarray(t(sd["roi_heads.box.predictor.cls_score.bias"])),
            "bbox_w": jnp.asarray(t(sd["roi_heads.box.predictor.bbox_pred.weight"]).T),
            "bbox_b": jnp.asarray(t(sd["roi_heads.box.predictor.bbox_pred.bias"])),
        }
    return params


def export_caffe2_blobs(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_caffe2`: our parameter tree -> Detectron
    blob names/layouts. Exists for the converter SELFTEST
    (``experiments/weights_smoke.py --selftest``): export random-init params
    to both checkpoint formats, reload through both converters, and assert
    identical activation checksums — the whole layout/folding procedure is
    exercised with no real checkpoint in the sandbox (docs/REAL_ASSETS.md)."""

    def inv_conv(w):  # HWIO -> [O,I,kh,kw]
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    def put_conv_bn(blobs, prefix_w, prefix_bn, p):
        blobs[prefix_w + "_w"] = inv_conv(p["w"])
        blobs[prefix_bn + "_s"] = np.asarray(p["scale"])
        blobs[prefix_bn + "_b"] = np.asarray(p["bias"])

    blobs: Dict[str, np.ndarray] = {}
    bb = params["backbone"]
    put_conv_bn(blobs, "conv1", "res_conv1_bn", bb["stem"])
    for stage, n_blocks in R50_STAGE_BLOCKS.items():
        sid = stage[3]
        for b in range(n_blocks):
            blk = bb[stage][b]
            for br in ("branch2a", "branch2b", "branch2c"):
                base = f"res{sid}_{b}_{br}"
                put_conv_bn(blobs, base, base + "_bn", blk[br])
            if "branch1" in blk:
                b1 = f"res{sid}_{b}_branch1"
                put_conv_bn(blobs, b1, b1 + "_bn", blk["branch1"])

    rpn = params["rpn"]
    blobs["conv_rpn_w"] = inv_conv(rpn["conv_w"])
    blobs["conv_rpn_b"] = np.asarray(rpn["conv_b"])
    # our 1x1 heads are [I, A]; Caffe2 stores [A, I, 1, 1]
    blobs["rpn_cls_logits_w"] = np.asarray(rpn["cls_w"]).T[:, :, None, None]
    blobs["rpn_cls_logits_b"] = np.asarray(rpn["cls_b"])
    blobs["rpn_bbox_pred_w"] = np.asarray(rpn["bbox_w"]).T[:, :, None, None]
    blobs["rpn_bbox_pred_b"] = np.asarray(rpn["bbox_b"])

    if params.get("mask_head"):
        mh = params["mask_head"]
        # ours [kh, kw, I, O]; Caffe2 deconv blob [I, O, kh, kw]
        blobs["conv5_mask_w"] = np.transpose(np.asarray(mh["w"]), (2, 3, 0, 1))
        blobs["conv5_mask_b"] = np.asarray(mh["b"])
        blobs["mask_fcn_logits_w"] = (
            np.asarray(mh["logits_w"]).T[:, :, None, None]
        )
        blobs["mask_fcn_logits_b"] = np.asarray(mh["logits_b"])

    if params.get("box_predictor"):
        bp = params["box_predictor"]
        blobs["cls_score_w"] = np.asarray(bp["cls_w"]).T
        blobs["cls_score_b"] = np.asarray(bp["cls_b"])
        blobs["bbox_pred_w"] = np.asarray(bp["bbox_w"]).T
        blobs["bbox_pred_b"] = np.asarray(bp["bbox_b"])
    return blobs


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_torch_state_dict` (selftest companion of
    :func:`export_caffe2_blobs`). FrozenBatchNorm folding is not uniquely
    invertible; the export picks running_mean=0 / running_var=1 so the
    converter's fold reproduces scale/bias exactly."""

    def inv_conv(w):  # HWIO -> [O,I,kh,kw]
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    def put_conv_bn(sd, conv_key, bn_key, p):
        sd[conv_key + ".weight"] = inv_conv(p["w"])
        n = np.asarray(p["scale"]).shape[0]
        sd[bn_key + ".weight"] = np.asarray(p["scale"])
        sd[bn_key + ".bias"] = np.asarray(p["bias"])
        sd[bn_key + ".running_mean"] = np.zeros((n,), np.float32)
        sd[bn_key + ".running_var"] = np.ones((n,), np.float32)

    sd: Dict[str, np.ndarray] = {}
    bb = params["backbone"]
    put_conv_bn(sd, "backbone.body.stem.conv1", "backbone.body.stem.bn1",
                bb["stem"])
    stage_prefix = {
        "res2": "backbone.body.layer1",
        "res3": "backbone.body.layer2",
        "res4": "backbone.body.layer3",
        "res5": "roi_heads.box.feature_extractor.head.layer4",
    }
    for stage, n_blocks in R50_STAGE_BLOCKS.items():
        pre = stage_prefix[stage]
        for i in range(n_blocks):
            blk = bb[stage][i]
            put_conv_bn(sd, f"{pre}.{i}.conv1", f"{pre}.{i}.bn1", blk["branch2a"])
            put_conv_bn(sd, f"{pre}.{i}.conv2", f"{pre}.{i}.bn2", blk["branch2b"])
            put_conv_bn(sd, f"{pre}.{i}.conv3", f"{pre}.{i}.bn3", blk["branch2c"])
            if "branch1" in blk:
                put_conv_bn(sd, f"{pre}.{i}.downsample.0",
                            f"{pre}.{i}.downsample.1", blk["branch1"])

    rpn = params["rpn"]
    sd["rpn.head.conv.weight"] = inv_conv(rpn["conv_w"])
    sd["rpn.head.conv.bias"] = np.asarray(rpn["conv_b"])
    sd["rpn.head.cls_logits.weight"] = (
        np.asarray(rpn["cls_w"]).T[:, :, None, None]
    )
    sd["rpn.head.cls_logits.bias"] = np.asarray(rpn["cls_b"])
    sd["rpn.head.bbox_pred.weight"] = (
        np.asarray(rpn["bbox_w"]).T[:, :, None, None]
    )
    sd["rpn.head.bbox_pred.bias"] = np.asarray(rpn["bbox_b"])

    if params.get("mask_head"):
        mh = params["mask_head"]
        sd["roi_heads.mask.predictor.conv5_mask.weight"] = (
            np.transpose(np.asarray(mh["w"]), (2, 3, 0, 1))
        )
        sd["roi_heads.mask.predictor.conv5_mask.bias"] = np.asarray(mh["b"])
        sd["roi_heads.mask.predictor.mask_fcn_logits.weight"] = (
            np.asarray(mh["logits_w"]).T[:, :, None, None]
        )
        sd["roi_heads.mask.predictor.mask_fcn_logits.bias"] = (
            np.asarray(mh["logits_b"])
        )

    if params.get("box_predictor"):
        bp = params["box_predictor"]
        sd["roi_heads.box.predictor.cls_score.weight"] = (
            np.asarray(bp["cls_w"]).T
        )
        sd["roi_heads.box.predictor.cls_score.bias"] = np.asarray(bp["cls_b"])
        sd["roi_heads.box.predictor.bbox_pred.weight"] = (
            np.asarray(bp["bbox_w"]).T
        )
        sd["roi_heads.box.predictor.bbox_pred.bias"] = np.asarray(bp["bbox_b"])
    return sd


def activation_checksums(params: Dict[str, Any], seed: int = 0,
                         hw=(128, 160)) -> Dict[str, Dict[str, float]]:
    """Per-stage activation statistics on a fixed synthetic image — the
    real-weights smoke validation for the converter (run via
    ``experiments/weights_smoke.py --weights <ckpt>``). Two checkpoints that
    convert identically produce identical checksums; a layout/folding bug in
    any stage shifts its row. Stages mirror the reference forward
    (``generalized_rcnn.py:34-64``)."""
    import jax

    from online_detection_tpu.models import resnet
    from online_detection_tpu.models.heads import mask_deconv
    from online_detection_tpu.models.rpn import rpn_features, rpn_pretrained
    from online_detection_tpu.ops.roi_align import roi_align

    h, w = hw
    rng = np.random.default_rng(seed)
    image = jnp.asarray(rng.uniform(-120, 120, size=(1, h, w, 3)).astype(np.float32))

    out = {}

    def record(name, x):
        x = np.asarray(jax.device_get(x), np.float64)
        out[name] = {
            "shape": tuple(x.shape),
            "mean": float(x.mean()),
            "std": float(x.std()),
            "absmax": float(np.abs(x).max()),
        }
        return x

    c4 = resnet.backbone_c4(params["backbone"], image)
    record("backbone_c4", c4)
    t = rpn_features(params["rpn"], c4)
    record("rpn_conv", t)
    logits, deltas = rpn_pretrained(params["rpn"], t)
    record("rpn_logits", logits)
    record("rpn_deltas", deltas)
    boxes = jnp.asarray(
        [[0.0, 0.0, w / 2, h / 2], [w / 4, h / 4, w - 1.0, h - 1.0]], jnp.float32
    )
    pooled = roi_align(c4[0], boxes, 14, 14, 1.0 / 16.0)
    record("roi_align_14x14", pooled)
    feats = resnet.res5_head(params["backbone"], pooled)
    record("res5_avgpool_2048", feats)
    if params.get("mask_head"):
        res5map = resnet.res5_feature_map(params["backbone"], pooled)
        record("mask_deconv_256", mask_deconv(params["mask_head"], res5map))
    if params.get("box_predictor"):
        bp = params["box_predictor"]
        record("cls_logits", feats @ bp["cls_w"] + bp["cls_b"])
    return out


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Dispatch on extension: .pkl (Caffe2 Detectron) or .pth (torch)."""
    if path.endswith(".pkl"):
        return params_from_caffe2(load_caffe2_pickle(path))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return params_from_torch_state_dict(sd)
