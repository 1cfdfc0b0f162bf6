"""SGD baseline trainers: full training and fine-tuning of Mask R-CNN.

TPU-native counterpart of ``TrainerFeatureTask`` +
``mrcnn_modified/engine/trainer.py:46-261`` (used only by the comparison
baselines ``run_experiment_full_train.py`` / ``run_experiment_fine_tuning.py``
— the on-line pipeline is gradient-free):

- SGD + momentum 0.9, weight decay, warmup multi-step LR (``solver``),
- output layers re-initialized for NUM_CLASSES+1 and freeze groups per the
  fine-tune flags (backbone / RPN-except-logits / heads-except-predictor,
  ``train_feature_task.py:109-144``),
- time-budgeted training (``--train_for_time XXh:YYm:ZZs``,
  ``trainer.py:135-190``).

The train step is a single jitted program per canvas; freezing is a gradient
mask (TPU-friendly: no parameter surgery inside jit).
"""

from __future__ import annotations

import functools
import re
import time
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_detection_tpu.engine import losses
from online_detection_tpu.engine.harvest import project_mask_on_box
from online_detection_tpu.models import resnet
from online_detection_tpu.models.rpn import propose, rpn_features, rpn_pretrained
from online_detection_tpu.models.heads import mask_deconv, mask_pretrained_logits
from online_detection_tpu.ops.roi_align import roi_align


class SGDConfig(NamedTuple):
    base_lr: float = 0.0025
    momentum: float = 0.9
    weight_decay: float = 5e-4
    warmup_iters: int = 500
    warmup_factor: float = 1.0 / 3
    steps: tuple = (48000, 64000)
    gamma: float = 0.1
    max_iter: int = 72000
    freeze_backbone: bool = False
    freeze_rpn_except_logits: bool = False
    freeze_heads_except_predictor: bool = False
    post_nms_train: int = 300
    roi_batch: int = 512


def lr_schedule(cfg: SGDConfig):
    def fn(step):
        warm = jnp.where(
            step < cfg.warmup_iters,
            cfg.warmup_factor
            + (1 - cfg.warmup_factor) * step / jnp.maximum(cfg.warmup_iters, 1),
            1.0,
        )
        decay = cfg.gamma ** jnp.sum(
            jnp.asarray([step >= s for s in cfg.steps], jnp.float32)
        )
        return cfg.base_lr * warm * decay

    return fn


def freeze_mask(params: Dict, cfg: SGDConfig) -> Dict:
    """0/1 multipliers for gradients, per the reference's freeze groups."""

    def path_mask(path_str):
        if cfg.freeze_backbone and re.match(
            r"backbone/(stem|res2|res3|res4)", path_str
        ):
            return 0.0
        if cfg.freeze_rpn_except_logits and path_str.startswith("rpn/conv"):
            return 0.0
        if cfg.freeze_heads_except_predictor and (
            path_str.startswith("backbone/res5") or path_str.startswith("mask_head/w")
            or path_str.startswith("mask_head/b")
        ):
            return 0.0
        return 1.0

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, list):
            return [build(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        return jnp.asarray(path_mask(prefix.rstrip("/")))

    del flat
    return build(params)


def training_loss(
    params: Dict,
    key: jax.Array,
    batch: Dict,
    anchors: jax.Array,
    cfg: SGDConfig,
    with_mask: bool,
):
    """Full Mask R-CNN loss for one image (``batch``: canvas image, true
    size, padded GT boxes/labels/valid/masks)."""
    k_rpn, k_roi, k_prop = jax.random.split(key, 3)
    image_size = batch["image_size"]
    gt_boxes, gt_labels, gt_valid = batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"]

    if "c4" in batch:  # train-from-backbone-features mode
        c4 = batch["c4"][None]
    else:
        from online_detection_tpu.data.transforms import normalize_canvas

        c4 = resnet.backbone_c4(
            params["backbone"], normalize_canvas(batch["image"])[None]
        )
    t = rpn_features(params["rpn"], c4)
    logits, deltas = rpn_pretrained(params["rpn"], t)
    h, w, a = logits.shape[1], logits.shape[2], logits.shape[3]
    flat_logits = logits[0].reshape(h * w * a)
    flat_deltas = deltas[0].reshape(h * w * a, 4)

    loss_rpn = losses.rpn_loss(
        k_rpn, flat_logits, flat_deltas, anchors, batch["visibility"],
        gt_boxes, gt_valid,
    )

    prop_boxes, _, prop_valid = propose(
        jax.lax.stop_gradient(flat_logits), jax.lax.stop_gradient(flat_deltas),
        anchors, image_size, post_nms_top_n=cfg.post_nms_train,
    )
    # append GT to proposals (training-time add_gt_proposals)
    all_boxes = jnp.concatenate([prop_boxes, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    sample = losses.sample_rois(
        k_roi, all_boxes, all_valid, gt_boxes, gt_labels, gt_valid,
        batch_per_image=cfg.roi_batch,
    )

    pooled = roi_align(c4[0], sample.boxes)
    res5 = resnet.res5_feature_map(params["backbone"], pooled)
    feats = jnp.mean(res5, axis=(1, 2))
    bp = params["box_predictor"]
    cls_logits = feats @ bp["cls_w"] + bp["cls_b"]
    box_deltas = feats @ bp["bbox_w"] + bp["bbox_b"]
    loss_box = losses.box_head_loss(cls_logits, box_deltas, sample, gt_boxes)

    total = loss_rpn + loss_box
    if with_mask:
        deconv = mask_deconv(params["mask_head"], res5)
        mask_logits = mask_pretrained_logits(params["mask_head"], deconv)
        gt_m = jax.vmap(
            lambda gi, box: project_mask_on_box(batch["gt_masks"][gi], box, 14)
        )(sample.matched_gt, sample.boxes)
        gt_m = (gt_m >= 0.5).astype(jnp.float32)
        total = total + losses.mask_head_loss(mask_logits, sample, gt_m)
    return total


@functools.lru_cache(maxsize=None)
def make_train_step(cfg: SGDConfig, with_mask: bool):
    """Optimizer + jitted SGD step, cached per static config — anchors are a
    step ARGUMENT (not a closure) so every canvas size reuses one program
    per (cfg, with_mask) and repeated do_train calls never recompile."""
    tx = optax.chain(
        optax.clip_by_global_norm(35.0),  # batch=1 SGD stability guard
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=lr_schedule(cfg), momentum=cfg.momentum),
    )

    @jax.jit
    def step(params, opt_state, grad_mask, key, batch, anchors):
        loss, grads = jax.value_and_grad(
            lambda p: training_loss(p, key, batch, anchors, cfg, with_mask)
        )(params)
        grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        # frozen groups must not move through weight decay either
        updates = jax.tree.map(lambda u, m: u * m, updates, grad_mask)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step


def parse_time_budget(spec: Optional[str]) -> Optional[float]:
    """"XXh:YYm:ZZs" -> seconds (``run_experiment_fine_tuning.py:19``)."""
    if not spec:
        return None
    m = re.match(r"(\d+)h:(\d+)m:(\d+)s", spec)
    if not m:
        raise ValueError(f"bad --train_for_time spec: {spec}")
    hh, mm, ss = map(int, m.groups())
    return hh * 3600 + mm * 60 + ss


def do_train(
    params: Dict,
    dataset,
    canvas_hw,
    cfg: SGDConfig,
    key: jax.Array,
    with_mask: bool = False,
    time_budget: Optional[float] = None,
    min_size: int = 600,
    max_size: int = 1333,
    gt_cap: int = 20,
    log_every: int = 20,
    checkpoint_period: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    val_fn=None,
    val_period: Optional[int] = None,
    flip_prob: float = 0.0,
):
    """The SGD loop (batch=1/image like the reference's configs).

    ``flip_prob``: training-time horizontal flip probability
    (``INPUT.HORIZONTAL_FLIP_PROB_TRAIN``, yacs default 0.5; the shipped
    experiment configs set 0.0). Skipped in train-from-features mode, like
    the reference's cached-feature path.
    """
    from online_detection_tpu.data import transforms
    from online_detection_tpu.models.anchors import anchor_visibility, grid_anchors

    ch, cw = canvas_hw
    anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))
    # freeze flags act only through the gradient MASK (a step argument) and
    # max_iter only through the host loop: drop both from the jit cache key
    # so fine-tune/short-run variants share the full-train program
    tx, step_fn = make_train_step(
        cfg._replace(
            freeze_backbone=False,
            freeze_rpn_except_logits=False,
            freeze_heads_except_predictor=False,
            max_iter=0,
        ),
        with_mask,
    )
    opt_state = tx.init(params)
    gmask = freeze_mask(params, cfg)

    from online_detection_tpu.utils.telemetry import (
        MetricLogger,
        setup_logger,
        teardown_logger,
    )

    # fresh handlers per run: a previous do_train in this process would
    # otherwise keep logging into ITS checkpoint_dir (setup_logger
    # early-returns when handlers exist)
    teardown_logger("online_detection_tpu.trainer")
    logger = setup_logger("online_detection_tpu.trainer", checkpoint_dir)
    meters = MetricLogger()
    logger.info(
        "start SGD: %d iters over %d images (budget %s)",
        cfg.max_iter, len(dataset), time_budget,
    )
    n = len(dataset)
    host_rng = np.random.default_rng(0)
    order = host_rng.permutation(n)
    t0 = time.time()
    losses_hist = []
    from_feat = hasattr(dataset, "load_features")
    t_iter = time.time()
    for it in range(cfg.max_iter):
        i = int(order[it % n])
        anno = dataset.get_annotation(i)
        do_flip = False
        if from_feat:  # train-from-backbone-features mode
            c4, scale, (sw, sh) = dataset.load_features(i)
            batch = {"c4": jnp.asarray(c4)}
        else:
            rgb = dataset.load_image(i)
            canvas, scale, (sw, sh) = transforms.preprocess_image(
                rgb, canvas_hw, min_size, max_size
            )
            do_flip = flip_prob > 0 and host_rng.random() < flip_prob
            if do_flip:  # mirror the CONTENT region, not the padding
                canvas[:sh, :sw] = canvas[:sh, :sw, :][:, ::-1]
            batch = {"image": jnp.asarray(canvas)}
        boxes = transforms.scale_boxes(anno.boxes, scale)
        if do_flip and len(boxes):
            flipped = boxes.copy()
            flipped[:, 0] = sw - 1 - boxes[:, 2]
            flipped[:, 2] = sw - 1 - boxes[:, 0]
            boxes = flipped
        g = len(boxes)
        gb = np.zeros((gt_cap, 4), np.float32)
        gb[:g] = boxes[:gt_cap]
        gl = np.zeros((gt_cap,), np.int32)
        gl[:g] = anno.labels[:gt_cap]
        gv = np.arange(gt_cap) < g
        batch.update({
            "image_size": jnp.asarray([sw, sh]),
            "gt_boxes": jnp.asarray(gb),
            "gt_labels": jnp.asarray(gl),
            "gt_valid": jnp.asarray(gv),
            "visibility": jnp.asarray(
                anchor_visibility(np.asarray(anchors), (sw, sh))
            ),
        })
        if with_mask:
            masks = dataset.load_masks(i, anno)
            gm = np.zeros((gt_cap, ch, cw), np.float32)
            for j in range(min(g, gt_cap)):
                ys = np.clip((np.arange(ch) / scale).astype(int), 0, masks.shape[1] - 1)
                xs = np.clip((np.arange(cw) / scale).astype(int), 0, masks.shape[2] - 1)
                gm[j] = masks[j][np.ix_(ys, xs)]
            if do_flip:
                gm[:, :sh, :sw] = gm[:, :sh, :sw][:, :, ::-1]
            batch["gt_masks"] = jnp.asarray(gm)

        params, opt_state, loss = step_fn(
            params, opt_state, gmask, jax.random.fold_in(key, it), batch,
            anchors,
        )
        losses_hist.append(float(loss))
        # reference MetricLogger line: ETA + smoothed loss + peak device mem
        # (``engine/trainer.py:116-133``)
        meters.update(time=time.time() - t_iter, loss=float(loss))
        t_iter = time.time()
        if it % log_every == 0:
            logger.info(meters.log_line(it, cfg.max_iter))
        # periodic checkpoints (``checkpointer.save("model_{:07d}")``,
        # ``trainer.py:194-195``) and validation (``trainer.py:196-230``)
        if checkpoint_period and checkpoint_dir and it > 0 and it % checkpoint_period == 0:
            import os, pickle

            os.makedirs(checkpoint_dir, exist_ok=True)
            with open(
                os.path.join(checkpoint_dir, f"model_{it:07d}.pkl"), "wb"
            ) as f:
                pickle.dump(jax.device_get(params), f)
        if val_fn and val_period and it > 0 and it % val_period == 0:
            val_fn(params, it)
        if time_budget is not None and time.time() - t0 > time_budget:
            logger.info("time budget reached at iter %d", it)
            break
    logger.info("done: %d iters in %.1fs", len(losses_hist), time.time() - t0)
    teardown_logger("online_detection_tpu.trainer")
    return params, losses_hist
