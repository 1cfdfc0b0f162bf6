"""On-line segmentation demo + incremental teaching.

Rebuilds ``mrcnn_modified/demo/predictor_online_segmentation.py`` (429 LoC
``OnlineSegmentationDemo``) and the incremental-training hooks
(``DEMO.INCREMENTAL_TRAIN``, ``box_head_getProposals.py:90-99 add_new_class``,
``demo/feature_extractor_online_segmentation_independent_training.py``):

- ``OnlineSegmentationDemo``: end-to-end per-image predictor — preprocess,
  jitted detect, mask pasting, and an overlay renderer (PIL, no cv2).
- ``IncrementalTeacher``: robot-teaching loop — feed (image, gt box, label,
  mask) observations one at a time, ``add_new_class`` to grow the class set,
  ``update_model`` to retrain all on-line modules from the accumulated
  buffers (the on-line analog of the reference's per-image feature batches).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_detection_tpu.data import transforms
from online_detection_tpu.data.evaluation.voc_eval import paste_mask
from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import HarvestConfig, harvest_image
from online_detection_tpu.models.anchors import anchor_visibility, grid_anchors
from online_detection_tpu.models.detector import (
    DetectorConfig,
    OnlineModelSet,
    detect,
)
from online_detection_tpu.pipelines.online_pipeline import (
    OnlineTrainConfig,
    train_online_modules,
)

PALETTE = [
    (255, 99, 71), (60, 179, 113), (65, 105, 225), (255, 215, 0),
    (186, 85, 211), (0, 206, 209), (255, 140, 0), (154, 205, 50),
]


class OnlineSegmentationDemo:
    """Per-image predictor over trained on-line modules."""

    def __init__(
        self,
        params,
        online: OnlineModelSet,
        class_names: Sequence[str],
        canvas_hw: Tuple[int, int] = (608, 800),
        det_cfg: DetectorConfig = DetectorConfig(),
        min_size: int = 600,
        max_size: int = 1333,
        confidence_threshold: float = 0.0,
    ):
        self.params = params
        self.online = online
        self.class_names = list(class_names)
        self.canvas_hw = canvas_hw
        self.det_cfg = det_cfg
        self.min_size = min_size
        self.max_size = max_size
        self.confidence_threshold = confidence_threshold
        ch, cw = canvas_hw
        self.anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))
        # share run_inference's compiled program: it is image-batched, so
        # wrap it at B=1 (same pattern as _jit_harvest_trunk)
        from online_detection_tpu.pipelines.online_pipeline import (
            _jit_detect_batched,
        )

        batched = _jit_detect_batched(det_cfg, online.mask is not None, False)

        def _single(p, o, a, im, sz):
            outs = batched(p, o, a, im[None], sz[None])
            return jax.tree.map(lambda x: x[0], outs)

        self._jit = _single

    def run_on_image(self, rgb: np.ndarray) -> Dict:
        """rgb [H, W, 3] uint8 -> {boxes, scores, labels, class_names,
        masks (full-res uint8)} in original image coordinates."""
        h, w = rgb.shape[:2]
        canvas, scale, (sw, sh) = transforms.preprocess_image_u8(
            rgb, self.canvas_hw, self.min_size, self.max_size
        )
        dets, mask_probs, _, _ = self._jit(
            self.params, self.online, self.anchors, jnp.asarray(canvas),
            jnp.asarray([sw, sh]),
        )
        dets = jax.device_get(dets)
        keep = dets.valid & (dets.scores >= self.confidence_threshold)
        boxes = dets.boxes[keep] / scale
        labels = dets.labels[keep]
        out = {
            "boxes": boxes,
            "scores": dets.scores[keep],
            "labels": labels,
            "class_names": [
                self.class_names[int(l)] if int(l) < len(self.class_names) else str(l)
                for l in labels
            ],
        }
        if mask_probs is not None:
            probs = np.asarray(jax.device_get(mask_probs))[keep]
            out["masks"] = np.stack(
                [paste_mask(m, b, h, w) for m, b in zip(probs, boxes)]
            ) if len(probs) else np.zeros((0, h, w), np.uint8)
        return out

    def overlay(self, rgb: np.ndarray, result: Optional[Dict] = None) -> np.ndarray:
        """Render boxes + masks + labels onto the image (the reference's
        cv2 overlay, PIL-free numpy blend here)."""
        result = result or self.run_on_image(rgb)
        img = rgb.astype(np.float32).copy()
        masks = result.get("masks")
        for i, box in enumerate(result["boxes"]):
            color = np.asarray(PALETTE[i % len(PALETTE)], np.float32)
            if masks is not None and i < len(masks):
                m = masks[i].astype(bool)
                img[m] = 0.5 * img[m] + 0.5 * color
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, img.shape[1] - 1), min(y2, img.shape[0] - 1)
            img[y1 : y1 + 2, x1:x2] = color
            img[y2 - 1 : y2 + 1, x1:x2] = color
            img[y1:y2, x1 : x1 + 2] = color
            img[y1:y2, x2 - 1 : x2 + 1] = color
        return img.astype(np.uint8)


class IncrementalTeacher:
    """Robot-teaching loop with incremental class addition.

    Mirrors the reference's ``DEMO.INCREMENTAL_TRAIN`` machinery: per-image
    feature chunks are retained so ``update_model`` can retrain at any time,
    and ``add_new_class`` extends the label set without re-showing old
    classes (``rpn_getProposals.py:168,250-252``, ``box_head_getProposals.py:90-99``).
    """

    def __init__(
        self,
        params,
        class_names: Optional[List[str]] = None,
        canvas_hw: Tuple[int, int] = (608, 800),
        train_cfg: OnlineTrainConfig = OnlineTrainConfig(num_classes=0, iterations=2, batch_size=500),
        det_cfg: DetectorConfig = DetectorConfig(),
        min_size: int = 600,
        max_size: int = 1333,
        gt_cap: int = 4,
        seed: int = 0,
    ):
        self.params = params
        self.class_names = class_names or ["__background__"]
        self.canvas_hw = canvas_hw
        self.train_cfg = train_cfg
        self.det_cfg = det_cfg
        self.min_size = min_size
        self.max_size = max_size
        self.gt_cap = gt_cap
        self._observations: List[Dict] = []
        self._key = jax.random.key(seed)

    @property
    def num_classes(self) -> int:
        return len(self.class_names) - 1

    def add_new_class(self, name: str) -> int:
        """Register a new object class; returns its 1-based label."""
        self.class_names.append(name)
        return len(self.class_names) - 1

    def observe(self, rgb: np.ndarray, box_xyxy, label: int,
                mask: Optional[np.ndarray] = None):
        """Record one teaching observation (image + GT box [+ mask])."""
        self._observations.append(
            {"rgb": rgb, "box": np.asarray(box_xyxy, np.float32),
             "label": int(label), "mask": mask}
        )

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def update_model(self, output_dir: Optional[str] = None) -> OnlineModelSet:
        """Re-harvest all observations and retrain every on-line module at
        the CURRENT class count."""
        cfg = self.train_cfg._replace(
            num_classes=max(self.num_classes, 1),
            with_segmentation=any(o["mask"] is not None for o in self._observations),
        )
        n = max(len(self._observations), 1)
        npick = int(np.ceil(cfg.batch_size * cfg.iterations / n))
        hcfg = HarvestConfig(
            num_anchor_classes=cfg.num_anchor_classes,
            num_classes=cfg.num_classes,
            negatives_to_pick=npick,
            gt_cap=self.gt_cap,
        )
        ch, cw = self.canvas_hw
        anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))
        acc = HarvestAccumulator(cfg.num_anchor_classes, cfg.num_classes)
        for obs in self._observations:
            canvas, scale, (sw, sh) = transforms.preprocess_image(
                obs["rgb"], self.canvas_hw, self.min_size, self.max_size
            )
            gb = np.zeros((self.gt_cap, 4), np.float32)
            gb[0] = obs["box"] * scale
            gl = np.zeros((self.gt_cap,), np.int32)
            gl[0] = obs["label"]
            gv = np.arange(self.gt_cap) < 1
            gm = None
            if cfg.with_segmentation and obs["mask"] is not None:
                gm = np.zeros((self.gt_cap, ch, cw), np.float32)
                m = obs["mask"]
                ys = np.clip((np.arange(ch) / scale).astype(int), 0, m.shape[0] - 1)
                xs = np.clip((np.arange(cw) / scale).astype(int), 0, m.shape[1] - 1)
                gm[0] = m[np.ix_(ys, xs)]
                gm = jnp.asarray(gm)
            vis = anchor_visibility(np.asarray(anchors), (sw, sh))
            chunk = harvest_image(
                self._next_key(), self.params, None, anchors, jnp.asarray(vis),
                jnp.asarray(canvas), jnp.asarray([sw, sh]), jnp.asarray(gb),
                jnp.asarray(gl), jnp.asarray(gv), gm, hcfg, self.det_cfg,
            )
            acc.add(chunk)
        harvest = acc.finalize(
            rpn_iterations=cfg.iterations, rpn_batch_size=cfg.batch_size,
            det_iterations=cfg.iterations, det_batch_size=cfg.batch_size,
            segm_batch_size=cfg.segm_batch_size,
            with_rpn=cfg.with_rpn, with_mask=cfg.with_segmentation,
            negatives_to_pick=npick,
        )
        return train_online_modules(self._next_key(), harvest, cfg, output_dir)
