"""Backbone-feature caching: the "train from features" machinery.

Rebuilds the reference's backbone-feature dump path
(``generalized_rcnn_getProposals.py:56-84``) and the ``*_from_feat`` dataset
variants (``icubworld_from_feat.py``, ``ycb_video_from_feat.py``): the frozen
C4 feature maps are computed once and cached to disk, so the fine-tuning
baseline (``--use_backbone_features``,
``generalized_rcnn_train_from_backbone_features.py``) never re-runs the
backbone.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_detection_tpu.data import transforms
from online_detection_tpu.models import resnet


def dump_backbone_features(
    params,
    dataset,
    out_dir: str,
    canvas_hw: Tuple[int, int],
    min_size: int = 600,
    max_size: int = 1333,
) -> str:
    """Run the frozen backbone over the dataset and cache C4 maps as
    ``features/<image_id>.npy`` (float16 on disk — the consumers re-cast)."""
    feat_dir = os.path.join(out_dir, "features")
    os.makedirs(feat_dir, exist_ok=True)
    jit_bb = jax.jit(
        lambda p, im: resnet.backbone_c4(
            p["backbone"], transforms.normalize_canvas(im)[None]
        )[0]
    )
    meta = {}
    for i in range(len(dataset)):
        anno = dataset.get_annotation(i)
        rgb = dataset.load_image(i)
        canvas, scale, (sw, sh) = transforms.preprocess_image_u8(
            rgb, canvas_hw, min_size, max_size
        )
        c4 = np.asarray(jit_bb(params, jnp.asarray(canvas)), np.float16)
        safe_id = anno.image_id.replace("/", "__")
        np.save(os.path.join(feat_dir, safe_id + ".npy"), c4)
        meta[anno.image_id] = {"scale": scale, "scaled_size": (sw, sh)}
    np.save(os.path.join(feat_dir, "_meta.npy"), meta, allow_pickle=True)
    return feat_dir


class FromFeatDataset:
    """Wraps any dataset, serving cached C4 maps instead of images
    (``iCubWorldDatasetFromFeat`` / ``YCBVideoDatasetFromFeat``)."""

    def __init__(self, base, feat_dir: str):
        self.base = base
        self.feat_dir = feat_dir
        self.meta = np.load(
            os.path.join(feat_dir, "_meta.npy"), allow_pickle=True
        ).item()
        self.classes = base.classes
        self.ids = base.ids

    def __len__(self):
        return len(self.base)

    def get_annotation(self, index):
        return self.base.get_annotation(index)

    def harvest_annotation(self, index):
        fn = getattr(self.base, "harvest_annotation", None)
        return fn(index) if fn else self.base.get_annotation(index)

    def load_masks(self, index, anno=None):
        return self.base.load_masks(index, anno)

    def load_features(self, index) -> Tuple[np.ndarray, float, Tuple[int, int]]:
        anno = self.base.get_annotation(index)
        safe_id = anno.image_id.replace("/", "__")
        c4 = np.load(os.path.join(self.feat_dir, safe_id + ".npy")).astype(
            np.float32
        )
        m = self.meta[anno.image_id]
        return c4, m["scale"], tuple(m["scaled_size"])

    def map_class_id_to_class_name(self, class_id):
        return self.base.map_class_id_to_class_name(class_id)
