"""ResNet-50-C4 architecture tests: shapes, strides, and parity of the
bottleneck/stem math against a torch reimplementation of the Detectron
conventions (frozen BN, stride_in_1x1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from online_detection_tpu.models.resnet import (
    backbone_c4,
    bottleneck,
    init_resnet50_params,
    res5_head,
    stem,
)


def test_backbone_shapes(rng):
    params = init_resnet50_params(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(1, 224, 320, 3)).astype(np.float32))
    feat = backbone_c4(params, x)
    assert feat.shape == (1, 14, 20, 1024)  # stride 16


def test_res5_head_shapes(rng):
    params = init_resnet50_params(jax.random.key(0))
    rois = jnp.asarray(rng.normal(size=(7, 14, 14, 1024)).astype(np.float32))
    feats = res5_head(params, rois)
    assert feats.shape == (7, 2048)


def test_odd_input_sizes(rng):
    """Reference images are resized to min side 600 — arbitrary sizes must
    produce ceil(h/16) x ceil(w/16)-ish maps like torch's padded convs."""
    params = init_resnet50_params(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(1, 600, 801, 3)).astype(np.float32))
    feat = backbone_c4(params, x)
    assert feat.shape[1:3] == (38, 51)


def test_stem_matches_torch(rng):
    torch = pytest.importorskip("torch")
    cout = 8
    w = rng.normal(size=(7, 7, 3, cout)).astype(np.float32)
    scale = rng.normal(size=cout).astype(np.float32)
    bias = rng.normal(size=cout).astype(np.float32)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)

    p = {"w": jnp.asarray(w), "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    got = np.asarray(stem(jnp.asarray(x), p))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tw = torch.from_numpy(w).permute(3, 2, 0, 1)
    out = torch.nn.functional.conv2d(tx, tw, stride=2, padding=3)
    out = out * torch.from_numpy(scale).view(1, -1, 1, 1) + torch.from_numpy(
        bias
    ).view(1, -1, 1, 1)
    out = torch.nn.functional.relu(out)
    out = torch.nn.functional.max_pool2d(out, 3, stride=2, padding=1)
    want = out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_bottleneck_matches_torch(rng):
    torch = pytest.importorskip("torch")
    cin, mid, cout, stride = 16, 8, 32, 2

    def mk(kh, kw, ci, co):
        return {
            "w": rng.normal(size=(kh, kw, ci, co)).astype(np.float32) * 0.1,
            "scale": rng.normal(size=co).astype(np.float32),
            "bias": rng.normal(size=co).astype(np.float32),
        }

    p_np = {
        "branch1": mk(1, 1, cin, cout),
        "branch2a": mk(1, 1, cin, mid),
        "branch2b": mk(3, 3, mid, mid),
        "branch2c": mk(1, 1, mid, cout),
    }
    x = rng.normal(size=(1, 20, 24, cin)).astype(np.float32)
    p = jax.tree.map(jnp.asarray, p_np)
    got = np.asarray(bottleneck(jnp.asarray(x), p, stride))

    def t_convbn(tx, d, stride, relu=True):
        tw = torch.from_numpy(d["w"]).permute(3, 2, 0, 1)
        pad = d["w"].shape[0] // 2
        out = torch.nn.functional.conv2d(tx, tw, stride=stride, padding=pad)
        out = out * torch.from_numpy(d["scale"]).view(1, -1, 1, 1) + torch.from_numpy(
            d["bias"]
        ).view(1, -1, 1, 1)
        return torch.nn.functional.relu(out) if relu else out

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    shortcut = t_convbn(tx, p_np["branch1"], stride, relu=False)
    out = t_convbn(tx, p_np["branch2a"], stride)  # stride_in_1x1
    out = t_convbn(out, p_np["branch2b"], 1)
    out = t_convbn(out, p_np["branch2c"], 1, relu=False)
    want = torch.nn.functional.relu(out + shortcut).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
