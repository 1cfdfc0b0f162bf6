"""Native IO runtime tests: decode/resize/canvas parity with the Python
path, XML parse parity, prefetcher correctness."""

import os

import numpy as np
import pytest

from online_detection_tpu.data import transforms
from online_detection_tpu.utils import native_io
from tests.fixtures import make_synthetic_icwt

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nio") / "ycbv_synth")
    make_synthetic_icwt(root, n_train=4, n_test=1)
    return root


def test_decode_matches_pil(synth):
    from PIL import Image

    path = os.path.join(synth, "Images", "train_0000.jpg")
    want = np.asarray(Image.open(path).convert("RGB"))
    got = native_io.decode_image(path)
    assert got is not None and got.shape == want.shape
    # JPEG decoders may differ by a few LSBs
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0

    mask_path = os.path.join(synth, "Masks", "train_0000.png")
    want_m = np.asarray(Image.open(mask_path).convert("RGB"))
    got_m = native_io.decode_image(mask_path)
    np.testing.assert_array_equal(got_m, want_m)  # PNG is lossless


def test_prepare_canvas_matches_python(synth):
    from PIL import Image

    path = os.path.join(synth, "Images", "train_0001.jpg")
    rgb = np.asarray(Image.open(path).convert("RGB"))
    want, wscale, (wsw, wsh) = transforms.preprocess_image_u8(
        rgb, (128, 192), 128, 320
    )
    got, gscale, (gsw, gsh) = native_io.prepare_canvas(path, (128, 192), 128, 320)
    assert (gsw, gsh) == (wsw, wsh)
    assert abs(gscale - wscale) < 1e-5
    # PIL antialiases downscales; pure bilinear doesn't — on noise images
    # that costs a few intensity units on average (real images agree closer)
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 12.0
    np.testing.assert_array_equal(got[wsh:], want[wsh:])  # zero padding


def test_parse_voc_xml(synth):
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset

    ds = ICubWorldDataset(synth, "Main", "train")
    anno = ds.get_annotation(0)
    out = native_io.parse_voc_xml(
        os.path.join(synth, "Annotations", anno.image_id + ".xml")
    )
    assert out is not None
    w, h, boxes, names, diff = out
    assert (w, h) == (anno.width, anno.height)
    np.testing.assert_allclose(boxes, anno.boxes)
    assert [ds.class_to_ind[n] for n in names] == anno.labels.tolist()
    assert diff.tolist() == anno.difficult.tolist()


def test_prefetcher(synth):
    paths = [
        os.path.join(synth, "Images", f"train_{i:04d}.jpg") for i in range(4)
    ]
    pf = native_io.Prefetcher(paths, (128, 192), 128, 320, n_threads=2, window=2)
    # out-of-order access exercises the ready/space conditions
    for idx in (2, 0, 3, 1):
        canvas, scale, (sw, sh) = pf.get(idx)
        assert canvas.shape == (128, 192, 3)
        assert canvas[:sh, :sw].any()
    pf.close()


def test_canvas_loader_native_matches_sync(tmp_path):
    """data/loader.CanvasLoader: the native prefetch path and the PIL
    fallback produce identical canvases/scales for the same dataset."""
    from online_detection_tpu.data import transforms
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.data.loader import CanvasLoader
    from tests.fixtures import make_synthetic_icwt

    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=3, n_test=1)
    ds = ICubWorldDataset(root, "Main", "train")
    with CanvasLoader(ds, (128, 192), 128, 320) as loader:
        for i in range(len(ds)):
            canvas, scale, (sw, sh) = loader.get(i)
            ref_c, ref_s, (rw, rh) = transforms.preprocess_image_u8(
                ds.load_image(i), (128, 192), 128, 320
            )
            assert (sw, sh) == (rw, rh)
            assert abs(scale - ref_s) < 1e-5
            # PIL antialiases downscales; pure bilinear doesn't — same
            # tolerance as test_prepare_canvas_matches_python
            diff = np.abs(canvas.astype(np.int16) - ref_c.astype(np.int16))
            assert float(diff.mean()) < 12.0, float(diff.mean())
