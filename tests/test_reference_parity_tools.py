"""Differential parity: the HO-3D -> iCWT converter vs the LITERAL reference
script (``src/ho3d-to-icwt-format.py``), run as-is in a subprocess against a
synthetic HO-3D tree (the script's paths are cwd-relative). Seg inputs are
authored at the native 640x480 so the cv2-vs-PIL resize is the identity and
the binary masks must match EXACTLY; XMLs are compared field-by-field (the
reference hand-writes its XML, so raw text differs only in whitespace)."""

import os
import subprocess
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

REF_SCRIPT = "/root/reference/src/ho3d-to-icwt-format.py"


def _make_ho3d_tree(root, seq="BB10", n_frames=3):
    from PIL import Image

    rng = np.random.default_rng(0)
    seq_dir = os.path.join(root, "train", seq)
    os.makedirs(os.path.join(seq_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "seg"), exist_ok=True)
    for i in range(n_frames):
        name = f"{i:04d}"
        rgb = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(os.path.join(seq_dir, "rgb", name + ".png"))
        seg = np.zeros((480, 640, 3), np.uint8)
        if i < n_frames - 1:  # last frame: object invisible
            y0, x0 = 100 + 30 * i, 200 + 40 * i
            seg[y0:y0 + 80, x0:x0 + 60, 2] = 200  # blue in RGB channel order
            # noise below threshold elsewhere
            seg[..., 2] = np.maximum(seg[..., 2], 20)
        Image.fromarray(seg).save(os.path.join(seq_dir, "seg", name + ".png"))


def _xml_fields(path):
    r = ET.parse(path).getroot()
    objs = []
    for o in r.findall("object"):
        bb = o.find("bndbox")
        objs.append((
            o.find("name").text,
            bb.find("xmin").text, bb.find("ymin").text,
            bb.find("xmax").text, bb.find("ymax").text,
        ))
    return (r.find("size/width").text, r.find("size/height").text, objs)


def test_ho3d_converter_matches_reference(tmp_path):
    data_root = tmp_path / "Data" / "datasets" / "HO3D_V2"
    _make_ho3d_tree(str(data_root))

    # the reference script resolves everything against cwd/../Data
    workdir = tmp_path / "src"
    workdir.mkdir()
    res = subprocess.run(
        [sys.executable, REF_SCRIPT], cwd=str(workdir),
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    ref_out = tmp_path / "Data" / "datasets" / "HO3D_V2_iCWT_format" / "train"
    assert (ref_out / "Masks" / "BB10").is_dir()

    from online_detection_tpu.data.ho3d_to_icwt import convert

    mine_out = tmp_path / "mine"
    convert(str(data_root / "train"), str(mine_out))

    from PIL import Image

    names = sorted(
        f[:-4] for f in os.listdir(ref_out / "Masks" / "BB10") if f.endswith(".png")
    )
    assert len(names) == 3
    for name in names:
        ref_mask = np.asarray(
            Image.open(ref_out / "Masks" / "BB10" / (name + ".png")).convert("L")
        )
        my_mask = np.asarray(
            Image.open(
                mine_out / "train" / "Masks" / "BB10" / (name + ".png")
            ).convert("L")
        )
        np.testing.assert_array_equal(
            my_mask > 0, ref_mask > 0, err_msg=f"mask {name}"
        )
        ref_x = _xml_fields(str(ref_out / "Annotations" / "BB10" / (name + ".xml")))
        my_x = _xml_fields(
            str(mine_out / "train" / "Annotations" / "BB10" / (name + ".xml"))
        )
        assert my_x == ref_x, f"xml {name}: {my_x} != {ref_x}"
        # RGB frames copied verbatim on both sides
        assert (ref_out / "Images" / "BB10" / (name + ".png")).exists()
        assert (mine_out / "train" / "Images" / "BB10" / (name + ".png")).exists()