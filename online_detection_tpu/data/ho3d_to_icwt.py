"""HO-3D v2 -> iCWT-format converter.

Torch/cv2-free rebuild of the reference's ``src/ho3d-to-icwt-format.py``
(SURVEY.md §2.1 "Data tooling"): for each HO-3D training sequence, derive the
object class from the sequence-name table, binarize the rendered ``seg``
masks (blue channel >= 100 marks the object), resize to 640x480, write the
binary mask PNG, the VOC-style XML (box = mask extents, xmax/ymax exclusive
like the reference's ``max+1``), and copy the RGB frame. Layout:

    <out>/train/{Images,Annotations,Masks}/<seq>/<frame>.{png,xml,png}
    <out>/train/ImageSets/imageset_*.txt  (written by ``write_imagesets``)
"""

from __future__ import annotations

import glob
import os
import shutil
import xml.etree.ElementTree as ET
from typing import Dict, Iterable, Optional

import numpy as np

SEQUENCE_TO_CLASS: Dict[str, str] = {
    **{f"ABF1{i}": "021_bleach_cleanser" for i in range(5)},
    **{f"BB1{i}": "011_banana" for i in range(5)},
    **{f"GPMF1{i}": "010_potted_meat_can" for i in range(5)},
    **{f"GSF1{i}": "037_scissors" for i in range(5)},
    **{f"MC{i}": "003_cracker_box" for i in (1, 2, 4, 5, 6)},
    **{f"MDF1{i}": "035_power_drill" for i in range(5)},
    "ND2": "035_power_drill",
    **{f"SB1{i}": "021_bleach_cleanser" for i in (0, 2, 4)},
    **{f"ShSu1{i}": "004_sugar_box" for i in (0, 2, 3, 4)},
    **{f"SiBF1{i}": "011_banana" for i in range(5)},
    "SiS1": "004_sugar_box",
    **{f"SM{i}": "006_mustard_bottle" for i in (2, 3, 4, 5)},
    "SMu1": "025_mug", "SMu40": "025_mug", "SMu41": "025_mug", "SMu42": "025_mug",
    "SS1": "004_sugar_box", "SS2": "004_sugar_box", "SS3": "004_sugar_box",
}


def _write_xml(path: str, img_name: str, objects):
    root = ET.Element("annotation")
    ET.SubElement(root, "folder").text = "Images"
    ET.SubElement(root, "filename").text = img_name
    src = ET.SubElement(root, "source")
    ET.SubElement(src, "database").text = "HO3D_V2"
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = "640"
    ET.SubElement(size, "height").text = "480"
    ET.SubElement(size, "depth").text = "3"
    ET.SubElement(root, "tstamp").text = "0"
    ET.SubElement(root, "segmented").text = "1"
    for obj in objects:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "category").text = obj["label"]
        ET.SubElement(o, "name").text = obj["label"]
        ET.SubElement(o, "truncated").text = "0"
        ET.SubElement(o, "difficult").text = "0"
        bb = ET.SubElement(o, "bndbox")
        for k in ("xmin", "ymin", "xmax", "ymax"):
            ET.SubElement(bb, k).text = str(obj[k])
    ET.ElementTree(root).write(path)


def convert(
    ho3d_train_dir: str,
    out_dir: str,
    sequences: Optional[Iterable[str]] = None,
    blue_threshold: int = 100,
):
    """Convert HO-3D ``train/<seq>/{rgb,seg}`` into the iCWT layout."""
    from PIL import Image

    out_train = os.path.join(out_dir, "train")
    for sub in ("Images", "Annotations", "Masks", "ImageSets"):
        os.makedirs(os.path.join(out_train, sub), exist_ok=True)

    converted = []
    seq_dirs = sorted(glob.glob(os.path.join(ho3d_train_dir, "*")))
    for seq_dir in seq_dirs:
        seq = os.path.basename(seq_dir)
        if sequences is not None and seq not in sequences:
            continue
        cls = None
        for k, v in SEQUENCE_TO_CLASS.items():
            if k in seq:
                cls = v
                break
        if cls is None:
            continue
        for sub in ("Images", "Annotations", "Masks"):
            os.makedirs(os.path.join(out_train, sub, seq), exist_ok=True)
        for seg_file in sorted(glob.glob(os.path.join(seq_dir, "seg", "*"))):
            name = os.path.splitext(os.path.basename(seg_file))[0]
            seg = np.asarray(
                Image.open(seg_file).convert("RGB").resize((640, 480), Image.NEAREST)
            )
            # the renderer marks the object in the blue channel (cv2 BGR
            # ">= [100,0,0]" == RGB blue channel >= 100)
            obj = seg[..., 2] >= blue_threshold
            mask = (obj * 255).astype(np.uint8)
            Image.fromarray(mask).save(
                os.path.join(out_train, "Masks", seq, name + ".png")
            )
            objects = []
            ys, xs = np.nonzero(obj)
            if len(ys):
                objects.append(
                    {
                        "xmin": int(xs.min()), "ymin": int(ys.min()),
                        "xmax": int(xs.max()) + 1, "ymax": int(ys.max()) + 1,
                        "label": cls,
                    }
                )
            _write_xml(
                os.path.join(out_train, "Annotations", seq, name + ".xml"),
                name, objects,
            )
            src_img = os.path.join(seq_dir, "rgb", name + ".png")
            if os.path.exists(src_img):
                shutil.copyfile(
                    src_img, os.path.join(out_train, "Images", seq, name + ".png")
                )
            if objects:
                converted.append(f"{seq}/{name}")
    return converted


def write_imagesets(out_dir: str, ids, stride: int = 1, name: str = "imageset_train"):
    """Write ``ImageSets/<name>{_1_out_of_<stride>}.txt``."""
    suffix = "" if stride == 1 else f"_1_out_of_{stride}"
    path = os.path.join(out_dir, "train", "ImageSets", f"{name}{suffix}.txt")
    with open(path, "w") as f:
        f.write("\n".join(ids[::stride]) + "\n")
    return path


def main(argv=None):
    """CLI equivalent of running the reference's ``src/ho3d-to-icwt-format.py``
    (which hardcodes ``$HOME_DIR/Data/datasets`` paths at :11-25)."""
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--ho3d_root", required=True,
        help="HO-3D v2 root (containing train/<seq>/{rgb,seg})")
    parser.add_argument(
        "--out", required=True,
        help="output root, e.g. Data/datasets/HO3D_V2_iCWT_format")
    parser.add_argument(
        "--imageset_strides", type=int, nargs="*", default=[1],
        help="also write ImageSets/imageset_train_1_out_of_<s>.txt per stride")
    args = parser.parse_args(argv)

    train_dir = os.path.join(args.ho3d_root, "train")
    if not os.path.isdir(train_dir):
        train_dir = args.ho3d_root
    ids = convert(train_dir, args.out)
    for stride in args.imageset_strides:
        path = write_imagesets(args.out, ids, stride=stride)
        print(f"wrote {path} ({len(ids[::stride])} ids)")
    print(f"converted {len(ids)} annotated frames into {args.out}")


if __name__ == "__main__":
    main()
