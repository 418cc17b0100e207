"""Generate the data path lists consumed by the pipelines.

Produces the exact list layout the reference ships in datasets/
(verified line-for-line against /root/reference/datasets/voc12/*.txt and
datasets/densepose/*.txt by tests/test_dataset_lists.py):

* three-column train lists "image semantic instance" where the instance
  column is the HED oversegmentation (VOC2012/hed/{id}.png);
* scribble-length ablation variants dilate_3_{0.3,0.5,0.8} and the point
  variant dilate_6_0.0 (used by train_spml_point.sh);
* SEAM CAM (seam_a6_th0.2) and SEAM-box (seambox_a6_th0.5) pseudo-GT
  lists for the tag/box pipelines;
* panoptic_{split}_hed.txt (memory building) and panoptic_val.txt
  (evaluation: segcls in both label columns);
* two-column "image semantic" split lists (train/train+/val/trainval),
  one-column test.txt, and bare-id {val,test}_id.txt.

DensePose lists are produced by make_densepose_lists.py.
"""

import argparse
import os

SPLIT_FILES = {
    "train+": "VOC2012/ImageSets/SegmentationAug/trainaug.txt",
    "train": "VOC2012/ImageSets/Segmentation/train.txt",
    "val": "VOC2012/ImageSets/Segmentation/val.txt",
    "trainval": "VOC2012/ImageSets/Segmentation/trainval.txt",
    "test": "VOC2012-test/ImageSets/Segmentation/test.txt",
}

_IMG = "VOC2012/JPEGImages/{id}.jpg"
_HED = "VOC2012/hed/{id}.png"
_GT = "VOC2012/segcls/{id}.png"

# name template -> (semantic column template, instance column template)
TRAIN_LISTS = {
    "scribble_{split}_d3_hed.txt": ("VOC2012/scribble/dilate_3/{id}.png",
                                    _HED),
    "scribble_{split}_d3_0.3_hed.txt":
        ("VOC2012/scribble/dilate_3_0.3/{id}.png", _HED),
    "scribble_{split}_d3_0.5_hed.txt":
        ("VOC2012/scribble/dilate_3_0.5/{id}.png", _HED),
    "scribble_{split}_d3_0.8_hed.txt":
        ("VOC2012/scribble/dilate_3_0.8/{id}.png", _HED),
    "scribble_{split}_d6_0.0_hed.txt":
        ("VOC2012/scribble/dilate_6_0.0/{id}.png", _HED),
    "seam_{split}_a6_th0.2_hed.txt":
        ("VOC2012/cam/seam_a6_th0.2/{id}.png", _HED),
    "seambox_{split}_a6_th0.5_hed.txt":
        ("VOC2012/cam/seambox_a6_th0.5/{id}.png", _HED),
    "panoptic_{split}_hed.txt": (_GT, _HED),
    "panoptic_{split}.txt": (_GT, _GT),
}


def voc12_lines(name_tmpl, ids, split):
    if name_tmpl in TRAIN_LISTS:
        sem, inst = TRAIN_LISTS[name_tmpl]
        return [f"{_IMG.format(id=i)} {sem.format(id=i)} "
                f"{inst.format(id=i)}" for i in ids]
    raise KeyError(name_tmpl)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} ({len(lines)} lines)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--voc_root", required=True,
                        help="VOCdevkit root containing VOC2012/")
    parser.add_argument("--out_dir", default="datasets/voc12")
    parser.add_argument("--splits", default="train+,train,val,trainval")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits.split(","):
        split_file = os.path.join(args.voc_root, SPLIT_FILES[split])
        if not os.path.isfile(split_file):
            print(f"skip split {split}: missing {split_file}")
            continue
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        if split == "test":
            _write(os.path.join(args.out_dir, "test.txt"),
                   [f"VOC2012-test/JPEGImages/{i}.jpg" for i in ids])
            _write(os.path.join(args.out_dir, "test_id.txt"), ids)
            continue
        # two-column "image semantic" split list
        _write(os.path.join(args.out_dir, f"{split}.txt"),
               [f"{_IMG.format(id=i)} {_GT.format(id=i)}" for i in ids])
        if split == "val":
            _write(os.path.join(args.out_dir, "val_id.txt"), ids)
            _write(os.path.join(args.out_dir, "panoptic_val.txt"),
                   voc12_lines("panoptic_{split}.txt", ids, split))
            continue
        for tmpl in TRAIN_LISTS:
            if tmpl == "panoptic_{split}.txt":
                continue  # evaluation-only layout (val)
            _write(os.path.join(args.out_dir, tmpl.format(split=split)),
                   voc12_lines(tmpl, ids, split))


if __name__ == "__main__":
    main()
