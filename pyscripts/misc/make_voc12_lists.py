"""Generate the VOC12 data path lists consumed by the pipelines.

Produces the same list layout the reference ships in datasets/voc12/
(one 'image semantic instance' triple per line, paths relative to the
VOCdevkit root), derived from the split id files.
"""

import argparse
import os

SPLIT_FILES = {
    "train+": "VOC2012/ImageSets/SegmentationAug/trainaug.txt",
    "train": "VOC2012/ImageSets/Segmentation/train.txt",
    "val": "VOC2012/ImageSets/Segmentation/val.txt",
}

LISTS = {
    "scribble_{split}_d3_hed.txt": (
        "VOC2012/JPEGImages/{id}.jpg",
        "scribble_annotation/VOC2012/dilate_3/segcls/{id}.png",
        "VOC2012/hed_owt_ucm/seginst/{id}.png"),
    "point_{split}_d6_hed.txt": (
        "VOC2012/JPEGImages/{id}.jpg",
        "whats_the_point/VOC2012/dilate_6/segcls/{id}.png",
        "VOC2012/hed_owt_ucm/seginst/{id}.png"),
    "seam_{split}_a6_th0.2_hed.txt": (
        "VOC2012/JPEGImages/{id}.jpg",
        "VOC2012/cam/seam_a6_th0.2/{id}.png",
        "VOC2012/hed_owt_ucm/seginst/{id}.png"),
    "seambox_{split}_a6_th0.5_hed.txt": (
        "VOC2012/JPEGImages/{id}.jpg",
        "VOC2012/cam/seambox_a6_th0.5/{id}.png",
        "VOC2012/hed_owt_ucm/seginst/{id}.png"),
    "panoptic_{split}_hed.txt": (
        "VOC2012/JPEGImages/{id}.jpg",
        "VOC2012/segcls/{id}.png",
        "VOC2012/hed_owt_ucm/seginst/{id}.png"),
    "panoptic_{split}.txt": (
        "VOC2012/JPEGImages/{id}.jpg",
        "VOC2012/segcls/{id}.png",
        "VOC2012/seginst/{id}.png"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--voc_root", required=True)
    parser.add_argument("--out_dir", default="datasets/voc12")
    parser.add_argument("--splits", default="train+,val")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits.split(","):
        split_file = os.path.join(args.voc_root, SPLIT_FILES[split])
        if not os.path.isfile(split_file):
            print(f"skip split {split}: missing {split_file}")
            continue
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        for tmpl, (img, sem, inst) in LISTS.items():
            name = tmpl.format(split=split)
            lines = [
                f"{img.format(id=i)} {sem.format(id=i)} "
                f"{inst.format(id=i)}" for i in ids]
            with open(os.path.join(args.out_dir, name), "w") as f:
                f.write("\n".join(lines) + "\n")
            print(f"wrote {name} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
