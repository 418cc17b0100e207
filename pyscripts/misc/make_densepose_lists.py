"""Generate the DensePose-COCO data path lists.

Same layout as the reference's datasets/densepose/panoptic_*.txt
(verified by tests/test_dataset_lists.py): both label columns point at
the gray DensePose part masks, images under images/{train2014,val2014}.
"""

import argparse
import os


def densepose_lines(ids, image_split):
    """ids are COCO basenames (e.g. COCO_val2014_000000437205)."""
    gray = "segcls/densepose/gray/{id}.png"
    return [f"images/{image_split}/{i}.jpg {gray.format(id=i)} "
            f"{gray.format(id=i)}" for i in ids]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--id_list", required=True,
                        help="file of COCO image basenames, one per line")
    parser.add_argument("--image_split", required=True,
                        choices=["train2014", "val2014"])
    parser.add_argument("--out", required=True,
                        help="output list path, e.g. "
                             "datasets/densepose/panoptic_minival2014.txt")
    args = parser.parse_args()

    with open(args.id_list) as f:
        ids = [line.strip() for line in f if line.strip()]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(densepose_lines(ids, args.image_split)) + "\n")
    print(f"wrote {args.out} ({len(ids)} lines)")


if __name__ == "__main__":
    main()
