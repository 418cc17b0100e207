"""Export an spml_tpu orbax snapshot to the reference's .pth format.

Produces a torch checkpoint with the exact module naming the reference
saves (pyscripts/train/train.py:298-302 in twke18/SPML:
{'embedding_model': ..., 'prediction_model': ...}), so models trained by
this framework can be consumed by the reference's own inference /
benchmark scripts or any torch tooling built on them.

Usage:
  python pyscripts/misc/export_torch_checkpoint.py \
      --snapshot_dir <dir with checkpoints/> [--step N] [--out model.pth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--snapshot_dir", required=True,
                    help="training snapshot dir (contains checkpoints/)")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out", default=None,
                    help="output .pth path (default: "
                         "<snapshot_dir>/model-<step>.pth)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from spml_tpu.utils import torch_export

    ck_dir = os.path.abspath(os.path.join(args.snapshot_dir,
                                          "checkpoints"))
    if not os.path.isdir(ck_dir):
        ck_dir = os.path.abspath(args.snapshot_dir)
    with ocp.CheckpointManager(ck_dir) as mgr:
        step = args.step if args.step is not None else mgr.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoints under {ck_dir}")
        # raw (template-free) restore: StandardSave'd flax.struct
        # dataclasses come back as nested dicts keyed by field name
        state = mgr.restore(step)

    out = args.out or os.path.join(args.snapshot_dir, f"model-{step}.pth")
    torch_export.save_torch_checkpoint(out, state["params"],
                                       state["batch_stats"])
    print(f"wrote {out} (step {step})")


if __name__ == "__main__":
    main()
