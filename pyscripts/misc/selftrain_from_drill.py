"""Extract the self-training-chain evidence from PIPELINE_DRILL.json
into SYNTH_SELFTRAIN.json (v2).

The drill runs the ACTUAL bash pipelines (train_spml_scribble.sh /
train_spml_tag.sh — reference surface:
/root/reference/bashscripts/voc12/train_spml_tag.sh:241-243,
/root/reference/pyscripts/train/train_classifier.py:99-116) at
flagship shapes on a 200-image VOC-shaped world, benchmarking every
stage. The chain question (VERDICT round-2 item 3): does SPML's
distillation IMPROVE a model end-to-end — classifier_stage1 (trained
on stage-1 pseudo labels) vs the stage-1 KNN readout, and
classifier_stage2 vs classifier_stage1?

Round-2 context: on the 48-image toy world the stage-2 classifier LOST
to stage-1 KNN (0.52 -> 0.36) because the memory bank WAS the train
split — KNN on its own train split is an oracle the classifier cannot
beat. The 200-image drill world with a held-out 40-image val split is
the fair arena.

Usage: python pyscripts/misc/selftrain_from_drill.py \
           [--drill PIPELINE_DRILL.json] [--out SYNTH_SELFTRAIN.json]
"""

import argparse
import json
import os


# splits that are genuinely held out in the drill worlds; only these
# may collapse onto the ":val" chain role (a results/train row must NOT
# silently overwrite the real val entry)
HELDOUT_SPLITS = {"val", "minival2014", "test"}


# benchmark stage -> chain role, keyed by (snapshot, result kind)
def _role(label):
    # label looks like "benchmark_by_mIoU:snap_tag/stage1/results/val"
    # (the inference split is pipeline-specific: val, minival2014, ...);
    # normalize held-out-split rows to the ":val" role suffix, key any
    # other split (e.g. a future results/train bench) by its own name.
    tail = label.split(":", 1)[-1]
    parts = tail.split("/")
    if "pseudo_labels" in tail:
        snap = parts[-3] if len(parts) >= 3 else "?"
        return f"{snap}:pseudo:{parts[-1]}"
    if len(parts) >= 3 and parts[-2] == "results":
        snap = parts[-3]
        leaf = parts[-1]
        kind = "softmax" if leaf.endswith("_softmax") else "knn"
        if snap.startswith("softmax_classifier"):
            kind = "classifier"
        split = leaf[:-len("_softmax")] if leaf.endswith("_softmax") \
            else leaf
        role_split = "val" if split in HELDOUT_SPLITS else split
        return f"{snap}:{kind}:{role_split}"
    return None


def main():
    ap = argparse.ArgumentParser()
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--drill",
                    default=os.path.join(root, "PIPELINE_DRILL.json"))
    ap.add_argument("--out",
                    default=os.path.join(root, "SYNTH_SELFTRAIN.json"))
    ap.add_argument("--note", action="append", default=[],
                    metavar="PIPELINE=TEXT",
                    help="root-cause note recorded under the named "
                         "pipeline's entry (repeatable)")
    ap.add_argument("--merge", action="store_true",
                    help="keep every key already in --out (e.g. the v3 "
                         "chains_by_scale analysis) and only add/replace "
                         "the per-pipeline entries extracted here")
    ap.add_argument("--key-suffix", default="",
                    help="store pipelines under '<name><suffix>' (e.g. "
                         "'_pretrained' for PIPELINE_DRILL_PRETRAINED "
                         "chains, so they don't replace the "
                         "from-scratch entries)")
    args = ap.parse_args()

    with open(args.drill) as f:
        drill = json.load(f)

    out = {"world": drill.get("world"),
           "config": drill.get("config"),
           "source": "PIPELINE_DRILL.json (the ACTUAL bash pipelines "
                     "at flagship shapes; benchmark_by_mIoU on the "
                     "held-out val split)",
           "pipelines": {}}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        prev.setdefault("pipelines", {})
        prev["world"] = prev.get("world") or out["world"]
        out = prev
    for p in drill.get("pipelines", []):
        rows = {}
        for st in p.get("stages", []):
            if "mean_iou" not in st or \
                    not st["stage"].startswith("benchmark_by_mIoU"):
                continue
            role = _role(st["stage"])
            key = role if role else st["stage"]
            rows[key] = st["mean_iou"]
        chain = {}
        # val-split rows in pipeline order tell the chain story
        val_rows = [(k, v) for k, v in rows.items() if k.endswith(":val")]
        for k, v in val_rows:
            chain[k] = v
        gains = {}
        stage1_knn = next((v for k, v in val_rows
                           if k.startswith("stage1:knn")), None)
        cls1 = next((v for k, v in val_rows
                     if k.startswith("softmax_classifier_stage1")), None)
        cls2 = next((v for k, v in val_rows
                     if k.startswith("softmax_classifier_stage2")), None)
        if stage1_knn is not None and cls1 is not None:
            gains["classifier_stage1_minus_stage1_knn"] = round(
                cls1 - stage1_knn, 4)
        if cls1 is not None and cls2 is not None:
            gains["classifier_stage2_minus_classifier_stage1"] = round(
                cls2 - cls1, 4)
        entry = {"val_chain": chain, "gains": gains,
                 "all_benchmarks": rows}
        # carry forward previously recorded root-cause notes on --merge
        # (they are evidence, not derivable from the drill), then append
        # any new --note values
        key = p["pipeline"] + args.key_suffix
        notes = list(out["pipelines"].get(key, {}).get("notes", []))
        notes += [n.split("=", 1)[1] for n in args.note
                  if n.split("=", 1)[0] in (p["pipeline"], key)
                  and n.split("=", 1)[1] not in notes]
        if notes:
            entry["notes"] = notes
        out["pipelines"][key] = entry

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
