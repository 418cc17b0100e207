"""Integration-level lockstep parity: our jitted SPMD train step vs the
reference torch pipeline run side by side from the same init on the same
batches (pyscripts/misc/lockstep_parity.py). Locks model forward, k-means,
prototype gather, all three losses, the SGD chain and the memory bank in
one assertion: the loss curves must agree to a fraction of a percent."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "spml")):
    pytest.skip("reference checkout not available", allow_module_level=True)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_lockstep_loss_curves_match():
    sys.path.insert(0, ROOT)
    import tempfile

    import pyscripts.misc.lockstep_parity as lp

    emb, pred, cfg = lp.build_reference_models()
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "init.pth")
        lp.save_reference_checkpoint(emb, pred, ck)
        batches = lp.make_batches(8)
        ref_curve = lp.run_reference(emb, pred, cfg, batches)
        our_curve = lp.run_ours(ck, batches)

    result = lp.compare(ref_curve, our_curve)
    for key in ("loss", "sem_ann_loss", "img_sim_loss"):
        v = result["per_key"][key]
        assert v["max_rel_diff"] < 5e-3, (key, v)
    # total loss over 8 SGD steps (incl. memory-bank growth) stays
    # within 0.1%
    assert result["per_key"]["loss"]["max_rel_diff"] < 1e-3, \
        result["per_key"]["loss"]
