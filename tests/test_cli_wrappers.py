"""Lock the pyscripts wrapper -> runner call surface against the
reference CLIs' scale/flag choices.

Reference scale surfaces (twke18/SPML pyscripts/inference/):
* inference_msc.py:125           scales [0.5, 0.75, 1, 1.25, 1.5] x flip
* prototype_msc.py:94-95         scales [0.5, 1, 1.5], no flip
* pseudo_softmax.py:116-118      scales [0.75, 1] x flip, walk, NO CRF
* pseudo_softmaxrw_crf.py:111-112  scales [1] x flip, walk, CRF
* pseudo_inference_crf_msc.py:135  scales [0.5, 1, 1.5, 2] x flip
"""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run_wrapper(monkeypatch, rel_path, runner_fn):
    """Import a pyscripts wrapper, stub out parse_args and the runner
    function it delegates to, call main(), return the captured call."""
    from spml_tpu import cli
    from spml_tpu.inference import runner

    captured = {}

    def fake_runner(*a, **kw):
        captured["args"] = a
        captured["kwargs"] = kw

    monkeypatch.setattr(cli, "parse_args",
                        lambda *a, **kw: (object(), object()))
    monkeypatch.setattr(runner, runner_fn, fake_runner)

    path = os.path.join(ROOT, rel_path)
    name = "wrapper_" + os.path.basename(rel_path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    assert "kwargs" in captured, f"{rel_path} never called {runner_fn}"
    return captured["kwargs"]


CASES = [
    # (wrapper, runner fn, expected kwargs beyond (args, config))
    ("pyscripts/inference/inference.py", "run_knn_inference", {}),
    ("pyscripts/inference/inference_crf.py", "run_knn_inference",
     {"crf": True}),
    ("pyscripts/inference/inference_msc.py", "run_knn_inference",
     {"msc": True}),
    ("pyscripts/inference/inference_crf_msc.py", "run_knn_inference",
     {"msc": True, "crf": True}),
    ("pyscripts/inference/inference_softmax.py", "run_softmax_inference",
     {}),
    ("pyscripts/inference/inference_softmax_crf.py",
     "run_softmax_inference", {"crf": True}),
    ("pyscripts/inference/inference_softmax_msc.py",
     "run_softmax_inference", {"msc": True}),
    ("pyscripts/inference/inference_softmax_crf_msc.py",
     "run_softmax_inference", {"msc": True, "crf": True}),
    ("pyscripts/inference/prototype.py", "run_prototype", {}),
    ("pyscripts/inference/prototype_msc.py", "run_prototype",
     {"scales": [0.5, 1.0, 1.5]}),
    ("pyscripts/inference/pseudo_camrw_crf.py", "run_pseudo_camrw_crf",
     {}),
    ("pyscripts/inference/pseudo_softmax.py", "run_pseudo_softmax",
     {"with_crf": False, "with_walk": True}),
    ("pyscripts/inference/pseudo_softmaxrw_crf.py", "run_pseudo_softmax",
     {"with_crf": True, "with_walk": True, "scales": (1.0,)}),
    ("pyscripts/inference/pseudo_inference_crf_msc.py", "run_pseudo_knn",
     {}),
    ("pyscripts/inference/pseudo_denseposerw_crf.py",
     "run_pseudo_densepose", {}),
]


@pytest.mark.parametrize("rel_path,fn,expected",
                         CASES, ids=[c[0].split("/")[-1] for c in CASES])
def test_wrapper_surface(monkeypatch, rel_path, fn, expected):
    kwargs = _run_wrapper(monkeypatch, rel_path, fn)
    assert kwargs == expected


def test_default_scales_match_reference():
    """The runner defaults the non-overriding wrappers rely on."""
    import inspect

    from spml_tpu.inference import runner

    def default(fn, name):
        return inspect.signature(getattr(runner, fn)).parameters[name] \
            .default

    # inference_msc.py:125 / inference_softmax_msc
    assert default("run_knn_inference", "scales") == \
        (0.5, 0.75, 1, 1.25, 1.5)
    assert default("run_softmax_inference", "scales") == \
        (0.5, 0.75, 1, 1.25, 1.5)
    # pseudo_softmax.py:116-118
    assert default("run_pseudo_softmax", "scales") == (0.75, 1.0)
    # pseudo_inference_crf_msc.py:135 + prob floor 0.15
    assert default("run_pseudo_knn", "scales") == (0.5, 1.0, 1.5, 2.0)
    assert default("run_pseudo_knn", "prob_floor") == 0.15
