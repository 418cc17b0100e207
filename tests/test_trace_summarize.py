"""Unit test for the device-trace roofline aggregator
(pyscripts/misc/capture_tpu_trace.summarize) on a synthetic Chrome
trace: device-plane discovery, XLA-Ops/Steps lane separation, and
per-category time/FLOP/byte accumulation. The capture side is covered
end-to-end by tests/test_train_step.py::test_profiler_trace_window."""

import gzip
import importlib.util
import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "capture_tpu_trace",
        os.path.join(ROOT, "pyscripts", "misc", "capture_tpu_trace.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summarize_aggregates_device_ops(tmp_path):
    trace = {"traceEvents": [
        # metadata: pid 3 is the device, pid 9 the host
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # two steps of 100 us each on the Steps lane
        {"ph": "X", "pid": 3, "tid": 1, "name": "0", "ts": 0, "dur": 100},
        {"ph": "X", "pid": 3, "tid": 1, "name": "1", "ts": 100,
         "dur": 100},
        # ops: a conv fusion (with flops/bytes) and a copy, per step
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "ts": 0,
         "dur": 80, "args": {"hlo_category": "convolution fusion",
                             "model_flops": 1e9,
                             "raw_bytes_accessed": 1e6,
                             "tf_op": "jit(step)/conv:"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy-done.1", "ts": 80,
         "dur": 20, "args": {"hlo_category": "copy-done"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "ts": 100,
         "dur": 80, "args": {"hlo_category": "convolution fusion",
                             "model_flops": 1e9,
                             "raw_bytes_accessed": 1e6,
                             "tf_op": "jit(step)/conv:"}},
        # host-plane event must be ignored
        {"ph": "X", "pid": 9, "tid": 1, "name": "python", "ts": 0,
         "dur": 500},
    ]}
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    mod = _load_module()
    per_op, per_class, steps_us, n_steps, path = mod.summarize(
        str(tmp_path))
    assert n_steps == 2 and steps_us == 200
    conv = per_class["convolution fusion"]
    assert conv[0] == 160 and conv[1] == 2e9 and conv[2] == 2e6
    assert conv[3] == 2
    assert per_class["copy-done"][0] == 20
    assert "python" not in {k[0] for k in per_op}
    assert per_op[("fusion.1", "jit(step)/conv:")][0] == 160
