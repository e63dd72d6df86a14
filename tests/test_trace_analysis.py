"""utils.trace_analysis: perfetto-trace parsing + HLO roofline attribution.

Pure-host tests (no device, no jax) against a synthetic trace and HLO text.
"""

import gzip
import json
import os

from ccvpe_tpu.utils import trace_analysis as ta

HLO = """
HloModule jit_fwd

ENTRY %main {
  %p0 = f32[2,8,8,4]{3,2,1,0:T(8,128)} parameter(0)
  %p1 = bf16[4,4]{1,0:T(8,128)(2,1)} parameter(1)
  %convolution_add_fusion.1 = bf16[2,8,8,4]{0,3,2,1:T(8,128)(2,1)} fusion(%p0, %p1), kind=kOutput, calls=%fc.1, metadata={op_name="jit(fwd)/conv_general_dilated" source_file="/x/layers.py" source_line=129}
  %convert_reduce_fusion = (f32[2,4]{0,1:T(8,128)S(1)}, bf16[2,8,8,4]{0,3,2,1:T(8,128)(2,1)}) fusion(%convolution_add_fusion.1), kind=kOutput, calls=%fc.2, metadata={op_name="jit(fwd)/reduce_sum" source_file="/x/eff.py" source_line=7}
  ROOT %copy.3 = bf16[2,8,8,4]{2,3,1,0:T(8,128)(2,1)} copy(%convert_reduce_fusion)
}
"""


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_shape_bytes_tuples_and_layouts():
    assert ta.shape_bytes("bf16[2,8,8,4]{0,3,2,1:T(8,128)(2,1)}") == 2 * 512
    assert ta.shape_bytes(
        "(f32[2,4]{0,1}, bf16[2,8,8,4]{0,3,2,1})") == 4 * 8 + 2 * 512
    assert ta.shape_bytes("token[]") == 0


def test_hlo_index_and_moved_bytes():
    idx = ta.HloIndex.from_text(HLO)
    # ROOT-prefixed instructions are indexed like any other
    assert idx.types["copy.3"].startswith("bf16[2,8,8,4]")
    assert idx.operands["convert_reduce_fusion"] == [
        "convolution_add_fusion.1"]
    assert idx.source["convolution_add_fusion.1"] == (
        "layers.py:129", "conv_general_dilated")
    # result (tuple) + operand map
    assert idx.moved_bytes("convert_reduce_fusion") == (
        4 * 8 + 2 * 512) + 2 * 512
    # entry parameters are indexed, so fusions reading model weights / batch
    # inputs count those operand bytes (f32 input 2048B + bf16 weight 32B)
    assert idx.types["p0"].startswith("f32[2,8,8,4]")
    assert idx.moved_bytes("convolution_add_fusion.1") == (
        2 * 512) + (4 * 512) + (2 * 16)
    assert idx.moved_bytes("copy.3") == 2 * 512 + (4 * 8 + 2 * 512)


def test_duration_loading_and_summary(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "python host"}},
        # outer module span must be excluded
        {"ph": "X", "pid": 1, "name": "jit_fwd(123)", "dur": 1000},
        {"ph": "X", "pid": 1, "name": "convolution_add_fusion.1", "dur": 300},
        {"ph": "X", "pid": 1, "name": "convolution_add_fusion.1", "dur": 300},
        {"ph": "X", "pid": 1, "name": "convert_reduce_fusion", "dur": 200},
        {"ph": "X", "pid": 1, "name": "copy.3", "dur": 200},
        # host event must be excluded
        {"ph": "X", "pid": 2, "name": "convolution_add_fusion.1", "dur": 999},
    ]
    logdir = _write_trace(tmp_path, events)
    dur, nfiles = ta.load_device_durations(logdir)
    assert nfiles == 1
    assert dur["convolution_add_fusion.1"] == 600
    assert "jit_fwd(123)" not in dur
    assert sum(dur.values()) == 1000

    hlo = ta.HloIndex.from_text(HLO)
    rep = ta.summarize(dur, iters=2, hlo=hlo, top=10)
    assert rep["device_ms_per_iter"] == 0.5
    fams = {r["family"]: r["pct"] for r in rep["by_family"]}
    assert fams["convolution_add_fusion"] == 60.0
    top = rep["top_ops"][0]
    assert top["name"] == "convolution_add_fusion.1"
    # 2 iters * (result 1024B + two operands unknown) over 600us
    assert "gb_per_s" in top and top["gb_per_s"] > 0
    # shapes aggregated with layouts stripped
    assert any(r["shape"].startswith("bf16[2,8,8,4]")
               for r in rep["by_shape"])
    ta.print_report(rep)  # smoke: no crash


def test_thread_filter_keeps_only_xla_ops(tmp_path):
    # real XProf exports carry several threads under the device pid; only
    # "XLA Ops" holds per-instruction spans — the rest are envelopes that
    # would double-count device time
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 10, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 11, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 1, "tid": 12, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "X", "pid": 1, "tid": 10, "name": "fusion.1", "dur": 300},
        {"ph": "X", "pid": 1, "tid": 11, "name": "1", "dur": 900},
        {"ph": "X", "pid": 1, "tid": 12, "name": "main(1)", "dur": 1000},
    ]
    logdir = _write_trace(tmp_path, events)
    dur, _ = ta.load_device_durations(logdir)
    assert dict(dur) == {"fusion.1": 300}


def test_family_strips_instance_counter():
    assert ta.family("fusion.2187") == "fusion"
    assert ta.family("convert_reduce_fusion.10") == "convert_reduce_fusion"
    assert ta.family("copy-done.7") == "copy-done"
