#!/usr/bin/env python
"""Microbenchmark: int8-quantized vs bfloat16 convolutions on the TPU.

Motivation (ARCHITECTURE.md perf notes): the VIGOR inference forward is
HBM-bandwidth-bound at ~83% of the chip's 819 GB/s — "further throughput
needs lower-precision activations, not more MXU work".  TPU v5e's MXU runs
int8 at 2x the bf16 FLOP rate AND int8 activations halve the bytes the hot
fusions stream.  This bench measures whether an int8 path actually wins
through XLA (quantize/dequantize fuse into conv epilogues or not) before we
commit to a quantized inference mode.

Three variants per shape, steady-state timed on device:
  bf16       y = conv(x_bf16, w_bf16)
  int8-static  x already int8 (upper bound: quantization fused upstream)
  int8-dyn   per-tensor dynamic activation quant inside the timed region:
             s = max|x|/127; xq = round(x/s); y = conv(xq, wq) * (s*sw)

Shapes are the hot ones from the VIGOR forward (EfficientNet-B0 on the
512x512 aerial / 320x640 panorama, and the decoder tail).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # time via host fetch (block_until_ready returns early through the tunnel)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.time() - t0) / iters * 1000.0  # ms


def conv(x, w, stride=1, groups=1, prefer=None):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=prefer)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)

    # (name, B, H, W, Cin, Cout, k, stride, groups)
    shapes = [
        # cin=8 is the padded-channel proxy for the 3-channel stem (XLA
        # pads cin 3->8 for the MXU; int8-vs-bf16 ratio is representative)
        ("stem 3x3 s2 512^2 8->32 (3ch proxy)", 32, 512, 512, 8, 32, 3, 2, 1),
        ("expand 1x1 128^2 24->144",     32, 128, 128, 24, 144, 1, 1, 1),
        ("dw 3x3 128^2 144",             32, 128, 128, 144, 144, 3, 1, 144),
        ("project 1x1 64^2 240->40",     32, 64, 64, 240, 40, 1, 1, 1),
        ("expand 1x1 32^2 112->672",     32, 32, 32, 112, 672, 1, 1, 1),
        ("decoder 3x3 256^2 64->64",     32, 256, 256, 64, 64, 3, 1, 1),
        ("decoder 3x3 512^2 16->16",     32, 512, 512, 16, 16, 3, 1, 1),
    ]

    results = []
    for name, b, h, w, cin, cout, k, s, g in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        wt = jnp.asarray(
            rng.standard_normal((k, k, cin // g, cout)) * 0.05, jnp.bfloat16)

        # per-output-channel symmetric weight quant
        w_absmax = jnp.max(jnp.abs(wt), axis=(0, 1, 2), keepdims=True)
        sw = (w_absmax / 127.0).astype(jnp.float32)
        wq = jnp.clip(jnp.round(wt.astype(jnp.float32) / sw), -127, 127
                      ).astype(jnp.int8)
        xq_pre = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.05), -127, 127
                          ).astype(jnp.int8)

        f_bf16 = jax.jit(lambda x, w: conv(x, w, s, g))
        f_i8_static = jax.jit(
            lambda xq, wq: (conv(xq, wq, s, g, prefer=jnp.int32)
                            .astype(jnp.bfloat16)
                            * (0.05 * sw.reshape(-1)).astype(jnp.bfloat16)))

        def f_i8_dyn_raw(x, wq, sw):
            sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                          ).astype(jnp.int8)
            y = conv(xq, wq, s, g, prefer=jnp.int32)
            return y.astype(jnp.bfloat16) * (sx * sw.reshape(-1)
                                             ).astype(jnp.bfloat16)

        f_i8_dyn = jax.jit(f_i8_dyn_raw)

        t_bf = timed(f_bf16, x, wt)
        try:
            t_i8s = timed(f_i8_static, xq_pre, wq)
        except Exception as e:  # pragma: no cover - informative bench
            t_i8s = float("nan")
            print(f"  int8-static failed: {type(e).__name__}: {e}", flush=True)
        try:
            t_i8d = timed(f_i8_dyn, x, wq, sw)
        except Exception as e:  # pragma: no cover
            t_i8d = float("nan")
            print(f"  int8-dyn failed: {type(e).__name__}: {e}", flush=True)

        r = {"shape": name, "bf16_ms": round(t_bf, 3),
             "int8_static_ms": round(t_i8s, 3),
             "int8_dyn_ms": round(t_i8d, 3),
             "static_speedup": round(t_bf / t_i8s, 2) if t_i8s == t_i8s else None,
             "dyn_speedup": round(t_bf / t_i8d, 2) if t_i8d == t_i8d else None}
        results.append(r)
        print(json.dumps(r), flush=True)

    print("=== summary ===")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
