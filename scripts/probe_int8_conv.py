#!/usr/bin/env python
"""Probe: does an int8-quantized conv layer beat the real bf16 layer on v5e?

v5e's MXU does s8xs8->s32 at 2x the bf16 rate. The honest comparison is
the NETWORK's layer formulation on both sides:
  bf16: conv(bf16,bf16) + bias + relu -> bf16   (the detect graph's layer)
  int8: conv(int8,int8)->int32, *scale + bias, relu, requant -> int8
(the requant epilogue should fuse into the conv's consumer chain; int8
activations also halve HBM traffic for the BW-bound layers).

    python scripts/probe_int8_conv.py [--batch 32]

Times by fetching the last output (axon: block_until_ready does not
fence; CLAUDE.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chw", type=int, nargs=3, default=[256, 160, 160],
                    help="channels height width of the probe layer")
    args = ap.parse_args()

    from dan_tpu.utils import cache  # persistent XLA cache

    cache.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    print("device:", tpu, flush=True)

    C, H, W = args.chw
    B = args.batch
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w_f = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    x_i = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
    sw = jnp.asarray(rng.uniform(1e-3, 2e-3, (C,)), jnp.float32)

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def layer_bf16(x, w, b):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)
        return jax.nn.relu(out + b.astype(x.dtype))

    @jax.jit
    def layer_int8(x, w, sw, b):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sw + b
        y = jax.nn.relu(y)
        # requantize for the next layer (per-tensor scale 1/8 here)
        q = jnp.clip(jnp.round(y * 8.0), -127, 127).astype(jnp.int8)
        return q

    flops = 2 * B * H * W * C * C * 9

    def run(fn, xs, name):
        xs = [jax.device_put(a, tpu) for a in xs]
        t0 = time.perf_counter()
        out = fn(*xs)
        np.asarray(out[0, 0, 0, :1])
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
              f"out_dtype={out.dtype}", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        np.asarray(out[0, 0, 0, :1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:.3f} ms/iter = {flops/dt/1e12:.1f} T(FL)OP/s",
              flush=True)
        return dt

    t_f = run(layer_bf16, [x_f, w_f, bias], "bf16 layer")
    t_i = run(layer_int8, [x_i, w_i, sw, bias], "int8 layer")
    print(f"int8 layer speedup vs bf16 layer: {t_f/t_i:.2f}x", flush=True)


if __name__ == "__main__":
    main()
