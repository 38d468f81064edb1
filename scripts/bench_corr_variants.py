"""Microbenchmark correlation-kernel variants to find the in-kernel cost.

The stage profile shows corr_pallas at ~2.7% of bf16 peak and ~10x below
HBM bandwidth, i.e. neither MXU- nor HBM-bound; this script times kernel
variants (group size, norm on/off, accumulate dtype, XLA alternatives) to
locate the bottleneck.  Usage: python scripts/bench_corr_variants.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfr_tpu.ops import correlation as C

B = 4096
P = 289
CH = 128


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(jnp.sum(x.astype(jnp.float32))) for x in leaves]


def timeit(fn, *args, reps=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def report(name, ms):
    traffic = B * P * CH * 2 * 2 + B * P * P * 2  # in bf16 + out bf16
    gbs = traffic / (ms / 1e3) / 1e9
    flops = B * P * P * CH * 2
    print(f"{name:38s} {ms:8.3f} ms   {flops/(ms/1e3)/1e12:6.2f} TF/s  {gbs:7.1f} GB/s")


def kernel_nonorm(fr_ref, ft_ref, o_ref):
    c = C._corr_block(fr_ref[...], ft_ref[...])
    o_ref[...] = c.astype(o_ref.dtype)


def kernel_matmul_only(fr_ref, ft_ref, o_ref):
    c = jax.lax.dot_general(
        fr_ref[...], ft_ref[...],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = c.astype(o_ref.dtype)


def kernel_norm(fr_ref, ft_ref, o_ref):
    C._kernel_asym(fr_ref, ft_ref, o_ref)


def make_pallas(kernel, g, out_dtype=jnp.bfloat16):
    @jax.jit
    def run(fr, ft):
        grid = (B // g,)
        spec = pl.BlockSpec((g, P, CH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((g, P, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, P, P), out_dtype),
        )(fr, ft)

    return run


@jax.jit
def xla_bf16_fused(fr, ft):
    c = jnp.einsum("bpc,bqc->bpq", fr, ft, preferred_element_type=jnp.float32)
    c = jax.nn.relu(c)
    n = jax.lax.rsqrt(jnp.maximum(jnp.sum(c * c, axis=-1, keepdims=True), 1e-24))
    return (c * n).astype(jnp.bfloat16)


@jax.jit
def xla_matmul_only(fr, ft):
    return jnp.einsum(
        "bpc,bqc->bpq", fr, ft, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def main():
    print(f"device: {jax.devices()[0].device_kind}  B={B}")
    rng = np.random.default_rng(0)
    fr = jnp.asarray(rng.standard_normal((B, P, CH)), jnp.bfloat16)
    ft = jnp.asarray(rng.standard_normal((B, P, CH)), jnp.bfloat16)

    report("current asym (g=8, norm)", timeit(lambda a, b: C.correlation_pallas(a, b, sym=False), fr, ft))
    for g in (4, 8, 16, 32):
        try:
            report(f"pallas matmul+relu+norm g={g}", timeit(make_pallas(kernel_norm, g), fr, ft))
        except Exception as e:
            print(f"g={g} failed: {type(e).__name__}: {str(e)[:120]}")
    for g in (8, 16, 32):
        try:
            report(f"pallas matmul+relu (no norm) g={g}", timeit(make_pallas(kernel_nonorm, g), fr, ft))
        except Exception as e:
            print(f"g={g} nonorm failed: {str(e)[:120]}")
    for g in (8, 16):
        try:
            report(f"pallas matmul only g={g}", timeit(make_pallas(kernel_matmul_only, g), fr, ft))
        except Exception as e:
            print(f"g={g} matmul failed: {str(e)[:120]}")
    report("xla einsum+relu+norm -> bf16", timeit(xla_bf16_fused, fr, ft))
    report("xla einsum only -> bf16", timeit(xla_matmul_only, fr, ft))


if __name__ == "__main__":
    main()
