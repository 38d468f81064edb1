"""Micro-benchmark of correlation backend variants on the accelerator.

Variants: XLA einsum chain, Pallas (current PAIRS_PER_PROGRAM), Pallas with
other group sizes, asym-only.  Times are wall-clock with a host-transfer
fence (block_until_ready is unreliable through the axon relay).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np

from lfr_tpu.ops import correlation as C


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(jnp.sum(x.astype(jnp.float32))) for x in leaves]


def timeit(fn, *args, reps=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((b, 289, 128)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((b, 289, 128)), jnp.bfloat16)

    flops = b * 289 * 289 * 128 * 2

    @jax.jit
    def einsum_path(a, bb):
        return C.correlation_reference(a, bb)

    t = timeit(einsum_path, f, f2)
    print(f"einsum sym      B={b}: {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TF/s")

    for g in (1, 4, 8, 16):
        if b % g:
            continue
        try:
            t = timeit(lambda a, bb: C.correlation_pallas(a, bb, sym=True, pairs_per_program=g), f, f2)
            print(f"pallas sym g={g:<3} B={b}: {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TF/s")
        except Exception as e:
            print(f"pallas sym g={g}: FAILED {type(e).__name__}: {e}")
    for g in (4, 8):
        try:
            t = timeit(lambda a, bb: C.correlation_pallas(a, bb, sym=False, pairs_per_program=g), f, f2)
            print(f"pallas asym g={g:<2} B={b}: {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TF/s")
        except Exception as e:
            print(f"pallas asym g={g}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
