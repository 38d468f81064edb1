"""REJECTED lowering experiments for the 64-channel backbone convs.

The backbone's conv1_1 (K=27) and conv1_2 (K=576) emit 64 output
channels — half the MXU's 128 lanes idle, capping their attainable
fraction at 10.5% / 45% (README roofline).  Two re-lowerings were built
and measured here; BOTH lost to XLA's plain conv and were not shipped:

1. Row stacking: pack TWO consecutive output rows into one 128-lane
   matmul via an augmented (4, 3, cin, 128) kernel, row stride 2, and an
   interleave after.  Theory: 75% effective ceiling vs 45% (25%
   structural zeros but full lanes).  Measured (v5e, batch 4096, warm):

     conv1_1 65px: plain 11.19 ms (2.7% peak) | stacked 34.90 ms (0.9%)
     conv1_2 65px: plain 13.59 ms (47.7%)     | stacked 40.91 ms (15.8%)
     conv1_1 33px: plain  4.02 ms (1.9%)      | stacked 11.31 ms (0.7%)
     conv1_2 33px: plain  5.71 ms (29.2%)     | stacked 13.15 ms (12.7%)

   XLA lowers the strided 4-row-kernel conv through a path ~3x slower
   than its plain-conv spatial pipeline; numerical parity was fine
   (<=1.3e-3 rel).  Notably plain conv1_2 at 65 px already runs AT its
   45% tiling ceiling — only conv1_1 (2.7% vs 10.5% attainable) leaves
   anything on the table, worth ~20 ms per 2048-match fine pass.

2. conv1_1 as im2col (9 shifted slices concat -> one (M, 27)x(27, 64)
   matmul): the program never finished compiling within 20 minutes on
   the remote compiler at batch 4096 or 1024 (plain conv compiles in
   seconds) — abandoned as impractical on this toolchain.

Kept as the measurement record; rerun on new compiler versions before
retrying either idea.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197.0


def _sync(x):
    return np.asarray(jnp.sum(x[0].astype(jnp.float32) if isinstance(x, tuple) else x.astype(jnp.float32)))


def timeit(fn, *args, reps=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def conv_plain(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        kernel.astype(jnp.bfloat16),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y + bias, 0.0).astype(jnp.bfloat16)


def stack_kernel(kernel):
    """(3, 3, cin, cout) -> (4, 3, cin, 2*cout) row-stacked kernel."""
    kh, kw, cin, cout = kernel.shape
    aug = jnp.zeros((kh + 1, kw, cin, 2 * cout), kernel.dtype)
    aug = aug.at[:kh, :, :, :cout].set(kernel)
    aug = aug.at[1:, :, :, cout:].set(kernel)
    return aug


def conv_stacked(x, kernel, bias):
    """Row-stacked SAME conv (pad=1), stride-2 rows, interleaved output."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    groups = -(-h // 2)
    # Rows covered per group k: padded[2k : 2k+4) = original [2k-1, 2k+3).
    # Need padded rows 0 .. 2*(groups-1)+4 = 2*groups+2.
    pad_bottom = 2 * groups + 2 - (h + 1)
    xp = jnp.pad(x, ((0, 0), (1, pad_bottom), (0, 0), (0, 0)))
    aug = stack_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        xp.astype(jnp.bfloat16),
        aug.astype(jnp.bfloat16),
        (2, 1),
        [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # (b, groups, w, 2*cout)
    y = jnp.maximum(y + jnp.concatenate([bias, bias]), 0.0).astype(jnp.bfloat16)
    a, bb = y[..., :cout], y[..., cout:]
    out = jnp.stack([a, bb], axis=2).reshape(b, 2 * groups, w, cout)
    return out[:, :h]


def conv_im2col(x, kernel, bias):
    """conv1_1 as 9 shifted slices + one (27 -> cout) matmul: avoids XLA's
    tiny-input-channel (C=3) conv path, which measured far below even the
    K=27 tiling ceiling."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [
            xp[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )  # (b, h, w, 9*cin)
    wmat = kernel.reshape(9 * cin, cout)
    y = jax.lax.dot_general(
        cols.astype(jnp.bfloat16).reshape(-1, 9 * cin),
        wmat.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, h, w, cout)
    return jnp.maximum(y + bias, 0.0).astype(jnp.bfloat16)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)
    rng = np.random.default_rng(0)

    cases = [
        ("conv1_1(65px,1024)", (1024, 65, 65, 3), 64),
        ("conv1_2(65px,1024)", (1024, 65, 65, 64), 64),
        ("conv1_1(33px,1024)", (1024, 33, 33, 3), 64),
        ("conv1_2(33px,1024)", (1024, 33, 33, 64), 64),
    ]
    for name, shape, cout in cases:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        kern = jnp.asarray(
            rng.standard_normal((3, 3, shape[-1], cout)) * 0.05, jnp.float32
        )
        bias = jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.float32)

        plain = jax.jit(conv_plain)
        stacked = jax.jit(conv_im2col if shape[-1] == 3 else conv_stacked)
        # Parity on a small slice (downloading the full production batch
        # would move gigabytes through the tunnel); a device-side max-abs
        # reduction covers the full batch.
        ref = np.asarray(plain(x[:8], kern, bias), np.float32)
        out = np.asarray(stacked(x[:8], kern, bias), np.float32)
        err = np.max(np.abs(ref - out))
        scale = np.max(np.abs(ref)) + 1e-9

        t_p = timeit(plain, x, kern, bias)
        t_s = timeit(stacked, x, kern, bias)
        flops = shape[0] * shape[1] * shape[2] * 9 * shape[3] * cout * 2
        print(
            f"{name:22s} plain {t_p*1e3:8.3f} ms ({flops/t_p/1e12:6.2f} TF/s, "
            f"{100*flops/t_p/1e12/V5E_BF16_PEAK:4.1f}%) | stacked {t_s*1e3:8.3f} ms "
            f"({flops/t_s/1e12:6.2f} TF/s, {100*flops/t_s/1e12/V5E_BF16_PEAK:4.1f}%) "
            f"| speedup {t_p/t_s:4.2f}x | max rel err {err/scale:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
