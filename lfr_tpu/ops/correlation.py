"""Fused 4-D correlation kernels (Pallas TPU) for the flow CNN.

Computes, per patch pair, the dense 17x17 x 17x17 correlation volume and
its direction-normalized view(s) in one VMEM-resident kernel:

    c          = f_ref @ f_tgt^T                (MXU, f32 accumulation)
    corr12     = l2norm_rows(relu(c))           (ref positions x tgt channels)
    corr21     = l2norm_rows(relu(c^T))         (sym variant only)

matching the reference's permute/normalize pipeline
(reference: two-view-refinement/model.py:64-70,95-99).  XLA's un-fused
lowering materializes several (B, 289, 289) float32 temporaries plus a
transposed copy in HBM (~1.3% of peak measured); the kernel keeps the
volume in VMEM and writes bfloat16 — the head consumes bfloat16 anyway.

The kernel takes the natural (B, 289, 128) layout directly: full-dim
blocks let Mosaic pad the 289-position dims internally on the MXU, which
measured FASTER than materializing 384-position zero-padded copies in HBM
and slicing the (B, 384, 384) output back (10.2 ms vs 16.0 ms for the
asym direction at B=4096 on v5e — the pad and slice copies moved ~2 GB
of HBM traffic per call).  A jnp fallback with identical semantics
serves CPU and interpret-mode testing.

Fusing the head's first 5x5 conv INTO this kernel (keeping the 289-lane
volume VMEM-only) was measured and REJECTED — see
results/corr_conv0_fusion.json and scripts/bench_corr_variants.py.
Mosaic cannot shape-cast (289,289)->(17,17,289) in-kernel, so the conv
must be expressed either as 25 sublane-unaligned strip-slice matmuls
(c[o:o+217] @ W_k, o = dy*17+dx) or as full-row matmuls with a post-
slice; every variant (g in 2..16, slice-before/after, one concatenated
(289, 3200) matmul) measured 9.2-11.6 ms at B=2048 on v5e versus 8.4 ms
for this kernel + XLA's conv0 — XLA's conv lowering beats what Mosaic's
layout constraints allow here, and the standalone kernel's bf16 write
is already cheaper than the relayouts fusion forces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels run via interpret=True.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

#: Feature-map positions (17*17).
POS = 289

#: Patch pairs processed per Pallas program (g=8 measured fastest at
#: B=4096: 8 pairs' inputs + f32 correlation + bf16 output ~ 5 MB VMEM).
PAIRS_PER_PROGRAM = 8

#: The sym kernel computes c21 as a SECOND MXU matmul (ft @ fr^T) instead
#: of transposing c in VMEM: a 384x384 f32 transpose is VPU shuffle work
#: that measured slower than redoing the contraction on the idle MXU.


def _norm_rows(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def correlation_reference(f_ref: jnp.ndarray, f_tgt: jnp.ndarray):
    """jnp fallback: (B, P, C) x2 -> (corr12, corr21), each (B, P, P)."""
    c = jnp.einsum("bpc,bqc->bpq", f_ref, f_tgt, preferred_element_type=jnp.float32)
    c12 = _norm_rows(jax.nn.relu(c))
    c21 = _norm_rows(jax.nn.relu(jnp.swapaxes(c, 1, 2)))
    return c12, c21


def _corr_block(fr, ft):
    """(G, P, C) x2 -> relu'd correlation (G, P, P) f32."""
    c = jax.lax.dot_general(
        fr,
        ft,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(c, 0.0)


def _inv_norm(c):
    return jax.lax.rsqrt(jnp.maximum(jnp.sum(c * c, axis=-1, keepdims=True), 1e-24))


def _kernel_sym(fr_ref, ft_ref, c12_ref, c21_ref):
    fr = fr_ref[...]
    ft = ft_ref[...]
    c = _corr_block(fr, ft)
    c12_ref[...] = (c * _inv_norm(c)).astype(c12_ref.dtype)
    ct = _corr_block(ft, fr)  # MXU re-contraction beats a VMEM transpose
    c21_ref[...] = (ct * _inv_norm(ct)).astype(c21_ref.dtype)


def _kernel_asym(fr_ref, ft_ref, c12_ref):
    c = _corr_block(fr_ref[...], ft_ref[...])
    c12_ref[...] = (c * _inv_norm(c)).astype(c12_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sym", "interpret", "out_dtype", "pairs_per_program")
)
def correlation_pallas(
    f_ref: jnp.ndarray,
    f_tgt: jnp.ndarray,
    sym: bool = True,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    pairs_per_program: int = None,
):
    """Pallas path over (B, P, C) features (B divisible by the program group
    size or padded by the caller); returns (c12, c21) or c12 alone."""
    b, p, c = f_ref.shape
    gsize = pairs_per_program or PAIRS_PER_PROGRAM
    g = gsize if b % gsize == 0 else 1
    grid = (b // g,)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    spec = pl.BlockSpec((g, p, c), lambda i: (i, 0, 0), memory_space=mem)
    out_spec = pl.BlockSpec((g, p, p), lambda i: (i, 0, 0), memory_space=mem)
    out_shape = jax.ShapeDtypeStruct((b, p, p), out_dtype)

    if sym:
        return pl.pallas_call(
            _kernel_sym,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape),
            interpret=interpret,
        )(f_ref, f_tgt)
    return pl.pallas_call(
        _kernel_asym,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(f_ref, f_tgt)


def corr_views(
    f_ref: jnp.ndarray,
    f_tgt: jnp.ndarray,
    sym: bool = True,
    use_pallas: bool = None,
    interpret: bool = False,
):
    """Normalized correlation view(s) with backend dispatch.

    (B, P, C) features -> corr12 (B, P, P) [and corr21 if sym], already
    relu'd + L2-normalized over the last axis.  Pallas on TPU (bfloat16
    out), jnp elsewhere (float32 out; the head casts to its compute dtype).
    """
    if use_pallas is None:
        use_pallas = _HAS_PLTPU and jax.default_backend() not in ("cpu",)
    if use_pallas or interpret:
        return correlation_pallas(f_ref, f_tgt, sym=sym, interpret=interpret)
    c12, c21 = correlation_reference(f_ref, f_tgt)
    if sym:
        return c12, c21
    return c12


def fused_correlation(f_ref, f_tgt, use_pallas: bool = None, interpret: bool = False):
    """Back-compat dispatch: always returns both views."""
    return corr_views(
        f_ref, f_tgt, sym=True, use_pallas=use_pallas, interpret=interpret
    )
