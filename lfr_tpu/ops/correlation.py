"""Fused 4-D correlation kernel (Pallas TPU) for the flow CNN.

Computes, per patch pair, the dense 17x17 x 17x17 correlation volume and
both direction-normalized views in one VMEM-resident kernel:

    c          = f_ref @ f_tgt^T                (MXU)
    corr12     = l2norm_rows(relu(c))           (ref positions x tgt channels)
    corr21     = l2norm_rows(relu(c^T))

matching the reference's permute/normalize pipeline
(reference: two-view-refinement/model.py:64-70,95-99) without
materializing intermediates in HBM.  A jnp fallback with identical
semantics serves CPU and interpret-mode testing.
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

#: Feature-map positions (17*17) padded to a lane-friendly size.
POS = 289
POS_PAD = 384  # 3 * 128


def _norm_rows(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def correlation_reference(f_ref: jnp.ndarray, f_tgt: jnp.ndarray):
    """jnp fallback: (B, P, C) x2 -> (corr12, corr21), each (B, P, P)."""
    c = jnp.einsum("bpc,bqc->bpq", f_ref, f_tgt, preferred_element_type=jnp.float32)
    c12 = _norm_rows(jax.nn.relu(c))
    c21 = _norm_rows(jax.nn.relu(jnp.swapaxes(c, 1, 2)))
    return c12, c21


@functools.partial(jax.jit, static_argnames=("interpret",))
def correlation_pallas(f_ref: jnp.ndarray, f_tgt: jnp.ndarray, interpret: bool = False):
    """Pallas path: features padded to (B, POS_PAD, C); one program per pair.

    Zero rows in the padding produce zero correlation rows/cols, whose
    normalization is harmless (rsqrt of eps), and downstream consumers only
    read the first POS positions.
    """
    b, p, c = f_ref.shape
    out_shape = jax.ShapeDtypeStruct((b, p, p), jnp.float32)
    grid = (b,)
    spec = pl.BlockSpec(
        (1, p, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM if _HAS_PLTPU else None
    )
    out_spec = pl.BlockSpec(
        (1, p, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM if _HAS_PLTPU else None
    )

    def kernel(fr_ref, ft_ref, c12_ref, c21_ref):
        fr = fr_ref[0]
        ft = ft_ref[0]
        cmat = jax.lax.dot_general(
            fr, ft, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cmat = jnp.maximum(cmat, 0.0)
        inv12 = jax.lax.rsqrt(jnp.maximum(jnp.sum(cmat * cmat, axis=1, keepdims=True), 1e-24))
        ct = cmat.T
        inv21 = jax.lax.rsqrt(jnp.maximum(jnp.sum(ct * ct, axis=1, keepdims=True), 1e-24))
        c12_ref[0] = cmat * inv12
        c21_ref[0] = ct * inv21

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(f_ref, f_tgt)


def fused_correlation(f_ref, f_tgt, use_pallas: bool = None, interpret: bool = False):
    """Dispatch: Pallas on TPU, jnp elsewhere."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    if use_pallas or interpret:
        return correlation_pallas(f_ref, f_tgt, interpret=interpret)
    return correlation_reference(f_ref, f_tgt)
