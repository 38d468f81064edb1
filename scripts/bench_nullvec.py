"""Null-vector backends for the RANSAC minimal solvers.

Geometric verification runs 256 F- and 256 H-hypotheses per pair, each
needing the minimal singular vector of a (<=9, 9) design matrix, plus a
(3, 3) SVD for rank-2 enforcement — at a 128-pair verify batch that is
~33k tiny SVDs per dispatch, and the warm verify stage measures ~16 ms
per pair (the whole-pair CNN refinement costs ~0.3 ms/match for
comparison).  TPU's SVD lowers to an iterative QR process that
vectorizes poorly at 9x9.  Candidates:

  svd      — current: jnp.linalg.svd(A_padded)[2][-1]
  eigh     — smallest eigenvector of A^T A (batched Jacobi eigensolver)
  invpow   — shifted inverse power iteration on A^T A via Cholesky
             (all dense 9x9 ops, fully vectorized)

Run on TPU; reports ms per 32768 problems and agreement vs svd.
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


def nullvec_svd(A):
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[..., -1, :]


def nullvec_eigh(A):
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]  # ascending eigenvalues: column 0 = smallest


def nullvec_invpow(A, iters: int = 12):
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    n = AtA.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    # Ridge sized for f32 Cholesky stability: the shifted matrix's
    # smallest eigenvalue is ~sigma (A^T A is singular for minimal sets),
    # and inverse iteration converges at rate lambda_2/sigma per step.
    M = AtA + (1e-3 / n * tr + 1e-12) * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(M)
    v = jnp.ones(AtA.shape[:-2] + (n,), A.dtype)

    def body(v, _):
        y = jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]
        v = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return v


def nullvec_fix9(A):
    """Set the last null-vector component to 1 and solve the exact
    square system A[:, :8] g = -A[:, 8] (batched LU).  Valid whenever the
    true solution's last component is nonzero — the F/H pipelines already
    normalize by the [2,2] entry, so this is the same genericity
    assumption; degenerate samples yield low-scoring hypotheses."""
    A8 = A[..., :8, :8]
    b = -A[..., :8, 8]
    g = jnp.linalg.solve(A8, b)
    v = jnp.concatenate([g, jnp.ones(g.shape[:-1] + (1,), g.dtype)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)
    rng = np.random.default_rng(0)
    B = 32768
    # Rank-8 wide systems padded to 9 rows (the verify hypothesis shape).
    A8 = rng.standard_normal((B, 8, 9)).astype(np.float32)
    A = np.concatenate([A8, np.zeros((B, 1, 9), np.float32)], axis=1)
    Aj = jnp.asarray(A)

    fns = {
        "svd": jax.jit(nullvec_svd),
        "eigh": jax.jit(nullvec_eigh),
        "invpow": jax.jit(nullvec_invpow),
        "fix9": jax.jit(nullvec_fix9),
    }
    ref = None
    for name, fn in fns.items():
        v = np.asarray(fn(Aj))
        # Residual |A v| measures null-vector quality directly.
        res = np.linalg.norm(np.einsum("bij,bj->bi", A, v), axis=1)
        t0 = time.perf_counter()
        reps = 5
        out = None
        for _ in range(reps):
            out = fn(Aj)
        np.asarray(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        if ref is None:
            ref = v
        agree = np.abs(np.sum(ref * v, axis=1))
        print(
            f"{name:8s} {dt*1e3:9.2f} ms/{B}  residual p50={np.median(res):.2e} "
            f"p99={np.percentile(res, 99):.2e}  |cos vs svd| p1="
            f"{np.percentile(agree, 1):.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
