"""Patch-alignment flow network (PANet-equivalent) in Flax, NHWC, TPU-first.

Predicts the 2-D displacement aligning a 33x33 target patch to a reference
patch.  Architecture parity with the reference
(reference: two-view-refinement/model.py:8-108):

  * backbone: VGG-style conv1_1..conv2_2 with a 3x3/stride-2 max-pool after
    block 1, producing a 17x17x128 map (model.py:12-22);
  * per-position L2 normalization over channels (model.py:58);
  * dense 4-D correlation 17x17 x 17x17 via one batched contraction — an
    MXU-native einsum instead of the reference's permute+bmm (model.py:64-67);
  * ReLU + L2 normalization over the 289 correlation channels (model.py:70);
  * refine head: four unpadded 5x5 convs 289->128->128->64->64 with
    BatchNorm+ReLU shrinking 17 -> 1 spatially (model.py:24-37);
  * prediction: Linear(64 -> 2) (model.py:39-41).

``forward_sym`` evaluates both directions from a single correlation volume
(model.py:80-108).  Computation runs in bfloat16 on the MXU with float32
accumulation/normalization; parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

#: ImageNet normalization (reference: model.py:47-51).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

PATCH = 33
FMAP = PATCH // 2 + 1  # 17 (reference: model.py:21-22)


def normalize_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] NHWC patches -> ImageNet-normalized float32."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (patches.astype(jnp.float32) / 255.0 - mean) / std


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    # Matches torch F.normalize: x / max(||x||, eps).
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


class Backbone(nn.Module):
    """VGG conv1_1..conv2_2 with an extra 3x3/2 max-pool (reference: model.py:12-19).

    ``fast=True`` (inference) lowers each conv through :class:`_FoldedConv`
    (bf16 MXU conv, f32 accumulate + bias + ReLU): measured 33.1% -> 41.6%
    of bf16 peak on v5e with identical parameters."""

    compute_dtype: Any = jnp.bfloat16
    fast: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fast:
            conv = lambda f, name: _FoldedConv(  # noqa: E731
                f, self.compute_dtype, kernel_size=(3, 3), padding=1, name=name
            )
            relu = lambda y: y  # noqa: E731 — _FoldedConv applies ReLU
        else:
            conv = lambda f, name: nn.Conv(  # noqa: E731
                f, (3, 3), padding=1, dtype=self.compute_dtype, name=name
            )
            relu = nn.relu
        x = x.astype(self.compute_dtype)
        x = relu(conv(64, "conv1_1")(x))
        x = relu(conv(64, "conv1_2")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = relu(conv(128, "conv2_1")(x))
        x = relu(conv(128, "conv2_2")(x))
        return x


class _FoldedConv(nn.Module):
    """bf16 conv with f32 accumulation, f32 bias add + ReLU.

    Exactly the kernel benchmarked in scripts/bench_head_variants.py
    (``head_folded``): the bias stays float32 and is added to the float32
    conv accumulator, not rounded through bfloat16 first.  Used by the
    folded inference head AND the inference backbone — on v5e this
    formulation runs the backbone at 41.6% of bf16 peak vs 33.1% for the
    nn.Conv lowering (same parameters, rounding-level difference only)."""

    features: int
    compute_dtype: Any = jnp.bfloat16
    kernel_size: Tuple[int, int] = (5, 5)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_size + (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            (1, 1),
            pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + bias, 0.0).astype(self.compute_dtype)


class RefineHead(nn.Module):
    """Four unpadded 5x5 conv+BN+ReLU stages, 17x17 -> 1x1
    (reference: model.py:24-37).

    ``folded=True`` selects the inference fast path: the eval-mode
    BatchNorm affine is pre-folded into the conv kernels/biases
    (see :func:`fold_bn_variables`), removing four float32 elementwise
    stages and their dtype bounces between the MXU convs — measured
    56.5% -> 68.5% of bf16 peak on v5e (scripts/bench_head_variants.py,
    which times this exact kernel via :class:`_FoldedConv`), with max
    output deviation ~4e-3 displacement units (~0.07 px) vs the f32 head
    on trained weights."""

    compute_dtype: Any = jnp.bfloat16
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.folded and train:
            raise ValueError("folded RefineHead is inference-only")
        for i, feat in enumerate([128, 128, 64, 64]):
            if self.folded:
                x = _FoldedConv(feat, self.compute_dtype, name=f"conv{i}")(x)
                continue
            x = nn.Conv(
                feat, (5, 5), padding="VALID", dtype=self.compute_dtype, name=f"conv{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=jnp.float32, name=f"bn{i}"
            )(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.compute_dtype)
        return x


class PANet(nn.Module):
    """Two-view patch-alignment flow network.

    ``folded=True`` runs the BN-folded inference head; apply it with
    variables produced by :func:`fold_bn_variables`."""

    compute_dtype: Any = jnp.bfloat16
    folded: bool = False

    def setup(self):
        self.backbone = Backbone(self.compute_dtype, fast=self.folded)
        self.refine = RefineHead(self.compute_dtype, folded=self.folded)
        self.predict = nn.Dense(2, dtype=jnp.float32, name="predict")

    def features(self, patches: jnp.ndarray) -> jnp.ndarray:
        """(B, 33, 33, 3) -> (B, 17, 17, 128), L2-normalized over channels."""
        return _l2_normalize(self.backbone(patches), axis=-1)

    def correlation(self, f_ref: jnp.ndarray, f_tgt: jnp.ndarray) -> jnp.ndarray:
        """(B,17,17,C),(B,17,17,C) -> (B, 17*17 ref, 17*17 tgt) in float32."""
        b = f_ref.shape[0]
        fr = f_ref.reshape(b, FMAP * FMAP, -1)
        ft = f_tgt.reshape(b, FMAP * FMAP, -1)
        return jnp.einsum(
            "bpc,bqc->bpq", fr, ft, preferred_element_type=jnp.float32
        )

    def _head(self, corr: jnp.ndarray, train: bool, prenormalized: bool = False) -> jnp.ndarray:
        """ReLU + channel L2-norm + refine + predict.  corr: (B,17,17,289)
        with the *source* positions as the spatial grid.  ``prenormalized``
        skips the relu+norm when the correlation backend already applied
        them (fused Pallas path)."""
        if not prenormalized:
            corr = _l2_normalize(nn.relu(corr), axis=-1)
        x = self.refine(corr.astype(self.compute_dtype), train=train)
        return self.predict(x.reshape(x.shape[0], -1).astype(jnp.float32))

    def _corr_views(self, f_ref, f_tgt, sym: bool, train: bool):
        """Normalized correlation views via the fused Pallas kernel on TPU
        (bf16, VMEM-resident relu+norm — XLA's lowering materializes
        several (B, 289, 289) f32 temporaries) or the jnp reference
        elsewhere.  Training always uses the differentiable jnp path."""
        from ..ops.correlation import corr_views

        b = f_ref.shape[0]
        fr = f_ref.reshape(b, FMAP * FMAP, -1)
        ft = f_tgt.reshape(b, FMAP * FMAP, -1)
        use_pallas = False if train else None
        return corr_views(fr, ft, sym=sym, use_pallas=use_pallas)

    def flow_from_features(
        self, f_ref: jnp.ndarray, f_tgt: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Correlation + refine head over per-position L2-normalized
        (B, 17, 17, C) feature maps — the asymmetric forward minus the
        backbone, so callers that compute features once per crop (the
        crop-feature fine pass) can reuse them across grid offsets."""
        b = f_ref.shape[0]
        c12 = self._corr_views(f_ref, f_tgt, sym=False, train=train)
        # corr12: spatial grid = reference positions, channels = target pos.
        corr12 = c12.reshape(b, FMAP, FMAP, FMAP * FMAP)
        return self._head(corr12, train, prenormalized=True)

    def __call__(
        self, reference: jnp.ndarray, target: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Asymmetric forward: displacement of target w.r.t. reference
        (reference: model.py:53-78).  Inputs are ImageNet-normalized NHWC."""
        b = reference.shape[0]
        feats = self.features(jnp.concatenate([reference, target], axis=0))
        return self.flow_from_features(feats[:b], feats[b:], train=train)

    def forward_sym(
        self, reference: jnp.ndarray, target: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Both directions from one correlation volume (reference: model.py:80-108)."""
        b = reference.shape[0]
        feats = self.features(jnp.concatenate([reference, target], axis=0))
        c12, c21 = self._corr_views(feats[:b], feats[b:], sym=True, train=train)
        corr12 = c12.reshape(b, FMAP, FMAP, FMAP * FMAP)
        corr21 = c21.reshape(b, FMAP, FMAP, FMAP * FMAP)
        both = jnp.concatenate([corr12, corr21], axis=0)
        disp = self._head(both, train, prenormalized=True)
        return disp[:b], disp[b:]


def fold_normalize_variables(variables: Dict) -> Dict:
    """Fold the ImageNet input normalization into conv1_1.

    With y_c = x_c/(255*std_c) - mean_c/std_c, conv(y) = conv'(x) where
    conv1_1's kernel divides by 255*std per INPUT channel and its bias
    absorbs the mean shift.  The returned tree expects RAW [0, 255]
    patches — the (B, 33, 33, 3) float32 normalize pass (an extra HBM
    read+write over every patch) disappears from the hot path.
    Composes with :func:`fold_bn_variables` in either order."""
    params = dict(variables["params"])
    bb = dict(params["backbone"])
    conv = dict(bb["conv1_1"])
    kernel = jnp.asarray(conv["kernel"], jnp.float32)  # (3, 3, 3, 64)
    bias = jnp.asarray(conv["bias"], jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    scale = 1.0 / (255.0 * std)  # per input channel
    shift = mean / std
    conv["kernel"] = kernel * scale[None, None, :, None]
    conv["bias"] = bias - jnp.einsum("hwco,c->o", kernel, shift)
    bb["conv1_1"] = conv
    params["backbone"] = bb
    out = dict(variables)
    out["params"] = params
    return out


def fold_bn_variables(variables: Dict, eps: float = 1e-5) -> Dict:
    """Fold the eval-mode BatchNorm affines of the refine head into the
    preceding conv kernels and biases.

    Returns a variable tree for ``PANet(folded=True)``: the ``refine``
    collection keeps only conv kernels/biases (``y = conv(x)*s + (b-mean)*s
    + beta`` with ``s = scale/sqrt(var+eps)``) and ``batch_stats`` is
    dropped.  Equivalent to the unfolded eval-mode head up to float32
    reassociation rounding (~1e-3 displacement units on trained weights);
    under bfloat16 compute the total deviation is ~4e-3 units (~0.07 px),
    the same order as the unfolded bf16 head's own deviation from f32
    (tests/test_panet.py)."""
    params = variables["params"]
    refine = params["refine"]
    stats = variables["batch_stats"]["refine"]
    folded = {}
    for i in range(4):
        kernel = jnp.asarray(refine[f"conv{i}"]["kernel"], jnp.float32)
        bias = jnp.asarray(refine[f"conv{i}"]["bias"], jnp.float32)
        bn = refine[f"bn{i}"]
        mean = jnp.asarray(stats[f"bn{i}"]["mean"], jnp.float32)
        var = jnp.asarray(stats[f"bn{i}"]["var"], jnp.float32)
        s = jnp.asarray(bn["scale"], jnp.float32) / jnp.sqrt(var + eps)
        folded[f"conv{i}"] = {
            "kernel": kernel * s,
            "bias": (bias - mean) * s + jnp.asarray(bn["bias"], jnp.float32),
        }
    new_params = dict(params)
    new_params["refine"] = folded
    return {"params": new_params}


def init_params(rng: jax.Array, compute_dtype=jnp.bfloat16) -> Dict:
    """Initialize PANet variables (params + batch_stats)."""
    model = PANet(compute_dtype)
    dummy = jnp.zeros((1, PATCH, PATCH, 3), jnp.float32)
    return model.init(rng, dummy, dummy)


def make_apply_fns(compute_dtype=jnp.bfloat16):
    """Jitted (asymmetric, symmetric) apply functions over raw [0,255] patches."""
    model = PANet(compute_dtype)

    @jax.jit
    def apply_asym(variables, reference, target):
        return model.apply(
            variables, normalize_patches(reference), normalize_patches(target)
        )

    @jax.jit
    def apply_sym(variables, reference, target):
        return model.apply(
            variables,
            normalize_patches(reference),
            normalize_patches(target),
            method=PANet.forward_sym,
        )

    return apply_asym, apply_sym
