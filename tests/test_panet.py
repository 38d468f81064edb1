"""PANet parity tests: Flax model + torch-checkpoint import vs a torch oracle.

The oracle reproduces the published reference architecture
(reference: two-view-refinement/model.py:8-108) directly in torch; weights
are random, converted through lfr_tpu.models.torch_import, and outputs must
agree to float32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from lfr_tpu.models import panet, torch_import


class TorchOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, padding=1),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(64, 64, 3, padding=1),
            tnn.ReLU(inplace=True),
            tnn.MaxPool2d(3, stride=2, padding=1),
            tnn.Conv2d(64, 128, 3, padding=1),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(128, 128, 3, padding=1),
            tnn.ReLU(inplace=True),
        )
        blocks = []
        in_ch = 17 * 17
        for out_ch in [128, 128, 64, 64]:
            blocks += [tnn.Conv2d(in_ch, out_ch, 5), tnn.BatchNorm2d(out_ch), tnn.ReLU(inplace=True)]
            in_ch = out_ch
        self.refine_net = tnn.Sequential(*blocks)
        self.predict_net = tnn.Sequential(tnn.Linear(64, 2))

    def _corr(self, ref, tgt):
        b = ref.size(0)
        feats = tF.normalize(self.backbone(torch.cat([ref, tgt], dim=0)), dim=1)
        _, c, h, w = feats.size()
        fr = feats[:b].reshape(b, c, h * w)
        ft = feats[b:].reshape(b, c, h * w)
        corr = torch.einsum("bcp,bcq->bpq", fr, ft)
        return corr, h, w

    def head(self, corr_nchw, b):
        x = tF.normalize(tF.relu(corr_nchw), dim=1)
        x = self.refine_net(x)
        return self.predict_net(x.reshape(b, -1))

    def forward(self, ref, tgt):
        b = ref.size(0)
        corr, h, w = self._corr(ref, tgt)
        corr12 = corr.reshape(b, h, w, h * w).permute(0, 3, 1, 2).contiguous()
        return self.head(corr12, b)

    def forward_sym(self, ref, tgt):
        b = ref.size(0)
        corr, h, w = self._corr(ref, tgt)
        corr12 = corr.reshape(b, h, w, h * w).permute(0, 3, 1, 2).contiguous()
        corr21 = corr.permute(0, 2, 1).reshape(b, h, w, h * w).permute(0, 3, 1, 2).contiguous()
        both = torch.cat([corr12, corr21], dim=0)
        out = self.head(both, 2 * b)
        return out[:b], out[b:]


@pytest.fixture(scope="module")
def oracle_and_variables():
    torch.manual_seed(0)
    oracle = TorchOracle()
    # Randomize BN running stats so eval-mode parity is meaningful.
    for m in oracle.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    oracle.eval()
    variables = torch_import.variables_from_torch_state_dict(oracle.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    return oracle, variables


def _rand_patches(rng, b):
    return (rng.random((b, 33, 33, 3)) * 255).astype(np.float32)


def test_forward_parity(oracle_and_variables):
    oracle, variables = oracle_and_variables
    rng = np.random.default_rng(0)
    ref = _rand_patches(rng, 4)
    tgt = _rand_patches(rng, 4)

    model = panet.PANet(compute_dtype=jnp.float32)
    ours = model.apply(
        variables, panet.normalize_patches(jnp.asarray(ref)), panet.normalize_patches(jnp.asarray(tgt))
    )

    with torch.no_grad():
        t_ref = torch.tensor(ref).permute(0, 3, 1, 2)
        t_tgt = torch.tensor(tgt).permute(0, 3, 1, 2)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        theirs = oracle(
            (t_ref / 255.0 - mean) / std, (t_tgt / 255.0 - mean) / std
        ).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=1e-3)


def test_forward_sym_parity(oracle_and_variables):
    oracle, variables = oracle_and_variables
    rng = np.random.default_rng(1)
    ref = _rand_patches(rng, 3)
    tgt = _rand_patches(rng, 3)

    model = panet.PANet(compute_dtype=jnp.float32)
    d12, d21 = model.apply(
        variables,
        panet.normalize_patches(jnp.asarray(ref)),
        panet.normalize_patches(jnp.asarray(tgt)),
        method=panet.PANet.forward_sym,
    )
    with torch.no_grad():
        t_ref = torch.tensor(ref).permute(0, 3, 1, 2)
        t_tgt = torch.tensor(tgt).permute(0, 3, 1, 2)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        o12, o21 = oracle.forward_sym(
            (t_ref / 255.0 - mean) / std, (t_tgt / 255.0 - mean) / std
        )
    np.testing.assert_allclose(np.asarray(d12), o12.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d21), o21.numpy(), atol=5e-4, rtol=1e-3)


def test_sym_consistency_with_swapped_asym(oracle_and_variables):
    """forward_sym(d12) must equal forward(ref, tgt); d21 equal forward(tgt, ref)."""
    _, variables = oracle_and_variables
    rng = np.random.default_rng(2)
    ref = panet.normalize_patches(jnp.asarray(_rand_patches(rng, 2)))
    tgt = panet.normalize_patches(jnp.asarray(_rand_patches(rng, 2)))
    model = panet.PANet(compute_dtype=jnp.float32)
    d12, d21 = model.apply(variables, ref, tgt, method=panet.PANet.forward_sym)
    a12 = model.apply(variables, ref, tgt)
    a21 = model.apply(variables, tgt, ref)
    np.testing.assert_allclose(np.asarray(d12), np.asarray(a12), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d21), np.asarray(a21), atol=1e-5)


def test_init_and_bf16_forward_runs():
    variables = panet.init_params(jax.random.PRNGKey(0))
    apply_asym, apply_sym = panet.make_apply_fns()
    rng = np.random.default_rng(3)
    ref = jnp.asarray(_rand_patches(rng, 2))
    tgt = jnp.asarray(_rand_patches(rng, 2))
    out = apply_asym(variables, ref, tgt)
    assert out.shape == (2, 2)
    d12, d21 = apply_sym(variables, ref, tgt)
    assert d12.shape == (2, 2) and d21.shape == (2, 2)
    assert np.isfinite(np.asarray(d12)).all()


def test_folded_bn_matches_eval_mode(oracle_and_variables):
    """fold_bn_variables + PANet(folded=True) must reproduce the eval-mode
    BN head in float32 compute up to reassociation rounding — ~1e-3
    displacement units on trained weights (four layers of scale
    reassociation compound), tighter on the fixture weights here."""
    _, variables = oracle_and_variables
    rng = np.random.default_rng(7)
    ref = panet.normalize_patches(jnp.asarray(_rand_patches(rng, 3)))
    tgt = panet.normalize_patches(jnp.asarray(_rand_patches(rng, 3)))
    base = panet.PANet(compute_dtype=jnp.float32)
    d12, d21 = base.apply(variables, ref, tgt, method=panet.PANet.forward_sym)
    folded_vars = panet.fold_bn_variables(variables)
    assert "batch_stats" not in folded_vars
    folded = panet.PANet(compute_dtype=jnp.float32, folded=True)
    f12, f21 = folded.apply(folded_vars, ref, tgt, method=panet.PANet.forward_sym)
    np.testing.assert_allclose(np.asarray(f12), np.asarray(d12), atol=2e-3)
    np.testing.assert_allclose(np.asarray(f21), np.asarray(d21), atol=2e-3)


def test_folded_bn_bf16_close():
    """Under bfloat16 compute the folded head stays within ~5e-3
    displacement units of the unfolded eval path."""
    variables = panet.init_params(jax.random.PRNGKey(5))
    rng = np.random.default_rng(8)
    ref = panet.normalize_patches(jnp.asarray(_rand_patches(rng, 4)))
    tgt = panet.normalize_patches(jnp.asarray(_rand_patches(rng, 4)))
    base = panet.PANet()
    d12 = base.apply(variables, ref, tgt)
    folded = panet.PANet(folded=True)
    f12 = folded.apply(panet.fold_bn_variables(variables), ref, tgt)
    np.testing.assert_allclose(np.asarray(f12), np.asarray(d12), atol=5e-3)
