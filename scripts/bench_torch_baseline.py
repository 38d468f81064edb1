"""Measure the reference-equivalent torch-CPU refinement throughput.

Reproduces the reference's hot loop — grid_sample patch extraction +
coarse symmetric CNN pass + two 9-grid fine passes per match
(reference: two-view-refinement/refinement.py:76-185) — using the torch
oracle architecture from tests/test_panet.py, on CPU (the only hardware the
CUDA-targeted reference can use on this machine).  The result seeds
TORCH_CPU_MATCHES_PER_S in bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np
import torch
import torch.nn.functional as F

from test_panet import TorchOracle
from lfr_tpu.utils import synthetic

N_MATCHES = 256  # scaled down; throughput extrapolates linearly
BATCH = 1024


def extract_patches_torch(image, ij, ps=33):
    img = torch.tensor(image).float().permute(2, 0, 1)
    c, h, w = img.shape
    rows = torch.linspace(-1, 1, ps).view(ps, 1).repeat(1, ps) * ps / (h - 1)
    cols = torch.linspace(-1, 1, ps).view(1, ps).repeat(ps, 1) * ps / (w - 1)
    grid = torch.stack([rows, cols], dim=-1)
    nij = torch.tensor(ij).float()
    nij = nij / torch.tensor([h - 1, w - 1]).float() * 2 - 1
    full = nij.view(-1, 1, 1, 2) + grid
    out = F.grid_sample(
        img.unsqueeze(0),
        full[:, :, :, [1, 0]].reshape(1, -1, ps, 2),
        padding_mode="reflection",
        align_corners=True,
    ).squeeze(0)
    return out.view(c, -1, ps, ps).permute(1, 0, 2, 3)


def normalize(batch):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return (batch / 255.0 - mean) / std


def run_batched(fn, *tensors):
    outs = None
    for s in range(0, tensors[0].shape[0], BATCH):
        res = fn(*[t[s : s + BATCH] for t in tensors])
        if not isinstance(res, tuple):
            res = (res,)
        if outs is None:
            outs = [[r] for r in res]
        else:
            for acc, r in zip(outs, res):
                acc.append(r)
    return [torch.cat(a) for a in outs]


def main():
    torch.set_grad_enabled(False)
    net = TorchOracle().eval()
    rng = np.random.default_rng(0)
    img1, img2 = synthetic.shifted_pair(rng, 480, 640, (3, -2))
    kps, _ = synthetic.planted_features(rng, N_MATCHES, 480, 640)
    ij1 = kps[:, [1, 0]]
    ij2 = ij1 + np.array([3.0, -2.0])

    import cv2

    def refine_once():
        # Coarse symmetric pass.
        p1 = normalize(extract_patches_torch(img1, ij1))
        p2 = normalize(extract_patches_torch(img2, ij2))
        d12, d21 = run_batched(net.forward_sym, p1, p2)
        up1 = cv2.pyrUp(img1)
        up2 = cv2.pyrUp(img2)
        grid = (
            np.stack(np.meshgrid([-1.0, 0, 1.0], [-1.0, 0, 1.0], indexing="ij"), -1).reshape(-1, 2)
            * 16.0
        )
        for src_img, tgt_img, src_ij, tgt_ij, coarse in [
            (up1, up2, 2 * ij1, 2 * (ij2 + d12.numpy() * 16), d12),
            (up2, up1, 2 * ij2, 2 * (ij1 + d21.numpy() * 16), d21),
        ]:
            a_src = (src_ij[:, None] + grid[None]).reshape(-1, 2)
            a_tgt = (tgt_ij[:, None] + grid[None]).reshape(-1, 2)
            ps = normalize(extract_patches_torch(src_img, a_src))
            pt = normalize(extract_patches_torch(tgt_img, a_tgt))
            run_batched(net.forward, ps, pt)

    refine_once()  # warm-up
    t0 = time.perf_counter()
    refine_once()
    dt = time.perf_counter() - t0
    print(f"torch-cpu: {N_MATCHES / dt:.2f} matches/s ({dt:.1f}s for {N_MATCHES})")


if __name__ == "__main__":
    main()
