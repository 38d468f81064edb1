"""Import reference PANet checkpoints (torch ``checkpoint.pth``) into Flax.

The reference loads trained torch weights at startup
(reference: two-view-refinement/model.py:43; the blob itself is not shipped).
If a user supplies such a checkpoint, this converter maps it onto the Flax
PANet parameter tree so refined outputs match the original network.

torch layout -> flax layout:
  conv weight (O, I, kh, kw)   -> (kh, kw, I, O)
  linear weight (O, I)         -> (I, O)
  batchnorm weight/bias        -> scale/bias; running stats -> batch_stats
"""

from __future__ import annotations

from typing import Dict

import numpy as np

#: torch nn.Sequential indices of the reference modules
#: (reference: model.py:12-41): backbone convs at 0,2,5,7 (max-pool at 4),
#: refine convs at 0,3,6,9 with BN at 1,4,7,10, predictor at 0.
_BACKBONE_CONVS = {"conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7}
_REFINE_CONVS = {"conv0": 0, "conv1": 3, "conv2": 6, "conv3": 9}
_REFINE_BNS = {"bn0": 1, "bn1": 4, "bn2": 7, "bn3": 10}


def _conv(sd: Dict, prefix: str):
    w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _bn(sd: Dict, prefix: str):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], dtype=np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], dtype=np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], dtype=np.float32),
    }
    return params, stats


def variables_from_torch_state_dict(state_dict: Dict) -> Dict:
    """Convert a reference-style torch state dict to PANet Flax variables."""
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state_dict.items()}

    params: Dict = {"backbone": {}, "refine": {}}
    batch_stats: Dict = {"refine": {}}

    for name, idx in _BACKBONE_CONVS.items():
        params["backbone"][name] = _conv(sd, f"backbone.{idx}")
    for name, idx in _REFINE_CONVS.items():
        params["refine"][name] = _conv(sd, f"refine_net.{idx}")
    for name, idx in _REFINE_BNS.items():
        p, s = _bn(sd, f"refine_net.{idx}")
        params["refine"][name] = p
        batch_stats["refine"][name] = s

    w = np.asarray(sd["predict_net.0.weight"], dtype=np.float32)
    b = np.asarray(sd["predict_net.0.bias"], dtype=np.float32)
    params["predict"] = {"kernel": w.T, "bias": b}

    return {"params": params, "batch_stats": batch_stats}


def load_checkpoint(path: str) -> Dict:
    """Load a torch ``checkpoint.pth`` (with a ``model`` key, as the
    reference saves it) and convert to Flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    return variables_from_torch_state_dict(sd)
