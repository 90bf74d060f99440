"""Torch checkpoint -> JAX param/state conversion.

The functional models in this package key their parameters exactly like the
reference ``state_dict`` names, so conversion is a pure layout transform:

- 4-D conv kernels: OIHW -> HWIO
- 3-D conv1d kernels: (O, I, K) -> (K, I, O)
- channel-LayerNorm / AffineDropPath params stored as (1, C, 1) -> (C,)
- BN running stats split into the separate ``state`` dict
- ``num_batches_tracked`` and DataParallel ``module.`` prefixes dropped

ref: model/checkpoints.py:6-44 (checkpoint dict layout),
model/OTPose.py:477-496 (pretrained partial load).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# torch is only needed when actually reading a .pth; keep the import lazy so
# the package works in torch-free deployments.


def _to_numpy(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_state_dict(sd: Dict[str, "np.ndarray"]) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Convert a torch state_dict(-like mapping) to (params, state)."""
    params: Dict[str, np.ndarray] = {}
    state: Dict[str, np.ndarray] = {}
    for name, tensor in sd.items():
        if name.startswith("module."):
            name = name[len("module."):]
        if name.endswith("num_batches_tracked"):
            continue
        arr = _to_numpy(tensor)
        if name.endswith("running_mean") or name.endswith("running_var"):
            state[name] = arr
            continue
        if name.endswith("pos_embd"):
            state[name] = np.transpose(arr, (0, 2, 1))  # (1, C, T) -> (1, T, C)
            continue
        if name.endswith("rel_pe"):
            params[name] = arr                           # (1, 1, nh, window) kept
            continue
        if arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        elif arr.ndim == 3:
            # (1, C, 1) channel-LayerNorm / AffineDropPath scale params
            # flatten to (C,); gate on the NAME as well as the shape — a
            # genuine conv1d with out=1, k=1 has the same shape and must
            # take the (O, I, K) -> (K, I, O) branch instead (none exist in
            # OTPose itself; the guard protects downstream checkpoints).
            # Tokens are matched against the OWNING MODULE component only
            # (ln1/ln2/embd_norm/drop_path_attn/... in the reference) — a
            # substring match over the full dotted path would misroute a
            # real out=1,k=1 conv living anywhere under e.g. a "scale_head"
            # branch (ADVICE r4).
            owner = name.split(".")[-2] if "." in name else ""
            is_channel_param = name.endswith((".weight", ".bias", ".scale")) \
                and any(t in owner for t in ("ln", "norm", "drop_path", "scale"))
            if arr.shape[0] == 1 and arr.shape[2] == 1 and is_channel_param:
                arr = arr.reshape(-1)               # (1, C, 1) LN/scale -> (C,)
            else:
                arr = np.transpose(arr, (2, 1, 0))  # conv1d (O, I, K) -> (K, I, O)
        params[name] = arr
    return params, state


def load_torch_checkpoint(path: str):
    """Load a reference .pth training checkpoint.

    Returns dict with 'params', 'state', and passthrough metadata
    ('begin_epoch', 'tensorboard_global_steps') when present.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    params, state = convert_state_dict(sd)
    out = {"params": params, "state": state}
    if isinstance(blob, dict):
        for k in ("begin_epoch", "tensorboard_global_steps"):
            if k in blob:
                out[k] = blob[k]
    return out


def filter_pretrained_for_otpose(params: Dict[str, np.ndarray],
                                 pretrained_layers=("*",)) -> Dict[str, np.ndarray]:
    """Replicate the pretrained-HRNet key remapping of the reference
    (ref: model/OTPose.py:483-494): bare HRNet keys are prefixed into
    ``rough_pose_estimation_net.``; keys already under a known OTPose
    submodule pass through.
    """
    otpose_roots = {
        "rough_pose_estimation_net", "temporal_encoder1", "temporal_encoder2",
        "flow_encoder", "final_layer1", "final_layer2", "offset_mask_combine_conv",
        "def_fuse", "offsets_list", "masks_list", "modulated_deform_conv_list",
    }
    out = {}
    for name, arr in params.items():
        root = name.split(".")[0]
        if not (root in pretrained_layers or "*" in pretrained_layers or root in otpose_roots):
            continue
        if root in otpose_roots:
            out[name] = arr
        else:
            out[f"rough_pose_estimation_net.{name}"] = arr
    return out
