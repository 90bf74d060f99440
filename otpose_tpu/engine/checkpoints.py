"""Checkpoint I/O with the reference's resume semantics, on orbax.

ref: model/checkpoints.py:6-74, utils/setup.py:135-224.  Checkpoints are
directories ``epoch_{N}_state`` holding {params, model_state, opt_state,
step, begin_epoch, tensorboard_global_steps}; best checkpoints are
``best_mAP_{value}_state`` with previous-best deletion.  Torch ``.pth``
checkpoints from the reference load transparently (weights only).
"""

from __future__ import annotations

import math
import os
import os.path as osp
import re
import shutil
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp


# One persistent checkpointer per process: orbax's StandardCheckpointer IS
# an AsyncCheckpointer (device->host fetch happens synchronously inside
# save(); serialization commits in a background thread, atomically via
# tmp-dir + rename).  A persistent instance lets async saves outlive the
# call; save() itself blocks until any PREVIOUS async save has committed,
# so back-to-back saves never race.
_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves() -> None:
    """Block until every pending async checkpoint save has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(folder: str, epoch: int, train_state, *,
                    tensorboard_global_steps: int = 0, iteration: int = 0,
                    async_save: bool = False):
    """-> ``{folder}/epoch_{N}_state`` (ref: model/checkpoints.py:28-44).

    ``iteration > 0`` marks a mid-epoch (preemption) checkpoint: resume
    restarts the SAME epoch and skips its first ``iteration`` batches
    (engine/preempt.py); ``iteration == 0`` keeps the reference semantics
    (epoch complete, resume at epoch+1).

    ``async_save=True`` returns as soon as the params are fetched to host;
    serialization overlaps the caller's next work (cli/train.py overlaps
    the validation pass).  The commit is atomic — a crash mid-write leaves
    no ``epoch_{N}_state`` dir, so ``resume`` falls back to the previous
    epoch.  Call ``wait_for_saves()`` before reading the path back or
    exiting.  Single-process only: multihost saves are a collective (every
    process must reach the same save), so callers keep those synchronous."""
    os.makedirs(folder, exist_ok=True)
    path = osp.abspath(osp.join(folder, f"epoch_{epoch}_state"))
    payload = {
        "params": dict(train_state.params),
        "model_state": dict(train_state.model_state),
        "opt_state": train_state.opt_state,
        "step": train_state.step,
        "meta": {
            "begin_epoch": np.asarray(epoch if iteration else epoch + 1),
            "tensorboard_global_steps": np.asarray(tensorboard_global_steps),
            "iteration": np.asarray(iteration),
        },
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    if not async_save:
        ckptr.wait_until_finished()
    return path


def save_best_checkpoint(folder: str, train_state, mAP: float):
    """``best_mAP_{v}_state`` with prior-best removal
    (ref: model/checkpoints.py:47-74)."""
    from otpose_tpu.parallel.distributed import is_primary

    os.makedirs(folder, exist_ok=True)
    for name in os.listdir(folder):
        if name.startswith("best_mAP_"):
            prev = _parse_best(name)
            if prev is not None and prev < mAP:
                # multihost: every process reaches the same decision (mAP is
                # broadcast), but only the primary touches the shared FS —
                # concurrent rmtree of the same dir races
                if is_primary():
                    shutil.rmtree(osp.join(folder, name), ignore_errors=True)
            elif prev is not None and prev >= mAP:
                return None
    path = osp.abspath(osp.join(folder, f"best_mAP_{mAP}_state"))
    payload = {"params": dict(train_state.params),
               "model_state": dict(train_state.model_state)}
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def resolve_model_file(path: str, cfg, checkpoints_folder: str) -> str:
    """Root a configured VAL/TEST ``MODEL_FILE`` the reference way
    (ref: eval.py:66-72): ``'.'``-prefixed paths resolve against the
    experiment's checkpoints folder, anything else joins ``cfg.ROOT_DIR``
    (absolute paths pass through ``osp.join`` unchanged).  Without this a
    reference-style relative MODEL_FILE would be read from the cwd."""
    if path.startswith("."):
        return osp.abspath(osp.join(checkpoints_folder, path))
    return osp.join(cfg.ROOT_DIR, path)


def _parse_epoch(name: str) -> Optional[int]:
    m = re.fullmatch(r"epoch_(\d+)_state", name)
    return int(m.group(1)) if m else None


def _parse_best(name: str) -> Optional[float]:
    m = re.fullmatch(r"best_mAP_(.+?)_state", name)
    if m is None:
        return None
    try:
        # float() rather than a decimal regex: a tiny early-training mAP
        # reprs in scientific notation ("best_mAP_3.2e-05_state"), and a
        # best dir that stops parsing is never compared against or deleted
        v = float(m.group(1))
    except ValueError:
        return None
    # a best_mAP_nan_state dir would make every "mAP > best" comparison
    # false forever and never be replaced — treat non-finite like unparsable
    # (ADVICE r4)
    return v if math.isfinite(v) else None


def get_latest_checkpoint(folder: str) -> Optional[str]:
    """Latest by epoch number (ref: utils/setup.py:135-151)."""
    if not osp.isdir(folder):
        return None
    best = None
    best_epoch = -1
    for name in os.listdir(folder):
        e = _parse_epoch(name)
        if e is not None and e > best_epoch:
            best_epoch, best = e, osp.join(folder, name)
    return best


def get_best_checkpoint(folder: str) -> Optional[str]:
    """Highest-mAP best checkpoint (ref: utils/setup.py:154-171)."""
    if not osp.isdir(folder):
        return None
    best = None
    best_map = -1.0
    for name in os.listdir(folder):
        v = _parse_best(name)
        if v is not None and v > best_map:
            best_map, best = v, osp.join(folder, name)
    return best


def get_all_checkpoints(folder: str):
    """All epoch checkpoints, naturally sorted (ref: utils/setup.py:198-224)."""
    if not osp.isdir(folder):
        return []
    out = [(e, osp.join(folder, n)) for n in os.listdir(folder)
           if (e := _parse_epoch(n)) is not None]
    return [p for _, p in sorted(out)]


def restore_checkpoint(path: str, template=None):
    """Restore an orbax dir or a torch .pth (weights converted).

    Returns dict with at least params/model_state; orbax checkpoints include
    opt_state/step/meta when a matching template is given.
    """
    if path.endswith(".pth") or path.endswith(".pth.tar"):
        from otpose_tpu.models.torch2jax import load_torch_checkpoint

        out = load_torch_checkpoint(path)
        out["params"] = {k: np.asarray(v) for k, v in out["params"].items()}
        out["state"] = {k: np.asarray(v) for k, v in out["state"].items()}
        out["model_state"] = out.pop("state")
        return out
    wait_for_saves()  # the dir may still be committing from an async save
    ckptr = _checkpointer()
    path = osp.abspath(path)
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def merge_checkpoint(blob, init_params, init_state):
    """Merge a restored checkpoint blob into fresh init dicts, key-by-key
    with shape gating (tolerates partial/legacy checkpoints the way the
    reference's ``load_state_dict(strict=False)`` does).

    Returns ``(params, model_state, n_loaded)`` — callers should surface
    ``n_loaded`` (eval/export CLIs log it; a 0 means the checkpoint matches
    nothing and must be treated as an error by anything that bakes the
    result into an artifact).
    """
    import jax.numpy as jnp

    params = dict(init_params)
    model_state = dict(init_state)
    n = 0
    for k, v in blob["params"].items():
        if k in params and tuple(params[k].shape) == tuple(v.shape):
            params[k] = jnp.asarray(v)
            n += 1
    for k, v in blob.get("model_state", {}).items():
        if k in model_state and tuple(model_state[k].shape) == tuple(v.shape):
            model_state[k] = jnp.asarray(v)
    return params, model_state, n


def resume(folder: str, train_state):
    """Auto-resume from the latest epoch checkpoint (ref: checkpoints.py:6-25,
    train.py:101-110).
    Returns (train_state, begin_epoch, tb_steps, start_iteration);
    start_iteration > 0 means begin_epoch was interrupted mid-way and its
    first ``start_iteration`` batches are already in the state."""
    latest = get_latest_checkpoint(folder)
    if latest is None:
        return train_state, 0, 0, 0
    template = {
        "params": dict(train_state.params),
        "model_state": dict(train_state.model_state),
        "opt_state": train_state.opt_state,
        "step": train_state.step,
        "meta": {"begin_epoch": np.asarray(0),
                 "tensorboard_global_steps": np.asarray(0),
                 "iteration": np.asarray(0)},
    }
    try:
        blob = restore_checkpoint(latest, template)
    except Exception as first_err:
        # pre-iteration-format checkpoint: retry with the legacy meta layout.
        # If the retry fails too the checkpoint is genuinely broken (shape
        # mismatch, corrupt dir) — surface the ORIGINAL error, not the
        # misleading legacy-template one.
        template["meta"].pop("iteration")
        try:
            blob = restore_checkpoint(latest, template)
        except Exception:
            raise first_err
        blob["meta"]["iteration"] = 0
    import dataclasses

    ts = dataclasses.replace(train_state, params=blob["params"],
                             model_state=blob["model_state"],
                             opt_state=blob["opt_state"], step=blob["step"])
    return (ts, int(blob["meta"]["begin_epoch"]),
            int(blob["meta"]["tensorboard_global_steps"]),
            int(blob["meta"]["iteration"]))
