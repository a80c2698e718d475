"""Checkpoint save/restore.

Same content model as the reference (`/root/reference/libs/utils/
train_utils.py:42-54`, `/root/reference/train.py:231-270`): a checkpoint is
{epoch, model params, EMA params, optimizer state, schedule position}; the
best checkpoint drops optimizer/scheduler state; eval loads the EMA weights.

Format: a directory with msgpack-serialized pytrees (flax.serialization) +
a JSON sidecar for scalars. Conversion to/from the reference's torch
`.pth.tar` key space lives in utils/torch_convert.py.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .state import TrainState


def _write_bytes(path: str, data: bytes):
    with open(path, "wb") as f:
        f.write(data)


def _read_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def save_checkpoint(
    state: TrainState,
    epoch: int,
    folder: str,
    is_best: bool = False,
    file_name: str = "checkpoint",
    extra_meta: dict = None,
):
    """Write `<folder>/<name>/` with params/ema/opt msgpack blobs.

    is_best => name forced to `model_best`, optimizer state dropped
    (train_utils.py:47-52).

    Writes are ATOMIC: blobs go to a `<name>.tmp` staging dir (meta.json
    last) which is then renamed into place, so a crash mid-save can never
    leave a torn `model_best` — and `find_latest_checkpoint` never selects
    a staging dir."""
    os.makedirs(folder, exist_ok=True)
    name = "model_best" if is_best else file_name
    ckpt_dir = os.path.join(folder, name)
    tmp_dir = ckpt_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)

    params = jax.device_get(state.params)
    ema = jax.device_get(state.ema_params)
    _write_bytes(os.path.join(tmp_dir, "params.msgpack"),
                 serialization.to_bytes(params))
    _write_bytes(os.path.join(tmp_dir, "ema.msgpack"),
                 serialization.to_bytes(ema))
    if not is_best:
        opt = jax.device_get(state.opt_state)
        _write_bytes(os.path.join(tmp_dir, "opt_state.msgpack"),
                     serialization.to_bytes(opt))
    meta = {
        "epoch": int(epoch),
        "step": int(jax.device_get(state.step)),
        "loss_normalizer": float(jax.device_get(state.loss_normalizer)),
        "has_opt_state": not is_best,
    }
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(meta, f)

    # swap the staged dir into place; the previous complete checkpoint
    # survives (as <name>.old) until the rename has succeeded. A crash in
    # the window between the two renames leaves only <name>.old, which
    # find_latest_checkpoint restores via _recover_displaced.
    old_dir = ckpt_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    if os.path.exists(ckpt_dir):
        os.rename(ckpt_dir, old_dir)
    try:
        os.rename(tmp_dir, ckpt_dir)
    except OSError:
        # a concurrent find_latest_checkpoint (e.g. eval.py on a live run)
        # recovered <name>.old into place between our two renames; the
        # staged dir is the newer checkpoint — replace the recovered one
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        os.rename(tmp_dir, ckpt_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    return ckpt_dir


def _recover_displaced(folder: str) -> None:
    """Finish an interrupted save_checkpoint swap: if `<name>.old` exists
    but `<name>` does not (crash between the two renames), the displaced
    dir IS the last complete checkpoint — rename it back.

    Racing a LIVE save_checkpoint mid-swap is tolerated: the rename here
    is best-effort (the loser's rename raises and is swallowed), and
    save_checkpoint's final rename replaces a recovered dir if one
    appeared in its window."""
    try:
        entries = os.listdir(folder)
    except OSError:
        return
    for d in entries:
        if d.endswith(".old"):
            ckpt_dir = os.path.join(folder, d[: -len(".old")])
            if not os.path.exists(ckpt_dir) and os.path.exists(
                os.path.join(folder, d, "meta.json")
            ):
                try:
                    os.rename(os.path.join(folder, d), ckpt_dir)
                except OSError:
                    pass  # a concurrent saver/recoverer won the race


def load_checkpoint(
    ckpt_dir: str,
    state_template: TrainState,
) -> Dict[str, Any]:
    """Restore into the template's structure. Returns
    {state, epoch} — if the checkpoint has no optimizer state (best ckpt),
    the template's optimizer state is kept."""
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    params = serialization.from_bytes(
        jax.device_get(state_template.params),
        _read_bytes(os.path.join(ckpt_dir, "params.msgpack")),
    )
    ema = serialization.from_bytes(
        jax.device_get(state_template.ema_params),
        _read_bytes(os.path.join(ckpt_dir, "ema.msgpack")),
    )
    opt_state = state_template.opt_state
    opt_path = os.path.join(ckpt_dir, "opt_state.msgpack")
    if meta.get("has_opt_state") and os.path.exists(opt_path):
        opt_state = serialization.from_bytes(
            jax.device_get(state_template.opt_state), _read_bytes(opt_path)
        )
    state = TrainState(
        params=params,
        opt_state=opt_state,
        ema_params=ema,
        loss_normalizer=jnp.asarray(meta["loss_normalizer"], jnp.float32),
        step=jnp.asarray(meta["step"], jnp.int32),
    )
    return {"state": state, "epoch": meta["epoch"], "meta": meta}


def find_latest_checkpoint(folder: str) -> Optional[str]:
    """Pick the last COMPLETE checkpoint dir in sorted order (eval.py:33-36).

    Staging (`*.tmp`) and displaced (`*.old`) dirs from an interrupted
    save_checkpoint are never candidates."""
    if os.path.exists(os.path.join(folder, "meta.json")):
        return folder
    _recover_displaced(folder)
    cands = sorted(
        d for d in os.listdir(folder)
        if not d.endswith((".tmp", ".old"))
        and os.path.exists(os.path.join(folder, d, "meta.json"))
    )
    return os.path.join(folder, cands[-1]) if cands else None
