"""Checkpointing: Orbax-managed train state + bare-model export.

Parity target: the reference's dual-format saves
(scripts/train_tokenizer.py:620-653):
  1. full training state (model + optimizers + schedulers + EMA) for resume,
  2. a bare `pytorch_model.bin`-style weights file for the model zoo,
plus `metadata.json` holding the global step, and the resume-latest contract
(glob newest checkpoint, scripts/train_tokenizer.py:298-331).

Here (1) is an Orbax CheckpointManager directory tree and (2) is a flax
msgpack file; `load_pretrained` also accepts reference `.bin` checkpoints
through the compat converter.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
from flax import serialization

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over Orbax with the reference's metadata/resume contract."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._manager = ocp.CheckpointManager(self.directory, options=options)
        self._pending_meta: Optional[Tuple[int, dict]] = None

    def save(self, step: int, state: Any, metadata: Optional[dict] = None,
             blocking: bool = False) -> None:
        """Save the train state. Async by default: device->host transfer
        happens now, the disk write overlaps with subsequent train steps
        (pod-scale saves must not block the step loop); the next save/restore
        /close waits for completion. Pass blocking=True to wait here.

        metadata-{step}.json is written only AFTER the Orbax step commits
        (at the next wait/save/restore/close) and only by process 0 — a
        crash mid-write must not leave metadata for a step that never
        committed, and pod hosts must not race on one file."""
        self._manager.wait_until_finished()
        self._flush_metadata()
        self._manager.save(step, args=ocp.args.StandardSave(state))
        meta = {"global_step": int(step)}
        if metadata:
            meta.update(metadata)
        self._pending_meta = (step, meta)
        if blocking:
            self._manager.wait_until_finished()
            self._flush_metadata()

    def _flush_metadata(self) -> None:
        if self._pending_meta is None:
            return
        step, meta = self._pending_meta
        self._pending_meta = None
        if jax.process_index() == 0:
            with open(os.path.join(self.directory, f"metadata-{step}.json"), "w") as f:
                json.dump(meta, f)
            # prune metadata for steps Orbax's max_to_keep has deleted: a
            # stale file would point resume tooling at a checkpoint that no
            # longer exists
            live = set(self._manager.all_steps())
            for name in os.listdir(self.directory):
                if not (name.startswith("metadata-") and name.endswith(".json")):
                    continue
                try:
                    s = int(name[len("metadata-"):-len(".json")])
                except ValueError:
                    continue
                if s not in live and s != step:
                    try:
                        os.remove(os.path.join(self.directory, name))
                    except OSError:
                        pass

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self._manager.wait_until_finished()
        self._flush_metadata()

    def latest_step(self) -> Optional[int]:
        self._manager.wait_until_finished()
        self._flush_metadata()
        return self._manager.latest_step()

    def restore_latest(self, abstract_state: Any) -> Optional[Tuple[Any, int]]:
        """Restore the newest checkpoint into `abstract_state`'s structure.

        `abstract_state` may be concrete host arrays (single-host resume) or
        `jax.ShapeDtypeStruct`s carrying `NamedSharding`s — the pod-resume
        path: each host then reads only its shards and the restored tree
        comes back already sharded over the mesh."""
        step = self.latest_step()
        if step is None:
            return None
        restored = self._manager.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return restored, step

    def close(self):
        self._manager.wait_until_finished()
        self._flush_metadata()
        self._manager.close()


def abstract_sharded(state: Any, shardings: Any) -> Any:
    """A ShapeDtypeStruct tree carrying NamedShardings — the template for a
    pod resume via `CheckpointManager.restore_latest` (each host reads only
    its shards). `shardings` is a matching tree, e.g. from
    `parallel.mesh.param_shardings` for params and `replicated(mesh)`
    elsewhere."""
    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state, shardings,
    )


def save_pretrained(params: Any, path: str) -> None:
    """Bare-model export (flax msgpack) — the zoo format of this framework."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(jax.device_get(params))
    with open(path, "wb") as f:
        f.write(data)


def load_pretrained(path: str, template: Any = None) -> Any:
    """Load bare model weights.

    * `.msgpack` — this framework's native format
    * `.bin` / `.pth` — a PyTorch reference checkpoint (tokenizer or
      generator is auto-detected from its keys), converted on the fly.
    """
    if path.endswith((".bin", ".pth", ".pt")):
        from maskbit_tpu.compat.torch_convert import (
            convert_generator_state,
            convert_tokenizer_state,
            load_torch_state_dict,
        )

        state = load_torch_state_dict(path)
        if any(k.startswith(("encoder.", "decoder.")) for k in state):
            return convert_tokenizer_state(state)
        return convert_generator_state(state)

    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
