"""Array checkpoints: explicit config + arrays, no code execution.

Replaces the reference's source-embedding module pickles
(torch_utils/persistence.py:35-136 — unpickling exec()s code stored in the
checkpoint) with a safe format: a JSON config header plus a flax-serialization
msgpack blob of the pytree. Loading never executes checkpoint content.

Two artifact kinds, mirroring the reference cadence (train_lres.py:160-178):
  * G_ema checkpoints: {config, variables} — enough to rebuild the generator
    and run inference;
  * train checkpoints: the full GANState (params, EMAs, optimizer moments,
    ADA state, step) — resume is complete, unlike the reference where
    `start_step` exists but nothing loads the train pickle back
    (SURVEY section 5 checkpoint notes).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

_MAGIC = b"LVGTPU1\0"


def save_checkpoint(path: str, tree: Any, config: Optional[dict] = None) -> None:
    """Write {config, pytree} to `path` atomically."""
    tree = jax.tree.map(np.asarray, tree)
    # to_state_dict lowers flax dataclasses / optax namedtuples to plain dicts.
    blob = serialization.msgpack_serialize(serialization.to_state_dict(tree))
    header = json.dumps(config or {}).encode("utf-8")
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fp:
        fp.write(_MAGIC)
        fp.write(struct.pack("<Q", len(header)))
        fp.write(header)
        fp.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None) -> tuple[Any, dict]:
    """Read (pytree, config). With `target`, the tree is restored onto the
    target's structure (types/shapes validated); without, raw nested dicts."""
    with open(path, "rb") as fp:
        magic = fp.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"not a long_video_gan_tpu checkpoint: {path}")
        (header_len,) = struct.unpack("<Q", fp.read(8))
        config = json.loads(fp.read(header_len).decode("utf-8"))
        blob = fp.read()
    tree = serialization.msgpack_restore(blob)
    if target is not None:
        tree = serialization.from_state_dict(target, tree)
    return tree, config


def save_generator(path: str, variables: Any, config: dict) -> None:
    """Save a generator (G_ema) checkpoint: config describes the module class
    and constructor kwargs so `load_generator` can rebuild it."""
    save_checkpoint(path, variables, config)


def load_generator(path: str):
    """Rebuild (module, variables) from a generator checkpoint."""
    tree, config = load_checkpoint(path)
    kind = config.get("kind")
    kwargs = config.get("kwargs", {})
    if kind == "generator_lres":
        from ..models.generator_lres import VideoGenerator

        module = VideoGenerator(**kwargs)
    elif kind == "generator_sres":
        from ..models.generator_sres import VideoGenerator

        module = VideoGenerator(**kwargs)
    else:
        raise ValueError(f"unknown checkpoint kind: {kind!r}")
    return module, tree, config
