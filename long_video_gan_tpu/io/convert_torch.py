"""One-way converter: reference PyTorch checkpoints -> flax variable trees.

The reference ships whole-module pickles whose portability relies on executing
source code embedded in the pickle (torch_utils/persistence.py:35-136). We
replace that with explicit config + arrays-only checkpoints: this module maps a
torch `state_dict` onto our flax variables by name, never executing pickle
code beyond torch's own loader.

Name mapping rules:
  * flax path ("params", "temporal_layers_0", "affine_0", "weight")
    -> torch key "temporal_layers.0.affine_0.weight"; only true torch
    ModuleList containers get the `name_N -> name.N` rewrite (flax has no
    ModuleList, we name list submodules with `_N` suffixes).
  * magnitude EMA / w_avg buffers live in our "ema" collection but share the
    same dotted path.
  * static FIR filter buffers (blur_filters, output_scale, *.filter,
    resample_filter, Hz_*) are deterministic from config and are not loaded.

Weight layouts are identical (Linear [out, in], convNd [O, I, *k]), so the
mapping is a pure rename with shape assertions.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

# torch ModuleList attribute names per reference model (these need `_N -> .N`).
MODULE_LIST_NAMES = ("temporal_layers", "spatial_layers", "blocks", "resamples")

# Buffers that are static constants in the rebuild (recomputed from config).
_SKIP_BUFFER_RE = re.compile(
    r"(^|\.)(blur_filters|output_scale|filter|_downsample_filter|resample_filter|"
    r"up_filter|down_filter|Hz_geom|Hz_fbank|features|negate_mask\d?)$"
)


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    """Map a flax variable path (collection stripped) to a torch state_dict key."""
    parts = []
    for seg in path:
        m = re.fullmatch(r"(.+)_(\d+)", seg)
        if m and m.group(1) in MODULE_LIST_NAMES:
            parts.extend([m.group(1), m.group(2)])
        else:
            parts.append(seg)
    return ".".join(parts)


def torch_state_to_variables(state_dict: Mapping[str, Any], variables: Mapping[str, Any],
                             strict: bool = True) -> dict:
    """Fill a flax variable tree (as returned by `module.init`) from a torch
    state_dict. Returns a new tree; raises on shape mismatches and (if strict)
    on our-side leaves missing from the state_dict."""
    import jax

    state = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in state_dict.items()}
    used = set()
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}

    def set_leaf(tree, path, value):
        node = tree
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = value

    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        collection, subpath = path[0], path[1:]
        torch_key = flax_path_to_torch_key(subpath)
        if torch_key not in state:
            if strict:
                raise KeyError(f"torch state_dict has no entry for {collection}/{torch_key}")
            set_leaf(out, path, leaf)
            continue
        value = state[torch_key]
        if tuple(value.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {torch_key}: torch {value.shape} vs ours {np.shape(leaf)}"
            )
        set_leaf(out, path, value.astype(np.asarray(leaf).dtype))
        used.add(torch_key)

    unused = [k for k in state if k not in used and not _SKIP_BUFFER_RE.search(k)]
    if strict and unused:
        raise KeyError(f"unconverted torch entries (non-filter): {unused[:10]}"
                       f"{' ...' if len(unused) > 10 else ''}")
    return out


def install_reference_unpickle_shims() -> None:
    """Shim pkg_resources (removed from modern setuptools) so the reference's
    conv2d_gradfix torch-version check — executed by the source embedded in
    its persistence pickles — imports cleanly. Idempotent."""
    import sys
    import types

    if "pkg_resources" in sys.modules:
        return
    try:
        from packaging.version import parse as _parse_version
    except Exception:  # pragma: no cover
        def _parse_version(v):
            return tuple(int(p) for p in v.split("+")[0].split(".") if p.isdigit())
    shim = types.ModuleType("pkg_resources")
    shim.parse_version = _parse_version
    sys.modules["pkg_resources"] = shim


def load_reference_pickle_state(path: str) -> tuple[dict, dict]:
    """Unpickle a reference G_ema pickle and return (state_dict, init_kwargs).

    Requires the reference repo on sys.path (the pickle reconstructs classes
    from embedded source via torch_utils.persistence). Used only by the
    conversion CLI, never at train/inference time.
    """
    import pickle

    import torch  # noqa: F401 — must be importable for tensor deserialization

    install_reference_unpickle_shims()
    with open(path, "rb") as fp:
        module = pickle.load(fp)
    init_kwargs = dict(getattr(module, "init_kwargs", {}))
    return {k: v for k, v in module.state_dict().items()}, init_kwargs
