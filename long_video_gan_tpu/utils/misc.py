"""Small shared helpers (shape contracts, EasyDict)."""

from __future__ import annotations

from typing import Any, Optional, Sequence


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert `x.shape` matches `ref_shape`; None entries are wildcards.

    Mirrors the reference's shape contracts at every module boundary
    (torch_utils/misc.py:82-95). Shapes are static under jit, so this costs
    nothing at runtime.
    """
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is not None and int(size) != int(ref_size):
            raise AssertionError(f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


class EasyDict(dict):
    """dict with attribute access (config trees)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]
