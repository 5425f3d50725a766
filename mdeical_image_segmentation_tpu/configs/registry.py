"""Name → constructor registries.

The reference resolves component names by runtime reflection over module paths
(`get_class`, /root/reference/model/unet3d/utils.py:360-366) for models,
datasets, slice builders, losses and metrics.  We replace that with explicit
registries: a small decorator-based map per component family.  Explicit
registration keeps the lookup table greppable and lets us attach TPU-specific
metadata (e.g. whether a transform is device-jittable) later.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional


class Registry:
    """A string → constructor map with a decorator interface.

    >>> MODELS = Registry("model")
    >>> @MODELS.register("UNet3D")
    ... class UNet3D: ...
    >>> MODELS.get("UNet3D") is UNet3D
    True
    """

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: Optional[str] = None, *aliases: str) -> Callable:
        def deco(obj):
            key = name or obj.__name__
            for k in (key, *aliases):
                if k in self._entries and self._entries[k] is not obj:
                    raise KeyError(f"duplicate {self.kind} registration: {k!r}")
                self._entries[k] = obj
            return obj

        return deco

    def get(self, name: str) -> Any:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {known}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> Iterable[str]:
        return sorted(self._entries)


def get_class(name: str, registries: Iterable[Registry]) -> Any:
    """Look `name` up across several registries (first hit wins).

    Mirrors the reference's multi-module reflection
    (model/unet3d/utils.py:360-366) without importlib tricks.
    """
    for reg in registries:
        if name in reg:
            return reg.get(name)
    kinds = ", ".join(r.kind for r in registries)
    raise KeyError(f"{name!r} not found in registries: {kinds}")
