"""Component registries (detectron2-style).

The reference wires its components through d2 registries —
`META_ARCH_REGISTRY` (ref: maskformer_model.py:28), `BACKBONE_REGISTRY`
(ref: backbone/pvtv2.py:391), `SEM_SEG_HEADS_REGISTRY`
(ref: meta_arch/mask_former_head.py:18, pixel_decoder/msdeformattn.py:168,
fpn.py:37,198), `TRANSFORMER_DECODER_REGISTRY`
(ref: transformer_decoder/transformer_decoder.py:15). This module provides
the same extension surface so new backbones/heads/decoders plug in by name.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Callable] = {}

    def register(self, obj: Callable = None, *, name: str = None):
        def deco(fn):
            key = name or fn.__name__
            if key in self._map:
                raise KeyError(f"{key!r} already registered in {self._name}")
            self._map[key] = fn
            return fn

        return deco(obj) if obj is not None else deco

    def get(self, name: str) -> Callable:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in {self._name} registry; "
                f"available: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def __iter__(self) -> Iterator[str]:
        return iter(self._map)


BACKBONE_REGISTRY = Registry("BACKBONE")
SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
TRANSFORMER_DECODER_REGISTRY = Registry("TRANSFORMER_DECODER")
META_ARCH_REGISTRY = Registry("META_ARCH")
