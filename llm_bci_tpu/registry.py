"""Model / dataset registries — the framework's extension point.

The reference exposes plain dicts ``NAME2MODEL`` / ``NAME2DATASET``
(``models/trainer.py:32,36``). We keep the same names and dict semantics but
back them with a registration decorator so user code can add entries without
editing the framework.
"""
from __future__ import annotations

from typing import Callable, Dict, Type

NAME2MODEL: Dict[str, Type] = {}
NAME2DATASET: Dict[str, Type] = {}


def register_model(name: str) -> Callable[[Type], Type]:
    def deco(cls: Type) -> Type:
        NAME2MODEL[name] = cls
        return cls

    return deco


def register_dataset(name: str) -> Callable[[Type], Type]:
    def deco(cls: Type) -> Type:
        NAME2DATASET[name] = cls
        return cls

    return deco
