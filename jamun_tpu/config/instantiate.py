"""Config-driven object instantiation (Hydra `_target_`/`_partial_` semantics).

Reference uses Hydra 1.3 throughout (`/root/reference/src/jamun/hydra_config/`,
SURVEY §5.6); hydra is not in this environment, so this module implements the
subset the framework needs: `_target_` dotted-path lookup, `_partial_`
factories, recursive instantiation, and `instantiate_dict_cfg` list helpers
(`/root/reference/src/jamun/hydra/utils.py:11-29`).
"""

from __future__ import annotations

import functools
import importlib
from typing import Any, Dict, List

__all__ = ["locate", "instantiate", "instantiate_dict_cfg"]


def locate(path: str):
    """Import a dotted path like "jamun_tpu.models.E3Conv"."""
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = mod
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"cannot locate {path!r}")


def instantiate(cfg: Any, **extra_kwargs) -> Any:
    """Recursively build objects from dicts with `_target_` keys."""
    if isinstance(cfg, list):
        return [instantiate(v) for v in cfg]
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        return {k: instantiate(v) for k, v in cfg.items()}
    target = locate(cfg["_target_"])
    kwargs = {
        k: instantiate(v)
        for k, v in cfg.items()
        if not (k.startswith("_") and k.endswith("_"))
    }
    kwargs.update(extra_kwargs)
    if cfg.get("_partial_", False):
        return functools.partial(target, **kwargs)
    return target(**kwargs)


def instantiate_dict_cfg(cfg: Dict[str, Any], verbose: bool = False) -> List[Any]:
    """Instantiate every `_target_` entry of a dict of configs -> list."""
    out = []
    if not cfg:
        return out
    for name, sub in cfg.items():
        if isinstance(sub, dict) and "_target_" in sub:
            out.append(instantiate(sub))
    return out
