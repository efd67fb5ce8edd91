"""Config system: the reference's `target/params` reflection plus YAML loading.

Capability parity with instantiate_from_config / get_obj_from_str, which the
reference implements five times (reference: ldm/utils.py:78-93,
DDIM/util.py:4-18, Diffusion/utils.py:223-253, vqvae/utils.py:5-28,
VAE/autoencoder.py:15-28) — implemented once here. Reference YAML configs port
1:1: `{"target": "pkg.Class", "params": {...}}`.

Sentinel targets `__is_first_stage__` / `__is_unconditional__` are honored
(reference: ldm/diffusion/ddpm.py:741-765).
"""

from __future__ import annotations

import importlib
from typing import Any, Mapping


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Mapping[str, Any], **extra_kwargs: Any) -> Any:
    if "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    target = config["target"]
    if target in ("__is_first_stage__", "__is_unconditional__"):
        return None
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return get_obj_from_str(target)(**params)


def load_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
