"""ImageNet preparation helpers.

Capability parity with the reference's data utilities
(reference: Diffusion/data/utils.py:5-194 — synset/human-label maps, nested
config `retrieve`, prepared-marker files, file downloads;
Diffusion/data/test.py:5-23 — validation filelist generator).
"""

from __future__ import annotations

import os
from typing import Any


def retrieve(d: Any, key: str, default=None, expand: bool = True):
    """Fetch a '/'-separated nested key from dicts/lists; callables are
    expanded (reference: Diffusion/data/utils.py retrieve)."""
    keys = key.split("/")
    node = d
    try:
        for k in keys:
            if callable(node) and expand:
                node = node()
            if isinstance(node, (list, tuple)):
                node = node[int(k)]
            else:
                node = node[k]
        if callable(node) and expand:
            node = node()
    except (KeyError, IndexError, TypeError, ValueError):
        return default
    return node


def mark_prepared(root: str) -> None:
    """Touch the prepared-marker file (reference: .ready marker)."""
    os.makedirs(root, exist_ok=True)
    open(os.path.join(root, ".ready"), "a").close()


def is_prepared(root: str) -> bool:
    return os.path.exists(os.path.join(root, ".ready"))


def synset2idx(path_to_yaml: str) -> dict[str, int]:
    """Map synset ids (n01440764, ...) to class indices from a yaml of
    `idx: synset` lines (reference: give_synsets_from_indices machinery)."""
    import yaml

    with open(path_to_yaml) as f:
        di2s = yaml.safe_load(f)
    return {v: int(k) for k, v in di2s.items()}


def str_to_indices(string: str) -> list[int]:
    """'0,3-5,9' → [0, 3, 4, 5, 9] (reference: Diffusion/data/utils.py)."""
    assert not string.endswith(","), "provided string ends with a comma"
    out = []
    for part in string.split(","):
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return out


def give_synsets_from_indices(indices: list[int] | None,
                              path_to_yaml: str) -> list[str] | None:
    """Class indices → synset ids via the yaml map."""
    if indices is None:
        return None
    import yaml

    with open(path_to_yaml) as f:
        di2s = yaml.safe_load(f)
    return [di2s[i] for i in indices]


def write_filelist(image_dir: str, out_path: str, suffix: str = ".JPEG") -> int:
    """Write a sorted filelist of images under image_dir
    (reference: Diffusion/data/test.py ILSVRC2012 filelist generator).
    Returns the number of entries."""
    names = sorted(
        f for f in os.listdir(image_dir) if f.endswith(suffix)
    )
    with open(out_path, "w") as f:
        f.write("\n".join(names))
    return len(names)
