"""Checkpoint fetching with MD5 pinning.

Capability parity with the reference's weight fetcher
(reference: Lpips/utils.py:5-48 — URL/CKPT/MD5 maps, chunked download,
md5 check). This environment has zero network egress, so `download` raises a
clear error when the file is absent; a pre-placed file with a matching MD5 is
used as-is.
"""

from __future__ import annotations

import hashlib
import os

# name -> (url, md5) — the reference's LPIPS vgg.pth pin (Lpips/utils.py:5-17)
CKPT_MAP: dict[str, tuple[str, str]] = {
    "vgg_lpips": (
        "https://heibox.uni-heidelberg.de/f/607503859c864bc1b30b/?dl=1",
        "d507d7349b931f0638a25a48a722f98a",
    ),
}


def md5_hash(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_with_md5(url: str, path: str, md5: str | None = None,
                      chunk_size: int = 1 << 20) -> str:
    """Download url → path (chunked) and verify md5. In a no-egress
    environment this raises unless the file already exists and verifies."""
    if os.path.exists(path):
        if md5 is None or md5_hash(path) == md5:
            return path
        raise IOError(f"{path} exists but md5 mismatch (want {md5})")
    try:
        import urllib.request

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with urllib.request.urlopen(url, timeout=30) as r, open(path, "wb") as f:
            while True:
                chunk = r.read(chunk_size)
                if not chunk:
                    break
                f.write(chunk)
    except Exception as e:
        raise IOError(
            f"cannot fetch {url} (no network egress?); place the file at "
            f"{path} manually"
        ) from e
    if md5 is not None and md5_hash(path) != md5:
        raise IOError(f"downloaded {path} failed md5 check")
    return path


def get_ckpt_path(name: str, root: str = "~/.cache/sd_tpu") -> str:
    """Resolve a named pinned checkpoint (reference: Lpips/utils.py get_ckpt_path)."""
    url, md5 = CKPT_MAP[name]
    path = os.path.join(os.path.expanduser(root), f"{name}.pth")
    return download_with_md5(url, path, md5)
