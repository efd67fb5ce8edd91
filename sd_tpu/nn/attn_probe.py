"""Trace-time self-attention probability capture.

Infrastructure for guidance/visualization features that need the softmax
attention maps (e.g. Self-Attention Guidance, arXiv:2210.00939): inside
`capture_self_attention(...)`, any `CrossAttention` self-attention call
whose module path matches routes through the explicit-logits path and
`sow`s its probabilities into the "intermediates" collection. Callers must
apply the model with `mutable=["intermediates"]` to receive them.

This is a trace-time switch (a ContextVar, per ADVICE.md's guidance on
trace-time flags): it affects which graph is TRACED, so the context must
wrap the `.apply(...)` call (which, under jit, happens during tracing).
The flash kernels never materialize probabilities — capture deliberately
falls back to the explicit einsum attention, which is cheap at the small
token counts (mid-block: ≤ 256 tokens) this exists for.

No reference counterpart: the reference's torch attention
(openai_model/attention.py:77-94) materializes probs but never exposes
them; capture-and-guide is a beyond-reference serving feature.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Iterator

# (path_substring, max_tokens, kind) — capture attention probs in modules
# whose scope path contains path_substring, for query-token counts
# N <= max_tokens; kind selects self-attention, cross-attention, or both.
_CAPTURE: contextvars.ContextVar[tuple[str, int, str] | None] = (
    contextvars.ContextVar("sd_tpu_attn_capture", default=None))

SOW_NAME = "attn_probs"


@contextlib.contextmanager
def capture_attention(path_substr: str = "mid_attn",
                      max_tokens: int = 1024,
                      kind: str = "self") -> Iterator[None]:
    """Enable attention prob capture while tracing inside this context.
    kind: "self" (context is None), "cross", or "any"."""
    if kind not in ("self", "cross", "any"):
        raise ValueError(f"kind must be self/cross/any, got {kind!r}")
    token = _CAPTURE.set((path_substr, max_tokens, kind))
    try:
        yield
    finally:
        _CAPTURE.reset(token)


def capture_self_attention(path_substr: str = "mid_attn",
                           max_tokens: int = 1024):
    """Self-attention capture (the SAG probe, diffusion/sag.py)."""
    return capture_attention(path_substr, max_tokens, "self")


def capture_spec() -> tuple[str, int, str] | None:
    return _CAPTURE.get()


def wants_capture(path: tuple[str, ...], n_tokens: int,
                  is_self: bool = True) -> bool:
    spec = _CAPTURE.get()
    if spec is None:
        return False
    substr, max_tokens, kind = spec
    if kind == "self" and not is_self:
        return False
    if kind == "cross" and is_self:
        return False
    return n_tokens <= max_tokens and any(substr in p for p in path)


def collect_all_sown_probs(intermediates: dict,
                           path_substr: str = "") -> dict[str, Any]:
    """All sown attention-prob arrays whose path matches `path_substr`
    (empty = everything), as {'a/b/attn1': probs, ...} from an
    `intermediates` collection returned by
    `module.apply(..., mutable=["intermediates"])`."""
    hits: dict[str, Any] = {}

    def walk(node: Any, path: tuple[str, ...]) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                if k == SOW_NAME and (not path_substr or
                                      any(path_substr in p for p in path)):
                    # sow() accumulates a tuple per trace
                    hits["/".join(path)] = v[0]
                else:
                    walk(v, path + (k,))

    walk(intermediates.get("intermediates", intermediates), ())
    return hits


def collect_sown_probs(intermediates: dict, path_substr: str = "mid_attn"):
    """The first (path-sorted) sown attention-prob array matching
    `path_substr`; raises if none was captured."""
    hits = collect_all_sown_probs(intermediates, path_substr)
    if not hits:
        raise ValueError(
            f"no sown {SOW_NAME!r} under a path containing {path_substr!r} — "
            "was the model applied inside capture_attention(...) with "
            "mutable=['intermediates']?")
    return hits[min(hits)]
