"""HTTP serving daemon with request micro-batching.

Production-serving surface the reference never had (its closest analog is
the hand-run sampling scripts, e.g. `Diffusion/main.py` and
`VAE/test/test.py`): a long-lived process that owns one compiled
`Text2ImagePipeline` and turns concurrent HTTP requests into batched
TPU invocations.

TPU rationale: a v5e chip is throughput hardware — one 4-image DDIM pass
costs barely more wall-clock than a 1-image pass (the UNet matmuls at
batch 1 underfill the MXU), so batching concurrent requests is the single
biggest serving-efficiency lever. The batcher groups requests by their
*compilation key* (steps, sampler, guidance, size, ...) so grouped work
shares one jitted program, collects up to `max_batch` prompts inside a
`batch_window_ms` window, and runs them as one `pipeline.generate` call.

Endpoints (JSON over HTTP; stdlib http.server — zero dependencies):
  POST /generate  {"prompt": str, "negative_prompt"?, "steps"?,
                   "guidance_scale"?, "sampler"?, "seed"?, "width"?,
                   "height"?, "guidance_rescale"?, "sag_scale"?}
                  → {"image": <base64 PNG>, "batch_size": n, "seed": s}
  GET  /healthz   → {"ok": true, "queue_depth": d}

Determinism: a request carrying "seed" is reproducible — the seed joins
the batching key, so identically-seeded requests share a batch and the
per-request noise stream is folded from (seed, slot). Requests without a
seed are assigned one and report it back.

Run via `scripts/serve.py`.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np

ALLOWED_SAMPLERS = ("ddim", "dpm", "dpm_sde", "unipc", "plms", "euler",
                    "euler_a", "heun", "ddpm",
                    # few-step consistency students (train/distill.py) and
                    # flow-matching models (diffusion/flow.py) — the
                    # model-family guards in LatentDiffusion.sample reject
                    # a mismatched request with a clear error
                    "lcm", "flow", "flow_midpoint")


def _png_b64(img: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(img, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


@dataclass
class _Request:
    prompt: str
    negative_prompt: str
    key: tuple          # batching/compilation key (see _make_key)
    kwargs: dict        # generate() kwargs shared by everyone with this key
    event: threading.Event = field(default_factory=threading.Event)
    image: np.ndarray | None = None
    error: str | None = None
    batch_size: int = 0


def _make_key(params: dict, explicit_seed: bool) -> tuple:
    """Everything that changes the compiled program or the sampled batch
    must be in the key; prompt/negative_prompt are per-slot payload.
    Auto-seeded requests key their seed as None so they batch freely (the
    group adopts its first member's seed and reports it back); an explicit
    seed joins the key for reproducibility."""
    return (
        int(params["steps"]),
        str(params["sampler"]),
        float(params["guidance_scale"]),
        float(params["guidance_rescale"]),
        float(params["eta"]),
        params["height"],
        params["width"],
        int(params["seed"]) if explicit_seed else None,
        params["clip_skip"],
        float(params.get("sag_scale", 0.0)),
    )


class BatchingServer:
    """Micro-batching front-end around a Text2ImagePipeline-like object.

    `pipeline` only needs a `.generate(prompts, negative_prompt=..., ...)
    -> uint8 [B, H, W, 3]` method, which keeps the batcher unit-testable
    with a stub and lets it serve any pipeline variant (LoRA-merged,
    sharded via shard_for_serving, ...).
    """

    def __init__(
        self,
        pipeline: Any,
        max_batch: int = 4,
        batch_window_ms: float = 50.0,
        default_steps: int = 30,
        default_sampler: str = "ddim",
        default_guidance: float = 7.5,
        queue_limit: int = 64,
        request_timeout_s: float = 600.0,
        watermark: str | None = None,
    ):
        self.pipeline = pipeline
        # server-wide provenance mark (utils/watermark.py); applied to
        # every generated image when set — not a per-request knob
        self.watermark = watermark
        self.max_batch = int(max_batch)
        self.batch_window_s = float(batch_window_ms) / 1e3
        self.default_steps = int(default_steps)
        self.default_sampler = default_sampler
        self.default_guidance = float(default_guidance)
        self.request_timeout_s = float(request_timeout_s)
        self._queue: queue.Queue[_Request] = queue.Queue(maxsize=queue_limit)
        self._stop = threading.Event()
        self._worker: threading.Thread | None = None
        self._seed_lock = threading.Lock()
        self._auto_seed = int(time.time()) & 0x7FFFFFFF
        self.batches_run = 0
        self.requests_served = 0

    # ------------------------------------------------------------- public --

    def start(self) -> None:
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stop(self) -> None:
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=5)

    def queue_depth(self) -> int:
        return self._queue.qsize()

    def submit(self, body: dict) -> dict:
        """Validate one request body, enqueue it, wait for its image."""
        req = self._validate(body)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise RuntimeError("server overloaded: queue full")
        if not req.event.wait(self.request_timeout_s):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return {
            "image": _png_b64(req.image),
            "batch_size": req.batch_size,
            "seed": req.kwargs["seed"],
        }

    # ----------------------------------------------------------- internal --

    def _validate(self, body: dict) -> _Request:
        if not isinstance(body, dict) or "prompt" not in body:
            raise ValueError('body must be a JSON object with "prompt"')
        prompt = body["prompt"]
        if not isinstance(prompt, str) or not prompt.strip():
            raise ValueError('"prompt" must be a non-empty string')
        sampler = body.get("sampler", self.default_sampler)
        if sampler not in ALLOWED_SAMPLERS:
            raise ValueError(f'unknown sampler {sampler!r}; '
                             f'one of {ALLOWED_SAMPLERS}')
        steps = int(body.get("steps", self.default_steps))
        if not 1 <= steps <= 1000:
            raise ValueError("steps must be in [1, 1000]")
        if "seed" in body:
            seed = int(body["seed"])
        else:
            with self._seed_lock:
                self._auto_seed = (self._auto_seed * 6364136223846793005
                                   + 1442695040888963407) & 0x7FFFFFFF
                seed = self._auto_seed
        for dim in ("width", "height"):
            if body.get(dim) is not None and int(body[dim]) % 8 != 0:
                raise ValueError(f"{dim} must be a multiple of 8")
        params = {
            "steps": steps,
            "sampler": sampler,
            "guidance_scale": float(body.get("guidance_scale",
                                             self.default_guidance)),
            "guidance_rescale": float(body.get("guidance_rescale", 0.0)),
            "eta": float(body.get("eta", 0.0)),
            "height": int(body["height"]) if body.get("height") else None,
            "width": int(body["width"]) if body.get("width") else None,
            "seed": seed,
            "clip_skip": int(body["clip_skip"]) if body.get("clip_skip")
                         else None,
            "sag_scale": float(body.get("sag_scale", 0.0)),
        }
        if params["sag_scale"] > 0.0 and sampler != "ddim":
            raise ValueError("sag_scale requires the ddim sampler")
        return _Request(
            prompt=prompt,
            negative_prompt=str(body.get("negative_prompt", "")),
            key=_make_key(params, explicit_seed="seed" in body),
            kwargs=params,
        )

    def _drain_group(self, first: _Request) -> list[_Request]:
        """Collect up to max_batch same-key requests within the window.
        Different-key requests seen while draining go back to the queue."""
        group = [first]
        putback: list[_Request] = []
        deadline = time.monotonic() + self.batch_window_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt.key == first.key:
                group.append(nxt)
            else:
                putback.append(nxt)
        for r in putback:
            self._queue.put(r)
        return group

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            group = self._drain_group(first)
            params = dict(group[0].kwargs)
            for r in group:  # the whole group ran under this seed
                r.kwargs["seed"] = params["seed"]
            prompts = [r.prompt for r in group]
            negatives = [r.negative_prompt for r in group]
            # Pad to the next power-of-two bucket: jit compiles one program
            # per batch size, and a first-hit compile is minutes on TPU, so
            # unpadded groups would make serving latency depend on the
            # arrival pattern (group of 3 → fresh B3 program). Buckets bound
            # the program count to log2(max_batch)+1; the pad slots are
            # nearly free on TPU (a B4 UNet call costs ~ a B3 one — the MXU
            # is underfilled either way) and are sliced off below.
            bucket = 1
            while bucket < len(group):
                bucket *= 2
            for _ in range(bucket - len(group)):
                prompts.append(prompts[-1])
                negatives.append(negatives[-1])
            try:
                imgs = self.pipeline.generate(
                    prompts,
                    negative_prompt=negatives,
                    num_steps=params["steps"],
                    guidance_scale=params["guidance_scale"],
                    guidance_rescale=params["guidance_rescale"],
                    sampler=params["sampler"],
                    seed=params["seed"],
                    height=params["height"],
                    width=params["width"],
                    clip_skip=params["clip_skip"],
                    **({"eta": params["eta"]}
                       if params["sampler"] == "ddim" else {}),
                    **({"sag_scale": params["sag_scale"]}
                       if params.get("sag_scale", 0.0) > 0.0 else {}),
                    **({"watermark": self.watermark}
                       if self.watermark else {}),
                )
                for i, r in enumerate(group):
                    r.image = np.asarray(imgs[i])
                    r.batch_size = len(group)
            except Exception as e:  # surface to every waiter, keep serving
                for r in group:
                    r.error = f"{type(e).__name__}: {e}"
            self.batches_run += 1
            self.requests_served += len(group)
            for r in group:
                r.event.set()


def make_http_server(batcher: BatchingServer, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Bind the batcher to a threaded stdlib HTTP server (port 0 = ephemeral;
    the bound port is `server.server_address[1]`). Caller runs
    `server.serve_forever()` (or in a thread) and `batcher.start()`."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: metrics live on the batcher
            pass

        def _reply(self, code: int, payload: dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "queue_depth": batcher.queue_depth(),
                                  "requests_served": batcher.requests_served,
                                  "batches_run": batcher.batches_run})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "invalid JSON body"})
                return
            try:
                self._reply(200, batcher.submit(body))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except TimeoutError as e:
                self._reply(504, {"error": str(e)})
            except RuntimeError as e:
                code = 503 if "overloaded" in str(e) else 500
                self._reply(code, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)
