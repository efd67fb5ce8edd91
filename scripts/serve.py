"""Serve a trained text-to-image model over HTTP with request batching.

    python scripts/serve.py --config configs/sd_txt2img.yaml \
        --run runs/ldm32_catdog --port 8000 --max-batch 4

    curl -s localhost:8000/generate -d '{"prompt": "a photo of a cat",
        "steps": 30, "sampler": "dpm"}' | jq -r .image | base64 -d > cat.png

Deploys a training run (`Text2ImagePipeline.from_run` — UNet EMA weights,
first stage, persisted scale-factor calibration) or a bare config (random
weights, for smoke tests) behind `sd_tpu.serve.BatchingServer`: concurrent
same-shape requests are batched into one TPU invocation (see
sd_tpu/serve.py for the endpoint schema). Optionally shards over every
visible chip with `--shard`.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--run", default=None,
                    help="training run dir (ckpt + calibration); omit for "
                         "random weights (smoke)")
    ap.add_argument("--sd-checkpoint", default=None,
                    help="torch SD v1 checkpoint to import instead of --run")
    ap.add_argument("--lora", default=None,
                    help="LoRA file (.safetensors) to merge for serving")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--batch-window-ms", type=float, default=50.0)
    ap.add_argument("--steps", type=int, default=30,
                    help="default steps when a request omits them")
    ap.add_argument("--sampler", default="ddim",
                    help="default sampler when a request omits one")
    ap.add_argument("--shard", action="store_true",
                    help="shard_for_serving over all visible devices")
    ap.add_argument("--tome", type=float, default=0.0,
                    help="ToMe token-merge ratio (0 = off; ~0.5 typical)")
    ap.add_argument("--freeu", default=None,
                    help='FreeU "b1,b2,s1,s2" (e.g. "1.2,1.4,0.9,0.2")')
    ap.add_argument("--watermark", default=None,
                    help="invisible provenance mark on every output "
                         "(utils/watermark.py; verify_watermark to check)")
    args = ap.parse_args()

    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.serve import BatchingServer, make_http_server

    if args.sd_checkpoint:
        pipe = Text2ImagePipeline.from_sd_checkpoint(args.config,
                                                     args.sd_checkpoint)
    elif args.run:
        pipe = Text2ImagePipeline.from_run(args.config, args.run)
    else:
        pipe = Text2ImagePipeline.from_config(args.config)
    if args.lora:
        pipe.load_lora(args.lora)
    opts = {}
    if args.tome > 0:
        opts["tome_ratio"] = args.tome
    if args.freeu:
        opts["freeu"] = tuple(float(v) for v in args.freeu.split(","))
    if opts:
        pipe.set_unet_options(**opts)
    if args.shard:
        pipe.shard_for_serving()

    batcher = BatchingServer(
        pipe,
        max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        default_steps=args.steps,
        default_sampler=args.sampler,
        watermark=args.watermark,
    )
    batcher.start()
    server = make_http_server(batcher, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.stop()
        server.server_close()


if __name__ == "__main__":
    main()
