"""Measure serving throughput under concurrent load: micro-batching on vs off.

Drives the real HTTP server (scripts/serve.py machinery, in-process on an
ephemeral port) with N concurrent single-clip DDIM requests against the
config_v2_2-scale model, and measures wall-clock to drain them all:

  - batching ON  (the default 50 ms window): requests coalesce into ~1
    batched device call — the chip saturates near batch 8, so the marginal
    clip is nearly free;
  - batching OFF (--no-batching semantics): the device lock serializes N
    full sampler invocations.

Weights are random (timing is weight-independent); pass --checkpoint-path
to measure a real model. Prints one JSON line with both throughputs and
the speedup.

Usage: python scripts/bench_serve.py [--requests 8] [--num-steps 50]
       [--config C --checkpoint-path P --step N]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url + "/sample",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=1200) as r:
            return json.loads(r.read())
    except ConnectionResetError:
        # One retry: a connect burst can be dropped while the device call
        # holds the accept loop (the server's backlog is finite).
        with urllib.request.urlopen(req, timeout=1200) as r:
            return json.loads(r.read())


def drain(url: str, n: int, num_steps: int) -> tuple[float, list[dict]]:
    """Fire n concurrent 1-clip requests; return (wall_s, responses)."""
    payloads = [
        {"sampler": "ddim", "num_steps": num_steps, "seed": s, "batch_size": 1}
        for s in range(n)
    ]
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=n) as ex:
        outs = list(ex.map(lambda p: post(url, p), payloads))
    return time.perf_counter() - t0, outs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--requests", default="8",
                    help="comma list of concurrent-client counts, e.g. 2,8,16")
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint-path", default=None)
    ap.add_argument("--step", type=int, default=0)
    args = ap.parse_args()

    import threading

    import jax
    from flax import nnx

    import serve as serve_mod

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D
    from video_diffusion_nnx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.config:
        from video_diffusion_nnx_tpu.config import build_models, load_config

        config = load_config(args.config)
        _, model = build_models(config)
        if args.checkpoint_path:
            from video_diffusion_nnx_tpu.utils import load_checkpoint

            model, _ = load_checkpoint(
                model, args.step, str(Path(args.checkpoint_path).resolve()),
                load_ema_params=True,
            )
    else:
        unet = Unet3D(
            dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=1,
            compute_dtype="bfloat16", use_fused_attention=True,
            use_fused_spatial_attention=True,
        )
        model = GaussianDiffusion(
            unet, image_size=64, num_frames=16, channels=1, timesteps=250,
            loss_type="l2",
        )

    request_counts = [int(n) for n in str(args.requests).split(",")]
    result = {"requests": request_counts, "num_steps": args.num_steps}

    def run_mode(window, tag):
        httpd = serve_mod.create_server(
            model, host="127.0.0.1", port=0, batch_window_s=window
        )
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        url = "http://%s:%d" % httpd.server_address
        for n in request_counts:
            # Warm-up: compile the programs this (mode, n) uses (solo shape
            # for unbatched; solo + coalesced shapes for batched).
            drain(url, 1, args.num_steps)
            if window is not None:
                drain(url, n, args.num_steps)
            # Best of 2: a single drain can eat a transient tunnel stall
            # (measured: 13.1 s for a warm batch-8 drain that repeats at
            # ~2.6 s).
            wall, outs = drain(url, n, args.num_steps)
            wall2, outs2 = drain(url, n, args.num_steps)
            if wall2 < wall:
                wall, outs = wall2, outs2
            groups = sorted({o.get("coalesced", 1) for o in outs}, reverse=True)
            result[f"{tag}_n{n}_wall_s"] = round(wall, 3)
            result[f"{tag}_n{n}_clips_per_s"] = round(n / wall, 3)
            result[f"{tag}_n{n}_max_group"] = groups[0]
            print(
                f"[{tag} n={n}] {n} reqs in {wall:.2f}s "
                f"({n / wall:.2f} clips/s, groups {groups})",
                file=sys.stderr,
            )
        httpd.shutdown()

    run_mode(0.25, "batched")
    run_mode(None, "serial")
    for n in request_counts:
        result[f"speedup_n{n}"] = round(
            result[f"serial_n{n}_wall_s"] / result[f"batched_n{n}_wall_s"], 2
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
