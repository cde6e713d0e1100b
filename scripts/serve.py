"""Sampling server (production-serving surface beyond the reference).

Loads a checkpoint once, keeps compiled samplers warm in the bounded LRU
(`diffusion/gaussian_diffusion.py`), and serves guided/unconditional video
generation over HTTP — stdlib only, no new dependencies.

    python scripts/serve.py --config configs/config_v2_2.yaml \
        --checkpoint-path results/checkpoints --step 100000 \
        --load-ema-params --port 8080 [--warmup]

API
---
GET  /health  -> {"status": "ok", "devices": N, "model": {...}}
POST /extend  (JSON body) -> frame-conditional generation:
    {"known_npy_b64": <base64 of a .npy (c,f,h,w) float array in [0,1]>,
     "frame_mask": [true, ..., false], "batch_size": 2, "num_steps": 50,
     "recon_guidance": 0.0, "seed": 0, "text": [...], "cond_scale": 1.0}
    -> same response shape as /sample. num_steps defaults to DDIM-50;
    pass an explicit null to run the full T-step DDPM chain.
POST /sample  (JSON body) ->
    {"batch_size": 2, "sampler": "ddim", "num_steps": 50, "eta": 0.0,
     "grid": "linspace", "seed": 0, "text": ["a caption"], "cond_scale": 2.0}
    -> {"gifs": [<base64 GIF per clip>], "time_s": ..., "shape": [...]}
    Default sampler: ddim (the path --warmup compiles). "ddpm" runs the
    full T-step chain; knobs a sampler would ignore are rejected with 400.

Device calls are serialized behind a lock (one accelerator, one program at
a time); repeated (shape, sampler) pairs reuse the compiled executable, so
steady-state latency is the pure sampler wall-clock (bench.py: 2.4 s for
DDIM-50 at batch 8, 0.33 s for a 4-step distilled student).

Micro-batching (v2): concurrent /sample requests using a deterministic ODE
sampler (ddim at eta=0, dpm) are COALESCED into one batched device call.
Each request's x_T is derived from its own seed exactly as the solo keyed
path would draw it, and at eta=0 every output row is a pure function of its
own x_T (tested: test_gaussian_diffusion.py::test_ddim_init_noise_batch_
coalescing), so coalescing changes no request's result. The chip saturates
near batch 8, so N queued DDIM-50 requests cost ~1 sampler call instead of
N. Coalesced batches pad to the next power of two (rows reused from the
batch) so each request-shape group compiles at most log2(max_rows)+1
programs — remote compiles cost minutes, so bounding the compile set is
what makes dynamic batching viable. Disable with --no-batching.

Measured (scripts/bench_serve.py against the trained flagship checkpoint,
one v5e chip, warm, best-of-2 — results/bench_serve.json): coalescing
lifts throughput 1.41x at 8 concurrent DDIM-50 clients (2.68 -> 3.77
clips/s) and 1.46x at 16 (2.60 -> 3.79); at 2 clients the batching window
costs 15% (0.85x) — the dim-32 model is small enough that a solo clip
already runs at ~0.38 s, so the coalescing win is bounded by the
b1-vs-b8/8 per-clip ratio, not the naive 8x.
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import sys
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

log = logging.getLogger("serve")

_ALLOWED_SAMPLERS = ("ddpm", "ddim", "dpm")


def _coerce(req: dict, key: str, cast, default):
    """Fetch-and-cast a request scalar; malformed values (JSON null, lists,
    objects) become ValueError -> HTTP 400 like every other validation
    failure, not the 500 a bare TypeError would get."""
    val = req.get(key, default)
    try:
        return cast(val)
    except (TypeError, ValueError):
        raise ValueError(f"{key} must be a {cast.__name__}") from None


class _Pending:
    """One request's share of a (possibly coalesced) batch."""

    __slots__ = (
        "noise", "cond", "event", "rows", "group_size", "error", "t_enq", "wait_s"
    )

    def __init__(self, noise, cond):
        self.noise = noise
        self.cond = cond
        self.event = threading.Event()
        self.rows = None
        self.group_size = 1
        self.error = None
        self.t_enq = time.monotonic()
        self.wait_s = 0.0


class MicroBatcher:
    """Coalesces concurrent, compatible sampler requests into one device call.

    Requests are bucketed by a group key (sampler, num_steps, grid,
    cond_scale, conditioned?); the dispatcher takes the bucket holding the
    oldest pending request, lingers up to ``window_s`` for same-key arrivals
    (or until ``max_rows`` samples are queued), then hands the whole bucket
    to ``run_batch`` in one call. Results are split back per request.

    Correctness rests on the samplers' ``init_noise`` contract: at eta=0
    the chain is an ODE, so each output row depends only on its own x_T —
    stacking requests is observationally identical to running them solo.
    """

    def __init__(self, run_batch, max_rows: int = 8, window_s: float = 0.05):
        self._run_batch = run_batch
        self.max_rows = max_rows
        self.window_s = window_s
        self._buckets: dict = {}
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(
            target=self._loop, name="micro-batcher", daemon=True
        )
        self._thread.start()

    def submit(self, group_key, noise, cond):
        """Block until this request's rows are sampled; returns
        ``(rows, group_size, queue_wait_s)``."""
        p = _Pending(noise, cond)
        with self._cv:
            self._buckets.setdefault(group_key, []).append(p)
            self._cv.notify_all()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.rows, p.group_size, p.wait_s

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _take_batch(self):
        """(Under the cv) pick the bucket with the oldest request, linger
        for the batching window, then pop up to max_rows samples from it."""
        key = min(
            (k for k, b in self._buckets.items() if b),
            key=lambda k: self._buckets[k][0].t_enq,
        )
        deadline = self._buckets[key][0].t_enq + self.window_s
        while not self._stop:
            rows = sum(p.noise.shape[0] for p in self._buckets[key])
            now = time.monotonic()
            if rows >= self.max_rows or now >= deadline:
                break
            self._cv.wait(timeout=deadline - now)
        bucket = self._buckets[key]
        batch, taken = [], 0
        while bucket and taken + bucket[0].noise.shape[0] <= self.max_rows:
            p = bucket.pop(0)
            batch.append(p)
            taken += p.noise.shape[0]
        if not batch:  # single request larger than max_rows: run it alone
            batch.append(bucket.pop(0))
        if not bucket:
            del self._buckets[key]
        return key, batch

    def _loop(self):
        while True:
            with self._cv:
                while not self._stop and not any(self._buckets.values()):
                    self._cv.wait()
                if self._stop:
                    return
                key, batch = self._take_batch()
            t_run = time.monotonic()
            try:
                out = self._run_batch(key, batch)
                off = 0
                for p in batch:
                    n = p.noise.shape[0]
                    p.rows = out[off : off + n]
                    p.group_size = len(batch)
                    p.wait_s = t_run - p.t_enq
                    off += n
            except Exception as e:  # noqa: BLE001 — deliver to every waiter
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    p.event.set()


class SamplingService:
    """Owns the model and serializes sampler invocations."""

    def __init__(self, model, batch_window_s: float | None = 0.05,
                 max_batch_rows: int = 8):
        self.model = model
        self.lock = threading.Lock()
        self.batcher = (
            MicroBatcher(self._run_batch, max_batch_rows, batch_window_s)
            if batch_window_s is not None
            else None
        )

    def _run_batch(self, group_key, batch):
        """Execute one coalesced sampler call (dispatcher thread)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        sampler, num_steps, grid, cond_scale, _ = group_key
        noise = jnp.concatenate([p.noise for p in batch])
        cond = None
        if batch[0].cond is not None:
            cond = jnp.concatenate([p.cond for p in batch])
        n = noise.shape[0]
        # Pad to the next power of two (reusing the batch's own rows) so
        # each group key needs at most log2(max_rows)+1 compiled programs.
        npad = 1 << (n - 1).bit_length()
        if npad > n:
            reps = -(-(npad - n) // n) + 1
            noise = jnp.concatenate([noise] * reps)[:npad]
            if cond is not None:
                cond = jnp.concatenate([cond] * reps)[:npad]
        key = jax.random.PRNGKey(0)  # unused: x_T is explicit, eta=0
        with self.lock:
            if sampler == "ddim":
                out = self.model.ddim_sample(
                    key, cond=cond, cond_scale=cond_scale, batch_size=npad,
                    num_steps=num_steps, eta=0.0, grid=grid, init_noise=noise,
                )
            else:  # dpm
                out = self.model.dpm_solver_sample(
                    key, cond=cond, cond_scale=cond_scale, batch_size=npad,
                    num_steps=num_steps, init_noise=noise,
                )
            return np.asarray(out)[:n]

    def info(self) -> dict:
        import jax

        m = self.model
        return {
            "status": "ok",
            "devices": jax.device_count(),
            "batching": (
                {"window_s": self.batcher.window_s, "max_rows": self.batcher.max_rows}
                if self.batcher is not None
                else None
            ),
            "model": {
                "image_size": m.image_size,
                "num_frames": m.num_frames,
                "channels": m.channels,
                "timesteps": m.num_timesteps,
                "prediction_type": m.prediction_type,
                "has_cond": bool(getattr(m.denoise_fn, "has_cond", False)),
                "guidance_embed": bool(
                    getattr(m.denoise_fn, "has_guidance_embed", False)
                ),
            },
        }

    def _validate_text(self, req: dict, batch_size: int):
        """Shared text-conditioning validation for /sample and /extend.

        Returns ``(cond, batch_size)``: a single prompt is broadcast; a
        prompt list sets the batch size unless the request pinned a
        conflicting one (the samplers infer batch from cond, so an
        unchecked list would bypass the batch cap).
        """
        cond = req.get("text")
        has_cond = bool(getattr(self.model.denoise_fn, "has_cond", False))
        if cond is None:
            if has_cond:
                raise ValueError("this model is conditioned; provide 'text'")
            return None, batch_size
        if not has_cond:
            raise ValueError("this model is unconditional; remove 'text'")
        if not isinstance(cond, list) or not all(isinstance(s, str) for s in cond):
            raise ValueError("text must be a list of strings")
        if len(cond) == 1 and batch_size > 1:
            cond = cond * batch_size
        if not 1 <= len(cond) <= 64:
            raise ValueError("text must have 1..64 entries")
        if len(cond) != batch_size:
            if "batch_size" in req:
                raise ValueError(
                    f"text has {len(cond)} entries but batch_size is "
                    f"{batch_size}; give one prompt, matching prompts, or "
                    "drop batch_size"
                )
            batch_size = len(cond)
        return cond, batch_size

    def _run_and_encode(self, sample_fn) -> dict:
        """Serialize the sampler call, materialize, and encode GIFs."""
        import numpy as np

        t0 = time.perf_counter()
        with self.lock:
            arr = np.asarray(sample_fn())  # materializes inside the lock
        dt = time.perf_counter() - t0
        gifs = [base64.b64encode(g).decode("ascii") for g in _encode_gifs(arr)]
        return {"gifs": gifs, "time_s": round(dt, 3), "shape": list(arr.shape)}

    def sample(self, req: dict) -> dict:
        import math

        import jax

        # Default sampler is DDIM (the path --warmup compiles); DDPM runs
        # the full T-step chain and must be asked for explicitly.
        sampler = req.get("sampler", "ddim")
        if sampler not in _ALLOWED_SAMPLERS:
            raise ValueError(f"sampler must be one of {_ALLOWED_SAMPLERS}")
        batch_size = _coerce(req, "batch_size", int, 1)
        if not 1 <= batch_size <= 64:
            raise ValueError("batch_size must be in [1, 64]")
        num_steps = _coerce(req, "num_steps", int, 50)
        if not 1 <= num_steps <= self.model.num_timesteps:
            raise ValueError(f"num_steps must be in [1, {self.model.num_timesteps}]")
        # Reject knobs the chosen sampler would silently ignore — a
        # validated-but-unused parameter misleads the client about what ran.
        if sampler == "ddpm" and "num_steps" in req:
            raise ValueError(
                "ddpm runs the full timestep chain; num_steps applies to "
                "ddim/dpm only"
            )
        if sampler != "ddim":
            for k in ("eta", "grid"):
                if k in req:
                    raise ValueError(f"{k} applies to the ddim sampler only")
        grid = req.get("grid", "linspace")
        if grid not in ("linspace", "stride"):
            raise ValueError("grid must be 'linspace' or 'stride'")
        eta = _coerce(req, "eta", float, 0.0)
        seed = _coerce(req, "seed", int, 0)
        cond, batch_size = self._validate_text(req, batch_size)
        cond_scale = _coerce(req, "cond_scale", float, 1.0)
        # NaN never compares equal, so it would miss (and pollute) the
        # compiled-sampler LRU on every request; json.loads accepts it.
        if not (math.isfinite(eta) and math.isfinite(cond_scale)):
            raise ValueError("eta and cond_scale must be finite")

        key = jax.random.PRNGKey(seed)

        # Deterministic-ODE requests (ddim at eta=0, dpm) go through the
        # micro-batcher: derive this request's x_T from its seed exactly as
        # the solo keyed path would, so coalescing cannot change the output.
        if self.batcher is not None and sampler in ("ddim", "dpm") and eta == 0.0:
            import jax.numpy as jnp
            import numpy as np

            m = self.model
            shape = (batch_size, m.channels, m.num_frames, m.image_size, m.image_size)
            noise = jax.random.normal(jax.random.split(key)[1], shape)
            cond_arr = None
            if cond is not None:
                from video_diffusion_nnx_tpu.models.text import bert_embed, tokenize

                cond_arr = jnp.asarray(
                    bert_embed(tokenize(cond), return_cls_repr=m.text_use_bert_cls)
                )
            group_key = (sampler, num_steps, grid, cond_scale, cond is not None)
            t0 = time.perf_counter()
            rows, group_size, wait_s = self.batcher.submit(group_key, noise, cond_arr)
            dt = time.perf_counter() - t0
            gifs = [
                base64.b64encode(g).decode("ascii")
                for g in _encode_gifs(np.asarray(rows))
            ]
            return {
                "gifs": gifs,
                "time_s": round(dt, 3),
                "shape": list(rows.shape),
                "coalesced": group_size,
                "queue_wait_s": round(wait_s, 3),
            }

        def run():
            if sampler == "ddim":
                return self.model.ddim_sample(
                    key, cond=cond, cond_scale=cond_scale, batch_size=batch_size,
                    num_steps=num_steps, eta=eta, grid=grid,
                )
            if sampler == "dpm":
                return self.model.dpm_solver_sample(
                    key, cond=cond, cond_scale=cond_scale, batch_size=batch_size,
                    num_steps=num_steps,
                )
            return self.model.sample(
                key, cond=cond, cond_scale=cond_scale, batch_size=batch_size
            )

        return self._run_and_encode(run)

    def extend(self, req: dict) -> dict:
        """Frame-conditional generation (video extension / infill)."""
        import io
        import math

        import jax
        import jax.numpy as jnp
        import numpy as np

        m = self.model
        raw = req.get("known_npy_b64")
        if not isinstance(raw, str):
            raise ValueError("known_npy_b64 (base64 of a .npy array) is required")
        try:
            known = np.load(io.BytesIO(base64.b64decode(raw)), allow_pickle=False)
        except Exception as e:
            raise ValueError(f"could not decode known_npy_b64 as .npy: {e}") from None
        expect = (m.channels, m.num_frames, m.image_size, m.image_size)
        if known.shape != expect:
            raise ValueError(f"known array must have shape {expect}, got {known.shape}")
        batch_size = _coerce(req, "batch_size", int, 1)
        if not 1 <= batch_size <= 16:
            raise ValueError("batch_size must be in [1, 16]")
        mask = req.get("frame_mask")
        if (
            not isinstance(mask, list)
            or len(mask) != m.num_frames
            or not all(isinstance(v, bool) for v in mask)
        ):
            raise ValueError(f"frame_mask must be a list of {m.num_frames} booleans")
        if all(mask) or not any(mask):
            raise ValueError("frame_mask must pin some frames and leave some free")
        # Fast by default, like /sample: 50-step DDIM conditioning. The
        # full T-step DDPM chain is opt-in via an EXPLICIT null.
        num_steps = req.get("num_steps", 50)
        if num_steps is not None:
            num_steps = _coerce(req, "num_steps", int, 50)
            if not 1 <= num_steps <= m.num_timesteps:
                raise ValueError(f"num_steps must be in [1, {m.num_timesteps}]")
        # Stride-grid support so a distilled checkpoint extends on the grid
        # it was trained on (advisor r3: /extend previously forced linspace).
        grid = req.get("grid", "linspace")
        if grid not in ("linspace", "stride"):
            raise ValueError("grid must be 'linspace' or 'stride'")
        if "grid" in req and num_steps is None:
            raise ValueError("grid applies to the DDIM path; give num_steps")
        wr = _coerce(req, "recon_guidance", float, 0.0)
        cond_scale = _coerce(req, "cond_scale", float, 1.0)
        if not (math.isfinite(wr) and math.isfinite(cond_scale)) or wr < 0:
            raise ValueError("recon_guidance and cond_scale must be finite (wr >= 0)")
        if wr > 0 and num_steps is None:
            raise ValueError("recon_guidance needs num_steps (the DDIM path)")
        seed = _coerce(req, "seed", int, 0)
        cond, batch_size = self._validate_text(req, batch_size)
        if batch_size > 16:
            raise ValueError("batch_size (incl. inferred from text) must be <= 16")

        known_b = jnp.broadcast_to(jnp.asarray(known)[None], (batch_size, *known.shape))
        return self._run_and_encode(
            lambda: m.sample_conditional_frames(
                key=jax.random.PRNGKey(seed),
                known=known_b,
                frame_mask=jnp.asarray(mask),
                cond=cond,
                cond_scale=cond_scale,
                num_steps=num_steps,
                grid=grid,
                recon_guidance_weight=wr,
            )
        )


def _encode_gifs(videos) -> list[bytes]:
    """(b, c, f, h, w) float batch -> GIF bytes per clip (the CLI's
    batch-global min-max uint8 scaling, reference sample.py:105-116)."""
    from video_diffusion_nnx_tpu.utils import write_sample_gifs

    with tempfile.TemporaryDirectory() as td:
        paths = write_sample_gifs(videos, td)
        return [Path(p).read_bytes() for p in paths]


def make_handler(service: SamplingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            log.info("%s " + fmt, self.address_string(), *args)

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, service.info())
            else:
                self._reply(404, {"error": "unknown path; GET /health or POST /sample"})

        def do_POST(self):
            handlers = {"/sample": service.sample, "/extend": service.extend}
            handler = handlers.get(self.path)
            if handler is None:
                self._reply(404, {"error": "unknown path; POST /sample or /extend"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                self._reply(200, handler(req))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # surface, don't crash the server
                log.exception("%s request failed", self.path)
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def create_server(
    model,
    host: str = "127.0.0.1",
    port: int = 8080,
    batch_window_s: float | None = 0.05,
    max_batch_rows: int = 8,
) -> ThreadingHTTPServer:
    """Build the HTTP server around a loaded diffusion model (separated
    from main() so tests can run it in-process on an ephemeral port).
    ``batch_window_s=None`` disables request coalescing."""
    service = SamplingService(model, batch_window_s, max_batch_rows)

    class _Server(ThreadingHTTPServer):
        # Default listen backlog (5) resets connections under bursts of
        # concurrent clients (measured: 16 simultaneous connects during a
        # multi-second device call dropped one with ECONNRESET).
        request_queue_size = 128

    httpd = _Server((host, port), make_handler(service))
    httpd.service = service  # for tests and shutdown
    return httpd


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s:%(name)s:%(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--checkpoint-path", type=str, required=True)
    ap.add_argument("--step", type=int, required=True)
    ap.add_argument("--load-ema-params", action="store_true", default=False)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument(
        "--warmup", action="store_true",
        help="compile the default DDIM-50 batch-1 program before accepting traffic",
    )
    ap.add_argument(
        "--batch-window", type=float, default=0.05,
        help="seconds to linger collecting coalescable requests (default 0.05)",
    )
    ap.add_argument(
        "--max-batch-rows", type=int, default=8,
        help="max samples per coalesced device call (chip saturates near 8)",
    )
    ap.add_argument(
        "--no-batching", action="store_true",
        help="disable request coalescing (every request runs solo)",
    )
    args = ap.parse_args()

    from video_diffusion_nnx_tpu.config import build_models, load_config
    from video_diffusion_nnx_tpu.utils import enable_compilation_cache, load_checkpoint

    config = load_config(args.config)
    enable_compilation_cache(config["trainer"].get("compilation_cache_dir"))
    _, model = build_models(config)
    try:
        model, _ = load_checkpoint(
            model, args.step, str(Path(args.checkpoint_path).resolve()),
            load_ema_params=args.load_ema_params,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None

    if args.warmup:
        import jax

        log.info("warm-up compile (ddim-50, batch 1)...")
        t0 = time.perf_counter()
        model.ddim_sample(jax.random.PRNGKey(0), batch_size=1, num_steps=50)
        log.info("warm-up done in %.1fs", time.perf_counter() - t0)

    server = create_server(
        model, args.host, args.port,
        batch_window_s=None if args.no_batching else args.batch_window,
        max_batch_rows=args.max_batch_rows,
    )
    log.info("serving on http://%s:%d (GET /health, POST /sample)", args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log.info("shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
