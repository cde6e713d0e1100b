"""A/B: flattened-buffer optimizer vs per-leaf tree optimizer (real TPU).

The round-5 roofline accounting (results/roofline_train_step.json,
scripts/roofline_train_step.py) attributed the train step's non-roofline
time to per-dispatch overhead over the ~400-leaf parameter tree: the
ISOLATED Adam+EMA program runs at only 4-12% of HBM peak because each
leaf's update lowers to its own tiny fusion. This script measures whether
collapsing the per-leaf math into single flat-buffer kernels buys back the
optimizer marginal inside the FULL train step (the number bench.py
reports), not just in isolation.

Variants, all on the production recipe (dim 32 / b4 / 10f / 64x64 / bf16
fused kernels; optionally dim 128 with --dims):

  tree      baseline: optax.adam over the param tree + tree_map EMA
            (exactly bench.py's train_bench program)
  flat-opt  optax.flatten(optax.adam): grads are raveled into ONE vector,
            Adam's mu/nu/updates are single flat buffers (4 big kernels
            instead of ~800 leaf kernels); updates unravel back to the
            tree for apply_updates. EMA stays tree_map.
  flat-all  flat-opt + EMA held as ONE flat vector: the EMA update is a
            single axpy over ravel(new_params). Checkpoint-compatible via
            a one-time unravel on save (host side).
  flat-ema  tree Adam (no grad ravel / update unravel) + flat EMA only —
            isolates the EMA win from the Adam ravel cost after the first
            run measured flat-opt SLOWER (ravel+unravel of ~400 leaves
            costs more than it saves) while flat-all still won 6%.
  tree-cond / flat-all-cond
            same pair but with the EMA update gated by lax.cond on
            (step % 10 == 0) — the PRODUCTION trainer's cadence
            (update_ema_every=10, trainer.py). The every-step variants
            above overstate the EMA term 10x; these two decide whether
            the flat layout helps the real train step. --donate mirrors
            the trainer's donate_argnums=(0,) aliasing.

MEASURED (one v5e chip, dim 32, 30 iters, 2026-08-19; four independent
compile pairs):

  tree (every-step EMA)        75.9-79.2 ms   <- bench.py's train program
  flat-opt                     104.2 ms       (-32%: ravel/unravel alone
                                               lowers to per-leaf copies)
  flat-ema                     77.1 ms        (neutral alone)
  flat-all                     72.1-74.4 ms   (+5-6%)
  tree-cond, NO donation       116.7 ms       (the cond pass-through
                                               copies the ~400-leaf EMA
                                               tree every step: +40 ms)
  tree-cond, donated           76.9 ms        <- the production trainer
  flat-all-cond, donated       72.3 ms        (+6.0% vs production)

Two conclusions: (a) flat Adam and flat EMA only pay off TOGETHER
(trainer ``flatten_optimizer`` implements exactly that pairing); (b) the
trainer's donate_argnums is load-bearing — an undonated cond-gated EMA
costs +52% step time in buffer copies.

Prints one JSON line with ms/step per variant and the deltas.

Usage: python scripts/ab_flat_opt.py [--dims 32,128] [--iters 10] [--donate]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_step(variant: str, dim: int, donate: bool = False):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx
    from jax.flatten_util import ravel_pytree

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    cond_ema = variant.endswith("-cond")
    base_variant = variant[: -len("-cond")] if cond_ema else variant
    variant = {"tree": "tree", "flat-opt": "flat-opt", "flat-all": "flat-all",
               "flat-ema": "flat-ema"}[base_variant]
    channels, size, t_frames = 1, 64, 10
    unet = Unet3D(
        dim=dim, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=channels,
        compute_dtype="bfloat16", use_fused_attention=True,
        use_fused_spatial_attention=True,
    )
    diff = GaussianDiffusion(
        unet, image_size=size, num_frames=t_frames, channels=channels,
        timesteps=1000, loss_type="l2",
    )
    graphdef, params = nnx.split(diff)
    inner = optax.adam(1e-4)
    tx = optax.flatten(inner) if variant in ("flat-opt", "flat-all") else inner
    opt = tx.init(params)
    if variant in ("flat-all", "flat-ema"):
        ema, _unravel = ravel_pytree(jax.tree_util.tree_map(jnp.copy, params))
    else:
        ema = jax.tree_util.tree_map(jnp.copy, params)

    # donate=True mirrors the production trainer's donate_argnums=(0,)
    # (trainer.py _build_train_step): input->output aliasing lets XLA
    # elide the lax.cond false-branch pass-through copy of the EMA tree.
    jit_kwargs = {"donate_argnums": (0, 1, 2)} if donate else {}

    @partial(jax.jit, **jit_kwargs)
    def step(params, opt, ema, x, key, it):
        def loss_fn(p):
            return nnx.merge(graphdef, p)(x, key=key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)

        def ema_update(e, p):
            if variant in ("flat-all", "flat-ema"):
                flat_params, _ = ravel_pytree(p)
                return 0.9999 * e + 0.0001 * flat_params
            return jax.tree_util.tree_map(
                lambda ei, pi: 0.9999 * ei + 0.0001 * pi, e, p
            )

        if cond_ema:
            # Production cadence: the trainer fires EMA only every 10th
            # step, under lax.cond (trainer.py step_start_ema/update_ema_every).
            ema_new = jax.lax.cond(
                (it % 10) == 0, lambda: ema_update(ema, params), lambda: ema
            )
        else:
            ema_new = ema_update(ema, params)
        return params, opt, ema_new, loss, it + 1

    x = jnp.zeros((4, channels, t_frames, size, size), jnp.float32)
    key = jax.random.PRNGKey(0)
    return step, (params, opt, ema, x, key, jnp.int32(0))


def measure(variant: str, dim: int, iters: int, donate: bool = False) -> dict:
    import jax.numpy as jnp

    step, (params, opt, ema, x, key, it) = build_step(variant, dim, donate)
    t0 = time.monotonic()
    compiled = step.lower(params, opt, ema, x, key, it).compile()
    compile_s = time.monotonic() - t0
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    nbytes = float(cost.get("bytes accessed", 0.0)) if cost else 0.0

    # Donate-style timing: feed outputs back as inputs, fetch ONE scalar at
    # the end (discarding big output trees costs ~1.4 s/iter of per-buffer
    # deallocation RPCs over the axon tunnel — CLAUDE.md round-5 gotcha).
    params, opt, ema, loss, it = step(params, opt, ema, x, key, it)
    float(loss)  # force materialization (block_until_ready can no-op on axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, ema, loss, it = step(params, opt, ema, x, key, it)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"[{variant} dim{dim}] {dt*1000:.2f} ms/step  "
        f"(compile {compile_s:.1f}s, bytes {nbytes/1e9:.2f} GB)",
        file=sys.stderr,
    )
    return {"ms": round(dt * 1000, 2), "compile_s": round(compile_s, 1),
            "bytes_gb": round(nbytes / 1e9, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="32")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="tree,flat-opt,flat-all")
    ap.add_argument("--donate", action="store_true",
                    help="donate state buffers (the trainer's aliasing)")
    args = ap.parse_args()

    out: dict = {}
    for dim in [int(d) for d in args.dims.split(",")]:
        res = {}
        for variant in args.variants.split(","):
            res[variant] = measure(variant, dim, args.iters, args.donate)
        base = res.get("tree", {}).get("ms")
        for v, r in res.items():
            if base and v != "tree":
                r["delta_ms"] = round(base - r["ms"], 2)
                r["speedup_pct"] = round(100 * (base - r["ms"]) / base, 1)
        out[f"dim{dim}"] = res
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
