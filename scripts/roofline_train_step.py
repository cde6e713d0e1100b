"""Roofline accounting of the train step by whole-program differencing.

VERDICT r4 weak #3: the dim-32 step reaches only ~41% of HBM peak and the
dim-128 step saturates neither resource above ~26% — where does the rest
go? Per-op attribution is unusable over the axon tunnel (a single dispatch
has a ~2.5 ms floor and fori_loop pays ~0.7 ms/iter — CLAUDE.md), so this
script decomposes the step the only reliable way here: as DIFFERENCES of
whole-program timings, each variant compiled and timed as one XLA program.

Segments per dim (32 and 128):
  fwd        — loss only (no grad)
  fwd+bwd    — jax.value_and_grad (bwd = this minus fwd)
  full step  — fwd+bwd + Adam + EMA (opt = this minus fwd+bwd)
  opt floor  — an isolated Adam+EMA update on the same param tree: pure
               parameter traffic (read p/g/mu/nu/ema, write 4), i.e. the
               HBM-bound floor the optimizer segment should approach.

Each program also reports XLA cost-analysis flops/bytes so every segment
gets its own MFU / HBM fraction — the "where the bytes/FLOPs go" table.
Remote-compile schedules vary +-20% across compiles (CLAUDE.md), so only
differences larger than that band are treated as signal.

Usage: /opt/venv/bin/python scripts/roofline_train_step.py [--dims 32,128]
Writes results/roofline_train_step.json and prints the table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_V5E_PEAK_FLOPS = 197e12
_V5E_PEAK_HBM_BPS = 819e9


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dims", default="32,128")
    ap.add_argument("--n", type=int, default=10, help="timed iterations")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parents[1]
                                         / "results/roofline_train_step.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    results: dict = {"device": str(jax.devices()[0]), "n": args.n}

    def timed(compiled, arg_list, n, feedback=None):
        """Time n executions, feeding outputs back as inputs where the
        program is self-composable (``feedback(out, args) -> next args``).

        Discarding a large output tree every iteration costs real
        wall-clock over the axon tunnel (per-buffer deallocation RPCs:
        measured 1.38 s/iter for a ~400-leaf grad tree vs 77 ms for the
        same compute with outputs fed back), so the harness mirrors the
        trainer's donate/feed-back pattern and fetches ONE scalar at the
        end to force completion."""
        args = list(arg_list)
        out = compiled(*args)
        if feedback is not None:
            args = feedback(out, args)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.mean(first.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = compiled(*args)
            if feedback is not None:
                args = feedback(out, args)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.mean(first.astype(jnp.float32)))
        return (time.perf_counter() - t0) / n

    def cost_of(compiled):
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        return (
            float(cost.get("flops", 0.0)) if cost else 0.0,
            float(cost.get("bytes accessed", 0.0)) if cost else 0.0,
        )

    for dim in (int(d) for d in args.dims.split(",")):
        batch, frames, size = 4, 10, 64
        unet = Unet3D(
            dim=dim, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=1,
            compute_dtype="bfloat16", use_fused_attention=True,
            use_fused_spatial_attention=True,
        )
        diff = GaussianDiffusion(
            unet, image_size=size, num_frames=frames, channels=1,
            timesteps=1000, loss_type="l2",
        )
        graphdef, params = nnx.split(diff)
        tx = optax.adam(1e-4)
        opt = tx.init(params)
        ema = jax.tree_util.tree_map(jnp.copy, params)
        x = jnp.zeros((batch, 1, frames, size, size), jnp.float32)
        key = jax.random.PRNGKey(0)

        def loss_fn(p):
            return nnx.merge(graphdef, p)(x, key=key)

        def fwd(params):
            return loss_fn(params)

        def fwd_bwd(params):
            # Returns an updated param tree so the harness can feed outputs
            # back as inputs (see timed()); the 1e-20 scale keeps every
            # grad alive without changing the numerics measurably.
            loss, grads = jax.value_and_grad(loss_fn)(params)
            new_params = jax.tree_util.tree_map(
                lambda p, g: p - jnp.asarray(1e-20, p.dtype) * g, params, grads
            )
            return loss, new_params

        def full(params, opt, ema):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: 0.9999 * e + 0.0001 * p, ema, params
            )
            return params, opt, ema, loss

        def opt_only(params, grads, opt, ema):
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: 0.9999 * e + 0.0001 * p, ema, params
            )
            return params, opt, ema

        grads0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        programs = {
            "fwd": (fwd, (params,), None),
            "fwd_bwd": (fwd_bwd, (params,), lambda out, a: [out[1]]),
            "full": (full, (params, opt, ema),
                     lambda out, a: [out[0], out[1], out[2]]),
            "opt_floor": (opt_only, (params, grads0, opt, ema),
                          lambda out, a: [out[0], a[1], out[1], out[2]]),
        }
        row: dict = {}
        for name, (fn, call_args, feedback) in programs.items():
            t_c0 = time.perf_counter()
            compiled = jax.jit(fn).lower(*call_args).compile()
            compile_s = time.perf_counter() - t_c0
            flops, nbytes = cost_of(compiled)
            dt = timed(compiled, call_args, args.n, feedback)
            row[name] = {
                "ms": round(dt * 1000, 2),
                "compile_s": round(compile_s, 1),
                "flops": flops,
                "bytes": nbytes,
                "mfu": round(flops / dt / _V5E_PEAK_FLOPS, 4),
                "hbm_frac": round(nbytes / dt / _V5E_PEAK_HBM_BPS, 4),
            }
            print(f"[dim{dim}] {name}: {dt*1000:.2f} ms  "
                  f"mfu {row[name]['mfu']:.3f}  hbm {row[name]['hbm_frac']:.3f}  "
                  f"(compile {compile_s:.0f}s)", flush=True)
        # Derived segments (differences of whole programs).
        row["derived"] = {
            "bwd_ms": round(row["fwd_bwd"]["ms"] - row["fwd"]["ms"], 2),
            "opt_ms": round(row["full"]["ms"] - row["fwd_bwd"]["ms"], 2),
            "opt_floor_ms": row["opt_floor"]["ms"],
        }
        print(f"[dim{dim}] derived: {row['derived']}", flush=True)
        results[f"dim{dim}"] = row

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
