"""Decompose the dim-128 (config_v2_3-scale) train step by whole-program A/Bs.

VERDICT r3 task 4: the dim-128 MFU (~0.15-0.17) was uncaptured and
unexplored — no ablation showed where the remaining ~85% goes. Per-op
attribution is unreliable on this toolchain (a single dispatch has a
~2.5 ms floor through the axon tunnel; see CLAUDE.md), so every number
here is the wall-clock of a COMPLETE jitted program, and each slice is a
difference of two such programs:

  fwd            = loss-only program
  bwd            = (fwd+bwd program)  - fwd
  optimizer+EMA  = (full step)        - (fwd+bwd program)
  attention      = (full composite)   - (full fused)   [both directions]

Attack candidates measured as full-step variants:
  - EMA stored in bf16      (halves the pure-traffic EMA read+write)
  - Adam moments in bf16    (halves mu/nu traffic)
  - no-EMA step             (upper bound on what EMA costs at all)
  - remat_blocks            (trades HBM activation traffic for recompute)

Usage:  python scripts/ablate_dim128.py [--dim 128] [--repeats 10]
Prints one JSON line at the end (plus a human table on stderr).
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
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D
    from video_diffusion_nnx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    batch, channels, frames, size = 4, 1, 10, 64

    def build(fused: bool, remat: bool = False):
        unet = Unet3D(
            dim=args.dim, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8),
            channels=channels, compute_dtype="bfloat16",
            use_fused_attention=fused, use_fused_spatial_attention=fused,
            remat_blocks=remat,
        )
        diff = GaussianDiffusion(
            unet, image_size=size, num_frames=frames, channels=channels,
            timesteps=1000, loss_type="l2",
        )
        return nnx.split(diff)

    x = jnp.zeros((batch, channels, frames, size, size), jnp.float32)
    key = jax.random.PRNGKey(0)
    results: dict = {"dim": args.dim, "batch": batch, "frames": frames, "size": size}

    def timeit(fn, fetch, n=args.repeats):
        fetch(fn())  # warm-up (compile)
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        fetch(out)  # force full materialization over the tunnel
        return (time.perf_counter() - t0) / n

    def report(name: str, dt: float, flops: float = 0.0, nbytes: float = 0.0):
        results[name + "_ms"] = round(dt * 1000, 2)
        extra = ""
        if flops:
            results[name + "_mfu"] = round(flops / dt / _V5E_PEAK_FLOPS, 4)
            extra += f"  MFU={results[name + '_mfu']:.4f}"
        if nbytes:
            results[name + "_hbm_frac"] = round(nbytes / dt / _V5E_PEAK_HBM_BPS, 3)
            extra += f"  hbm={results[name + '_hbm_frac']:.3f}"
        print(f"{name:28s} {dt*1000:8.2f} ms{extra}", file=sys.stderr)

    def cost_of(compiled):
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        return (
            float(cost.get("flops", 0.0)) if cost else 0.0,
            float(cost.get("bytes accessed", 0.0)) if cost else 0.0,
        )

    # ---- programs over the FUSED model ----
    graphdef, params = build(fused=True)
    n_params = sum(
        int(v.size) for v in jax.tree_util.tree_leaves(params) if hasattr(v, "size")
    )
    results["n_params"] = n_params
    print(f"param count: {n_params/1e6:.1f} M", file=sys.stderr)

    tx = optax.adam(1e-4)

    def make_full(graphdef, tx, with_ema=True):
        def step(params, opt, ema, x, key):
            def loss_fn(p):
                return nnx.merge(graphdef, p)(x, key=key)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            if with_ema:
                ema = jax.tree_util.tree_map(
                    lambda e, p: (0.9999 * e.astype(jnp.float32)
                                  + 0.0001 * p).astype(e.dtype),
                    ema, params,
                )
            return params, opt, ema, loss

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def fresh_state(ema_dtype=None, moment_dtype=None):
        _, p = build(fused=True)
        opt = tx.init(p)
        if moment_dtype is not None:
            adam = opt[0]
            cast = lambda t: jax.tree_util.tree_map(
                lambda v: v.astype(moment_dtype), t
            )
            opt = (adam._replace(mu=cast(adam.mu), nu=cast(adam.nu)),) + tuple(opt[1:])
        ema = jax.tree_util.tree_map(
            lambda v: v.astype(ema_dtype) if ema_dtype else jnp.copy(v), p
        )
        return p, opt, ema

    # 1. Full step, fused (the baseline being decomposed).
    full = make_full(graphdef, tx)
    p0, o0, e0 = fresh_state()
    lowered = full.lower(p0, o0, e0, x, key).compile()
    _, full_bytes = cost_of(lowered)
    state = [p0, o0, e0]

    def run_full():
        state[0], state[1], state[2], loss = full(state[0], state[1], state[2], x, key)
        return loss

    full_dt = timeit(run_full, lambda l: float(l))
    report("full_fused", full_dt, nbytes=full_bytes)

    # 2. fwd+bwd only (no optimizer, no EMA).
    @jax.jit
    def fwd_bwd(params, x, key):
        def loss_fn(p):
            return nnx.merge(graphdef, p)(x, key=key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Reduce grads to a scalar so the program returns something small
        # (a full grad fetch would measure transfer, not compute) — but the
        # reduction must stay LIVE (0.0 * gsum would let XLA DCE the whole
        # backward pass).
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    p1 = fresh_state()[0]
    fb_dt = timeit(lambda: fwd_bwd(p1, x, key), lambda lg: (float(lg[0]), float(lg[1])))
    report("fwd_bwd_fused", fb_dt)

    # 3. Forward (loss) only.
    @jax.jit
    def fwd_only(params, x, key):
        return nnx.merge(graphdef, params)(x, key=key)

    fwd_dt = timeit(lambda: fwd_only(p1, x, key), lambda l: float(l))
    report("fwd_fused", fwd_dt)

    # 4. Full step, composite (attention slice, and TRUE algorithmic flops).
    cg, cp = build(fused=False)
    comp_full = make_full(cg, tx)
    o1 = tx.init(cp)
    e1 = jax.tree_util.tree_map(jnp.copy, cp)
    lowered_c = comp_full.lower(cp, o1, e1, x, key).compile()
    comp_flops, comp_bytes = cost_of(lowered_c)
    cstate = [cp, o1, e1]

    def run_comp():
        cstate[0], cstate[1], cstate[2], loss = comp_full(
            cstate[0], cstate[1], cstate[2], x, key
        )
        return loss

    comp_dt = timeit(run_comp, lambda l: float(l))
    report("full_composite", comp_dt, flops=comp_flops, nbytes=comp_bytes)
    # True MFU of the fused step = composite (algorithmic) flops / fused time.
    results["true_flops"] = comp_flops
    results["full_fused_mfu_true"] = round(comp_flops / full_dt / _V5E_PEAK_FLOPS, 4)
    print(
        f"TRUE fused MFU (composite flops / fused time): "
        f"{results['full_fused_mfu_true']:.4f}",
        file=sys.stderr,
    )

    # 5. No-EMA full step (upper bound on EMA's cost).
    noema = make_full(graphdef, tx, with_ema=False)
    p2, o2, e2 = fresh_state()
    st2 = [p2, o2, e2]

    def run_noema():
        # ema (arg 2) is donated even though this variant never updates it —
        # keep the returned alias or the next call passes a deleted buffer.
        st2[0], st2[1], st2[2], loss = noema(st2[0], st2[1], st2[2], x, key)
        return loss

    noema_dt = timeit(run_noema, lambda l: float(l))
    report("full_no_ema", noema_dt)

    # 6. EMA stored in bf16 (halves its read+write traffic).
    p3, o3, e3 = fresh_state(ema_dtype=jnp.bfloat16)
    st3 = [p3, o3, e3]

    def run_bf16ema():
        st3[0], st3[1], st3[2], loss = full(st3[0], st3[1], st3[2], x, key)
        return loss

    bf16ema_dt = timeit(run_bf16ema, lambda l: float(l))
    report("full_ema_bf16", bf16ema_dt)

    # 7. Adam moments in bf16 (halves mu/nu traffic).
    p4, o4, e4 = fresh_state(moment_dtype=jnp.bfloat16)
    st4 = [p4, o4, e4]

    def run_bf16mom():
        st4[0], st4[1], st4[2], loss = full(st4[0], st4[1], st4[2], x, key)
        return loss

    bf16mom_dt = timeit(run_bf16mom, lambda l: float(l))
    report("full_moments_bf16", bf16mom_dt)

    # 8. remat_blocks variant (activation traffic vs recompute).
    rg, rp = build(fused=True, remat=True)
    remat_full = make_full(rg, tx)
    ro = tx.init(rp)
    re = jax.tree_util.tree_map(jnp.copy, rp)
    rstate = [rp, ro, re]

    def run_remat():
        rstate[0], rstate[1], rstate[2], loss = remat_full(
            rstate[0], rstate[1], rstate[2], x, key
        )
        return loss

    remat_dt = timeit(run_remat, lambda l: float(l))
    report("full_fused_remat", remat_dt)

    # ---- derived slices ----
    results["slice_fwd_ms"] = round(fwd_dt * 1000, 2)
    results["slice_bwd_ms"] = round((fb_dt - fwd_dt) * 1000, 2)
    results["slice_opt_ema_ms"] = round((full_dt - fb_dt) * 1000, 2)
    results["slice_ema_ms"] = round((full_dt - noema_dt) * 1000, 2)
    results["slice_attention_ms"] = round((comp_dt - full_dt) * 1000, 2)
    print(
        "\nslices: fwd {slice_fwd_ms} | bwd {slice_bwd_ms} | opt+ema "
        "{slice_opt_ema_ms} (ema alone {slice_ema_ms}) | attention saved by "
        "fusion {slice_attention_ms}".format(**results),
        file=sys.stderr,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
