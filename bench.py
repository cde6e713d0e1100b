"""Headline benchmark: 250-step DDPM sampling wall-clock on real hardware.

Scenario (BASELINE.json target: < 60 s on v5e-8): batch-8, 16-frame, 64x64,
1-channel sampling with the config_v2_2-scale Unet3D (dim 32, mults
1/2/4/8, T reduced to 250 reverse steps as specified by the target).

Budget-proof structure (round-3 lesson: BENCH_r03 timed out at rc=124 with
good numbers measured but unprinted): the headline JSON line is printed
IMMEDIATELY after the headline measurement, then re-printed enriched after
every sub-bench. The driver reads the last parseable line, so a timeout
mid-run still captures everything measured so far. Every optional stage is
gated on a wall-clock budget (``BENCH_BUDGET_S``, default 1020 s — under
the driver's observed ~20-min kill) using a per-stage cost estimate, and
wrapped so one failure cannot lose the rest.

Stage order is by information value per compile-second, with value defined
as "never yet witnessed in a driver artifact" (BENCH_r01-r04 captured the
headline + train stages only — the sampler ladder went four rounds
unwitnessed): headline sampling -> fast samplers (DDIM/DPM/distilled-4,
same model object) -> train fused (v2_2) -> guided pair -> long-clip ->
VideoDiT family -> train dim-128 (witnessed in r04) -> composite/f32
re-measures. Algorithmic FLOP counts come from a CPU-backend subprocess
(persistent compile cache; seconds when warm) instead of two extra ~200 s
remote compiles. Compilation is excluded from timings (one warm-up run;
the compiled scan is cached). Remote-compile times are nondeterministic
(117 s..753 s observed for the same headline program), hence the budget
gates rather than a fixed stage list.

Prints JSON lines of the form
``{"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/value, ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time

# TPU v5e peak: 197 TFLOP/s per chip in bf16 (394 TOPS int8). The MFU
# estimate divides XLA's reported FLOP count by this; with mixed
# f32/bf16 math inside the step it is a conservative lower bound.
_V5E_PEAK_FLOPS = 197e12
# TPU v5e HBM bandwidth: 819 GB/s per chip. ``hbm_frac`` = achieved
# bytes/s over this peak — the roofline counterpart to MFU: whichever
# fraction is higher names the step's binding resource.
_V5E_PEAK_HBM_BPS = 819e9

_DEADLINE = time.monotonic() + float(os.environ.get("BENCH_BUDGET_S", "1020"))


def _remaining() -> float:
    return _DEADLINE - time.monotonic()


def _flops_child(dims: list[int]) -> None:
    """Subprocess mode: count the composite train step's algorithmic FLOPs
    on the CPU backend and print them as one JSON line.

    The axon remote compiler charges ~200 s per program just to COUNT
    flops; CPU XLA compiles the same computation locally, its dot/conv
    flop count is backend-independent, and the persistent compile cache
    (usable on CPU, axon-incompatible) makes a warm host answer in
    seconds. Only ``flops`` is taken from here — bytes-accessed depends on
    backend fusion, so HBM numbers keep coming from the real TPU program.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")

    from video_diffusion_nnx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    out = {}
    for dim in dims:
        # Mirrors main()'s train_bench(fused=False, dim=dim): bf16 composite
        # (XLA-only) v2_2 recipe — batch 4, 10 frames, 64x64 — with Adam+EMA.
        unet = Unet3D(
            dim=dim, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=1,
            compute_dtype="bfloat16",
        )
        diff = GaussianDiffusion(
            unet, image_size=64, num_frames=10, channels=1,
            timesteps=1000, loss_type="l2",
        )
        graphdef, params = nnx.split(diff)
        tx = optax.adam(1e-4)
        opt = tx.init(params)
        ema = jax.tree_util.tree_map(jnp.copy, params)

        def step(params, opt, ema, x, key):
            def loss_fn(p):
                return nnx.merge(graphdef, p)(x, key=key)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: 0.9999 * e + 0.0001 * p, ema, params
            )
            return params, opt, ema, loss

        x = jnp.zeros((4, 1, 10, 64, 64), jnp.float32)
        compiled = (
            jax.jit(step).lower(params, opt, ema, x, jax.random.PRNGKey(0)).compile()
        )
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        out[str(dim)] = float(cost.get("flops", 0.0)) if cost else 0.0
    print(json.dumps(out), flush=True)


def main() -> None:
    import jax

    from video_diffusion_nnx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    print(f"devices: {jax.devices()}", file=sys.stderr)

    import jax.numpy as jnp
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    batch, channels, frames, size, steps = 8, 1, 16, 64, 250
    n_chips = jax.device_count()

    result: dict = {}

    def emit() -> None:
        """(Re-)print the full JSON result line; the driver keeps the last one."""
        print(json.dumps(result), flush=True)

    def stage(name: str, est_s: float, fn) -> None:
        """Run one optional sub-bench if the budget allows; never fatal."""
        if _remaining() < est_s:
            print(
                f"[budget] skipping {name}: needs ~{est_s:.0f}s, "
                f"{_remaining():.0f}s left",
                file=sys.stderr,
            )
            return
        t0 = time.monotonic()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — partial results beat none
            print(f"[{name}] FAILED: {e!r}", file=sys.stderr)
            return
        print(f"[{name}] stage took {time.monotonic() - t0:.1f}s", file=sys.stderr)
        emit()

    def build(compute_dtype, fused=False):
        unet = Unet3D(
            dim=32,
            rngs=nnx.Rngs(0),
            dim_mults=(1, 2, 4, 8),
            channels=channels,
            compute_dtype=compute_dtype,
            use_fused_attention=fused,
            use_fused_spatial_attention=fused,
        )
        return GaussianDiffusion(
            unet,
            image_size=size,
            num_frames=frames,
            channels=channels,
            timesteps=steps,
            loss_type="l2",
        )

    def measure_sampling(diffusion, tag, n_runs=3):
        def timed_sample(seed: int) -> float:
            t0 = time.perf_counter()
            out = diffusion.sample(key=jax.random.PRNGKey(seed), batch_size=batch)
            # Force full materialization: block_until_ready alone can be a
            # no-op for remote/tunneled buffers, so fetch a reduction.
            checksum = float(jnp.mean(out))
            dt = time.perf_counter() - t0
            assert checksum == checksum, f"NaN in samples ({tag})"
            return dt

        warmup = timed_sample(0)
        print(f"[{tag}] warm-up (compile + run): {warmup:.2f}s", file=sys.stderr)
        runs = []
        for i in range(n_runs):
            runs.append(timed_sample(i + 1))
            print(f"[{tag}] run {i}: {runs[-1]:.3f}s", file=sys.stderr)
        return min(runs), warmup

    # ----- Headline (mandatory, printed the moment it exists) -----
    # Production path: bf16 compute + fused Pallas temporal+spatial attention.
    prod = build("bfloat16", fused=True)
    fused_s, fused_warm = measure_sampling(prod, "bf16+fused")
    result.update(
        {
            "metric": "ddpm_sample_250step_16f_64x64_b8_wallclock",
            "value": round(fused_s, 3),
            "unit": "s",
            "vs_baseline": round(60.0 / fused_s, 2),
            "denoise_steps_per_sec_per_chip": round(steps / fused_s / n_chips, 2),
            "bf16_fused_s": round(fused_s, 3),
            "devices": n_chips,
            "compile_s": round(fused_warm - fused_s, 2),
        }
    )
    emit()

    # ----- True algorithmic FLOPs (CPU subprocess; no TPU time) -----
    # The fused program's cost analysis undercounts (Pallas custom calls
    # report no flops: 305 vs 629 GF at dim 32), so MFU uses the composite
    # program's count. Counting it on axon costs ~200 s of remote compile
    # per dim; the CPU child answers from the persistent cache in seconds.
    _true_flops: dict = {}

    def do_flops_cpu():
        import subprocess

        cmd = [sys.executable, os.path.abspath(__file__), "--flops-child", "32,128"]
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            timeout=max(60.0, min(300.0, _remaining() - 60.0)),
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        data = json.loads(proc.stdout.strip().splitlines()[-1])
        for dim, f in data.items():
            if f:
                _true_flops[int(dim)] = f
        print(f"[flops-cpu] {data}", file=sys.stderr)

    stage("flops-cpu", est_s=45, fn=do_flops_cpu)

    # ----- Training throughput + MFU (v2_2 recipe: batch 4, 10 frames) -----
    import optax

    def train_bench(fused: bool, dim: int = 32, compile_only: bool = False):
        t_batch, t_frames = 4, 10
        unet = Unet3D(
            dim=dim,
            rngs=nnx.Rngs(0),
            dim_mults=(1, 2, 4, 8),
            channels=channels,
            compute_dtype="bfloat16",
            use_fused_attention=fused,
            use_fused_spatial_attention=fused,
        )
        diff = GaussianDiffusion(
            unet, image_size=size, num_frames=t_frames, channels=channels,
            timesteps=1000, loss_type="l2",
        )
        graphdef, params = nnx.split(diff)
        # Flat-buffer optimizer layout (the trainer's ``flatten_optimizer``):
        # Adam moments and the EMA live in single flat vectors so the
        # ~400-leaf update lowers to a handful of full-bandwidth kernels
        # instead of hundreds of dispatch-bound ones. Measured 5-6% faster
        # than the per-leaf tree layout on this exact program across four
        # compile pairs (scripts/ab_flat_opt.py; r1-r4 bench rounds used the
        # tree layout — numbers differ by that margin).
        from jax.flatten_util import ravel_pytree

        tx = optax.flatten(optax.adam(1e-4))
        opt = tx.init(params)
        ema, _ = ravel_pytree(params)

        @jax.jit
        def step(params, opt, ema, x, key):
            def loss_fn(p):
                return nnx.merge(graphdef, p)(x, key=key)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            ema = 0.9999 * ema + 0.0001 * ravel_pytree(params)[0]
            return params, opt, ema, loss

        x = jnp.zeros((t_batch, channels, t_frames, size, size), jnp.float32)
        key = jax.random.PRNGKey(0)
        compiled = step.lower(params, opt, ema, x, key).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns a list of dicts
            cost = cost[0] if cost else {}
        step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
        step_bytes = float(cost.get("bytes accessed", 0.0)) if cost else 0.0
        if compile_only:
            return None, step_flops, step_bytes

        params, opt, ema, loss = step(params, opt, ema, x, key)
        float(loss)  # force full materialization over the tunnel
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt, ema, loss = step(params, opt, ema, x, key)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        tag = "fused" if fused else "composite"
        print(f"[train dim{dim} b4 bf16 {tag}] {dt*1000:.1f} ms/step", file=sys.stderr)
        return dt, step_flops, step_bytes

    def do_train_fused():
        # The train step is an UNSHARDED jit: it runs on one chip regardless
        # of the host's device count, so its per-chip numbers divide by 1
        # (the sampling path shards over all chips and divides by n_chips).
        dt, flops, nbytes = train_bench(fused=True)
        # The fused program undercounts flops (Pallas custom calls report
        # none); prefer the composite count from the CPU child.
        flops = _true_flops.get(32, flops)
        result["train_step_v2_2_b4_bf16_ms"] = round(dt * 1000, 1)
        result["train_step_fused_ms"] = round(dt * 1000, 1)
        result["train_optimizer_layout"] = "flat"  # scripts/ab_flat_opt.py
        result["train_steps_per_sec_per_chip"] = round(1.0 / dt, 2)
        result["train_mfu_est"] = round(flops / dt / _V5E_PEAK_FLOPS, 4) if flops else 0.0
        result["train_hbm_frac"] = (
            round(nbytes / dt / _V5E_PEAK_HBM_BPS, 3) if nbytes else 0.0
        )
        result["train_step_flops"] = flops

    def do_train_dim128():
        # Production-scale model (config_v2_3: dim 128) — the shape where MXU
        # utilization matters; the dim-32 recipe is HBM-bound (VERDICT r2).
        dt, flops, nbytes = train_bench(fused=True, dim=128)
        flops = _true_flops.get(128, flops)
        result["train_step_dim128_ms"] = round(dt * 1000, 1)
        result["train_step_dim128_flops"] = flops
        result["train_mfu_dim128"] = round(flops / dt / _V5E_PEAK_FLOPS, 4) if flops else 0.0
        result["train_hbm_frac_dim128"] = (
            round(nbytes / dt / _V5E_PEAK_HBM_BPS, 3) if nbytes else 0.0
        )

    # ----- Fast samplers (reuse the already-built prod model) -----
    def sampler_best(fn, tag, n_runs=3):
        def timed(seed: int) -> float:
            t0 = time.perf_counter()
            out = fn(seed)
            assert float(jnp.mean(out)) == float(jnp.mean(out))
            return time.perf_counter() - t0

        timed(0)  # compile
        best = min(timed(i + 1) for i in range(n_runs))
        print(f"[{tag}] best: {best:.3f}s", file=sys.stderr)
        return best

    def do_ddim():
        result["ddim_50step_s"] = round(
            sampler_best(
                lambda s: prod.ddim_sample(
                    key=jax.random.PRNGKey(s), batch_size=batch, num_steps=50
                ),
                "ddim-50",
            ),
            3,
        )


    def do_dpm():
        # Second-order multistep ODE sampler: DPM-Solver++(2M) at 20 steps.
        result["dpm_solver_20step_s"] = round(
            sampler_best(
                lambda s: prod.dpm_solver_sample(
                    key=jax.random.PRNGKey(s), batch_size=batch, num_steps=20
                ),
                "dpm-20",
            ),
            3,
        )


    def do_distilled4():
        # Progressive-distillation sampler cost: 4-step stride-grid DDIM — the
        # exact program a 2-round-distilled student runs (training/distill.py).
        # Wall-clock is parameterization-independent, so this measures the
        # distilled sampler's true cost; sample QUALITY at 4 steps additionally
        # needs the distillation training.
        result["distilled_4step_sampler_s"] = round(
            sampler_best(
                lambda s: prod.ddim_sample(
                    key=jax.random.PRNGKey(s), batch_size=batch, num_steps=4,
                    grid="stride",
                ),
                "distilled-4",
            ),
            3,
        )


    def do_train_composite():
        dt, flops, _ = train_bench(fused=False)
        result["train_step_composite_ms"] = round(dt * 1000, 1)
        # Fallback MFU fixup for when the CPU flops child did not run: the
        # composite program carries the full algorithmic FLOP count.
        if flops and 32 not in _true_flops and result.get("train_step_fused_ms"):
            fused_dt = result["train_step_fused_ms"] / 1000.0
            result["train_step_flops"] = flops
            result["train_mfu_est"] = round(flops / fused_dt / _V5E_PEAK_FLOPS, 4)

    # ----- Guided-sampling ladder (2 extra full model compiles) -----
    def do_guided():
        # Classifier-free guidance pays 2x FLOPs (batched 2b forward); a
        # guidance-distilled (w-conditioned) student runs guided sampling in
        # ONE forward. Timing is weight-independent, so random weights
        # measure the true cost of each path.
        from video_diffusion_nnx_tpu.models.text import BERT_MODEL_DIM

        def build_cond(guidance_embed: bool):
            unet = Unet3D(
                dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=channels,
                use_bert_text_cond=True, compute_dtype="bfloat16",
                use_fused_attention=True, use_fused_spatial_attention=True,
                guidance_embed=guidance_embed,
            )
            return GaussianDiffusion(
                unet, image_size=size, num_frames=frames, channels=channels,
                timesteps=steps, loss_type="l2",
            )

        cond = jax.random.normal(jax.random.PRNGKey(0), (batch, BERT_MODEL_DIM))

        def guided_best(model, tag):
            return sampler_best(
                lambda s: model.ddim_sample(
                    jax.random.PRNGKey(s), cond=cond, cond_scale=3.0,
                    batch_size=batch, num_steps=50,
                ),
                tag,
                n_runs=2,
            )

        result["cfg_ddim50_s"] = round(guided_best(build_cond(False), "cfg ddim-50"), 3)
        emit()
        if _remaining() < 180:
            print("[budget] skipping guidance-embed half", file=sys.stderr)
            return
        result["guidance_embed_ddim50_s"] = round(
            guided_best(build_cond(True), "guidance-embed ddim-50"), 3
        )


    def do_f32_parity():
        # Parity path: pure f32 composite (bit-comparable with reference math).
        # Stable to <3% across runs and rounds (43.7-43.8 s every round), so
        # one timed run suffices and the stage ranks below the newer numbers.
        f32_s, _ = measure_sampling(build(None), "f32", n_runs=1)
        result["f32_parity_s"] = round(f32_s, 3)

    # ----- Long-clip (128-frame) train step -----
    def train_bench_long(fused: bool):
        # Blockwise (flash-style) temporal kernels vs the XLA composite,
        # which materializes the f x f attention panels in HBM. 64x64
        # spatial is the representative shape: the panel traffic scales with
        # hw, so the fused win appears from ~64px up (measured: 166.9 vs
        # 206.2 ms here; at 32x32 the two are neutral, 53.7 vs 51.1 — the
        # kernels' value there is the VMEM-bounded capability, not speed).
        lc_batch, lc_frames, lc_size = 1, 128, 64
        unet = Unet3D(
            dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=channels,
            compute_dtype="bfloat16", use_fused_attention=fused,
            use_fused_spatial_attention=fused, remat_blocks=True,
        )
        diff = GaussianDiffusion(
            unet, image_size=lc_size, num_frames=lc_frames, channels=channels,
            timesteps=1000, loss_type="l2",
        )
        graphdef, params = nnx.split(diff)
        tx = optax.adam(1e-4)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, x, key):
            def loss_fn(p):
                return nnx.merge(graphdef, p)(x, key=key)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        x = jnp.zeros((lc_batch, channels, lc_frames, lc_size, lc_size), jnp.float32)
        key = jax.random.PRNGKey(0)
        params, opt, loss = step(params, opt, x, key)
        float(loss)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt, loss = step(params, opt, x, key)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        tag = "fused" if fused else "composite"
        print(f"[train 128f 64x64 b1 bf16 {tag}] {dt*1000:.1f} ms/step", file=sys.stderr)
        return dt

    def do_long_fused():
        result["train_step_128f_fused_ms"] = round(train_bench_long(fused=True) * 1000, 1)

    def do_long_comp():
        result["train_step_128f_composite_ms"] = round(
            train_bench_long(fused=False) * 1000, 1
        )


    # ----- Second denoiser family: VideoDiT at comparable scale -----
    def do_dit():
        from video_diffusion_nnx_tpu.models import VideoDiT

        dit_frames = 10  # v2_2 train recipe (the train batch below is 10f)
        dit = VideoDiT(
            dim=384, depth=8, attn_heads=6, attn_dim_head=64, patch_size=8,
            rngs=nnx.Rngs(0), channels=channels, compute_dtype="bfloat16",
            use_fused_attention=True,
        )
        diff = GaussianDiffusion(
            dit, image_size=size, num_frames=dit_frames, channels=channels,
            timesteps=steps, loss_type="l2",
        )
        graphdef, params = nnx.split(diff)
        tx = optax.adam(1e-4)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, x, key):
            def loss_fn(p):
                return nnx.merge(graphdef, p)(x, key=key)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        x = jnp.zeros((4, channels, 10, size, size), jnp.float32)
        key = jax.random.PRNGKey(0)
        compiled = step.lower(params, opt, x, key).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        params, opt, loss = step(params, opt, x, key)
        float(loss)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt, loss = step(params, opt, x, key)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"[dit train b4 bf16 fused] {dt*1000:.1f} ms/step", file=sys.stderr)
        result["dit_train_step_b4_bf16_ms"] = round(dt * 1000, 1)
        result["dit_train_mfu_est"] = round(flops / dt / _V5E_PEAK_FLOPS, 4) if flops else 0.0
        emit()
        if _remaining() < 150:
            print("[budget] skipping DiT sampling half", file=sys.stderr)
            return
        model = nnx.merge(graphdef, params)
        result["dit_ddim50_s"] = round(
            sampler_best(
                lambda s: model.ddim_sample(
                    key=jax.random.PRNGKey(s), batch_size=batch, num_steps=50
                ),
                "dit ddim-50",
            ),
            3,
        )

    # ----- Ordered stage ladder (information value per compile-second; the
    # sampler ladder, guided pair, long-clip and DiT numbers have never been
    # driver-witnessed, so they outrank re-measures of r04-witnessed train
    # stages). Estimates are measured r03/r04 stage costs + margin. -----
    stage("ddim-50", est_s=130, fn=do_ddim)
    stage("dpm-20", est_s=130, fn=do_dpm)
    stage("distilled-4", est_s=110, fn=do_distilled4)
    stage("train-fused", est_s=180, fn=do_train_fused)
    stage("guided-pair", est_s=330, fn=do_guided)
    stage("long-clip-fused", est_s=240, fn=do_long_fused)
    stage("dit-family", est_s=280, fn=do_dit)
    stage("train-dim128", est_s=210, fn=do_train_dim128)
    stage("long-clip-composite", est_s=220, fn=do_long_comp)
    stage("train-composite", est_s=180, fn=do_train_composite)
    stage("f32-parity", est_s=180, fn=do_f32_parity)

    emit()


if __name__ == "__main__":
    if "--flops-child" in sys.argv:
        dims_arg = sys.argv[sys.argv.index("--flops-child") + 1]
        _flops_child([int(d) for d in dims_arg.split(",")])
    else:
        main()
