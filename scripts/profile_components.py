"""Per-component timing at each U-Net level's real shapes.

Breaks the remaining forward time into convs / norms / attention / resample
per level so optimization effort goes where the milliseconds are.

Usage: /opt/venv/bin/python scripts/profile_components.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, ".")

from video_diffusion_nnx_tpu.models import (
    Block,
    Downsample,
    MultiheadAttention,
    ResnetBlock,
    SpatialLinearAttention,
    Upsample,
)

B, F = 8, 16
# (spatial, channels_in, channels_out) per level for the dim-32 model.
LEVELS = [(64, 32, 32), (32, 32, 64), (16, 64, 128), (8, 128, 256)]


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1000


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rngs = nnx.Rngs(0)
    total = {}
    for s, cin, cout in LEVELS:
        x_in = jax.random.normal(jax.random.PRNGKey(0), (B, F, s, s, cin))
        x_out = jax.random.normal(jax.random.PRNGKey(0), (B, F, s, s, cout))
        t_emb = jax.random.normal(jax.random.PRNGKey(1), (B, 128))

        rb = ResnetBlock(cin, cout, rngs=rngs, time_emb_dim=128)
        graphdef, st = nnx.split(rb)
        t_rb = timeit(jax.jit(lambda st, x, t: nnx.merge(graphdef, st)(x, t)), st, x_in, t_emb)

        sla = SpatialLinearAttention(cout, heads=8, D=32, rngs=rngs)
        gd2, st2 = nnx.split(sla)
        t_sla = timeit(jax.jit(lambda st, x: nnx.merge(gd2, st)(x) + x), st2, x_out)

        mha = MultiheadAttention(in_features=cout, dim=32, num_heads=8, rngs=rngs)
        gd3, st3 = nnx.split(mha)

        def tattn(st, x):
            m = nnx.merge(gd3, st)
            b, f, hh, ww, c = x.shape
            xr = x.reshape(b, f, hh * ww, c).transpose(0, 2, 1, 3)
            return (xr + m(xr)).transpose(0, 2, 1, 3).reshape(x.shape)

        t_mha = timeit(jax.jit(tattn), st3, x_out)

        down = Downsample(cout, rngs)
        gd4, st4 = nnx.split(down)
        t_down = timeit(jax.jit(lambda st, x: nnx.merge(gd4, st)(x)), st4, x_out)

        up = Upsample(cout, rngs)
        gd5, st5 = nnx.split(up)
        t_up = timeit(jax.jit(lambda st, x: nnx.merge(gd5, st)(x)), st5, x_out)

        print(
            f"L{s:3d} cin={cin:3d} cout={cout:3d}: resnet {t_rb:6.2f}  spatial-attn {t_sla:6.2f}  "
            f"temporal-attn {t_mha:6.2f}  down {t_down:5.2f}  up {t_up:5.2f}  (ms)"
        )
        for k, v in [("resnet", t_rb), ("sla", t_sla), ("mha", t_mha), ("down", t_down), ("up", t_up)]:
            total[k] = total.get(k, 0) + v
    print("totals per component (one call per level):", {k: round(v, 1) for k, v in total.items()})


if __name__ == "__main__":
    main()
