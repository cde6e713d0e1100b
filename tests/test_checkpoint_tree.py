"""Golden test: the full checkpoint state tree is a frozen contract.

The Orbax checkpoint format is the flat nnx state of the whole
GaussianDiffusion (reference utils.py:432-508) — 469 leaves at config_v2_2
scale. Any change to module attribute names, container nesting, or parameter
shapes breaks reference-checkpoint interchange; this test pins the exact
tree (paths + shapes + dtypes) recorded in ``tests/golden/state_tree_v2_2.txt``.
"""

from pathlib import Path

from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D

GOLDEN = Path(__file__).parent / "golden" / "state_tree_v2_2.txt"


def current_tree_lines() -> list[str]:
    unet = Unet3D(dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=1)
    diff = GaussianDiffusion(
        unet, image_size=64, num_frames=10, channels=1, timesteps=1000, loss_type="l2"
    )
    _, state = nnx.split(diff)
    lines = []
    for path, v in state.flat_state():
        key = "/".join(str(p) for p in path)
        lines.append(f"{key} {tuple(v[...].shape)} {v[...].dtype}")
    return sorted(lines)


def test_state_tree_matches_golden():
    golden = GOLDEN.read_text().splitlines()
    current = current_tree_lines()
    missing = set(golden) - set(current)
    extra = set(current) - set(golden)
    assert not missing and not extra, (
        f"checkpoint tree drifted: missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
    )
    assert len(current) == 469


def test_spot_check_reference_paths():
    """A few structurally-interesting paths spelled out for readability."""
    lines = set(current_tree_lines())
    assert "denoise_fn/downs/0/0/block_1/proj/kernel (1, 3, 3, 32, 32) float32" in lines
    assert "denoise_fn/downs/0/4/kernel (1, 4, 4, 32, 32) float32" in lines  # Downsample
    assert "denoise_fn/ups/0/0/block_1/proj/kernel (1, 3, 3, 512, 128) float32" in lines
    assert "denoise_fn/mid_spatial_attn/fn/fn/fn/q/kernel (256, 8, 32) float32" in lines
    assert "denoise_fn/time_mlp/layers/1/kernel (32, 128) float32" in lines
    assert "denoise_fn/final_conv/layers/1/kernel (1, 32, 1) float32" in lines
    assert "alphas_cumprod (1000,) float32" in lines
    assert "posterior_mean_coef2 (1000,) float32" in lines
