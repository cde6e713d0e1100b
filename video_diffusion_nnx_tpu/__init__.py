"""video_diffusion_nnx_tpu: a TPU-native video diffusion framework.

From-scratch rebuild of the capabilities of maxsonate/video-diffusion-nnx
(a Flax-NNX port of lucidrains/video-diffusion-pytorch), designed TPU-first:
folded-frame 2-D convs and flattened matmuls for the MXU, an on-device
``lax.scan`` DDPM sampler, sharded data/tensor parallelism over a
``jax.sharding.Mesh``, optional fused Pallas kernels, and a torch-free
prefetching input pipeline — while preserving the reference's public surface
(CLI flags, YAML config schema, Orbax checkpoint layout, seed semantics).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level re-exports keep `import video_diffusion_nnx_tpu` cheap.
    if name == "Unet3D":
        from video_diffusion_nnx_tpu.models.unet3d import Unet3D

        return Unet3D
    if name == "GaussianDiffusion":
        from video_diffusion_nnx_tpu.diffusion.gaussian_diffusion import GaussianDiffusion

        return GaussianDiffusion
    if name == "Trainer":
        from video_diffusion_nnx_tpu.training.trainer import Trainer

        return Trainer
    if name == "MovingMNIST":
        from video_diffusion_nnx_tpu.data.moving_mnist import MovingMNIST

        return MovingMNIST
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["Unet3D", "GaussianDiffusion", "Trainer", "MovingMNIST", "__version__"]
