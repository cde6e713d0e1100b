"""Tests for the data layer.

Coverage model: reference test_datasets.py:1-106 — rebuilt, not ported —
plus loader/prefetcher coverage the reference never had.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from video_diffusion_nnx_tpu.data import (
    DataLoader,
    MovingMNIST,
    device_prefetch,
    endless_prefetching_loader,
)
from video_diffusion_nnx_tpu.parallel import data_parallel_mesh


@pytest.fixture(scope="module")
def npy_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "seq.npy"
    rng = np.random.default_rng(0)
    # Reference on-disk contract: (frames, sequences, h, w) uint8.
    np.save(path, rng.integers(0, 256, size=(15, 5, 32, 32), dtype=np.uint8).astype(np.uint8))
    return str(path)


class TestMovingMNIST:
    def test_len(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=10)
        assert len(ds) == 5

    def test_item_shape_truncated(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=10)
        item = ds[0]
        assert item.shape == (1, 10, 32, 32)
        assert item.dtype == np.float32

    def test_item_shape_padded(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=20)
        item = ds[0]
        assert item.shape == (1, 20, 32, 32)
        assert float(np.abs(item[:, 15:]).sum()) == 0.0

    def test_force_num_frames_disabled(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=10, force_num_frames=False)
        assert ds[0].shape == (1, 15, 32, 32)

    def test_raw_values_by_default(self, npy_path):
        """Parity: values stay 0..255 (the reference never applied its
        ToTensor transform, datasets.py:61-64)."""
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=15)
        assert float(np.max(ds[0])) > 1.5

    def test_normalize_option(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=15, normalize=True)
        assert 0.0 <= float(np.min(ds[0])) and float(np.max(ds[0])) <= 1.0

    def test_misspelled_channnels_attr_kept(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), channels=1, num_frames=10)
        assert ds.channnels == 1
        assert ds.channels == 1


class TestDataLoader:
    def test_batch_shape_and_drop_last(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=10)
        dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=0)
        batches = list(dl)
        assert len(batches) == 2  # 5 // 2
        assert batches[0].shape == (2, 1, 10, 32, 32)

    def test_shuffle_is_seeded(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=10)
        a = list(DataLoader(ds, batch_size=5, shuffle=True, seed=7, drop_last=True))[0]
        b = list(DataLoader(ds, batch_size=5, shuffle=True, seed=7, drop_last=True))[0]
        np.testing.assert_array_equal(a, b)

    def test_reshuffles_per_epoch(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=10)
        dl = DataLoader(ds, batch_size=5, shuffle=True, seed=0, drop_last=True)
        e1 = list(dl)[0]
        e2 = list(dl)[0]
        # 5 sequences, random permutations: overwhelmingly likely to differ.
        assert not np.array_equal(e1, e2)


class TestPrefetch:
    def test_device_prefetch_yields_device_arrays(self, npy_path):
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=8)
        dl = DataLoader(ds, batch_size=2, seed=0)
        it = device_prefetch(dl, depth=2)
        batch = next(it)
        assert isinstance(batch, jax.Array)
        assert batch.shape == (2, 1, 8, 32, 32)

    def test_prefetch_with_sharding(self, npy_path):
        mesh = data_parallel_mesh(8)
        sharding = NamedSharding(mesh, P("data"))
        ds = MovingMNIST(npy_path, image_size=(32, 32), num_frames=8)

        class Rep:  # 8-item dataset so the batch divides over 8 devices
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return ds[i % len(ds)]

        it = endless_prefetching_loader(Rep(), batch_size=8, sharding=sharding, seed=0)
        batch = next(it)
        assert batch.sharding == sharding
        assert batch.shape == (8, 1, 8, 32, 32)

    def test_prefetch_propagates_errors(self):
        def bad():
            yield np.zeros(2)
            raise RuntimeError("boom")

        it = device_prefetch(bad(), depth=1)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)


class TestGifVideoDataset:
    @pytest.fixture(scope="class")
    def gif_folder(self, tmp_path_factory):
        from video_diffusion_nnx_tpu.utils.media import video_array_to_gif

        folder = tmp_path_factory.mktemp("gifs")
        rng = np.random.default_rng(0)
        for name in ("bouncing-ball.gif", "spinning_top.gif"):
            vid = rng.integers(0, 256, size=(6, 12, 12, 1), dtype=np.uint8)
            video_array_to_gif(vid, folder / name)
        return folder

    def test_item_shape_and_range(self, gif_folder):
        from video_diffusion_nnx_tpu.data import GifVideoDataset

        ds = GifVideoDataset(str(gif_folder), image_size=8, channels=1, num_frames=4)
        assert len(ds) == 2
        item = ds[0]
        assert item.shape == (1, 4, 8, 8)
        assert item.dtype == np.float32
        assert 0.0 <= item.min() and item.max() <= 1.0

    def test_frame_padding(self, gif_folder):
        from video_diffusion_nnx_tpu.data import GifVideoDataset

        ds = GifVideoDataset(str(gif_folder), image_size=8, channels=1, num_frames=10)
        assert ds[0].shape == (1, 10, 8, 8)
        assert float(np.abs(ds[0][:, 6:]).sum()) == 0.0

    def test_path_as_cond(self, gif_folder):
        from video_diffusion_nnx_tpu.data import GifVideoDataset

        ds = GifVideoDataset(
            str(gif_folder), image_size=8, channels=1, num_frames=4, use_path_as_cond=True
        )
        video, caption = ds[0]
        assert video.shape == (1, 4, 8, 8)
        assert caption == "bouncing ball"

    def test_empty_folder_raises(self, tmp_path):
        from video_diffusion_nnx_tpu.data import GifVideoDataset

        with pytest.raises(FileNotFoundError):
            GifVideoDataset(str(tmp_path), image_size=8)
