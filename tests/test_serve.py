"""Sampling-server tests (scripts/serve.py): the HTTP surface runs the
real samplers in-process on an ephemeral port."""

import base64
import json
import threading
import urllib.error
import urllib.request

import pytest
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D


@pytest.fixture(scope="module")
def server_url():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import serve as serve_mod

    unet = Unet3D(dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2)
    model = GaussianDiffusion(
        unet, image_size=8, num_frames=2, channels=1, timesteps=6, loss_type="l2"
    )
    httpd = serve_mod.create_server(model, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/sample",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


class TestServer:
    def test_health(self, server_url):
        with urllib.request.urlopen(server_url + "/health", timeout=30) as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["model"]["image_size"] == 8
        assert info["model"]["timesteps"] == 6

    def test_sample_ddim_returns_gifs(self, server_url):
        out = _post(server_url, {
            "batch_size": 2, "sampler": "ddim", "num_steps": 3, "seed": 1,
        })
        assert out["shape"] == [2, 1, 2, 8, 8]
        assert len(out["gifs"]) == 2
        for g in out["gifs"]:
            raw = base64.b64decode(g)
            assert raw[:6] in (b"GIF87a", b"GIF89a")
        assert out["time_s"] > 0

    def test_sample_stride_grid_and_dpm(self, server_url):
        for payload in (
            {"sampler": "ddim", "num_steps": 2, "grid": "stride"},
            {"sampler": "dpm", "num_steps": 2},
        ):
            out = _post(server_url, payload)
            assert len(out["gifs"]) == 1

    def test_bad_request_400(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server_url, {"sampler": "karras"})
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "sampler" in body["error"]

    def test_unknown_path_404(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(server_url + "/nope", timeout=30)
        assert ei.value.code == 404


class TestConditionedServer:
    def test_text_cond_sampling_over_http(self):
        """A conditioned (guidance-capable) model serves text + cond_scale
        through the same endpoint — single-forward CFG for a
        guidance_embed model."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
        import serve as serve_mod

        from video_diffusion_nnx_tpu.models.text import BERT_MODEL_DIM

        unet = Unet3D(
            dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2,
            cond_dim=BERT_MODEL_DIM, guidance_embed=True,
        )
        model = GaussianDiffusion(
            unet, image_size=8, num_frames=2, channels=1, timesteps=4,
            loss_type="l2",
        )
        httpd = serve_mod.create_server(model, host="127.0.0.1", port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            host, port = httpd.server_address
            out = _post(f"http://{host}:{port}", {
                "batch_size": 2, "sampler": "ddim", "num_steps": 2,
                "text": ["a bouncing ball"], "cond_scale": 3.0,
            })
            assert out["shape"] == [2, 1, 2, 8, 8]
            assert len(out["gifs"]) == 2
        finally:
            httpd.shutdown()


class TestValidation:
    """The server rejects requests whose parameters would silently not run
    as asked (reviewed failure modes)."""

    def test_ddpm_rejects_num_steps(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server_url, {"sampler": "ddpm", "num_steps": 3})
        assert ei.value.code == 400

    def test_dpm_rejects_eta_and_grid(self, server_url):
        for extra in ({"eta": 0.5}, {"grid": "stride"}):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(server_url, {"sampler": "dpm", "num_steps": 2, **extra})
            assert ei.value.code == 400

    def test_text_on_unconditional_model_400(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server_url, {"sampler": "ddim", "num_steps": 2, "text": ["x"]})
        assert ei.value.code == 400

    def test_nonfinite_eta_rejected(self, server_url):
        # json.loads accepts NaN; a NaN in the sampler cache key would miss
        # (and pollute) the compiled-executable LRU forever.
        req = urllib.request.Request(
            server_url + "/sample",
            data=b'{"sampler": "ddim", "num_steps": 2, "eta": NaN}',
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400

    def test_text_count_vs_batch_size_mismatch_400(self, server_url):
        # Needs a conditioned model; the module fixture is unconditional,
        # so use the validation path that fires first: text on uncond.
        with pytest.raises(urllib.error.HTTPError):
            _post(server_url, {"batch_size": 3, "text": ["a", "b"]})

    def test_default_sampler_is_ddim(self, server_url):
        # {} must run the warm DDIM path, not the full DDPM chain.
        out = _post(server_url, {"num_steps": 2})
        assert len(out["gifs"]) == 1


class TestExtendEndpoint:
    @staticmethod
    def _known_b64(shape=(1, 2, 8, 8)):
        import io

        import numpy as np

        buf = io.BytesIO()
        np.save(buf, np.random.default_rng(0).random(shape, dtype=np.float32))
        return base64.b64encode(buf.getvalue()).decode()

    def test_extend_returns_gifs(self, server_url):
        out = _post_path(server_url, "/extend", {
            "known_npy_b64": self._known_b64(),
            "frame_mask": [True, False],
            "batch_size": 2, "num_steps": 2,
        })
        assert out["shape"] == [2, 1, 2, 8, 8]
        assert len(out["gifs"]) == 2
        for g in out["gifs"]:
            assert base64.b64decode(g)[:6] in (b"GIF87a", b"GIF89a")

    def test_extend_validations(self, server_url):
        cases = [
            {},  # missing array
            {"known_npy_b64": self._known_b64(), "frame_mask": [True, True]},
            {"known_npy_b64": self._known_b64(), "frame_mask": [True]},
            {"known_npy_b64": self._known_b64((2, 2, 8, 8)),
             "frame_mask": [True, False]},
            {"known_npy_b64": self._known_b64(), "frame_mask": [True, False],
             "recon_guidance": 1.0, "num_steps": None},  # DDPM chain + wr
        ]
        for payload in cases:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post_path(server_url, "/extend", payload)
            assert ei.value.code == 400, payload


def _post_path(url, path, payload):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


class TestMicroBatcher:
    """Unit tests of the request coalescer with a stub runner (no model)."""

    @staticmethod
    def _make(calls, max_rows=8, window_s=0.15):
        import sys
        from pathlib import Path

        import numpy as np

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
        import serve as serve_mod

        def run_batch(key, batch):
            rows = sum(p.noise.shape[0] for p in batch)
            calls.append((key, rows, len(batch)))
            return np.concatenate([np.asarray(p.noise) for p in batch])

        return serve_mod.MicroBatcher(run_batch, max_rows=max_rows, window_s=window_s)

    def test_concurrent_same_key_coalesce(self):
        import numpy as np

        calls = []
        b = self._make(calls)
        outs = {}

        def go(i):
            noise = np.full((1, 2), float(i), np.float32)
            outs[i] = b.submit(("k",), noise, None)

        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        b.close()
        # All three landed in ONE device call of 3 rows...
        assert len(calls) == 1 and calls[0][1] == 3 and calls[0][2] == 3
        # ...and each got ITS OWN rows back, with the group size reported.
        for i in range(3):
            rows, group, wait = outs[i]
            np.testing.assert_array_equal(rows, np.full((1, 2), float(i)))
            assert group == 3
            assert wait >= 0

    def test_different_keys_do_not_coalesce(self):
        import numpy as np

        calls = []
        b = self._make(calls, window_s=0.05)
        done = []

        def go(key):
            done.append(b.submit(key, np.zeros((1, 2), np.float32), None))

        threads = [
            threading.Thread(target=go, args=(("ddim", n),)) for n in (2, 3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        b.close()
        assert len(calls) == 2
        assert all(c[2] == 1 for c in calls)

    def test_max_rows_splits_batches(self):
        import numpy as np

        calls = []
        b = self._make(calls, max_rows=2, window_s=0.15)
        threads = [
            threading.Thread(
                target=lambda: b.submit(("k",), np.zeros((1, 2), np.float32), None)
            )
            for _ in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        b.close()
        assert len(calls) >= 2
        assert all(rows <= 2 for _, rows, _ in calls)
        assert sum(rows for _, rows, _ in calls) == 4

    def test_oversize_request_runs_alone(self):
        import numpy as np

        calls = []
        b = self._make(calls, max_rows=2, window_s=0.01)
        rows, group, _ = b.submit(("k",), np.zeros((5, 2), np.float32), None)
        b.close()
        assert rows.shape == (5, 2)
        assert group == 1
        assert calls == [(("k",), 5, 1)]

    def test_runner_error_propagates_to_all_waiters(self):
        import sys
        from pathlib import Path

        import numpy as np

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
        import serve as serve_mod

        def boom(key, batch):
            raise RuntimeError("device on fire")

        b = serve_mod.MicroBatcher(boom, max_rows=8, window_s=0.1)
        errs = []

        def go():
            try:
                b.submit(("k",), np.zeros((1, 2), np.float32), None)
            except RuntimeError as e:
                errs.append(str(e))

        threads = [threading.Thread(target=go) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        b.close()
        assert errs == ["device on fire", "device on fire"]


class TestServerBatching:
    """End-to-end: coalesced HTTP requests return exactly what solo runs
    would (the init_noise ODE contract), and report the coalescing."""

    @pytest.fixture(scope="class")
    def batching_setup(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
        import serve as serve_mod

        unet = Unet3D(dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2)
        model = GaussianDiffusion(
            unet, image_size=8, num_frames=2, channels=1, timesteps=6, loss_type="l2"
        )
        # Long window so concurrent test requests reliably coalesce.
        httpd = serve_mod.create_server(
            model, host="127.0.0.1", port=0, batch_window_s=0.5
        )
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        host, port = httpd.server_address
        solo = serve_mod.SamplingService(model, batch_window_s=None)
        yield f"http://{host}:{port}", solo
        httpd.shutdown()

    @staticmethod
    def _gif_pixels(b64gif):
        import io

        import numpy as np
        from PIL import Image, ImageSequence

        im = Image.open(io.BytesIO(base64.b64decode(b64gif)))
        return np.stack(
            [np.asarray(f.convert("L")) for f in ImageSequence.Iterator(im)]
        )

    def test_concurrent_requests_coalesce_and_match_solo(self, batching_setup):
        import numpy as np

        url, solo = batching_setup
        payloads = [
            {"sampler": "ddim", "num_steps": 3, "seed": s, "batch_size": 1}
            for s in (11, 22, 33)
        ]
        outs = [None] * 3

        def go(i):
            outs[i] = _post(url, payloads[i])

        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(o is not None for o in outs)
        # At least one request saw a coalesced batch (window is 0.5 s).
        assert max(o["coalesced"] for o in outs) >= 2
        # Every request's pixels match its solo (no-batcher) run: the
        # outputs differ only by float ~1e-5, i.e. <= 1 uint8 level.
        for payload, out in zip(payloads, outs):
            ref = solo.sample(dict(payload))
            got = self._gif_pixels(out["gifs"][0]).astype(np.int16)
            want = self._gif_pixels(ref["gifs"][0]).astype(np.int16)
            assert got.shape == want.shape
            assert np.max(np.abs(got - want)) <= 1, payload

    def test_solo_batched_path_shape_metadata(self, batching_setup):
        url, _ = batching_setup
        out = _post(url, {"sampler": "dpm", "num_steps": 2, "batch_size": 3})
        assert out["shape"] == [3, 1, 2, 8, 8]
        assert len(out["gifs"]) == 3
        assert out["coalesced"] >= 1
        assert "queue_wait_s" in out
