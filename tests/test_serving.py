"""Serving layer: endpoint handler contract, HTTP server, pipecat adapter."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tiny_audio_tpu.handler import EndpointHandler
from tiny_audio_tpu.integrations.pipecat_stt import pcm16_to_float32
from tiny_audio_tpu.serving import make_server


@pytest.fixture(scope="module")
def handler():
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.pipeline import ASRPipeline

    model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
    return EndpointHandler(pipeline=ASRPipeline(model))


class TestEndpointHandler:
    def test_array_input(self, handler):
        audio = np.zeros(8000, np.float32)
        out = handler({"inputs": audio})
        assert "text" in out

    def test_missing_inputs(self, handler):
        assert "error" in handler({})

    def test_parameters_forwarded(self, handler):
        audio = np.zeros(8000, np.float32)
        out = handler({"inputs": audio, "parameters": {"return_timestamps": True}})
        assert "words" in out

    def test_bad_request_does_not_raise(self, handler):
        out = handler({"inputs": object()})
        assert "error" in out

    def test_wav_bytes_input(self, handler, tmp_path):
        from tiny_audio_tpu.utils.audio_io import write_wav

        p = tmp_path / "a.wav"
        write_wav(p, np.zeros(8000, np.float32))
        out = handler({"inputs": p.read_bytes()})
        assert "text" in out


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def server_url(self, request):
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        handler = EndpointHandler(pipeline=ASRPipeline(model))
        server = make_server(handler, host="127.0.0.1", port=0)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        request.addfinalizer(server.shutdown)
        return f"http://127.0.0.1:{port}"

    def test_healthz(self, server_url):
        with urllib.request.urlopen(f"{server_url}/healthz") as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"

    def test_transcribe_pcm(self, server_url):
        audio = np.zeros(8000, np.float32).tobytes()
        req = urllib.request.Request(
            f"{server_url}/transcribe", data=audio,
            headers={"Content-Type": "application/pcm-f32"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert "text" in body

    def test_transcribe_confidence(self, server_url):
        audio = np.zeros(8000, np.float32).tobytes()
        req = urllib.request.Request(
            f"{server_url}/transcribe?confidence=1", data=audio,
            headers={"Content-Type": "application/pcm-f32"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert "text" in body
        assert 0.0 < body["confidence"] <= 1.0

    def test_unknown_route_404(self, server_url):
        req = urllib.request.Request(f"{server_url}/nope", data=b"x")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 404

    def test_metrics_endpoint(self, server_url):
        """Prometheus text format: counters increment, histogram sums."""
        audio = np.zeros(8000, np.float32).tobytes()
        req = urllib.request.Request(
            f"{server_url}/transcribe", data=audio,
            headers={"Content-Type": "application/pcm-f32"},
        )
        with urllib.request.urlopen(req) as r:
            r.read()
        with urllib.request.urlopen(f"{server_url}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert 'ta_requests_total{route="/transcribe",code="200"}' in text
        count = [ln for ln in text.splitlines()
                 if ln.startswith("ta_transcribe_latency_seconds_count")]
        assert count and int(count[0].split()[-1]) >= 1
        inf = [ln for ln in text.splitlines() if 'le="+Inf"' in ln]
        assert inf and int(inf[0].split()[-1]) >= 1
        assert "ta_uptime_seconds" in text

    def test_metrics_extra_gauges(self):
        from tiny_audio_tpu.serving import ServerMetrics

        m = ServerMetrics()
        m.gauge_fns["ta_realtime_sessions"] = lambda: 3
        m.gauge_fns["ta_broken_gauge"] = lambda: 1 / 0  # must not break scrape
        text = m.render()
        assert "ta_realtime_sessions 3" in text
        assert "ta_broken_gauge" not in text
        assert text.endswith("\n")

    @pytest.mark.parametrize("name,body,ctype", [
        ("garbage", b"\x00\x01NOTAWAV" * 64, "application/octet-stream"),
        ("truncated-riff", b"RIFF\x24\x00\x00\x00WAVE", "application/octet-stream"),
        ("empty", b"", "application/octet-stream"),
        ("nan-pcm", np.full(1000, np.nan, np.float32).tobytes(),
         "application/pcm-f32"),
    ])
    def test_malformed_bodies_yield_json_errors(self, server_url, name,
                                                body, ctype):
        """Adversarial request bodies must produce a descriptive JSON error
        — never a 200 with junk text (NaN PCM did exactly that before the
        pipeline's finite check) and never a crashed connection."""
        req = urllib.request.Request(
            f"{server_url}/transcribe", data=body,
            headers={"Content-Type": ctype},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=120)
        assert e.value.code == 500
        assert json.loads(e.value.read())["error"]


class TestShardedServing:
    @pytest.mark.slow
    def test_tp2_handler_matches_single_device(self):
        """serve --tp 2: the sharded handler's transcript must equal the
        unsharded one (GSPMD changes layout, not math — same contract as
        tests/test_sharded_inference.py, but through the serving entry)."""
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        audio = (np.random.default_rng(7).standard_normal(12000) * 0.1
                 ).astype(np.float32)

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        plain = EndpointHandler(pipeline=ASRPipeline(model))
        want = plain({"inputs": audio})["text"]

        model2 = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        sharded = EndpointHandler(
            pipeline=ASRPipeline(model2), tp=2, dp=2
        )
        assert sharded.mesh is not None
        assert sharded.mesh.devices.shape == (2, 2)
        got = sharded({"inputs": audio})["text"]
        assert got == want

        # and through the HTTP server — pipeline calls run on a DIFFERENT
        # thread, so this proves no thread-local mesh context is required
        # (the params' NamedShardings carry the mesh)
        server = make_server(sharded, host="127.0.0.1", port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/transcribe", data=audio.tobytes(),
                headers={"Content-Type": "application/pcm-f32"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                body = json.loads(r.read())
            assert body["text"] == want
        finally:
            server.shutdown()


class TestPipecat:
    def test_pcm16_conversion(self):
        pcm = np.array([0, 16384, -32768, 32767], np.int16).tobytes()
        out = pcm16_to_float32(pcm)
        np.testing.assert_allclose(
            out, [0.0, 0.5, -1.0, 32767 / 32768], atol=1e-6
        )

    def test_service_requires_pipecat(self):
        from tiny_audio_tpu.integrations import pipecat_stt

        if not pipecat_stt._HAVE_PIPECAT:
            with pytest.raises(ImportError):
                pipecat_stt.TinyAudioSTTService(model_path="x")
