"""HTTP serving front-end (tools/serve.py).

Spins the stdlib server on an ephemeral port around a tiny pipeline and
drives it over real HTTP: health, generation round trip (denormalized),
request validation, and the max_batch guard.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from motiondiffusion_moe_tpu.tools.export import export_run
from motiondiffusion_moe_tpu.tools.serve import make_server

from tests.test_export import _make_run, _tiny_cfg


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

    tmp = tmp_path_factory.mktemp("serve")
    run = _make_run(tmp, _tiny_cfg())
    out = export_run(run)
    pipe = GenerationPipeline.from_export(
        out, sampler="ddim", num_inference_steps=5, micro_batch=2)
    srv = make_server(pipe, port=0, max_batch=4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestServe:
    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz", timeout=60) as r:
            body = json.loads(r.read())
        assert body["ok"] is True
        assert body["sampler"] == "ddim"

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{server}/nope", timeout=60)
        assert e.value.code == 404

    def test_bad_request_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{server}/generate", {"texts": ["a"]})  # no lengths
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{server}/generate",
                  {"texts": ["a"] * 9, "lengths": [8] * 9})  # > max_batch
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert "max_batch" in body["error"]

    def test_out_of_range_length_400(self, server):
        # generate()'s own validation must surface as a 400, not a 500
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{server}/generate", {"texts": ["a"], "lengths": [999]})
        assert e.value.code == 400

    @pytest.mark.slow
    def test_generate_round_trip(self, server):
        status, body = _post(f"{server}/generate", {
            "texts": ["a person walks", "a person jumps"],
            "lengths": [16, 12], "seed": 3})
        assert status == 200
        assert body["shapes"] == [[16, 26], [12, 26]]
        m0 = np.asarray(body["motions"][0], np.float32)
        assert m0.shape == (16, 26) and np.isfinite(m0).all()
        # same seed -> same motion; the export's normalizer (std=2) was
        # applied server-side
        _, again = _post(f"{server}/generate", {
            "texts": ["a person walks", "a person jumps"],
            "lengths": [16, 12], "seed": 3})
        np.testing.assert_allclose(
            np.asarray(again["motions"][0]), m0, rtol=1e-5, atol=1e-6)
        _, raw = _post(f"{server}/generate", {
            "texts": ["a person walks", "a person jumps"],
            "lengths": [16, 12], "seed": 3, "denormalize": False})
        np.testing.assert_allclose(
            np.asarray(raw["motions"][0]) * 2.0 + 0.5, m0,
            rtol=1e-4, atol=1e-5)
