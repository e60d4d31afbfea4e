"""End-to-end test of the HTTP render service example (examples/
render_service.py): a live server, real HTTP requests, valid WAVs back."""

import json
import pathlib
import runpy
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from srack_tpu.io.wav import read_wav

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.fixture(scope="module")
def service():
    mod = runpy.run_path(str(EXAMPLES / "render_service.py"))
    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("127.0.0.1", 0), mod["Handler"])
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url, body: dict):
    req = urllib.request.Request(
        url + "/render", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=300)


def test_render_service_returns_wav(service):
    with _post(service, {"preset": "sine", "seconds": 0.1}) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "audio/wav"
        body = resp.read()
    audio, sr = read_wav(body)
    assert sr == 48000
    assert audio.shape[-1] == 4800
    assert np.abs(audio).max() > 0.5


def test_render_service_param_overrides_and_batch(service):
    with _post(service, {"preset": "subtractive", "seconds": 0.2,
                         "voices": 3,
                         "params": {"vco": {"val": 0.0}}}) as resp:
        assert resp.status == 200
        audio, _ = read_wav(resp.read())
    assert np.isfinite(audio).all()


def test_render_service_rejects_bad_request(service):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(service, {"preset": "no_such_preset"})
    assert exc.value.code == 400
