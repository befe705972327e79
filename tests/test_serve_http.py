"""HTTP serving endpoint: round-trip a posted image."""

import http.client
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_http_pose_endpoint():
    cv2 = pytest.importorskip("cv2")
    from rtpose_tpu.demo.serve_http import serve
    from rtpose_tpu.infer.pipeline import PosePipeline
    from rtpose_tpu.models import get_model

    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    pipe = PosePipeline(model, params, input_size=48, flip=False)

    server = serve(pipe, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = (np.random.RandomState(0).rand(60, 70, 3) * 255
               ).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"] is True

        conn.request("POST", "/pose", body=buf.tobytes())
        resp = conn.getresponse()
        assert resp.status == 200
        payload = json.loads(resp.read())
        assert payload["size"] == [60, 70]
        assert isinstance(payload["people"], list)

        conn.request("POST", "/pose", body=b"not an image")
        assert conn.getresponse().status == 400
    finally:
        server.shutdown()


def test_http_concurrent_requests_micro_batch():
    """Concurrent POSTs (mixed shapes) are micro-batched by the dispatcher
    into run_batch groups — every client gets its own correct-size reply,
    and at least one dispatch carries more than one request."""
    cv2 = pytest.importorskip("cv2")
    from rtpose_tpu.demo.serve_http import serve
    from rtpose_tpu.infer.pipeline import PosePipeline
    from rtpose_tpu.models import get_model

    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    pipe = PosePipeline(model, params, input_size=48, flip=False)

    batch_sizes = []
    orig = pipe.run_batch

    def counting(frames):
        batch_sizes.append(len(frames))
        return orig(frames)

    pipe.run_batch = counting
    # generous window so all concurrent requests land in one dispatch
    server = serve(pipe, host="127.0.0.1", port=0, batch_window_ms=3000.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.RandomState(1)
        shapes = [(60, 70), (60, 70), (52, 64), (60, 70)]
        bodies = []
        for h, w in shapes:
            ok, buf = cv2.imencode(
                ".jpg", (rng.rand(h, w, 3) * 255).astype(np.uint8))
            assert ok
            bodies.append(buf.tobytes())

        results = [None] * len(bodies)

        def post(i):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=120)
            conn.request("POST", "/pose", body=bodies[i])
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(bodies))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for (status, payload), (h, w) in zip(results, shapes):
            assert status == 200
            assert payload["size"] == [h, w]
        assert max(batch_sizes) > 1, batch_sizes
    finally:
        server.shutdown()
