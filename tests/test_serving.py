"""Action server round-trip on a tiny model over a real socket."""

import threading

import numpy as np
import pytest

from blurr_tpu.serving.client import ActionClient
from blurr_tpu.serving.server import ActionServer
from tests.util import tiny_pi0_cfg


@pytest.fixture(scope="module")
def server():
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random")
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_forever, kwargs={"port": 0, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    yield srv
    srv.stop()


def test_predict_roundtrip(server):
    client = ActionClient(port=server.port)
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (60, 80, 3), np.uint8)  # off-size: resized
    actions = client.predict(image, "pick up the carrot", [0.1] * 7)
    assert actions.shape == (4, 7)
    assert np.isfinite(actions).all()
    assert (np.abs(actions) <= 1.0).all()
    # second request on the same connection (instruction cache path)
    actions2 = client.predict(image, "pick up the carrot", [0.1] * 7)
    assert actions2.shape == (4, 7)
    client.close()


def test_error_keeps_connection(server):
    client = ActionClient(port=server.port)
    with pytest.raises(RuntimeError):
        client.predict(
            np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 3  # wrong proprio dim
        )
    # connection still usable after the error
    out = client.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 7)
    assert out.shape == (4, 7)
    client.close()


def test_concurrent_clients(server):
    results = []

    def hit(i):
        c = ActionClient(port=server.port)
        out = c.predict(
            np.full((28, 28, 3), i * 10, np.uint8), f"task {i}", [0.0] * 7
        )
        results.append(out)
        c.close()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert len(results) == 4
    for r in results:
        assert r.shape == (4, 7) and np.isfinite(r).all()
