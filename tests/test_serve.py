"""serve.py end-to-end over a real socket (tiny geometry)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax
    from http.server import HTTPServer
    from tests.ref_utils import load_repo_module
    serve_mod = load_repo_module('serve')
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.train.checkpoint import save_net

    tmp = tmp_path_factory.mktemp("serve")
    cfg_seed = Config(name="srv", checkpoints_dir=str(tmp), n_feats=8,
                      loadSize=64, patch_size=8, num_heads=2,
                      hidden_dim_ratio=2, isTrain=False)
    spec = generator_spec(cfg_seed.model_G, cfg_seed)
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = jax.numpy.zeros((1, 128, 128, 3))
    _, params = jax.jit(lambda p, xx: generator_forward(
        p, spec, xx, actnorm_init=True))(params, x)
    save_net(cfg_seed, "5", "G", params)

    argv = ["--name", "srv", "--checkpoints_dir", str(tmp),
            "--dataroot", str(tmp), "--which_epoch", "5",
            "--n_feats", "8", "--loadSize", "64", "--patch_size", "8",
            "--num_heads", "2", "--hidden_dim_ratio", "2"]
    cfg, model, size = serve_mod.build_model(argv)
    stats = serve_mod.Stats()
    httpd = HTTPServer(("127.0.0.1", 0),
                       serve_mod.make_handler(cfg, model, size, stats))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield {"url": f"http://127.0.0.1:{httpd.server_port}",
           "model": model, "cfg": cfg}
    httpd.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server['url']}/healthz") as r:
        data = json.loads(r.read())
    assert data["status"] == "ok" and data["input_size"] == 128


def test_dehaze_roundtrip(server, rng):
    buf = io.BytesIO()
    Image.fromarray((rng.rand(128, 128, 3) * 255).astype(np.uint8)) \
        .save(buf, "PNG")
    req = urllib.request.Request(f"{server['url']}/dehaze", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (128, 128, 3)


def test_dehaze_resizes_mismatched_input(server, rng):
    buf = io.BytesIO()
    Image.fromarray((rng.rand(200, 300, 3) * 255).astype(np.uint8)) \
        .save(buf, "PNG")
    req = urllib.request.Request(f"{server['url']}/dehaze", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (128, 128, 3)


def test_dehaze_rejects_garbage(server):
    req = urllib.request.Request(f"{server['url']}/dehaze", data=b"not an image",
                                 method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_dehaze_content_matches_model(server, rng):
    """Served PNG must be byte-identical to the model's own fake_A visual.

    Regression for advisor r1 high: the u8-wire model already returns uint8
    visuals, and serve.py re-applied the [-1,1]->uint8 conversion, turning
    nearly every pixel white.
    """
    pix = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(pix).save(buf, "PNG")
    req = urllib.request.Request(f"{server['url']}/dehaze",
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as r:
        got = np.asarray(Image.open(io.BytesIO(r.read())))

    model, cfg = server["model"], server["cfg"]
    x = pix.astype(np.float32)[None] / 255.0 * 2 - 1  # handler's preprocess
    model.set_input({"B": x, "B_paths": ["t"]})
    want = model.test(cfg)["fake_A"][0]
    if want.dtype != np.uint8:
        want = ((want.astype(np.float32) + 1) / 2 * 255) \
            .clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    # and the output is not the saturated-white image the bug produced
    assert (got == 255).mean() < 0.5


def test_model_input_normalizes_float_path(rng):
    """advisor r2 (medium): when the model's u8 wire is disabled
    (--chop/--self_ensemble), the Batcher must hand set_input [-1,1]
    floats, not raw 0-255 uint8."""
    from tests.ref_utils import load_repo_module
    serve_mod = load_repo_module('serve')

    class M:
        pass

    u8 = (rng.rand(2, 8, 8, 3) * 255).astype(np.uint8)
    m = M(); m._u8_io = True
    assert serve_mod._model_input(m, u8) is u8
    m._u8_io = False
    f = serve_mod._model_input(m, u8)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, u8.astype(np.float32) / 127.5 - 1.0)


def test_warm_batch_shapes_cover_non_pow2():
    from tests.ref_utils import load_repo_module
    serve_mod = load_repo_module('serve')
    assert serve_mod._batch_shapes(4) == [1, 2, 4]
    assert serve_mod._batch_shapes(6) == [1, 2, 4, 6]
    assert serve_mod._batch_shapes(1) == [1]


def test_concurrent_requests_batch(server, rng):
    """Concurrent requests coalesce into one device call (micro-batching,
    VERDICT r1 weak #8)."""
    import http.server
    from tests.ref_utils import load_repo_module
    serve_mod = load_repo_module('serve')

    stats = serve_mod.Stats()
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        serve_mod.make_handler(server["cfg"], server["model"], 128, stats,
                               max_batch=4, window_ms=300.0))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_port}/dehaze"
    try:
        bufs = []
        for i in range(4):
            b = io.BytesIO()
            Image.fromarray((rng.rand(128, 128, 3) * 255)
                            .astype(np.uint8)).save(b, "PNG")
            bufs.append(b.getvalue())

        outs = [None] * 4

        def post(i):
            req = urllib.request.Request(url, data=bufs[i], method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                outs[i] = np.asarray(Image.open(io.BytesIO(r.read())))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert all(o is not None and o.shape == (128, 128, 3) for o in outs)
        # with a 300ms window and simultaneous posts, at least one device
        # call must have carried more than one request
        assert stats.get("max_seen", 0) >= 2, stats
    finally:
        httpd.shutdown()
