"""Online inference server (herald_tpu/serve.py): checkpoint -> jitted
scorer -> HTTP endpoint. The scorer must agree with the engine's predict
path exactly; the endpoint must pad/chunk arbitrary request sizes and
stay up through malformed requests (the serving half of the reference's
export-for-serving story, hetu2onnx / inference topo)."""

import json
import threading
import urllib.request

import numpy as np

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.serve import Scorer, load_scorer, make_server
from herald_tpu.train.checkpoint import save_checkpoint
from herald_tpu.train.engine import Engine

ROWS = 1200
B = 16


def _trained_engine(tmp_path):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5)
    model = get_model(cfg.model)
    eng = Engine(cfg, table_rows=ROWS)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 6, seed=3,
                                               num_rows=ROWS)
    state = eng.init_state(0)
    state, _ = eng.train_epoch(state, dense, sparse, labels)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(state, ckpt)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(cfg.to_json())
    return cfg, eng, state, ckpt, dense, sparse


def _req(url, data=None):
    r = urllib.request.Request(
        url, data=None if data is None else json.dumps(data).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(r, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_scorer_matches_engine_predict_and_serves(tmp_path):
    cfg, eng, state, ckpt, dense, sparse = _trained_engine(tmp_path)

    # restored scorer == live engine, on an odd request size (pad+chunk:
    # 2 full batches + a 5-row tail)
    scorer = load_scorer(ckpt, cfg, table_rows=ROWS)
    n = 2 * B + 5
    got = scorer.score(dense[:n], sparse[:n])
    want = []
    for i in range(0, n, B):
        d, s = dense[:n][i:i + B], sparse[:n][i:i + B]
        m = len(s)
        if m < B:
            d = np.concatenate([d, np.repeat(d[-1:], B - m, axis=0)])
            s = np.concatenate([s, np.repeat(s[-1:], B - m, axis=0)])
        want.append(np.asarray(eng.predict(state, d, s)).reshape(-1)[:m])
    np.testing.assert_allclose(got, np.concatenate(want), rtol=1e-6)

    # HTTP surface
    srv = make_server(scorer, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, health = _req(f"http://127.0.0.1:{port}/health")
        assert code == 200 and health["status"] == "ok"
        assert health["model"] == "wdl_criteo" and health["step"] == 6

        code, resp = _req(f"http://127.0.0.1:{port}/score",
                          {"dense": dense[:n].tolist(),
                           "sparse": sparse[:n].tolist()})
        assert code == 200 and resp["n"] == n
        np.testing.assert_allclose(np.asarray(resp["probs"]), got,
                                   rtol=1e-5)
        assert all(0.0 <= p <= 1.0 for p in resp["probs"])

        # malformed requests -> 400, server stays up
        code, err = _req(f"http://127.0.0.1:{port}/score",
                         {"sparse": [[0, 1]]})          # wrong field count
        assert code == 400 and "error" in err
        code, err = _req(f"http://127.0.0.1:{port}/score",
                         {"dense": dense[:1].tolist(),
                          "sparse": (sparse[:1] + ROWS).tolist()})  # OOB id
        assert code == 400 and "out of range" in err["error"]
        code, _ = _req(f"http://127.0.0.1:{port}/health")
        assert code == 200
    finally:
        srv.shutdown()
        srv.server_close()


def test_scorer_accepts_cached_checkpoint(tmp_path):
    """A CachedTrainState checkpoint serves through the cached engine's
    base view (post-sync values)."""
    from herald_tpu.train.cached import CachedEngine
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5,
                       use_cache=True, use_scheduler=True,
                       cache_limit_ratio=0.5)
    model = get_model(cfg.model)
    eng = CachedEngine(cfg, table_rows=ROWS)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 6, seed=5,
                                               num_rows=ROWS)
    pl = eng.make_planner(sparse, epochs=1, n_threads=1)
    st = eng.init_cached_state(0)
    st, _ = eng.train_epoch_cached(st, pl, dense, sparse, labels, steps=6)
    st = eng.sync_cache(st, pl)
    pl.close()
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(st, ckpt)

    scorer = load_scorer(ckpt, cfg, table_rows=ROWS)
    probs = scorer.score(dense[:B], sparse[:B])
    want = np.asarray(eng.predict(st, dense[:B], sparse[:B])).reshape(-1)
    np.testing.assert_allclose(probs, want, rtol=1e-6)
