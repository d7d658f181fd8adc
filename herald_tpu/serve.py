"""Online inference: serve a trained checkpoint over HTTP.

The reference hands trained models to a separate serving stack via ONNX
export (`hetu2onnx`, rebuilt as `--export-onnx` + `herald_tpu/onnx/`) and
keeps an inference graph path in the executor (`ParameterServerSparsePullOp`,
`gpu_ops/ParameterServerCommunicate.py:254-306`; `find_topo_sort_inference`,
`executor.py:1344-1370`). This module is the direct-serving half: a jitted
static-shape batch scorer over the SAME engine predict path the trainer
validates with, behind a stdlib HTTP endpoint — a trained run is queryable
with no conversion step.

    python -m herald_tpu.serve --ckpt runs/wdl/ckpt \
        --config runs/wdl/config.json --port 8976

API:
    GET  /health -> {"status": "ok", "model": ..., "step": N, "batch": B}
    POST /score  {"dense": [[...], ...], "sparse": [[...], ...]}
              -> {"probs": [...], "n": N}

Requests pad to the compiled batch (ONE program, zero recompiles) and
chunk when larger; the compiled shape is the training global batch by
default (`--batch` overrides, one extra compile at startup).
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from herald_tpu.config import HeraldConfig
from herald_tpu.models.base import get_model


class Scorer:
    """Pads/chunks request rows through the engine's jitted eval step.

    Accepts plain and cached checkpoints; a cached state is converted to
    its base view (call sites should serve checkpoints written AFTER
    `sync_cache` — the CLI's end-of-run save is — otherwise the owner
    table is missing the last unflushed deltas and predictions are the
    documented warn-path approximation)."""

    def __init__(self, engine, state):
        from herald_tpu.train.cached import CachedEngine, CachedTrainState
        if isinstance(state, CachedTrainState):
            assert isinstance(engine, CachedEngine)
            import warnings
            warnings.warn(
                "serving a cached-state checkpoint through its base "
                "view: exact only if the checkpoint was written after "
                "sync_cache (the CLI's end-of-run save is; a periodic "
                "mid-stream --ckpt-every save is NOT — its owner table "
                "is missing the unflushed deltas of the hottest rows). "
                "Train with --ckpt-serve-view to make every checkpoint "
                "serve-exact via the overlay sidecar",
                UserWarning, stacklevel=2)
            state = engine.to_base_state(state)
        self.engine = engine
        self.state = state
        self.spec = engine.model.spec
        self.batch = engine.cfg.batch_size * max(engine.num_shards, 1)

    def score(self, dense: np.ndarray, sparse: np.ndarray) -> np.ndarray:
        n = len(sparse)
        nd = max(self.spec.num_dense, 0)
        dense = np.asarray(dense, np.float32).reshape(n, nd)
        sparse = np.asarray(sparse, np.int64).reshape(
            n, self.spec.num_sparse)
        if (sparse < 0).any() or (sparse >= self.engine.num_rows).any():
            raise ValueError(
                f"sparse ids out of range [0, {self.engine.num_rows})")
        probs = []
        B = self.batch
        for i in range(0, n, B):
            d, s = dense[i:i + B], sparse[i:i + B]
            m = len(s)
            if m < B:
                d = np.concatenate([d, np.repeat(d[-1:], B - m, axis=0)])
                s = np.concatenate([s, np.repeat(s[-1:], B - m, axis=0)])
            p = np.asarray(self.engine.predict(self.state, d, s))[:m]
            probs.append(p.reshape(-1))
        return np.concatenate(probs) if probs else np.zeros(0, np.float32)


def load_scorer(ckpt: str, cfg: HeraldConfig,
                table_rows: int = None) -> Scorer:
    """Build the engine the config describes and restore the checkpoint
    into it (the manifest's state_type picks plain vs cached).
    `table_rows` must match the training run's (the trainer's --rows;
    default: the model's full table)."""
    import os

    from herald_tpu.train.cached import CachedEngine
    from herald_tpu.train.checkpoint import load_checkpoint
    from herald_tpu.train.engine import Engine

    path = ckpt
    latest = os.path.join(path, "LATEST")
    if os.path.exists(latest):
        with open(latest) as f:
            path = os.path.join(path, f.read().strip())
    with open(os.path.join(path, "manifest.json")) as f:
        state_type = json.load(f)["state_type"]

    table_rows = table_rows or get_model(cfg.model).table_rows
    if state_type == "CachedTrainState":
        eng = CachedEngine(cfg, table_rows=table_rows)
        like = eng.init_cached_state(0)
        state = load_checkpoint(ckpt, like)
        from herald_tpu.train.checkpoint import (apply_serve_overlay,
                                                 load_extra)
        overlay = load_extra(ckpt, "serve_overlay")
        if overlay is not None:
            # a --ckpt-serve-view save: patch the synced values of the
            # cache-parked rows into the base view — serve-EXACT even
            # for mid-stream periodic checkpoints (no warn path)
            state = apply_serve_overlay(eng.to_base_state(state), overlay)
        return Scorer(eng, state)
    else:
        if cfg.use_cache:
            # a plain-state checkpoint (sync_cache + to_base_state before
            # save) serves through the plain engine even if the run
            # trained cached
            cfg = HeraldConfig(**{**cfg.__dict__, "use_cache": False,
                                  "use_scheduler": False})
        eng = Engine(cfg, table_rows=table_rows)
        like = eng.init_state(0)
    state = load_checkpoint(ckpt, like)
    return Scorer(eng, state)


def make_server(scorer: Scorer, port: int = 0) -> ThreadingHTTPServer:
    """HTTP server bound to `port` (0 = ephemeral); call serve_forever()
    (or run it on a thread, tests/test_serve.py)."""

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "status": "ok",
                "model": scorer.engine.model.name,
                "step": int(np.asarray(scorer.state.step)),
                "batch": scorer.batch,
            })

        def do_POST(self):
            if self.path != "/score":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                probs = scorer.score(np.asarray(req.get("dense", [])),
                                     np.asarray(req["sparse"]))
                self._reply(200, {"probs": probs.tolist(),
                                  "n": int(len(probs))})
            except Exception as e:  # malformed request -> 400, keep serving
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):   # quiet; the caller owns logging
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None):
    ap = argparse.ArgumentParser(
        "herald_tpu.serve", description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True, help="checkpoint dir")
    ap.add_argument("--config", required=True,
                    help="HeraldConfig JSON (the trainer's --save-config)")
    ap.add_argument("--port", type=int, default=8976)
    ap.add_argument("--batch", type=int, default=None,
                    help="compiled scoring batch (default: the training "
                         "global batch)")
    ap.add_argument("--rows", type=int, default=None,
                    help="table rows of the training run (its --rows; "
                         "default: the model's full table)")
    args = ap.parse_args(argv)
    with open(args.config) as f:
        cfg = HeraldConfig.from_json(f.read())
    if args.batch:
        cfg.batch_size = args.batch
    scorer = load_scorer(args.ckpt, cfg, table_rows=args.rows)
    # compile before accepting traffic
    nd = max(scorer.spec.num_dense, 0)
    scorer.score(np.zeros((1, nd)), np.zeros((1, scorer.spec.num_sparse)))
    srv = make_server(scorer, args.port)
    print(f"serving {scorer.engine.model.name} "
          f"(step {int(np.asarray(scorer.state.step))}) "
          f"on http://127.0.0.1:{srv.server_address[1]}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
