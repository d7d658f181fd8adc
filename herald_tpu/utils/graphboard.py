"""Computation-graph visualizer (reference `python/graphboard` analog).

The reference renders the executor's op topology with graphviz and serves
it over a tiny HTTP server (`python/graphboard/graph2fig.py:11-27`). Here
the "graph" is whatever XLA compiles, so the visualizer lowers an engine's
train step and emits:

- StableHLO text (`fmt="stablehlo"`) — the traced program,
- HLO dot source (`fmt="dot"`) — render with graphviz (`dot -Tsvg`),
- optimized HLO text (`fmt="hlo_opt"`) — what actually runs, post-fusion.

Usage::

    from herald_tpu.utils import graphboard
    src = graphboard.step_graph(eng, fmt="dot")
    graphboard.save(eng, "step.dot")
    graphboard.serve(eng, port=8000)          # one-page HTTP viewer
"""

from __future__ import annotations

import http.server
from typing import Optional

import jax
import numpy as np


def _lower_step(engine, batch: Optional[int] = None):
    """Lower the engine's (unsharded, single-step) train step on dummy
    shapes without executing it."""
    from herald_tpu.data import synthetic_ctr_data

    cfg = engine.cfg
    gb = cfg.batch_size * max(engine.num_shards, 1)
    state = engine.init_state(0)
    dense, sparse, labels = synthetic_ctr_data(
        engine.model.spec, gb, seed=0, num_rows=engine.num_rows)

    def to_dev(a, dt):
        return engine._put_batch(a.astype(dt), dt)

    args = (state, to_dev(dense, np.float32), to_dev(sparse, np.int32),
            to_dev(labels, np.float32))
    return engine._train_step.lower(*args)


def step_graph(engine, fmt: str = "dot", batch: Optional[int] = None) -> str:
    """Return the engine train step's computation graph as text."""
    low = _lower_step(engine, batch)
    if fmt == "stablehlo":
        return low.as_text()
    if fmt == "dot":
        return low.compiler_ir(dialect="hlo").as_hlo_dot_graph()
    if fmt == "hlo_opt":
        return low.compile().as_text()
    raise ValueError(f"unknown fmt {fmt!r}; use stablehlo | dot | hlo_opt")


def save(engine, path: str, fmt: Optional[str] = None) -> str:
    if fmt is None:
        fmt = "dot" if path.endswith(".dot") else "stablehlo"
    src = step_graph(engine, fmt=fmt)
    with open(path, "w") as f:
        f.write(src)
    return path


def serve(engine, port: int = 8000, fmt: str = "stablehlo"):
    """Serve the graph text on localhost (reference graph2fig's HTTP
    server). Blocks; ctrl-c to stop."""
    src = step_graph(engine, fmt=fmt).encode()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.end_headers()
            self.wfile.write(src)

        def log_message(self, *a):
            pass

    with http.server.HTTPServer(("127.0.0.1", port), Handler) as srv:
        print(f"graphboard: serving {fmt} on http://127.0.0.1:{port}")
        srv.serve_forever()
