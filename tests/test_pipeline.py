"""GPipe pipeline (parallel/pipeline.py): values AND gradients must match
the single-device sequential tower exactly.

Reference analog: `gpu_ops/gpipe_subexecutor.py` runs all micro-batch
forwards then all backwards over PipelineSend/Recv edges; the oracle there
is the single-worker graph, as here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from herald_tpu.parallel import pipeline as pl

N_STAGES = 4
DP = 2
D = 16


def _stage_fn(params, h):
    return jax.nn.relu(h @ params["W"] + params["b"])


def _init_stacked(rng, n_stages, d):
    kw, kb = jax.random.split(rng)
    return {
        "W": 0.3 * jax.random.normal(kw, (n_stages, d, d)),
        "b": 0.1 * jax.random.normal(kb, (n_stages, d)),
    }


def _sequential(stacked, x):
    h = x
    for s in range(stacked["W"].shape[0]):
        h = _stage_fn({"W": stacked["W"][s], "b": stacked["b"][s]}, h)
    return h


def _loss(y, target):
    return jnp.mean((y - target) ** 2)


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(DP, N_STAGES),
                ("dp", "pp"))


@pytest.mark.parametrize("microbatches", [4, 8])
def test_pipeline_value_matches_sequential(microbatches):
    B = 32
    stacked = _init_stacked(jax.random.PRNGKey(0), N_STAGES, D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    ref = _sequential(stacked, x)

    def body(stacked, x):
        y = pl.pipeline_apply(_stage_fn, pl.stage_params(stacked, "pp"),
                              x, "pp", N_STAGES, microbatches)
        return pl.last_stage_value(y, "pp", N_STAGES)

    out = jax.jit(jax.shard_map(
        body, mesh=_mesh(), check_vma=False,
        in_specs=({"W": P("pp"), "b": P("pp")}, P("dp")),
        out_specs=P("dp")))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_grads_match_sequential():
    """Gradient parity: jax.grad through the scanned pipeline (reverse
    replay = GPipe all-forward-all-backward with micro-batch gradient
    accumulation) equals single-device grads."""
    B, M = 32, 8
    stacked = _init_stacked(jax.random.PRNGKey(2), N_STAGES, D)
    x = jax.random.normal(jax.random.PRNGKey(3), (B * DP, D))
    target = jax.random.normal(jax.random.PRNGKey(4), (B * DP, D))

    gref = jax.grad(lambda p: _loss(_sequential(p, x), target))(stacked)

    def body(stacked, x, target):
        def loss_fn(stacked):
            y = pl.pipeline_apply(_stage_fn, pl.stage_params(stacked, "pp"),
                                  x, "pp", N_STAGES, M)
            return pl.stage_loss(lambda yy: _loss(yy, target) / DP,
                                 y, "pp", N_STAGES)
        loss, g = jax.value_and_grad(loss_fn)(stacked)
        g = jax.lax.psum(g, "dp")           # dp replicas of each stage
        loss = jax.lax.psum(loss, ("dp", "pp"))
        return loss, g

    loss, g = jax.jit(jax.shard_map(
        body, mesh=_mesh(), check_vma=False,
        in_specs=({"W": P("pp"), "b": P("pp")}, P("dp"), P("dp")),
        out_specs=(P(), {"W": P("pp"), "b": P("pp")})))(stacked, x, target)
    lref = _loss(_sequential(stacked, x), target)
    np.testing.assert_allclose(float(loss), float(lref), rtol=1e-6)
    for k in gref:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(gref[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_pipeline_training_converges():
    """End-to-end: SGD over the pipelined tower fits a tiny regression,
    matching the sequential tower's trajectory step for step."""
    B, M, steps, lr = 32, 4, 60, 0.05
    stacked = _init_stacked(jax.random.PRNGKey(5), N_STAGES, D)
    x = jax.random.normal(jax.random.PRNGKey(6), (B * DP, D))
    target = _sequential(_init_stacked(jax.random.PRNGKey(7), N_STAGES, D),
                         x)

    def body(stacked, x, target):
        def loss_fn(stacked):
            y = pl.pipeline_apply(_stage_fn, pl.stage_params(stacked, "pp"),
                                  x, "pp", N_STAGES, M)
            return pl.stage_loss(lambda yy: _loss(yy, target) / DP,
                                 y, "pp", N_STAGES)
        loss, g = jax.value_and_grad(loss_fn)(stacked)
        g = jax.lax.psum(g, "dp")
        new = jax.tree.map(lambda p, gg: p - lr * gg, stacked, g)
        return jax.lax.psum(loss, ("dp", "pp")), new

    step = jax.jit(jax.shard_map(
        body, mesh=_mesh(), check_vma=False,
        in_specs=({"W": P("pp"), "b": P("pp")}, P("dp"), P("dp")),
        out_specs=(P(), {"W": P("pp"), "b": P("pp")})))

    seq_params = stacked
    pip_params = stacked
    losses = []
    for _ in range(steps):
        lref, gref = jax.value_and_grad(
            lambda p: _loss(_sequential(p, x), target))(seq_params)
        seq_params = jax.tree.map(lambda p, g: p - lr * g, seq_params, gref)
        lpip, pip_params = step(pip_params, x, target)
        losses.append(float(lpip))
        np.testing.assert_allclose(float(lpip), float(lref), rtol=1e-5)
    assert losses[-1] < 0.6 * losses[0], losses
    for k in seq_params:
        np.testing.assert_allclose(np.asarray(pip_params[k]),
                                   np.asarray(seq_params[k]),
                                   rtol=1e-4, atol=1e-6)


def test_3d_parallelism_dp_pp_mp():
    """Full composition on a (dp=2, pp=2, mp=2) mesh: data-parallel
    batches, GPipe stages, and Megatron col/row sharding INSIDE each
    stage — gradients must still match the single-device sequential
    tower. This is the capability matrix the reference spans with three
    separate mechanisms (DataParallel strategy + pipeline subexecutors +
    per-op partition states) exercised together."""
    import jax.numpy as jnp
    from herald_tpu.parallel import tp

    N, D_, H, B, M = 2, 8, 16, 16, 4
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("dp", "pp", "mp"))

    def init_stacked(rng):
        k1, k2 = jax.random.split(rng)
        return {"W1": 0.4 * jax.random.normal(k1, (N, D_, H)),
                "W2": 0.4 * jax.random.normal(k2, (N, H, D_))}

    def stage_fn(params, h):
        # Megatron pair inside the stage: col-parallel W1 (+relu on the
        # shard), row-parallel W2 with the psum over 'mp'
        z = jax.nn.relu(h @ params["W1"])
        return tp.row_parallel_sharded(z, params["W2"], "mp")

    def seq_ref(stacked, x):
        h = x
        for s in range(N):
            h = jax.nn.relu(h @ stacked["W1"][s]) @ stacked["W2"][s]
        return h

    stacked = init_stacked(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2 * B, D_))
    target = jax.random.normal(jax.random.PRNGKey(2), (2 * B, D_))
    lref, gref = jax.value_and_grad(
        lambda p: _loss(seq_ref(p, x), target))(stacked)

    def body(stacked, x, target):
        my = pl.stage_params(stacked, "pp")

        def loss_fn(my):
            y = pl.pipeline_apply(stage_fn, my, x, "pp", N, M)

            def chunk_loss(yy):
                # the disjoint-loss rule extends across mp: each mp peer
                # seeds only ITS batch chunk (same as the TP engine), or
                # the in-stage psum transposes double-count the seeds
                yc = tp.my_batch_chunk(yy, B // 2, "mp")
                tc = tp.my_batch_chunk(target, B // 2, "mp")
                return _loss(yc, tc) / 4.0      # dp * mp seeding peers
            return pl.stage_loss(chunk_loss, y, "pp", N)
        loss, g = jax.value_and_grad(loss_fn)(my)
        # restore the leading stage dim, reduce over the dp replicas
        g = jax.tree.map(lambda a: a[None], g)
        g = jax.lax.psum(g, "dp")
        return jax.lax.psum(loss, ("dp", "pp", "mp")), g

    specs = {"W1": P("pp", None, "mp"), "W2": P("pp", "mp", None)}
    loss, g = jax.jit(jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(specs, P("dp"), P("dp")),
        out_specs=(P(), specs)))(stacked, x, target)
    np.testing.assert_allclose(float(loss), float(lref), rtol=1e-6)
    for k in gref:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(gref[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
