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


# ---------------------------------------------------------------------------
# PipeDream 1F1B with weight stashing (pipedream_apply)
# ---------------------------------------------------------------------------

def _pipedream_oracle(stacked, x, targets, n_stages, microbatches, lr):
    """Sequential executor of the exact 1F1B timetable (F(s,m)=s+2m,
    B(s,m)=2N-1-s+2m) with per-micro-batch local SGD apply and weight
    stashing — the reference pipedream_subexecutor semantics, run slot
    by slot on one device as the parity oracle."""
    N, M = n_stages, microbatches
    mb = x.shape[0] // M
    xs = x.reshape(M, mb, -1)
    tg = targets.reshape(M, mb, -1)
    params = [{k: stacked[k][s] for k in stacked} for s in range(N)]
    stash = [dict() for _ in range(N)]
    fmsg, bmsg = {}, {}
    losses = np.zeros(M)
    for t in range(2 * (M + N - 1)):
        for s in range(N):
            rf = t - s
            if rf >= 0 and rf % 2 == 0 and rf // 2 < M:
                m = rf // 2
                x_in = xs[m] if s == 0 else fmsg.pop((s, m))
                w = dict(params[s])
                out = _stage_fn(w, x_in)
                stash[s][m] = (w, x_in)
                if s + 1 < N:
                    fmsg[(s + 1, m)] = out
            rb = t - (2 * N - 1 - s)
            if rb >= 0 and rb % 2 == 0 and rb // 2 < M:
                m = rb // 2
                w, x_in = stash[s].pop(m)
                y, vjp = jax.vjp(_stage_fn, w, x_in)
                if s == N - 1:
                    lv, g = jax.value_and_grad(
                        lambda yy: _loss(yy, tg[m]))(y)
                    losses[m] = float(lv)
                else:
                    g = bmsg.pop((s, m))
                gw, gx = vjp(g)
                params[s] = {k: params[s][k] - lr * gw[k]
                             for k in params[s]}
                if s - 1 >= 0:
                    bmsg[(s - 1, m)] = gx
    assert not fmsg and not bmsg and all(not st for st in stash)
    return params, losses


@pytest.mark.parametrize("microbatches", [4, 9])
def test_pipedream_matches_schedule_oracle(microbatches):
    """shard_map pipedream_apply == the sequential slot-by-slot oracle:
    same stashed-weight versions, same per-micro-batch updates, same
    losses. M=9 also exercises stash-ring wraparound (M > N)."""
    N, lr = 4, 0.05
    B = microbatches * 8
    stacked = _init_stacked(jax.random.PRNGKey(8), N, D)
    x = jax.random.normal(jax.random.PRNGKey(9), (B, D))
    target = jax.random.normal(jax.random.PRNGKey(10), (B, D))
    want_params, want_losses = _pipedream_oracle(
        stacked, x, target, N, microbatches, lr)

    mesh = Mesh(np.array(jax.devices()[:N]), ("pp",))

    def body(stacked, x, target):
        new, losses = pl.pipedream_apply(
            _stage_fn, _loss, pl.stage_params(stacked, "pp"), x, target,
            "pp", N, microbatches,
            lambda p, g: jax.tree.map(lambda a, b: a - lr * b, p, g))
        return (jax.tree.map(lambda a: a[None], new),
                lax.psum(losses, "pp"))

    got_params, got_losses = jax.jit(jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=({"W": P("pp"), "b": P("pp")}, P(), P()),
        out_specs=({"W": P("pp"), "b": P("pp")}, P())))(stacked, x, target)
    np.testing.assert_allclose(np.asarray(got_losses), want_losses,
                               rtol=1e-5, atol=1e-7)
    for s in range(N):
        for k in ("W", "b"):
            np.testing.assert_allclose(
                np.asarray(got_params[k][s]), np.asarray(want_params[s][k]),
                rtol=1e-5, atol=1e-7, err_msg=f"stage {s} {k}")


def test_pipedream_single_stage_is_sequential_sgd():
    """N=1 degenerates to plain per-micro-batch SGD on one device."""
    M, lr, B = 6, 0.1, 24
    stacked = _init_stacked(jax.random.PRNGKey(11), 1, D)
    x = jax.random.normal(jax.random.PRNGKey(12), (B, D))
    target = jax.random.normal(jax.random.PRNGKey(13), (B, D))

    p = {"W": stacked["W"][0], "b": stacked["b"][0]}
    want = dict(p)
    mb = B // M
    for m in range(M):
        g = jax.grad(lambda pp: _loss(
            _stage_fn(pp, x[m * mb:(m + 1) * mb]),
            target[m * mb:(m + 1) * mb]))(want)
        want = {k: want[k] - lr * g[k] for k in want}

    mesh = Mesh(np.array(jax.devices()[:1]), ("pp",))
    got = jax.jit(jax.shard_map(
        lambda st, xx, tt: jax.tree.map(lambda a: a[None], pl.pipedream_apply(
            _stage_fn, _loss, pl.stage_params(st, "pp"), xx, tt, "pp", 1,
            M, lambda pp, gg: jax.tree.map(
                lambda a, b: a - lr * b, pp, gg))[0]),
        mesh=mesh, check_vma=False,
        in_specs=({"W": P("pp"), "b": P("pp")}, P(), P()),
        out_specs={"W": P("pp"), "b": P("pp")}))(stacked, x, target)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k][0]),
                                   np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-8, err_msg=k)


def test_pipedream_dp_composition():
    """dp x pp: each dp replica feeds its own shard; update_fn psums
    grads over 'dp' (scaled), so stage replicas stay in lockstep and the
    trajectory equals the combined-batch oracle."""
    N, M, lr, DPn = 2, 4, 0.05, 2
    mbp = 8                                     # per-replica micro-batch
    B = M * mbp * DPn
    stacked = _init_stacked(jax.random.PRNGKey(14), N, D)
    x = jax.random.normal(jax.random.PRNGKey(15), (B, D))
    target = jax.random.normal(jax.random.PRNGKey(16), (B, D))
    # combined-batch oracle: interleave the dp shards inside each
    # micro-batch so shard r's micro-batch m is the oracle's rows
    # [m, r, :] — mean-MSE grads then satisfy psum/DP == combined
    xi = x.reshape(M, DPn, mbp, D)
    ti = target.reshape(M, DPn, mbp, D)
    want_params, want_losses = _pipedream_oracle(
        stacked, xi.reshape(M * DPn * mbp, D),
        ti.reshape(M * DPn * mbp, D), N, M, lr)

    mesh = Mesh(np.array(jax.devices()[:DPn * N]).reshape(DPn, N),
                ("dp", "pp"))

    def body(stacked, x, target):
        new, losses = pl.pipedream_apply(
            _stage_fn, _loss, pl.stage_params(stacked, "pp"),
            x.reshape(-1, D), target.reshape(-1, D), "pp", N, M,
            lambda p, g: jax.tree.map(
                lambda a, b: a - lr * lax.psum(b, "dp") / DPn, p, g))
        return (jax.tree.map(lambda a: a[None], new),
                lax.psum(losses, ("dp", "pp")) / DPn)

    # device layout: dp-major so replica r's slice is its own
    # micro-batches in order (shard r, micro-batch m = xi[m, r])
    x_dev = xi.transpose(1, 0, 2, 3).reshape(DPn * M * mbp, D)
    t_dev = ti.transpose(1, 0, 2, 3).reshape(DPn * M * mbp, D)
    got_params, got_losses = jax.jit(jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=({"W": P("pp"), "b": P("pp")}, P("dp"), P("dp")),
        out_specs=({"W": P("pp"), "b": P("pp")}, P())))(
            stacked, x_dev, t_dev)
    np.testing.assert_allclose(np.asarray(got_losses), want_losses,
                               rtol=1e-5, atol=1e-7)
    for s in range(N):
        for k in ("W", "b"):
            np.testing.assert_allclose(
                np.asarray(got_params[k][s]), np.asarray(want_params[s][k]),
                rtol=1e-5, atol=1e-7, err_msg=f"stage {s} {k}")


def test_hetpipe_sync1_sgd_equals_lockstep():
    """HetPipe/WSP at sync_every=1 with local SGD equals the lockstep
    dp-psum composition exactly (averaging commutes with the linear
    update) — the BSP corner of the bounded-staleness knob."""
    N, M, lr, DPn = 2, 4, 0.05, 2
    mbp = 8
    B = M * mbp * DPn
    stacked = _init_stacked(jax.random.PRNGKey(20), N, D)
    x = jax.random.normal(jax.random.PRNGKey(21), (B, D))
    target = jax.random.normal(jax.random.PRNGKey(22), (B, D))
    mesh = Mesh(np.array(jax.devices()[:DPn * N]).reshape(DPn, N),
                ("dp", "pp"))
    xi = np.asarray(x).reshape(M, DPn, mbp, D)
    ti = np.asarray(target).reshape(M, DPn, mbp, D)
    x_dev = xi.transpose(1, 0, 2, 3).reshape(DPn * M * mbp, D)
    t_dev = ti.transpose(1, 0, 2, 3).reshape(DPn * M * mbp, D)

    def run(hetpipe, sync_every=1):
        def body(stacked, x, target):
            if hetpipe:
                new, losses = pl.hetpipe_apply(
                    _stage_fn, _loss, pl.stage_params(stacked, "pp"),
                    x.reshape(-1, D), target.reshape(-1, D), "pp", "dp",
                    N, M,
                    lambda p, g: jax.tree.map(
                        lambda a, b: a - lr * b, p, g),
                    sync_every=sync_every)
            else:
                new, losses = pl.pipedream_apply(
                    _stage_fn, _loss, pl.stage_params(stacked, "pp"),
                    x.reshape(-1, D), target.reshape(-1, D), "pp", N, M,
                    lambda p, g: jax.tree.map(
                        lambda a, b: a - lr * lax.psum(b, "dp") / DPn,
                        p, g))
            return (jax.tree.map(lambda a: a[None], new),
                    lax.psum(losses, ("dp", "pp")) / DPn)

        return jax.jit(jax.shard_map(
            body, mesh=mesh, check_vma=False,
            in_specs=({"W": P("pp"), "b": P("pp")}, P("dp"), P("dp")),
            out_specs=({"W": P("pp"), "b": P("pp")}, P())))(
                stacked, x_dev, t_dev)

    want_p, want_l = run(False)
    got_p, got_l = run(True, sync_every=1)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-5, atol=1e-7)
    for k in ("W", "b"):
        np.testing.assert_allclose(np.asarray(got_p[k]),
                                   np.asarray(want_p[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)

    # bounded staleness (sync_every=2): a genuinely different trajectory
    # whose drained boundary is still exactly dp-replicated
    stale_p, stale_l = run(True, sync_every=2)
    assert max(float(jnp.abs(stale_p[k] - want_p[k]).max())
               for k in ("W", "b")) > 1e-7
    # loss stream still trains (MSE on the last micro-batches below the
    # first) — WSP trades freshness, not learning
    sl = np.asarray(stale_l)
    assert sl[-1] < sl[0]
