"""Multi-stream serving: vmapped batched_stream_step and the slot-pool
server must reproduce single-stream streaming token-for-token.

The reference has no multi-stream counterpart (one stream per CPU core,
README.md:172); correctness target is therefore OUR single-stream path,
which is itself parity-tested against offline decode
(tests/test_chunk_session.py)."""

import threading

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer
from tensorflowasr_tpu.serve.chunk_session import ChunkStreamSession
from tensorflowasr_tpu.serve.multi_session import (
    BatchingStreamFront,
    MultiStreamChunkServer,
    build_stream_ops,
)


def _model_and_vars():
    cfg = tiny_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.chunk_samples), jnp.float32),
        jnp.ones((1, 4), jnp.int32), 8, False,
        method=ChunkConformer.train_forward)
    return cfg, model, variables


def test_batched_stream_step_matches_single():
    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(0)
    S, n_chunks = 3, 3
    wavs = rng.standard_normal(
        (S, n_chunks, cfg.chunk_samples)).astype(np.float32) * 0.1

    singles = []
    for s in range(S):
        c = model.apply(variables, 1,
                        method=ChunkConformer.init_stream_caches)
        outs = []
        for k in range(n_chunks):
            ph, ch, pv, nf, c = model.apply(
                variables, jnp.asarray(wavs[s, k][None]), c,
                method=ChunkConformer.fused_stream_step)
            outs.append(tuple(np.asarray(x) for x in (ph, ch, pv, nf)))
        singles.append(outs)

    caches = model.apply(variables, S,
                         method=ChunkConformer.init_multi_stream_caches)
    step = jax.jit(lambda v, w, c: model.apply(
        v, w, c, method=ChunkConformer.batched_stream_step))
    for k in range(n_chunks):
        ph, ch, pv, nf, caches = step(variables, jnp.asarray(wavs[:, k]),
                                      caches)
        for s in range(S):
            e_ph, e_ch, e_pv, e_nf = singles[s][k]
            assert np.array_equal(np.asarray(ph)[s], e_ph)
            assert np.array_equal(np.asarray(ch)[s], e_ch)
            assert np.array_equal(np.asarray(pv)[s], e_pv)
            assert np.array_equal(np.asarray(nf)[s], e_nf)


def test_batched_step_reset_and_advance_masks():
    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(1)
    S = 2
    chunk = rng.standard_normal(
        (S, cfg.chunk_samples)).astype(np.float32) * 0.1

    step = jax.jit(lambda v, w, c, r, a: model.apply(
        v, w, c, r, a, method=ChunkConformer.batched_stream_step))
    caches = model.apply(variables, S,
                         method=ChunkConformer.init_multi_stream_caches)
    none = jnp.zeros((S,), bool)
    allm = jnp.ones((S,), bool)

    # advance both, then step again with slot 1 frozen: slot 1's caches
    # must be bit-identical to before the frozen step
    _, _, _, _, caches = step(variables, jnp.asarray(chunk), caches,
                              none, allm)
    frozen = jax.tree.map(lambda x: np.asarray(x)[1], caches)
    adv = jnp.asarray(np.array([True, False]))
    _, _, _, _, caches2 = step(variables, jnp.asarray(chunk), caches,
                               none, adv)
    for a, b in zip(jax.tree.leaves(frozen),
                    jax.tree.leaves(jax.tree.map(
                        lambda x: np.asarray(x)[1], caches2))):
        assert np.array_equal(a, b)
    # ... and slot 0 must have moved (wav tail cache definitely changes)
    moved = any(
        not np.array_equal(np.asarray(a)[0], np.asarray(b)[0])
        for a, b in zip(jax.tree.leaves(caches), jax.tree.leaves(caches2)))
    assert moved

    # resetting a slot reproduces its cold-start output exactly
    cold = model.apply(variables, 1,
                       method=ChunkConformer.init_stream_caches)
    ph0, _, _, _, _ = model.apply(
        variables, jnp.asarray(chunk[:1]), cold,
        method=ChunkConformer.fused_stream_step)
    rst = jnp.asarray(np.array([True, False]))
    ph, _, _, _, _ = step(variables, jnp.asarray(chunk), caches2,
                          rst, allm)
    assert np.array_equal(np.asarray(ph)[0], np.asarray(ph0))


def test_multi_stream_server_matches_single_sessions():
    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(2)
    cs = cfg.chunk_samples
    lengths = [4 * cs, 3 * cs + cs // 2, 2 * cs + 123]
    wavs = [rng.standard_normal((n,)).astype(np.float32) * 0.1
            for n in lengths]

    expected = []
    for w in wavs:
        sess = ChunkStreamSession(model, variables)
        sess.feed(w)
        expected.append(sess.flush())

    server = MultiStreamChunkServer(model, variables, n_slots=3)
    slots = [server.open() for _ in wavs]
    # interleave feeds in odd-sized packets; tick between bursts
    offsets = [0] * len(wavs)
    pkt = 1000
    while any(o < len(w) for o, w in zip(offsets, wavs)):
        for i, w in enumerate(wavs):
            if offsets[i] < len(w):
                server.feed(slots[i], w[offsets[i]:offsets[i] + pkt])
                offsets[i] += pkt
        server.tick()
    results = [server.close(s) for s in slots]
    for got, want in zip(results, expected):
        assert got["phone_ids"] == want["phone_ids"]
        assert got["char_ids"] == want["char_ids"]

    # slot reuse: a NEW stream on a freed slot must decode as if fresh
    w = wavs[0]
    slot = server.open()
    assert server.n_active == 1
    server.feed(slot, w)
    got = server.close(slot)
    assert got["phone_ids"] == expected[0]["phone_ids"]
    assert got["char_ids"] == expected[0]["char_ids"]


def test_batching_front_concurrent_clients():
    """Concurrent client threads through the dynamic-batching front (and
    the socket op table) decode identically to single-stream sessions."""
    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(3)
    cs = cfg.chunk_samples
    lengths = [3 * cs, 2 * cs + cs // 3, 4 * cs + 77]
    wavs = [rng.standard_normal((n,)).astype(np.float32) * 0.1
            for n in lengths]

    expected = []
    for w in wavs:
        sess = ChunkStreamSession(model, variables)
        sess.feed(w)
        expected.append(sess.flush())

    server = MultiStreamChunkServer(model, variables, n_slots=3)
    front = BatchingStreamFront(server, max_wait_ms=5.0)
    ops = build_stream_ops(front)
    results = [None] * len(wavs)

    def client(i):
        slot = int(ops["stream_open"]()[0])
        w = wavs[i]
        pkt = cs  # one chunk per feed, like a live client
        for off in range(0, len(w), pkt):
            ops["stream_feed"](np.asarray([slot], np.int32),
                               w[off:off + pkt])
        ph, ch = ops["stream_close"](np.asarray([slot], np.int32))
        results[i] = (list(ph), list(ch))

    # daemon threads + try/finally: a timeout must not leak live threads
    # that keep the interpreter from exiting after the test fails (seen
    # once under a heavily loaded machine: the suite finished but hung at
    # exit on these clients)
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(len(wavs))]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
    finally:
        front.shutdown()

    for got, want in zip(results, expected):
        assert got[0] == want["phone_ids"]
        assert got[1] == want["char_ids"]


def test_batching_front_close_wakes_blocked_feeders():
    """Regression: a client's close() runs a drain tick that can consume
    OTHER slots' buffered chunks; pre-fix it returned without notifying,
    stranding those slots' feeders in an untimed wait (the intermittent
    >300s hang in the round-3 suite).  Force the racy shape directly:
    one client blocked in feed() while another closes."""
    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(7)
    cs = cfg.chunk_samples

    server = MultiStreamChunkServer(model, variables, n_slots=2)
    # huge coalescing window: the ticker sits in its wait so the close
    # (client thread) reliably performs the drain tick itself
    front = BatchingStreamFront(server, max_wait_ms=2000.0,
                                feed_deadline_s=30.0)
    try:
        a = front.open()
        b = front.open()
        done = threading.Event()

        def feeder():
            front.feed(b, rng.standard_normal((cs,)).astype(np.float32))
            done.set()

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        import time
        time.sleep(0.3)               # let the feeder block in its wait
        front.feed(a, rng.standard_normal((cs // 2,)).astype(np.float32))
        front.close(a)                # drain tick consumes b's chunk too
        assert done.wait(timeout=10), \
            "feeder still blocked after close() drained its chunk"
        t.join(timeout=10)
        front.close(b)
    finally:
        front.shutdown()


@pytest.mark.slow
def test_batching_front_stress_close_feed_races():
    """Liveness under load: many rounds of concurrent clients whose
    closes race other clients' feeds through one shared front.  Every
    round must complete promptly and decode token-identically to
    single-stream sessions (also exercises slot reuse ~30x)."""
    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(5)
    cs = cfg.chunk_samples
    lengths = [3 * cs, cs // 2, 4 * cs + 77, 2 * cs + cs // 3]
    wavs = [rng.standard_normal((n,)).astype(np.float32) * 0.1
            for n in lengths]
    expected = []
    for w in wavs:
        sess = ChunkStreamSession(model, variables)
        sess.feed(w)
        expected.append(sess.flush())

    server = MultiStreamChunkServer(model, variables, n_slots=4)
    front = BatchingStreamFront(server, max_wait_ms=2.0,
                                feed_deadline_s=60.0)
    rounds = 30
    try:
        for r in range(rounds):
            results = [None] * len(wavs)
            errors = []

            def client(i):
                try:
                    slot = front.open()
                    w = wavs[i]
                    # ragged packets so finish times (and closes) stagger
                    pkt = cs if i % 2 == 0 else cs // 2 + 13
                    for off in range(0, len(w), pkt):
                        front.feed(slot, w[off:off + pkt])
                    out = front.close(slot)
                    results[i] = (out["phone_ids"], out["char_ids"])
                except Exception as e:    # surface, don't hang the join
                    errors.append((i, e))

            threads = [threading.Thread(target=client, args=(i,),
                                        daemon=True)
                       for i in range(len(wavs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
                assert not t.is_alive(), \
                    f"round {r}: client hung; {front._debug_state()}"
            assert not errors, f"round {r}: {errors}"
            for got, want in zip(results, expected):
                assert got[0] == want["phone_ids"]
                assert got[1] == want["char_ids"]
    finally:
        front.shutdown()


def test_stream_ops_over_socket():
    """Full wire path: ModelServer with inline stream ops, two concurrent
    TCP clients streaming different audio."""
    from tensorflowasr_tpu.serve.model_server import ModelClient, ModelServer

    cfg, model, variables = _model_and_vars()
    rng = np.random.default_rng(4)
    cs = cfg.chunk_samples
    wavs = [rng.standard_normal((3 * cs,)).astype(np.float32) * 0.1,
            rng.standard_normal((2 * cs + 11,)).astype(np.float32) * 0.1]
    expected = []
    for w in wavs:
        sess = ChunkStreamSession(model, variables)
        sess.feed(w)
        expected.append(sess.flush())

    front = BatchingStreamFront(
        MultiStreamChunkServer(model, variables, n_slots=2),
        max_wait_ms=5.0)
    ops = build_stream_ops(front)
    server = ModelServer(ops, tcp_port=0, inline_exec=False,
                         inline_ops=set(ops))
    server.start()
    try:
        results = [None] * len(wavs)

        def client(i):
            cli = ModelClient(tcp_port=server.tcp_port)
            try:
                slot = cli.call("stream_open")[0]
                w = wavs[i]
                for off in range(0, len(w), cs):
                    cli.call("stream_feed", slot.astype(np.int32),
                             w[off:off + cs])
                ph, ch = cli.call("stream_close", slot.astype(np.int32))
                results[i] = (list(ph), list(ch))
            finally:
                cli.close()

        threads = [threading.Thread(target=client, args=(i,), daemon=True)
                   for i in range(len(wavs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
        for got, want in zip(results, expected):
            assert got[0] == want["phone_ids"]
            assert got[1] == want["char_ids"]
    finally:
        server.stop()
        front.shutdown()
