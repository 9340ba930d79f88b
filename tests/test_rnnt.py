"""RNN-T loss vs a full-lattice numpy reference (the same DP the
warp-transducer tests use), plus gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.ops.rnnt import rnnt_loss

NEG_INF = -1.0e30


def np_rnnt_loss(logits, labels, T, U, blank):
    """alpha[t, u] full-lattice recursion (transducer_np.py semantics)."""
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))

    def logadd(a, b):
        if a <= NEG_INF / 2:
            return b
        if b <= NEG_INF / 2:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    alpha = np.full((T, U + 1), NEG_INF)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            acc = NEG_INF
            if t > 0:
                acc = logadd(acc, alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                acc = logadd(acc, alpha[t, u - 1]
                             + logp[t, u - 1, labels[u - 1]])
            alpha[t, u] = acc
    return -(alpha[T - 1, U] + logp[T - 1, U, blank])


def test_rnnt_matches_numpy():
    rng = np.random.default_rng(0)
    B, T, U, V, blank = 3, 6, 4, 5, 0
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    t_lens = np.asarray([6, 5, 3], np.int32)
    u_lens = np.asarray([4, 2, 3], np.int32)

    got = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(t_lens), jnp.asarray(u_lens),
                               blank=blank))
    for i in range(B):
        want = np_rnnt_loss(logits[i], labels[i], int(t_lens[i]),
                            int(u_lens[i]), blank)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_rnnt_gradient_finite_and_nonzero():
    rng = np.random.default_rng(1)
    B, T, U, V = 2, 5, 3, 4
    logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V))
                         .astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    t_lens = jnp.asarray([5, 4], jnp.int32)
    u_lens = jnp.asarray([3, 2], jnp.int32)

    def total(lg):
        return jnp.sum(rnnt_loss(lg, labels, t_lens, u_lens, blank=0))

    g = jax.grad(total)(logits)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    # padded region of example 1 (t >= 4) must receive zero gradient
    assert np.abs(g[1, 4:]).sum() < 1e-5


def test_rnnt_perfect_alignment_low_loss():
    """Logits that put all mass on the correct transitions give ~0 loss."""
    T, U, V, blank = 4, 2, 3, 0
    labels = np.asarray([[1, 2]], np.int32)
    logits = np.full((1, T, U + 1, V), -20.0, np.float32)
    # path: emit 1 at (0,0), emit 2 at (0,1), then blanks down t at u=2
    logits[0, 0, 0, 1] = 20.0
    logits[0, 0, 1, 2] = 20.0
    for t in range(T):
        logits[0, t, 2, blank] = 20.0
    loss = float(rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.asarray([T]), jnp.asarray([U]),
                           blank=blank)[0])
    assert loss < 0.01, loss
