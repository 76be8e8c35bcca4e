"""RNN-T loss vs brute-force numpy DP (torchaudio unavailable here; the DP is
the textbook Graves 2012 recursion the reference's torchaudio op implements)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.ops.rnnt import rnnt_loss


def _brute_force_rnnt(log_probs, t_len, labels, u_len, blank=0):
    """alpha[t, u] lattice DP for one sample."""
    T, U1, V = log_probs.shape
    U = u_len
    alpha = np.full((t_len, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for u in range(1, U + 1):
        alpha[0, u] = alpha[0, u - 1] + log_probs[0, u - 1, labels[u - 1]]
    for t in range(1, t_len):
        alpha[t, 0] = alpha[t - 1, 0] + log_probs[t - 1, 0, blank]
        for u in range(1, U + 1):
            stay = alpha[t - 1, u] + log_probs[t - 1, u, blank]
            emit = alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]]
            alpha[t, u] = np.logaddexp(stay, emit)
    return -(alpha[t_len - 1, U] + log_probs[t_len - 1, U, blank])


@pytest.mark.parametrize("seed", [0, 1])
def test_rnnt_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    b, t, u, v = 3, 8, 4, 6
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    t_len = rng.randint(u + 1, t + 1, size=b)
    u_len = rng.randint(1, u + 1, size=b)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)

    ours = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(t_len),
                                jnp.asarray(labels), jnp.asarray(u_len),
                                reduction="none"))
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = np.array([
        _brute_force_rnnt(lp[i], int(t_len[i]), labels[i], int(u_len[i]))
        for i in range(b)])
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_rnnt_grad_finite():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 6, 4, 5).astype(np.float32)
    g = jax.grad(lambda lg: rnnt_loss(lg, jnp.array([6, 5]),
                                      jnp.array([[1, 2, 3], [2, 1, 4]]),
                                      jnp.array([3, 2])))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
