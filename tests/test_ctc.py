"""Golden tests: our JAX CTC loss vs torch.nn.CTCLoss (the reference wraps
torch CTC at nnet/losses.py:292-334)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from avec_tpu.ops.ctc import ctc_loss, ctc_forward_score, ctc_greedy_collapse


def _rand_case(rng, b=3, t=20, v=7, u_max=6):
    logits = rng.randn(b, t, v).astype(np.float32)
    logit_lengths = rng.randint(u_max * 2 + 2, t + 1, size=b)
    label_lengths = rng.randint(1, u_max + 1, size=b)
    labels = rng.randint(1, v, size=(b, u_max))
    for i in range(b):
        labels[i, label_lengths[i]:] = 0
    return logits, logit_lengths, labels, label_lengths


def _torch_ctc(logits, logit_lengths, labels, label_lengths, reduction):
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    loss = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=False)
    return loss(lp, torch.tensor(labels), torch.tensor(logit_lengths),
                torch.tensor(label_lengths)).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_nll_matches_torch(seed):
    rng = np.random.RandomState(seed)
    logits, ll, y, yl = _rand_case(rng)
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(ll),
                               jnp.asarray(y), jnp.asarray(yl), reduction="none"))
    want = _torch_ctc(logits, ll, y, yl, "none")
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_ctc_reductions_match_reference_semantics():
    rng = np.random.RandomState(3)
    logits, ll, y, yl = _rand_case(rng)
    none = _torch_ctc(logits, ll, y, yl, "none")
    # repo "mean" = mean over batch of total NLL (losses.py:297,306)
    got_mean = float(ctc_loss(jnp.asarray(logits), jnp.asarray(ll),
                              jnp.asarray(y), jnp.asarray(yl), reduction="mean"))
    assert abs(got_mean - none.mean()) < 1e-3
    # repo "sum"
    got_sum = float(ctc_loss(jnp.asarray(logits), jnp.asarray(ll),
                             jnp.asarray(y), jnp.asarray(yl), reduction="sum"))
    assert abs(got_sum - none.sum()) < 1e-2
    # repo "default" = torch 'mean' (divide by target length, mean batch)
    got_def = float(ctc_loss(jnp.asarray(logits), jnp.asarray(ll),
                             jnp.asarray(y), jnp.asarray(yl), reduction="default"))
    want_def = float(_torch_ctc(logits, ll, y, yl, "mean"))
    assert abs(got_def - want_def) < 1e-4


def test_ctc_grad_matches_torch():
    rng = np.random.RandomState(4)
    logits, ll, y, yl = _rand_case(rng, b=2, t=12, v=5, u_max=4)

    def loss_fn(lg):
        return ctc_loss(lg, jnp.asarray(ll), jnp.asarray(y), jnp.asarray(yl),
                        reduction="mean")

    ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    lg_t = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(lg_t, dim=-1).transpose(0, 1)
    loss = torch.nn.CTCLoss(blank=0, reduction="none")(
        lp, torch.tensor(y), torch.tensor(ll), torch.tensor(yl)).mean()
    loss.backward()
    want = lg_t.grad.numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


def test_ctc_zero_infinity():
    # Label longer than input frames -> infeasible -> clamped to 0.
    logits = jnp.zeros((1, 3, 5))
    y = jnp.array([[1, 2, 1, 2]])
    loss = ctc_loss(logits, jnp.array([3]), y, jnp.array([4]),
                    reduction="mean", zero_infinity=True)
    assert float(loss) == 0.0
    g = jax.grad(lambda lg: ctc_loss(lg, jnp.array([3]), y, jnp.array([4]),
                                     reduction="mean", zero_infinity=True))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_jit_vmap():
    rng = np.random.RandomState(5)
    logits, ll, y, yl = _rand_case(rng)
    f = jax.jit(lambda *a: ctc_loss(*a, reduction="mean"))
    v1 = float(f(jnp.asarray(logits), jnp.asarray(ll), jnp.asarray(y), jnp.asarray(yl)))
    v2 = float(ctc_loss(jnp.asarray(logits), jnp.asarray(ll), jnp.asarray(y),
                        jnp.asarray(yl), reduction="mean"))
    assert abs(v1 - v2) < 1e-5


def test_greedy_collapse():
    # preds: [1 1 0 2 2 0 0 3], len 8 -> [1, 2, 3]
    preds = jnp.array([[1, 1, 0, 2, 2, 0, 0, 3],
                       [0, 4, 4, 4, 0, 1, 1, 9]])
    lengths = jnp.array([8, 6])
    toks, tok_lens = ctc_greedy_collapse(preds, lengths)
    assert list(np.asarray(toks[0, :3])) == [1, 2, 3]
    assert int(tok_lens[0]) == 3
    # sample 2 valid region = first 6: [0 4 4 4 0 1] -> [4, 1]
    assert list(np.asarray(toks[1, :2])) == [4, 1]
    assert int(tok_lens[1]) == 2
