"""Llama-style model tests: training step, incremental-decode consistency,
and the serving engine's continuous batching loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama


CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4, kv_heads=2,
                             ffn=128, dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.key(0), CFG)


def test_forward_shapes(params):
    tokens = jax.random.randint(jax.random.key(1), (2, 16), 0, CFG.vocab_size)
    logits = llama.forward(params, tokens, CFG)
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_reduces_loss(params):
    tokens = jax.random.randint(jax.random.key(2), (4, 32), 0, CFG.vocab_size)
    p = params
    loss0 = None
    for _ in range(5):
        p, loss = llama.train_step(p, tokens, CFG, lr=0.2)
        if loss0 is None:
            loss0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < loss0, f"loss did not decrease: {loss0} -> {float(loss)}"


def test_attention_grads_match_oracle():
    """custom_vjp backward vs autodiff through the jnp oracle."""
    from mfa_tpu.kernels.autodiff import flash_attn_func_grad
    from mfa_tpu.ref.oracle import attention_ref

    key = jax.random.key(3)
    q = jax.random.normal(key, (1, 64, 2, 32))
    k = jax.random.normal(jax.random.key(4), (1, 64, 1, 32))
    v = jax.random.normal(jax.random.key(5), (1, 64, 1, 32))

    def f_kernel(q, k, v):
        return (flash_attn_func_grad(q, k, v, causal=True) ** 2).sum()

    def f_oracle(q, k, v):
        return (attention_ref(q, k, v, causal=True) ** 2).sum()

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 1e-3, f"d{name} diff {diff}"


def test_incremental_decode_matches_forward(params):
    """prefill+decode through the paged cache == full forward (teacher forcing)."""
    prompt = list(np.random.RandomState(0).randint(0, CFG.vocab_size, 13))
    n_steps = 4
    caches = llama.build_kv_caches(CFG, num_pages=16, page_size=8,
                                   max_seqs=2, pages_per_seq=8)
    pages = list(range(1, 9))
    caches, logits = llama.prefill_step(
        params, CFG, caches, 0, pages, jnp.asarray(prompt, jnp.int32)
    )
    seq = list(prompt)
    inc_logits = [np.asarray(logits)]
    for step in range(n_steps):
        tok = int(np.argmax(inc_logits[-1]))
        seq.append(tok)
        caches, lg = llama.decode_step(
            params, CFG, caches,
            jnp.asarray([0], jnp.int32), jnp.asarray([tok], jnp.int32),
        )
        inc_logits.append(np.asarray(lg[0]))
    # Full forward over the whole sequence
    full = np.asarray(llama.forward(params, jnp.asarray([seq], jnp.int32), CFG))[0]
    for i, il in enumerate(inc_logits):
        pos = len(prompt) - 1 + i
        diff = np.abs(il - full[pos]).max()
        assert diff < 2e-3, f"incremental logits diverge at step {i}: {diff}"


def test_engine_continuous_batching(params):
    from mfa_tpu.serve.engine import Engine

    eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                 pages_per_seq=8)
    rng = np.random.RandomState(1)
    reqs = [
        eng.submit(list(rng.randint(0, CFG.vocab_size, int(n))), max_new)
        for n, max_new in [(5, 4), (12, 3), (3, 6), (20, 2), (7, 5)]
    ]
    stats = eng.run()
    for r in reqs:
        assert len(r.generated) == r.max_new_tokens, (r.uid, r.generated)
    assert stats.decode_tokens == sum(r.max_new_tokens for r in reqs)
    # all pages recycled
    assert eng.sched.allocator.free_pages == 31
    assert not eng.sched.active and not eng.sched.waiting


def test_engine_matches_single_request_decode(params):
    """Engine output under continuous batching == isolated greedy decode."""
    from mfa_tpu.serve.engine import Engine

    prompt = list(np.random.RandomState(2).randint(0, CFG.vocab_size, 9))

    eng1 = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                  pages_per_seq=8)
    r_solo = eng1.submit(prompt, 5)
    eng1.run()

    eng2 = Engine(params, CFG, num_pages=64, page_size=8, max_seqs=4,
                  pages_per_seq=8)
    other = list(np.random.RandomState(3).randint(0, CFG.vocab_size, 6))
    r_a = eng2.submit(other, 7)
    r_b = eng2.submit(prompt, 5)
    eng2.run()

    assert r_solo.generated == r_b.generated, (
        f"batching changed output: {r_solo.generated} vs {r_b.generated}"
    )


def test_remat_matches_plain(params):
    """Checkpointed (remat) training step must compute identical loss and
    take the same update as the plain step (only memory behavior differs)."""
    tokens = jnp.asarray(
        np.random.RandomState(3).randint(0, CFG.vocab_size, (2, 24)),
        jnp.int32)
    p1, l1 = llama.train_step(params, tokens, CFG)
    p2, l2 = llama.train_step(params, tokens, CFG, remat=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_optax_train_step(params):
    import optax

    tokens = jnp.asarray(
        np.random.RandomState(4).randint(0, CFG.vocab_size, (2, 16)),
        jnp.int32)
    opt = optax.adamw(1e-3)
    state = opt.init(params)
    losses = []
    p = params
    for _ in range(3):
        p, state, loss = llama.train_step(p, tokens, CFG, optimizer=opt,
                                          opt_state=state)
        losses.append(float(loss))
    assert losses[2] < losses[0], f"adamw failed to reduce loss: {losses}"
