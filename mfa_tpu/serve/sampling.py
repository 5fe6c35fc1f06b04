"""Token sampling: greedy, temperature, top-k, top-p (nucleus).

The reference is a kernel library with no sampling; a serving engine needs
it. Everything here is jit-friendly and runs on-device (inside the decode
burst scan), so stochastic sampling costs no extra host round trips.
SamplingParams is a frozen dataclass and is passed as a static argument —
each distinct configuration compiles once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """temperature == 0 -> greedy argmax (top_k/top_p ignored).
    top_k == 0 -> no top-k truncation. top_p >= 1 -> no nucleus cut.
    min_p > 0 -> drop tokens whose probability is below min_p times the
    top token's probability (applies after temperature, like vLLM).
    repetition_penalty != 1 -> HF-convention penalty on every token already
    present in the context (positive logits divided, negative multiplied);
    requires a presence mask passed to sample()."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

    @property
    def needs_presence(self) -> bool:
        return self.repetition_penalty != 1.0


def filtered_logits(logits: jax.Array, params: SamplingParams) -> jax.Array:
    """Temperature-scaled, truncation-masked logits (no categorical draw).

    The distribution `softmax(filtered_logits(l, p))` is EXACTLY what
    sample() draws from for stochastic params — shared by sample() and
    speculative_accept() so the rejection-sampling ratio uses the true
    proposal/target distributions."""
    l = logits.astype(jnp.float32) / params.temperature
    vocab = l.shape[-1]
    if params.top_k and params.top_k < vocab:
        kth = jax.lax.top_k(l, params.top_k)[0][..., -1:]
        l = jnp.where(l < kth, -jnp.inf, l)
    if params.min_p > 0.0:
        probs = jax.nn.softmax(l, axis=-1)
        floor = params.min_p * jnp.max(probs, axis=-1, keepdims=True)
        l = jnp.where(probs < floor, -jnp.inf, l)
    if params.top_p < 1.0:
        sorted_l = jnp.sort(l, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the cumulative mass *before* them is < top_p
        keep = cum - probs < params.top_p
        cutoff = jnp.min(
            jnp.where(keep, sorted_l, jnp.inf), axis=-1, keepdims=True
        )
        l = jnp.where(l < cutoff, -jnp.inf, l)
    return l


def sample(logits: jax.Array, key: jax.Array, params: SamplingParams,
           presence: jax.Array = None) -> jax.Array:
    """logits [n, vocab] -> token ids [n] int32.

    presence: optional [n, vocab] bool — tokens already in each row's
    context (prompt + generated), for the repetition penalty.

    Filtering order matches the common convention (vLLM/HF): repetition
    penalty on raw logits, temperature, then top-k -> min-p -> top-p
    truncations, then categorical.
    """
    logits = logits.astype(jnp.float32)
    if params.repetition_penalty != 1.0 and presence is not None:
        pen = params.repetition_penalty
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(presence, penalized, logits)
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, filtered_logits(logits, params), axis=-1).astype(jnp.int32)


def sample_dynamic(logits: jax.Array, key: jax.Array,
                   temperature: jax.Array, top_p: jax.Array,
                   min_p: jax.Array, rep_penalty: jax.Array,
                   top_k: int = 0,
                   presence: jax.Array = None) -> jax.Array:
    """Per-ROW sampling parameters: one compiled sampler serves a batch
    mixing greedy and stochastic requests with different knobs.

    temperature/top_p/min_p/rep_penalty: [n] fp32 (temperature == 0 means
    greedy for that row; rep_penalty == 1 disables the penalty; top_k
    stays static — lax.top_k needs a static k — and applies batch-wide
    when > 0). presence: optional [n, vocab] bool context mask.
    """
    l = logits.astype(jnp.float32)
    pen = rep_penalty[:, None]
    if presence is not None:
        penalized = jnp.where(l > 0, l / pen, l * pen)
        l = jnp.where(presence, penalized, l)
    greedy_ids = jnp.argmax(l, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    ls = l / t
    vocab = ls.shape[-1]
    if top_k and top_k < vocab:
        kth = jax.lax.top_k(ls, top_k)[0][..., -1:]
        ls = jnp.where(ls < kth, -jnp.inf, ls)
    probs = jax.nn.softmax(ls, axis=-1)
    floor = min_p[:, None] * jnp.max(probs, axis=-1, keepdims=True)
    ls = jnp.where((min_p[:, None] > 0.0) & (probs < floor), -jnp.inf, ls)
    sorted_l = jnp.sort(ls, axis=-1)[..., ::-1]
    sp = jax.nn.softmax(sorted_l, axis=-1)
    cum = jnp.cumsum(sp, axis=-1)
    keep = cum - sp < top_p[:, None]
    cutoff = jnp.min(jnp.where(keep, sorted_l, jnp.inf), axis=-1,
                     keepdims=True)
    ls = jnp.where((top_p[:, None] < 1.0) & (ls < cutoff), -jnp.inf, ls)
    sampled = jax.random.categorical(key, ls, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy_ids, sampled)


@jax.jit
def _accept_jit(key, ql, pl_, d_toks):
    n, k, _ = ql.shape
    q = jax.nn.softmax(ql, axis=-1)  # [n, k, V] proposal
    p = jax.nn.softmax(pl_, axis=-1)  # [n, k, V] target
    qx = jnp.take_along_axis(q, d_toks[..., None], axis=-1)[..., 0]
    px = jnp.take_along_axis(p, d_toks[..., None], axis=-1)[..., 0]
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (n, k))
    acc = u * qx <= px  # accept iff u < p(x)/q(x)
    m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)  # [n]
    # Residual distribution at the (first) rejection position:
    # norm(max(p - q, 0)); if it vanishes numerically (p ~= q), fall back
    # to p itself — any draw from p is correct there.
    mi = jnp.minimum(m, k - 1)
    p_m = jnp.take_along_axis(p, mi[:, None, None], axis=1)[:, 0]  # [n, V]
    q_m = jnp.take_along_axis(q, mi[:, None, None], axis=1)[:, 0]
    res = jnp.clip(p_m - q_m, 0.0, None)
    res = jnp.where(jnp.sum(res, -1, keepdims=True) > 1e-9, res, p_m)
    r_tok = jax.random.categorical(kr, jnp.log(res + 1e-30), axis=-1)
    cols = jnp.arange(k, dtype=jnp.int32)[None]
    toks = jnp.where(cols == m[:, None], r_tok[:, None].astype(jnp.int32),
                     d_toks)
    return toks, m


def speculative_accept(key: jax.Array, draft_logits: jax.Array,
                       target_logits: jax.Array, d_toks: jax.Array,
                       params: SamplingParams):
    """Speculative-sampling acceptance (Leviathan/Chen rejection rule).

    draft_logits/target_logits: [n, k, vocab] raw model logits for the k
    span positions; d_toks: [n, k] tokens the draft SAMPLED (from
    softmax(filtered_logits(draft_logits))). Both distributions get the
    same temperature/top-k/top-p/min-p filtering, so the emitted stream
    is distributed exactly like plain sampling from the filtered target.

    Returns (tokens [n, k] int32, accept_len m [n] int32): tokens[:, :m]
    are accepted draft tokens; tokens[:, m] (when m < k) is the residual
    resample to emit at the rejection position; columns past m are dead.
    On full acceptance (m == k) all k draft tokens stand.

    Greedy params (temperature == 0, the SamplingParams default)
    degenerate to exact-match acceptance: accept while the draft token
    equals the target argmax, with the argmax as the residual —
    filtered_logits would divide by zero (the engine's greedy verify
    path, serve/engine.py, is this same rule fused on-device).
    """
    d_toks = jnp.asarray(d_toks, jnp.int32)
    if params.greedy:
        tgt = jnp.argmax(target_logits.astype(jnp.float32),
                         axis=-1).astype(jnp.int32)  # [n, k]
        ok = d_toks == tgt
        m = jnp.argmin(ok, axis=-1)  # first mismatch (0 if none)
        k = d_toks.shape[-1]
        m = jnp.where(ok.all(axis=-1), k, m).astype(jnp.int32)
        return tgt, m
    ql = filtered_logits(draft_logits, params)
    pl_ = filtered_logits(target_logits, params)
    return _accept_jit(key, ql, pl_, d_toks)


def token_logprobs(logits: jax.Array, ids: jax.Array) -> jax.Array:
    """Log-probability of the chosen ids under the UNfiltered distribution
    (the conventional serving semantics: logprobs reflect the model, not
    the sampler's truncation). logits [n, vocab], ids [n] -> [n] fp32."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, ids[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
