"""Generation engine: model + paged caches + continuous-batching scheduler.

Ties together mfa_tpu.models (weights/compute), mfa_tpu.cache (paged KV)
and mfa_tpu.serve.scheduler (admission/policy) into the serving loop the
reference only gestures at in its generation-loop test
(tests/test_flash_decoding.py:520-628).

Step shape: admit -> prefill admitted prompts (writes KV pages) -> one
batched decode step over all active slots -> sample -> append/finish.
Decode batches are padded to a fixed set of bucket sizes so the jitted
decode_step retraces only per bucket, not per batch size.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.serve.scheduler import Request, Scheduler


@dataclasses.dataclass
class EngineStats:
    prefill_tokens: int = 0
    decode_tokens: int = 0
    steps: int = 0
    recoveries: int = 0
    wall_s: float = 0.0

    @property
    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / self.wall_s if self.wall_s else 0.0


def _bucket(n: int, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Engine:
    def __init__(
        self,
        params,
        cfg: llama.LlamaConfig,
        num_pages: int = 256,
        page_size: int = 64,
        max_seqs: int = 16,
        pages_per_seq: int = 16,
        quant_dtype: Optional[str] = None,
        greedy: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.page_size = page_size
        self.caches = llama.build_kv_caches(
            cfg, num_pages, page_size, max_seqs, pages_per_seq, quant_dtype
        )
        self.sched = Scheduler(max_seqs, pages_per_seq, page_size, num_pages)
        self.greedy = greedy
        self.stats = EngineStats()
        self._next_uid = 0

    def submit(self, prompt: List[int], max_new_tokens: int,
               eos_token: Optional[int] = None) -> Request:
        req = Request(self._next_uid, list(prompt), max_new_tokens, eos_token)
        self._next_uid += 1
        self.sched.submit(req)
        return req

    def _prefill(self, req: Request) -> int:
        # Resumed requests (after a recovery) re-prefill their prompt plus
        # all but the last generated token; the last one is replayed through
        # the normal decode step.
        tokens = req.prompt + req.generated[:-1]
        self.caches, logits = llama.prefill_step(
            self.params, self.cfg, self.caches, req.slot, req.pages,
            jnp.asarray(tokens, jnp.int32),
        )
        self.stats.prefill_tokens += len(tokens)
        return int(jnp.argmax(logits))

    def _map_new_pages(self) -> None:
        from mfa_tpu.cache.paged_cache import map_page

        for req in list(self.sched.active.values()):
            new_page = self.sched.ensure_decode_page(req)
            if new_page is not None:
                page_index = len(req.pages) - 1
                self.caches = [
                    map_page(c, req.slot, page_index, new_page)
                    for c in self.caches
                ]

    def step(self) -> None:
        """One engine iteration: admit, prefill, batched decode step."""
        for req in self.sched.admit():
            first = self._prefill(req)
            if not req.generated:  # fresh request (not a recovery resume)
                req.generated.append(first)
                self.stats.decode_tokens += 1
            if req.done:
                self._finish(req)

        active = [r for r in self.sched.active.values()]
        if not active:
            return
        self._map_new_pages()

        n = len(active)
        nb = _bucket(n)
        slots = np.zeros((nb,), np.int32)
        tokens = np.zeros((nb,), np.int32)
        for i, r in enumerate(active):
            slots[i] = r.slot
            tokens[i] = r.generated[-1]
        # Padding rows must not corrupt live cache rows: point them at a
        # free scratch slot (its junk append is rolled back below). If every
        # slot is busy the batch is exactly max_seqs — run unpadded.
        pad_rows = nb - n
        if pad_rows:
            scratch = None
            for s in range(self.sched.max_seqs):
                if s not in self.sched.active:
                    scratch = s
                    break
            if scratch is None:
                nb = n  # all slots busy: run exact size (extra retrace, rare)
                slots = slots[:n]
                tokens = tokens[:n]
                pad_rows = 0
            else:
                slots[n:] = scratch
                tokens[n:] = 0

        self.caches, logits = llama.decode_step(
            self.params, self.cfg, self.caches,
            jnp.asarray(slots), jnp.asarray(tokens),
        )
        if pad_rows:
            # roll back the scratch slot the padded rows appended into
            from mfa_tpu.cache.paged_cache import release_slot

            self.caches = [release_slot(c, int(slots[n])) for c in self.caches]

        next_tokens = np.asarray(jnp.argmax(logits[:n], axis=-1))
        self.stats.steps += 1
        for i, req in enumerate(active):
            req.generated.append(int(next_tokens[i]))
            self.stats.decode_tokens += 1
            if req.done:
                self._finish(req)

    def _finish(self, req: Request) -> None:
        from mfa_tpu.cache.paged_cache import release_slot

        slot = req.slot
        self.sched.finish(req)
        self.caches = [release_slot(c, slot) for c in self.caches]

    def recover(self) -> int:
        """Reset device state after a failed step and requeue in-flight
        requests (restartable batches; the reference has no failure
        handling at all, SURVEY.md §5). Generated tokens are kept; the KV
        is rebuilt by re-prefilling on re-admission. Returns the number of
        requeued requests."""
        active = sorted(self.sched.active.values(), key=lambda r: r.uid)
        for req in list(active):
            self.sched.finish(req)
        # Fresh device cache state (old buffers may hold poisoned data).
        c0 = self.caches[0]
        self.caches = llama.build_kv_caches(
            self.cfg, c0.num_pages, c0.page_size, c0.max_seqs,
            c0.pages_per_seq, c0.quant_dtype,
        )
        for req in reversed(active):
            self.sched.waiting.appendleft(req)
        self.stats.recoveries += 1
        return len(active)

    def run(self, max_retries: int = 0) -> EngineStats:
        """Drain all work. With max_retries > 0, a failing step triggers
        recover() and the batch restarts, up to the retry budget."""
        t0 = time.time()
        retries = 0
        while self.sched.has_work:
            try:
                self.step()
            except Exception:
                if retries >= max_retries:
                    raise
                retries += 1
                self.recover()
        self.stats.wall_s = time.time() - t0
        return self.stats
