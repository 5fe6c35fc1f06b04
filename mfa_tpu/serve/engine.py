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
        self.caches, logits = llama.prefill_step(
            self.params, self.cfg, self.caches, req.slot, req.pages,
            jnp.asarray(req.prompt, jnp.int32),
        )
        self.stats.prefill_tokens += len(req.prompt)
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
        # padding rows reuse slot of row 0 with length... use slot 0's values;
        # their appended tokens land in a scratch slot: point them at the
        # last slot row (max_seqs-1 reserved? simpler: mask after). To keep
        # cache state clean, padding rows re-append to their own slot would
        # corrupt it — instead pad with the first active slot and roll back
        # lengths afterwards is messy; we avoid corruption by padding with
        # dedicated scratch slot max_seqs-1 if free, else run unpadded.
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

    def run(self) -> EngineStats:
        t0 = time.time()
        while self.sched.has_work:
            self.step()
        self.stats.wall_s = time.time() - t0
        return self.stats
