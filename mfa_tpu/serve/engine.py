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
    preemptions: int = 0
    wall_s: float = 0.0
    spec_proposed: int = 0
    spec_accepted: int = 0

    @property
    def spec_acceptance(self) -> float:
        return (self.spec_accepted / self.spec_proposed
                if self.spec_proposed else 0.0)

    @property
    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / self.wall_s if self.wall_s else 0.0


def _bucket(n: int, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256)) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the table: next power of two (never round DOWN — a bucket
    # smaller than n would make _pad_batch index out of bounds)
    return 1 << (n - 1).bit_length()


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
        mesh=None,
        sampling=None,
        seed: int = 0,
        prefill_chunk: Optional[int] = None,
        prefix_cache: bool = False,
        draft_params=None,
        draft_cfg: Optional[llama.LlamaConfig] = None,
        spec_tokens: int = 4,
        vision=None,
    ):
        """mesh: optional jax.sharding.Mesh with a 'model' axis for
        tensor-parallel serving — params (llama.param_shardings) and the
        paged caches (llama.cache_shardings) are placed across it, and
        decode attention runs kv-head-sharded with zero communication.
        Serving meshes should be model-only; scale-out across hosts is
        data-parallel at the engine level (one engine replica per host
        group, each with its own scheduler — requests never share KV).

        vision: optional (vision_params, SiglipVisionConfig,
        image_token_id) tuple (models/convert.gemma3_multimodal_from_hf
        returns the pieces) enabling submit(..., images=) multimodal
        prompts: prefill merges projected image features over the
        placeholder rows under the bidirectional image-block mask; decode
        is unchanged (the images live entirely in the prompt)."""
        self.mesh = mesh
        self.cfg = cfg
        self.page_size = page_size
        self.vision = vision
        if quant_dtype == "auto":
            # int4 only beats int8 past a measured KV-length crossover
            # (dispatch/config.py:INT4_KV_CROSSOVER_TOKENS); pick from the
            # cache capacity a sequence can actually reach.
            from mfa_tpu.dispatch.config import recommend_kv_quant

            quant_dtype = recommend_kv_quant(pages_per_seq * page_size)
        self.quant_dtype = quant_dtype
        cache = llama.build_kv_caches(
            cfg, num_pages, page_size, max_seqs, pages_per_seq, quant_dtype
        )
        if mesh is not None:
            from mfa_tpu.models.wquant import adapt_shardings

            params = jax.device_put(
                params,
                adapt_shardings(llama.param_shardings(cfg, mesh), params))
            cache = jax.device_put(
                cache, llama.cache_shardings(cfg, cache, mesh)
            )
        self.params = params
        self.cache = cache
        self.sched = Scheduler(max_seqs, pages_per_seq, page_size, num_pages,
                               prefix_cache=prefix_cache)
        from mfa_tpu.serve.sampling import SamplingParams

        # `sampling` wins over the legacy `greedy` flag; default is greedy.
        self.sampling = sampling or SamplingParams()
        self.greedy = self.sampling.greedy
        # Repetition penalty: a device-resident [max_seqs, vocab] context
        # mask keyed by SLOT — rows are marked as prompts admit and tokens
        # sample (tiny device scatters), gathered per batch at sample time.
        # Rebuilding host-side per step would ship ~vocab*batch bools
        # through the dispatch tunnel every decode step.
        self._pres_dev = (
            jnp.zeros((max_seqs, cfg.vocab_size), bool)
            if self.sampling.needs_presence else None
        )
        self._key = jax.random.key(seed)
        self.stats = EngineStats()
        # Pipelined serving: dispatched-but-unread decode bursts
        # (step_pipelined / _run_pipelined; drained by the sync paths).
        from collections import deque

        self._pending_bursts = deque()
        # Finished slots awaiting their device-metadata clear: releasing
        # per request queues 2 eager RPCs each through the tunnel (~140 ms
        # of backlog absorbed by the next wave's first sync when a batch
        # finishes together); _flush_released folds them into ONE batched
        # scatter pair at the next step entry. Deferral is sound: a new
        # request's prefill overwrites its slot's row wholesale, and a
        # stale scratch row only wastes discarded-row compute.
        self._to_release: list = []
        self._next_uid = 0
        self._stream_pos: Dict[int, int] = {}  # uid -> tokens consumed
        self._all_reqs: Dict[int, Request] = {}  # uid -> request (streaming)
        # Chunked prefill: prompts longer than this many tokens are
        # ingested one page-aligned chunk per engine step, interleaved
        # with decode, so one long prompt can't stall the whole batch's
        # token latency (TTFT fairness). Must be a multiple of page_size.
        if prefill_chunk is not None and prefill_chunk % page_size != 0:
            raise ValueError("prefill_chunk must be a multiple of page_size")
        self.prefill_chunk = prefill_chunk
        self._prefilling: Dict[int, tuple] = {}  # uid -> (req, pos, tokens)
        # Speculative decoding: a small draft model proposes spec_tokens
        # greedily (one on-device burst), the target scores them all in ONE
        # verify_step forward, and rejected tokens are rolled back with a
        # lengths reset. Both models share the scheduler's page tables.
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.spec_tokens = spec_tokens
        self.draft_cache = None
        if draft_params is not None:
            if draft_cfg is None:
                raise ValueError("draft_params requires draft_cfg")
            if self.sampling.needs_presence:
                raise ValueError(
                    "speculative decoding does not support the repetition "
                    "penalty (verification is context-free)")
            self.draft_cache = llama.build_kv_caches(
                draft_cfg, num_pages, page_size, max_seqs, pages_per_seq,
                quant_dtype,
            )

    def submit(self, prompt: List[int], max_new_tokens: int,
               eos_token: Optional[int] = None,
               stop: Optional[List[List[int]]] = None,
               sampling=None, images=None) -> Request:
        """stop: token-id sequences that end generation when the output
        ends with one of them (the matched tokens stay in the output).
        sampling: per-request SamplingParams override (temperature/top_p/
        min_p/repetition_penalty; top_k stays engine-level). Mixed batches
        run in ONE compiled program via per-row parameter vectors.
        images: [n_images, 3, H, W] pixels matching the prompt's <image>
        placeholder runs (requires the engine's vision= tuple); image
        prompts prefill whole (never chunked) and never share prefix
        pages."""
        if images is not None:
            if self.vision is None:
                raise ValueError(
                    "images= requires an Engine vision= tuple "
                    "(vision_params, vision_cfg, image_token_id)")
            if self.draft_params is not None:
                raise ValueError(
                    "speculative decoding does not support image prompts "
                    "(the draft model has no vision tower)")
        if sampling is not None:
            if self.draft_params is not None:
                raise ValueError("per-request sampling is incompatible "
                                 "with speculative decoding (greedy-only)")
            if (sampling.needs_presence and self._pres_dev is None):
                # lazily materialize the presence mask; rows for requests
                # without a penalty stay zero and their penalty is 1 (a
                # no-op), so late creation is sound
                self._pres_dev = jnp.zeros(
                    (self.sched.max_seqs, self.cfg.vocab_size), bool)
        req = Request(self._next_uid, list(prompt), max_new_tokens,
                      eos_token, stop=stop, sampling=sampling, images=images)
        self._next_uid += 1
        self.sched.submit(req)
        self._stream_pos[req.uid] = 0
        self._all_reqs[req.uid] = req
        return req

    def abandon(self, uids) -> None:
        """Drop streaming bookkeeping for requests whose clients are gone
        (server-side failure cleanup): without this, requests that never
        reach `done` would sit in _all_reqs/_stream_pos forever."""
        for uid in list(uids):
            self._stream_pos.pop(uid, None)
            self._all_reqs.pop(uid, None)

    def poll(self):
        """Streaming consumption: tokens generated since the last poll().

        Returns {uid: [tokens...]} for every request that produced output
        since the previous call (finished requests flush their tail and
        drop out of future polls). Drive with step()/step_burst() between
        polls — e.g.  while eng.sched.has_work: eng.step_burst(8);
        for uid, toks in eng.poll().items(): ...
        """
        out = {}
        done_uids = []
        for uid, pos in self._stream_pos.items():
            req = self._all_reqs.get(uid)
            if req is None:
                continue
            if len(req.generated) > pos:
                out[uid] = req.generated[pos:]
                self._stream_pos[uid] = len(req.generated)
            if req.done:
                done_uids.append(uid)
        for uid in done_uids:
            del self._stream_pos[uid]
            self._all_reqs.pop(uid, None)
        return out

    def _prefill_admitted(self, reqs: List[Request]) -> None:
        """Prefill all newly admitted prompts in ONE batched jitted call
        (llama.prefill_batch) and do the per-request bookkeeping. Resumed
        requests (after a recovery) re-prefill their prompt plus all but
        the last generated token; the last one is replayed through the
        normal decode step."""
        if not reqs:
            return
        if self._pres_dev is not None:
            # one scatter per admission wave: freed slots may carry stale
            # bits (finished requests' rows are NOT cleared eagerly — that
            # would be a per-request device op in the hot loop)
            self._pres_dev = self._pres_dev.at[
                jnp.asarray([r.slot for r in reqs], jnp.int32)].set(False)
        self._pres_mark_context(reqs)  # prompts count for the penalty
        chunk_limit = self.prefill_chunk
        toks_of = {r.uid: r.prompt + r.generated[:-1] for r in reqs}
        for r in reqs:
            toks = toks_of[r.uid]
            # chunked path for long prompts AND for prefix-cache hits
            # (their suffix prefill needs a page-aligned start offset);
            # image prompts always prefill whole — the bidirectional
            # image-block mask needs every prompt row in one program
            if (((chunk_limit is not None and len(toks) > chunk_limit)
                    or r.cached_len > 0) and r.images is None):
                self._prefilling[r.uid] = (r, r.cached_len, toks)
        reqs = [r for r in reqs if r.uid not in self._prefilling]
        if not reqs:
            return
        # Split the wave: image prompts need the dense-masked prefill
        # program (bidirectional image-block mask, O(s^2) fp32 scores);
        # routing the whole mixed batch through it — padded to the longest
        # prompt — would spike HBM and stall the text requests behind a
        # far slower program. Text requests keep the flash path.
        text_reqs = [r for r in reqs if r.images is None]
        img_reqs = [r for r in reqs if r.images is not None]
        for group, vision in ((text_reqs, None), (img_reqs, self.vision)):
            if not group:
                continue
            token_lists = [toks_of[r.uid] for r in group]
            self.cache, logits = llama.prefill_batch(
                self.params, self.cfg, self.cache,
                [r.slot for r in group], [r.pages for r in group],
                token_lists, mesh=self.mesh, vision=vision,
                pixel_lists=([r.images for r in group] if vision else None),
            )
            if self.draft_cache is not None:
                self.draft_cache, _ = llama.prefill_batch(
                    self.draft_params, self.draft_cfg, self.draft_cache,
                    [r.slot for r in group], [r.pages for r in group],
                    token_lists,
                )
            ids, lps = self._sample(
                logits, self._pres_rows([r.slot for r in group]),
                self._sampling_vecs(group, len(group)))
            firsts, first_lps = np.asarray(ids), np.asarray(lps)
            self._pres_mark(
                [r.slot for r in group if not r.generated],
                [int(f) for r, f in zip(group, firsts) if not r.generated])
            for req, toks, first, flp in zip(group, token_lists, firsts,
                                             first_lps):
                self.stats.prefill_tokens += len(toks)
                if self.sched.prefix is not None and req.images is None:
                    self.sched.prefix.register(req)
                if not req.generated:  # fresh request (not a recovery resume)
                    req.generated.append(int(first))
                    req.logprobs.append(float(flp))
                    self.stats.decode_tokens += 1
                if req.done:
                    self._finish(req)

    def _map_new_pages(self, n: int = 1) -> None:
        """Map pages for the next n decode positions of every active
        request — ONE scatter for the whole batch (the shared block table
        makes metadata mutation O(1) device ops)."""
        from mfa_tpu.cache.paged_cache import map_pages

        m_slots, m_idx, m_ids = [], [], []
        preempted = set()
        for req in list(self._decode_ready()):
            while req.uid not in preempted:
                try:
                    pairs = self.sched.ensure_decode_pages(req, n)
                except MemoryError:
                    # Page pressure: evict the youngest active request
                    # (pages freed, requeued at the queue front; resumes
                    # via the recovery-resume re-prefill) and retry. Only
                    # fully-prefilled requests are candidates — evicting a
                    # mid-chunked-prefill request would corrupt its resume
                    # offset bookkeeping.
                    victims = [r for r in self.sched.active.values()
                               if r.uid not in preempted
                               and r.uid not in self._prefilling]
                    if len(victims) <= 1:
                        raise  # nothing left to steal from
                    victim = max(victims, key=lambda r: r.uid)
                    preempted.add(victim.uid)
                    self.sched.preempt(victim)
                    self.stats.preemptions += 1
                    continue
                for page_index, page_id in pairs:
                    m_slots.append(req.slot)
                    m_idx.append(page_index)
                    m_ids.append(page_id)
                break
        if preempted:
            # drop any mappings collected for now-preempted requests (their
            # pages were freed with the slot)
            keep = [i for i, s in enumerate(m_slots)
                    if s in self.sched.active]
            m_slots = [m_slots[i] for i in keep]
            m_idx = [m_idx[i] for i in keep]
            m_ids = [m_ids[i] for i in keep]
        if m_slots:
            self.cache = map_pages(self.cache, m_slots, m_idx, m_ids)
            if self.draft_cache is not None:
                self.draft_cache = map_pages(
                    self.draft_cache, m_slots, m_idx, m_ids)

    def _sample(self, logits, presence=None, vecs=None):
        """-> (ids [n], logprobs [n]) — logprobs under the unfiltered
        model distribution (standard serving semantics). vecs: per-row
        sampling parameter vectors (see _sampling_vecs)."""
        from mfa_tpu.serve.sampling import (sample, sample_dynamic,
                                            token_logprobs)

        self._key, sub = jax.random.split(self._key)
        if vecs is not None:
            ids = sample_dynamic(logits, sub, *vecs,
                                 top_k=self.sampling.top_k,
                                 presence=presence)
        else:
            ids = sample(logits, sub, self.sampling, presence)
        return ids, token_logprobs(logits, ids)

    def _sampling_vecs(self, reqs, rows: int):
        """Per-row (temperature, top_p, min_p, repetition_penalty) fp32
        vectors when any request overrides the engine default, else None
        (static fast path). Padding rows get the engine defaults."""
        if not any(r.sampling is not None for r in reqs):
            return None
        d = self.sampling
        vecs = np.zeros((4, rows), np.float32)
        vecs[0] = d.temperature
        vecs[1] = d.top_p
        vecs[2] = d.min_p
        vecs[3] = d.repetition_penalty
        for i, r in enumerate(reqs):
            s = r.sampling or d
            vecs[0, i] = s.temperature
            vecs[1, i] = s.top_p
            vecs[2, i] = s.min_p
            vecs[3, i] = s.repetition_penalty
        return tuple(jnp.asarray(v) for v in vecs)

    def _pres_rows(self, slots):
        """Gather the presence rows for a batch of slots (device op), or
        None when the sampler doesn't need them."""
        if self._pres_dev is None:
            return None
        return self._pres_dev[jnp.asarray(slots, jnp.int32)]

    def _pres_mark(self, slots, tokens) -> None:
        """Mark token ids as present for their slots (one device scatter;
        slots and tokens are equal-length flat sequences)."""
        if self._pres_dev is None or len(slots) == 0:
            return
        self._pres_dev = self._pres_dev.at[
            jnp.asarray(slots, jnp.int32), jnp.asarray(tokens, jnp.int32)
        ].set(True)

    def _pres_mark_context(self, reqs) -> None:
        """Mark each request's full context (prompt + generated so far)."""
        if self._pres_dev is None:
            return
        slots, toks = [], []
        for r in reqs:
            ctx = r.prompt + r.generated
            slots.extend([r.slot] * len(ctx))
            toks.extend(ctx)
        self._pres_mark(slots, toks)

    def _advance_chunked_prefill(self) -> None:
        """Advance EVERY in-progress long prompt by one chunk, in a single
        batched program (llama.prefill_chunk_batch) — prefill work per step
        stays bounded, but concurrent long prompts don't serialize."""
        if not self._prefilling:
            return
        items = list(self._prefilling.values())
        page = self.page_size
        if self.prefill_chunk is not None:
            chunk = self.prefill_chunk
        else:
            # suffix-only mode (prefix-cache hits): one chunk covers the
            # largest remaining suffix, bucketed to power-of-two pages
            max_rem = max(len(t) - pos for _, pos, t in items)
            np_pages = -(-max_rem // page)
            chunk = (1 << max(np_pages - 1, 0).bit_length()) * page
        nb = _bucket(len(items))
        pad_rows = nb - len(items)
        scratch = None
        if pad_rows:
            for srch in range(self.sched.max_seqs):
                if srch not in self.sched.active:
                    scratch = srch
                    break
            if scratch is None:
                pad_rows = 0  # exact size (extra retrace, rare)
        slots, pages_l, chunk_toks, offs, totals = [], [], [], [], []
        for req, pos, tokens in items:
            slots.append(req.slot)
            pages_l.append(req.pages)
            chunk_toks.append(tokens[pos : pos + chunk])
            offs.append(pos)
            totals.append(len(tokens))
        for _ in range(pad_rows):
            slots.append(scratch)
            pages_l.append([])      # zero table row -> null-page writes
            chunk_toks.append([0])
            offs.append(0)
            totals.append(chunk + page)  # never "final"

        self.cache, logits = llama.prefill_chunk_batch(
            self.params, self.cfg, self.cache, slots, pages_l, chunk_toks,
            offs, totals, chunk, mesh=self.mesh,
        )
        if self.draft_cache is not None:
            self.draft_cache, _ = llama.prefill_chunk_batch(
                self.draft_params, self.draft_cfg, self.draft_cache, slots,
                pages_l, chunk_toks, offs, totals, chunk,
            )
        # logits carry the padded bucket rows; sample only the real items
        # (presence/sampling vectors are sized to them)
        ids, lps = self._sample(
            logits[: len(items)],
            self._pres_rows([it[0].slot for it in items]),
            self._sampling_vecs([it[0] for it in items], len(items)))
        ids_np, lps_np = np.asarray(ids), np.asarray(lps)
        mark_slots, mark_toks = [], []
        for i, (req, pos, tokens) in enumerate(items):
            pos += min(chunk, len(tokens) - pos)
            if pos >= len(tokens):
                del self._prefilling[req.uid]
                self.stats.prefill_tokens += len(tokens) - req.cached_len
                if self.sched.prefix is not None:
                    self.sched.prefix.register(req)
                if not req.generated:
                    req.generated.append(int(ids_np[i]))
                    req.logprobs.append(float(lps_np[i]))
                    mark_slots.append(req.slot)
                    mark_toks.append(int(ids_np[i]))
                    self.stats.decode_tokens += 1
                if req.done:
                    self._finish(req)
            else:
                self._prefilling[req.uid] = (req, pos, tokens)
        self._pres_mark(mark_slots, mark_toks)

    def _decode_ready(self):
        return [r for r in self.sched.active.values()
                if r.uid not in self._prefilling]

    def _pad_batch(self, active):
        """Pad the active batch to a power-of-two bucket.

        Padding rows must not corrupt live cache rows: they point at a free
        scratch slot whose junk appends are rolled back by the caller
        (release_slot). If every slot is busy the batch is exactly
        max_seqs and runs unpadded (extra retrace, rare).
        Returns (slots [nb] np.int32, tokens [nb] np.int32, scratch|None).
        """
        n = len(active)
        nb = _bucket(n)
        slots = np.zeros((nb,), np.int32)
        tokens = np.zeros((nb,), np.int32)
        for i, r in enumerate(active):
            slots[i] = r.slot
            tokens[i] = r.generated[-1]
        scratch = None
        if nb > n:
            for cand in range(self.sched.max_seqs):
                if cand not in self.sched.active:
                    scratch = cand
                    break
            if scratch is None:
                return slots[:n], tokens[:n], None
            slots[n:] = scratch
            tokens[n:] = 0
        return slots, tokens, scratch

    def _decode_active(self, active) -> None:
        """One batched decode step + bookkeeping for `active` requests
        (pages for the next position must already be mapped)."""

        n = len(active)
        slots, tokens, scratch = self._pad_batch(active)
        self.cache, logits = llama.decode_step(
            self.params, self.cfg, self.cache,
            jnp.asarray(slots), jnp.asarray(tokens), mesh=self.mesh,
        )
        if scratch is not None:
            # roll back the scratch slot the padded rows appended into
            # (deferred: one batched scatter at the next step entry)
            self._to_release.append(scratch)

        ids, lps = self._sample(
            logits[:n], self._pres_rows([r.slot for r in active]),
            self._sampling_vecs(active, n))
        next_tokens, next_lps = np.asarray(ids), np.asarray(lps)
        self._pres_mark([r.slot for r in active], next_tokens)
        self.stats.steps += 1
        for i, req in enumerate(active):
            req.generated.append(int(next_tokens[i]))
            req.logprobs.append(float(next_lps[i]))
            self.stats.decode_tokens += 1
            if req.done:
                self._finish(req)

    def step(self) -> None:
        """One engine iteration: admit, prefill, batched decode step."""
        self._drain_pipeline()
        self._flush_released()
        self._prefill_admitted(self.sched.admit())
        self._advance_chunked_prefill()

        active = self._decode_ready()
        if not active:
            return
        self._map_new_pages(1)
        self._decode_active(active)

    def step_burst(self, n: int) -> None:
        """Admit + prefill, then run up to n decode steps fused on-device
        (llama.decode_burst) with ONE host round trip for all n tokens —
        the TPU-idiomatic serving loop (per-step host syncs cost a full
        device->host RTT each). Greedy sampling only. Requests finishing
        mid-burst (eos) have their outputs truncated at eos; the spare
        positions' KV appends land in the slot that is released right
        after, so no live state is corrupted."""

        self._drain_pipeline()
        self._flush_released()
        self._prefill_admitted(self.sched.admit())
        self._advance_chunked_prefill()

        active = self._decode_ready()
        if not active:
            return
        # Burst length is bucketed to powers of two so the jitted burst
        # program retraces O(log n) times, never per remaining-budget value
        # (a fresh compile inside the serving loop costs seconds). Requests
        # finishing mid-burst are truncated; their spare KV appends hit
        # pages owned by the just-released slot, never live state.
        rem = max(r.max_new_tokens - len(r.generated) for r in active)
        if rem >= n:
            n_eff = n
        else:
            n_eff = min(n, 1 << max(rem - 1, 0).bit_length())
        n_eff = max(1, n_eff)
        self._map_new_pages(n_eff)

        slots, tokens, scratch = self._pad_batch(active)
        self._key, sub = jax.random.split(self._key)
        self.cache, toks, burst_lps = llama.decode_burst(
            self.params, self.cfg, self.cache,
            jnp.asarray(slots), jnp.asarray(tokens), n_eff, mesh=self.mesh,
            sampling=self.sampling, key=sub,
            presence=self._pres_rows(slots),
            sampling_vecs=self._sampling_vecs(active, len(slots)),
        )
        if scratch is not None:
            self._to_release.append(scratch)
        toks_np = np.asarray(toks)  # [n_eff, nb]
        lps_np = np.asarray(burst_lps)
        self.stats.steps += n_eff
        mark_slots, mark_toks = [], []
        for i, req in enumerate(active):
            for t, lp in zip(toks_np[:, i], lps_np[:, i]):
                if req.done:
                    break
                req.generated.append(int(t))
                req.logprobs.append(float(lp))
                mark_slots.append(req.slot)
                mark_toks.append(int(t))
                self.stats.decode_tokens += 1
            if req.done:
                self._finish(req)
        self._pres_mark(mark_slots, mark_toks)

    # ---- pipelined burst serving -------------------------------------
    #
    # step_burst blocks on np.asarray(toks) every burst: one full
    # device->host round trip (~30-50ms through the tunnel) during which
    # the chip idles. The pipelined loop instead keeps up to
    # PIPELINE_DEPTH bursts in flight: burst N+1 is dispatched on
    # device-resident state (the cache future plus burst N's last sampled
    # token) BEFORE burst N's tokens are read back, so the readback and
    # host bookkeeping overlap burst N+1's compute. Safety rests on one
    # invariant: every cache mutation threads functionally through
    # self.cache, so host-side decisions made "early" (page mapping,
    # slot release, admission prefill) are dispatched in program order
    # AFTER the in-flight bursts — a finished row's junk appends are
    # device-ordered before its pages can be re-mapped to a new owner.
    # Requests finishing mid-flight (eos/stop) are discovered one burst
    # late; their extra rows waste compute but never corrupt state (the
    # processing loop discards tokens past `done`).

    PIPELINE_DEPTH = 2

    def _dispatch_chained(self, burst: int, prev):
        """Dispatch one decode burst without waiting for in-flight ones.

        prev: the most recently dispatched burst record (None when the
        pipeline is empty). Returns a burst record for _process_burst_result
        or None when no burst can be dispatched right now (no active
        requests, all budgets projected exhausted, page pressure, or a
        row-set change that repetition-penalty state can't chain across —
        the caller then drains the pipeline and falls back to step_burst).
        """
        from mfa_tpu.cache.paged_cache import map_pages

        active = self._decode_ready()
        if not active:
            return None
        # Budget projection counts in-flight tokens the host hasn't seen.
        rem = max(r.max_new_tokens - len(r.generated) - r.inflight
                  for r in active)
        if rem <= 0:
            return None
        n_eff = burst if rem >= burst else 1 << max(rem - 1, 0).bit_length()
        n_eff = max(1, n_eff)
        m_slots, m_idx, m_ids = [], [], []
        try:
            for req in active:
                for page_index, page_id in self.sched.ensure_decode_pages(
                        req, req.inflight + n_eff):
                    m_slots.append(req.slot)
                    m_idx.append(page_index)
                    m_ids.append(page_id)
        except MemoryError:
            # Page pressure: drain the pipeline; the synchronous
            # step_burst fallback preempts a victim with exact state.
            # Pages already granted above stay mapped (harmless: they are
            # legitimately owned by their requests and cover upcoming
            # positions).
            if m_slots:
                self.cache = map_pages(self.cache, m_slots, m_idx, m_ids)
            return None
        if m_slots:
            self.cache = map_pages(self.cache, m_slots, m_idx, m_ids)

        slots, tokens_host, scratch = self._pad_batch(active)
        need_pres = self._pres_dev is not None
        if (prev is not None and len(prev["active"]) == len(active)
                and all(a is b for a, b in zip(prev["active"], active))
                and np.array_equal(prev["slots"], slots)):
            # Same rows as the in-flight burst: chain tokens (and
            # presence) directly on device — exact.
            tokens = prev["toks"][-1]
            pres = prev["pres"]
        elif any(r.inflight for r in active):
            if need_pres or prev is None:
                return None  # presence can't chain across a row change
            # Row set changed mid-flight (a request finished or was
            # admitted): route in-flight rows' last tokens through a
            # slot-indexed device map; rows with nothing in flight get
            # exact host tokens.
            tokmap = jnp.zeros((self.sched.max_seqs,), jnp.int32).at[
                jnp.asarray(prev["slots"], jnp.int32)].set(prev["toks"][-1])
            tokens = tokmap[jnp.asarray(slots, jnp.int32)]
            rows = [i for i, r in enumerate(active) if r.inflight == 0]
            rows += list(range(len(active), len(slots)))  # padding rows
            if rows:
                tokens = tokens.at[jnp.asarray(rows, jnp.int32)].set(
                    jnp.asarray(tokens_host[rows], jnp.int32))
            pres = None
        else:
            tokens = jnp.asarray(tokens_host)
            pres = self._pres_rows(slots)

        self._key, sub = jax.random.split(self._key)
        out = llama.decode_burst(
            self.params, self.cfg, self.cache,
            jnp.asarray(slots), tokens, n_eff, mesh=self.mesh,
            sampling=self.sampling, key=sub, presence=pres,
            sampling_vecs=self._sampling_vecs(active, len(slots)),
            return_presence=need_pres,
        )
        if need_pres:
            self.cache, toks, lps, pres_out = out
        else:
            (self.cache, toks, lps), pres_out = out, None
        for r in active:
            r.inflight += n_eff
        return dict(active=list(active), n_eff=n_eff, toks=toks, lps=lps,
                    pres=pres_out, slots=slots, scratch=scratch)

    def _process_burst_result(self, d) -> None:
        """Read back one in-flight burst (overlaps later bursts' compute)
        and do the host bookkeeping step_burst would have done."""

        toks_np = np.asarray(d["toks"])
        lps_np = np.asarray(d["lps"])
        self.stats.steps += d["n_eff"]
        mark_slots, mark_toks = [], []
        for i, req in enumerate(d["active"]):
            req.inflight = max(0, req.inflight - d["n_eff"])
            was_done = req.done  # finished in an earlier processed burst
            for t, lp in zip(toks_np[:, i], lps_np[:, i]):
                if req.done:
                    break
                req.generated.append(int(t))
                req.logprobs.append(float(lp))
                mark_slots.append(req.slot)
                mark_toks.append(int(t))
                self.stats.decode_tokens += 1
            if req.done and not was_done:
                self._finish(req)
        # The scratch slot's junk lengths are rolled back only while it is
        # still free — an admission may have legitimately claimed it (its
        # prefill SET the row/lengths after the in-flight junk appends).
        if d["scratch"] is not None and d["scratch"] not in self.sched.active:
            self._to_release.append(d["scratch"])
        self._pres_mark(mark_slots, mark_toks)

    def _drain_pipeline(self) -> None:
        """Read back every in-flight burst (pipeline barrier). The
        synchronous step paths call this first so host state (generated,
        presence) is exact before they build a batch."""
        while self._pending_bursts:
            self._process_burst_result(self._pending_bursts.popleft())

    def step_pipelined(self, n: int) -> None:
        """One pipelined engine iteration: admit + prefill, top the
        pipeline up to PIPELINE_DEPTH in-flight bursts, then process the
        oldest (its readback overlaps the younger bursts' compute).
        Incremental — poll() between calls streams tokens with at most
        one burst of extra latency. Falls back to the synchronous
        step_burst when nothing can be dispatched pipelined (page
        pressure, presence row change)."""
        pending = self._pending_bursts
        self._flush_released()
        self._prefill_admitted(self.sched.admit())
        self._advance_chunked_prefill()
        while len(pending) < self.PIPELINE_DEPTH:
            d = self._dispatch_chained(n, pending[-1] if pending else None)
            if d is None:
                break
            pending.append(d)
        if pending:
            self._process_burst_result(pending.popleft())
        elif self._decode_ready():
            # could not dispatch with an empty pipeline (page pressure /
            # presence row change): exact synchronous path, including
            # preemption
            self.step_burst(n)

    def _run_pipelined(self, burst: int) -> None:
        """Drain all work with up to PIPELINE_DEPTH decode bursts in
        flight (see the block comment above)."""
        while self.sched.has_work or self._pending_bursts:
            if not (self._pending_bursts or self._decode_ready()
                    or self.sched.waiting or self._prefilling):
                return
            self.step_pipelined(burst)

    def step_speculative(self) -> None:
        """One speculative iteration: the draft model proposes spec_tokens
        greedily in an on-device burst, the target verifies the whole span
        in ONE forward (llama.verify_step — one KV-cache stream instead of
        spec_tokens of them), accepted tokens are emitted and rejected
        ones rolled back with a lengths reset. Output is bit-identical to
        plain greedy decoding of the target model."""

        self._flush_released()
        self._prefill_admitted(self.sched.admit())
        self._advance_chunked_prefill()
        active = self._decode_ready()
        if not active:
            return
        # The span's KV writes land at positions base..base+k-1; they must
        # stay inside every request's block-table capacity (a clamped
        # overflow write would corrupt the request's OWN live last page —
        # unlike burst overruns, a speculative rejection keeps the request
        # alive on that corrupted state). Cap by the tightest headroom,
        # bucketed to powers of two to bound retraces.
        capacity = self.sched.pages_per_seq * self.page_size
        headroom = min(capacity - (r.total_len - 1) for r in active)
        k = min(self.spec_tokens, headroom)
        if k < 2:  # no room to speculate: plain step already admitted above
            self._decode_active(active)
            return
        k = 1 << (k.bit_length() - 1) if k < self.spec_tokens else k

        slots, tokens, scratch = self._pad_batch(active)
        nb = len(slots)
        pad_rows = nb - len(active)
        nact = len(active)
        slots_j = jnp.asarray(slots)
        toks_j = jnp.asarray(tokens)
        from mfa_tpu.serve.sampling import speculative_accept, token_logprobs

        if self.sampling.greedy:
            # DEVICE-FUSED greedy speculative burst: draft + verify +
            # acceptance + rollback for n_iters iterations in one jitted
            # scan, ONE host sync for the lot. The host-stepped loop
            # below (kept for sampled rejection) pays 2+ tunnel RTTs per
            # iteration — measured 65 ms/iteration vs ~6 ms of device
            # compute at the 4-layer slice shape. Worst case every
            # iteration accepts all k, so n_iters is capped by the page
            # headroom and bucketed to bound retraces.
            n_iters = max(1, min(4, headroom // k))
            n_iters = 1 << (n_iters.bit_length() - 1)
            self._map_new_pages(n_iters * k)
            (self.cache, self.draft_cache, t_dev, lp_dev, ne_dev,
             m_dev) = llama.speculative_burst(
                self.params, self.draft_params, self.cfg,
                self.draft_cfg, self.cache, self.draft_cache,
                slots_j, toks_j, k, n_iters, mesh=self.mesh,
            )
            # ONE batched device->host transfer (each np.asarray is its
            # own ~30 ms tunnel round trip; 4 of them dominated the
            # steady-state call)
            t_np, lp_np, ne_np, m_np = jax.device_get(
                (t_dev, lp_dev, ne_dev, m_dev))
            self.stats.steps += n_iters
            for i, req in enumerate(active):
                for it in range(n_iters):
                    if req.done:
                        break  # junk iterations past eos (slot released)
                    self.stats.spec_proposed += k
                    self.stats.spec_accepted += int(m_np[it, i])
                    for j in range(int(ne_np[it, i])):
                        if req.done:
                            break
                        req.generated.append(int(t_np[it, i, j]))
                        req.logprobs.append(float(lp_np[it, i, j]))
                        self.stats.decode_tokens += 1
                if req.done:
                    # device lengths overran past eos; _finish releases
                    # the slot wholesale so the junk rows are dead
                    self._finish(req)
            if scratch is not None:
                self._to_release.append(scratch)
            return
        self._map_new_pages(k)

        # sampled rejection path (host-stepped): keep the per-step draft
        # distributions for the rejection-sampling acceptance rule
        self._key, sub = jax.random.split(self._key)
        self.draft_cache, d_toks, _, d_logits = llama.decode_burst(
            self.draft_params, self.draft_cfg, self.draft_cache,
            slots_j, toks_j, k, sampling=self.sampling, key=sub,
            return_logits=True,
        )  # [k, nb], [k, nb, vocab]
        # target verifies [t_cur, d_1..d_{k-1}] in one forward
        feed = jnp.concatenate([toks_j[None], d_toks[:-1]], axis=0).T  # [nb, k]
        self.cache, logits = llama.verify_step(
            self.params, self.cfg, self.cache, slots_j, feed, mesh=self.mesh,
        )
        vocab = logits.shape[-1]
        # rejection sampling (Leviathan/Chen): accepted stream is
        # distributed exactly like plain sampling from the target
        self._key, ka = jax.random.split(self._key)
        t_dev, m_dev = speculative_accept(
            ka, jnp.transpose(d_logits, (1, 0, 2)), logits,
            jnp.transpose(d_toks), self.sampling,
        )
        t_np = np.asarray(t_dev)
        m_np = np.asarray(m_dev)
        lp_np = np.asarray(
            token_logprobs(logits.reshape(-1, vocab),
                           t_dev.reshape(-1))
        ).reshape(t_np.shape)

        # emitted tokens + rollback lengths per row
        new_lens = np.zeros((nb,), np.int32)
        emitted = []
        for i, req in enumerate(active):
            base = req.total_len - 1  # cache length before this step
            m = int(m_np[i])
            n_emit = m + 1 if m < k else k
            toks_out = [int(t) for t in t_np[i, :n_emit]]
            lps_out = [float(x) for x in lp_np[i, :n_emit]]
            new_lens[i] = base + n_emit if m < k else base + k
            emitted.append((toks_out, lps_out))
            self.stats.spec_proposed += k
            self.stats.spec_accepted += m
        for i in range(nact, nb):
            new_lens[i] = 0  # scratch rows
        self.cache = llama.rollback(self.cache, slots, new_lens)
        self.draft_cache = llama.rollback(self.draft_cache, slots, new_lens)
        if scratch is not None:
            self._to_release.append(scratch)

        self.stats.steps += 1
        for req, (toks_out, lps_out) in zip(active, emitted):
            for t, lp in zip(toks_out, lps_out):
                if req.done:
                    break
                req.generated.append(int(t))
                req.logprobs.append(float(lp))
                self.stats.decode_tokens += 1
            if req.done:
                self._finish(req)

    def _finish(self, req: Request) -> None:
        slot = req.slot
        self.sched.finish(req)
        self._to_release.append(slot)

    def _flush_released(self) -> None:
        """Batched device-metadata clear of finished slots (see
        _to_release). One scatter pair regardless of how many requests
        finished since the last flush; a no-op when none did."""
        if not self._to_release:
            return
        from mfa_tpu.cache.paged_cache import release_slots

        slots = self._to_release
        self._to_release = []
        self.cache = release_slots(self.cache, slots)
        if self.draft_cache is not None:
            self.draft_cache = release_slots(self.draft_cache, slots)

    def recover(self) -> int:
        """Reset device state after a failed step and requeue in-flight
        requests (restartable batches; the reference has no failure
        handling at all, SURVEY.md §5). Generated tokens are kept; the KV
        is rebuilt by re-prefilling on re-admission. Returns the number of
        requeued requests."""
        self._prefilling.clear()
        self._to_release.clear()  # the rebuilt caches start zeroed
        if self._pres_dev is not None:
            self._pres_dev = jnp.zeros_like(self._pres_dev)
        self._pending_bursts.clear()  # stale futures die with the state
        active = sorted(self.sched.active.values(), key=lambda r: r.uid)
        for req in list(active):
            req.inflight = 0  # any in-flight burst dies with the state
            self.sched.finish(req)
        if self.sched.prefix is not None:
            # The rebuilt device caches wipe page contents; stale shared
            # pages must never be aliased by future admissions. All refs
            # are gone now that every in-flight request is requeued, so
            # the entire cache is idle and evictable.
            self.sched.prefix.evict(10**9, self.sched.allocator)
        # Fresh device cache state (old buffers may hold poisoned data).
        c0 = self.cache
        cache = llama.build_kv_caches(
            self.cfg, c0.num_pages, c0.page_size, c0.max_seqs,
            c0.pages_per_seq, c0.quant_dtype,
        )
        if self.mesh is not None:
            cache = jax.device_put(
                cache, llama.cache_shardings(self.cfg, cache, self.mesh)
            )
        self.cache = cache
        if self.draft_cache is not None:
            d0 = self.draft_cache
            self.draft_cache = llama.build_kv_caches(
                self.draft_cfg, d0.num_pages, d0.page_size, d0.max_seqs,
                d0.pages_per_seq, d0.quant_dtype,
            )
        for req in reversed(active):
            self.sched.waiting.appendleft(req)
        self.stats.recoveries += 1
        return len(active)

    def run(self, max_retries: int = 0, burst: int = 1,
            pipeline: bool = True) -> EngineStats:
        """Drain all work. With max_retries > 0, a failing step triggers
        recover() and the batch restarts, up to the retry budget. With
        burst > 1, up to `burst` decode steps run fused on-device between
        host syncs (see step_burst), and by default (pipeline=True) up to
        PIPELINE_DEPTH bursts stay in flight so token readback and host
        bookkeeping overlap device compute (_run_pipelined)."""
        t0 = time.time()
        retries = 0
        while self.sched.has_work:
            try:
                if self.draft_cache is not None:
                    self.step_speculative()
                elif burst > 1 and pipeline:
                    self._run_pipelined(burst)
                elif burst > 1:
                    self.step_burst(burst)
                else:
                    self.step()
            except Exception:
                if retries >= max_retries:
                    raise
                retries += 1
                self.recover()
        # accumulate: token counters span every run() call of this engine,
        # so the denominator must too (repeated drain cycles otherwise
        # over-report tokens/s)
        self.stats.wall_s += time.time() - t0
        return self.stats
