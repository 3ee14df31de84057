"""Speculative-decoding worker: draft propose -> target score -> accept.

Completes the orchestration the reference left unfinished (its
MultiStepWorker ran the draft side only; vllm/worker/spec_decode/
multi_step_worker.py:10-60): a small draft model proposes k tokens per
scheduled decode step, the target model scores all k+1 positions in ONE
prefix-attention forward, and modified rejection sampling
(layers/rejection_sampler.py) emits tokens whose distribution exactly
equals the target model's.

TPU-native discipline: the k draft steps chain their sampled token ids
on-device (no per-step host fetch); the scorer runs as a short
is_prompt step over the existing paged context; acceptance runs in one
jit; the host fetches only [B, k+1] token ids + logprobs per step.

Cache invariants: the draft model owns a second KV pool with the SAME
block ids (one scheduler, one block manager), so every scheduler
swap/copy directive is mirrored on both pools. Accepted draft tokens'
KV is already correct in BOTH pools (the draft wrote its own proposals;
the target wrote them during scoring); the one token per step that
differs (recovered/bonus) is always the sequence's new tail, whose KV
both models write when they process it next step.

Supported requests: best_of=1, no beam, plain temperature sampling
(no top-k/p/min-p, no penalties, no logits processors). Other requests
fall back to normal per-token decoding transparently.
"""
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.layers.rejection_sampler import (
    rejection_sample)
from vllm_quick_tpu.sequence import (SamplerOutput, SequenceGroupMetadata,
                                     SequenceGroupOutput, SequenceOutput)
from vllm_quick_tpu.worker.cache_engine import CacheEngine
from vllm_quick_tpu.worker.model_runner import (_BLOCK_TABLE_BUCKETS,
                                                _DECODE_BATCH_BUCKETS,
                                                ModelRunner)
from vllm_quick_tpu.worker.worker import Worker
from vllm_quick_tpu.utils import make_ndarray_with_pad, pad_to_bucket

logger = init_logger(__name__)

_EPS = 1e-20


@jax.jit
def _draft_sample(logits: jax.Array, temps: jax.Array,
                  greedy: jax.Array, key: jax.Array):
    """One draft step's token + full proposal distribution.
    Greedy rows use a one-hot distribution (the temp->0 limit), which
    makes rejection sampling reduce to exact argmax matching."""
    lp = logits.astype(jnp.float32)
    soft = jax.nn.softmax(lp / temps[:, None], axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(lp, axis=-1), lp.shape[-1],
                          dtype=jnp.float32)
    probs = jnp.where(greedy[:, None], hard, soft)
    tok = jax.random.categorical(key, jnp.log(probs + _EPS))
    return tok.astype(jnp.int32), probs


@jax.jit
def _accept(key: jax.Array, draft_probs: jax.Array,
            draft_ids: jax.Array, score_logits: jax.Array,
            temps: jax.Array, greedy: jax.Array):
    """Bonus sampling + rejection sampling + emitted-token logprobs."""
    b, kp1, v = score_logits.shape
    k = kp1 - 1
    lp = score_logits.astype(jnp.float32)
    soft = jax.nn.softmax(lp / temps[:, None, None], axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(lp, axis=-1), v, dtype=jnp.float32)
    target_probs = jnp.where(greedy[:, None, None], hard, soft)
    key_b, key_r = jax.random.split(key)
    bonus = jax.random.categorical(
        key_b, jnp.log(target_probs[:, k] + _EPS)).astype(jnp.int32)
    out, n = rejection_sample(key_r, draft_probs, draft_ids,
                              target_probs[:, :k], bonus)
    lsm = jax.nn.log_softmax(lp, axis=-1)
    tok_lp = jnp.take_along_axis(
        lsm, jnp.maximum(out, 0)[..., None], axis=2)[..., 0]
    return out, n, tok_lp


def _spec_eligible(m: SequenceGroupMetadata) -> bool:
    p = m.sampling_params
    return (not m.is_prompt and len(m.seq_data) == 1
            and not p.use_beam_search and p.best_of == 1
            and p.top_p >= 1.0 - 1e-6 and p.top_k == -1
            and p.min_p == 0.0
            and abs(p.presence_penalty) < 1e-5
            and abs(p.frequency_penalty) < 1e-5
            and abs(p.repetition_penalty - 1.0) < 1e-5
            and not p.logits_processors
            and p.prompt_logprobs is None)


class SpecDecodeWorker(Worker):
    """Worker pairing the target model with a draft model."""

    def __init__(self, *args, draft_model_config=None,
                 num_speculative_tokens: int = 4, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        assert draft_model_config is not None
        from vllm_quick_tpu.parallel.multihost import is_multihost
        assert not is_multihost(), (
            "speculative decoding is single-host for now")
        self.draft_model_config = draft_model_config
        self.k = num_speculative_tokens
        self.draft_runner = ModelRunner(
            draft_model_config, self.parallel_config,
            self.scheduler_config, self.cache_config, ctx=self.ctx,
            mesh=self.mesh)
        self.draft_cache: Optional[CacheEngine] = None
        self._draft_chains: Dict[int, object] = {}
        self._score_chains: Dict[tuple, object] = {}
        self._steps = 0
        self._base_key = jax.random.PRNGKey(
            self.model_config.seed or 0)
        # Telemetry: acceptance bookkeeping.
        self.emitted_tokens = 0
        self.spec_steps = 0

    def load_model(self) -> None:
        super().load_model()
        self.draft_runner.load_model()

    def profile_num_available_blocks(self, block_size, gpu_mem_util,
                                     cpu_swap_space, cache_dtype):
        """Split the KV budget between the target and draft pools
        (they share block ids, so both need the same block count)."""
        target_bs = CacheEngine.get_cache_block_size(
            block_size, cache_dtype, self.model_config,
            self.parallel_config)
        draft_bs = CacheEngine.get_cache_block_size(
            block_size, cache_dtype, self.draft_model_config,
            self.parallel_config)
        n_dev, n_cpu = super().profile_num_available_blocks(
            block_size, gpu_mem_util, cpu_swap_space, cache_dtype)
        shrink = target_bs / (target_bs + draft_bs)
        return int(n_dev * shrink), n_cpu

    def init_cache_engine(self, cache_config) -> None:
        super().init_cache_engine(cache_config)
        self.draft_cache = CacheEngine(cache_config,
                                       self.draft_model_config,
                                       self.parallel_config,
                                       mesh=self.mesh)

    def _apply_cache_directives(self, payload: Dict) -> None:
        super()._apply_cache_directives(payload)
        # Mirror every block move on the draft pool (shared block ids).
        if payload.get("swap_in"):
            self.draft_cache.swap_in(payload["swap_in"])
        if payload.get("swap_out"):
            self.draft_cache.swap_out(payload["swap_out"])
        if payload.get("copy"):
            self.draft_cache.copy(payload["copy"])

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
    ) -> Optional[SamplerOutput]:
        self._apply_cache_directives({
            "swap_in": blocks_to_swap_in,
            "swap_out": blocks_to_swap_out,
            "copy": blocks_to_copy,
        })
        metas = seq_group_metadata_list
        if not metas:
            return None
        if metas[0].is_prompt:
            # Prefill both models (the draft discards its logits but
            # must populate its KV pool).
            payload = self.draft_runner.prepare_step_inputs(metas)
            _, dcaches, _ = self.draft_runner.run_prepared(
                payload, self.draft_cache.device_cache)
            self.draft_cache.device_cache = dcaches
            out, caches = self.model_runner.execute_model(
                metas, self.cache_engine.device_cache)
            self.cache_engine.device_cache = caches
            return out
        if not all(_spec_eligible(m) for m in metas):
            out, caches = self.model_runner.execute_model(
                metas, self.cache_engine.device_cache)
            self.cache_engine.device_cache = caches
            # Keep the draft KV in step: run one draft decode too.
            payload = self.draft_runner.prepare_step_inputs(metas)
            _, dcaches, _ = self.draft_runner.run_prepared(
                payload, self.draft_cache.device_cache)
            self.draft_cache.device_cache = dcaches
            return out
        return self._spec_decode(metas)

    # -- the speculative step ---------------------------------------------

    def _get_draft_chain(self, k: int):
        """All k draft steps + sampling in ONE jitted dispatch.

        The r5 phase profile measured ~7 ms per draft step for a 1B
        model whose device step is ~2 ms: the loop was paying per-step
        dispatch overhead twice per step (forward + sample). The chain
        is python-unrolled (straight-line graph, so the in-place fused
        attention custom call aliases safely — same argument as the
        engine's unrolled multi-step) and all slot/position math is
        data-independent, precomputed on the host as [k, b] arrays.
        """
        fn = self._draft_chains.get(k)
        if fn is not None:
            return fn
        raw_step = self.draft_runner._raw_step

        def _chain(params, ids, pos0, slots_k, ctx0, bt, kv_caches,
                   temps, greedy, key):
            b = ids.shape[0]
            zeros = jnp.zeros((b,), jnp.int32)
            toks, probs_l = [], []
            for i in range(k):
                meta = InputMetadata(
                    is_prompt=False, slot_mapping=slots_k[i],
                    context_lens=ctx0 + i, block_tables=bt)
                logits, kv_caches = raw_step(params, ids, pos0 + i,
                                             kv_caches, meta, zeros)
                tok, probs = _draft_sample(
                    logits, temps, greedy, jax.random.fold_in(key, i))
                toks.append(tok)
                probs_l.append(probs)
                ids = tok
            return (jnp.stack(toks, axis=1),
                    jnp.stack(probs_l, axis=1), kv_caches)

        fn = jax.jit(_chain, donate_argnums=(6,))
        self._draft_chains[k] = fn
        return fn

    def _get_score_chain(self, k: int, b: int):
        """Decode-kernel scorer: the [b, k+1] score window flattened to
        b*(k+1) single-token decode rows, each with its own context
        length (lens+j), so row j attends exactly the positions < its
        own — identical causal semantics to the prefix-prefill scorer
        but riding the paged-decode attention kernel and the m<=64
        streaming quant-matmul path (r5 profile: the prefill-path score
        was ~38 ms vs ~6.3 ms for a decode-shaped step; all rows' KV
        writes in a layer complete before that layer's attention reads,
        so intra-window attention is exact)."""
        key = (k, b)
        fn = self._score_chains.get(key)
        if fn is not None:
            return fn
        raw_step = self.model_runner._raw_step
        kp1 = k + 1

        def _score(params, ids_flat, pos_flat, slots_flat, ctx_flat,
                   bt_rep, kv_caches):
            rows = ids_flat.shape[0]
            zeros = jnp.zeros((rows,), jnp.int32)
            meta = InputMetadata(
                is_prompt=False, slot_mapping=slots_flat,
                context_lens=ctx_flat, block_tables=bt_rep)
            logits, kv_caches = raw_step(params, ids_flat, pos_flat,
                                         kv_caches, meta, zeros)
            return logits.reshape(b, kp1, -1), kv_caches

        fn = jax.jit(_score, donate_argnums=(6,))
        self._score_chains[key] = fn
        return fn

    def _spec_decode(self, metas: List[SequenceGroupMetadata]
                     ) -> SamplerOutput:
        k = self.k
        block_size = self.cache_config.block_size
        sids = [next(iter(m.seq_data)) for m in metas]
        datas = [m.seq_data[s] for m, s in zip(metas, sids)]
        n_real = len(metas)
        b = pad_to_bucket(n_real, _DECODE_BATCH_BUCKETS)
        # The pp schedule slices b into pp microbatches.
        b = max(b, self.ctx.pp_size)

        lens = np.ones(b, np.int64)
        lens[:n_real] = [d.get_len() for d in datas]
        last_ids = np.zeros(b, np.int32)
        last_ids[:n_real] = [d.get_last_token_id() for d in datas]
        temps = np.ones(b, np.float32)
        greedy = np.ones(b, bool)
        for i, m in enumerate(metas):
            t = m.sampling_params.temperature
            greedy[i] = t < 1e-5
            temps[i] = max(t, 1e-5)
        tables = [list(m.block_tables[s])
                  for m, s in zip(metas, sids)] + [[0]] * (b - n_real)
        mb = pad_to_bucket(max(len(t) for t in tables),
                           _BLOCK_TABLE_BUCKETS)
        bt_arr = make_ndarray_with_pad(tables, 0, np.int32, mb)

        def slot_of(row, p):
            tbl = tables[row]
            return tbl[p // block_size] * block_size + p % block_size \
                if row < n_real else 0

        self._steps += 1
        step_key = jax.random.fold_in(self._base_key, self._steps)

        # Flag-gated phase profiler: inserts a host fetch BARRIER after
        # each phase (drafts / score / accept), so only use to ATTRIBUTE
        # time, never to report totals — the barriers add one tunnel
        # round trip per phase.
        import os as _os
        import time as _time
        _prof = bool(_os.environ.get("VLLM_TPU_SPEC_PROFILE"))
        _t0 = _time.perf_counter()

        # The fused one-dispatch draft chain and the decode-kernel
        # scorer trace the runners' RAW (single-device) step; under
        # pp/sp/tp/dp meshes the runners execute sharded/microbatched
        # programs instead, so those paths fall back to per-step
        # run_prepared drafting + the pp-aware prefill scorer.
        single_device = (self.ctx.pp_size * self.ctx.sp_size
                         * self.ctx.tp_size * self.ctx.dp_size
                         * self.ctx.ep_size) == 1

        # 1) k draft steps; token ids chain on device either way.
        if single_device:
            # All k forward+sample steps in ONE dispatch.
            slots_k = np.asarray(
                [[slot_of(r, int(lens[r] - 1 + i)) for r in range(b)]
                 for i in range(k)], np.int32)
            chain = self._get_draft_chain(k)
            draft_ids_m, draft_probs_m, dcaches = chain(
                self.draft_runner.params, jnp.asarray(last_ids),
                jnp.asarray((lens - 1).astype(np.int32)), slots_k,
                jnp.asarray(lens.astype(np.int32)), jnp.asarray(bt_arr),
                self.draft_cache.device_cache, jnp.asarray(temps),
                jnp.asarray(greedy), step_key)
            self.draft_cache.device_cache = dcaches
        else:
            draft_ids = []
            draft_probs = []
            ids_dev = last_ids
            for i in range(k):
                pos = lens - 1 + i
                slots = [slot_of(r, int(pos[r])) for r in range(b)]
                payload = {
                    "is_prompt": np.asarray(0, np.int32),
                    "ids": ids_dev,
                    "pos": np.asarray(pos, np.int32),
                    "prompt_lens": np.zeros(b, np.int32),
                    "slot_mapping": np.asarray(slots, np.int32),
                    "context_lens": np.asarray(lens + i, np.int32),
                    "block_tables": bt_arr,
                }
                logits, dcaches, _ = self.draft_runner.run_prepared(
                    payload, self.draft_cache.device_cache)
                self.draft_cache.device_cache = dcaches
                tok, probs = _draft_sample(
                    logits[:b], jnp.asarray(temps), jnp.asarray(greedy),
                    jax.random.fold_in(step_key, i))
                draft_ids.append(tok)
                draft_probs.append(probs)
                ids_dev = tok
            draft_ids_m = jnp.stack(draft_ids, axis=1)
            draft_probs_m = jnp.stack(draft_probs, axis=1)

        if _prof:
            np.asarray(draft_ids_m[:, -1])
            _t1 = _time.perf_counter()

        # 2) Target scores [last_real, d_0..d_{k-1}] in one forward.
        ids_score = jnp.concatenate(
            [jnp.asarray(last_ids)[:, None], draft_ids_m],
            axis=1)                                          # [B, k+1]
        pos_score = (lens - 1)[:, None] + np.arange(k + 1)[None, :]
        flat_slots = np.asarray(
            [slot_of(r, int(p)) for r in range(b) for p in pos_score[r]],
            np.int32)
        if (not single_device or _os.environ.get(
                "VLLM_TPU_SPEC_SCORE", "decode") == "prefill"):
            # A/B fallback: short prefix-attention prefill over the
            # paged context (the r4 scorer).
            meta = InputMetadata(
                is_prompt=True,
                slot_mapping=flat_slots,             # 1-D: per-token path
                prompt_lens=np.asarray(
                    [k + 1] * n_real + [0] * (b - n_real), np.int32),
                context_lens=np.asarray(lens - 1, np.int32),
                block_tables=bt_arr,
            )
            score = self.model_runner.get_score_step()
            score_logits, caches = score(
                self.model_runner.params, ids_score,
                jnp.asarray(pos_score.astype(np.int32)),
                self.cache_engine.device_cache, meta,
                np.full(b, k + 1, np.int32))
        else:
            score = self._get_score_chain(k, b)
            bt_rep = np.repeat(bt_arr, k + 1, axis=0)
            ctx_flat = (lens[:, None] + np.arange(k + 1)[None, :]) \
                .reshape(-1).astype(np.int32)
            score_logits, caches = score(
                self.model_runner.params, ids_score.reshape(-1),
                jnp.asarray(pos_score.reshape(-1).astype(np.int32)),
                flat_slots, jnp.asarray(ctx_flat), jnp.asarray(bt_rep),
                self.cache_engine.device_cache)
        self.cache_engine.device_cache = caches

        if _prof:
            np.asarray(score_logits[0, 0, 0])
            _t2 = _time.perf_counter()

        # 3) Accept/reject on device; ONE host fetch.
        out, n_emit, tok_lp = _accept(
            jax.random.fold_in(step_key, 10_000),
            draft_probs_m, draft_ids_m,
            score_logits, jnp.asarray(temps), jnp.asarray(greedy))
        out, n_emit, tok_lp = jax.device_get((out, n_emit, tok_lp))
        if _prof:
            _t3 = _time.perf_counter()
            print(f"SPEC_PROFILE k={k} b={b} "
                  f"draft={(_t1 - _t0) * 1e3:.1f}ms "
                  f"score={(_t2 - _t1) * 1e3:.1f}ms "
                  f"accept+fetch={(_t3 - _t2) * 1e3:.1f}ms",
                  flush=True)

        results: SamplerOutput = []
        for row, (m, sid) in enumerate(zip(metas, sids)):
            cnt = int(n_emit[row])
            samples = [
                SequenceOutput(sid, int(out[row, i]),
                               {int(out[row, i]): float(tok_lp[row, i])})
                for i in range(cnt)
            ]
            results.append(SequenceGroupOutput(samples, None,
                                               chained=True))
            self.emitted_tokens += cnt
        self.spec_steps += 1
        return results
