"""Headline benchmark: Llama-2-7B INT4 decode tokens/s per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline = 190 tok/s/chip (85% of the INT4 HBM roofline on v5e spec
819 GB/s, BASELINE.md). On hosts where the chip is tunneled, effective
HBM bandwidth is far below spec; the absolute number reflects the chip
actually measured.

Weights are checkpoint-shaped (7B: 32 layers, hidden 4096, inter 11008,
32 heads) but materialized on-device (dummy values) so the benchmark
measures the execution path, not checkpoint download.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

BASELINE_TOK_S = 190.0


def build_7b_params(model):
    import jax.numpy as jnp
    from vllm_quick_tpu.ops.quant_formats import dummy_quantized_weight
    from vllm_quick_tpu.model_executor.layers.linear import LinearWeights

    e = model.hidden_size
    inter = model.config.intermediate_size
    q_sz = model.num_heads * model.head_dim
    kv_sz = model.num_kv_heads * model.head_dim

    def q(k, n, shard):
        return LinearWeights(qw=dummy_quantized_weight(k, n), shard=shard)

    layers = []
    for _ in range(model.num_layers):
        layers.append({
            "input_norm": jnp.ones((e,), jnp.bfloat16),
            "post_norm": jnp.ones((e,), jnp.bfloat16),
            "qkv": q(e, q_sz + 2 * kv_sz, "col"),
            "o": q(q_sz, e, "row"),
            "gate_up": q(e, 2 * inter, "col"),
            "down": q(inter, e, "row"),
        })
    embed = jnp.zeros((model.vocab_size, e), jnp.bfloat16)
    # BENCH_LMHEAD=int8 A/Bs the per-column int8 PTQ head (halves the
    # 0.26 GB bf16 stream; ops/dense_matmul.py int8 variant).
    # int8 default: on-chip A/B measured 160.46 vs 156.28 tok/s (round
    # 4), ppl-gated by tests/test_perplexity.py::test_int8_lm_head_ppl_delta.
    if os.environ.get("BENCH_LMHEAD", "int8") == "int8":
        import numpy as _np
        from vllm_quick_tpu.ops.dense_matmul import quantize_cols_i8
        rng = _np.random.default_rng(0)
        wi8, s = quantize_cols_i8(
            rng.standard_normal((e, model.vocab_size)).astype(_np.float32)
            * 0.02)
        lm_head = {"wi8": wi8, "s": s}
    else:
        lm_head = jnp.zeros((e, model.vocab_size), jnp.bfloat16)
    return {"embed": embed, "layers": layers,
            "final_norm": jnp.ones((e,), jnp.bfloat16),
            "lm_head": lm_head}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformers import LlamaConfig

    from vllm_quick_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
    from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=32, max_position_embeddings=4096,
        rms_norm_eps=1e-6, tie_word_embeddings=False)

    class _Q:
        method = "awq"
        group_size = 128
        desc_act = False

    model = LlamaForCausalLM(cfg, quant=_Q(), dtype="bfloat16")
    params = build_7b_params(model)

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    ctx_len = int(os.environ.get("BENCH_CTX", "512"))
    # fp8 KV + block 32 is the default: round-3 battery measured it
    # faster at every batch size (153.4 vs 151.1 batch-1, 1723 vs 1322
    # batch-32) — matching the serving default (docs/engine_args.md).
    block_size = int(os.environ.get("BENCH_BLOCK", "32"))
    # Multi-step mode advances positions in-graph; cover the overhang
    # so block-table reads stay in bounds (the engine's lookahead
    # reservation plays this role in serving).
    _ksteps = int(os.environ.get("BENCH_DECODE_STEPS", "1"))
    blocks_per_seq = -(-(ctx_len + _ksteps) // block_size)
    num_blocks = 1 + batch * blocks_per_seq

    kv_dtype = {"bfloat16": jnp.bfloat16,
                "fp8_e5m2": jnp.float8_e5m2}[
                    os.environ.get("BENCH_KV_DTYPE", "fp8_e5m2")]
    shape = model.kv_cache_shape(num_blocks, block_size)
    caches = [jnp.zeros(shape, kv_dtype)
              for _ in range(model.num_layers)]

    bt = np.zeros((batch, blocks_per_seq), np.int32)
    for i in range(batch):
        bt[i] = 1 + i * blocks_per_seq + np.arange(blocks_per_seq)
    pos = ctx_len - 1
    slots = bt[:, pos // block_size] * block_size + pos % block_size
    meta = InputMetadata(
        is_prompt=False,
        slot_mapping=jnp.asarray(slots.astype(np.int32)),
        context_lens=jnp.full((batch,), ctx_len, jnp.int32),
        block_tables=jnp.asarray(bt),
    )
    ids = jnp.zeros((batch,), jnp.int32)
    positions = jnp.full((batch,), pos, jnp.int32)
    plens = jnp.zeros((batch,), jnp.int32)

    def _step(params, input_ids, positions, kv_caches, meta, prompt_lens):
        hidden, new_caches = model.forward(params, input_ids, positions,
                                           kv_caches, meta)
        logits = model.compute_logits(params, hidden)
        return logits, new_caches

    # BENCH_PREFILL=1 measures the prompt step instead: one full-length
    # causal prefill (flash kernel path) at BENCH_CTX, reported as
    # prompt tokens/s — the VERDICT r2 item-3 prefill row.
    if os.environ.get("BENCH_PREFILL"):
        l = ctx_len
        p_ids = jnp.zeros((batch, l), jnp.int32)
        p_pos = jnp.tile(jnp.arange(l, dtype=jnp.int32)[None, :],
                         (batch, 1))
        slots = np.zeros((batch, l), np.int32)
        for i in range(batch):
            for p in range(l):
                slots[i, p] = bt[i, p // block_size] * block_size \
                    + p % block_size
        p_meta = InputMetadata(
            is_prompt=True, slot_mapping=jnp.asarray(slots),
            prompt_lens=jnp.full((batch,), l, jnp.int32))

        def _prefill(params, ids2, pos2, kv_caches):
            hidden, new_caches = model.forward(params, ids2, pos2,
                                               kv_caches, p_meta)
            logits = model.compute_logits(params, hidden[:, -1])
            return logits, new_caches

        pstep = jax.jit(_prefill, donate_argnums=(3,))
        logits, caches = pstep(params, p_ids, p_pos, caches)
        fetched = np.asarray(logits)
        t0 = time.perf_counter()
        fetched = np.asarray(logits)
        fetch_rtt = time.perf_counter() - t0
        iters = int(os.environ.get("BENCH_ITERS", "8"))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                logits, caches = pstep(params, p_ids, p_pos, caches)
            fetched = np.asarray(logits)
            dt = min(dt, time.perf_counter() - t0 - fetch_rtt)
        tok_s = iters * batch * l / dt
        print(json.dumps({
            "metric": f"llama2_7b_int4_prefill_tok_s_ctx{ctx_len}",
            "value": round(tok_s, 1),
            "unit": "prompt tokens/s",
            "step_ms": round(dt / iters * 1e3, 2),
        }))
        return

    # BENCH_DECODE_STEPS=K measures the engine's multi-step decode
    # program (--num-decode-steps): K chained step+greedy-sample
    # iterations per dispatch, slot mapping recomputed in-graph —
    # one host round trip per K tokens.
    ksteps = int(os.environ.get("BENCH_DECODE_STEPS", "1"))
    if ksteps > 1:
        bt_dev = jnp.asarray(bt)
        rows_i = jnp.arange(batch)

        def _multi(params, input_ids, positions, kv_caches, ctx0):
            # The aliased fused rope+write+attend kernel inside a SCAN
            # carry forces XLA into per-iteration cache copies (r4:
            # multi-step compile blew past 20 min) — but an UNROLLED
            # chain is a straight-line graph where each intermediate
            # cache is consumed exactly once, so the in-place custom
            # call aliases safely (same situation as the single-step
            # donate path). Only the scan body traces unfused. Env is
            # read at trace time only.
            unroll = bool(os.environ.get("BENCH_MULTI_UNROLL"))
            if not unroll:
                os.environ["VLLM_TPU_NO_FUSED_ATTN_RW"] = "1"

            def body(carry, _):
                tok, p, ctx, caches = carry
                blocks = bt_dev[rows_i, p // block_size]
                m = InputMetadata(
                    is_prompt=False,
                    slot_mapping=blocks * block_size + p % block_size,
                    context_lens=ctx, block_tables=bt_dev)
                logits, caches = _step(params, tok, p, caches, m, None)
                nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)
                return (nxt, p + 1, ctx + 1, caches), nxt

            try:
                if unroll:
                    # Python-unrolled chain (the breakdown's repetition
                    # slope measures ~0.8 ms/step faster than lax.scan,
                    # and the fused attention kernel stays enabled).
                    carry = (input_ids, positions, ctx0, kv_caches)
                    toks = []
                    for _ in range(ksteps):
                        carry, nxt = body(carry, None)
                        toks.append(nxt)
                    return jnp.stack(toks), carry[3]
                carry, toks = jax.lax.scan(
                    body, (input_ids, positions, ctx0, kv_caches),
                    None, length=ksteps)
                return toks, carry[3]
            finally:
                os.environ.pop("VLLM_TPU_NO_FUSED_ATTN_RW", None)

        multi = jax.jit(_multi, donate_argnums=(3,))

    step = jax.jit(_step, donate_argnums=(3,))

    # Warm up / compile. NOTE: on tunneled backends block_until_ready
    # can return before execution finishes — a host fetch (np.asarray)
    # is the only true drain, so the loop is timed enqueue-to-fetch and
    # the standalone fetch round-trip is subtracted.
    iters = int(os.environ.get("BENCH_ITERS", "32"))
    if ksteps > 1:
        ctx0 = jnp.full((batch,), ctx_len, jnp.int32)
        toks, caches = multi(params, ids, positions, caches, ctx0)
        fetched = np.asarray(toks)
        t0 = time.perf_counter()
        fetched = np.asarray(toks)
        fetch_rtt = time.perf_counter() - t0
        dt = float("inf")
        n_disp = max(1, iters // ksteps)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_disp):
                toks, caches = multi(params, ids, positions, caches,
                                     ctx0)
            fetched = np.asarray(toks)
            dt = min(dt, time.perf_counter() - t0 - fetch_rtt)
        tok_s = n_disp * ksteps * batch / dt
        step_ms = dt / (n_disp * ksteps) * 1e3
    else:
        logits, caches = step(params, ids, positions, caches, meta,
                              plens)
        fetched = np.asarray(logits)
        t0 = time.perf_counter()
        fetched = np.asarray(logits)
        fetch_rtt = time.perf_counter() - t0

        # Best of 3 trials: the tunnel occasionally injects multi-ms
        # stalls into a whole enqueue window; the minimum estimates the
        # chip.
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                logits, caches = step(params, ids, positions, caches,
                                      meta, plens)
            fetched = np.asarray(logits)
            dt = min(dt, time.perf_counter() - t0 - fetch_rtt)

        tok_s = iters * batch / dt
        step_ms = dt / iters * 1e3

    if os.environ.get("BENCH_BREAKDOWN"):
        _breakdown(model, params, caches, meta, ids, positions, batch,
                   step_ms, fetch_rtt, iters, step_fn=_step)

    print(json.dumps({
        "metric": "llama2_7b_int4_decode_tok_s_per_chip",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
    }))


def _nbytes(tree):
    import jax
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def _breakdown(model, params, caches, meta, ids, positions, batch,
               step_ms, fetch_rtt, iters, step_fn=None):
    """SURVEY §5 roofline reporter: time each step component as its own
    jitted chain at the real shapes and report bytes moved vs achieved
    HBM bandwidth. Printed to stderr; the driver's JSON line is last."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vllm_quick_tpu.model_executor.layers.linear import apply_linear
    from vllm_quick_tpu.ops.cache_ops import reshape_and_cache
    from vllm_quick_tpu.ops.paged_attention import paged_decode_attention

    e = model.hidden_size
    # Chains sample 4 (identical) layers and scale to the full depth —
    # keeps Mosaic compile time bounded while measuring the same tiles.
    n_sample = 4
    scale = model.num_layers / n_sample
    layers = params["layers"][:n_sample]

    import functools

    # Per-dispatch tunnel overhead (~ms) swamps single-chain timings, so
    # every component is measured as the SLOPE between a 1x and a 3x
    # repetition of its chain inside one jit: constants (dispatch,
    # fetch) cancel exactly.
    def slope_ms(make_chain, *args, n=6, r_lo=1, r_hi=2):
        """Best-of-3 slope: each (lo, hi) pair is timed as the MINIMUM
        of 3 enqueue windows — the tunnel injects multi-ms stalls into
        whole windows, which round 3 showed can corrupt a single-shot
        slope into physically impossible rows (VERDICT r3 weak-3)."""
        def run(r):
            fn = jax.jit(functools.partial(make_chain, repeat=r))
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(*args)
                np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
                best = min(best, (time.perf_counter() - t0) / n * 1e3)
            return best
        lo, hi = run(r_lo), run(r_hi)
        return max((hi - lo) / (r_hi - r_lo), 1e-3)

    # 1) Quantized GEMMs: the exact per-layer matmul sequence, chained
    #    through the activation so nothing is dead-code-eliminated.
    x0 = jnp.zeros((batch, e), jnp.bfloat16)

    def gemm_chain(x, repeat=1):
        acc = jnp.float32(0)
        for _ in range(repeat):
            for layer in layers:
                qkv = apply_linear(layer["qkv"], x)
                o = apply_linear(layer["o"], qkv[..., :e])
                gu = apply_linear(layer["gate_up"], x + o)
                dn = apply_linear(layer["down"],
                                  gu[..., :gu.shape[-1] // 2])
                acc = acc + jnp.sum(dn.astype(jnp.float32))
                x = x + dn
        return acc

    gemm_ms = slope_ms(gemm_chain, x0, r_lo=1, r_hi=3) * scale
    gemm_bytes = sum(_nbytes(l[k].qw) for l in params["layers"]
                     for k in ("qkv", "o", "gate_up", "down"))

    # 2) Paged attention: 32 chained decode-attention calls.
    q0 = jnp.zeros((batch, model.num_heads, model.head_dim), jnp.bfloat16)

    def attn_chain(q, caches, repeat=1):
        for _ in range(repeat):
            for c in caches:
                out = paged_decode_attention(q, c, meta.block_tables,
                                             meta.context_lens, 1.0)
                q = q + out * 1e-3
        return q

    attn_ms = slope_ms(attn_chain, q0, caches[:n_sample],
                       r_lo=1, r_hi=5) * scale
    ctx = int(np.asarray(meta.context_lens)[0])
    attn_bytes = (model.num_layers * batch * 2 * model.num_kv_heads
                  * ctx * model.head_dim
                  * caches[0].dtype.itemsize)

    # 3) KV-cache writes: 32 per-token scatters per repeat (in-place on
    #    the donated pool inside the jit; the repeat factor multiplies
    #    the dus chain, not pool copies).
    k0 = jnp.zeros((batch, model.num_kv_heads, model.head_dim),
                   jnp.bfloat16)

    def write_chain(k, caches, repeat=1):
        for _ in range(repeat):
            caches = [reshape_and_cache(k, k, c, meta.slot_mapping)
                      for c in caches]
        return caches[0][0, 0, 0, 0, 0]

    write_ms = slope_ms(write_chain, k0, caches[:n_sample],
                        r_lo=1, r_hi=5) * scale

    # 4) LM head: chained unembed at the real vocab.
    h0 = jnp.zeros((batch, e), jnp.bfloat16)

    def lm_chain(h, repeat=1):
        acc = jnp.float32(0)
        for _ in range(repeat):
            logits = model.compute_logits(params, h)
            acc = acc + jnp.sum(logits.astype(jnp.float32))
            h = h + acc.astype(jnp.bfloat16) * 0
        return acc

    lm_ms = slope_ms(lm_chain, h0, r_lo=2, r_hi=4) / 1
    lm_bytes = _nbytes(params["lm_head"])

    # 5) Residual decomposition (VERDICT r2 #6): static op counts from
    #    the compiled step, plus the full step timed as an IN-GRAPH
    #    repetition slope — per-iteration host dispatch cancels in the
    #    slope, so (enqueue-loop step time - slope time) is the host
    #    gap and the slope's excess over the component sum is genuine
    #    on-device overhead (pallas call fixed cost + XLA glue).
    if step_fn is None:
        def step_fn(params, input_ids, positions, kv_caches, meta,
                    prompt_lens):
            hidden, new_caches = model.forward(params, input_ids,
                                               positions, kv_caches,
                                               meta)
            logits = model.compute_logits(params, hidden)
            return logits, new_caches
    _step = step_fn

    import re
    txt = jax.jit(_step).lower(params, ids, positions, caches, meta,
                               jnp.zeros((batch,), jnp.int32)) \
        .compile().as_text()
    n_pallas = len(re.findall(r'custom_call_target="tpu_custom_call"',
                              txt))
    n_fusion = len(re.findall(r"^\s*\S+ = \S+ fusion\(", txt, re.M))

    def step_chain(params, x_ids, x_pos, caches, repeat=1):
        logits = None
        for _ in range(repeat):
            logits, caches = _step(params, x_ids, x_pos, caches, meta,
                                   jnp.zeros((batch,), jnp.int32))
            # Full-vocab argmax: a real data dependency, so no step's
            # lm_head can be dead-code-eliminated between repeats.
            x_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits

    chain_ms = slope_ms(step_chain, params, ids, positions, caches,
                        n=4, r_lo=1, r_hi=3)

    rows = [
        ("quant_gemm(x128)", gemm_ms, gemm_bytes),
        ("paged_attn(x32)", attn_ms, attn_bytes),
        ("kv_write(x32)", write_ms, None),
        ("lm_head", lm_ms, lm_bytes),
    ]
    accounted = gemm_ms + attn_ms + write_ms + lm_ms
    # Physical-validity gate (VERDICT r3 item 8 / r4 item 7): a
    # component can't take longer than the whole step or stream faster
    # than ~1.5x spec HBM. A component SUM exceeding the full step is
    # NOT a glitch: the isolated chains are overlap-free, while in the
    # real step XLA prefetches the next layer's weight stream during
    # the (DMA-issue-bound, bandwidth-idle) attention kernel — the
    # round-4 capture's "negative residuals" were this overlap, so it
    # is now reported as its own row instead of invalidating the
    # capture. What IS invalid: impossible bandwidths, a component
    # exceeding the step, a large negative host gap (in-graph slope
    # slower than the measured dispatch loop), or an accounted sum
    # wildly off the step (< 0.5x or > 1.6x — either means a corrupted
    # timing window).
    _MAX_BW = 1.3e12  # bytes/s; 1.5x the 819 GB/s spec
    capture_ok = True
    print(f"-- step breakdown (batch={batch} ctx={ctx}; full step "
          f"{step_ms:.2f} ms over {iters} iters) --", file=sys.stderr)
    for name, ms, nbytes in rows:
        flags = []
        if ms > step_ms * 1.05:
            flags.append("component > full step")
        if nbytes and nbytes / (ms / 1e3) > _MAX_BW:
            flags.append("> physically possible bandwidth")
        if flags:
            capture_ok = False
        bw = f"{nbytes / ms / 1e6:8.0f} GB/s  ({nbytes / 1e9:.2f} GB)" \
            if nbytes else "        -"
        tag = ("  [GLITCHED: " + "; ".join(flags) + "]") if flags else ""
        print(f"  {name:18s} {ms:7.2f} ms  {bw}{tag}", file=sys.stderr)
    host_gap = step_ms - chain_ms
    overlap = accounted - chain_ms
    if host_gap < -0.3:  # slope noise tolerance; a real loop can't
        capture_ok = False  # beat its own in-graph repetition slope
    if not (0.5 * chain_ms <= accounted <= 1.6 * chain_ms):
        capture_ok = False
    print(f"  {'isolated sum':18s} {accounted:7.2f} ms  "
          f"(overlap-free component chains)", file=sys.stderr)
    print(f"  {'step in-graph':18s} {chain_ms:7.2f} ms  "
          f"(on-device; host gap = {host_gap:+.2f} ms)", file=sys.stderr)
    if overlap >= 0:
        print(f"  {'overlap recovered':18s} {overlap:7.2f} ms  "
              f"(weight prefetch hidden under attention/glue)",
              file=sys.stderr)
    else:
        print(f"  {'device glue':18s} {-overlap:7.2f} ms  "
              f"over {n_pallas} pallas calls + {n_fusion} XLA "
              f"fusions/step", file=sys.stderr)
    print(f"  calls/step: {n_pallas} pallas + {n_fusion} XLA fusions",
          file=sys.stderr)
    print(f"  breakdown-capture: {'OK' if capture_ok else 'INVALID '
          '(glitched rows above; re-run before citing any number)'}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
