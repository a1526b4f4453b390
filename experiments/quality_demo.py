#!/usr/bin/env python
"""Hermetic quality-retention demonstration.

Trains a miniature Llama (with this framework's own train step) on payload-
recall tasks — the payload must survive compressed inference for recall to
succeed — then measures accuracy through the real compressed path across
compression strengths, bit tiers, and context lengths.

Task shapes (>= 2, per VERDICT #5; round-4 adds needle-at-depth):
  recall    [payload][filler][SEP] -> reproduce the payload.
  multidoc  [m0 doc0 m1 doc1 ...][filler][SEP][m_q] -> reproduce the queried
            doc (multi-document-QA-shaped: the model must retrieve one of
            several competing payloads by its marker).
  needle    [filler_pre][MARK][payload][filler_post][SEP][MARK] -> reproduce
            the payload. The payload sits at --depths fraction of the
            filler — OUTSIDE the prompt-region floor (first min(S/5,128)
            positions) and OUTSIDE the recency window (last T/4), so
            neither positional safety net can keep it: only an
            attention-guided importance term can (round-3 VERDICT task #1
            — the round-3 longctx artifact was carried by the floor;
            position_only_scores scored 1.000 there, so it no longer
            discriminated the attention mechanism).

Why this matters: random-weight models score 0 on any text metric, and this
environment has no network for real checkpoints. This demo yields genuine
quality-vs-compression curves offline, and it stresses exactly the
mechanism the framework claims: payloads sit in the prompt region, so
prompt-guided importance scoring must keep those tokens through 2/4/8-bit
quantization and token dropping for recall to survive.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEP = 1
N_DOCS = 4


def make_batch(rng_key, batch, payload_len, filler_len, vocab, task,
               depth=0.5):
    """Returns (full_ids, prompt_len, payload[batch, payload_len]).

    `depth` applies to the needle task only: the payload's position as a
    fraction of the filler (0 = head, 1 = tail). Shapes are depth-invariant
    (pre + post = filler_len), so one compiled program serves every depth.
    """
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(rng_key, 3)
    lo = 2 + N_DOCS  # ids [2, 2+N_DOCS) are doc markers
    if task == "recall":
        payload = jax.random.randint(k1, (batch, payload_len), lo, vocab - 2)
        filler = jax.random.randint(k2, (batch, filler_len), lo, vocab - 2)
        sep_col = jnp.full((batch, 1), SEP, jnp.int32)
        full = jnp.concatenate([payload, filler, sep_col, payload], axis=1)
        return full, payload_len + filler_len + 1, payload
    if task == "needle":
        # [filler_pre][MARK][payload][filler_post][SEP][MARK][payload].
        # MARK (= first doc-marker id, unused by this task otherwise) is
        # unique in the sequence; payload tokens come from a reserved range
        # (per-row permutation, no repeats) and filler from a disjoint
        # range, so the retrieval chain (induction: MARK -> token after the
        # earlier MARK -> ...) is unambiguous. The model must find the
        # needle by CONTENT; nothing positional marks it.
        doc_range = N_DOCS * payload_len
        mid = lo + doc_range
        assert mid < vocab - 2, "vocab too small for distinct needle tokens"
        perm = jax.vmap(lambda k: jax.random.permutation(k, doc_range))(
            jax.random.split(k1, batch))
        payload = (lo + perm[:, :payload_len]).astype(jnp.int32)
        pre = int(round(depth * filler_len))
        post = filler_len - pre
        f_pre = jax.random.randint(k2, (batch, pre), mid, vocab - 2)
        f_post = jax.random.randint(k3, (batch, post), mid, vocab - 2)
        mark = jnp.full((batch, 1), 2, jnp.int32)
        sep_col = jnp.full((batch, 1), SEP, jnp.int32)
        full = jnp.concatenate(
            [f_pre, mark, payload, f_post, sep_col, mark, payload], axis=1)
        return full, filler_len + payload_len + 3, payload
    # multidoc: marker-tagged docs, query by marker after the filler. Doc
    # tokens are a per-row PERMUTATION of a reserved range (no token occurs
    # twice anywhere in the prompt) and filler draws from a disjoint range,
    # so the retrieval copy-chain (induction on the previous token) is
    # unambiguous — the difficulty is selecting the right doc among
    # competitors, not resolving token collisions.
    doc_range = N_DOCS * payload_len
    mid = lo + doc_range
    assert mid < vocab - 2, "vocab too small for distinct doc tokens"
    perm = jax.vmap(lambda k: jax.random.permutation(k, doc_range))(
        jax.random.split(k1, batch))
    docs = (lo + perm).reshape(batch, N_DOCS, payload_len)
    filler = jax.random.randint(k2, (batch, filler_len), mid, vocab - 2)
    qidx = jax.random.randint(k3, (batch,), 0, N_DOCS)
    parts = []
    for d in range(N_DOCS):
        parts.append(jnp.full((batch, 1), 2 + d, jnp.int32))
        parts.append(docs[:, d])
    target = jnp.take_along_axis(docs, qidx[:, None, None], axis=1)[:, 0]
    q_col = (2 + qidx)[:, None].astype(jnp.int32)
    sep_col = jnp.full((batch, 1), SEP, jnp.int32)
    full = jnp.concatenate(parts + [filler, sep_col, q_col, target], axis=1)
    prompt_len = N_DOCS * (payload_len + 1) + filler_len + 2
    return full, prompt_len, target


def train_recall_model(mcfg, task, steps, batch, payload_len, filler_lens,
                       lr=3e-3, log_every=200, use_flash=False,
                       curriculum_frac=0.4):
    """Train on the task with filler length cycling over the sweep values
    (so long-context eval is in-distribution).

    Curriculum: the first `curriculum_frac` of steps use only the SHORTEST
    filler. Measured necessity (round 3): multidoc's 2-hop retrieval never
    forms when 3/4 of gradient steps are at lengths where the mechanism
    doesn't yet exist (loss pinned at ln(doc_range) ≈ 3.47 through 800
    mixed-length steps); once the mechanism forms at short fillers, cycling
    the full sweep teaches length robustness."""
    import jax

    from realtime_kv_cache_compression_tpu.models import llama, train

    import jax.numpy as jnp

    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    optimizer = train.make_optimizer(lr=lr, total_steps=steps)
    opt_state = optimizer.init(params)
    step_fn = jax.jit(lambda p, o, ids, m: train.train_step(
        p, o, ids, mcfg, optimizer, use_flash=use_flash, loss_mask=m))
    import numpy as np

    key = jax.random.PRNGKey(42)
    loss = None
    filler_lens = sorted(filler_lens)
    warm = int(steps * curriculum_frac)
    # Needle: CONTINUOUS random payload depth per step. Measured necessity:
    # a 6-point depth cycle let the model memorize the grid positions
    # instead of learning content-based retrieval — training loss 0.001,
    # yet eval at held-out depths 0.25/0.5 scored ~0.04 while the trained
    # depth 0.75 scored 0.996. A fresh uniform depth every step leaves
    # position useless as a feature.
    depth_rng = np.random.RandomState(7)
    for i in range(steps):
        key, sub = jax.random.split(key)
        filler = (filler_lens[0] if i < warm
                  else filler_lens[i % len(filler_lens)])
        depth = (float(depth_rng.uniform(0.05, 0.95)) if task == "needle"
                 else 0.5)
        ids, prompt_len, _ = make_batch(sub, batch, payload_len, filler,
                                        mcfg.vocab_size, task, depth=depth)
        # Supervise only the recalled span (SFT-style): at long fillers an
        # unmasked mean loss is ~100% unpredictable filler and the payload
        # gradient vanishes with 1/S.
        tpos = jnp.arange(ids.shape[1] - 1)
        mask = jnp.broadcast_to(
            (tpos >= prompt_len - 1) & (tpos < prompt_len - 1 + payload_len),
            (ids.shape[0], ids.shape[1] - 1))
        params, opt_state, loss = step_fn(params, opt_state, ids, mask)
        if i % log_every == 0:
            print(f"  [{task}] step {i}: loss {float(loss):.4f}", flush=True)
    print(f"  [{task}] final loss {float(loss):.4f}", flush=True)
    return params


def recall_accuracy(params, mcfg, ccfg, task, n_eval, payload_len, filler_len,
                    seed=123, use_flash=False, eval_batch=None, depth=0.5):
    """Exact-token recall rate through prefill+decode (compressed if ccfg).

    `eval_batch` chunks the eval samples (long contexts: the baseline's
    dense attention scores scale with batch x S^2); `use_flash` routes both
    arms through the flash prefill kernel."""
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.models import llama

    key = jax.random.PRNGKey(seed + filler_len)
    ids, prompt_len, payload = make_batch(key, n_eval, payload_len,
                                          filler_len, mcfg.vocab_size, task,
                                          depth=depth)
    prompt = ids[:, :prompt_len]
    eval_batch = eval_batch or n_eval
    outs, summary = [], None
    for i in range(0, n_eval, eval_batch):
        chunk = prompt[i:i + eval_batch]
        if ccfg is not None:
            out, stats = llama.generate(params, chunk, mcfg, ccfg,
                                        max_new_tokens=payload_len,
                                        use_flash=use_flash)
            if summary is None:
                from realtime_kv_cache_compression_tpu.compression import (
                    summarize_layer_stats)
                summary = summarize_layer_stats(stats)
        else:
            logits, kv = llama.prefill_uncompressed(params, chunk, mcfg,
                                                    use_flash=use_flash)
            pad_len = chunk.shape[1] + payload_len
            kv = tuple(jnp.pad(a, ((0, 0), (0, 0),
                                   (0, pad_len - a.shape[2]),
                                   (0, 0), (0, 0))) for a in kv)
            tok = jnp.argmax(logits, axis=-1)
            pos = jnp.full((chunk.shape[0],), chunk.shape[1], jnp.int32)
            rest, _, _ = llama.decode_loop_uncompressed(
                params, tok, kv, pos, payload_len - 1, mcfg)
            out = jnp.concatenate([tok[:, None], rest], axis=1)
        outs.append(out)
    out = jnp.concatenate(outs, axis=0)
    acc = float((out == payload).mean())
    em = float((out == payload).all(axis=1).mean())
    return {"token_accuracy": acc, "exact_match": em,
            "compression": summary}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--tasks", default="recall,multidoc")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--payload", type=int, default=8)
    ap.add_argument("--fillers", default="48,112,240",
                    help="comma list of filler lengths (context sweep)")
    ap.add_argument("--eval-fillers", default=None,
                    help="eval-only filler list (default: same as --fillers;"
                         " pass longer values to probe length extrapolation"
                         " beyond the trained sweep)")
    ap.add_argument("--depths", default="0.25,0.5,0.75",
                    help="needle-task payload depths (fractions of the "
                         "filler) — each becomes its own eval row")
    ap.add_argument("--flash", action="store_true",
                    help="flash attention everywhere: our prompt-mass flash"
                         " kernel in eval, the library flash kernel (which"
                         " carries a VJP) in training — long contexts never"
                         " materialize S^2")
    ap.add_argument("--lr", type=float, default=3e-3,
                    help="training lr (multidoc learns best ~1e-3)")
    ap.add_argument("--model-layers", type=int, default=4,
                    help="depth of the trained mini-Llama (multidoc's 2-hop"
                         " retrieval needs >= 6)")
    ap.add_argument("--model-width", type=int, default=128,
                    help="hidden size in whole 32-wide heads (multidoc at "
                         ">= 1K filler needs >= 256: the r4 6-layer/128-wide"
                         " instance's baseline decayed to 0.895 at 1K —"
                         " VERDICT r4 item 4)")
    ap.add_argument("--eval-batch", type=int, default=None,
                    help="chunk eval samples (long contexts: baseline dense"
                         " scores scale with batch x S^2)")
    ap.add_argument("--eval-samples", type=int, default=64)
    ap.add_argument("--min-baseline", type=float, default=0.95,
                    help="drop a context row (as uninformative) when the "
                         "uncompressed baseline scores below this — such "
                         "rows measure the toy model, not compression")
    ap.add_argument("--arms", default=None,
                    help="comma list to restrict the config arms")
    ap.add_argument("--max-positions", type=int, default=None)
    ap.add_argument("--params-dir", default=None,
                    help="reuse trained params: load from "
                         "PARAMS_DIR/<task> if present, else train and "
                         "save there (orbax)")
    ap.add_argument("--output-dir", default="experiments/results/quality_demo")
    ap.add_argument("--merge-existing", action="store_true",
                    help="keep rows already in output-dir/quality_demo.json "
                    "(new rows overwrite by key); prior runs' meta blocks "
                    "are preserved under meta_prior_runs for traceability")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import realtime_kv_cache_compression_tpu as rtc

    fillers = [int(f) for f in args.fillers.split(",")]
    eval_fillers = ([int(f) for f in args.eval_fillers.split(",")]
                    if args.eval_fillers else fillers)
    tasks = args.tasks.split(",")
    max_pos = args.max_positions or (
        max(fillers + eval_fillers)
        + (args.payload + 1) * (N_DOCS + 2) + 16)
    # Width scales in whole 32-wide heads (flash kernels tile d=32
    # cleanly); --model-width 128 reproduces the r3/r4 instances.
    n_heads = max(2, args.model_width // 32)
    mcfg = rtc.tiny_test_model(vocab_size=64, hidden_size=args.model_width,
                               intermediate_size=2 * args.model_width,
                               num_layers=args.model_layers,
                               num_heads=n_heads,
                               num_kv_heads=max(1, n_heads // 2),
                               head_dim=32,
                               max_position_embeddings=max_pos)

    def cc(**kw):
        base = dict(num_layers=mcfg.num_layers, high_precision_bits=8,
                    medium_precision_bits=4, low_precision_bits=2)
        base.update(kw)
        return rtc.CompressionConfig(**base)

    arms = {
        "baseline_fp": None,
        "conservative": cc(early_layer_ratio=0.9, middle_layer_ratio=0.8,
                           later_layer_ratio=0.7, high_precision_bits=16,
                           medium_precision_bits=8, low_precision_bits=4),
        # Default = recency position bias + prompt-region floor (the
        # round-3 long-context fix).
        "balanced_8_4_2": cc(),
        # --- long-context lever ablation (round-3 fix isolation) ---
        # Round-2 default: log position bias, no floor. At filler >= 1024
        # this arm collapses (committed round-2 artifact: 0.13 token acc)
        # — kept as the regression witness.
        "balanced_log_bias": cc(position_bias_mode="log",
                                prompt_region_floor=0.0),
        # Each lever alone:
        "balanced_recency_only": cc(prompt_region_floor=0.0),
        "balanced_floor_only": cc(position_bias_mode="log"),
        # The reference's committed operating point (~0.45 kept): VERDICT #5.
        # reference_anchor_config pins position_bias_mode="log" (parity).
        "reference_anchor": rtc.reference_anchor_config(
            num_layers=mcfg.num_layers),
        # The reference's operating point with OUR levers applied: beats
        # the reference formula at its own retention.
        "anchor_with_fixes": rtc.reference_anchor_config(
            num_layers=mcfg.num_layers, position_bias_mode="recency",
            prompt_region_floor=1.0),
        "aggressive": cc(early_layer_ratio=0.6, middle_layer_ratio=0.4,
                         later_layer_ratio=0.3),
        # Attention-sink anchors (config.sink_tokens): same aggressive
        # budget, first 16 positions pinned to the HIGH tier.
        "aggressive_sink16": cc(early_layer_ratio=0.6,
                                middle_layer_ratio=0.4,
                                later_layer_ratio=0.3, sink_tokens=16),
        # Anchors covering the entire doc region of the multidoc task
        # (N_DOCS * (payload+1) = 36 tokens + margin).
        "aggressive_sink40": cc(early_layer_ratio=0.6,
                                middle_layer_ratio=0.4,
                                later_layer_ratio=0.3, sink_tokens=40),
        "very_aggressive_2bit": cc(early_layer_ratio=0.4,
                                   middle_layer_ratio=0.3,
                                   later_layer_ratio=0.25,
                                   high_precision_bits=4,
                                   medium_precision_bits=2,
                                   low_precision_bits=2),
        # Quantization-only (retention 1.0): the recommended preset for
        # dense contexts (multidoc) where every token is a potential answer
        # and importance-guided dropping is the wrong tool — still ~0.75
        # physical savings from the 8/4/2 packed tiers alone.
        "quant_only_8_4_2": cc(early_layer_ratio=1.0, middle_layer_ratio=1.0,
                               later_layer_ratio=1.0),
        "position_only_scores": cc(alpha=0.0, beta=0.85, gamma=0.15),
        # Attention-mass-dominant scoring: at long contexts the default
        # beta position bias drowns early-positioned answers; alpha is the
        # term that actually finds them.
        "attention_heavy": cc(alpha=0.8, beta=0.1, gamma=0.1),
        # Observation-window (query-guided) importance: the alpha term uses
        # the attention each token RECEIVES from the last-W prefill queries
        # (SnapKV-style) instead of / combined with the reference's
        # prompt-mass. The ONLY mechanism that can keep a needle planted at
        # mid-context depth — outside the prompt floor and the recency
        # window. Pool dilates sharp retrieval hits across the needle span.
        "query_guided": cc(importance_source="query",
                           alpha=0.8, beta=0.1, gamma=0.1,
                           query_mass_pool=2 * args.payload + 4),
        "query_both": cc(importance_source="both",
                         query_mass_pool=2 * args.payload + 4),
    }
    if args.arms:
        keep = set(args.arms.split(","))
        arms = {k: v for k, v in arms.items() if k in keep}

    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params)

    results = {}
    out_path = os.path.join(args.output_dir, "quality_demo.json")
    if args.merge_existing and os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f)
        prior = old.pop("meta_prior_runs", [])
        if "meta" in old:
            prior.append(old.pop("meta"))
        results.update(old)
        if prior:
            results["meta_prior_runs"] = prior
        print(f"merged {len(old)} existing rows from {out_path}", flush=True)
    # Traceability: every committed artifact row must be reproducible from
    # the artifact alone (VERDICT round-2 #3).
    results["meta"] = {
        "argv": sys.argv[1:],
        "platform": args.platform,
        "tasks": tasks,
        "train_fillers": fillers,
        "eval_fillers": eval_fillers,
        "steps": args.steps,
        "batch": args.batch,
        "payload": args.payload,
        "lr": args.lr,
        "model_layers": args.model_layers,
        "eval_samples": args.eval_samples,
        "min_baseline": args.min_baseline,
        "depths": args.depths,
        "flash": args.flash,
        "date": time.strftime("%Y-%m-%d %H:%M"),
    }

    def eval_retry(*a, **kw):
        # One retry on transient relay/compile failures ("remote_compile:
        # response body closed before all bytes were read" killed a 40-min
        # TPU eval sweep mid-row; the retry recompiles from cache).
        try:
            return recall_accuracy(*a, **kw)
        except Exception as e:
            print(f"  eval failed ({type(e).__name__}: {e}) — retrying "
                  "in 90 s", flush=True)
            time.sleep(90)
            return recall_accuracy(*a, **kw)

    def dump():
        # Incremental + atomic: a multi-hour TPU run that dies mid-eval
        # keeps every completed row (a full round-4 recall sweep was lost
        # to an end-only write).
        os.makedirs(args.output_dir, exist_ok=True)
        path = os.path.join(args.output_dir, "quality_demo.json")
        with open(path + ".tmp", "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
        os.replace(path + ".tmp", path)

    for task in tasks:
        ckpt = (os.path.join(os.path.abspath(args.params_dir), task)
                if args.params_dir else None)
        if ckpt and os.path.exists(ckpt):
            from realtime_kv_cache_compression_tpu.models import (checkpoint,
                                                                  llama)
            template = jax.eval_shape(
                lambda: llama.init_params(jax.random.PRNGKey(0), mcfg))
            params = checkpoint.load_checkpoint(ckpt, template)
            print(f"loaded {task} params from {ckpt}", flush=True)
        else:
            print(f"training {task} model (fillers {fillers})...", flush=True)
            t0 = time.time()
            params = train_recall_model(mcfg, task, args.steps, args.batch,
                                        args.payload, fillers, lr=args.lr,
                                        use_flash=args.flash)
            print(f"trained in {time.time() - t0:.0f}s", flush=True)
            if ckpt:
                from realtime_kv_cache_compression_tpu.models import checkpoint
                checkpoint.save_checkpoint(ckpt, params)
                print(f"saved {task} params to {ckpt}", flush=True)
        arm_params = {name: params for name in arms}
        task_arms = dict(arms)
        if not args.arms or "balanced_int8_weights" in (args.arms or ""):
            task_arms["balanced_int8_weights"] = cc()
            arm_params["balanced_int8_weights"] = quantize_params(params)

        depths = ([float(d) for d in args.depths.split(",")]
                  if task == "needle" else [0.5])
        for filler in eval_fillers:
          for depth in depths:
            row_key = f"{task}_filler{filler}" + (
                f"_d{int(round(depth * 100))}" if task == "needle" else "")
            tag = f"[{task} f={filler}" + (
                f" d={depth}]" if task == "needle" else "]")
            ctx = {}
            # Informativeness gate (round-3): a compressed-vs-baseline row
            # only measures compression if the baseline can do the task.
            # Run the baseline first; below --min-baseline the whole row is
            # recorded under "uninformative_rows" (model limitation, not a
            # compression result) and the arms are skipped.
            if "baseline_fp" in task_arms:
                base = eval_retry(arm_params["baseline_fp"], mcfg, None,
                                       task, args.eval_samples, args.payload,
                                       filler, use_flash=args.flash,
                                       eval_batch=args.eval_batch,
                                       depth=depth)
                base.pop("compression", None)
                print(f"{tag} baseline_fp: "
                      f"acc={base['token_accuracy']:.3f} "
                      f"em={base['exact_match']:.3f}", flush=True)
                if base["token_accuracy"] < args.min_baseline:
                    print(f"{tag} baseline "
                          f"{base['token_accuracy']:.3f} < "
                          f"{args.min_baseline}: row dropped as "
                          "uninformative (train a deeper/longer model)",
                          flush=True)
                    results.setdefault("uninformative_rows", {})[
                        row_key] = {"baseline_fp": base}
                    dump()
                    continue
                ctx["baseline_fp"] = base
            for name, ccfg in task_arms.items():
                if name == "baseline_fp":
                    continue
                r = eval_retry(arm_params[name], mcfg, ccfg, task,
                                    args.eval_samples, args.payload, filler,
                                    use_flash=args.flash,
                                    eval_batch=args.eval_batch, depth=depth)
                comp = r.pop("compression", None)
                line = (f"{tag} {name}: "
                        f"acc={r['token_accuracy']:.3f} "
                        f"em={r['exact_match']:.3f}")
                if comp:
                    line += (f" kept={comp['avg_compression_ratio']:.2f} "
                             f"savings={comp['avg_memory_savings']:.2f}")
                    r["kept_ratio"] = comp["avg_compression_ratio"]
                    r["memory_savings"] = comp["avg_memory_savings"]
                ctx[name] = r
                print(line, flush=True)
            results[row_key] = ctx
            dump()

    dump()
    print(f"wrote {args.output_dir}/quality_demo.json", flush=True)


if __name__ == "__main__":
    main()
