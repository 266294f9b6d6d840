"""Headline benchmark: ESM2-650M unpadded forward + MLM train throughput.

Prints one JSON line:
``{"metric": ..., "value": N, "unit": "tokens/sec/chip",
"vs_baseline": N, "extra": {...}}``

Setting mirrors the reference's whole-proteome inference benchmark —
packed batches at token_per_batch=50_000 of 100-1000 aa sequences
(reference: workflow/inference/inference_on_human.py:9-18) — plus the
reference's MLM train-runtime harness (fwd+bwd+adam over the same
packed batches, reference: workflow/train/runtime.py:42-52), reported
in ``extra`` as train tokens/sec/chip for three configs: nockpt@10k
(Lightning-DDP point), ckpt@50k (DeepSpeed point), and ckpt@50k with
the round-5 memory-shaped config (selective attn-remat + float8 Adam
state, results/train_configs_r5.txt).

``vs_baseline`` is the packed-vs-padded speedup per real token — the
same efficient-vs-baseline comparison the reference paper reports
(packed flash attention vs padded batches of 16,
reference: workflow/inference/inference_runtime.py:36-52). The padded
baseline runs the SAME model and kernel on the padded layout, so the
ratio isolates the packing win.

MFU uses the standard 3x-forward convention (model fwd+bwd FLOPs,
regardless of rematerialization); HFU additionally counts the remat
recompute and is reported separately for checkpointed cells.
"""

import gc
import json
import subprocess
import sys
import time

import numpy as np

# TPU v5e peak bf16 matmul throughput, for MFU estimates.
PEAK_BF16_FLOPS = 197e12


def _make_model(on_tpu):
    from esme_tpu import ESM2
    if on_tpu:
        return ESM2(num_layers=33, embed_dim=1280, attention_heads=20,
                    rng=0), 50_000, 10
    return ESM2(num_layers=4, embed_dim=256, attention_heads=8,
                rng=0, dtype='float32'), 2_048, 2


def _make_train_batch(budget, cfg):
    """Packed masked-LM batch (80/10/10 BERT masking).

    NB not directly comparable with results/train_runtime__*.csv: the
    grid's synthetic batch is uniform 250-aa proteins (the reference's
    max-batch protein) while this harness packs mixed 100-1000-aa
    sequences (the reference's proteome workload) — longer segments
    mean larger attention spans per q block, hence lower tok/s here.
    """
    from esme_tpu.alphabet import Alphabet, mask_tokens
    blens, btotal = [], 0
    brng = np.random.default_rng(2)
    while btotal < budget - 1024:
        n = int(brng.integers(100, 1000))
        blens.append(n + 2)
        btotal += n + 2
    bcu = np.cumsum([0, *blens]).astype(np.int32)
    btk = np.full(budget, Alphabet.padding_idx, np.int32)
    btk[:bcu[-1]] = brng.integers(4, 24, bcu[-1])
    masked, msk = mask_tokens(btk[None], alphabet=Alphabet,
                              rng=np.random.default_rng(1))
    masked, msk = masked[0], msk[0]
    msk[bcu[-1]:] = False   # no loss on the static padding tail

    class _B:
        pass
    b = _B()
    b.tokens = btk
    b.masked_tokens = masked
    b.mask = msk
    b.cu_lens = bcu
    b.max_len = int(max(blens))
    b.real_tokens = int(bcu[-1])
    b.attn_flops = 4 * sum(l * l for l in blens) * cfg.embed_dim \
        * cfg.num_layers
    return b


def _train_cell(model, impl, key, budget, remat, opt, train_reps,
                extra, n_params):
    """One MLM train cell: fwd+bwd+optimizer over a packed batch
    (reference: workflow/train/runtime.py:42-52)."""
    import jax
    from esme_tpu.ops import flash as _flash
    from esme_tpu.train.trainer import MaskedPLM

    ckpt = key.startswith('ckpt')
    model.checkpointing = ckpt
    batch = _make_train_batch(budget, model.config)
    # the attn-remat cell runs the two-kernel bwd: its saved
    # activations + f8 state + the fused kernel's 1.2GB dq-partial
    # buffer together cross into the spill/OOM regime (measured grid:
    # results/train_configs_r5.txt — attn+twokern+adam8 is the best
    # full-step config at this shape)
    _flash._FUSED_BWD_JOBS = (remat != 'attn')
    try:
        plm = MaskedPLM(model, attn_impl=impl, remat=remat,
                        optimizer=None if opt is None else opt())
        plm.training_step(batch)          # compile + warm
        t0 = time.time()
        for _ in range(train_reps):
            plm.training_step(batch)      # float(loss) transfer is
        dt = (time.time() - t0) / train_reps    # a true sync
    except Exception as e:                # OOM recorded like the
        extra[f'train_{key}_error'] = str(e)[:200]  # reference's -1
        extra[f'train_tok_per_sec_{key}'] = -1
        plm = None
        jax.clear_caches()
        gc.collect()
        return
    finally:
        model.checkpointing = False
        _flash._FUSED_BWD_JOBS = True
    extra[f'train_tok_per_sec_{key}'] = round(batch.real_tokens / dt, 1)
    extra[f'train_ms_{key}'] = round(dt * 1e3, 2)
    extra[f'train_budget_{key}'] = budget
    flops_mfu = 3 * 2 * n_params * batch.real_tokens \
        + 3.5 * batch.attn_flops
    extra[f'train_mfu_{key}'] = round(
        flops_mfu / dt / PEAK_BF16_FLOPS, 4)
    if ckpt:
        flops_hfu = 4 * 2 * n_params * batch.real_tokens \
            + 4.5 * batch.attn_flops
        extra[f'train_hfu_{key}'] = round(
            flops_hfu / dt / PEAK_BF16_FLOPS, 4)
    del plm
    jax.clear_caches()
    gc.collect()


def _adam8():
    from esme_tpu.train.optim import adam8bit
    return adam8bit(1e-4)


def _a8_child():
    """Child process for the memory-tight ckpt_a8 cell: the tunneled
    backend frees prior cells' buffers lazily, so this cell only fits
    with a fresh HBM. Prints its extra-keys JSON on the last line."""
    import jax
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    on_tpu = jax.default_backend() == 'tpu'
    model, token_budget, reps = _make_model(on_tpu)
    n_params = sum(x.size for x in jax.tree.leaves(model.params))
    impl = 'flash' if on_tpu else 'reference'
    extra = {}
    _train_cell(model, impl, 'ckpt_a8', token_budget, 'attn', _adam8,
                reps if on_tpu else 1, extra, n_params)
    print(json.dumps(extra))


def main():
    import jax
    import jax.numpy as jnp

    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.esm import forward_flat, packed_meta

    on_tpu = jax.default_backend() == 'tpu'
    model, token_budget, reps = _make_model(on_tpu)
    cfg = model.config
    rng = np.random.default_rng(0)

    # packed batch of 100-1000 aa sequences filling the budget
    lens = []
    total = 0
    while total < token_budget - 1024:
        n = int(rng.integers(100, 1000))
        lens.append(n + 2)
        total += n + 2
    cu = np.cumsum([0, *lens]).astype(np.int32)
    tokens = np.full(token_budget, Alphabet.padding_idx, np.int32)
    tokens[:cu[-1]] = rng.integers(4, 24, cu[-1])
    max_len = int(max(lens))
    real_tokens = int(cu[-1])

    tokens_j = jnp.asarray(tokens)
    seg_ids, pos_ids = packed_meta(jnp.asarray(cu), token_budget)

    impl = 'flash' if on_tpu else 'reference'
    from esme_tpu.ops.flash import host_num_jobs_from_cu
    num_jobs = host_num_jobs_from_cu(cu, token_budget) if on_tpu else None

    # NB params must flow as ARGUMENTS (forward_flat is itself jitted);
    # closing over them in an outer jit would inline 1.3GB of weights
    # as module constants and blow up compilation
    def packed_fn(t, s, p):
        return forward_flat(model.params, cfg, t, s, p, with_head=True,
                            attn_impl=impl, max_seqlen=max_len,
                            num_jobs=num_jobs)

    # profiling.benchmark drains the queue with a real host transfer:
    # block_until_ready is a no-op on the tunneled runtime
    from esme_tpu.profiling import benchmark
    dt_packed = benchmark(packed_fn, tokens_j, seg_ids, pos_ids,
                          reps=reps)
    tok_per_sec = real_tokens / dt_packed

    extra = {'ms_per_batch': round(dt_packed * 1e3, 2),
             'token_budget': token_budget,
             'real_tokens': real_tokens,
             'num_seqs': len(lens),
             'backend': jax.default_backend()}

    vs_baseline = 1.0
    if on_tpu:
        # padded baseline: same sequences in batches of 16, padded to a
        # common length (reference baseline batching, batch=16)
        batch_rows = 16
        row_len = ((max_len + 127) // 128) * 128
        seqs = [tokens[cu[i]:cu[i + 1]] for i in range(len(lens))]
        n_batches = -(-len(seqs) // batch_rows)
        padded_batches = []
        for b in range(n_batches):
            chunk = seqs[b * batch_rows:(b + 1) * batch_rows]
            while len(chunk) < batch_rows:
                chunk.append(chunk[-1])
            arr = np.full((batch_rows, row_len), Alphabet.padding_idx,
                          np.int32)
            for r, s in enumerate(chunk):
                arr[r, :len(s)] = s
            padded_batches.append(jnp.asarray(arr))

        def padded_fn(t):
            return model.forward(t, attn_impl=impl)

        from esme_tpu.profiling import sync
        sync(padded_fn(padded_batches[0]))                 # compile+warm
        t0 = time.time()
        out = None
        for pb in padded_batches:
            out = padded_fn(pb)
        sync(out)
        dt_padded = time.time() - t0
        vs_baseline = (dt_padded / real_tokens) / (dt_packed / real_tokens)
        extra['ms_padded_total'] = round(dt_padded * 1e3, 2)
        extra['padded_tokens_incl_pad'] = n_batches * batch_rows * row_len

    n_params = sum(x.size for x in jax.tree.leaves(model.params))
    # attention FLOPs: 4·ΣL_i²·D per layer (QK^T + PV, summed over
    # heads) — exact over the packed segments, not the tile sweep
    attn_flops = 4 * sum(l * l for l in lens) * cfg.embed_dim \
        * cfg.num_layers
    flops_fwd = 2 * n_params * real_tokens + attn_flops
    extra['mfu_fwd'] = round(flops_fwd / dt_packed / PEAK_BF16_FLOPS, 4)
    extra['params'] = n_params

    # on-TPU flash-vs-reference numerics check (VERDICT r2 item 3):
    # interpret-mode tests don't exercise the compiled MXU kernel.
    # Smaller packed batch so the O(T²) reference fits in HBM.
    if on_tpu:
        pT = 4096
        pcu = [0]
        while pcu[-1] + 514 <= pT - 256:
            pcu.append(pcu[-1] + 514)
        pcu = np.asarray(pcu, np.int32)
        ptk = np.full(pT, Alphabet.padding_idx, np.int32)
        ptk[:pcu[-1]] = rng.integers(4, 24, pcu[-1])
        pseg, ppos = packed_meta(jnp.asarray(pcu), pT)
        pj = jnp.asarray(ptk)
        lf = forward_flat(model.params, cfg, pj, pseg, ppos,
                          with_head=True, attn_impl='flash',
                          max_seqlen=514)
        lr = forward_flat(model.params, cfg, pj, pseg, ppos,
                          with_head=True, attn_impl='reference',
                          max_seqlen=514)
        n_real = int(pcu[-1])
        diff = np.abs(np.asarray(lf[:n_real], np.float32)
                      - np.asarray(lr[:n_real], np.float32))
        extra['flash_vs_ref_err'] = round(float(diff.max()), 5)

        # on-chip BACKWARD numerics (round 5): the compiled fused
        # job-mode bwd kernel vs jax autodiff through the reference
        # einsum, op-level at H=20/D=64 on a packed layout
        import jax as _jax
        from esme_tpu.ops.attention import segment_attention
        from esme_tpu.ops.flash import flash_tm, host_num_jobs

        Hh, Dd = cfg.attention_heads, cfg.head_dim
        seg_np = np.asarray(pseg)[:pT]
        qkv = [jnp.asarray(rng.standard_normal((Hh, Dd, pT)),
                           jnp.bfloat16) for _ in range(3)]
        nj_b = host_num_jobs(seg_np, 256, 256)

        def loss_flash(q, k, v):
            o = flash_tm(q, k, v, jnp.asarray(seg_np), 256, 256, 514,
                         False, nj_b)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_ref(q, k, v):
            # (H, D, T) -> (T, H, D) for the einsum reference path
            o = segment_attention(jnp.transpose(q, (2, 0, 1)),
                                  jnp.transpose(k, (2, 0, 1)),
                                  jnp.transpose(v, (2, 0, 1)),
                                  jnp.asarray(seg_np), impl='reference')
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gf = _jax.jit(_jax.grad(loss_flash, argnums=(0, 1, 2)))(*qkv)
        gr = _jax.jit(_jax.grad(loss_ref, argnums=(0, 1, 2)))(*qkv)
        bwd_err = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            / (float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9)
            for a, b in zip(gf, gr))
        extra['flash_bwd_vs_ref_rel_err'] = round(bwd_err, 5)
        del qkv, gf, gr

    # Free the forward-bench buffers and compiled executables before
    # the train cells: leftover padded-baseline buffers + jit caches
    # previously pushed the 10k nockpt cell over HBM (round-3 BENCH
    # recorded a RESOURCE_EXHAUSTED that the standalone grid run
    # contradicted).
    if on_tpu:
        del out, padded_batches
    jax.clear_caches()
    gc.collect()

    # train cells: the reference's two harness operating points
    # (ckpt@50k = DeepSpeed ZeRO-2 w/ act-ckpt,
    # workflow/train/runtime.py:28-30; nockpt@10k = Lightning DDP,
    # workflow/train/runtime_lightning.py:35-39), plus the round-5
    # memory-shaped config.
    train_reps = reps if on_tpu else 1
    _train_cell(model, impl, 'nockpt',
                10_000 if on_tpu else token_budget, 'full', None,
                train_reps, extra, n_params)
    _train_cell(model, impl, 'ckpt', token_budget, 'full', None,
                train_reps, extra, n_params)
    if on_tpu:
        # the ckpt_a8 cell needs a fresh HBM (see _a8_child)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, '--cell-a8'],
                capture_output=True, text=True, timeout=1500)
            line = [l for l in proc.stdout.strip().splitlines()
                    if l.startswith('{')][-1]
            extra.update(json.loads(line))
        except Exception as e:
            extra['train_ckpt_a8_error'] = str(e)[:200]
            extra['train_tok_per_sec_ckpt_a8'] = -1
    else:
        _train_cell(model, impl, 'ckpt_a8', token_budget, 'attn',
                    _adam8, train_reps, extra, n_params)

    print(json.dumps({
        'metric': 'tokens/sec/chip (ESM2-650M unpadded fwd)',
        'value': round(tok_per_sec, 1),
        'unit': 'tokens/sec/chip',
        'vs_baseline': round(vs_baseline, 3),
        'extra': extra,
    }))


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--cell-a8':
        _a8_child()
    else:
        main()
