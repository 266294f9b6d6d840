"""Headline benchmark: ESM2-650M unpadded forward + MLM train throughput.

Prints one JSON line:
``{"metric": ..., "value": N, "unit": "tokens/sec/chip",
"vs_baseline": N, "extra": {...}}``

Setting mirrors the reference's whole-proteome inference benchmark —
packed batches at token_per_batch=50_000 of 100-1000 aa sequences
(reference: workflow/inference/inference_on_human.py:9-18) — plus the
reference's MLM train-runtime harness (fwd+bwd+adam over the same
packed batches, reference: workflow/train/runtime.py:42-52), reported
in ``extra`` as train tokens/sec/chip with and without activation
checkpointing, with MFU estimates.

``vs_baseline`` is the packed-vs-padded speedup per real token — the
same efficient-vs-baseline comparison the reference paper reports
(packed flash attention vs padded batches of 16,
reference: workflow/inference/inference_runtime.py:36-52). The padded
baseline runs the SAME model and kernel on the padded layout, so the
ratio isolates the packing win.
"""

import json
import os
import time

import numpy as np

# TPU v5e peak bf16 matmul throughput, for MFU estimates.
PEAK_BF16_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu import ESM2, pad_tokens
    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.esm import forward_flat, packed_meta

    on_tpu = jax.default_backend() == 'tpu'

    if on_tpu:
        model = ESM2(num_layers=33, embed_dim=1280, attention_heads=20,
                     rng=0)
        token_budget = 50_000
        reps = 10
    else:  # CPU smoke fallback so the script always produces a line
        model = ESM2(num_layers=4, embed_dim=256, attention_heads=8,
                     rng=0, dtype='float32')
        token_budget = 2_048
        reps = 2

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

    # NB params must flow as ARGUMENTS (forward_flat is itself jitted);
    # closing over them in an outer jit would inline 1.3GB of weights
    # as module constants and blow up compilation
    def packed_fn(t, s, p):
        return forward_flat(model.params, cfg, t, s, p, with_head=True,
                            attn_impl=impl, max_seqlen=max_len)

    # block every iteration: on the tunneled runtime, blocking only on
    # the last output has been observed not to await prior executes
    np.asarray(packed_fn(tokens_j, seg_ids, pos_ids))   # compile+warm
    t0 = time.time()
    for _ in range(reps):
        packed_fn(tokens_j, seg_ids, pos_ids).block_until_ready()
    dt_packed = (time.time() - t0) / reps
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

        np.asarray(padded_fn(padded_batches[0]))           # compile+warm
        t0 = time.time()
        for pb in padded_batches:
            padded_fn(pb).block_until_ready()
        dt_padded = time.time() - t0
        vs_baseline = (dt_padded / real_tokens) / (dt_packed / real_tokens)
        extra['ms_padded_total'] = round(dt_padded * 1e3, 2)
        extra['padded_tokens_incl_pad'] = n_batches * batch_rows * row_len

    # ---- MLM train step (reference: workflow/train/runtime.py:42-52) ----
    # fwd+bwd+adam over the same packed batch; 80/10/10 BERT masking.
    from esme_tpu.alphabet import mask_tokens
    from esme_tpu.train.trainer import MaskedPLM

    n_params = sum(x.size for x in jax.tree.leaves(model.params))
    flops_fwd = 2 * n_params * real_tokens
    extra['mfu_fwd'] = round(flops_fwd / dt_packed / PEAK_BF16_FLOPS, 4)
    extra['params'] = n_params

    masked, mask = mask_tokens(tokens[None], alphabet=Alphabet,
                               rng=np.random.default_rng(1))
    masked, mask = masked[0], mask[0]
    mask[cu[-1]:] = False   # no loss on the static padding tail

    class _B:
        pass
    batch = _B()
    batch.tokens = tokens
    batch.masked_tokens = masked
    batch.mask = mask
    batch.cu_lens = cu
    batch.max_len = max_len

    train_reps = reps if on_tpu else 1
    for ckpt, key in ((True, 'ckpt'), (False, 'nockpt')):
        model.checkpointing = ckpt
        plm = MaskedPLM(model, attn_impl=impl)
        try:
            plm.training_step(batch)          # compile + warm
            t0 = time.time()
            for _ in range(train_reps):
                plm.training_step(batch)      # float(loss) syncs
            dt_train = (time.time() - t0) / train_reps
        except Exception as e:                # OOM recorded like the
            extra[f'train_{key}_error'] = str(e)[:200]  # reference's -1
            extra[f'train_tok_per_sec_{key}'] = -1
            continue
        extra[f'train_tok_per_sec_{key}'] = round(real_tokens / dt_train, 1)
        extra[f'train_ms_{key}'] = round(dt_train * 1e3, 2)
        # fwd+bwd ≈ 3x fwd matmul FLOPs (+1 fwd recompute under remat)
        factor = 8 if ckpt else 6
        extra[f'train_mfu_{key}'] = round(
            factor * n_params * real_tokens / dt_train / PEAK_BF16_FLOPS, 4)
        del plm
    model.checkpointing = False

    print(json.dumps({
        'metric': 'tokens/sec/chip (ESM2-650M unpadded fwd)',
        'value': round(tok_per_sec, 1),
        'unit': 'tokens/sec/chip',
        'vs_baseline': round(vs_baseline, 3),
        'extra': extra,
    }))


if __name__ == '__main__':
    main()
