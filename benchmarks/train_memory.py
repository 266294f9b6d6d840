"""Train-step peak memory per length bucket (fwd+bwd+optimizer step,
batch 4), across {none, checkpointing, lora, 8bit} configurations
(reference: workflow/train/train_memory.py:84-102,
workflow/train/Snakefile:7-95). OOM prints -1 like the reference.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='esm2_8m')
    ap.add_argument('--mode', default='none',
                    choices=['none', 'checkpointing', 'lora', '8bit',
                             'lora8bit'])
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--min-bucket', type=int, default=500)
    ap.add_argument('--max-bucket', type=int, default=3500)
    ap.add_argument('--step', type=int, default=500)
    args = ap.parse_args()

    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.alphabet import Alphabet, mask_tokens, pack_tokens
    from esme_tpu.data import PackedBatch
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import _class_for
    from esme_tpu.models.esm import packed_meta
    from esme_tpu.profiling import memory_analysis_gb, peak_memory_gb
    from esme_tpu.train import MaskedPLM
    import jax.numpy as jnp

    cfg = config_for(args.model)
    checkpointing = args.mode == 'checkpointing'
    model = _class_for(cfg.family)(config=cfg, rng=0,
                                   checkpointing=checkpointing)
    if '8bit' in args.mode:
        model.quantize('8bit')
    if 'lora' in args.mode:
        model.add_lora(rank=16, alpha=16)
    trainer = MaskedPLM(model, learning_rate=1e-4)

    rng = np.random.default_rng(0)
    print('length,batch,loss,temp_gb,total_gb')
    for length in range(args.min_bucket, args.max_bucket + 1, args.step):
        seqs = [''.join(rng.choice(list('LAGVSERTIDPKQNFYMHWC'), length))
                for _ in range(args.batch)]
        tokens, _, cu, ml = pack_tokens(
            seqs, token_budget=args.batch * (length + 2),
            max_segments=args.batch, alphabet=model.alphabet)
        mtok, mask = mask_tokens(tokens, alphabet=model.alphabet,
                                 rng=rng)
        batch = PackedBatch(tokens=tokens, cu_lens=cu, max_len=ml,
                            masked_tokens=mtok, mask=mask)
        try:
            # XLA buffer assignment of the full train step (args incl.
            # params+optimizer state, temp = activations/grads scratch)
            cu_j = jnp.asarray(cu, jnp.int32)
            seg_ids, pos_ids = packed_meta(cu_j, batch.tokens.shape[0])
            # .lower on the jitted method doesn't bind self - pass it
            ma = memory_analysis_gb(
                type(trainer)._step, trainer, trainer.state,
                jnp.asarray(batch.masked_tokens, jnp.int32), seg_ids,
                pos_ids, jnp.asarray(batch.tokens, jnp.int32),
                jnp.asarray(batch.mask), max_seqlen=int(ml))
            loss = trainer.training_step(batch)
        except Exception as e:
            print(f'{length},{args.batch},-1,-1,-1  # {type(e).__name__}')
            continue
        print(f'{length},{args.batch},{loss:.4f},'
              f'{ma.get("temp_gb", -1):.3f},'
              f'{max(ma.get("total_gb", -1), peak_memory_gb() or -1):.3f}',
              flush=True)


if __name__ == '__main__':
    main()
