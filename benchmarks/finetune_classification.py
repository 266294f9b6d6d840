"""Binary-classification fine-tune on a (sequence,label) CSV with BCE
loss and optional positive-class upsampling — the TF-prediction task
(reference: workflow/tf/finetune.py:89-137,173, upsample balance).
Reports AUROC/AUPRC like the reference's DeepTFactor comparison.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--csv', required=True)
    ap.add_argument('--model', required=True)
    ap.add_argument('--epochs', type=int, default=5)
    ap.add_argument('--token-per-batch', type=int, default=10_000)
    ap.add_argument('--truncate-len', type=int, default=1000)
    ap.add_argument('--lora-rank', type=int, default=16)
    ap.add_argument('--upsample', action='store_true',
                    help='balance positives by upsampling (reference '
                         'workflow/tf/finetune.py:173)')
    args = ap.parse_args()

    import pandas as pd
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.data import LabeledDataset, balance_binary
    from esme_tpu.models.esm import ESM
    from esme_tpu.models.heads import init_learned_aggregation
    from esme_tpu.train import ClassificationTrainer

    df = pd.read_csv(args.csv)
    if 'split' not in df:
        df['split'] = np.where(np.arange(len(df)) % 10 == 0, 'val', 'train')
    tr, va = df[df.split == 'train'], df[df.split == 'val']

    model = ESM.from_pretrained(args.model)
    if args.lora_rank:
        model.add_lora(rank=args.lora_rank, alpha=args.lora_rank)
    head = init_learned_aggregation(0, model.config.embed_dim, num_cls=1,
                                    attention_heads=4)

    trainer = ClassificationTrainer(model, head, head_lr=1e-3, lr=1e-4)

    def epoch_dataset(epoch):
        seqs, labels = balance_binary(
            tr.sequence.tolist(), tr.label.astype(float).tolist(),
            balance='upsample' if args.upsample else None)
        return LabeledDataset(seqs, labels,
                              token_per_batch=args.token_per_batch,
                              shuffle=True, random_state=epoch,
                              truncate_len=args.truncate_len,
                              alphabet=model.alphabet)

    val_ds = LabeledDataset(va.sequence.tolist(),
                            va.label.astype(float).tolist(),
                            token_per_batch=args.token_per_batch,
                            shuffle=False, truncate_len=args.truncate_len,
                            alphabet=model.alphabet)

    for epoch in range(args.epochs):
        losses = [trainer.training_step(b) for b in epoch_dataset(epoch)]
        m = trainer.validation_metrics(val_ds)
        print(f'epoch {epoch}: bce {np.mean(losses):.4f} '
              f'auroc {m["val_auroc"]:.4f} auprc {m["val_auprc"]:.4f}',
              flush=True)


if __name__ == '__main__':
    main()
