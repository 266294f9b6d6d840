"""LoRA/head fine-tuning on a (sequence, label) CSV.

Generic driver for the reference's fine-tune tasks — Meltome melting
point regression, GB1/AAV fitness (reference: workflow/meltome/,
workflow/gb1_aav/): LoRA on q/v/out + learned-aggregation head,
checkpoint best-by-val-Spearman, early stopping.

Usage:
  python benchmarks/finetune_regression.py --csv meltome.csv \
      --model esm2_650m.safetensors --epochs 5 --lora-rank 16
CSV columns: sequence,label[,split]  (split in {train,val,test}).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--csv', required=True)
    ap.add_argument('--model', required=True)
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--token-per-batch', type=int, default=10_000)
    ap.add_argument('--truncate-len', type=int, default=1000)
    ap.add_argument('--lora-rank', type=int, default=16)
    ap.add_argument('--head-lr', type=float, default=1e-3)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--ckpt-dir', default='finetune_ckpts')
    ap.add_argument('--patience', type=int, default=3)
    args = ap.parse_args()

    import pandas as pd
    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.data import LabeledDataset
    from esme_tpu.models.esm import ESM
    from esme_tpu.models.heads import init_learned_aggregation
    from esme_tpu.train import RegressionTrainer
    from esme_tpu.train.checkpoint import CheckpointManager

    df = pd.read_csv(args.csv)
    if 'split' not in df:
        n = len(df)
        df['split'] = np.where(np.arange(n) % 10 == 0, 'val', 'train')
    tr = df[df.split == 'train']
    va = df[df.split == 'val']

    model = ESM.from_pretrained(args.model)
    if args.lora_rank:
        model.add_lora(rank=args.lora_rank, alpha=args.lora_rank,
                       layers=('query', 'value', 'output'))

    head = init_learned_aggregation(0, model.config.embed_dim,
                                    num_cls=1, attention_heads=4)
    trainer = RegressionTrainer(model, head, head_lr=args.head_lr,
                                lr=args.lr)
    mgr = CheckpointManager(args.ckpt_dir, monitor='val_spearman',
                            mode='max')

    val_ds = LabeledDataset(va.sequence.tolist(), va.label.tolist(),
                            token_per_batch=args.token_per_batch,
                            shuffle=False, truncate_len=args.truncate_len,
                            alphabet=model.alphabet)
    best, since_best = -2.0, 0
    for epoch in range(args.epochs):
        train_ds = LabeledDataset(
            tr.sequence.tolist(), tr.label.tolist(),
            token_per_batch=args.token_per_batch, shuffle=True,
            random_state=epoch, truncate_len=args.truncate_len,
            alphabet=model.alphabet)
        losses = [trainer.training_step(b) for b in train_ds]
        metrics = trainer.validation_metrics(val_ds)
        print(f'epoch {epoch}: train_mse {np.mean(losses):.4f} '
              f'val_mse {metrics["val_mse"]:.4f} '
              f'val_spearman {metrics["val_spearman"]:.4f}', flush=True)
        mgr.save(epoch, trainer.state, metrics)
        if metrics['val_spearman'] > best:
            best, since_best = metrics['val_spearman'], 0
        else:
            since_best += 1
            if since_best >= args.patience:
                print('early stopping')
                break
    print(f'best val_spearman: {best:.4f} (step {mgr.best_step()})')


if __name__ == '__main__':
    main()
