"""Fine-tune task pipelines: Meltome, GB1, AAV, TF.

The reference's task workflows as one CLI (reference: workflow/meltome/
meltome.py + finetune_meltome.py, workflow/gb1_aav/gb1.py + aav.py,
workflow/tf/tf.py + finetune.py), with the same data formats:

* meltome: CSV with columns sequence,target,set,validation — test rows
  have set=="test", validation non-NaN rows are the val split
  (reference: workflow/meltome/meltome.py:44-50).
* gb1/aav: FLIP FASTA whose headers carry ``label= split= validation=``
  fields (reference: workflow/gb1_aav/gb1.py:13-34).
* tf: two FASTAs (TFs = positives, non-TFs = negatives), positive
  upsampling (reference: workflow/tf/tf.py:18-28).

Each task trains LoRA (rank 16 on q/v/out by default) + a pooled head,
logs JSONL metrics, checkpoints best-by-val-metric with resume, early
stops, and saves the LoRA adapters + head as safetensors.

Usage:
  python benchmarks/tasks.py meltome --data meltome.csv --model esm2_650m.safetensors
  python benchmarks/tasks.py gb1 --data gb1.fasta --model ...
  python benchmarks/tasks.py tf --data tfs.fa --negatives non_tfs.fa --model ...
  python benchmarks/tasks.py meltome --synthetic --model esm2_8m   # smoke
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


# ---------------------------------------------------------------------------
# Data loaders (reference formats)
# ---------------------------------------------------------------------------

def read_fasta_plain(path):
    seqs, headers = [], []
    with open(path) as f:
        cur = []
        for line in f:
            if line.startswith('>'):
                if cur:
                    seqs.append(''.join(cur))
                    cur = []
                headers.append(line[1:].strip())
            else:
                cur.append(line.strip())
        if cur:
            seqs.append(''.join(cur))
    return headers, seqs


def load_meltome(path):
    """(reference: workflow/meltome/meltome.py:44-50)"""
    import pandas as pd
    df = pd.read_csv(path)
    test = df[df['set'] == 'test']
    train_all = df[df['set'] == 'train']
    is_train = train_all['validation'].isna()
    splits = {}
    for name, part in [('train', train_all[is_train]),
                       ('val', train_all[~is_train]), ('test', test)]:
        splits[name] = (part['sequence'].tolist(),
                        part['target'].astype(float).tolist())
    return splits


def load_flip_fasta(path):
    """FLIP GB1/AAV format (reference: workflow/gb1_aav/gb1.py:13-34)."""
    splits = {'train': ([], []), 'val': ([], []), 'test': ([], [])}
    headers, seqs = read_fasta_plain(path)
    for header, seq in zip(headers, seqs):
        fields = dict(kv.split('=') for kv in header.split()[1:]
                      if '=' in kv)
        label = float(fields['label'])
        split = fields.get('split', 'train')
        if fields.get('validation') == 'True':
            split = 'val'
        if split not in splits:
            continue
        splits[split][0].append(seq)
        splits[split][1].append(label)
    return splits


def load_tf(pos_path, neg_path, val_frac=0.1, seed=41):
    """(reference: workflow/tf/tf.py:18-44 + finetune.py split)"""
    _, pos = read_fasta_plain(pos_path)
    _, neg = read_fasta_plain(neg_path)
    rng = np.random.default_rng(seed)
    splits = {'train': ([], []), 'val': ([], []), 'test': ([], [])}
    for seqs, label in [(pos, 1.0), (neg, 0.0)]:
        order = rng.permutation(len(seqs))
        n_val = max(int(len(seqs) * val_frac), 1)
        for rank, i in enumerate(order):
            split = 'val' if rank < n_val else \
                'test' if rank < 2 * n_val else 'train'
            splits[split][0].append(seqs[i])
            splits[split][1].append(label)
    return splits


def synthetic_splits(task, n=48, seed=None):
    """Smoke-mode data so every pipeline runs without FLIP downloads.
    Per-task seeds so the regression tasks don't produce byte-identical
    artifacts."""
    if seed is None:
        seed = {'meltome': 11, 'gb1': 22, 'aav': 33, 'tf': 44}[task]
    rng = np.random.default_rng(seed)
    aas = list('LAGVSERTIDPKQNFYMHWC')
    splits = {}
    for name, k in [('train', n), ('val', n // 4), ('test', n // 4)]:
        seqs = [''.join(rng.choice(aas, rng.integers(20, 60)))
                for _ in range(k)]
        if task == 'tf':
            labels = [float(len(s) > 40) for s in seqs]
        else:
            labels = [len(s) / 60.0 for s in seqs]
        splits[name] = (seqs, labels)
    return splits


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('task', choices=['meltome', 'gb1', 'aav', 'tf'])
    ap.add_argument('--data', help='task data file (see module docstring)')
    ap.add_argument('--negatives', help='non-TF FASTA (tf task only)')
    ap.add_argument('--synthetic', action='store_true',
                    help='synthetic smoke-mode data')
    ap.add_argument('--model', required=True)
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--token-per-batch', type=int, default=10_000)
    ap.add_argument('--truncate-len', type=int, default=1000)
    ap.add_argument('--lora-rank', type=int, default=16)
    ap.add_argument('--lora-layers', default='query,value,output')
    ap.add_argument('--head-lr', type=float, default=1e-3)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--patience', type=int, default=3)
    ap.add_argument('--out-dir', default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.data import LabeledDataset, balance_binary
    from esme_tpu.logger import MetricLogger
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import ESM, _class_for
    from esme_tpu.models.heads import init_learned_aggregation
    from esme_tpu.train import ClassificationTrainer, RegressionTrainer
    from esme_tpu.train.checkpoint import CheckpointManager
    from safetensors import flax as stf

    out_dir = args.out_dir or f'task_{args.task}'
    os.makedirs(out_dir, exist_ok=True)

    # data
    if args.synthetic:
        splits = synthetic_splits(args.task)
    elif args.task == 'meltome':
        splits = load_meltome(args.data)
    elif args.task in ('gb1', 'aav'):
        splits = load_flip_fasta(args.data)
    else:
        splits = load_tf(args.data, args.negatives)

    # model + head
    if os.path.isfile(args.model):
        model = ESM.from_pretrained(args.model)
    else:
        cfg = config_for(args.model)
        model = _class_for(cfg.family)(config=cfg, rng=0)
    if args.lora_rank:
        model.add_lora(rank=args.lora_rank, alpha=args.lora_rank,
                       layers=tuple(args.lora_layers.split(',')),
                       adapter_names=[args.task])
    head = init_learned_aggregation(0, model.config.embed_dim, num_cls=1,
                                    attention_heads=4)

    binary = args.task == 'tf'
    cls = ClassificationTrainer if binary else RegressionTrainer
    trainer = cls(model, head, head_lr=args.head_lr, lr=args.lr)
    monitor = 'val_auroc' if binary else 'val_spearman'
    mgr = CheckpointManager(os.path.join(out_dir, 'ckpts'),
                            monitor=monitor, mode='max')

    def dataset(split, epoch=0, shuffle=False):
        seqs, labels = splits[split]
        if binary and split == 'train':
            seqs, labels = balance_binary(seqs, labels, 'upsample')
        return LabeledDataset(seqs, labels,
                              token_per_batch=args.token_per_batch,
                              shuffle=shuffle, random_state=epoch,
                              truncate_len=args.truncate_len,
                              alphabet=model.alphabet)

    val_ds = dataset('val')
    best, since_best = -2.0, 0
    with MetricLogger(os.path.join(out_dir, 'metrics.jsonl'),
                      run=args.task, stdout=True) as logger:
        for epoch in range(args.epochs):
            losses = [trainer.training_step(b)
                      for b in dataset('train', epoch, shuffle=True)]
            metrics = trainer.validation_metrics(val_ds)
            rec = {'epoch': epoch, 'train_loss': float(np.mean(losses)),
                   **metrics}
            logger.log(rec, step=int(trainer.state.step))
            logger.track_best(metrics)
            mgr.save(epoch, trainer.state, metrics)
            if metrics[monitor] > best:
                best, since_best = metrics[monitor], 0
            else:
                since_best += 1
                if since_best >= args.patience:
                    logger.log({'early_stop': epoch})
                    break

        test = trainer.validation_metrics(dataset('test'))
        logger.log({f'test_{k[4:]}' if k.startswith('val_') else k: v
                    for k, v in test.items()})

    # artifacts: LoRA adapters + head (reference: finetune_meltome.py:96-102)
    if args.lora_rank:
        model.save_lora(os.path.join(out_dir, 'lora.safetensors'))
    stf.save_file(
        {f'head.{k}': v
         for k, v in _flatten(trainer.state.params['head']).items()},
        os.path.join(out_dir, 'head.safetensors'))
    print(f'{args.task}: best {monitor} {best:.4f}; artifacts in {out_dir}')


def _flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        key = f'{prefix}{k}' if not prefix else f'{prefix}.{k}'
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


if __name__ == '__main__':
    main()
