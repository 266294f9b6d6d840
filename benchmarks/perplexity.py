"""Pseudo-perplexity over a sample of proteins from an indexed FASTA
(reference: workflow/inference/perplexity.py:96-118 — 512 human
proteins <=1024 aa across all model variants)."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--fasta', required=True)
    ap.add_argument('--model', required=True)
    ap.add_argument('--k-sample', type=int, default=512)
    ap.add_argument('--max-len', type=int, default=1024)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--quantization', default='none',
                    choices=['none', '8bit', '4bit'])
    args = ap.parse_args()

    import os
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.fasta import Fasta
    from esme_tpu.models.esm import ESM, _class_for
    from esme_tpu.variant import predict_pseudoperplexity

    if os.path.isfile(args.model):
        model = ESM.from_pretrained(
            args.model, quantization=None if args.quantization == 'none'
            else args.quantization)
    else:
        # name without a file: random init at that architecture (no
        # egress in this environment; synthetic capture only)
        from esme_tpu.models.config import config_for
        cfg = config_for(args.model)
        model = _class_for(cfg.family)(config=cfg, rng=0)
        if args.quantization != 'none':
            model.quantize(args.quantization)
    if not os.path.isfile(args.model):
        print('# REGIME: random-init weights on synthetic sequences — '
              'pipeline capture only, NOT a real perplexity')
    fa = Fasta(args.fasta, max_len=args.max_len, k_sample=args.k_sample,
               rng=np.random.default_rng(0))

    ppls = []
    for i in range(len(fa)):
        ppl = predict_pseudoperplexity(model, fa[i],
                                       batch_size=args.batch_size)
        ppls.append(ppl)
        print(f'{fa.fai[i]["id"]},{ppl:.4f}', flush=True)
    print(f'# mean pseudo-perplexity over {len(ppls)} proteins: '
          f'{np.mean(ppls):.4f}')


if __name__ == '__main__':
    main()
