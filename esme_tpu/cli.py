"""Command-line interface (reference: esme/cli.py:5-21).

``python -m esme_tpu.cli download --model esm2_650m`` mirrors the
reference's ``esme_download`` console script; ``score`` adds
variant-effect scoring from the shell.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog='esme-tpu')
    sub = parser.add_subparsers(dest='cmd', required=True)

    dl = sub.add_parser('download', help='download pretrained weights')
    dl.add_argument('--model', required=True,
                    help='model name, e.g. esm2_650m')
    dl.add_argument('--cache-dir', default=None)

    sc = sub.add_parser('score', help='mask-margin score a sequence')
    sc.add_argument('--model', required=True,
                    help='model name or safetensors path')
    sc.add_argument('--seq', required=True)
    sc.add_argument('--batch-size', type=int, default=32)
    sc.add_argument('--out', default='-', help='csv output path')

    args = parser.parse_args(argv)

    if args.cmd == 'download':
        from .download import download_model
        path = download_model(args.model, cache_dir=args.cache_dir)
        print(path)
        return 0

    if args.cmd == 'score':
        from .models.esm import ESM
        from .variant import predict_mask_margin
        model = ESM.from_pretrained(args.model)
        df = predict_mask_margin(model, args.seq,
                                 batch_size=args.batch_size)
        if args.out == '-':
            df.to_csv(sys.stdout)
        else:
            df.to_csv(args.out)
        return 0

    return 1


if __name__ == '__main__':
    sys.exit(main())
