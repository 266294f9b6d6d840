"""Convert upstream fair-esm / EvolutionaryScale checkpoints to the
reference-schema safetensors this framework loads.

Equivalent of the reference converters
(reference: workflow/common/safetensor.py:6-79 for ESM1b/ESM2,
workflow/common/safetensor_c.py:17-64 for ESMC's fused-weight split).
Pure numpy+torch-cpu host tool — no device code.

Usage:
  python tools/convert_fairesm.py esm2_t33_650M_UR50D.pt out.safetensors \
      --name esm2_650m
  python tools/convert_fairesm.py esmc_300m.pth out.safetensors \
      --name esmc_300m --family esmc
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def _np(t):
    import torch
    if t.dtype == torch.bfloat16:
        t = t.float()
    return t.detach().cpu().numpy()


def convert_fairesm(weights: dict, num_layers: int) -> dict:
    """fair-esm key schema -> reference schema (tensor values are
    whatever array type is passed in).

    fair-esm names: ``encoder.sentence_encoder.layers.{i}.self_attn.
    {q,k,v,out}_proj``, ``self_attn_layer_norm``, ``final_layer_norm``,
    ``fc1/fc2``, ``lm_head.{dense,layer_norm,weight,bias}``
    (reference: workflow/common/safetensor.py:11-64).
    """
    w = {}
    for k, v in weights.items():
        if k.endswith('.rot_emb.inv_freq'):
            continue
        for strip in ('sentence_encoder.', 'encoder.', '_proj'):
            k = k.replace(strip, '')
        w[k] = v

    out = {
        'embed_tokens.weight': w['embed_tokens.weight'],
        'emb_layer_norm_after.weight': w['emb_layer_norm_after.weight'],
        'emb_layer_norm_after.bias': w['emb_layer_norm_after.bias'],
        'lm_head.dense.weight': w['lm_head.dense.weight'],
        'lm_head.dense.bias': w['lm_head.dense.bias'],
        'lm_head.layer_norm.weight': w['lm_head.layer_norm.weight'],
        'lm_head.layer_norm.bias': w['lm_head.layer_norm.bias'],
        'lm_head.final.weight': w['lm_head.weight'],
        'lm_head.final.bias': w['lm_head.bias'],
    }
    # ESM1b/1v extras
    for src, dst in [('embed_positions.weight', 'embed_positions.weight'),
                     ('emb_layer_norm_before.weight',
                      'emb_layer_norm_before.weight'),
                     ('emb_layer_norm_before.bias',
                      'emb_layer_norm_before.bias')]:
        if src in w:
            out[dst] = w[src]

    for i in range(num_layers):
        out[f'layers.{i}.self_attn.norm.weight'] = \
            w[f'layers.{i}.self_attn_layer_norm.weight']
        out[f'layers.{i}.self_attn.norm.bias'] = \
            w[f'layers.{i}.self_attn_layer_norm.bias']
        for j in ('q', 'k', 'v', 'out'):
            out[f'layers.{i}.self_attn.{j}.weight'] = \
                w[f'layers.{i}.self_attn.{j}.weight']
            out[f'layers.{i}.self_attn.{j}.bias'] = \
                w[f'layers.{i}.self_attn.{j}.bias']
        out[f'layers.{i}.final.0.weight'] = \
            w[f'layers.{i}.final_layer_norm.weight']
        out[f'layers.{i}.final.0.bias'] = \
            w[f'layers.{i}.final_layer_norm.bias']
        out[f'layers.{i}.final.1.weight'] = w[f'layers.{i}.fc1.weight']
        out[f'layers.{i}.final.1.bias'] = w[f'layers.{i}.fc1.bias']
        out[f'layers.{i}.final.3.weight'] = w[f'layers.{i}.fc2.weight']
        out[f'layers.{i}.final.3.bias'] = w[f'layers.{i}.fc2.bias']
    return out


def convert_esmc(weights: dict, num_layers: int) -> dict:
    """EvolutionaryScale ESMC schema -> reference schema, splitting the
    fused ``layernorm_qkv.1`` into q/k/v and ``ffn.1`` into the SwiGLU
    halves (reference: workflow/common/safetensor_c.py:19-49)."""
    w = weights
    out = {
        'embed_tokens.weight': w['embed.weight'],
        'emb_layer_norm_after.weight': w['transformer.norm.weight'],
        'lm_head.dense.weight': w['sequence_head.0.weight'],
        'lm_head.dense.bias': w['sequence_head.0.bias'],
        'lm_head.layer_norm.weight': w['sequence_head.2.weight'],
        'lm_head.layer_norm.bias': w['sequence_head.2.bias'],
        'lm_head.final.weight': w['sequence_head.3.weight'],
        'lm_head.final.bias': w['sequence_head.3.bias'],
    }
    for i in range(num_layers):
        blk = f'transformer.blocks.{i}'
        out[f'layers.{i}.self_attn.norm.weight'] = \
            w[f'{blk}.attn.layernorm_qkv.0.weight']
        out[f'layers.{i}.self_attn.norm.bias'] = \
            w[f'{blk}.attn.layernorm_qkv.0.bias']
        qkv = w[f'{blk}.attn.layernorm_qkv.1.weight']
        d = qkv.shape[0] // 3
        out[f'layers.{i}.self_attn.q.weight'] = qkv[:d]
        out[f'layers.{i}.self_attn.k.weight'] = qkv[d:2 * d]
        out[f'layers.{i}.self_attn.v.weight'] = qkv[2 * d:]
        out[f'layers.{i}.self_attn.out.weight'] = \
            w[f'{blk}.attn.out_proj.weight']
        out[f'layers.{i}.self_attn.layernorm_q.weight'] = \
            w[f'{blk}.attn.q_ln.weight']
        out[f'layers.{i}.self_attn.layernorm_k.weight'] = \
            w[f'{blk}.attn.k_ln.weight']
        out[f'layers.{i}.final.0.weight'] = w[f'{blk}.ffn.0.weight']
        out[f'layers.{i}.final.0.bias'] = w[f'{blk}.ffn.0.bias']
        ffn = w[f'{blk}.ffn.1.weight']
        h = ffn.shape[0] // 2
        out[f'layers.{i}.final.1.activation.weight'] = ffn[:h]
        out[f'layers.{i}.final.1.fc.weight'] = ffn[h:]
        out[f'layers.{i}.final.2.weight'] = w[f'{blk}.ffn.3.weight']
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('src', help='fair-esm .pt / ESMC .pth checkpoint')
    ap.add_argument('dst', help='output .safetensors path')
    ap.add_argument('--name', required=True,
                    help='model name metadata, e.g. esm2_650m')
    ap.add_argument('--family', default='auto',
                    choices=['auto', 'esm2', 'esm1b', 'esm1v', 'esmc'])
    ap.add_argument('--attention-heads', type=int, default=None,
                    help='override when the checkpoint cfg is not '
                         'unpicklable (default: infer from embed dim)')
    args = ap.parse_args()

    import torch
    from safetensors.numpy import save_file

    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    family = args.family
    if family == 'auto':
        family = args.name.split('_')[0]

    if family == 'esmc':
        raw = ckpt if not isinstance(ckpt, dict) or 'state_dict' not in ckpt \
            else ckpt['state_dict']
        n_layers = 1 + max(
            int(k.split('.')[2]) for k in raw
            if k.startswith('transformer.blocks.'))
        flat = convert_esmc(raw, n_layers)
        dims = {'num_layers': n_layers,
                'embed_dim': raw['embed.weight'].shape[1],
                'attention_heads': {960: 15, 1152: 18}[
                    raw['embed.weight'].shape[1]]}
    else:
        raw = ckpt['model'] if 'model' in ckpt else ckpt
        n_layers = 1 + max(
            int(k.split('layers.')[1].split('.')[0]) for k in raw
            if '.layers.' in k)
        flat = convert_fairesm(raw, n_layers)
        embed_dim = flat['embed_tokens.weight'].shape[1]
        if args.attention_heads:
            heads = args.attention_heads
        else:
            try:
                heads = int(ckpt['cfg']['model'].encoder_attention_heads)
            except Exception:
                # published ESM2 sizes: 20 heads below 2560d, 40 above
                heads = 40 if embed_dim >= 2560 else 20
        dims = {'num_layers': n_layers, 'embed_dim': embed_dim,
                'attention_heads': heads}

    metadata = {'format': 'pt', 'name': args.name,
                **{k: str(v) for k, v in dims.items()}}
    save_file({k: _np(v).astype(np.float32) for k, v in flat.items()},
              args.dst, metadata)
    print(f'wrote {args.dst}: {len(flat)} tensors, metadata {metadata}')

    # load-check through the framework
    from esme_tpu.models.esm import ESM
    model = ESM.from_pretrained(args.dst, dtype='float32')
    print(f'load check OK: {type(model).__name__} '
          f'{model.config.num_layers}L/{model.config.embed_dim}d')


if __name__ == '__main__':
    main()
