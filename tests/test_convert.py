"""Checkpoint converter tests: fair-esm/ESMC key schemas -> reference
schema round-trips through the model loader."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/repo/tools')

from convert_fairesm import convert_esmc, convert_fairesm

from esme_tpu import ESM2, ESMC
from esme_tpu.models.config import esm2_config, esmc_config
from esme_tpu.models.io import flat_to_params, params_to_flat


def test_convert_fairesm_roundtrip():
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0)
    flat = {k: np.asarray(v) for k, v in
            params_to_flat(m.params, cfg).items()}

    # rebuild a fair-esm-style dict from the reference-schema tensors
    fair = {}
    for i in range(2):
        fair[f'encoder.sentence_encoder.layers.{i}.self_attn_layer_norm.weight'] = \
            flat[f'layers.{i}.self_attn.norm.weight']
        fair[f'encoder.sentence_encoder.layers.{i}.self_attn_layer_norm.bias'] = \
            flat[f'layers.{i}.self_attn.norm.bias']
        for j in ('q', 'k', 'v', 'out'):
            fair[f'encoder.sentence_encoder.layers.{i}.self_attn.{j}_proj.weight'] = \
                flat[f'layers.{i}.self_attn.{j}.weight']
            fair[f'encoder.sentence_encoder.layers.{i}.self_attn.{j}_proj.bias'] = \
                flat[f'layers.{i}.self_attn.{j}.bias']
        fair[f'encoder.sentence_encoder.layers.{i}.final_layer_norm.weight'] = \
            flat[f'layers.{i}.final.0.weight']
        fair[f'encoder.sentence_encoder.layers.{i}.final_layer_norm.bias'] = \
            flat[f'layers.{i}.final.0.bias']
        fair[f'encoder.sentence_encoder.layers.{i}.fc1.weight'] = \
            flat[f'layers.{i}.final.1.weight']
        fair[f'encoder.sentence_encoder.layers.{i}.fc1.bias'] = \
            flat[f'layers.{i}.final.1.bias']
        fair[f'encoder.sentence_encoder.layers.{i}.fc2.weight'] = \
            flat[f'layers.{i}.final.3.weight']
        fair[f'encoder.sentence_encoder.layers.{i}.fc2.bias'] = \
            flat[f'layers.{i}.final.3.bias']
        fair[f'encoder.sentence_encoder.layers.{i}.self_attn.rot_emb.inv_freq'] = \
            np.zeros(8)   # must be dropped
    fair['encoder.sentence_encoder.embed_tokens.weight'] = \
        flat['embed_tokens.weight']
    fair['encoder.sentence_encoder.emb_layer_norm_after.weight'] = \
        flat['emb_layer_norm_after.weight']
    fair['encoder.sentence_encoder.emb_layer_norm_after.bias'] = \
        flat['emb_layer_norm_after.bias']
    fair['encoder.lm_head.dense.weight'] = flat['lm_head.dense.weight']
    fair['encoder.lm_head.dense.bias'] = flat['lm_head.dense.bias']
    fair['encoder.lm_head.layer_norm.weight'] = \
        flat['lm_head.layer_norm.weight']
    fair['encoder.lm_head.layer_norm.bias'] = \
        flat['lm_head.layer_norm.bias']
    fair['encoder.lm_head.weight'] = flat['lm_head.final.weight']
    fair['encoder.lm_head.bias'] = flat['lm_head.final.bias']

    converted = convert_fairesm(fair, num_layers=2)
    assert not any('inv_freq' in k for k in converted)
    for k, v in converted.items():
        np.testing.assert_array_equal(v, flat[k], err_msg=k)
    # loads back into identical params
    params = flat_to_params(converted, cfg)
    out0 = np.asarray(params['layers']['attn']['q']['kernel'])
    want = np.asarray(m.params['layers']['attn']['q']['kernel'])
    np.testing.assert_allclose(out0, want)


def test_convert_esmc_splits_fused():
    cfg = esmc_config(num_layers=2, embed_dim=48, attention_heads=4,
                      dtype='float32')
    m = ESMC(config=cfg, rng=1)
    flat = {k: np.asarray(v) for k, v in
            params_to_flat(m.params, cfg).items()}

    es = {}
    es['embed.weight'] = flat['embed_tokens.weight']
    es['transformer.norm.weight'] = flat['emb_layer_norm_after.weight']
    es['sequence_head.0.weight'] = flat['lm_head.dense.weight']
    es['sequence_head.0.bias'] = flat['lm_head.dense.bias']
    es['sequence_head.2.weight'] = flat['lm_head.layer_norm.weight']
    es['sequence_head.2.bias'] = flat['lm_head.layer_norm.bias']
    es['sequence_head.3.weight'] = flat['lm_head.final.weight']
    es['sequence_head.3.bias'] = flat['lm_head.final.bias']
    for i in range(2):
        blk = f'transformer.blocks.{i}'
        es[f'{blk}.attn.layernorm_qkv.0.weight'] = \
            flat[f'layers.{i}.self_attn.norm.weight']
        es[f'{blk}.attn.layernorm_qkv.0.bias'] = \
            flat[f'layers.{i}.self_attn.norm.bias']
        es[f'{blk}.attn.layernorm_qkv.1.weight'] = np.concatenate([
            flat[f'layers.{i}.self_attn.q.weight'],
            flat[f'layers.{i}.self_attn.k.weight'],
            flat[f'layers.{i}.self_attn.v.weight']])
        es[f'{blk}.attn.out_proj.weight'] = \
            flat[f'layers.{i}.self_attn.out.weight']
        es[f'{blk}.attn.q_ln.weight'] = \
            flat[f'layers.{i}.self_attn.layernorm_q.weight']
        es[f'{blk}.attn.k_ln.weight'] = \
            flat[f'layers.{i}.self_attn.layernorm_k.weight']
        es[f'{blk}.ffn.0.weight'] = flat[f'layers.{i}.final.0.weight']
        es[f'{blk}.ffn.0.bias'] = flat[f'layers.{i}.final.0.bias']
        es[f'{blk}.ffn.1.weight'] = np.concatenate([
            flat[f'layers.{i}.final.1.activation.weight'],
            flat[f'layers.{i}.final.1.fc.weight']])
        es[f'{blk}.ffn.3.weight'] = flat[f'layers.{i}.final.2.weight']

    converted = convert_esmc(es, num_layers=2)
    for k, v in converted.items():
        np.testing.assert_array_equal(v, flat[k], err_msg=k)
