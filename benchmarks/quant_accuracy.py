"""Quantization accuracy at scale: bf16 vs int8 vs NF4.

The reference's quantization contract is quality-level: pretrained
pseudo-perplexity stays < 2 and logits track the full-precision model
(reference: tests/test_esm.py:209-261, per-token ``all(sim > .99)``).
No pretrained weights are reachable in this environment (no egress),
so this measures the same two quantities against the bf16 model as the
oracle on seeded 650M-architecture weights.

Pass/fail gates on the **per-token cosine minimum** (the reference's
``all(sim > .99)`` form) with per-mode thresholds. The
pseudo-perplexity columns are reported as *diagnostics only*: at
random init the ppl scale (~47) is noise — round-3 even recorded
quantization "improving" ppl by 2.15 — so a ppl gate would launder
noise into evidence. Observed baselines for regression eyeballing:
8bit cos_min ~0.9997 / |ppl rel| ~0.0007; 4bit cos_min ~0.997 /
|ppl rel| ~0.05.

``--outliers`` injects the trained-weight regime the random init
lacks: real pretrained transformers concentrate large weights in a few
feature dimensions (the LLM.int8 outlier phenomenon the reference
handles by decomposing columns over threshold 6,
reference: esme/quantization.py:37-84). We scale a handful of input
rows of every linear by 20x, which inflates every per-channel absmax
scale — the worst case for absmax quantization.

Usage:
  python benchmarks/quant_accuracy.py --model esm2_650m [--outliers]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np

# Per-mode per-token cosine-minimum gates. 8bit per-channel absmax is
# near-lossless; NF4 4-bit tracks the reference contract threshold.
COS_MIN_THRESHOLDS = {'8bit': 0.999, '4bit': 0.99}


def inject_outliers(params, cfg, n_rows=8, factor=20.0, seed=7):
    """Scale ``n_rows`` random input rows of every attention/MLP linear
    kernel by ``factor`` — the synthetic trained-weight outlier regime
    (see module docstring)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def scale_kernel(k):
        d_in = k.shape[-2]
        rows = rng.choice(d_in, size=min(n_rows, d_in), replace=False)
        mult = np.ones((d_in, 1), np.float32)
        mult[rows] = factor
        return (k.astype(jnp.float32) * jnp.asarray(mult)).astype(k.dtype)

    params = dict(params)
    layers = {k: dict(v) for k, v in params['layers'].items()}
    names = {'attn': ('q', 'k', 'v', 'out'),
             'mlp': ('gate', 'up', 'down') if cfg.mlp == 'swiglu'
             else ('fc1', 'fc2')}
    for grp, lin_names in names.items():
        layers[grp] = dict(layers[grp])
        for name in lin_names:
            lin = dict(layers[grp][name])
            lin['kernel'] = scale_kernel(lin['kernel'])
            layers[grp][name] = lin
    params['layers'] = layers
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='esm2_650m')
    ap.add_argument('--tokens', type=int, default=8192)
    ap.add_argument('--outliers', action='store_true',
                    help='inject synthetic weight outliers (20x on 8 '
                         'input rows per linear) before quantizing')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import _class_for, forward_flat, packed_meta
    from esme_tpu.quant import quantize_model_params

    cfg = config_for(args.model)
    model = _class_for(cfg.family)(config=cfg, rng=0)
    bf16_params = model.params
    if args.outliers:
        bf16_params = inject_outliers(bf16_params, cfg)

    rng = np.random.default_rng(0)
    T = args.tokens
    lens, total = [], 0
    while total + 514 <= T - 128:
        lens.append(514)
        total += 514
    cu = np.cumsum([0, *lens]).astype(np.int32)
    tokens = np.full(T, Alphabet.padding_idx, np.int32)
    tokens[:cu[-1]] = rng.integers(4, 24, cu[-1])
    for i in range(len(lens)):
        tokens[cu[i]] = Alphabet.cls_idx
        tokens[cu[i + 1] - 1] = Alphabet.eos_idx
    seg, pos = packed_meta(jnp.asarray(cu), T)
    tj = jnp.asarray(tokens)
    n_real = int(cu[-1])

    def logits_of(params):
        lp = forward_flat(params, cfg, tj, seg, pos, with_head=True,
                          log_prob=True, attn_impl='auto',
                          max_seqlen=514)
        return np.asarray(lp[:n_real], np.float32)

    def pppl(logp):
        # pseudo-perplexity proxy: exp of mean NLL of the observed
        # token under the (unmasked) model — DIAGNOSTIC ONLY at random
        # init (see module docstring); not part of the pass gate
        nll = -logp[np.arange(n_real), tokens[:n_real]]
        return float(np.exp(nll.mean()))

    base = logits_of(bf16_params)
    base_ppl = pppl(base)

    regime = 'outlier' if args.outliers else 'randn'
    print('mode,regime,cos_sim_mean,cos_sim_min,max_abs_logit_diff,'
          'pseudo_ppl,ppl_delta,ppl_rel_delta,cos_min_threshold,pass')
    print(f'bf16,{regime},1.0,1.0,0.0,{base_ppl:.4f},0.0,0.0,,True',
          flush=True)

    ok_all = True
    for mode in ('8bit', '4bit'):
        qparams = quantize_model_params(
            jax.tree.map(lambda x: x, bf16_params), cfg, mode)
        lq = logits_of(qparams)
        num = (base * lq).sum(-1)
        den = np.linalg.norm(base, axis=-1) * np.linalg.norm(lq, axis=-1)
        cos = num / np.maximum(den, 1e-9)
        q_ppl = pppl(lq)
        delta = q_ppl - base_ppl
        rel = abs(delta) / base_ppl
        thr = COS_MIN_THRESHOLDS[mode]
        # reference contract form: all(sim > threshold), i.e. the MIN
        ok = bool(cos.min() > thr)
        ok_all &= ok
        print(f'{mode},{regime},{cos.mean():.5f},{cos.min():.5f},'
              f'{np.abs(base - lq).max():.4f},{q_ppl:.4f},'
              f'{delta:+.4f},{rel:.4f},{thr},{ok}', flush=True)
        del qparams, lq

    sys.exit(0 if ok_all else 1)


if __name__ == '__main__':
    main()
