"""Quantization tests (reference strategy: tests/test_quantize.py —
quantize/dequant closeness + model-level behavior)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esme_tpu.quant import (dequantize, quantize_int8, quantize_nf4,
                            quantized_matmul, quantize_model_params)


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32) * 0.05
    q = quantize_int8(w)
    assert q['qvalue'].dtype == jnp.int8
    back = dequantize(q, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    assert err < float(np.abs(w).max()) / 100   # ~1% of absmax


def test_nf4_roundtrip_error():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32) * 0.05
    q = quantize_nf4(w)
    assert q['qvalue'].dtype == jnp.uint8
    assert q['qvalue'].shape == (64, 64)        # packed
    back = dequantize(q, jnp.float32)
    rel = np.abs(np.asarray(back) - np.asarray(w)).mean() \
        / np.abs(np.asarray(w)).mean()
    assert rel < 0.15                           # NF4 ~4-bit error


def test_stacked_layers_quantize():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((3, 128, 64)), jnp.float32)
    for q in (quantize_int8(w), quantize_nf4(w)):
        back = dequantize(q, jnp.float32)
        assert back.shape == w.shape
        corr = np.corrcoef(np.asarray(back).ravel(),
                           np.asarray(w).ravel())[0, 1]
        assert corr > 0.99


def test_quantized_matmul_close():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    dense = x @ w
    q8 = quantized_matmul(x, quantize_int8(w))
    rel = np.abs(np.asarray(q8 - dense)).mean() / np.abs(dense).mean()
    assert rel < 0.02


@pytest.mark.parametrize('mode', ['8bit', '4bit'])
def test_model_quantized_forward(mode):
    from esme_tpu import ESM2, tokenize_unpad
    from esme_tpu.models.config import esm2_config
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0)
    seqs = ['MAGVLKE', 'LKEMPVAP']
    tok, _, cu, ml = tokenize_unpad(seqs, alphabet=m.alphabet)
    dense_lp = np.asarray(m.predict_log_prob(tok, pad_args=(cu, ml)))

    m.quantize(mode)
    assert 'qvalue' in m.params['layers']['attn']['q']
    q_lp = np.asarray(m.predict_log_prob(tok, pad_args=(cu, ml)))
    # quantized model stays close in probability space
    cos = (dense_lp * q_lp).sum() / (
        np.linalg.norm(dense_lp) * np.linalg.norm(q_lp))
    assert cos > 0.99
    # top-1 predictions mostly agree (random-init logits are nearly
    # flat, so 4-bit flips ties easily — looser bar there)
    agree = (dense_lp.argmax(-1) == q_lp.argmax(-1)).mean()
    assert agree > (0.9 if mode == '8bit' else 0.5)


def test_np_quantizers_match_jnp():
    """The streaming loader's host quantizers must be bit-identical to
    the in-memory jnp ones."""
    from esme_tpu.quant import quantize_int8_np, quantize_nf4_np
    rng = np.random.default_rng(4)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.07
    for np_fn, j_fn in ((quantize_int8_np, quantize_int8),
                        (quantize_nf4_np, quantize_nf4)):
        a = np_fn(w)
        b = j_fn(jnp.asarray(w))
        np.testing.assert_array_equal(a['qvalue'], np.asarray(b['qvalue']))
        np.testing.assert_array_equal(a['scale'], np.asarray(b['scale']))


@pytest.mark.parametrize('mode', ['8bit', '4bit'])
def test_quantize_at_load_streaming(tmp_path, mode):
    """from_pretrained(quantization=...) quantizes while streaming and
    matches load-then-quantize exactly (VERDICT r1 item 3)."""
    from esme_tpu import ESM, ESM2
    from esme_tpu.models.config import esm2_config
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0)
    path = str(tmp_path / 'q.safetensors')
    m.save_pretrained(path, name='esm2_tiny')

    streamed = ESM.from_pretrained(path, quantization=mode, dtype='float32')
    assert 'qvalue' in streamed.params['layers']['mlp']['fc1']
    assert 'kernel' not in streamed.params['layers']['attn']['q']

    post_hoc = ESM.from_pretrained(path, dtype='float32').quantize(mode)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        streamed.params, post_hoc.params)


def test_quantized_save_load_roundtrip(tmp_path):
    """Quantized models save and reload exactly (replaces the
    'unsupported' placeholder; our schema extension, see models/io.py)."""
    from esme_tpu import ESM, ESM2, tokenize_unpad
    from esme_tpu.models.config import esm2_config
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0).quantize('4bit')
    path = str(tmp_path / 'q4.safetensors')
    m.save_pretrained(path, name='esm2_tiny')

    loaded = ESM.from_pretrained(path, dtype='float32')
    assert 'qvalue' in loaded.params['layers']['mlp']['fc1']
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        m.params, loaded.params)

    seqs = ['MAGVLKE', 'LKEMPVAP']
    tok, _, cu, ml = tokenize_unpad(seqs, alphabet=m.alphabet)
    np.testing.assert_array_equal(
        np.asarray(m.predict_log_prob(tok, pad_args=(cu, ml))),
        np.asarray(loaded.predict_log_prob(tok, pad_args=(cu, ml))))


def test_nf4_outlier_rows_exact():
    """NF4 outlier-row decomposition: the top-absmax input rows are
    stored exactly and scattered back at dequant; without them a
    single 20x row poisons every 64-block scale it touches (measured
    cos_min 0.985 < 0.99 at 650M, results/quant_accuracy CSV)."""
    import numpy as np
    import jax.numpy as jnp
    from esme_tpu.quant import (dequantize, quantize_nf4,
                                quantize_nf4_np)

    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.02
    hot = rng.choice(128, size=8, replace=False)
    w[hot] *= 20.0

    for q in (quantize_nf4_np(w), quantize_nf4(jnp.asarray(w))):
        q = {k: jnp.asarray(v) for k, v in q.items()}
        deq = np.asarray(dequantize(q, dtype=jnp.float32))
        # outlier rows come back exactly
        np.testing.assert_allclose(deq[hot], w[hot], rtol=0, atol=0)
        # the rest at normal NF4 error (~5% of blockwise absmax)
        err = np.abs(deq - w).max()
        assert err < 0.01, err


def test_nf4_outlier_stacked_roundtrip():
    """Stacked (L, in, out) kernels round-trip through save/load flat
    schema with the outlier leaves."""
    import numpy as np
    import jax.numpy as jnp
    from esme_tpu.quant import dequantize, quantize_nf4_np

    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 128, 64)).astype(np.float32) * 0.02
    w[1, 5] *= 30.0
    q = quantize_nf4_np(w)
    deq = np.asarray(dequantize({k: jnp.asarray(v) for k, v in q.items()},
                                dtype=jnp.float32))
    np.testing.assert_allclose(deq[1, 5], w[1, 5], rtol=0, atol=0)
    assert np.abs(deq - w).max() < 0.01


def test_outlier_schema_guard(tmp_path):
    """A checkpoint written with outlier-row decomposition carries a
    qscheme metadata marker; loading a copy whose qoutlier_* keys were
    stripped fails loudly instead of silently reconstructing weights
    with zeroed hot rows (ADVICE r4 medium #1)."""
    import pytest
    from safetensors import numpy as stn
    from safetensors import safe_open
    from esme_tpu import ESM, ESM2
    from esme_tpu.models.config import esm2_config
    from esme_tpu.models.io import read_metadata

    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0)
    # force outliers: blow up a few rows so quantize_nf4 decomposes
    fc1 = np.array(m.params['layers']['mlp']['fc1']['kernel'])
    fc1[:, :4, :] *= 40.0
    m.params['layers']['mlp']['fc1']['kernel'] = jnp.asarray(fc1)
    m.quantize('4bit')
    assert 'outlier_idx' in m.params['layers']['mlp']['fc1']

    path = str(tmp_path / 'q4o.safetensors')
    m.save_pretrained(path, name='esm2_tiny')
    meta = read_metadata(path)
    assert meta.get('qscheme') == 'outlier-rows-v1'

    # intact file loads fine
    ESM.from_pretrained(path, dtype='float32')

    # strip the qoutlier_* keys (an old-schema writer/reader would)
    with safe_open(path, framework='numpy') as f:
        arrays = {k: f.get_tensor(k) for k in f.keys()
                  if 'qoutlier' not in k}
    stripped = str(tmp_path / 'q4o_stripped.safetensors')
    stn.save_file(arrays, stripped, meta)
    with pytest.raises(ValueError, match='qoutlier'):
        ESM.from_pretrained(stripped, dtype='float32')
