"""Differential tests against the reference implementation itself.

The reference's own test strategy is golden-reference testing against
downloaded pretrained weights (reference: tests/conftest.py:17-46,
tests/test_esm.py:25-29,209-261). This environment has NO network
access (huggingface.co unreachable; no cached checkpoints on disk), so
instead the reference's *actual model code* (/root/reference/esme) runs
on CPU as the oracle, with a pure-torch flash-attn shim
(tests/refshim.py). Weights are seeded-random but flow through the
reference's real safetensors schema, so loader + numerics + API parity
are all exercised end to end. The numeric contracts mirror the
reference's: fp32 allclose, bf16 logits cosine similarity > 0.99
(reference: tests/test_esm.py:25-29), incl. at the real ESM1b size
(33 layers / 1280 dim).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

if not os.path.isdir('/root/reference/esme'):
    pytest.skip('reference tree unavailable', allow_module_level=True)

import torch

from refshim import import_reference, seed_all, state_dict_to_safetensors

from esme_tpu.models.esm import ESM
from esme_tpu.alphabet import Alphabet, Alphabet3, tokenize, tokenize_unpad

REF = import_reference()

# real protein sequences (reference: tests/conftest.py:55-56)
P53 = ('MEEPQSDPSVEPPLSQETFSDLWKLLPENNVLSPLPSQAMDDLMLSPDDIEQWFTEDPGPDEAP'
       'RMPEAAPPVAPAPAAPTPAAPAPAPSWPLSSSVPSQKTYQGSYGFRLGFLHSGTAKSVTCTYSP'
       'ALNKMFCQLAKTCPVQLWVDSTPPPGTRVRAMAIYKQSQHMTEVVRRCPHHERCSDSDGLAPPQ'
       'HLIRVEGNLRVEYLDDRNTFRHSVVVPYEPPEVGSDCTTIHYNYMCNSSCMGGMNRRPILTIIT'
       'LEDSSGNLLGRNSFEVRVCACPGRDRRTEEENLRKKGEPHHELPPGSTKRALPNNTSSSPQPKK'
       'KPLDGEYFTLQIRGRERFEMFRELNEALELKDAQAGKEPGGSRAHSSHLKSKKGQSTSRHKKLM'
       'FKTEGPDSD')
CALM1 = ('MADQLTEEQIAEFKEAFSLFDKDGDGTITTKELGTVMRSLGQNPTEAELQDMINEVDADGNG'
         'TIDFPEFLTMMARKMKDTDSEEEIREAFRVFDKDGNGYISAAELRHVMTNLGEKLTDEEVDE'
         'MIREADIDGDGQVNYEEFVQMMTAK')

SEQS = [P53[:90], CALM1[:57], P53[30:150], CALM1]


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _make_pair(tmp_path, family='esm2', dtype='float32', seed=0, **kw):
    """Seeded reference model (fp32, CPU) + our model loaded from the
    reference's own state_dict through the safetensors schema."""
    seed_all(seed)
    if family == 'esm2':
        ref = REF['esm'].ESM2(dtype=torch.float32, **kw)
        name = 'esm2_test'
    elif family == 'esm1b':
        ref = REF['esm'].ESM1b(dtype=torch.float32)
        name = 'esm1b'
    elif family == 'esm1v':
        ref = REF['esm'].ESM1v(dtype=torch.float32)
        name = 'esm1v_1'
    elif family == 'esmc':
        ref = REF['esm'].ESMC(dtype=torch.float32, **kw)
        name = 'esmc_test'
    ref = ref.eval()
    path = tmp_path / f'{name}.safetensors'
    state_dict_to_safetensors(
        ref, path, name,
        num_layers=getattr(ref, 'num_layers', 33),
        embed_dim=getattr(ref, 'embed_dim', 1280),
        attention_heads=getattr(ref, 'attention_heads', 20))
    ours = ESM.from_pretrained(str(path), dtype=dtype)
    return ref, ours


def _ref_packed_logprob(ref, seqs, alphabet=Alphabet):
    tokens, _, cu_lens, max_len = REF['alphabet'].tokenize_unpad(
        seqs, alphabet=_ref_alpha(alphabet))
    with torch.no_grad():
        out = ref.predict_log_prob(tokens, (cu_lens, int(max_len)))
    return out.float().numpy()


def _ref_alpha(alphabet):
    return REF['alphabet'].Alphabet if alphabet is Alphabet \
        else REF['alphabet'].Alphabet3


def _ours_packed_logprob(ours, seqs, alphabet=Alphabet):
    tokens, _, cu_lens, max_len = tokenize_unpad(seqs, alphabet=alphabet)
    return np.asarray(ours.predict_log_prob(
        tokens, (cu_lens, int(max_len)), attn_impl='reference'))


# ---------------------------------------------------------------------------
# ESM2
# ---------------------------------------------------------------------------

class TestESM2:
    @pytest.fixture(scope='class')
    def pair(self, tmp_path_factory):
        return _make_pair(tmp_path_factory.mktemp('esm2'),
                          num_layers=2, embed_dim=64, attention_heads=4)

    def test_packed_logprob_fp32(self, pair):
        ref, ours = pair
        r = _ref_packed_logprob(ref, SEQS)
        o = _ours_packed_logprob(ours, SEQS)
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=1e-3)

    def test_padded_logits_fp32(self, pair):
        ref, ours = pair
        toks = REF['alphabet'].tokenize(SEQS, alphabet=_ref_alpha(Alphabet))
        with torch.no_grad():
            r = ref(toks).float().numpy()
        o = np.asarray(ours.forward(
            tokenize(SEQS, alphabet=Alphabet), attn_impl='reference'))
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=1e-3)
        assert _cos(o, r) > 0.9999

    def test_mask_margin_parity(self, pair):
        ref, ours = pair
        from esme_tpu.variant import predict_mask_margin
        df_ref = REF['variant'].predict_mask_margin(
            ref, CALM1[:40], alphabet=_ref_alpha(Alphabet))
        df_ours = predict_mask_margin(ours, CALM1[:40], alphabet=Alphabet)
        assert list(df_ref.index) == list(df_ours.index)
        np.testing.assert_allclose(df_ours['score'].values,
                                   df_ref['score'].values,
                                   atol=5e-4, rtol=1e-3)

    def test_pseudoperplexity_parity(self, pair):
        ref, ours = pair
        from esme_tpu.variant import predict_pseudoperplexity
        p_ref = REF['variant'].predict_pseudoperplexity(
            ref, CALM1[:40], alphabet=_ref_alpha(Alphabet))
        p_ours = predict_pseudoperplexity(ours, CALM1[:40],
                                          alphabet=Alphabet)
        assert abs(p_ours - p_ref) < 0.02 * p_ref

    def test_lora_roundtrip_from_reference(self, pair, tmp_path):
        """Reference-written LoRA safetensors load into our model and
        produce the same outputs (reference format:
        esme/esm.py:564-585)."""
        ref, ours = pair
        seed_all(7)
        ref.add_lora(rank=4, alpha=8.0, adapter_names=['a1', 'a2'],
                     layers=('query', 'value', 'output'))
        # zero-init B would make LoRA a no-op; randomize to make the
        # comparison meaningful
        with torch.no_grad():
            for mod in ref.modules():
                if isinstance(mod, REF['lora'].LoRA):
                    for p in mod.lora_B.values():
                        p.copy_(torch.randn_like(p) * 0.05)
        path = tmp_path / 'adapters.safetensors'
        ref.save_lora(str(path))
        ours.load_lora(str(path))

        toks = REF['alphabet'].tokenize(SEQS[:2],
                                        alphabet=_ref_alpha(Alphabet))
        with torch.no_grad():
            r = ref(toks, lora_names=['a1']).float().numpy()
        o = np.asarray(ours.forward(tokenize(SEQS[:2], alphabet=Alphabet),
                                    lora_names=['a1'],
                                    attn_impl='reference'))
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=1e-3)


def test_esm2_8m_architecture(tmp_path):
    """Exact ESM2-8M architecture (6L/320d/20h): fp32 allclose and bf16
    cos-sim > 0.99 (the reference's pretrained contract,
    tests/test_esm.py:25-29)."""
    ref, ours = _make_pair(tmp_path, num_layers=6, embed_dim=320,
                           attention_heads=20)
    r = _ref_packed_logprob(ref, SEQS)
    o = _ours_packed_logprob(ours, SEQS)
    np.testing.assert_allclose(o, r, atol=5e-4, rtol=1e-3)

    ours_bf16 = ESM.from_pretrained(
        str(tmp_path / 'esm2_test.safetensors'), dtype='bfloat16')
    ob = _ours_packed_logprob(ours_bf16, SEQS)
    assert _cos(ob, r) > 0.99


# ---------------------------------------------------------------------------
# ESM1b / ESM1v (learned positions; full 33L/1280d size)
# ---------------------------------------------------------------------------

def test_esm1b_full_size(tmp_path):
    """ESM1b is fixed at 33 layers / 1280 dim — this doubles as the
    full-depth bf16 drift check. Reference contract: padded vs packed
    exactly equal (tests/test_esm.py:84-105), bf16 cos-sim > 0.99."""
    ref, ours = _make_pair(tmp_path, family='esm1b')
    seqs = SEQS[:2]
    r = _ref_packed_logprob(ref, seqs)
    o = _ours_packed_logprob(ours, seqs)
    assert _cos(o, r) > 0.9999
    np.testing.assert_allclose(o, r, atol=3e-3, rtol=1e-2)

    # packed vs padded consistency on our side
    toks = tokenize(seqs, alphabet=Alphabet)
    o_pad = np.asarray(ours.predict_log_prob(toks, attn_impl='reference'))
    lens = [len(s) + 2 for s in seqs]
    flat = np.concatenate([o_pad[i, :n] for i, n in enumerate(lens)])
    np.testing.assert_allclose(flat, o, atol=1e-4, rtol=1e-3)

    ours_bf16 = ESM.from_pretrained(
        str(tmp_path / 'esm1b.safetensors'), dtype='bfloat16')
    ob = _ours_packed_logprob(ours_bf16, seqs)
    assert _cos(ob, r) > 0.99


def test_esm1v(tmp_path):
    ref, ours = _make_pair(tmp_path, family='esm1v')
    seqs = [CALM1[:57]]
    r = _ref_packed_logprob(ref, seqs)
    o = _ours_packed_logprob(ours, seqs)
    assert _cos(o, r) > 0.9999
    np.testing.assert_allclose(o, r, atol=3e-3, rtol=1e-2)


def test_esm1b_position_overflow_raises():
    """Sequences past the learned-position table must raise, matching
    the reference (esme/embedding.py:47-51,69-74)."""
    from esme_tpu.models.esm import ESM1v
    ours = ESM1v(dtype='bfloat16')       # 4096-position table
    long_seq = 'A' * 4100
    toks = tokenize([long_seq], alphabet=Alphabet)
    with pytest.raises(ValueError, match='position'):
        ours.forward(toks, attn_impl='reference')


# ---------------------------------------------------------------------------
# ESMC
# ---------------------------------------------------------------------------

def test_esmc(tmp_path):
    ref, ours = _make_pair(tmp_path, family='esmc', num_layers=2,
                           embed_dim=64, attention_heads=4)
    r = _ref_packed_logprob(ref, SEQS, alphabet=Alphabet3)
    o = _ours_packed_logprob(ours, SEQS, alphabet=Alphabet3)
    np.testing.assert_allclose(o, r, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Rotary: ours vs the reference module directly
# ---------------------------------------------------------------------------

def test_rotary_parity():
    seed_all(3)
    T, H, D = 48, 4, 16
    q = torch.randn(T, H, D)
    k = torch.randn(T, H, D)
    cu = torch.tensor([0, 10, 31, 48], dtype=torch.int32)

    rot = REF['rotary'].RotaryEmbedding(D)
    with torch.no_grad():
        qr, kr = rot(q.clone(), k.clone(), cu, 21)

    from esme_tpu.ops.rotary import apply_rotary_qk
    from esme_tpu.ops.segment import (positions_from_cu_lens,
                                      segment_ids_from_cu_lens)
    seg = segment_ids_from_cu_lens(jnp.asarray(cu.numpy()), T)
    pos = positions_from_cu_lens(jnp.asarray(cu.numpy()), T, seg)
    qo, ko = apply_rotary_qk(jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
                             pos)
    np.testing.assert_allclose(np.asarray(qo), qr.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ko), kr.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Tokenizer: ours vs the reference functions directly
# ---------------------------------------------------------------------------

def test_tokenize_matches_reference():
    seqs = [P53, CALM1, 'MPV<mask>AP']
    for alpha, ref_alpha in ((Alphabet, REF['alphabet'].Alphabet),
                             (Alphabet3, REF['alphabet'].Alphabet3)):
        r = REF['alphabet'].tokenize(seqs, alphabet=ref_alpha).numpy()
        o = tokenize(seqs, alphabet=alpha)
        np.testing.assert_array_equal(o, r)

        rt, ri, rc, rm = REF['alphabet'].tokenize_unpad(
            seqs, alphabet=ref_alpha)
        ot, oi, oc, om = tokenize_unpad(seqs, alphabet=alpha)
        np.testing.assert_array_equal(ot, rt.numpy())
        np.testing.assert_array_equal(oi, ri.numpy())
        np.testing.assert_array_equal(oc, rc.numpy())
        assert om == int(rm)


def test_masked_loss_matches_reference():
    seed_all(11)
    T, V = 37, 33
    logits = torch.randn(T, V)
    target = torch.randint(4, 24, (T,))
    mask = torch.rand(T) < 0.3
    mask[0] = True
    r = REF['loss'].cross_entropy(logits, target, mask)

    from esme_tpu.loss import cross_entropy
    o = cross_entropy(jnp.asarray(logits.numpy()),
                      jnp.asarray(target.numpy()),
                      jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(float(o), float(r), atol=1e-5)


# ---------------------------------------------------------------------------
# Gradient parity vs the torch reference (round 5): the whole custom-
# VJP chain (flash fwd/bwd incl. the fused job-mode backward,
# gelu_linear, rotary VJP, fused attention boundary) against an
# independent autograd through the reference's own model code.
# ---------------------------------------------------------------------------

def test_grad_parity_vs_reference(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F
    from esme_tpu.loss import cross_entropy
    from esme_tpu.models.esm import forward_flat, packed_meta
    from esme_tpu.ops.flash import host_num_jobs, JOB_MODE_MIN_JOBS

    ref, ours = _make_pair(tmp_path, num_layers=2, embed_dim=64,
                           attention_heads=4)
    seqs = ['MAGVLKE' * 20, 'LKE' * 45, 'MPVAP' * 33, 'KWQ' * 60]

    # torch side: masked mean-CE over fixed positions, backward
    tokens_t, _, cu_t, max_len_t = REF['alphabet'].tokenize_unpad(
        seqs, alphabet=_ref_alpha(Alphabet))
    T = tokens_t.shape[0]
    rng = np.random.default_rng(0)
    mask_np = rng.random(T) < 0.15
    mask_np[0] = True                       # at least one
    ref.zero_grad()
    ref.train(False)
    logits_t = ref(tokens_t, (cu_t, int(max_len_t)))
    mask_t = torch.from_numpy(mask_np)
    loss_t = F.cross_entropy(logits_t[mask_t],
                             tokens_t[mask_t].long())
    loss_t.backward()

    # our side: same loss via forward_flat with the flash kernels
    # (CPU interpret) FORCED through job mode so the fused backward
    # runs (the path the 50k bench exercises on chip)
    import esme_tpu.ops.flash as flash
    tokens, _, cu, max_len = tokenize_unpad(seqs, alphabet=Alphabet)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  tokens_t.numpy())
    seg_ids, pos_ids = packed_meta(jnp.asarray(np.asarray(cu)), T)
    targets = jnp.asarray(np.asarray(tokens), jnp.int32)
    mask_j = jnp.asarray(mask_np)

    old_gate = flash.JOB_MODE_MIN_JOBS
    flash.JOB_MODE_MIN_JOBS = 1
    try:
        from esme_tpu.ops.flash import host_num_jobs_from_cu
        nj = host_num_jobs_from_cu(np.asarray(cu), T)
        assert nj is not None, 'job mode must engage for this test'

        def loss_fn(params):
            logits = forward_flat(params, ours.config,
                                  jnp.asarray(np.asarray(tokens),
                                              jnp.int32),
                                  seg_ids, pos_ids, with_head=True,
                                  attn_impl='flash',
                                  max_seqlen=int(max_len), num_jobs=nj)
            return cross_entropy(logits, targets, mask_j)

        loss_j, grads = jax.value_and_grad(loss_fn)(ours.params)
    finally:
        flash.JOB_MODE_MIN_JOBS = old_gate

    assert abs(float(loss_j) - float(loss_t)) < 1e-4

    def t_grad(name):
        p = dict(ref.named_parameters())[name]
        assert p.grad is not None, name
        return p.grad.detach().numpy()

    # NB comparisons are restricted to gradients whose cotangent path
    # avoids the reference's rotary backward: the reference re-applies
    # R instead of R^T to q/k cotangents (reference:
    # esme/rotary.py:46-63 — a known quirk this repo deliberately does
    # NOT replicate; SURVEY.md L1 rotary row), so any gradient whose
    # upstream chain crosses an attention backward — including every
    # layer-0 weight and the embedding — is systematically off by the
    # rotation mismatch in the REFERENCE (measured ~2.6% here). Clean
    # comparisons: the LAST layer's rope-independent weights (its
    # cotangents come only from the head and its own MLP) and the LM
    # head. Our own q/k/dq/dk gradients are validated against jax
    # autodiff through the einsum reference path in tests/test_flash.py
    # and tests/test_token_minor.py.
    last = ours.config.num_layers - 1
    checks = [
        ('v_last',
         np.asarray(grads['layers']['attn']['v']['kernel'][last]),
         t_grad(f'layers.{last}.self_attn.v.weight').T),
        ('out_last',
         np.asarray(grads['layers']['attn']['out']['kernel'][last]),
         t_grad(f'layers.{last}.self_attn.out.weight').T),
        # fc2 exercises the gelu_linear memory-lean VJP
        ('fc2_last',
         np.asarray(grads['layers']['mlp']['fc2']['kernel'][last]),
         t_grad(f'layers.{last}.final.3.weight').T),
        ('fc1b_last',
         np.asarray(grads['layers']['mlp']['fc1']['bias'][last]),
         t_grad(f'layers.{last}.final.1.bias')),
        ('lmdense', np.asarray(grads['lm_head']['dense']['kernel']),
         t_grad('lm_head.dense.weight').T),
    ]
    for name, got, want in checks:
        scale = np.abs(want).max() + 1e-12
        np.testing.assert_allclose(got, want, atol=2e-3 * scale,
                                   rtol=2e-3, err_msg=name)
