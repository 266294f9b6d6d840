"""ESM model families: ESM2, ESM1b, ESM1v, ESMC.

TPU-native re-design of the reference model layer (reference:
esme/esm.py:28-946). The forward is a pure function over a param
pytree, jitted per static configuration; the classes are thin stateful
wrappers holding ``(config, params)`` and mirroring the reference's
public API surface: ``from_pretrained``, ``forward_representation``,
``forward``, ``predict_log_prob``, ``predict_prob``, ``add_lora``,
``save_lora``/``load_lora``, ``mark_lmhead``.

Layout contract: computation always runs over the packed flat token
layout. Padded ``(B, L)`` inputs are repacked valid-tokens-first with
one static-shape gather (the XLA replacement for flash-attn's
``unpad_input``/``pad_input``, reference: esme/esm.py:238,255): segment
ids stay monotonic so the flash kernel's block spans are tight, pads
live in fake trailing segments that real tokens never attend, and
outputs scatter back to ``(B, L)`` with the reference's pad-fill
semantics.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import Alphabet, Alphabet3
from ..ops.segment import (positions_from_cu_lens, segment_ids_from_cu_lens,
                           unpad_gather_meta)
from .config import (ESMConfig, esm1b_config, esm1v_config, esm2_config,
                     esmc_config)
from .init import init_params
from .io import (config_from_metadata, load_pretrained, read_metadata,
                 save_pretrained)
from .modules import (embed_tokens, layer_stack, learned_positions_flat,
                      roberta_lm_head)
from ..ops.norm import apply_norm


# ---------------------------------------------------------------------------
# Pure forward
# ---------------------------------------------------------------------------

# Token-minor residual-stream gate (see forward_flat): measured v5e
# crossover between the relayout-free (C, T) trunk and the standard
# path. NB forward_flat is cached per call-site hash; changing this at
# runtime affects only fresh compilations.
TM_MIN_TOKENS = 16384

def _embed_flat(params, cfg: ESMConfig, tokens, pos_ids):
    """Embedding over flat tokens (reference: esme/esm.py:176-199 ESM2,
    636-655 ESM1b, 698-715 ESM1v, 876 ESMC)."""
    x = embed_tokens(tokens, params, cfg)
    if cfg.learned_positions is not None:
        x = x + learned_positions_flat(pos_ids, params, cfg)
    if cfg.emb_layer_norm_before:
        x = apply_norm(x, params['emb_norm_before'])
    return x


@partial(jax.jit, static_argnames=(
    'cfg', 'with_head', 'log_prob', 'lora_names', 'attn_impl',
    'checkpointing', 'collect_layers', 'max_seqlen', 'layer_gather',
    'outer_gather', 'lora_dropout', 'kv_gather', 'num_jobs', 'remat'))
def forward_flat(params, cfg: ESMConfig, tokens, seg_ids, pos_ids, *,
                 with_head: bool = True, log_prob: bool = False,
                 lora_names: Optional[Tuple[str, ...]] = None,
                 attn_impl: str = 'auto', checkpointing: bool = False,
                 collect_layers: Optional[Tuple[int, ...]] = None,
                 max_seqlen: Optional[int] = None,
                 layer_gather=None, outer_gather=None,
                 lora_dropout: float = 0.0, dropout_rng=None,
                 kv_gather=None, num_jobs=None, remat: str = 'full'):
    """Trunk (+ optional LM head) over flat tokens with explicit
    segment/position metadata. Returns ``(T, C)``.

    ``layer_gather``/``outer_gather`` are the FSDP all-gather hooks
    (see esme_tpu.parallel.fsdp) used when params arrive sharded inside
    a ``shard_map``.
    """
    if outer_gather is not None:
        outer = outer_gather({k: v for k, v in params.items()
                              if k != 'layers'})
        params = {**outer, 'layers': params['layers']}

    # Pad ONCE to the flash kernel's zero-copy alignment so the
    # per-layer kernel calls skip their pad/slice/fake-segment setup
    # (33 layers × 3 tensors of pad traffic otherwise). The tail forms
    # one extra fake segment that real tokens never attend.
    from ..ops.flash import ALIGN
    T = tokens.shape[0]
    t_pad = (-T) % ALIGN
    if kv_gather is not None:
        t_pad = 0      # CP path: shard-local padding would corrupt the
                       # gathered global k/v layout; rect attention
                       # needs no alignment
    if t_pad and attn_impl != 'reference':
        pad_token = cfg.padding_idx if cfg.padding_idx is not None else 0
        tokens = jnp.pad(tokens, (0, t_pad), constant_values=pad_token)
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.full((t_pad,), jnp.max(seg_ids) + 1,
                               seg_ids.dtype)])
        pos_ids = jnp.pad(pos_ids, (0, t_pad))

    x = _embed_flat(params, cfg, tokens, pos_ids)
    rope = None
    if cfg.rotary:
        # compute cos/sin once; inside the scan they are loop-invariant
        from ..ops.rotary import rotary_cos_sin
        rope = rotary_cos_sin(pos_ids, cfg.head_dim, dtype=x.dtype)

    # token-minor residual stream: the flash kernels are fully
    # token-minor, so a feature-major (C, T) stream makes head
    # split/merge free reshapes and eliminates the relayout kernels —
    # one transpose in, one out, per forward (not per layer)
    T2 = tokens.shape[0]
    # measured: tm wins at the 50k operating point (+5% fwd, +7.5%
    # ckpt train MFU) but loses ~8% on the 10k un-checkpointed train
    # step; gate by size (TM_MIN_TOKENS, overridable for A/Bs). CPU
    # interpret (tests) keeps tm at any size so the parity suite
    # exercises it.
    tm_min = TM_MIN_TOKENS if jax.default_backend() == 'tpu' else 256
    use_tm = (kv_gather is None and collect_layers is None
              and attn_impl in ('flash', 'auto')
              and (attn_impl == 'flash'
                   or (jax.default_backend() == 'tpu' and T2 >= 256))
              and T2 % ALIGN == 0 and T2 >= tm_min)
    if use_tm:
        from ..ops.norm import apply_norm_t
        from .modules import layer_stack_tm
        rope_t = None
        if cfg.rotary:
            h2 = cfg.head_dim // 2
            rope_t = (jnp.swapaxes(rope[0][:, :h2], 0, 1),
                      jnp.swapaxes(rope[1][:, :h2], 0, 1))
        xT = jnp.swapaxes(x, 0, 1)
        xT = layer_stack_tm(xT, params['layers'], cfg, seg_ids,
                            lora_names=lora_names,
                            checkpointing=checkpointing,
                            max_seqlen=max_seqlen,
                            gather_fn=layer_gather, rope_t=rope_t,
                            lora_dropout=lora_dropout,
                            dropout_rng=dropout_rng, num_jobs=num_jobs,
                            remat=remat)
        x = jnp.swapaxes(apply_norm_t(xT, params['emb_norm_after']),
                         0, 1)
        reps = []
    else:
        x, reps = layer_stack(x, params['layers'], cfg, seg_ids, pos_ids,
                              lora_names=lora_names, attn_impl=attn_impl,
                              checkpointing=checkpointing,
                              collect_layers=collect_layers,
                              max_seqlen=max_seqlen,
                              gather_fn=layer_gather,
                              rope=rope, lora_dropout=lora_dropout,
                              dropout_rng=dropout_rng,
                              kv_gather=kv_gather, num_jobs=num_jobs,
                              remat=remat)
        x = apply_norm(x, params['emb_norm_after'])

    if t_pad and attn_impl != 'reference':
        x = x[:T]
        reps = [r[:T] for r in reps]

    if with_head:
        x = roberta_lm_head(x, params['lm_head'],
                            embed=params['embed_tokens'])
        if log_prob:
            x = jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
    if reps:
        x = jnp.concatenate([x, *reps], axis=-1)
    return x


def packed_meta(cu_lens, total: int):
    seg_ids = segment_ids_from_cu_lens(cu_lens, total)
    pos_ids = positions_from_cu_lens(cu_lens, total, seg_ids)
    return seg_ids, pos_ids


@partial(jax.jit, static_argnames=('num_segments', 'max_len'))
def scatter_to_padded(x, seg_ids, pos_ids, num_segments: int, max_len: int,
                      fill=None):
    """Scatter flat per-token values into a padded
    ``(num_segments, max_len, C)`` layout — the XLA equivalent of
    flash-attn's ``pad_input`` (reference: esme/esm.py:255). ``fill``
    (default zeros) is the value pad positions take."""
    shape = (num_segments, max_len) + x.shape[1:]
    out = jnp.zeros(shape, x.dtype) if fill is None \
        else jnp.broadcast_to(fill.astype(x.dtype), shape)
    return out.at[seg_ids, pos_ids].set(x, mode='drop')


@partial(jax.jit, static_argnames=('padding_idx',))
def _repack_padded(tokens, padding_idx: int):
    """Gather a padded ``(B, L)`` batch into the monotonic packed layout
    (valid tokens first). Returns ``(flat, seg_ids, pos_ids, valid,
    dst)`` where ``dst`` scatters packed outputs back to flat order."""
    valid = tokens != padding_idx
    src, dst, seg_ids, pos_ids = unpad_gather_meta(valid)
    flat = jnp.take(tokens.reshape(-1), src)
    return flat, seg_ids, pos_ids, valid, dst


@jax.jit
def _scatter_back_padded(x, dst, valid, fill):
    """Packed outputs back to ``(B, L, C)`` with ``fill`` at pads — the
    XLA ``pad_input`` (reference: esme/esm.py:255)."""
    B, Lseq = valid.shape
    x = jnp.take(x, dst, axis=0).reshape(B, Lseq, -1)
    return jnp.where(valid[..., None], x, fill.astype(x.dtype))


@partial(jax.jit, static_argnames=('cfg', 'log_prob'))
def _pad_head_row(params, cfg: ESMConfig, log_prob: bool):
    """What the reference emits at pad positions when the head runs
    after ``pad_input``'s zero-fill (reference: esme/esm.py:255,281):
    ``lm_head(0)``, a constant row."""
    x = jnp.zeros((1, cfg.embed_dim), cfg.jnp_dtype)
    r = roberta_lm_head(x, params['lm_head'], embed=params['embed_tokens'])
    if log_prob:
        r = jax.nn.log_softmax(r.astype(jnp.float32), axis=-1)
    return r[0]


# ---------------------------------------------------------------------------
# Model classes
# ---------------------------------------------------------------------------

class _ESMBase:
    """Shared stateful wrapper. Subclasses pin the family config."""

    alphabet = Alphabet
    family = 'esm2'

    def __init__(self, config: ESMConfig, params: Optional[dict] = None,
                 rng: int | jax.Array = 0, checkpointing: bool = False,
                 name: Optional[str] = None):
        self.config = config
        self.checkpointing = bool(checkpointing)
        self.name = name or self.family
        self.lora_kwargs = None
        if params is None:
            if isinstance(rng, int):
                rng = jax.random.key(rng)
            # one jitted program: on remote/tunneled backends eager
            # per-leaf init costs seconds of dispatch latency per op
            params = jax.jit(init_params,
                             static_argnums=(0,))(config, rng)
        self.params = params

    # -- loading -----------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path, quantization=None, checkpointing=False,
                        dtype='bfloat16', device=None):
        """Load a reference-schema safetensors checkpoint
        (reference: esme/esm.py:342-374). ``quantization`` in
        {None, '8bit', '4bit'} quantizes each linear as it streams off
        disk — the full-precision model never materializes on device,
        so models whose bf16 size exceeds HBM still load quantized
        (reference streams per-layer likewise, esme/esm.py:448-472)."""
        cfg, params, name = load_pretrained(path, dtype=dtype,
                                            quantization=quantization)
        return _class_for(name.split('_')[0])(
            config=cfg, params=params, checkpointing=checkpointing,
            name=name)

    def save_pretrained(self, path, name=None):
        save_pretrained(path, self.params, self.config, name or self.name)
        return self

    def quantize(self, mode='8bit'):
        """Quantize attention/MLP linear weights in place
        (reference loads bitsandbytes layers, esme/esm.py:420-446)."""
        from ..quant import quantize_model_params
        self.params = quantize_model_params(self.params, self.config, mode)
        return self

    # -- forward -----------------------------------------------------------

    def _flat_call(self, tokens, seg_ids, pos_ids, **opts):
        return forward_flat(self.params, self.config,
                            jnp.asarray(tokens, jnp.int32),
                            seg_ids, pos_ids,
                            checkpointing=self.checkpointing, **opts)

    def _run(self, tokens, pad_args=None, pad_output=False, lora_names=None,
             layers=None, attn_impl='auto', with_head=True, log_prob=False):
        lora_names = tuple(lora_names) if lora_names is not None else None
        collect = tuple(layers) if layers else None
        tokens = np.asarray(tokens) if not isinstance(tokens, jax.Array) \
            else tokens

        if self.config.learned_positions is not None:
            # raise on position-table overflow like the reference
            # (esme/embedding.py:47-51,69-74); table has +2 rows
            max_positions = int(
                self.params['embed_positions'].shape[0]) - 2
            width = int(pad_args[1]) if pad_args is not None \
                else int(tokens.shape[1])
            if width > max_positions:
                raise ValueError(
                    f'sequence length {width} above maximum position '
                    f'table size {max_positions}')

        if pad_args is not None:
            assert tokens.ndim == 1, \
                'tokens must be flat (batch*seq_len) when pad_args given'
            cu_lens, max_len = pad_args
            # dynamic-span job budget (host knows cu_lens); bucketed so
            # similar batches share a compile (ops/flash.py job mode)
            from ..ops.flash import host_num_jobs_from_cu
            num_jobs = host_num_jobs_from_cu(np.asarray(cu_lens),
                                             int(tokens.shape[0]))
            cu_lens = jnp.asarray(cu_lens, jnp.int32)
            seg_ids, pos_ids = packed_meta(cu_lens, tokens.shape[0])
            x = self._flat_call(tokens, seg_ids, pos_ids,
                                with_head=with_head, log_prob=log_prob,
                                lora_names=lora_names, attn_impl=attn_impl,
                                collect_layers=collect,
                                max_seqlen=int(max_len),
                                num_jobs=num_jobs)
            if pad_output:
                fill = _pad_head_row(self.params, self.config, log_prob) \
                    if with_head else None
                x = scatter_to_padded(x, seg_ids, pos_ids,
                                      int(cu_lens.shape[0]) - 1,
                                      int(max_len), fill=fill)
            return x

        assert tokens.ndim == 2, 'tokens must be (batch, seq_len)'
        B, Lseq = tokens.shape
        tokens_j = jnp.asarray(tokens, jnp.int32)
        # Repack valid tokens to the front (the XLA unpad_input,
        # reference: esme/esm.py:238): segment ids become monotonic so
        # flash block spans are tight and max_seqlen=Lseq is a valid
        # static cap — without this, the interleaved pad segments force
        # every span to full range (O(T²) tile sweeps).
        flat, seg_ids, pos_ids, valid, dst = _repack_padded(
            tokens_j, self.config.padding_idx)
        x = self._flat_call(flat, seg_ids, pos_ids,
                            with_head=with_head, log_prob=log_prob,
                            lora_names=lora_names, attn_impl=attn_impl,
                            collect_layers=collect, max_seqlen=Lseq)
        # match the reference: representation pads are zeros (pad_input
        # zero-fill), logits pads are lm_head(0) because the head runs
        # after the scatter (reference: esme/esm.py:255,281)
        fill = _pad_head_row(self.params, self.config, log_prob) \
            if with_head else jnp.zeros((x.shape[-1],), x.dtype)
        return _scatter_back_padded(x, dst, valid, fill)

    def forward_representation(self, tokens, pad_args=None, pad_output=False,
                               lora_names=None, layers=None,
                               attn_impl='auto'):
        """(reference: esme/esm.py:201-266)"""
        return self._run(tokens, pad_args, pad_output, lora_names, layers,
                         attn_impl, with_head=False)

    def forward(self, tokens, pad_args=None, pad_output=False,
                lora_names=None, attn_impl='auto'):
        """Logits (reference: esme/esm.py:268-282)."""
        return self._run(tokens, pad_args, pad_output, lora_names, None,
                         attn_impl, with_head=True)

    __call__ = forward

    def predict_log_prob(self, tokens, pad_args=None, pad_output=False,
                         lora_names=None, attn_impl='auto'):
        """fp32 log-probabilities (reference: esme/esm.py:284-298)."""
        return self._run(tokens, pad_args, pad_output, lora_names, None,
                         attn_impl, with_head=True, log_prob=True)

    def predict_prob(self, tokens, log=False, pad_args=None,
                     pad_output=False, lora_names=None, attn_impl='auto'):
        """(reference: esme/esm.py:300-317)"""
        lp = self.predict_log_prob(tokens, pad_args, pad_output, lora_names,
                                   attn_impl)
        return lp if log else jnp.exp(lp)

    # -- LoRA --------------------------------------------------------------

    def add_lora(self, rank=16, alpha=16, layers=('query', 'value', 'output'),
                 adapter_names=None, dropout_p: float = 0.0,
                 rng: int | jax.Array = 0):
        """(reference: esme/esm.py:495-543). ``dropout_p`` drops each
        adapter's output contribution during training steps
        (reference: esme/lora.py:84-88)."""
        from ..lora import add_lora_params
        self.params, self.lora_kwargs = add_lora_params(
            self.params, self.config, rank=rank, alpha=alpha, layers=layers,
            adapter_names=adapter_names, dropout_p=dropout_p, rng=rng)
        return self

    def lora_state_dict(self, adapter_names=None):
        from ..lora import lora_state_dict
        return lora_state_dict(self.params, adapter_names)

    def save_lora(self, path, adapter_names=None):
        from ..lora import save_lora
        save_lora(path, self.params, self.lora_kwargs, adapter_names)
        return self

    def load_lora(self, path, names=None):
        from ..lora import load_lora
        self.params, self.lora_kwargs = load_lora(path, self.params, names)
        return self

    def trainable_filter(self, lora_only=None, train_lmhead=False):
        """Boolean pytree marking trainable leaves — the optax-mask
        equivalent of ``mark_only_lora_as_trainable`` / ``mark_lmhead``
        (reference: esme/lora.py:97-108, esme/esm.py:609-615)."""
        from ..lora import trainable_mask
        return trainable_mask(self.params, lora_only=lora_only,
                              train_lmhead=train_lmhead)


class ESM2(_ESMBase):
    """(reference: esme/esm.py:72-615)"""
    family = 'esm2'

    def __init__(self, num_layers=33, embed_dim=1280, attention_heads=20,
                 checkpointing=False, dtype='bfloat16', config=None,
                 params=None, rng=0, name=None):
        config = config or esm2_config(num_layers, embed_dim,
                                       attention_heads, dtype=dtype)
        super().__init__(config, params=params, rng=rng,
                         checkpointing=checkpointing, name=name)


class ESM1b(_ESMBase):
    """(reference: esme/esm.py:618-679)"""
    family = 'esm1b'

    def __init__(self, checkpointing=False, dtype='bfloat16', config=None,
                 params=None, rng=0, name=None):
        config = config or esm1b_config(dtype=dtype)
        super().__init__(config, params=params, rng=rng,
                         checkpointing=checkpointing, name=name)


class ESM1v(_ESMBase):
    """(reference: esme/esm.py:682-735)"""
    family = 'esm1v'

    def __init__(self, checkpointing=False, dtype='bfloat16', config=None,
                 params=None, rng=0, name=None):
        config = config or esm1v_config(dtype=dtype)
        super().__init__(config, params=params, rng=rng,
                         checkpointing=checkpointing, name=name)


class ESMC(_ESMBase):
    """(reference: esme/esm.py:738-946)"""
    family = 'esmc'
    alphabet = Alphabet3

    def __init__(self, num_layers=30, embed_dim=960, attention_heads=15,
                 checkpointing=False, dtype='bfloat16', config=None,
                 params=None, rng=0, name=None):
        config = config or esmc_config(num_layers, embed_dim,
                                       attention_heads, dtype=dtype)
        super().__init__(config, params=params, rng=rng,
                         checkpointing=checkpointing, name=name)


def _class_for(family: str):
    return {'esm2': ESM2, 'esm1b': ESM1b, 'esm1v': ESM1v,
            'esmc': ESMC}[family]


class ESM:
    """Dispatcher: load any family by checkpoint metadata
    (reference: esme/esm.py:28-69)."""

    @staticmethod
    def from_pretrained(path, quantization=None, checkpointing=False,
                        dtype='bfloat16', device=None):
        import os
        if not os.path.isfile(path):
            from ..download import download_model
            path = download_model(path)
        metadata = read_metadata(path)
        family = metadata['name'].split('_')[0]
        return _class_for(family).from_pretrained(
            path, quantization=quantization, checkpointing=checkpointing,
            dtype=dtype)
