"""Training loops: masked-LM pretraining and regression fine-tuning.

TPU-native replacement for the reference's Lightning modules
(reference: esme/trainer.py:8-104). Instead of a framework, two small
classes own an optax optimizer and a jitted, donated train step over
the pure model forward. Equivalents provided:

* gradient accumulation  → ``optax.MultiSteps``
  (reference: workflow/train/runtime_lightning.py:106)
* ``mark_only_lora_as_trainable`` → ``optax.masked`` over the model's
  :meth:`trainable_filter` boolean pytree (reference: esme/lora.py:97-108)
* activation checkpointing → ``jax.checkpoint`` inside the layer scan,
  enabled by the model's ``checkpointing`` flag
  (reference: esme/esm.py:19-25,244-245)
* two-LR param groups (head vs plm) → ``optax.multi_transform``
  (reference: esme/trainer.py:92-103)

Batches are the data plane's :class:`esme_tpu.data.PackedBatch` with
static shapes, so the step compiles exactly once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..loss import bce_with_logits, cross_entropy, mse_loss
from ..metrics import auprc, auroc, spearman as _spearman
from ..models.esm import forward_flat, packed_meta
from ..models.heads import apply_learned_aggregation, apply_cls_head
from .partition import merge_leaves, split_by_mask


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


class MaskedPLM:
    """Masked-LM training (reference: esme/trainer.py:8-44).

    Args:
        model: an :class:`esme_tpu.models.esm._ESMBase` instance.
        learning_rate: Adam learning rate (reference default 1e-4).
        grad_accum: accumulate this many microbatches per optimizer step.
        lora_only: restrict training to LoRA adapters (None = auto:
            LoRA-only iff adapters exist).
        optimizer: override the optax optimizer entirely.
    """

    def __init__(self, model, learning_rate: float = 1e-4,
                 grad_accum: int = 1, lora_only=None, train_lmhead=False,
                 weight_decay: float = 0.0, optimizer=None,
                 attn_impl: str = 'auto', trainable_mask=None,
                 offload_optimizer: bool = False, remat: str = 'full'):
        self.model = model
        self.attn_impl = attn_impl
        self._offload = bool(offload_optimizer)
        # activation-checkpointing policy: 'attn' saves the flash
        # kernel outputs so the remat recompute skips the attention
        # kernel (faster, +~130MB/layer at 50k tokens; pair with
        # optim.adam8bit when optimizer HBM is tight); 'full' is the
        # classic minimal-memory remat. Ignored unless
        # model.checkpointing is on.
        self.remat = remat

        if optimizer is None:
            optimizer = optax.adamw(learning_rate,
                                    weight_decay=weight_decay) \
                if weight_decay else optax.adam(learning_rate)
        if grad_accum > 1:
            optimizer = optax.MultiSteps(optimizer, grad_accum)
        self.optimizer = optimizer
        # custom mask (e.g. positional-extension training,
        # esme_tpu.extend.positions_only_mask) overrides the default.
        # Frozen leaves are never differentiated (split_by_mask), so
        # LoRA steps cost LoRA-sized gradients and quantized (integer)
        # bases train under adapters without grad-dtype errors.
        self._mask = trainable_mask if trainable_mask is not None else \
            model.trainable_filter(lora_only=lora_only,
                                   train_lmhead=train_lmhead)
        # LoRA dropout is training-only (reference: esme/lora.py:84-88);
        # rng folds the step so every step gets a fresh mask.
        self._lora_dropout = float(
            (model.lora_kwargs or {}).get('dropout_p', 0.0) or 0.0)
        self._dropout_key = jax.random.key(0x10ad)
        train, _, _, _ = split_by_mask(model.params, self._mask)
        if self._offload:
            # DeepSpeed CPU-optimizer-offload equivalent (reference:
            # esme/deepspeed.py:18-21): fp32 master copies of the
            # trainable leaves + the full optimizer state live on the
            # host CPU device and the update math runs there; the
            # accelerator holds working params and computes gradients
            # only. HBM cost drops by the optimizer state (~12 bytes/
            # trainable param for fp32 adam+master) at the price of
            # grads-down/params-up host traffic per step.
            self._host = jax.local_devices(backend='cpu')[0]
            self._master = jax.device_put(
                tuple(jnp.asarray(t, jnp.float32) for t in train),
                self._host)
            with jax.default_device(self._host):
                opt_state = optimizer.init(self._master)
            # computation follows the host-committed inputs
            self._host_update = jax.jit(self._offload_update,
                                        static_argnums=(3,))
            self.state = TrainState(params=model.params,
                                    opt_state=opt_state,
                                    step=jnp.zeros((), jnp.int32))
        else:
            self.state = TrainState(
                params=model.params,
                opt_state=optimizer.init(train),
                step=jnp.zeros((), jnp.int32))

    def _offload_update(self, grads, opt_state, master, dtypes):
        """Runs on the host CPU device (inputs are committed there)."""
        grads = tuple(g.astype(jnp.float32) for g in grads)
        updates, opt_state = self.optimizer.update(grads, opt_state, master)
        master = optax.apply_updates(master, updates)
        working = tuple(m.astype(dt) for m, dt in zip(master, dtypes))
        return master, opt_state, working

    @partial(jax.jit, static_argnames=('self', 'max_seqlen', 'num_jobs'))
    def _grad_step(self, params, masked_tokens, seg_ids, pos_ids,
                   targets, mask, max_seqlen: int, step,
                   num_jobs=None):
        train, frozen, treedef, flags = split_by_mask(params, self._mask)
        dropout_rng = jax.random.fold_in(self._dropout_key, step) \
            if self._lora_dropout > 0.0 else None

        def loss_fn(train):
            p = merge_leaves(train, frozen, treedef, flags)
            return self._loss_fn(p, masked_tokens, seg_ids, pos_ids,
                                 targets, mask, max_seqlen, dropout_rng,
                                 num_jobs)

        return jax.value_and_grad(loss_fn)(train)

    def _offload_step(self, masked_tokens, seg_ids, pos_ids, targets,
                      mask, max_seqlen: int, num_jobs=None):
        loss, grads = self._grad_step(
            self.state.params, masked_tokens, seg_ids, pos_ids, targets,
            mask, max_seqlen, self.state.step, num_jobs)
        train, frozen, treedef, flags = split_by_mask(self.state.params,
                                                      self._mask)
        dtypes = tuple(t.dtype for t in train)
        grads_h = jax.device_put(grads, self._host)
        with jax.default_device(self._host):
            self._master, opt_state, working = self._host_update(
                grads_h, self.state.opt_state, self._master, dtypes)
        accel = jax.tree_util.tree_leaves(frozen)[0].devices() \
            if frozen else None
        working = jax.device_put(
            working, jax.devices()[0] if accel is None else list(accel)[0])
        params = merge_leaves(working, frozen, treedef, flags)
        self.state = TrainState(params, opt_state, self.state.step + 1)
        return loss

    def _loss_fn(self, params, masked_tokens, seg_ids, pos_ids, targets,
                 mask, max_seqlen, dropout_rng=None, num_jobs=None):
        logits = forward_flat(
            params, self.model.config, masked_tokens, seg_ids, pos_ids,
            with_head=True, attn_impl=self.attn_impl,
            checkpointing=self.model.checkpointing, max_seqlen=max_seqlen,
            lora_dropout=self._lora_dropout if dropout_rng is not None
            else 0.0, dropout_rng=dropout_rng, num_jobs=num_jobs,
            remat=self.remat)
        return cross_entropy(logits, targets, mask)

    @partial(jax.jit, static_argnames=('self', 'max_seqlen', 'num_jobs'),
             donate_argnames=('state',))
    def _step(self, state: TrainState, masked_tokens, seg_ids, pos_ids,
              targets, mask, max_seqlen: int, num_jobs=None):
        train, frozen, treedef, flags = split_by_mask(state.params,
                                                      self._mask)
        dropout_rng = jax.random.fold_in(self._dropout_key, state.step) \
            if self._lora_dropout > 0.0 else None

        def loss_fn(train):
            params = merge_leaves(train, frozen, treedef, flags)
            return self._loss_fn(params, masked_tokens, seg_ids, pos_ids,
                                 targets, mask, max_seqlen, dropout_rng,
                                 num_jobs)

        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, train)
        train = optax.apply_updates(train, updates)
        params = merge_leaves(train, frozen, treedef, flags)
        return TrainState(params, opt_state, state.step + 1), loss

    def training_step(self, batch) -> float:
        """One (micro)batch step; returns the loss
        (reference: esme/trainer.py:31-35)."""
        from ..ops.flash import host_num_jobs_from_cu
        num_jobs = host_num_jobs_from_cu(np.asarray(batch.cu_lens),
                                         int(batch.tokens.shape[0]))
        cu_lens = jnp.asarray(batch.cu_lens, jnp.int32)
        seg_ids, pos_ids = packed_meta(cu_lens, batch.tokens.shape[0])
        args = (jnp.asarray(batch.masked_tokens, jnp.int32), seg_ids,
                pos_ids, jnp.asarray(batch.tokens, jnp.int32),
                jnp.asarray(batch.mask), int(batch.max_len), num_jobs)
        if self._offload:
            loss = self._offload_step(*args)
        else:
            self.state, loss = self._step(self.state, *args)
        self.model.params = self.state.params
        return float(loss)

    def validation_step(self, batch) -> float:
        """Loss without updates (reference: esme/trainer.py:37-41)."""
        cu_lens = jnp.asarray(batch.cu_lens, jnp.int32)
        seg_ids, pos_ids = packed_meta(cu_lens, batch.tokens.shape[0])
        loss = self._loss_fn(self.state.params,
                             jnp.asarray(batch.masked_tokens, jnp.int32),
                             seg_ids, pos_ids,
                             jnp.asarray(batch.tokens, jnp.int32),
                             jnp.asarray(batch.mask),
                             int(batch.max_len))
        return float(loss)

    def fit(self, dataset, epochs: int = 1, val_dataset=None,
            log_every: int = 0, set_epoch=None, logger=None):
        """Simple epoch loop over an iterable of PackedBatch.

        ``logger``: a :class:`esme_tpu.logger.MetricLogger` receiving
        ``train_loss`` per step (throttled by ``log_every``) and
        ``val_loss`` per epoch (the Lightning ``self.log`` equivalent,
        reference: esme/trainer.py:34,41)."""
        history = []
        for epoch in range(epochs):
            if set_epoch is not None:
                set_epoch(epoch)
            for i, batch in enumerate(dataset):
                loss = self.training_step(batch)
                history.append(loss)
                if log_every and i % log_every == 0:
                    if logger is not None:
                        logger.log({'epoch': epoch, 'train_loss': loss},
                                   step=int(self.state.step))
                    else:
                        print(f'epoch {epoch} step {i}: loss {loss:.4f}')
            if val_dataset is not None:
                vloss = float(np.mean(
                    [self.validation_step(b) for b in val_dataset]))
                if logger is not None:
                    logger.log({'epoch': epoch, 'val_loss': vloss},
                               step=int(self.state.step))
                    logger.track_best({'val_loss': vloss})
                else:
                    print(f'epoch {epoch}: val_loss {vloss:.4f}')
        return history


class RegressionTrainer:
    """PLM + pooled head regression fine-tuning
    (reference: esme/trainer.py:47-104).

    ``head='aggregation'`` uses the learned-attention-aggregation head
    (reference: esme/pooling.py:182-228); ``head='cls'`` the mean-pool
    MLP head (reference: esme/head.py:30-68). Separate learning rates
    for head and trunk via ``optax.multi_transform``
    (reference: esme/trainer.py:92-103).
    """

    def __init__(self, model, head_params, head: str = 'aggregation',
                 head_lr: float = 1e-3, lr: float = 1e-4,
                 head_attention_heads: int = 4, lora_only=None,
                 attn_impl: str = 'auto'):
        self.model = model
        self.head = head
        self.head_attention_heads = head_attention_heads
        self.attn_impl = attn_impl
        self._lora_dropout = float(
            (model.lora_kwargs or {}).get('dropout_p', 0.0) or 0.0)
        self._dropout_key = jax.random.key(0x10ad)

        params = {'plm': model.params, 'head': head_params}

        plm_mask = model.trainable_filter(lora_only=lora_only)
        # one flat multi_transform over the joint {'plm','head'} tree:
        # trainable trunk leaves get lr, frozen leaves get zero updates,
        # head leaves get head_lr (reference two-LR groups,
        # esme/trainer.py:92-103)
        label_tree = {
            'plm': jax.tree.map(
                lambda m: 'train' if m else 'freeze', plm_mask),
            'head': jax.tree.map(lambda _: 'head', head_params)}
        tx = optax.multi_transform(
            {'train': optax.adam(lr), 'freeze': optax.set_to_zero(),
             'head': optax.adam(head_lr)},
            label_tree)
        self.optimizer = tx
        self.state = TrainState(params=params,
                                opt_state=tx.init(params),
                                step=jnp.zeros((), jnp.int32))

    def _predict(self, params, tokens, seg_ids, pos_ids, num_segments,
                 max_seqlen, dropout_rng=None):
        rep = forward_flat(
            params['plm'], self.model.config, tokens, seg_ids, pos_ids,
            with_head=False, attn_impl=self.attn_impl,
            checkpointing=self.model.checkpointing, max_seqlen=max_seqlen,
            lora_dropout=self._lora_dropout if dropout_rng is not None
            else 0.0, dropout_rng=dropout_rng)
        if self.head == 'aggregation':
            return apply_learned_aggregation(
                params['head'], rep, seg_ids, num_segments,
                self.head_attention_heads)
        return apply_cls_head(params['head'], rep, seg_ids, num_segments)

    def _loss_fn(self, params, tokens, seg_ids, pos_ids, labels, weight,
                 num_segments, max_seqlen, dropout_rng=None):
        pred = self._predict(params, tokens, seg_ids, pos_ids,
                             num_segments, max_seqlen, dropout_rng)
        return mse_loss(pred, labels, weight)

    @partial(jax.jit, static_argnames=('self', 'num_segments',
                                       'max_seqlen'),
             donate_argnames=('state',))
    def _step(self, state, tokens, seg_ids, pos_ids, labels, weight,
              num_segments: int, max_seqlen: int):
        dropout_rng = jax.random.fold_in(self._dropout_key, state.step) \
            if self._lora_dropout > 0.0 else None
        loss, grads = jax.value_and_grad(self._loss_fn)(
            state.params, tokens, seg_ids, pos_ids, labels, weight,
            num_segments, max_seqlen, dropout_rng)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def _batch_meta(self, batch):
        cu_lens = jnp.asarray(batch.cu_lens, jnp.int32)
        seg_ids, pos_ids = packed_meta(cu_lens, batch.tokens.shape[0])
        num_segments = int(batch.cu_lens.shape[0]) - 1
        # padded (repeated-tail) segments carry zero loss weight
        lens = np.diff(np.asarray(batch.cu_lens))
        weight = jnp.asarray((lens > 0).astype(np.float32))
        return cu_lens, seg_ids, pos_ids, num_segments, weight

    def training_step(self, batch) -> float:
        _, seg_ids, pos_ids, num_segments, weight = self._batch_meta(batch)
        self.state, loss = self._step(
            self.state, jnp.asarray(batch.tokens, jnp.int32),
            seg_ids, pos_ids, jnp.asarray(batch.labels), weight,
            num_segments, int(batch.max_len))
        self.model.params = self.state.params['plm']
        return float(loss)

    def predict(self, batch) -> np.ndarray:
        _, seg_ids, pos_ids, num_segments, weight = self._batch_meta(batch)
        pred = self._predict(self.state.params,
                             jnp.asarray(batch.tokens, jnp.int32),
                             seg_ids, pos_ids, num_segments,
                             int(batch.max_len))
        n_real = int(np.asarray(weight).sum())
        return np.asarray(pred)[:n_real]

    def fit(self, dataset, epochs: int = 1, val_dataset=None,
            set_epoch=None, logger=None):
        """Epoch loop with per-epoch validation metrics; ``dataset`` may
        be a callable ``epoch -> iterable`` (per-epoch reshuffle /
        re-balancing) or a plain iterable."""
        history = []
        for epoch in range(epochs):
            if set_epoch is not None:
                set_epoch(epoch)
            ds = dataset(epoch) if callable(dataset) else dataset
            losses = [self.training_step(b) for b in ds]
            rec = {'epoch': epoch,
                   'train_loss': float(np.mean(losses)) if losses
                   else float('nan')}
            if val_dataset is not None:
                rec.update(self.validation_metrics(val_dataset))
            history.append(rec)
            if logger is not None:
                logger.log(rec, step=int(self.state.step))
                logger.track_best(rec)
            else:
                print(' '.join(f'{k}={v:.5g}' if isinstance(v, float)
                               else f'{k}={v}' for k, v in rec.items()))
        return history

    def validation_metrics(self, dataset) -> dict:
        """val MSE + Spearman (reference: esme/trainer.py:59-60,95-98)."""
        preds, targets = [], []
        for batch in dataset:
            p = self.predict(batch)
            preds.append(p)
            targets.append(np.asarray(batch.labels)[:len(p)])
        pred = np.concatenate(preds)
        target = np.concatenate(targets)
        return {'val_mse': float(((pred - target) ** 2).mean()),
                'val_spearman': _spearman(pred, target)}


class ClassificationTrainer(RegressionTrainer):
    """PLM + pooled head binary classification with BCE loss — the TF
    task promoted into the library (reference: workflow/tf/finetune.py
    TfModel: frozen/LoRA trunk + MLP head, BCE-with-logits, AUROC/AUPRC
    vs DeepTFactor). Same pooled-head machinery as
    :class:`RegressionTrainer`; ``predict`` returns logits, validation
    reports BCE + AUROC + AUPRC."""

    def _loss_fn(self, params, tokens, seg_ids, pos_ids, labels, weight,
                 num_segments, max_seqlen, dropout_rng=None):
        pred = self._predict(params, tokens, seg_ids, pos_ids,
                             num_segments, max_seqlen, dropout_rng)
        return bce_with_logits(pred, labels, weight)

    def validation_metrics(self, dataset) -> dict:
        """val BCE + AUROC + AUPRC (reference TF metrics:
        workflow/tf/finetune.py)."""
        preds, targets = [], []
        for batch in dataset:
            p = self.predict(batch)
            preds.append(p)
            targets.append(np.asarray(batch.labels)[:len(p)])
        logits = np.concatenate(preds).astype(np.float64)
        target = np.concatenate(targets).astype(np.float64)
        per = np.maximum(logits, 0) - logits * target \
            + np.log1p(np.exp(-np.abs(logits)))
        return {'val_bce': float(per.mean()),
                'val_auroc': auroc(target, logits),
                'val_auprc': auprc(target, logits)}
