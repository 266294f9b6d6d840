"""Multi-chip masked-LM training: DP x FSDP over a named mesh.

The TPU-native replacement for the reference's two distributed paths —
Lightning DDP (reference: workflow/train/runtime_lightning.py:102-109)
and DeepSpeed ZeRO-2 (reference: esme/deepspeed.py:12-30,
workflow/train/runtime.py:34-39) — unified in one ``shard_map`` step
over a ``(data, fsdp)`` mesh:

* each ``data`` slice owns one packed batch row (tokens/masks/cu_lens
  stacked on a leading replica axis, sharded over ``data``);
* params + optimizer state live sharded over ``fsdp``
  (:mod:`esme_tpu.parallel.fsdp`); layer weights are all-gathered per
  scan step and the gradient reduce-scatter falls out of the
  all-gather's autodiff transpose;
* gradients are psum'd across ``data``; the optimizer update runs
  outside the shard_map as purely-local elementwise math on shards;
* XLA's latency-hiding scheduler overlaps the collectives with the
  layer compute (the equivalent of DDP bucket overlap);
* only trainable leaves are differentiated (LoRA under FSDP costs
  LoRA-sized gradients; reference: esme/lora.py:97-108), gradient
  accumulation via ``optax.MultiSteps`` (reference grad-accum:
  workflow/train/runtime_lightning.py:106), and batches feed through
  ``jax.make_array_from_process_local_data`` when running multi-host,
  so the same step works on a pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.esm import forward_flat, packed_meta
from ..parallel.fsdp import (fsdp_partition_specs, make_layer_gather,
                             make_outer_gather, shard_params)
from .partition import merge_leaves, split_by_mask

import warnings

with warnings.catch_warnings():
    # jax>=0.8 moved shard_map to jax.shard_map with a changed
    # signature (check_rep -> check_vma); the experimental entry still
    # carries the stable signature this module uses
    warnings.simplefilter('ignore', DeprecationWarning)
    from jax.experimental.shard_map import shard_map


class ShardedTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def stack_batches(batches):
    """Stack R PackedBatches (one per data replica) into leading-axis
    arrays for the sharded step. All must share static shapes."""
    return (
        np.stack([b.masked_tokens for b in batches]),
        np.stack([b.tokens for b in batches]),
        np.stack([b.mask for b in batches]),
        np.stack([b.cu_lens for b in batches]),
        max(int(b.max_len) for b in batches),
    )


class ShardedMaskedPLM:
    """Masked-LM trainer over a ``(data, fsdp)`` mesh.

    Args:
        model: an :class:`esme_tpu.models.esm._ESMBase` instance.
        mesh: a mesh with ``data`` and ``fsdp`` axes.
        grad_accum: microbatches accumulated per optimizer step.
        lora_only / train_lmhead / trainable_mask: trainable-leaf
            selection, same contract as :class:`MaskedPLM`.
        optimizer: override the optax optimizer.
    """

    def __init__(self, model, mesh, learning_rate: float = 1e-4,
                 weight_decay: float = 0.0, attn_impl: str = 'auto',
                 grad_accum: int = 1, lora_only=None,
                 train_lmhead: bool = False, trainable_mask=None,
                 optimizer=None, seq_axis: Optional[str] = None,
                 remat: str = 'full'):
        self.model = model
        self.mesh = mesh
        self.attn_impl = attn_impl
        # activation-checkpoint policy, same contract as MaskedPLM:
        # 'attn' keeps the flash outputs so the remat skips the kernel
        self.remat = remat
        # context parallelism: shard each replica's packed token axis
        # over this mesh axis; attention gathers k/v across it
        # (esme_tpu.parallel.context). None = no sequence sharding.
        if seq_axis is not None and seq_axis not in mesh.axis_names:
            raise ValueError(f'mesh has no axis {seq_axis!r}')
        self._seq_axis = seq_axis
        self._loss_axes = ('data', seq_axis) if seq_axis else ('data',)

        self.specs = fsdp_partition_specs(model.params, mesh)
        params, _ = shard_params(model.params, mesh, self.specs)

        if optimizer is None:
            optimizer = optax.adamw(learning_rate,
                                    weight_decay=weight_decay) \
                if weight_decay else optax.adam(learning_rate)
        if grad_accum > 1:
            optimizer = optax.MultiSteps(optimizer, grad_accum)
        self.optimizer = optimizer

        self._mask = trainable_mask if trainable_mask is not None else \
            model.trainable_filter(lora_only=lora_only,
                                   train_lmhead=train_lmhead)
        train, _, _, _ = split_by_mask(params, self._mask)
        # opt state inherits param shardings through jit propagation
        opt_state = jax.jit(self.optimizer.init)(train)
        self.state = ShardedTrainState(params, opt_state,
                                       jnp.zeros((), jnp.int32))

        self._layer_gather = make_layer_gather(self.specs['layers'])
        self._outer_gather = make_outer_gather(
            {k: v for k, v in self.specs.items() if k != 'layers'})

    def _local_loss(self, params, masked, targets, mask, cu_lens,
                    max_seqlen, num_jobs=None):
        tok = masked[0]
        kv_gather = None
        if self._seq_axis:
            # tokens arrive sharded over the seq axis: build GLOBAL
            # segment/position metadata from the replicated cu_lens and
            # slice this shard's window; attention all-gathers k/v
            from ..parallel.context import make_kv_gather
            n = self.mesh.shape[self._seq_axis]
            t_loc = tok.shape[0]
            seg_all, pos_all = packed_meta(cu_lens[0], t_loc * n)
            i = jax.lax.axis_index(self._seq_axis)
            seg_ids = jax.lax.dynamic_slice_in_dim(seg_all, i * t_loc,
                                                   t_loc)
            pos_ids = jax.lax.dynamic_slice_in_dim(pos_all, i * t_loc,
                                                   t_loc)
            kv_gather = make_kv_gather(self._seq_axis)
        else:
            seg_ids, pos_ids = packed_meta(cu_lens[0], tok.shape[0])
        logits = forward_flat(
            params, self.model.config, tok, seg_ids, pos_ids,
            with_head=True, attn_impl=self.attn_impl,
            checkpointing=self.model.checkpointing, max_seqlen=max_seqlen,
            layer_gather=self._layer_gather,
            outer_gather=self._outer_gather, kv_gather=kv_gather,
            num_jobs=None if kv_gather is not None else num_jobs,
            remat=self.remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(
            logp, targets[0][:, None].astype(jnp.int32), axis=-1)[:, 0]
        w = mask[0].astype(jnp.float32)
        # global masked mean across the data (and seq) axes
        s = jax.lax.psum((ll * w).sum(), self._loss_axes)
        c = jax.lax.psum(w.sum(), self._loss_axes)
        return -s / jnp.maximum(c, 1.0)

    def _split_specs(self):
        train_specs, frozen_specs, _, _ = split_by_mask(self.specs,
                                                        self._mask)
        return train_specs, frozen_specs

    @partial(jax.jit, static_argnames=('self', 'max_seqlen', 'num_jobs'),
             donate_argnames=('state',))
    def _step(self, state: ShardedTrainState, masked, targets, mask,
              cu_lens, max_seqlen: int, num_jobs=None):
        batch_spec = P('data', self._seq_axis,
                       *([None] * (masked.ndim - 2)))
        cu_spec = P('data', None)
        train, frozen, treedef, flags = split_by_mask(state.params,
                                                      self._mask)
        train_specs, frozen_specs = self._split_specs()

        def compute(train, frozen, masked, targets, mask, cu_lens):
            def loss_fn(train):
                params = merge_leaves(train, frozen, treedef, flags)
                return self._local_loss(params, masked, targets, mask,
                                        cu_lens, max_seqlen, num_jobs)
            loss, grads = jax.value_and_grad(loss_fn)(train)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, self._loss_axes), grads)
            return loss, grads

        loss, grads = shard_map(
            compute, mesh=self.mesh,
            in_specs=(train_specs, frozen_specs, batch_spec, batch_spec,
                      batch_spec, cu_spec),
            out_specs=(P(), train_specs),
            check_rep=False,
        )(train, frozen, masked, targets, mask, cu_lens)

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, train)
        train = optax.apply_updates(train, updates)
        params = merge_leaves(train, frozen, treedef, flags)
        return ShardedTrainState(params, opt_state, state.step + 1), loss

    @partial(jax.jit, static_argnames=('self', 'max_seqlen'))
    def _val(self, params, masked, targets, mask, cu_lens,
             max_seqlen: int):
        batch_spec = P('data', self._seq_axis,
                       *([None] * (masked.ndim - 2)))
        return shard_map(
            partial(self._local_loss, max_seqlen=max_seqlen),
            mesh=self.mesh,
            in_specs=(self.specs, batch_spec, batch_spec, batch_spec,
                      P('data', None)),
            out_specs=P(),
            check_rep=False,
        )(params, masked, targets, mask, cu_lens)

    # -- batch placement ----------------------------------------------------

    def _put(self, arr, sharding):
        """Place a host batch on the mesh. Multi-host: every process
        passes its LOCAL rows and jax assembles the global array
        (the jax.distributed data plane, SURVEY.md §2.4)."""
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    def _place_batch(self, batches):
        if isinstance(batches, (list, tuple)) and hasattr(
                batches[0], 'tokens'):
            masked, targets, mask, cu_lens, max_len = stack_batches(batches)
        else:
            masked, targets, mask, cu_lens, max_len = batches
        sh = NamedSharding(self.mesh, P('data', self._seq_axis))
        cu_sh = NamedSharding(self.mesh, P('data', None))
        return (self._put(np.asarray(masked, np.int32), sh),
                self._put(np.asarray(targets, np.int32), sh),
                self._put(np.asarray(mask), sh),
                self._put(np.asarray(cu_lens, np.int32), cu_sh),
                int(max_len))

    # -- public steps -------------------------------------------------------

    def training_step(self, batches) -> float:
        """``batches``: list of R PackedBatches (R = local data rows),
        or a pre-stacked tuple from :func:`stack_batches`."""
        masked, targets, mask, cu_lens, max_len = self._place_batch(batches)
        self.state, loss = self._step(self.state, masked, targets, mask,
                                      cu_lens, max_len,
                                      self._job_budget(batches))
        return float(loss)

    def _job_budget(self, batches):
        """Static dynamic-span job budget covering every data replica
        (ops/flash.py job mode); None under seq parallelism or when any
        replica is below the job-mode threshold."""
        if self._seq_axis or not (isinstance(batches, (list, tuple))
                                  and hasattr(batches[0], 'tokens')):
            return None
        from ..ops.flash import host_num_jobs_from_cu
        budgets = [host_num_jobs_from_cu(np.asarray(b.cu_lens),
                                         int(b.tokens.shape[0]))
                   for b in batches]
        if any(b is None for b in budgets):
            return None
        return max(budgets)

    def validation_step(self, batches) -> float:
        """Global loss without updates (reference: esme/trainer.py:37-41)."""
        masked, targets, mask, cu_lens, max_len = self._place_batch(batches)
        return float(self._val(self.state.params, masked, targets, mask,
                               cu_lens, max_len))

    def fit(self, dataset, epochs: int = 1, val_dataset=None,
            log_every: int = 0, set_epoch=None, logger=None):
        """Epoch loop over an iterable of replica-batch lists — same
        contract as :meth:`MaskedPLM.fit` including the JSONL
        ``logger``."""
        history = []
        for epoch in range(epochs):
            if set_epoch is not None:
                set_epoch(epoch)
            for i, batch in enumerate(dataset):
                loss = self.training_step(batch)
                history.append(loss)
                if log_every and i % log_every == 0 and logger is not None:
                    logger.log({'epoch': epoch, 'train_loss': loss},
                               step=int(self.state.step))
            if val_dataset is not None:
                vloss = float(np.mean(
                    [self.validation_step(b) for b in val_dataset]))
                if logger is not None:
                    logger.log({'epoch': epoch, 'val_loss': vloss},
                               step=int(self.state.step))
                    logger.track_best({'val_loss': vloss})
        return history

    def unsharded_params(self) -> dict:
        """Gather the full params back to host (for save_pretrained)."""
        return jax.tree.map(
            lambda x: jax.device_get(x), self.state.params)
