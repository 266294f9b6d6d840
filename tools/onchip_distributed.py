"""On-chip distributed smoke (VERDICT r3 weak #5): run the sharded
training step and the context-parallel forward on the REAL TPU through
a 1-device mesh — proving shard_map + the FSDP gather hooks + the rect
flash kernel compile and match single-device numerics on hardware
(the CPU virtual-mesh tests can't exercise the Mosaic-compiled
kernels). Appends a results row."""
import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.alphabet import Alphabet, mask_tokens
    from esme_tpu.data import PackedBatch
    from esme_tpu.models.esm import ESM2
    from esme_tpu.parallel.context import context_parallel_log_prob
    from esme_tpu.parallel.mesh import make_mesh
    from esme_tpu.train.distributed import ShardedMaskedPLM
    from esme_tpu.train.trainer import MaskedPLM

    assert jax.default_backend() == 'tpu', jax.default_backend()

    # small-but-real model so compiles stay minutes not tens of minutes
    model = ESM2(num_layers=6, embed_dim=640, attention_heads=10, rng=0)

    rng = np.random.default_rng(0)
    budget = 8192
    lens, tot = [], 0
    while tot + 258 <= budget - 256:
        lens.append(258)
        tot += 258
    cu = np.cumsum([0, *lens]).astype(np.int32)
    toks = np.full(budget, Alphabet.padding_idx, np.int32)
    toks[:cu[-1]] = rng.integers(4, 24, cu[-1])
    masked, mask = mask_tokens(toks[:cu[-1]], alphabet=Alphabet,
                               rng=np.random.default_rng(1))
    pad = budget - cu[-1]
    batch = PackedBatch(
        tokens=toks, cu_lens=cu, max_len=258,
        masked_tokens=np.pad(masked, (0, pad),
                             constant_values=Alphabet.padding_idx),
        mask=np.pad(mask, (0, pad), constant_values=False))

    # single-device oracle
    plm = MaskedPLM(model, learning_rate=1e-4)
    loss_single = float(plm.training_step(batch))

    # sharded step on a (data=1, fsdp=1) mesh — same math through
    # shard_map + gather hooks + psum
    mesh = make_mesh(data=1, fsdp=1)
    model2 = ESM2(num_layers=6, embed_dim=640, attention_heads=10, rng=0)
    splm = ShardedMaskedPLM(model2, mesh, learning_rate=1e-4)
    loss_sharded = float(splm.training_step([batch]))

    # context-parallel forward (seq=1 mesh) vs plain forward
    from jax.sharding import Mesh
    seq_mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ('seq',))
    lp_cp = context_parallel_log_prob(
        model, jnp.asarray(toks), (jnp.asarray(cu), 258), seq_mesh)
    lp = model.predict_log_prob(jnp.asarray(toks),
                                pad_args=(jnp.asarray(cu), 258))
    cp_err = float(np.max(np.abs(
        np.asarray(lp_cp[:cu[-1]], np.float32)
        - np.asarray(lp[:cu[-1]], np.float32))))

    # ---- CP error diagnosis (VERDICT r4 next #3) -----------------------
    # The round-4 capture showed cp_max_abs_err=3.1e-2 on chip vs
    # 2.8e-6 on the CPU dryrun, gated by a bare <0.1. Root-cause by
    # splitting dtype from kernel: run the rect kernel against the
    # reference einsum DIRECTLY on chip in fp32 and bf16, and the full
    # CP-vs-plain model path in fp32.
    from esme_tpu.ops.attention import attention_rect
    from esme_tpu.ops.flash import flash_rect_attention

    T, H, D = 2048, 10, 64
    seg = jnp.asarray(np.repeat(np.arange(8, dtype=np.int32), 256))
    op_errs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        q = jnp.asarray(rng.standard_normal((T, H, D)), dt)
        k = jnp.asarray(rng.standard_normal((T, H, D)), dt)
        v = jnp.asarray(rng.standard_normal((T, H, D)), dt)
        o_f = flash_rect_attention(q, k, v, seg, seg, max_seqlen=256,
                                   interpret=False)
        o_r = attention_rect(q, k, v, seg, seg)
        op_errs[dt.__name__] = float(np.max(np.abs(
            np.asarray(o_f, np.float32) - np.asarray(o_r, np.float32))))

    model32 = ESM2(num_layers=6, embed_dim=640, attention_heads=10,
                   rng=0, dtype='float32')
    lp_cp32 = context_parallel_log_prob(
        model32, jnp.asarray(toks), (jnp.asarray(cu), 258), seq_mesh)
    lp32 = model32.predict_log_prob(jnp.asarray(toks),
                                    pad_args=(jnp.asarray(cu), 258))
    cp_err32 = float(np.max(np.abs(
        np.asarray(lp_cp32[:cu[-1]], np.float32)
        - np.asarray(lp32[:cu[-1]], np.float32))))

    d = abs(loss_sharded - loss_single)
    # Gate justification (measured 2026-08-21, this tool's output):
    # * cp_err_fp32_model — CP (rect kernel) vs plain (fused flash)
    #   through the WHOLE fp32 model measured EXACTLY 0.0 on chip:
    #   the two kernels' per-tile fp32 math is identical, so any bf16
    #   model-path error is operand-dtype rounding, not a kernel
    #   defect. Gate: < 1e-4.
    # * cp_err (bf16 model path) — measured 3.1e-2 ≈ 4 ulps of
    #   ulp(max|log-prob|) = 2^-7 after 6 layers of order-dependent
    #   bf16 accumulation; gate at 8 ulps (0.0625) replaces the old
    #   unjustified <0.1.
    # * rect_op_err_fp32 — kernel vs XLA einsum on fp32 operands
    #   measured 4.5e-3: the MXU executes fp32 matmuls as multi-pass
    #   bf16 while the einsum path requests higher precision — a
    #   precision-MODE mismatch, not kernel math (math is anchored at
    #   1e-6 by the CPU-interpret parity suite and the CPU dryrun's
    #   cp_err=2.8e-6). Gate: < 1e-2. bf16 op-level measured
    #   bit-identical (same bf16 operands, same fp32 accumulation).
    ok = (d < 5e-3 and op_errs['float32'] < 1e-2
          and op_errs['bfloat16'] < 1e-2
          and cp_err32 < 1e-4 and cp_err < 0.0625)
    print('check,loss_single,loss_sharded,abs_diff,cp_max_abs_err,'
          'cp_err_fp32_model,rect_op_err_fp32,rect_op_err_bf16,'
          'backend,pass')
    print(f'onchip_1dev_mesh,{loss_single:.5f},{loss_sharded:.5f},'
          f'{d:.2e},{cp_err:.2e},{cp_err32:.2e},'
          f'{op_errs["float32"]:.2e},{op_errs["bfloat16"]:.2e},'
          f'{jax.default_backend()},{ok}',
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
