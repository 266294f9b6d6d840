"""esme_tpu — TPU-native ESM protein language model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
uci-cbcl/esm-efficient (reference mounted at /root/reference): unpadded
("varlen") packed batching, flash attention over packed segments,
ESM1b/ESM1v/ESM2/ESMC model families, LoRA fine-tuning, int8/int4
weight quantization, masked-LM training with FSDP sharding over a
device mesh, and variant-effect prediction.

The compute path is pure JAX (jit/pjit/Pallas); the data plane is
numpy + threads on the host.
"""

from .alphabet import (Alphabet, Alphabet3, mask_tokens, pad_tokens,
                       tokenize, tokenize_unpad, token_to_str)
from .fasta import Fasta, read_fai, write_fai
from .data import (FastaDataset, FastaTokenDataset, MaskedFastaDataset,
                   MaskedFastaDataModule, MaskedFastaTokenDataset,
                   MaskedFastaTokenDataModule, LabeledDataset, PackedBatch,
                   Prefetcher, TokenSizeBatchSampler, balance_binary)
from .models.config import (ESMConfig, config_for, esm1b_config,
                            esm1v_config, esm2_config, esmc_config)
from .models.esm import ESM, ESM1b, ESM1v, ESM2, ESMC
from .logger import MetricLogger, read_log

__version__ = '0.1.0'
