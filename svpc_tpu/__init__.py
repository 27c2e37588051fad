"""svpc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for state-aware
video procedural captioning.

Re-designed from scratch with the capabilities of the PyTorch reference
(awkrail/svpc, ACM MM 2021): a MART-derived recurrent encoder-decoder
transformer with a visual simulator (entity-state memory over recipe
ingredients), a pointer-generator copy mechanism, and a textual
re-simulator trained with straight-through Gumbel-softmax sampling.

Architecture notes (TPU-first, not a port):
  * fixed-shape batched tensors ``(B, S, L)`` + validity masks replace the
    reference's per-example Python loops (reference: src/rtransformer/model.py:1059),
  * ``lax.scan`` carries the entity memory across steps (reference's
    sequential loop at src/rtransformer/model.py:792-820),
  * greedy decoding is a jit-compiled ``lax.scan`` (reference:
    src/translator.py:88-113 re-runs the decoder per token in Python),
  * data-parallel training shards the batch over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from svpc_tpu.config import ModelConfig, TrainConfig, DataConfig  # noqa: F401
