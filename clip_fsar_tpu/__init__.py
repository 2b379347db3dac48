"""clip_fsar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video few-shot
action-recognition framework with the capabilities of
alibaba-mmai-research/CLIP-FSAR.

Design stance (vs the PyTorch reference at /root/reference):
  * functional core: pure ``forward(params, episode) -> logits`` functions,
    no module state; everything jit-able with static shapes.
  * episodes are fixed-shape pytrees; many episodes are batched per step and
    sharded over a ``data`` mesh axis with ``jax.sharding`` — the DDP/NCCL
    runtime of the reference (utils/launcher.py, utils/distributed.py)
    collapses into shardings + XLA collectives.
  * the CLIP towers compute in bfloat16 with float32 LayerNorm (mirroring the
    fp16-safe LayerNorm of the reference, models/base/few_shot.py:605-611),
    keeping the MXU fed with large fused matmuls.
  * hot non-matmul paths (OTAM dynamic programming, fused attention) have
    Pallas kernels under ``clip_fsar_tpu.ops``.
"""

__version__ = "0.1.0"
