"""cullavo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capability surface of LTTTDH/Causal-Unified-Language-Vision (CuLLaVO).

Layout:
    config.py    — YAML config system (multi-file merge, dotted overrides)
    models/      — LLaVA-1.5 multimodal LM (JAX) + X-Decoder segmentation stack
    ops/         — Pallas TPU kernels (flash attention, NF4 dequant-matmul,
                   deformable attention, fused image preprocessing)
    parallel/    — device mesh, sharding rules (DP/FSDP/TP axes)
    data/        — dataset registry, mappers, evaluators (detectron2-free)
    pipelines/   — workload drivers (train step1/step2, VQA / ImageNet /
                   RefCOCO / segmentation eval)
    trainer/     — train loop, optimizers, checkpointing
    checkpoint/  — HF safetensors import, orbax sharded checkpoints
"""

__version__ = "0.1.0"

from cullavo_tpu.config import Config, load_config, load_opt_command  # noqa: F401
