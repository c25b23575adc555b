"""Device mesh and sharding rules.

Replaces the reference's Accelerate/DDP/ZeRO-3-over-NCCL stack
(trainer/distributed_trainer.py:15-16, configs/accel/*.yaml) with one global
``jax.sharding.Mesh`` and ``NamedSharding`` annotations; XLA inserts the
collectives over ICI/DCN.

Axes (SURVEY.md §2.6 capability mapping):
  * ``data``   — data parallel (≈ DDP / grad all-reduce)
  * ``fsdp``   — parameter/optimizer sharding (≈ ZeRO-3)
  * ``tensor`` — tensor parallel (reserved; the reference has TP=∅ but a 7B
                 model should also be shardable across a v5e-8 slice)

Multi-host: ``jax.distributed.initialize`` + the same mesh spanning all
processes; python-object gathers go through
``jax.experimental.multihost_utils.process_allgather`` (≈ all_gather_object)
and barriers through ``sync_global_devices`` (≈ dist.barrier / accel.wait_for_everyone).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "make_mesh", "param_sharding", "batch_sharding",
           "replicated", "shard_params", "ParallelContext"]


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1      # -1: absorb remaining devices
    fsdp: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        d, f, t = self.data, self.fsdp, self.tensor
        known = (f if f > 0 else 1) * (t if t > 0 else 1)
        if d == -1:
            d = n_devices // known
        if d * f * t != n_devices:
            raise ValueError(f"mesh {d}x{f}x{t} != {n_devices} devices")
        return d, f, t


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    d, f, t = cfg.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(d, f, t)
    return Mesh(dev_array, axis_names=("data", "fsdp", "tensor"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over (data, fsdp) — fsdp acts as extra DP for inputs."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def _fsdp_spec(path: tuple, leaf: Any, mesh: Mesh) -> P:
    """Sharding rule: at most ONE sharded dim per tensor.

    Matrices take the tensor axis on their last dim when it divides;
    otherwise the fsdp axis shards the largest non-layer dim (ZeRO-3-style).
    The leading layer axis of stacked (ndim>=3) tensors is never sharded —
    it is the scan axis.

    Deliberately NOT 2-D (fsdp x tensor) sharding of a single tensor: grads
    of doubly-sharded params under SPMD on the CPU backend were observed to
    be wrong by ~100% (XLA SPMD backward bug, tests/test_train_step.py
    sharded-parity test is the regression guard); one sharded axis per tensor
    still gives full memory scaling and is the megatron-style layout XLA
    handles best.
    """
    fsdp = mesh.shape["fsdp"]
    tensor = mesh.shape["tensor"]
    shape = getattr(leaf, "shape", ())
    if fsdp == 1 and tensor == 1:
        return P()
    ndim = len(shape)
    if ndim == 0:
        return P()
    start = 1 if ndim >= 2 else 0   # skip the stacked-layer/scan axis
    spec: list = [None] * ndim
    if tensor > 1 and ndim >= 2 and shape[-1] % tensor == 0:
        spec[-1] = "tensor"
    elif fsdp > 1:
        for i in range(start, ndim):
            if shape[i] % fsdp == 0:
                spec[i] = "fsdp"
                break
    return P(*spec)


def param_sharding(params: Any, mesh: Mesh) -> Any:
    """A NamedSharding pytree for a params pytree, FSDP+TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _fsdp_spec(path, leaf, mesh)), params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = param_sharding(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


@dataclasses.dataclass
class ParallelContext:
    """Process-level distributed context (≈ utils/distributed.py:16-56)."""
    mesh: Mesh

    @property
    def process_index(self) -> int:
        return jax.process_index()

    @property
    def process_count(self) -> int:
        return jax.process_count()

    @property
    def is_main(self) -> bool:
        return jax.process_index() == 0

    def barrier(self, name: str = "barrier") -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(name)

    def allgather_objects(self, obj):
        """Gather an ARBITRARY python object from every process
        (≈ dist.all_gather_object, pipeline/CuLLaVOPipeline.py:65-69).

        ``process_allgather`` alone only gathers array pytrees leaf-wise —
        the step2_pre JSON rows (strings) the pipeline merges would mangle
        (caught by the 2-process dryrun, parallel/multihost_dryrun.py) — so
        objects travel pickled as padded uint8 payloads: one tiny gather for
        the lengths, one for the max-padded buffers."""
        if jax.process_count() == 1:
            return [obj]
        import pickle

        import numpy as np
        from jax.experimental import multihost_utils

        payload = np.frombuffer(pickle.dumps(obj), np.uint8)
        lens = np.asarray(multihost_utils.process_allgather(
            np.asarray([payload.size], np.int32), tiled=False)).reshape(-1)
        buf = np.zeros((int(lens.max()),), np.uint8)
        buf[:payload.size] = payload
        bufs = np.asarray(multihost_utils.process_allgather(buf, tiled=False))
        return [pickle.loads(bufs[i, :int(lens[i])].tobytes())
                for i in range(len(lens))]


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (≈ accelerate launch rendezvous, node_run:22-43)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
