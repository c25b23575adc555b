"""CLI entry point.

Capability parity with entry.py / lbk_entry.py: ``python -m cullavo_tpu.entry
{train,eval,serve} --conf_files ... --overrides K V ...``; dispatch by config
``NAME`` (lbk_entry.py:6-22 semantics):
  * ``cullavo_step1`` / ``cullavo_step2``  → CuLLaVO Q-LoRA training
  * ``cullavo_step2_pre``                  → model-in-the-loop data generation
  * ``xdecoder_test``                      → segmentation / grounding eval
  * ``vl_test``                            → zero-shot VL benchmark eval
  * ``serve`` (command)                    → continuous-batching serving over
    a JSONL request stream (beyond the reference; configs/serve.yaml)

(The reference's hardcoded wandb API key at entry.py:39 is deliberately NOT
replicated; set WANDB_API_KEY in the environment.)
"""
from __future__ import annotations

import os
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

    llm_cfg = (cfg.get("MODEL") or {}).get("LLM") or {}
    model_path = llm_cfg.get("LOAD_PATH")
    if model_path:
        from cullavo_tpu.checkpoint.hf_import import llava_config_from_json

        # architecture from the snapshot's config.json (any LLaVA-family
        # size), not a hardcoded 7B
        model_cfg = llava_config_from_json(model_path)
        # keep the imported weights on HOST: maybe_quantize_base below
        # NF4/int8-encodes them there (C++ quantizer) so only the packed
        # streams are uploaded — uploading f32 first would ship 8× the
        # bytes and OOM a 16 GB chip before quantization could run
        params = load_llava_safetensors(model_path, model_cfg, np.float32)
        try:
            tokenizer = HFTokenizer(model_path)
        except Exception as e:  # noqa: BLE001 — weights-only snapshot
            print(f"[entry] no tokenizer under {model_path} ({e}); "
                  "falling back to ByteTokenizer (token-id workloads only)",
                  file=sys.stderr)
            from cullavo_tpu.data.tokenizer import ByteTokenizer

            tokenizer = ByteTokenizer()
    else:
        print("[entry] no MODEL.LLM.LOAD_PATH — using tiny random model "
              "(smoke mode)", file=sys.stderr)
        model_cfg = tiny_llava_config(260)
        params = init_llava_params(model_cfg, jax.random.PRNGKey(0))
        from cullavo_tpu.data.tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer()
    bits = int(llm_cfg.get("BITS") or 0)
    # the reference loads the LLM quantized (BITS: 4 → NF4 Q-LoRA base,
    # load_cullavo.py:65-83; the VL eval pipelines load 8-bit,
    # LLaVAVQAVALPipeline.py:94-102) — honor it on every CLI workload.
    # For the 8-bit s8s8 fast path, calibrate first (ops/calibrate.py)
    # and pass smooth_scales via quantize_llm_weights directly.
    from cullavo_tpu.models.llava.lora import maybe_quantize_base

    params = maybe_quantize_base(params, bits)
    params = jax.tree.map(jnp.asarray, params)
    return model_cfg, params, tokenizer


def train_xdecoder(cfg):
    """X-Decoder (joint seg+caption+grounding) training workload — the
    config-named trainer for the seg stack (reference XDecoderPipeline train
    path; round-1 gap: only LLaVA trained via the entry)."""
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.data.coco_caption_grounding import (JointTrainMapper,
                                                         collate_joint)
    from cullavo_tpu.data.registry import get_dataset, get_metadata
    from cullavo_tpu.models.from_config import xdecoder_model_config_from
    from cullavo_tpu.trainer.optimizer import xdecoder_optimizer
    from cullavo_tpu.trainer.step import TrainState
    from cullavo_tpu.trainer.xdecoder_step import (make_xdecoder_joint_train_step,
                                                   shard_xdecoder_step)

    model_cfg = xdecoder_model_config_from(cfg)
    params = _load_xdecoder_params(cfg, model_cfg)
    tokenize = _make_text_tokenize(cfg, model_cfg.text)
    sol = cfg.get("SOLVER", {})
    tx = xdecoder_optimizer(
        base_lr=float(sol.get("BASE_LR", 1e-4)),
        total_steps=int(sol.get("MAX_ITER", 1000)),
        grad_clip=float(sol.get("CLIP_VALUE", 0.01)))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    # bf16 mixed precision by default — the reference's Accelerate config
    # (mixed_precision: bf16); FP32_TRAIN: true reverts to full f32
    step_fn = make_xdecoder_joint_train_step(
        model_cfg, tx, remat=bool(cfg.get("REMAT", True)),
        compute_dtype=None if cfg.get("FP32_TRAIN") else jnp.bfloat16)
    # build a mesh whenever ANY mesh axis is configured (MESH_FSDP/TENSOR
    # without MESH_DATA must not silently fall back to single-device jit)
    mesh = (_build_mesh(cfg)
            if any(int(cfg.get(k, 0)) != 0
                   for k in ("MESH_DATA", "MESH_FSDP", "MESH_TENSOR"))
            else None)
    jitted = None   # built on the first batch (joint sharding needs its keys)

    names = cfg.get("DATASETS", {}).get("TRAIN") if "DATASETS" in cfg else None
    if isinstance(names, str):
        names = [names]
    if not names:
        print("[entry] no DATASETS.TRAIN — nothing to do", file=sys.stderr)
        return
    # ALL configured training datasets contribute (e.g. COCO + LVIS
    # caption-grounding variants) — not just the first
    records = []
    for nm in names:
        records.extend(get_dataset(nm))
    md = get_metadata(names[0]) or {}
    class_names = _resolve_class_names(names[0], md, model_cfg.num_classes)
    image_size = int(cfg.get("INPUT", {}).get("IMAGE_SIZE", 512)
                     if "INPUT" in cfg else 512)
    mapper = JointTrainMapper(image_size=image_size, class_names=class_names)
    from cullavo_tpu.data.mappers.eval_mappers import normalize_np

    cls_ids, cls_mask = tokenize(
        [f"a photo of a {c}." for c in class_names] + ["A background in coco."])
    batch_size = int(cfg.get("BATCH_SIZE", 8))
    epochs = int(cfg.get("EPOCHS", 1))
    rng_np = np.random.default_rng(int(cfg.get("SEED", 0)))
    rng = jax.random.PRNGKey(int(cfg.get("SEED", 0)))
    step_i = 0
    def _full_batches(order):
        # CONSTANT batch size: keep pulling until batch_size valid samples
        # (mapper returns None for images with no valid segments — common in
        # COCO).  A shrinking batch would retrace + recompile the joint step
        # per unique size, minutes each through the AOT helper; drop-last.
        buf = []
        for j in order:
            m = mapper(records[j])
            if m is not None:
                buf.append(m)
                if len(buf) == batch_size:
                    yield buf
                    buf = []

    for epoch in range(epochs):
        order = rng_np.permutation(len(records))
        for mapped in _full_batches(order):
            batch = collate_joint(mapped, tokenize, class_names, rng_np,
                                  max_instances=int(cfg.get("MAX_INSTANCES", 20)))
            batch["image"] = np.stack([normalize_np(m["image"]) for m in mapped])
            batch["class_ids"], batch["class_mask"] = cls_ids, cls_mask
            if jitted is None:
                jitted = (shard_xdecoder_step(step_fn, mesh, state, joint=True,
                                              batch_keys=batch.keys())
                          if mesh is not None else jax.jit(step_fn))
            rng, sub = jax.random.split(rng)
            state, metrics = jitted(state, {k: jnp.asarray(v) for k, v in
                                            batch.items()}, sub)
            step_i += 1
            print({"step": step_i,
                   "loss_total": float(metrics["loss_total"]),
                   "grad_norm": float(metrics["grad_norm"])}, file=sys.stderr)
    if cfg.get("SAVE_DIR"):
        from cullavo_tpu.checkpoint.store import save_checkpoint

        save_checkpoint(cfg["SAVE_DIR"], step_i,
                        {"params": jax.device_get(state.trainable)})
    return state


def train(cfg):
    import jax

    from cullavo_tpu.pipelines.base import build_pipeline
    import cullavo_tpu.pipelines.cullavo_pipeline  # noqa: F401 (registration)
    from cullavo_tpu.trainer.loop import LoopConfig, train_loop

    register_datasets_from_cfg(cfg)
    if "xdecoder" in cfg.get("NAME", ""):
        return train_xdecoder(cfg)

    model_cfg, params, tokenizer = _build_llava(cfg)
    mesh = _build_mesh(cfg)
    pipe = build_pipeline(cfg.get("PIPELINE", "CuLLaVOPipeline"), cfg,
                          model_cfg=model_cfg, tokenizer=tokenizer,
                          params=params, mesh=mesh)
    state = pipe.initialize_model()

    resume = cfg.get("RESUME_FROM")
    if resume:
        # the reference's step1→step2 resume points RESUME_FROM at
        # epoch{N}/CuLLaVO.pt with the 'cullavo' adapter tree next to it
        # (BaseModel.from_pretrained:71-136); load it into the trainable
        # partition (reference-layout export below writes the same tree)
        import jax.numpy as jnp

        from cullavo_tpu.checkpoint.reference_layout import load_reference_layout
        from cullavo_tpu.trainer.step import TrainState

        trainable = jax.tree.map(
            jnp.asarray, load_reference_layout(resume, state.trainable))
        state = TrainState(trainable, state.opt_state, state.step)
        pipe.state = state
        print(f"[entry] resumed trainable state from {resume}", file=sys.stderr)

    dataset_name = cfg.get("DATASETS", {}).get("TRAIN") if "DATASETS" in cfg else None
    if not dataset_name:
        print("[entry] no DATASETS.TRAIN configured — smoke step only",
              file=sys.stderr)
        records = _smoke_records(model_cfg)
        batch = pipe.make_batch(records, pad_to=None)
        state, metrics = pipe.forward_step(state, batch, jax.random.PRNGKey(0))
        print({k: float(v) for k, v in metrics.items()})
        return

    from cullavo_tpu.data.coco_panoptic import PanopticMapper
    from cullavo_tpu.data.registry import get_dataset

    records = get_dataset(dataset_name)
    batch_size = int(cfg.get("BATCH_SIZE", 8))
    # registered datasets (KIND: coco_panoptic, DETECTRON2_DATASETS bulk)
    # yield RAW records (file_name/pan_seg_file_name/segments); the step1
    # synthesis consumes the MAPPED format ({"image","classes","boxes",
    # "is_thing"}) — map lazily per batch so images load on demand, and
    # buffer past unmappable records (no instances) to keep a constant
    # batch shape, as train_xdecoder does
    mapper = PanopticMapper(image_size=model_cfg.vision.image_size)

    def _mapped(rec):
        if "is_thing" in rec:
            return rec
        return mapper(rec)

    def data_iter(epoch):
        order = np.random.default_rng(epoch).permutation(len(records))
        buf = []
        for j in order:
            rec = _mapped(records[j])
            if rec is not None:
                buf.append(rec)
            if len(buf) == batch_size:
                yield pipe.make_batch(buf)
                buf = []

    save_fn = None
    if hasattr(pipe, "lora_cfg"):
        from cullavo_tpu.checkpoint.reference_layout import save_reference_layout
        from cullavo_tpu.checkpoint.store import save_checkpoint

        def save_fn(save_dir, global_step, st, epoch):
            save_checkpoint(save_dir, global_step, st)
            ep = save_reference_layout(save_dir, epoch, st.trainable,
                                       pipe.lora_cfg)
            print(f"[entry] reference-layout checkpoint at {ep}",
                  file=sys.stderr)

    loop_cfg = LoopConfig(max_epochs=int(cfg.get("EPOCHS", 1)),
                          checkpoint_period=int(cfg.get("PERIOD", 0)),
                          log_every=int(cfg.get("LOG_EVERY", 10)),
                          save_dir=cfg.get("SAVE_DIR"))
    train_loop(state, pipe.frozen, pipe.step_fn, data_iter,
               steps_per_epoch=len(records) // batch_size, cfg=loop_cfg,
               rng=jax.random.PRNGKey(0),
               log_fn=lambda d: print(d, file=sys.stderr), save_fn=save_fn)


def _smoke_records(model_cfg):
    import jax

    rng = np.random.default_rng(0)
    recs = []
    # batch must divide over the configured mesh (MESH_DATA: -1 spans all
    # devices — 8 on the virtual-CPU test mesh)
    for _ in range(max(2, jax.device_count())):
        recs.append({
            "image": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            "classes": np.asarray([0, 2]),
            "boxes": np.asarray([[4, 4, 30, 30], [10, 12, 40, 44]], np.float32),
            "is_thing": np.asarray([True, True]),
        })
    return recs


def register_datasets_from_cfg(cfg):
    """Dataset registration for the eval entry.

    Two sources, mirroring the reference's import-time detectron2 registration
    (datasets/registration/__init__.py:1-24):
      * the DETECTRON2_DATASETS / DATASET env root → bulk registration of the
        standard table (register_all_segmentation), and
      * an explicit ``DATASETS.REGISTER: {name: {KIND: ..., paths...}}``
        config block so fixture datasets can be wired per-workload (used by
        the CLI integration tests; no reference equivalent — the reference
        hardcodes paths in the registration modules).
    """
    import os

    root = os.environ.get("DETECTRON2_DATASETS") or os.environ.get("DATASET")
    if root and os.path.isdir(root):
        from cullavo_tpu.data.datasets import register_all_segmentation

        try:
            register_all_segmentation(root)
        except Exception as e:  # missing sub-datasets are fine
            print(f"[entry] bulk dataset registration: {e}", file=sys.stderr)

    reg = cfg.get("DATASETS", {}).get("REGISTER") if "DATASETS" in cfg else None
    if not reg:
        return
    from cullavo_tpu.data.coco_panoptic import register_coco_panoptic
    from cullavo_tpu.data.datasets import (load_semseg_pairs, register_refcoco,
                                           register_vqa)
    from cullavo_tpu.data.registry import register_dataset

    for name, spec in dict(reg).items():
        kind = spec.get("KIND", "semseg")
        if kind == "semseg":
            image_dir, ann_dir = spec["IMAGE_DIR"], spec["ANN_DIR"]
            image_ext = spec.get("IMAGE_EXT", ".jpg")
            register_dataset(
                name,
                (lambda d=image_dir, a=ann_dir, e=image_ext:
                 load_semseg_pairs(d, a, image_ext=e)),
                {"num_classes": int(spec.get("NUM_CLASSES", 133)),
                 "ignore_label": int(spec.get("IGNORE_LABEL", 255)),
                 "class_names": list(spec.get("CLASS_NAMES", [])) or None,
                 "tasks": spec.get("TASKS")})
        elif kind == "coco_panoptic":
            register_coco_panoptic(
                name, spec["JSON"], spec["IMAGE_DIR"], spec["PANOPTIC_DIR"],
                metadata={"num_classes": int(spec.get("NUM_CLASSES", 133)),
                          "class_names": list(spec.get("CLASS_NAMES", [])) or None,
                          "tasks": spec.get("TASKS")})
        elif kind == "refcoco":
            register_refcoco(name, spec["REFS_JSON"], spec["INSTANCES_JSON"],
                             spec["IMAGE_DIR"], split=spec.get("SPLIT", "val"))
        elif kind == "vqa":
            kw = {}
            if spec.get("IMAGE_TEMPLATE"):
                # test-dev uses COCO_test2015_{:012d}.jpg naming
                kw["image_template"] = str(spec["IMAGE_TEMPLATE"])
            register_vqa(name, spec["QUESTIONS_JSON"],
                         spec.get("ANNOTATIONS_JSON"), spec["IMAGE_DIR"], **kw)
        elif kind == "coco_panoptic_caption_grounding":
            from cullavo_tpu.data.coco_caption_grounding import (
                register_coco_panoptic_caption_grounding)

            register_coco_panoptic_caption_grounding(
                name, spec["JSON"], spec["IMAGE_DIR"], spec["PANOPTIC_DIR"],
                spec["CAPTION_JSON"], spec["GROUNDING_JSON"],
                metadata={"num_classes": int(spec.get("NUM_CLASSES", 133)),
                          "class_names": list(spec.get("CLASS_NAMES", [])) or None},
                lvis_json=spec.get("LVIS_JSON"))
        elif kind == "conversations":
            from cullavo_tpu.data.instruction_data import load_conversation_json

            register_dataset(
                name,
                (lambda j=spec["JSON"], r=spec.get("IMAGE_ROOT"):
                 load_conversation_json(j, r)),
                {})
        elif kind == "imagenet":
            from cullavo_tpu.data.datasets import register_imagenet

            register_imagenet(
                name, spec["ROOT"],
                folder_names=list(spec.get("FOLDERS", [])) or None,
                class_names=list(spec.get("CLASS_NAMES", [])) or None)
        else:
            raise ValueError(f"unknown DATASETS.REGISTER KIND {kind!r}")


def _dataset_names(cfg) -> list:
    names = cfg.get("DATASETS", {}).get("TEST") if "DATASETS" in cfg else None
    if not names:
        return []
    if isinstance(names, str):
        return [names]
    return list(names)


def _make_text_tokenize(cfg, text_cfg):
    """CLIP-text tokenizer → ``tokenize(texts) -> (ids, mask)`` padded to
    context_length.  HF CLIPTokenizer when MODEL.TEXT.TOKENIZER is a path
    (LangEncoder/build.py:19-33); deterministic hash fallback otherwise
    (smoke/fixture mode — embeddings are random anyway without a checkpoint)."""
    import numpy as np

    path = cfg.get("MODEL", {}).get("TEXT", {}).get("TOKENIZER") \
        if "MODEL" in cfg else None
    T = text_cfg.context_length
    if path:
        from transformers import CLIPTokenizerFast

        tk = CLIPTokenizerFast.from_pretrained(path)

        def tokenize(texts):
            enc = tk(list(texts), padding="max_length", truncation=True,
                     max_length=T, return_tensors="np")
            return (enc["input_ids"].astype(np.int32),
                    enc["attention_mask"].astype(np.int32))

        return tokenize

    V = text_cfg.vocab_size

    def _word_id(w: str) -> int:
        # md5, NOT builtin hash(): hash() is salted per process, which would
        # give each host (and each run) a different token table — divergent
        # replicated class_ids across hosts, unreproducible runs
        import hashlib

        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return 2 + h % (V - 3)

    def tokenize(texts):
        ids = np.zeros((len(texts), T), np.int32)
        mask = np.zeros((len(texts), T), np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split()[: T - 2]
            row = [1] + [_word_id(w) for w in words]
            ids[i, :len(row)] = row
            ids[i, len(row)] = V - 1          # EOT = argmax id (CLIP convention)
            mask[i, :len(row) + 1] = 1
        return ids, mask

    return tokenize


def _resolve_class_names(ds_name: str, md: dict, num_classes: int) -> list:
    """Class vocabulary for a dataset, in priority order: explicit
    ``class_names`` metadata → the ``class_names_key`` constant-table key
    written by every bulk registration (ADE/ScanNet/BDD/SUN-RGBD/…) →
    name-fragment lookup (modeling/utils/misc.py get_class_names) → COCO
    panoptic fallback.  Scoring ADE against the COCO vocabulary would run
    to completion with meaningless numbers — resolve BEFORE falling back."""
    names = md.get("class_names")
    if names:
        return list(names)
    from cullavo_tpu.utils import constants
    from cullavo_tpu.utils.constants import COCO_PANOPTIC_CLASSES, class_names_for

    key = md.get("class_names_key")
    if key:
        try:
            return list(constants._load()[key])
        except KeyError:
            pass
    try:
        return list(class_names_for(ds_name))
    except KeyError:
        return list(COCO_PANOPTIC_CLASSES)[:num_classes]


def _make_text_decode(cfg):
    """token ids → caption string for the captioning evaluator.  Uses the
    configured HF CLIP tokenizer's real decode when present; the numeric
    fallback only makes sense for fixture smoke runs (random weights)."""
    path = cfg.get("MODEL", {}).get("TEXT", {}).get("TOKENIZER") \
        if "MODEL" in cfg else None
    if path:
        from transformers import CLIPTokenizerFast

        tk = CLIPTokenizerFast.from_pretrained(path)
        eot = tk.eos_token_id

        def decode(ids):
            ids = [int(i) for i in ids]
            # truncate at the first EOT: the greedy head fills every slot,
            # so post-EOT argmax garbage must not join the scored caption
            # (the reference splits on '<|endoftext|>')
            if eot in ids:
                ids = ids[:ids.index(eot)]
            return tk.decode(ids, skip_special_tokens=True)

        return decode
    return lambda ids: " ".join(str(int(i)) for i in ids)


def _load_xdecoder_params(cfg, model_cfg):
    """RESUME_FROM semantics (trainer/default_trainer.py:60-62 +
    BaseModel.from_pretrained): a repo checkpoint dir, a torch-layout
    state-dict file (np .npz of the reference layout), or absent → random
    init (smoke)."""
    import jax

    from cullavo_tpu.models.xdecoder.model import init_xdecoder_model_params

    params = jax.jit(
        lambda k: init_xdecoder_model_params(model_cfg, k))(jax.random.PRNGKey(0))
    resume = cfg.get("RESUME_FROM")
    if not resume:
        print("[entry] no RESUME_FROM — random weights (smoke mode)",
              file=sys.stderr)
        return params
    import os

    if os.path.isdir(resume):
        from cullavo_tpu.checkpoint.store import load_checkpoint

        state = load_checkpoint(resume)
        loaded = state.get("params", state) if isinstance(state, dict) else state
        from cullavo_tpu.checkpoint.xdecoder_import import align_and_update

        return align_and_update(params, loaded,
                                log=lambda m: print(m, file=sys.stderr))
    if resume.endswith((".pt", ".pth", ".bin")):
        # the reference's own torch checkpoint format (BaseModel.py:20-69
        # CuLLaVO.pt / xdecoder_focalt_last.pt): torch state dict → numpy
        import torch

        raw = torch.load(resume, map_location="cpu", weights_only=True)
        if isinstance(raw, dict) and "model" in raw \
                and isinstance(raw["model"], dict):
            raw = raw["model"]
        state = {k: v.float().numpy() for k, v in raw.items()
                 if hasattr(v, "numpy")}
    else:
        # flat reference-layout state dict saved as npz (torch-free hosts)
        state = dict(np.load(resume, allow_pickle=False))
    from cullavo_tpu.checkpoint.xdecoder_import import (align_and_update,
                                                       import_xdecoder_checkpoint)

    loaded = import_xdecoder_checkpoint(state, model_cfg)
    return align_and_update(params, loaded,
                            log=lambda m: print(m, file=sys.stderr))


def _eval_xdecoder(cfg) -> dict:
    """xdecoder_test workload: reference lbk_entry.py:17-19 → trainer.eval()
    → XDecoderPipeline/RefCOCOPipeline per DATASETS.TEST entry."""
    from cullavo_tpu.data.mappers import (PanopticEvalMapper, RefCOCOEvalMapper,
                                          SemSegEvalMapper)
    from cullavo_tpu.data.registry import get_dataset, get_metadata
    from cullavo_tpu.models.from_config import xdecoder_model_config_from
    from cullavo_tpu.models.xdecoder.text_encoder import class_embeddings_ensembled
    from cullavo_tpu.pipelines.base import build_pipeline
    import cullavo_tpu.pipelines.xdecoder_pipeline as xp

    model_cfg = xdecoder_model_config_from(cfg)
    params = _load_xdecoder_params(cfg, model_cfg)
    tokenize = _make_text_tokenize(cfg, model_cfg.text)
    limit = int(cfg.get("LIMIT", 0)) or None
    out_dir = cfg.get("SAVE_DIR")

    results = {}
    for ds_name in _dataset_names(cfg):
        records = get_dataset(ds_name)
        md = get_metadata(ds_name) or {}
        class_names = _resolve_class_names(ds_name, md, model_cfg.num_classes)
        ev_type = md.get("evaluator_type")
        if ev_type in ("retrieval", "captioning") or ds_name.startswith("vlp"):
            import cullavo_tpu.pipelines.vlp_pipeline  # noqa: F401 (registration)

            loader_state = md.get("image_loader") or {}
            image_loader = loader_state.get("loader")
            if image_loader is None:
                from cullavo_tpu.data.mappers.eval_mappers import load_image_rgb

                image_loader = lambda r: load_image_rgb(r["file_name"])
            # dedicated knob: INPUT.IMAGE_SIZE sizes the seg eval (512) and
            # must not leak into the 224-square retrieval/captioning embeds
            vlp_kw = {"batch_size": int(cfg.get("BATCH_SIZE", 8)),
                      "image_size": int(cfg.get("VLP_IMAGE_SIZE", 224))}
            if ev_type == "captioning" or "captioning" in ds_name:
                pipe = build_pipeline(
                    "COCOCaptionXDecPipeline", cfg, model_cfg=model_cfg,
                    params=params, image_loader=image_loader,
                    decode_text=_make_text_decode(cfg),
                    start_token_id=model_cfg.text.vocab_size - 2, **vlp_kw)
                results[ds_name] = pipe.evaluate_model(
                    records, limit=limit,
                    out_path=(os.path.join(out_dir, f"{ds_name}_captions.json")
                              if out_dir else None))
            else:
                pipe = build_pipeline(
                    "VLPRetrievalPipeline", cfg, model_cfg=model_cfg,
                    params=params, tokenize=tokenize,
                    image_loader=image_loader, **vlp_kw)
                results[ds_name] = pipe.evaluate_model(records, limit=limit)
            continue
        if "ref" in ds_name or (records and "text" in records[0]):
            pipe = build_pipeline("RefCOCOPipeline", cfg, model_cfg=model_cfg,
                                  params=params, tokenize=tokenize,
                                  class_names=class_names,
                                  eval_batch=int(cfg.get("EVAL_BATCH", 8)))
            rows = map(RefCOCOEvalMapper(), records)
            results[ds_name] = pipe.evaluate_model(rows, limit=limit,
                                                   out_dir=out_dir)
            continue
        try:
            # keep only the keys EvalTasks knows: an extra config key (e.g.
            # GROUNDING) must degrade to the known subset, not TypeError out
            known = {"semantic", "instance", "panoptic"}
            t = md.get("tasks")
            if isinstance(t, (list, tuple)):
                # list form: TASKS: [semantic, panoptic, instance]
                t = {k: True for k in t}
            tasks = (xp.EvalTasks(**{str(k).lower(): bool(v)
                                     for k, v in dict(t).items()
                                     if str(k).lower() in known})
                     if t else xp.tasks_for_dataset(ds_name))
        except ValueError:
            tasks = xp.EvalTasks(semantic=True)
        # class-name text embeddings, prompt-ensembled, computed once before
        # eval (XDecoderPipeline.py:124; vlpencoder.py:104-127)
        text_embeds = class_embeddings_ensembled(
            params["text"], model_cfg.text, tokenize, class_names,
            add_background=True)
        panoptic_records = bool(records and "pan_seg_file_name" in records[0])
        mapper = PanopticEvalMapper() if panoptic_records else SemSegEvalMapper()
        thing_ids = set()
        if panoptic_records:
            for r in records:
                thing_ids |= {s["category_id"] for s in r["segments_info"]
                              if s.get("isthing", True)}
        pipe = build_pipeline("XDecoderPipeline", cfg, model_cfg=model_cfg,
                              params=params, text_class_embeds=text_embeds,
                              tasks=tasks,
                              eval_batch=int(cfg.get("EVAL_BATCH", 8)))
        out = pipe.evaluate_model((mapper(r) for r in records), limit=limit,
                                  thing_ids=frozenset(thing_ids))
        # metric dict only — raw per-image outputs stay out of the report
        results[ds_name] = {k: v for k, v in out.items()
                            if k not in ("panoptic_outputs", "instance_outputs")}
    return results


def _eval_vl(cfg) -> dict:
    """vl_test workload: lbk_entry.py:20-22 → eval_for_vl_model →
    VQA pipeline over DATASETS.TEST."""
    from cullavo_tpu.data.mappers import VQAEvalMapper
    from cullavo_tpu.data.registry import get_dataset
    from cullavo_tpu.pipelines.base import build_pipeline
    import cullavo_tpu.pipelines.vqa_pipeline  # noqa: F401 (registration)

    zoo = (cfg.get("MODEL") or {}).get("ZOO")
    if zoo:
        # zoo workload (the reference's BLIP-2/InstructBLIP/KOSMOS-2/BakLLaVA
        # vl_test pipelines): MODEL.ZOO selects the spec; MODEL.ZOO_PATH a
        # local HF snapshot for the torch harness; without a path the
        # native tower answers (tiny random smoke model when MODEL.TINY)
        return _eval_vl_zoo(cfg, zoo)

    model_cfg, params, tokenizer = _build_llava(cfg)
    extra = {}
    if cfg.get("KV_QUANT"):
        # "int8" stores the decode cache quantized — half the footprint and
        # half the decode-step cache read (llama.init_kv_cache).  Passed
        # only when set: zoo pipelines don't take the kwarg.
        extra["kv_quant"] = cfg.get("KV_QUANT")
    if cfg.get("SPEC_K"):
        # speculative decode window (prompt-lookup drafting, greedy-only,
        # token-exact — modeling.generate_decode_spec)
        extra["spec_k"] = int(cfg.get("SPEC_K"))
    topic = (cfg.get("MODEL") or {}).get("TOPIC")
    if topic:
        # the reference's per-class CSV classifier (LLaMA-2 in-context topic
        # word + CLIP text match, LLaVAVQAVALPipeline.py:94-169) as the
        # default topic_fn — no injected hook needed.
        #   MODEL.TOPIC: {LLAMA_PATH: ..., CLIP_PATH: ...}   (HF snapshots)
        #   MODEL.TOPIC: tiny                                 (random towers)
        from cullavo_tpu.pipelines.vqa_pipeline import (make_reference_topic_fn,
                                                        make_tiny_topic_fn)

        if isinstance(topic, str) and topic.lower() == "tiny":
            extra["topic_fn"] = make_tiny_topic_fn()
        else:
            extra["topic_fn"] = make_reference_topic_fn(
                topic["LLAMA_PATH"], topic["CLIP_PATH"])
    pipe = build_pipeline(cfg.get("PIPELINE", "LLaVAVQAVALPipeline"), cfg,
                          model_cfg=model_cfg, tokenizer=tokenizer,
                          params=params,
                          batch_size=int(cfg.get("BATCH_SIZE", 8)),
                          max_new_tokens=int(cfg.get("MAX_NEW_TOKENS", 16)),
                          **extra)
    limit = int(cfg.get("LIMIT", 0)) or None
    mapper = VQAEvalMapper(image_size=model_cfg.vision.image_size)
    results = {}
    for ds_name in _dataset_names(cfg):
        rows = map(mapper, get_dataset(ds_name))
        results[ds_name] = pipe.evaluate_model(rows, limit=limit,
                                               out_dir=cfg.get("SAVE_DIR"))
    return results


def _eval_vl_zoo(cfg, zoo: str) -> dict:
    """vl_test with a zoo tower (eval_for_vl_model over the non-LLaVA
    pipelines, lbk_entry.py:20-22 + pipeline/BLIP2VQAVALPipeline.py etc.)."""
    import json
    import os

    from cullavo_tpu.data.mappers import VQAEvalMapper
    from cullavo_tpu.data.registry import get_dataset
    from cullavo_tpu.pipelines.vl_zoo_pipeline import (MODEL_SPECS,
                                                      VLZooVQAPipeline,
                                                      native_blip2_answer_fn,
                                                      native_kosmos2_answer_fn)

    if zoo not in MODEL_SPECS:
        raise SystemExit(f"unknown MODEL.ZOO {zoo!r}; one of "
                         f"{sorted(MODEL_SPECS)}")
    zoo_path = (cfg.get("MODEL") or {}).get("ZOO_PATH")
    answer_fn = None
    img_size = None
    if zoo_path and not (cfg.get("MODEL") or {}).get("ZOO_TORCH"):
        # real checkpoint: run the HF snapshot through the TPU-native JAX
        # tower (the reference keeps these in torch — pipeline/
        # BLIP2VQAVALPipeline.py etc.).  MODEL.ZOO_TORCH: true falls back
        # to torch generate inside VLZooVQAPipeline.
        mnt = int(cfg.get("MAX_NEW_TOKENS", 10))
        if zoo in ("blip2", "instructblip"):
            answer_fn = native_blip2_answer_fn(
                hf_model_dir=zoo_path, max_new_tokens=mnt,
                kind="flant5" if zoo == "blip2" else "instructblip")
        elif zoo == "kosmos2":
            answer_fn = native_kosmos2_answer_fn(hf_model_dir=zoo_path,
                                                 max_new_tokens=mnt)
        elif zoo == "bakllava":
            from cullavo_tpu.pipelines.vl_zoo_pipeline import \
                native_bakllava_answer_fn

            answer_fn = native_bakllava_answer_fn(zoo_path,
                                                  max_new_tokens=mnt)
    elif not zoo_path:
        mnt = int(cfg.get("MAX_NEW_TOKENS", 10))
        if zoo in ("blip2", "instructblip"):
            answer_fn = native_blip2_answer_fn(
                max_new_tokens=mnt,
                kind="instructblip" if zoo == "instructblip" else "flant5")
            from cullavo_tpu.models.blip2 import tiny_blip2_config

            img_size = tiny_blip2_config("t5").vision.image_size
        elif zoo == "kosmos2":
            answer_fn = native_kosmos2_answer_fn(max_new_tokens=mnt)
            from cullavo_tpu.models.kosmos2 import tiny_kosmos2_config

            img_size = tiny_kosmos2_config().vision.image_size
        else:
            raise SystemExit(
                f"MODEL.ZOO: {zoo} needs MODEL.ZOO_PATH (local HF snapshot) "
                "— blip2/instructblip/kosmos2 have checkpoint-free native "
                "smoke answerers")
    pipe = VLZooVQAPipeline(cfg, zoo, model_path=zoo_path,
                            answer_fn=answer_fn)
    limit = int(cfg.get("LIMIT", 0)) or None
    mapper = VQAEvalMapper(image_size=img_size)
    results = {}
    out_dir = cfg.get("SAVE_DIR")
    for ds_name in _dataset_names(cfg):
        def rows():
            for rec in get_dataset(ds_name):
                m = mapper(rec)
                m["image"] = m.pop("pixel_values")
                yield m
        results[ds_name] = pipe.evaluate_model(rows(), limit=limit)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            pipe.evaluator.dump_results(
                os.path.join(out_dir, "vqa_results.json"))
    return results


def _eval_imagenet(cfg) -> dict:
    """imagenet_test workload: zero-shot classification over class-folder
    datasets (pipeline/BLIP2ImageNetPipeline.py, InstructBLIP variant —
    Q-Former 'This is {class}' text embeds vs pooled image-query embeds).
    MODEL.ZOO_PATH imports a real HF snapshot; without one a tiny random
    model drives the same path (smoke)."""
    from cullavo_tpu.data.image_processing import preprocess_numpy
    from cullavo_tpu.data.mappers.eval_mappers import load_image_rgb
    from cullavo_tpu.data.registry import get_dataset, get_metadata
    from cullavo_tpu.pipelines.imagenet_pipeline import ImageNetPipeline
    from cullavo_tpu.pipelines.vl_zoo_pipeline import native_blip2_imagenet_fns

    zoo = (cfg.get("MODEL") or {}).get("ZOO", "blip2")
    zoo_path = (cfg.get("MODEL") or {}).get("ZOO_PATH")
    limit = int(cfg.get("LIMIT", 0)) or None
    results = {}
    for ds_name in _dataset_names(cfg):
        class_names = get_metadata(ds_name).get("class_names") or []
        embed_fn, class_embeds = native_blip2_imagenet_fns(
            hf_model_dir=zoo_path, class_names=class_names,
            kind="instructblip" if zoo == "instructblip" else "flant5")
        S = embed_fn.image_size
        pipe = ImageNetPipeline(cfg, embed_fn, class_embeds, class_names,
                                batch_size=int(cfg.get("BATCH_SIZE", 64)))

        def rows():
            for rec in get_dataset(ds_name):
                img = load_image_rgb(rec["file_name"])
                yield {"pixel_values": preprocess_numpy([img], S)[0],
                       "label": rec["label"]}
        results[ds_name] = pipe.evaluate_model(rows(), limit=limit,
                                               out_dir=cfg.get("SAVE_DIR"))
    return results


def _eval_step2_pre(cfg) -> dict:
    """cullavo_step2_pre workload: model-in-the-loop dataset generation
    (run:25-44 template; CuLLaVOPipeline.py:95-133)."""
    from cullavo_tpu.data.mappers.eval_mappers import load_image_rgb
    from cullavo_tpu.data.registry import get_dataset
    from cullavo_tpu.data.step1_synthesis import SYSTEM_PROMPT
    from cullavo_tpu.models.llava.modeling import expand_image_token
    from cullavo_tpu.pipelines.base import build_pipeline
    import cullavo_tpu.pipelines.cullavo_pipeline  # noqa: F401 (registration)

    model_cfg, params, tokenizer = _build_llava(cfg)
    pipe = build_pipeline("CuLLaVOPipeline", cfg, model_cfg=model_cfg,
                          tokenizer=tokenizer, params=params)
    out_dir = cfg.get("SAVE_DIR", "step2_pre_out")
    limit = int(cfg.get("LIMIT", 0)) or None
    names = _dataset_names(cfg)
    records = get_dataset(names[0]) if names else []
    if limit:
        records = records[:limit]

    question = ("provide multiple object names with their numbering index and "
                "the objects' bounding box coordinates in the image.")
    prompt = SYSTEM_PROMPT + "<image>" + f" USER: {question} ASSISTANT:"
    base_ids = np.asarray(tokenizer.encode(prompt), np.int32)
    ids_row, _, _ = expand_image_token(base_ids, None, None,
                                       tokenizer.image_token_id,
                                       model_cfg.num_image_tokens)
    # LAZY image access: decoding the whole dataset up-front is ~1 MB/image
    # of host RAM (a real conversation corpus is 100k+ images — host OOM
    # before generation starts); the pipeline indexes per chunk instead
    keep = [r for r in records
            if isinstance(r.get("image"), np.ndarray) or r.get("image_path")]
    if not keep:
        print("[entry] step2_pre: no images in dataset", file=sys.stderr)
        return {"rows": 0}

    class _LazyImages:
        def __len__(self):
            return len(keep)

        def __getitem__(self, i):
            r = keep[int(i)]
            img = r.get("image")
            if not isinstance(img, np.ndarray):
                # conversation rows carry "image" as a RELATIVE PATH string
                # (ShareGPT4V format); pixels come from "image_path"
                img = load_image_rgb(r["image_path"])
            return np.asarray(img)

    # multi-process: each rank generates its own contiguous shard and the
    # pipeline merges via process_allgather (the reference's
    # all_gather_object merge, CuLLaVOPipeline.py:124-127) — without the
    # shard every rank would redundantly generate ALL rows
    import jax

    ctx = None
    shard_offset = 0
    if jax.process_count() > 1:
        from cullavo_tpu.parallel.mesh import ParallelContext

        ctx = ParallelContext(mesh=None)
        n, p = jax.process_count(), jax.process_index()
        # balanced split (np.array_split semantics): ceil-division could hand
        # trailing ranks EMPTY shards, which only works while allgather is
        # the sole collective — a second collective inside the chunk loop
        # would deadlock on uneven chunk counts
        idx = np.array_split(np.arange(len(keep)), n)[p]
        shard_offset = int(idx[0]) if idx.size else len(keep)
        keep = [keep[int(i)] for i in idx]

    rows_u8 = _LazyImages()
    B = len(rows_u8)
    ids = np.tile(ids_row[None], (B, 1))
    mask = np.ones_like(ids)
    # pixel_values=None: the pipeline preprocesses + generates in
    # BATCH_SIZE chunks (one mega-batch would OOM on any real dataset)
    rows = pipe.generate_step2_rows(
        rows_u8, ids, mask, out_dir, None,
        max_new_tokens=int(cfg.get("MAX_NEW_TOKENS", 256)),
        batch_size=int(cfg.get("BATCH_SIZE", 8)), parallel_ctx=ctx,
        index_offset=shard_offset)
    return {"rows": len(rows), "out_dir": out_dir}


def evaluate(cfg):
    """NAME dispatch per lbk_entry.py:6-22: xdecoder_test → eval(),
    vl_test → eval_for_vl_model(), cullavo_step2_pre → step2-pre data gen."""
    import json

    register_datasets_from_cfg(cfg)
    name = cfg.get("NAME", "")
    if "step2_pre" in name:
        results = _eval_step2_pre(cfg)
    elif "imagenet" in name:
        results = _eval_imagenet(cfg)
    elif "vl_test" in name or "vl" == name:
        results = _eval_vl(cfg)
    elif "xdecoder" in name:
        results = _eval_xdecoder(cfg)
    else:
        print(f"[entry] unknown eval workload {name!r} (expect one of "
              "xdecoder_test / vl_test / imagenet_test / cullavo_step2_pre)",
              file=sys.stderr)
        raise SystemExit(2)
    print(json.dumps(results, default=float))
    return results


def _load_serving_adapters(scfg, model_cfg, params):
    """SERVE.ADAPTERS: [dir, ...] → (lora dict, scaling).

    One dir = the reference's eval mode (unmerged adapters over the
    quantized base); several dirs = per-request multi-adapter serving
    (each Request/HTTP row picks one via ``adapter_id``, index = position
    in this list).  Vision-tower adapters ride along only in single-set
    mode (the multi path is LLM-only, lora.stack_adapter_sets)."""
    paths = scfg.get("ADAPTERS") or []
    if not paths:
        return None, 0.0
    from cullavo_tpu.checkpoint.store import load_adapters
    from cullavo_tpu.models.llava.lora import stack_adapter_sets

    sets, vision, scale = [], None, None
    for p in paths:
        tree, acfg = load_adapters(p)
        sets.append(tree["language_model"])
        if vision is None and tree.get("vision_tower"):
            vision = tree["vision_tower"]
        scale = acfg.get("scaling") or (
            float(acfg.get("alpha", 16.0)) / float(acfg.get("r", 64)))
    scale = float(scfg.get("LORA_SCALING", scale))
    if len(sets) == 1:
        lora = {"language_model": sets[0]}
        if vision:
            lora["vision_tower"] = vision
    else:
        lora = {"language_model": stack_adapter_sets(sets)}
        if vision:
            print("[entry] multi-adapter serving is LLM-only — ignoring "
                  "vision-tower adapters", file=sys.stderr)
    return lora, scale


def _engine_from_cfg(scfg, model_cfg, params, tokenizer, buckets, max_len):
    """SERVE.* config block → (GenerationConfig, ServingEngine)."""
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.modeling import GenerationConfig
    from cullavo_tpu.serving import ServingEngine

    lora, lora_scaling = _load_serving_adapters(scfg, model_cfg, params)
    default_eos = getattr(tokenizer, "eos_token_id", 2)
    gen = GenerationConfig(
        do_sample=bool(scfg.get("DO_SAMPLE", False)),
        temperature=float(scfg.get("TEMPERATURE", 0.9)),
        eos_token_id=int(scfg.get("EOS_TOKEN_ID",
                                  2 if default_eos is None else default_eos)))
    eng = ServingEngine(
        params, model_cfg, gen,
        num_slots=int(scfg.get("SLOTS", 8)), max_len=max_len,
        prompt_buckets=buckets,
        prefill_chunk=int(scfg.get("PREFILL_CHUNK", 2)),
        quantum=int(scfg.get("QUANTUM", 8)),
        kv_quant=scfg.get("KV_QUANT") or None,
        compute_dtype=jnp.bfloat16 if str(
            scfg.get("DTYPE", "bfloat16")) == "bfloat16" else jnp.float32,
        lora=lora, lora_scaling=lora_scaling,
        spec_k=int(scfg["SPEC_K"]) if scfg.get("SPEC_K") else None,
        # prefix-KV reuse (registry of shared prompt heads / repeated
        # images; see ServingEngine) — SERVE.PREFIX: false disables
        prefix_cache=bool(scfg.get("PREFIX", True)),
        prefix_min=int(scfg.get("PREFIX_MIN", 32)),
        suffix_buckets=tuple(scfg.get("SUFFIX_BUCKETS") or (32, 64, 128)),
        max_prefixes=(int(scfg["MAX_PREFIXES"])
                      if scfg.get("MAX_PREFIXES") else None),
        admit_groups=(None if scfg.get("ADMIT_GROUPS", 1) in (None, 0)
                      else int(scfg.get("ADMIT_GROUPS", 1))))
    return gen, eng


def _serve_http(scfg, model_cfg, params, tokenizer):
    """SERVE.PORT set → run the HTTP endpoint (serving/server.py) until
    interrupted.  Buckets must be static up front in network mode (each is
    one compiled prefill program): SERVE.PROMPT_BUCKETS, defaulting to one
    bucket sized for image + 72 text tokens."""
    from cullavo_tpu.serving.server import make_server

    n_img = model_cfg.num_image_tokens
    buckets = scfg.get("PROMPT_BUCKETS") or \
        [-(-(1 + n_img + 72) // 64) * 64]
    max_new_max = int(scfg.get("MAX_NEW_TOKENS_MAX", 64))
    max_len = int(scfg.get("MAX_LEN", max(buckets) + max_new_max))
    _, eng = _engine_from_cfg(scfg, model_cfg, params, tokenizer,
                              buckets, max_len)
    server = make_server(eng, model_cfg, tokenizer,
                         host=str(scfg.get("HOST", "127.0.0.1")),
                         port=int(scfg.get("PORT", 0)),
                         timeout_s=float(scfg.get("TIMEOUT_S", 300.0)))
    host, port = server.server_address[:2]
    print(f"[entry] serving on http://{host}:{port} "
          f"(buckets={buckets}, max_len={max_len})", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.runner.stop()
        server.server_close()
    return server


def serve(cfg):
    """Serving workload (beyond the reference — its eval hot path is batch-1
    greedy, LLaVAVQAVALPipeline.py:171-180): run the continuous-batching
    engine over a JSONL request stream and write a JSONL result stream.

    Request rows: ``{"id": int, "prompt": str | "input_ids": [int, ...],
    "image": path(.npy [3,336,336] f32 | image file), "max_new_tokens": int}``.
    With ``SERVE.REQUESTS`` unset, a few random smoke requests are
    synthesized (mirrors the tiny-model train smoke mode)."""
    import json
    import time

    from cullavo_tpu.serving import Request
    from cullavo_tpu.serving.io import request_from_row

    model_cfg, params, tokenizer = _build_llava(cfg)
    scfg = cfg.get("SERVE", {}) or {}
    n_img = model_cfg.num_image_tokens

    def to_request(row):
        return request_from_row(row, model_cfg, tokenizer)

    if scfg.get("PORT") is not None:
        # network mode: POST /generate endpoint over the same engine
        return _serve_http(scfg, model_cfg, params, tokenizer)

    req_path = scfg.get("REQUESTS")
    if req_path:
        with open(req_path) as f:
            reqs = [to_request(json.loads(line))
                    for line in f if line.strip()]
    else:
        print("[entry] no SERVE.REQUESTS — synthesizing 4 random smoke "
              "requests", file=sys.stderr)
        rng = np.random.default_rng(0)
        reqs = []
        for i in range(4):
            ids = rng.integers(3, model_cfg.text.vocab_size - 2,
                               size=(1 + n_img + 4 + i,)).astype(np.int32)
            ids[1:1 + n_img] = model_cfg.image_token_id
            pix = rng.normal(size=(3, model_cfg.vision.image_size,
                                   model_cfg.vision.image_size)
                             ).astype(np.float32)
            reqs.append(Request(req_id=i, input_ids=ids, pixel_values=pix,
                                max_new_tokens=4 + 2 * i))

    # buckets: configured, or derived from the request lengths (64-multiples)
    buckets = scfg.get("PROMPT_BUCKETS") or sorted(
        {-(-len(r.input_ids) // 64) * 64 for r in reqs})
    max_new_max = max(r.max_new_tokens for r in reqs)
    max_len = int(scfg.get("MAX_LEN", max(buckets) + max_new_max))
    gen, eng = _engine_from_cfg(scfg, model_cfg, params, tokenizer,
                                buckets, max_len)
    for r in reqs:
        eng.submit(r)
    t0 = time.time()
    results = eng.run()
    dt = time.time() - t0

    out_path = scfg.get("RESULTS", "serve_results.jsonl")
    with open(out_path, "w") as f:
        for r in reqs:
            toks = results[r.req_id]
            text = tokenizer.decode(
                toks[:-1] if toks and toks[-1] == gen.eos_token_id else toks)
            f.write(json.dumps({"id": r.req_id, "tokens": toks,
                                "text": text}) + "\n")
    summary = {"requests": len(reqs),
               "tokens": sum(len(v) for v in results.values()),
               "wall_s": round(dt, 3),
               "requests_per_s": round(len(reqs) / max(dt, 1e-9), 3),
               "results": out_path}
    print(json.dumps(summary))
    return summary


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
    elif args.command == "serve":
        serve(cfg)
    else:
        evaluate(cfg)


if __name__ == "__main__":
    main()
