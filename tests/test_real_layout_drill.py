"""Real-layout readiness drill (VERDICT r2 item 5).

The environment has zero egress, so real checkpoints/datasets cannot run —
but the exact docs/REAL_CHECKPOINTS.md command lines CAN: this file
synthesizes artifact trees in the REAL formats (sharded HF safetensors with
a model.safetensors.index.json in BOTH naming eras, processor/tokenizer
JSONs, real-format VQAv2 annotation minis, real-format COCO panoptic
annotations + id-encoded PNGs, a torch ``.pt`` reference-layout X-Decoder
state dict) and runs the documented commands verbatim against them, so the
documented flow is proven executable before real artifacts ever arrive.
"""
import json
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(__file__))


def _run_entry(capsys, argv):
    from cullavo_tpu.entry import main

    old = sys.argv
    sys.argv = ["cullavo-tpu"] + argv
    try:
        main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    return json.loads(out.strip().splitlines()[-1])


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _write_hf_llava_tree(tmp_path, era: str):
    """Tiny LLaVA checkpoint in the HF on-disk layout: config.json, TWO
    safetensors shards + index.json, tokenizer/processor JSONs."""
    from safetensors.numpy import save_file

    from cullavo_tpu.checkpoint.hf_import import to_hf_state_dict
    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.modeling import init_llava_params

    cfg = tiny_llava_config(260)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    state = to_hf_state_dict(jax.tree.map(np.asarray, params), cfg)
    if era == "old":
        def rename(k):
            for new, old in (("model.language_model.", "language_model.model."),
                             ("lm_head.", "language_model.lm_head."),
                             ("model.vision_tower.", "vision_tower."),
                             ("model.multi_modal_projector.",
                              "multi_modal_projector.")):
                if k.startswith(new):
                    return old + k[len(new):]
            return k
        state = {rename(k): v for k, v in state.items()}

    d = tmp_path / f"llava-tiny-{era}"
    d.mkdir()
    keys = sorted(state)
    shards = [keys[: len(keys) // 2], keys[len(keys) // 2:]]
    index = {"metadata": {"total_size": int(sum(v.nbytes
                                               for v in state.values()))},
             "weight_map": {}}
    for i, shard in enumerate(shards, 1):
        fname = f"model-{i:05d}-of-{len(shards):05d}.safetensors"
        save_file({k: state[k] for k in shard}, str(d / fname))
        for k in shard:
            index["weight_map"][k] = fname
    with open(d / "model.safetensors.index.json", "w") as f:
        json.dump(index, f)
    # config.json in the HF schema (llava_config_from_json's shape source)
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "llava",
            "image_token_index": cfg.image_token_id,
            "pad_token_id": cfg.pad_token_id,
            "projector_hidden_act": "gelu",
            "vision_feature_layer": cfg.vision_feature_layer,
            "vision_feature_select_strategy": "default",
            "text_config": {
                "model_type": "llama",
                "vocab_size": cfg.text.vocab_size,
                "hidden_size": cfg.text.hidden_size,
                "intermediate_size": cfg.text.intermediate_size,
                "num_hidden_layers": cfg.text.num_hidden_layers,
                "num_attention_heads": cfg.text.num_attention_heads,
                "num_key_value_heads": cfg.text.num_key_value_heads,
                "max_position_embeddings": cfg.text.max_position_embeddings,
                "rms_norm_eps": cfg.text.rms_norm_eps,
                "rope_theta": cfg.text.rope_theta,
            },
            "vision_config": {
                "model_type": "clip_vision_model",
                "hidden_size": cfg.vision.hidden_size,
                "intermediate_size": cfg.vision.intermediate_size,
                "num_hidden_layers": cfg.vision.num_hidden_layers,
                "num_attention_heads": cfg.vision.num_attention_heads,
                "image_size": cfg.vision.image_size,
                "patch_size": cfg.vision.patch_size,
                "projection_dim": cfg.vision.hidden_size,
            }}, f)
    # processor/tokenizer JSONs as a real snapshot carries them (no
    # tokenizer.model binary — entry falls back to ByteTokenizer, printed)
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"model_max_length": 4096,
                   "tokenizer_class": "LlamaTokenizer"}, f)
    with open(d / "special_tokens_map.json", "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>",
                   "pad_token": "<pad>"}, f)
    with open(d / "preprocessor_config.json", "w") as f:
        json.dump({"image_processor_type": "CLIPImageProcessor",
                   "crop_size": cfg.vision.image_size,
                   "image_mean": [0.48145466, 0.4578275, 0.40821073],
                   "image_std": [0.26862954, 0.26130258, 0.27577711]}, f)
    return d


def _write_vqa_tree(tmp_path):
    """Real-format VQAv2 annotation minis + COCO-named images."""
    img_dir = tmp_path / "coco" / "val2014"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for image_id in (17, 42):
        _save_png(img_dir / f"COCO_val2014_{image_id:012d}.jpg",
                  rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vdir = tmp_path / "vqav2"
    vdir.mkdir()
    qj = vdir / "v2_OpenEnded_mscoco_val2014_questions.json"
    aj = vdir / "v2_mscoco_val2014_annotations.json"
    with open(qj, "w") as f:
        json.dump({"info": {}, "task_type": "Open-Ended",
                   "data_type": "mscoco", "data_subtype": "val2014",
                   "questions": [
                       {"question_id": 1001, "image_id": 17,
                        "question": "What is on the table?"},
                       {"question_id": 1002, "image_id": 42,
                        "question": "How many dogs are there?"}]}, f)
    with open(aj, "w") as f:
        json.dump({"info": {}, "data_subtype": "val2014", "annotations": [
            {"question_id": 1001, "image_id": 17, "question_type": "what is",
             "answer_type": "other", "multiple_choice_answer": "cup",
             "answers": [{"answer": "cup", "answer_confidence": "yes",
                          "answer_id": i + 1} for i in range(10)]},
            {"question_id": 1002, "image_id": 42, "question_type": "how many",
             "answer_type": "number", "multiple_choice_answer": "2",
             "answers": [{"answer": "2", "answer_confidence": "yes",
                          "answer_id": i + 1} for i in range(10)]}]}, f)
    return qj, aj, img_dir


@pytest.mark.parametrize("era", ["new", "old"])
def test_vqa_real_commands_run_unmodified(tmp_path, capsys, era):
    """docs/REAL_CHECKPOINTS.md VQA section, verbatim:
    ``eval --conf_files configs/vl_test.yaml vqa_real.yaml`` against an
    HF-layout sharded-safetensors tree (both naming eras) and real-format
    VQAv2 annotations."""
    model_dir = _write_hf_llava_tree(tmp_path, era)
    qj, aj, img_dir = _write_vqa_tree(tmp_path)
    # era-unique dataset name: the registry is process-global, so the two
    # parametrized runs must not collide (real runs use vqav2_val)
    ds = f"vqav2_val_{era}"
    merge = tmp_path / "vqa_real.yaml"
    with open(merge, "w") as f:
        f.write(f"""
MODEL: {{LLM: {{LOAD_PATH: {model_dir}}}}}
BATCH_SIZE: 2
MAX_NEW_TOKENS: 4
SAVE_DIR: {tmp_path / 'out'}
DATASETS:
  TEST: [{ds}]
  REGISTER:
    {ds}:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    res = _run_entry(capsys, ["eval", "--conf_files", "configs/vl_test.yaml",
                              str(merge)])
    m = res[ds]
    assert m["n"] == 2 and 0.0 <= m["overall"] <= 100.0
    assert os.path.exists(tmp_path / "out" / "vqa_results.json")


def _write_coco_panoptic_tree(tmp_path, n_images=2):
    """Real-format COCO panoptic mini: panoptic_val2017.json + id-encoded
    PNGs + images."""
    img_dir = tmp_path / "coco" / "val2017"
    pan_dir = tmp_path / "coco" / "panoptic_val2017"
    ann_dir = tmp_path / "coco" / "annotations"
    for p in (img_dir, pan_dir, ann_dir):
        p.mkdir(parents=True)
    rng = np.random.default_rng(6)
    H = W = 64
    images, annotations = [], []
    for image_id in (7, 9, 11, 13, 15, 17, 19, 21)[:n_images]:
        fname = f"{image_id:012d}"
        _save_png(img_dir / f"{fname}.jpg",
                  rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        # two segments: ids 1 (thing, cat=1) and 2 (stuff, cat=200)
        seg = np.ones((H, W), np.uint32)
        seg[:, W // 2:] = 2
        rgb = np.stack([seg % 256, (seg // 256) % 256, seg // 65536],
                       axis=-1).astype(np.uint8)
        _save_png(pan_dir / f"{fname}.png", rgb)
        images.append({"id": image_id, "file_name": f"{fname}.jpg",
                       "height": H, "width": W})
        annotations.append({
            "image_id": image_id, "file_name": f"{fname}.png",
            "segments_info": [
                {"id": 1, "category_id": 1, "iscrowd": 0,
                 "bbox": [0, 0, W // 2, H], "area": H * W // 2},
                {"id": 2, "category_id": 200, "iscrowd": 0,
                 "bbox": [W // 2, 0, W // 2, H], "area": H * W // 2}]})
    # category count matches the tiny model's num_classes (6): a real run
    # pairs the 133-class model with the 133-category COCO table the same way
    categories = [{"id": 1, "name": "person", "isthing": 1},
                  {"id": 2, "name": "bicycle", "isthing": 1},
                  {"id": 3, "name": "car", "isthing": 1},
                  {"id": 4, "name": "motorcycle", "isthing": 1},
                  {"id": 100, "name": "grass-merged", "isthing": 0},
                  {"id": 200, "name": "sky-other-merged", "isthing": 0}]
    path = ann_dir / "panoptic_val2017.json"
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return path, img_dir, pan_dir


def test_seg_real_commands_run_with_torch_pt_checkpoint(tmp_path, capsys):
    """docs/REAL_CHECKPOINTS.md seg section, verbatim: ``eval --conf_files
    configs/xdecoder_test.yaml seg_real.yaml`` with RESUME_FROM pointing at
    a torch ``.pt`` whose state dict uses the REFERENCE's key layout —
    produced here by the actual reference torch modules (ref_torch_stubs),
    so the importer consumes a genuinely real-shaped checkpoint file."""
    torch = pytest.importorskip("torch")
    import ref_torch_stubs as R

    from cullavo_tpu.models.xdecoder.model import tiny_xdecoder_config

    cfg = tiny_xdecoder_config()
    torch.manual_seed(0)

    focal = R.load("vision.backbone.focal")
    bb = focal.FocalNet(
        pretrain_img_size=64, patch_size=4, embed_dim=16, depths=[1, 1, 1, 1],
        focal_levels=[2, 2, 2, 2], focal_windows=[3, 3, 3, 3],
        drop_path_rate=0.0, use_conv_embed=True, use_postln=True,
        scaling_modulator=True, use_layerscale=True)
    fpn_mod = R.load("vision.encoder.transformer_encoder_fpn")
    d2mod = sys.modules["detectron2.modeling"]
    shapes = {"res2": d2mod.ShapeSpec(channels=16, stride=4),
              "res3": d2mod.ShapeSpec(channels=32, stride=8),
              "res4": d2mod.ShapeSpec(channels=64, stride=16),
              "res5": d2mod.ShapeSpec(channels=128, stride=32)}
    pd = fpn_mod.TransformerEncoderPixelDecoder(
        input_shape=shapes, transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=128, transformer_enc_layers=2,
        transformer_pre_norm=False, conv_dim=64, mask_dim=32, mask_on=True,
        norm="GN")
    tr = R.load("language.LangEncoder.transformer")
    vlp = R.load("language.vlpencoder")
    lang = tr.Transformer(context_length=8, vocab_size=64, width=32,
                          layers=2, heads=4, autogressive=True)
    le = vlp.LanguageEncoder(tokenizer=None, tokenizer_type="clip",
                             lang_encoder=lang,
                             lang_projection=torch.nn.Parameter(
                                 torch.randn(32, 64) * 0.1),
                             max_token_num=8, queue_operator={})
    xd = R.load("interface.xdecoder")
    pred = xd.XDecoder(
        le, in_channels=64, mask_classification=True, hidden_dim=64,
        dim_proj=64, num_queries=9, contxt_len=8, nheads=4,
        dim_feedforward=128, dec_layers=3, pre_norm=False, mask_dim=32,
        task_switch={"mask": True, "bbox": True, "caption": True,
                     "captioning": True, "retrieval": True,
                     "grounding": True},
        captioning_step=50, enforce_input_project=False)

    sd = {}
    for prefix, mod in (("backbone.", bb),
                        ("sem_seg_head.pixel_decoder.", pd),
                        ("sem_seg_head.predictor.", pred)):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v.float()
    ckpt = tmp_path / "xdecoder_tiny_last.pt"
    torch.save(sd, str(ckpt))

    ann, img_dir, pan_dir = _write_coco_panoptic_tree(tmp_path)
    merge = tmp_path / "seg_real.yaml"
    with open(merge, "w") as f:
        f.write(f"""
MODEL:
  TINY: true
RESUME_FROM: {ckpt}
SAVE_DIR: {tmp_path / 'out'}
DATASETS:
  TEST: [coco_2017_val_panoptic]
  REGISTER:
    coco_2017_val_panoptic:
      KIND: coco_panoptic
      NUM_CLASSES: 6
      CLASS_NAMES: [person, bicycle, car, motorcycle, grass, sky]
      TASKS: [semantic, panoptic, instance]
      JSON: {ann}
      IMAGE_DIR: {img_dir}
      PANOPTIC_DIR: {pan_dir}
""")
    res = _run_entry(capsys, ["eval", "--conf_files",
                              "configs/xdecoder_test.yaml", str(merge)])
    m = res["coco_2017_val_panoptic"]
    assert "mIoU" in m.get("sem_seg", {}), m
    assert "PQ" in m.get("panoptic", {}), m


def test_step1_train_real_commands_run_unmodified(tmp_path, capsys):
    """docs/REAL_CHECKPOINTS.md step1 training section, verbatim:
    ``train --conf_files configs/cullavo_step1.yaml step1_real.yaml`` against
    an HF-layout snapshot + real-format COCO panoptic annotations.  Proves:
    the registered raw records map through PanopticMapper into the step1
    synthesis (previously the entry fed raw records straight in — KeyError
    on any real dataset), the loss decreases over 3 steps, every epoch
    exports the reference ``epoch{N}`` adapter layout
    (BaseModel.save_pretrained parity: real PEFT key names, torch ``.pt``
    extras), and RESUME_FROM on ``epoch{N}/CuLLaVO.pt`` loads it back."""
    import re

    torch = pytest.importorskip("torch")
    model_dir = _write_hf_llava_tree(tmp_path, "new")
    ann, img_dir, pan_dir = _write_coco_panoptic_tree(tmp_path, n_images=8)
    out_dir = tmp_path / "step1_out"
    merge = tmp_path / "step1_real.yaml"
    with open(merge, "w") as f:
        f.write(f"""
MODEL: {{LLM: {{LOAD_PATH: {model_dir}, LORA_VISION_START: 1, LORA_VISION_STOP: 2}}}}
SAVE_DIR: {out_dir}
EPOCHS: 3
BATCH_SIZE: 8
LR: 1.0e-3
LOG_EVERY: 1
DATASETS:
  TRAIN: coco_2017_train_panoptic_drill
  REGISTER:
    coco_2017_train_panoptic_drill:
      KIND: coco_panoptic
      JSON: {ann}
      IMAGE_DIR: {img_dir}
      PANOPTIC_DIR: {pan_dir}
""")
    from cullavo_tpu.entry import main

    old = sys.argv
    sys.argv = ["cullavo-tpu", "train", "--conf_files",
                "configs/cullavo_step1.yaml", str(merge)]
    try:
        main()
    finally:
        sys.argv = old
    err = capsys.readouterr().err
    losses = [float(m.group(1)) for m in
              re.finditer(r"'loss_avg': ([0-9.e+-]+)", err)]
    assert len(losses) >= 3, err[-2000:]
    assert losses[-1] < losses[0], losses

    # reference epoch layout: real PEFT adapter names + torch extras
    ep = out_dir / "epoch2"
    assert (ep / "CuLLaVO.pt").exists()
    from safetensors import safe_open

    with safe_open(str(ep / "cullavo" / "language_model"
                       / "adapter_model.safetensors"), framework="np") as f:
        keys = list(f.keys())
    assert ("base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"
            in keys), keys[:5]
    assert ("base_model.model.model.layers.1.mlp.down_proj.lora_B.weight"
            in keys)
    proj = torch.load(str(ep / "cullavo" / "multi_modal_projector.pt"),
                      map_location="cpu", weights_only=True)
    assert set(proj) == {"linear_1.weight", "linear_1.bias",
                         "linear_2.weight", "linear_2.bias"}
    # torch convention: [out, in]
    assert proj["linear_1.weight"].shape[0] == proj["linear_1.bias"].shape[0]
    # vision adapters restricted to layers_to_transform (tiny cfg: layer 1)
    with safe_open(str(ep / "cullavo" / "vision_tower"
                       / "adapter_model.safetensors"), framework="np") as f:
        vkeys = list(f.keys())
    assert all(".layers.1." in k for k in vkeys) and vkeys, vkeys[:5]

    # resume drill: the reference's RESUME_FROM points at epoch{N}/CuLLaVO.pt
    resume_merge = tmp_path / "step1_resume.yaml"
    with open(resume_merge, "w") as f:
        f.write(f"""
MODEL: {{LLM: {{LOAD_PATH: {model_dir}, LORA_VISION_START: 1, LORA_VISION_STOP: 2}}}}
RESUME_FROM: {ep / 'CuLLaVO.pt'}
""")
    sys.argv = ["cullavo-tpu", "train", "--conf_files",
                "configs/cullavo_step1.yaml", str(resume_merge)]
    try:
        main()
    finally:
        sys.argv = old
    cap = capsys.readouterr()
    assert "resumed trainable state" in cap.err
    metrics = eval(cap.out.strip().splitlines()[-1])
    assert np.isfinite(metrics["loss_llm"])
