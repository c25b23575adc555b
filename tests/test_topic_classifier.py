"""Native topic classifier tests (reference LLaVAVQAVALPipeline.py:94-169).

The reference buckets each VQA question into a COCO class for the per-class
accuracy CSV: LLaMA-2 samples an in-context topic word (≤10 tokens, temp/top-p
0.9), CLIP-L embeds 'a photo of {word}' and the nearest 'a photo of {class}'
embedding (topk k=1 over the [1, C] cosine row) picks the bucket.  These
tests pin the prompt string, verify the CLIP-match stage against an
independent numpy replication of the reference's torch logic, and drive the
vl_test CLI end-to-end with MODEL.TOPIC: tiny producing the per-class CSV
with no injected hook.
"""
import csv
import json
import os

import numpy as np
import pytest

from cullavo_tpu.pipelines.vqa_pipeline import (_ByteHFTok, make_tiny_topic_fn,
                                                make_topic_fn, topic_prompt)


def test_topic_prompt_matches_reference():
    """Byte-exact vs the reference's f-string concatenation
    (LLaVAVQAVALPipeline.py:147-153), including its missing separator after
    'asks'."""
    q = "what color is the man's shirt?"
    expected = ("Choose object the question asks" +
                "ex) what color is the man's shirt? shirt. " +
                "ex) how many bikes have helmets? helmets. " +
                "ex) were there any books on the table? books. " +
                "ex) what is he on top of? he. " +
                f"ex) where are the dogs looking at? dogs. ex) {q}")
    assert topic_prompt(q) == expected


def test_clip_bucketing_matches_reference_logic():
    """Pin the LLaMA stage (a decode stub that always emits a known topic
    word) and check the CLIP text-match stage against an independent numpy
    replication of the reference's scoring: F.normalize → score =
    norm_text_embed @ norm_text.T → topk(k=1) → clip_index[clip_value.argmax()]
    (LLaVAVQAVALPipeline.py:113-116,159-169)."""
    import jax

    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.modeling import init_llava_params
    from cullavo_tpu.models.xdecoder.text_encoder import (
        TextEncoderConfig, forward_language, init_text_encoder_params)
    import jax.numpy as jnp

    lcfg = tiny_llava_config(260)
    lparams = {"language_model":
               init_llava_params(lcfg, jax.random.PRNGKey(0))["language_model"]}
    ccfg = TextEncoderConfig(width=32, heads=4, layers=2, dim_lang=32,
                             vocab_size=260, context_length=64)
    cparams = init_text_encoder_params(ccfg, jax.random.PRNGKey(1))

    class PinnedWordTok(_ByteHFTok):
        """LLaMA tokenizer whose decode always yields 'dog. bark' — the
        reference then strips and keeps the pre-'.' word ('dog')."""

        def decode(self, ids, skip_special_tokens=True):
            return " dog. bark"

    classes = ["person", "dog", "car", "pizza", "clock"]
    lt = PinnedWordTok(lcfg.text.vocab_size)
    ct = _ByteHFTok(ccfg.vocab_size, max_len=ccfg.context_length,
                    eot_is_max=True)
    fn = make_topic_fn(lparams, lcfg, lt, cparams, ccfg, ct,
                       class_names=classes, seed=3, max_new_tokens=4)
    got = fn("where is the dog looking?")

    # independent replication of the reference scoring in numpy
    enc = ct([f"a photo of {cl}" for cl in classes])
    norm_text = np.asarray(forward_language(
        cparams, ccfg, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attention_mask"])))          # already normalized
    q = ct(["a photo of dog"])
    emb = np.asarray(forward_language(
        cparams, ccfg, jnp.asarray(q["input_ids"]),
        jnp.asarray(q["attention_mask"])))
    score = emb @ norm_text.T                          # [1, C]
    # torch: clip_value, clip_index = score.topk(k=1, dim=1);
    #        clip_index = clip_index[clip_value.argmax()]
    clip_index = score.argmax(axis=1)[score.max(axis=1).argmax()]
    assert got == classes[int(clip_index)]


def test_tiny_topic_fn_deterministic_and_in_classes():
    from cullavo_tpu.utils.constants import COCO_SEMANTIC_CLASSES

    a = make_tiny_topic_fn(seed=0)
    b = make_tiny_topic_fn(seed=0)
    qs = ["what color is the car?", "how many people are there?"]
    out_a = [a(q) for q in qs]
    out_b = [b(q) for q in qs]
    assert out_a == out_b                      # seeded sampling reproduces
    assert all(t in COCO_SEMANTIC_CLASSES for t in out_a)


def test_eval_cli_vl_test_topic_csv(tmp_path, capsys):
    """vl_test with MODEL.TOPIC: tiny produces the reference's per-class CSV
    artifact (problem_experiment/llava_vqa.csv analogue) with NO injected
    topic hook."""
    from PIL import Image

    from cullavo_tpu import entry

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for image_id in (1, 2):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / f"COCO_val2014_{image_id:012d}.jpg")
    qj, aj = tmp_path / "q.json", tmp_path / "a.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 100, "question": "what is it?", "image_id": 1},
            {"question_id": 101, "question": "how many?", "image_id": 2}]}, f)
    with open(aj, "w") as f:
        json.dump({"annotations": [
            {"question_id": 100, "question_type": "what is",
             "answer_type": "other", "answers": [{"answer": "cat"}] * 10},
            {"question_id": 101, "question_type": "how many",
             "answer_type": "number", "answers": [{"answer": "2"}] * 10}]}, f)
    out_dir = tmp_path / "out"
    conf = tmp_path / "conf.yaml"
    conf.write_text(f"""
NAME: vl_test
PIPELINE: LLaVAVQAVALPipeline
BATCH_SIZE: 2
MAX_NEW_TOKENS: 4
SAVE_DIR: {out_dir}
MODEL:
  TOPIC: tiny
DATASETS:
  TEST: [fix_vqa_topic]
  REGISTER:
    fix_vqa_topic:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    entry.main(["eval", "--conf_files", str(conf)])
    capsys.readouterr()
    csv_path = out_dir / "vqa_per_class.csv"
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["class", "accuracy", "n"]
    assert rows[-1][0] == "TOTAL"
    from cullavo_tpu.utils.constants import COCO_SEMANTIC_CLASSES

    topic_rows = rows[1:-1]
    assert topic_rows, "no per-topic rows were bucketed"
    assert all(r[0] in COCO_SEMANTIC_CLASSES for r in topic_rows)
    assert sum(int(r[2]) for r in topic_rows) == 2
