"""Tests for the step1 instruction-synthesis data stage and text formatters."""
import numpy as np

from cullavo_tpu.data.step1_synthesis import (IGNORE_INDEX, PromptBuilder,
                                              collate_step1, synthesize_step1)
from cullavo_tpu.data.text_format import (box2string, boxes2string,
                                          classes2string, classesboxes2string,
                                          classescolors2string, draw_boxes,
                                          list2string, parse_boxes_and_classes)
from cullavo_tpu.data.tokenizer import ByteTokenizer


def test_formatters_match_reference_format():
    box = np.array([0.1234, 0.5, 0.25, 0.9999])
    assert box2string(box) == "[0.123, 0.500, 0.250, 1.000]"
    assert boxes2string([box, box]) == ("[[0.123, 0.500, 0.250, 1.000], "
                                        "[0.123, 0.500, 0.250, 1.000]]")
    assert list2string(["red", "blue"]) == "red, blue"
    assert classes2string(["cat", "cat", "dog"]) == "(#1) cat, (#2) cat, (#1) dog"
    s = classesboxes2string(["cat", "cat"], [box, box])
    assert s == "(#1 cat) [0.123, 0.500, 0.250, 1.000], (#2 cat) [0.123, 0.500, 0.250, 1.000]"
    assert classescolors2string(["cat", "dog"], ["red", "blue"]) == "(#1 cat) red, (#1 dog) blue"


def test_parser_roundtrip():
    text = "there is (#1 cat) [0.100, 0.200, 0.300, 0.400], and (#1 dog) [0.5, 0.6, 0.7, 0.8]"
    boxes, classes, err = parse_boxes_and_classes(text)
    assert not err
    assert classes == ["cat", "dog"]
    np.testing.assert_allclose(boxes[0], [0.1, 0.2, 0.3, 0.4])
    # unbalanced → error flag
    _, _, err = parse_boxes_and_classes("broken [0.1, 0.2")
    assert err
    # malformed box content must not crash (reference uses eval; we don't)
    boxes, classes, err = parse_boxes_and_classes("(x) [import os]")
    assert err


def test_draw_boxes_edges():
    img = np.zeros((20, 20, 3), np.uint8)
    out = draw_boxes(img, np.array([[2, 3, 10, 12]]), ["red"], thickness=1)
    assert tuple(out[3, 2]) == (255, 0, 0)    # left edge
    assert tuple(out[3, 10]) == (255, 0, 0)   # right edge
    assert tuple(out[12, 5]) == (255, 0, 0)   # bottom edge
    assert tuple(out[7, 5]) == (0, 0, 0)      # interior untouched
    assert img.sum() == 0                     # input not mutated


def test_prompt_builder_label_alignment():
    tk = ByteTokenizer()
    b = PromptBuilder(tk).start()
    b.add_turn("what is this?", "a cat")
    ids, labels = b.finish()
    assert len(ids) == len(labels)
    # prompt span masked, answer supervised
    sup = [i for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    assert sup  # some supervised tokens
    assert labels[-1] == tk.eos_token_id  # the </s> is supervised
    # supervised ids decode to the answer + eos
    assert tk.decode([i for i in sup]) == " a cat"
    # labels equal ids wherever not ignored
    for i, l in zip(ids, labels):
        if l != IGNORE_INDEX:
            assert i == l


def _record(n=3, with_things=True):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    boxes = np.array([[4, 4, 30, 30], [10, 12, 40, 44], [2, 50, 20, 60]], np.float32)[:n]
    return {
        "image": img,
        "classes": np.array([0, 0, 2])[:n],
        "boxes": boxes,
        "is_thing": np.array([with_things, with_things, True])[:n],
    }


def test_synthesize_step1_and_collate():
    tk = ByteTokenizer()
    rng = np.random.default_rng(42)
    s = synthesize_step1(_record(), tk, rng)
    assert s is not None
    assert (s["input_ids"] == tk.image_token_id).sum() == 1
    assert len(s["input_ids"]) == len(s["labels"])

    # empty record → None
    empty = _record()
    empty["is_thing"] = np.zeros(3, bool)
    assert synthesize_step1(empty, tk, rng) is None

    batch = collate_step1([s, None], tk, num_image_tokens=4, image_size=28)
    assert batch["input_ids"].shape == batch["labels"].shape == batch["attention_mask"].shape
    assert batch["pixel_values"].shape == (2, 3, 28, 28)
    assert batch["weights"].tolist() == [1.0, 0.0]
    # image expanded to 4 slots in each row
    assert (batch["input_ids"][0] == tk.image_token_id).sum() == 4
    # no labels on image positions
    img_pos = batch["input_ids"][0] == tk.image_token_id
    assert (batch["labels"][0][img_pos] == IGNORE_INDEX).all()


def test_synthesis_deterministic_given_seed():
    tk = ByteTokenizer()
    a = synthesize_step1(_record(), tk, np.random.default_rng(7))
    b = synthesize_step1(_record(), tk, np.random.default_rng(7))
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["image"], b["image"])


def test_step2_conversation_synthesis():
    from cullavo_tpu.data.instruction_data import synthesize_step2

    tk = ByteTokenizer()
    rng = np.random.default_rng(0)
    record = {
        "conversations": [
            {"from": "human", "value": "<image>\nWhat is in the image?"},
            {"from": "gpt", "value": "A cat."},
            {"from": "human", "value": "What color?"},
            {"from": "gpt", "value": "Black."},
        ],
    }
    s = synthesize_step2(record, tk, rng, image=None, image_size=32)
    assert s["image"].shape == (32, 32, 3) and s["image"].sum() == 0  # text-only → zero image
    sup = [i for i, l in zip(s["input_ids"], s["labels"]) if l != IGNORE_INDEX]
    text = tk.decode(sup)
    assert "A cat." in text and "Black." in text
    assert "What color" not in text  # prompts masked


def test_step2_box_augment_deterministic():
    from cullavo_tpu.data.instruction_data import synthesize_step2

    tk = ByteTokenizer()
    record = {
        "conversations": [
            {"from": "human", "value": "Describe."},
            {"from": "gpt", "value": "Stuff."},
        ],
        "boxes": [[0.1, 0.1, 0.5, 0.5]],
        "classes": ["cat"],
    }
    img = np.zeros((32, 32, 3), np.uint8)
    # find a seed where the dice triggers the augmentation
    for seed in range(8):
        s = synthesize_step2(record, tk, np.random.default_rng(seed), image=img.copy())
        if s["image"].sum() > 0:
            sup = tk.decode([i for i, l in zip(s["input_ids"], s["labels"]) if l != IGNORE_INDEX])
            assert "(#1) cat" in sup
            break
    else:
        raise AssertionError("box augmentation never triggered in 8 seeds")


def test_load_conversation_json(tmp_path):
    from cullavo_tpu.data.instruction_data import load_conversation_json

    img = tmp_path / "img.png"
    img.write_bytes(b"x")
    rows = [
        {"image": "img.png", "conversations": []},
        {"image": "missing.png", "conversations": []},
        {"conversations": []},
    ]
    import json as _json
    p = tmp_path / "data.json"
    p.write_text(_json.dumps(rows))
    out = load_conversation_json(str(p), image_root=str(tmp_path))
    assert len(out) == 2  # missing image filtered; text-only kept
    assert out[0]["image_path"].endswith("img.png")
