"""VLP datasets (karpathy arrow) + retrieval/captioning pipelines + the full
native captioning metric suite (BLEU/METEOR/ROUGE-L/CIDEr)."""
import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.data.evaluation.evaluators import CaptioningEvaluator


def test_captioning_metrics_perfect_match():
    ev = CaptioningEvaluator()
    ev.add(1, "a cat sits on the mat", ["a cat sits on the mat"])
    ev.add(2, "two dogs run in the park", ["two dogs run in the park",
                                           "dogs running in a park"])
    r = ev.results()
    assert r["Bleu_4"] == pytest.approx(1.0, abs=1e-6)
    assert r["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert r["ROUGE_L"] == pytest.approx(1.0, abs=1e-6)
    assert r["METEOR_approx"] > 0.9
    assert r["CIDEr"] > 0


def test_captioning_metrics_disjoint():
    ev = CaptioningEvaluator()
    ev.add(1, "xyzzy quux", ["a cat sits on the mat"])
    r = ev.results()
    assert r["Bleu_4"] < 1e-6
    assert r["ROUGE_L"] == 0.0
    assert r["METEOR_approx"] == 0.0


def test_captioning_metrics_partial_order():
    """Closer candidate scores higher on every metric.  (A shared filler
    corpus keeps CIDEr's IDF non-degenerate — with one document every
    reference n-gram has df == n_docs and the TF-IDF vectors vanish.)"""
    close, far = CaptioningEvaluator(), CaptioningEvaluator()
    filler = [(10, "a man rides a horse", ["a man rides a horse"]),
              (11, "the plane flies over water", ["the plane flies over water"]),
              (12, "children eat pizza outside", ["children eat pizza outside"])]
    for ev in (close, far):
        for iid, cand, refs in filler:
            ev.add(iid, cand, refs)
    refs = ["a brown dog plays with a red ball"]
    close.add(1, "a brown dog plays with a ball", refs)
    far.add(1, "a cat sleeps quietly indoors", refs)
    rc, rf = close.results(), far.results()
    for m in ("Bleu_4", "ROUGE_L", "METEOR_approx", "CIDEr"):
        assert rc[m] > rf[m], m


def _write_arrow(path, n=4):
    import pyarrow as pa
    from PIL import Image

    rng = np.random.default_rng(0)
    images, captions, ids = [], [], []
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            buf, format="PNG")
        images.append(buf.getvalue())
        captions.append([f"caption number {i}", f"another caption {i}"])
        ids.append(i)
    table = pa.table({"image": images, "caption": captions, "image_id": ids})
    with pa.OSFile(str(path), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)


def test_vlp_arrow_load_and_image_decode(tmp_path):
    from cullavo_tpu.data.registry import clear, get_dataset, get_metadata
    from cullavo_tpu.data.vlp_datasets import register_vlp

    _write_arrow(tmp_path / "karpathy_test.arrow")
    register_vlp("vlp_val_fixture", str(tmp_path),
                 arrow_paths=["karpathy_test.arrow"])
    records = get_dataset("vlp_val_fixture")
    assert len(records) == 4
    assert records[0]["captions"] == ["caption number 0", "another caption 0"]
    md = get_metadata("vlp_val_fixture")
    loader = md["image_loader"]["loader"]
    img = loader(records[1])
    assert img.shape == (32, 32, 3)


def test_instruction_family_registration(tmp_path):
    """instruction_*/instp_* splits share the vlp arrow loader but keep train
    captions whole and parse path-style image ids
    (register_instruction_datasets.py:55-76)."""
    import pyarrow as pa

    from cullavo_tpu.data.registry import get_dataset, get_metadata
    from cullavo_tpu.data.vlp_datasets import register_vlp

    table = pa.table({
        "image": [b"x", b"y"],
        "caption": [["human: what? gpt: that"], ["human: who? gpt: them"]],
        "image_id": ["coco/train2017/000123.jpg", "vg/images/77.jpg"],
    })
    with pa.OSFile(str(tmp_path / "instr.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as w:
            w.write_table(table)

    register_vlp("instruction_train", str(tmp_path), arrow_paths=["instr.arrow"])
    records = get_dataset("instruction_train")
    assert len(records) == 2                       # not exploded per caption
    assert records[0]["image_id"] == 123           # path-style id parse
    assert records[1]["image_id"] == 77
    assert records[0]["captions"] == [["human: what? gpt: that"]]
    assert get_metadata("instruction_train")["evaluator_type"] == "retrieval"

    register_vlp("instp_captioning_val", str(tmp_path), arrow_paths=["instr.arrow"])
    val = get_dataset("instp_captioning_val")
    assert val[0]["captions"] == ["human: what? gpt: that"]  # val keeps lists
    assert get_metadata("instp_captioning_val")["evaluator_type"] == "captioning"


def _hash_tokenize(texts, T=8, V=64):
    ids = np.zeros((len(texts), T), np.int32)
    mask = np.zeros((len(texts), T), np.int32)
    for i, t in enumerate(texts):
        words = t.lower().split()[: T - 2]
        row = [1] + [2 + (hash(w) % (V - 3)) for w in words]
        ids[i, :len(row)] = row
        ids[i, len(row)] = V - 1
        mask[i, :len(row) + 1] = 1
    return ids, mask


def test_vlp_retrieval_pipeline(tmp_path):
    from cullavo_tpu.data.registry import get_dataset, get_metadata
    from cullavo_tpu.data.vlp_datasets import register_vlp
    from cullavo_tpu.models.xdecoder.model import (init_xdecoder_model_params,
                                                   tiny_xdecoder_config)
    from cullavo_tpu.pipelines.vlp_pipeline import VLPRetrievalPipeline

    _write_arrow(tmp_path / "k.arrow")
    register_vlp("vlp_val_fixture2", str(tmp_path), arrow_paths=["k.arrow"])
    records = get_dataset("vlp_val_fixture2")
    loader = get_metadata("vlp_val_fixture2")["image_loader"]["loader"]

    cfg = tiny_xdecoder_config()
    params = init_xdecoder_model_params(cfg, jax.random.PRNGKey(0))
    pipe = VLPRetrievalPipeline({}, cfg, params, _hash_tokenize, loader,
                                image_size=64, batch_size=2)
    out = pipe.evaluate_model(records)
    assert {"ir@1", "ir@5", "tr@1", "tr@5"} <= set(out)
    for v in out.values():
        assert 0.0 <= v <= 100.0


def test_vlp_captioning_pipeline(tmp_path):
    from cullavo_tpu.data.registry import get_dataset, get_metadata
    from cullavo_tpu.data.vlp_datasets import register_vlp
    from cullavo_tpu.models.xdecoder.model import (init_xdecoder_model_params,
                                                   tiny_xdecoder_config)
    from cullavo_tpu.pipelines.vlp_pipeline import VLPCaptioningPipeline

    _write_arrow(tmp_path / "k2.arrow", n=2)
    register_vlp("vlp_captioning_val_fixture", str(tmp_path), arrow_paths=["k2.arrow"])
    records = get_dataset("vlp_captioning_val_fixture")
    loader = get_metadata("vlp_captioning_val_fixture")["image_loader"]["loader"]

    cfg = tiny_xdecoder_config()
    params = init_xdecoder_model_params(cfg, jax.random.PRNGKey(0))
    pipe = VLPCaptioningPipeline(
        {}, cfg, params, loader,
        decode_text=lambda ids: " ".join(f"t{i}" for i in ids[1:4]),
        start_token_id=cfg.text.vocab_size - 2, image_size=64, batch_size=2)
    out = pipe.evaluate_model(records,
                              out_path=str(tmp_path / "captions.json"))
    assert out["n"] == 2
    assert {"Bleu_4", "METEOR_approx", "ROUGE_L", "CIDEr"} <= set(out)
    assert out["SPICE"] is None
    assert os.path.exists(tmp_path / "captions.json")

    # referring captioning: a row-level excluded-region mask routes through
    # the masked decode program (xdecoder_model.py:565-567 capability)
    masked = [dict(r) for r in records]
    masked[0]["captioning_mask"] = np.zeros((32, 32), bool)
    masked[0]["captioning_mask"][:, 16:] = True
    out2 = pipe.evaluate_model(masked)
    assert out2["n"] == 2
