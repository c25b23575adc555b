"""Evaluator tests: VQA consensus accuracy + normalization semantics."""
from cullavo_tpu.data.evaluation.vqa_eval import (VQAEvaluator,
                                                  normalize_answer,
                                                  process_punctuation)


def test_normalization():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("a dog.") == "dog"
    assert normalize_answer("isnt") == "isn't"
    # the official tool's comma rule REMOVES the comma inside digits
    # (vqaEval.py processPunctuation: commaStrip match → replace with '')
    assert normalize_answer("1,000") == "1000"
    assert normalize_answer("yes!") == "yes"


def test_consensus_accuracy():
    ev = VQAEvaluator()
    # unanimous
    acc = ev.process(1, "yes", ["yes"] * 10, "is the", "yes/no")
    assert acc == 1.0
    # 3 of 10 annotators agree: each agreeing annotator sees 2 or 3 matches
    acc = ev.process(2, "cat", ["cat"] * 3 + ["dog"] * 7, "what", "other")
    assert 0.5 < acc < 1.0
    # no match
    acc = ev.process(3, "blue", ["red"] * 10, "what color", "other")
    assert acc == 0.0
    out = ev.evaluate()
    assert out["n"] == 3
    assert 0 < out["overall"] < 100
    assert out["perAnswerType"]["yes/no"] == 100.0


def test_results_dump(tmp_path):
    ev = VQAEvaluator()
    ev.process(7, "yes", ["yes"] * 10)
    p = tmp_path / "res.json"
    ev.dump_results(str(p))
    import json
    data = json.loads(p.read_text())
    assert data == [{"question_id": 7, "answer": "yes"}]
