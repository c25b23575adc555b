"""HTTP front-end tests (serving/server.py): the endpoint must be a pure
transport over ServingEngine — concurrent POST /generate streams are
token-exact vs the offline two-phase generate, invalid requests map to 400,
and /stats reflects the scheduler counters."""
import http.client
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                               generate_decode,
                                               generate_prefill,
                                               init_llava_params)
from cullavo_tpu.serving import ServingEngine, make_server

VOCAB = 128


@pytest.fixture(scope="module")
def served():
    cfg = tiny_llava_config(VOCAB)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    n_img = cfg.num_image_tokens
    buckets = (1 + n_img + 8, 1 + n_img + 16)
    max_len = buckets[-1] + 12
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=3, max_len=max_len,
                        prompt_buckets=buckets, prefill_chunk=2, quantum=3,
                        compute_dtype=jnp.float32)
    server = make_server(eng, cfg, tokenizer=None, timeout_s=120.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield cfg, params, server, buckets, max_len, gen
    server.shutdown()
    server.runner.stop()
    server.server_close()


def _post(port, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    out = r.status, json.loads(r.read())
    conn.close()
    return out


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    r = conn.getresponse()
    out = r.status, json.loads(r.read())
    conn.close()
    return out


def _row(cfg, rng, req_id, text_len, max_new):
    n_img = cfg.num_image_tokens
    ids = rng.integers(3, VOCAB - 2,
                       size=(1 + n_img + text_len,)).astype(np.int32)
    ids[1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    return {"id": req_id, "input_ids": ids.tolist(),
            "image": pix.tolist(), "max_new_tokens": max_new}


def _offline(cfg, params, row, buckets, max_len, gen):
    ids_l = row["input_ids"]
    bucket = next(b for b in buckets if len(ids_l) <= b)
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, :len(ids_l)] = ids_l
    mask[0, :len(ids_l)] = 1
    pix = np.asarray(row["image"], np.float32)[None]
    state = generate_prefill(params, cfg, jnp.asarray(ids),
                             jnp.asarray(pix), jnp.asarray(mask), max_len,
                             compute_dtype=jnp.float32)
    out = np.asarray(generate_decode(
        params, cfg, state,
        GenerationConfig(max_new_tokens=row["max_new_tokens"],
                         do_sample=False, eos_token_id=gen.eos_token_id),
        compute_dtype=jnp.float32))[0]
    toks = []
    for t in out:
        toks.append(int(t))
        if int(t) == gen.eos_token_id:
            break
    return toks[:row["max_new_tokens"]]


def test_http_concurrent_streams_match_offline(served):
    """6 concurrent clients on a 3-slot pool: every response token-exact."""
    cfg, params, server, buckets, max_len, gen = served
    port = server.server_address[1]
    rng = np.random.default_rng(0)
    rows = [_row(cfg, rng, 100 + i, [3, 8, 14, 5, 15, 2][i],
                 [6, 10, 4, 12, 7, 1][i]) for i in range(6)]
    results = {}

    def client(row):
        status, body = _post(port, "/generate", row)
        results[row["id"]] = (status, body)

    threads = [threading.Thread(target=client, args=(r,)) for r in rows]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    for row in rows:
        status, body = results[row["id"]]
        assert status == 200, body
        ref = _offline(cfg, params, row, buckets, max_len, gen)
        assert body["tokens"] == ref, (
            f"req {row['id']}: http {body['tokens']} != offline {ref}")
        assert body["id"] == row["id"]

    status, stats = _get(port, "/stats")
    assert status == 200
    assert stats["completed"] >= 6
    assert stats["active_slots"] == 0
    assert stats["free_slots"] == stats["num_slots"]
    assert stats["e2e_s"]["n"] >= 6


def test_http_healthz_auto_id_and_errors(served):
    cfg, params, server, buckets, max_len, gen = served
    port = server.server_address[1]

    status, body = _get(port, "/healthz")
    assert status == 200 and body["ok"]

    # auto-assigned id when the client omits one
    rng = np.random.default_rng(7)
    row = _row(cfg, rng, None, 4, 3)
    del row["id"]
    status, body = _post(port, "/generate", row)
    assert status == 200 and body["id"] >= (1 << 32)
    assert len(body["tokens"]) == 3
    assert body["text"] is None          # no tokenizer configured

    # prompt longer than the largest bucket → 400 with the engine's message
    bad = _row(cfg, rng, 999, 40, 4)
    status, body = _post(port, "/generate", bad)
    assert status == 400 and "bucket" in body["error"]

    # missing prompt/input_ids → 400
    status, body = _post(port, "/generate", {"max_new_tokens": 4})
    assert status == 400 and "input_ids" in body["error"]

    # wrong image shape → 400
    shaped = _row(cfg, rng, 1000, 4, 3)
    shaped["image"] = [[[0.0]]]
    status, body = _post(port, "/generate", shaped)
    assert status == 400 and "shape" in body["error"]

    # duplicate id (in-flight replay): submit a legal one, then re-use its id
    row1 = _row(cfg, rng, 4242, 4, 3)
    status, _ = _post(port, "/generate", row1)
    assert status == 200
    status, body = _post(port, "/generate", row1)  # same id again — results
    # were already collected, so the engine sees it as fresh; run it again
    assert status == 200

    status, body = _get(port, "/nope")
    assert status == 404


def test_http_streaming_matches_blocking(served):
    """stream=true returns chunked JSONL whose token sequence equals the
    blocking response (and the offline reference)."""
    cfg, params, server, buckets, max_len, gen = served
    port = server.server_address[1]
    rng = np.random.default_rng(3)
    row = _row(cfg, rng, 7007, 6, 8)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=180)
    conn.request("POST", "/generate", json.dumps(dict(row, stream=True)),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    lines = [json.loads(line) for line in r.read().decode().splitlines()]
    conn.close()

    assert lines[-1].get("done") is True
    streamed = [ln["token"] for ln in lines[:-1]]
    assert streamed == lines[-1]["tokens"]
    ref = _offline(cfg, params, row, buckets, max_len, gen)
    assert streamed == ref
