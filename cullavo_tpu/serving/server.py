"""HTTP front-end for the continuous-batching engine.

The reference repo has no serving layer at all (its eval hot path is batch-1
greedy, pipeline/LLaVAVQAVALPipeline.py:171-180); this module is a TPU-native
EXTENSION: a production-shaped network endpoint over ``ServingEngine``.

Two pieces:

``EngineRunner``
    Thread-safe driver.  HTTP handler threads ``submit`` requests; one
    scheduler thread owns every engine call (the engine itself is
    single-threaded by design — all device dispatches come from one thread),
    loops admit→decode-quantum→harvest while work exists, and parks on an
    event when idle.  Completion is signalled per request, so an arbitrary
    number of callers can block on their own results while the pool keeps
    every slot busy.

``ServingHTTPServer`` (stdlib ``ThreadingHTTPServer`` — zero dependencies)
    * ``POST /generate``  body: {"id"?: int, "prompt": str |
      "input_ids": [int, ...], "image"?: path | [3,H,W] list,
      "max_new_tokens"?: int} → {"id", "tokens", "text"}.  Blocks until the
      request completes (iteration-level scheduling bounds the wait: TTFT is
      one prefill, then ``quantum``-sized decode slices).  Missing ids are
      assigned server-side.
    * ``GET /healthz`` → {"ok": true}
    * ``GET /stats``   → rolling latency percentiles + scheduler counters.

Invalid requests (unknown fields are ignored; bad shapes, duplicate ids,
over-long prompts) return 400 with the validation message; a request that
exceeds ``timeout_s`` returns 504 (its slot still completes and is freed).
"""
from __future__ import annotations

import collections
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from cullavo_tpu.serving.engine import Request, ServingEngine
from cullavo_tpu.serving.io import request_from_row

__all__ = ["EngineRunner", "ServingHTTPServer", "make_server"]


class EngineRunner:
    """Owns a ``ServingEngine`` behind a scheduler thread.

    All engine access happens under ``_lock``: ``submit`` (any thread)
    enqueues into the engine and registers a completion event; the scheduler
    thread steps the engine while it has work and harvests finished results
    out of ``engine.results`` (so the engine's dicts stay bounded in a
    long-running server).  ``stats`` aggregates a rolling window of
    per-request latencies instead of the engine's unbounded ``times``.
    """

    def __init__(self, engine: ServingEngine, *, window: int = 2048,
                 idle_poll_s: float = 0.05):
        self.engine = engine
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._events: dict = {}          # req_id -> threading.Event
        self._done: dict = {}            # req_id -> [tokens]
        self._streams: dict = {}         # req_id -> queue.Queue (streaming)
        self._sent: dict = {}            # req_id -> tokens already streamed
        self._ttft = collections.deque(maxlen=window)
        self._e2e = collections.deque(maxlen=window)
        self._counters = {"submitted": 0, "completed": 0}
        self._idle_poll_s = idle_poll_s
        self._started = time.time()
        self._thread = threading.Thread(
            target=self._loop, name="cullavo-serve-scheduler", daemon=True)
        self._thread.start()

    # -- client side ---------------------------------------------------------
    def submit(self, req: Request) -> threading.Event:
        """Validate + enqueue; returns the completion event.  Raises
        ``ValueError`` (duplicate id, prompt too long, budget over max_len)
        synchronously — the engine validates at submit time."""
        with self._lock:
            self.engine.submit(req)      # may raise; nothing registered yet
            ev = threading.Event()
            self._events[req.req_id] = ev
            self._counters["submitted"] += 1
        self._wake.set()
        return ev

    def result(self, req_id, timeout: Optional[float] = None) -> list:
        ev = self._events.get(req_id)
        if ev is None:
            raise KeyError(f"unknown or already-collected req_id {req_id}")
        if not ev.wait(timeout):
            with self._lock:
                if req_id in self._done:    # finished between wait and lock
                    self._events.pop(req_id, None)
                    return self._done.pop(req_id)
                # deregister so the late completion is dropped, not leaked
                self._events.pop(req_id, None)
            raise TimeoutError(f"request {req_id} not done in {timeout}s")
        with self._lock:
            self._events.pop(req_id, None)
            return self._done.pop(req_id)

    def generate(self, req: Request, timeout: Optional[float] = None) -> list:
        self.submit(req)
        return self.result(req.req_id, timeout)

    def submit_stream(self, req: Request):
        """Streaming submit: returns a Queue yielding tokens as quanta
        complete, then ``None`` as the end-of-stream sentinel."""
        import queue

        with self._lock:
            self.engine.submit(req)      # may raise; nothing registered yet
            q = queue.Queue()
            self._streams[req.req_id] = q
            self._sent[req.req_id] = 0
            self._counters["submitted"] += 1
        self._wake.set()
        return q

    def stats(self) -> dict:
        def pct(xs):
            xs = list(xs)
            return ({"p50": round(float(np.percentile(xs, 50)), 4),
                     "p95": round(float(np.percentile(xs, 95)), 4),
                     "n": len(xs)} if xs else {"n": 0})

        with self._lock:
            eng = self.engine
            return {"ok": True,
                    "uptime_s": round(time.time() - self._started, 1),
                    "submitted": self._counters["submitted"],
                    "completed": self._counters["completed"],
                    "pending": len(eng.pending),
                    "active_slots": len(eng.active),
                    "free_slots": len(eng.free),
                    "num_slots": eng.num_slots,
                    # prefix-KV reuse + prefill right-sizing counters
                    "scheduler": dict(eng.counters),
                    "quantum": eng.quantum,
                    "buckets": list(eng.buckets),
                    "ttft_s": pct(self._ttft),
                    "e2e_s": pct(self._e2e)}

    def stop(self, join: bool = True):
        self._stop = True
        self._wake.set()
        if join:
            self._thread.join(timeout=10)

    # -- scheduler thread ----------------------------------------------------
    def _loop(self):
        while not self._stop:
            with self._lock:
                busy = bool(self.engine.pending or self.engine.active)
                if busy:
                    self.engine.step()
                    self._push_partial_locked()
                    self._harvest_locked()
            if not busy:
                # park until a submit wakes us (bounded, so stop() is prompt)
                self._wake.wait(self._idle_poll_s)
                self._wake.clear()

    def _push_partial_locked(self):
        """Feed streaming queues the tokens decoded so far (in-flight rows)."""
        if not self._streams:
            return
        for req, out in self.engine.active.values():
            q = self._streams.get(req.req_id)
            if q is None:
                continue
            sent = self._sent[req.req_id]
            for t in out[sent:]:
                q.put(t)
            self._sent[req.req_id] = len(out)

    def _harvest_locked(self):
        eng = self.engine
        for rid in list(eng.results):
            toks = eng.results.pop(rid)
            t = eng.times.pop(rid, {})
            if "first_token" in t:
                self._ttft.append(t["first_token"] - t["submit"])
            if "done" in t:
                self._e2e.append(t["done"] - t["submit"])
            self._counters["completed"] += 1
            q = self._streams.pop(rid, None)
            if q is not None:
                for tok in toks[self._sent.pop(rid, 0):]:
                    q.put(tok)
                q.put(None)              # end-of-stream sentinel
                continue
            self._done[rid] = toks
            ev = self._events.get(rid)
            if ev is not None:
                ev.set()
            else:
                # fire-and-forget submit (no registered waiter): drop the
                # tokens rather than leak them
                self._done.pop(rid, None)


class ServingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying the runner + model context."""
    daemon_threads = True

    def __init__(self, addr, runner: EngineRunner, model_cfg, tokenizer, *,
                 eos_token_id: int, timeout_s: float = 300.0):
        super().__init__(addr, _Handler)
        self.runner = runner
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.eos_token_id = eos_token_id
        self.timeout_s = timeout_s
        self._next_id = 1 << 32          # auto ids above any sane client id
        self._id_lock = threading.Lock()

    def assign_id(self) -> int:
        with self._id_lock:
            self._next_id += 1
            return self._next_id


class _Handler(BaseHTTPRequestHandler):
    server: ServingHTTPServer
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):      # quiet by default
        pass

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, {"ok": True})
        elif self.path == "/stats":
            self._reply(200, self.server.runner.stats())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/generate":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            row = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            self._reply(400, {"error": f"bad JSON body: {e}"})
            return
        if "id" not in row:
            row = dict(row, id=self.server.assign_id())
        stream = bool(row.pop("stream", False))
        try:
            req = request_from_row(row, self.server.model_cfg,
                                   self.server.tokenizer)
            if stream:
                q = self.server.runner.submit_stream(req)
                self._stream_reply(row["id"], q)
                return
            toks = self.server.runner.generate(req,
                                               timeout=self.server.timeout_s)
        except (ValueError, KeyError) as e:
            self._reply(400, {"error": str(e)})
            return
        except TimeoutError as e:
            self._reply(504, {"error": str(e)})
            return
        self._reply(200, {"id": row["id"], "tokens": toks,
                          "text": self._decode(toks)})

    def _decode(self, toks):
        if self.server.tokenizer is None:
            return None
        eos = self.server.eos_token_id
        return self.server.tokenizer.decode(
            toks[:-1] if toks and toks[-1] == eos else toks)

    def _stream_reply(self, req_id, q):
        """Chunked JSONL: one {"token": t} line per decoded token as its
        quantum completes, then a {"done": true, ...} summary line."""
        self.send_response(200)
        self.send_header("Content-Type", "application/jsonl")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def chunk(obj):
            data = (json.dumps(obj) + "\n").encode()
            self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")
            self.wfile.flush()

        import queue

        toks, deadline = [], time.time() + self.server.timeout_s
        while True:
            try:
                t = q.get(timeout=max(0.0, deadline - time.time()))
            except queue.Empty:
                chunk({"error": f"timeout after {self.server.timeout_s}s",
                       "id": req_id, "tokens": toks})
                break
            if t is None:
                chunk({"done": True, "id": req_id, "tokens": toks,
                       "text": self._decode(toks)})
                break
            toks.append(t)
            chunk({"token": t})
        self.wfile.write(b"0\r\n\r\n")


def make_server(engine: ServingEngine, model_cfg, tokenizer, *,
                host: str = "127.0.0.1", port: int = 0,
                timeout_s: float = 300.0) -> ServingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` binds an
    ephemeral port (``server.server_address[1]`` is the bound port).
    Call ``serve_forever()`` to run; ``shutdown()`` + ``runner.stop()``
    to tear down."""
    runner = EngineRunner(engine)
    return ServingHTTPServer((host, port), runner, model_cfg, tokenizer,
                             eos_token_id=engine.gen.eos_token_id,
                             timeout_s=timeout_s)
